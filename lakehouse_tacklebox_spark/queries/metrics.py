"""Observability metrics battery (SURVEY.md §2.12 V11/V12).

V11 (dbsql-logging/04-Metrics.sql:28-261): error-classification CASE,
rank-dedup "latest snapshot per entity", per-entity CTE join, top-k by
spend — recast over the events table as the ops-metrics rollup.

V12 (dlt-loans/03-Log-Analysis.sql:76-104): event-log analytics — JSON
path extraction + from_json + explode over semi-structured event
payloads; the engine side round-trips through real JSON parsing while
the oracle computes the same values relationally, so the JSON machinery
itself is what's being verified.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.queries import register
from lakehouse_tacklebox_spark.sources import load_tables


@register(
    "metrics_ops_summary",
    tags=("metrics", "window"),
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
               round(100.0 * sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) / count(*), 4) AS error_pct
        FROM events GROUP BY user_id
    ),
    latest AS (
        SELECT user_id, event_type AS last_event_type
        FROM (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    )
    SELECT p.user_id, n_events, total_value, n_errors, error_pct, last_event_type
    FROM per_user p JOIN latest l ON p.user_id = l.user_id
    ORDER BY total_value DESC, p.user_id
    LIMIT 20
    """,
)
def metrics_ops_summary(spark, sf_dir):
    """Ops metrics rollup: per-user aggregates + rank-dedup latest
    snapshot + top-20 by spend (04-Metrics.sql:30-59 shapes)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.sum((F.col("event_type") == "error").cast("bigint")).alias("n_errors"),
        F.round(F.lit(100.0) * F.sum((F.col("event_type") == "error").cast("int")) / F.count(F.lit(1)), 4).alias("error_pct"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("last_event_type"))
    )
    return (
        per_user.join(latest, "user_id")
        .select("user_id", "n_events", "total_value", "n_errors", "error_pct", "last_event_type")
        .orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(20)
    )


@register(
    "metrics_percentiles",
    tags=("metrics", "percentile"),
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99,
           round(max(value), 4) AS p_max
    FROM events GROUP BY event_type
    """,
)
def metrics_percentiles(spark, sf_dir):
    """Latency-style percentile report (04-Metrics.sql duration
    percentiles shape): exact interpolated percentiles per group. At
    100 TB swap percentile → approx_percentile (t-digest, mergeable
    partials) — same plan shape, bounded state."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.round(F.max("value"), 4).alias("p_max"),
    )


@register(
    "event_log_json_analytics",
    tags=("metrics", "json"),
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def event_log_json_analytics(spark, sf_dir):
    """Event-log analytics through real JSON machinery: serialize each
    event to a JSON document (to_json), then recover fields via
    get_json_object path extraction + from_json struct parsing + explode
    of the details array (dlt-loans/03-Log-Analysis.sql:76-104 flow).
    The oracle computes the same numbers relationally — parity proves
    the JSON round-trip is lossless."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    # build the event-log document: {"event_type": ..., "details": {"metrics": [{"k": ..., "value": ...}]}}
    doc = ev.select(
        F.to_json(
            F.struct(
                F.col("event_type"),
                F.struct(
                    F.array(
                        F.struct(
                            F.from_json("props", "k int").getField("k").alias("k"),
                            F.col("value"),
                        )
                    ).alias("metrics")
                ).alias("details"),
            )
        ).alias("doc")
    )
    parsed = doc.select(
        F.get_json_object("doc", "$.event_type").alias("event_type"),
        F.from_json(
            F.get_json_object("doc", "$.details"),
            "metrics array<struct<k:int, value:double>>",
        ).alias("details"),
    )
    exploded = parsed.select("event_type", F.explode("details.metrics").alias("m"))
    return exploded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("m.k").cast("bigint").alias("sum_k"),
        F.round(F.avg("m.k"), 4).alias("avg_k"),
        F.round(F.sum("m.value"), 2).alias("total_value"),
    )
