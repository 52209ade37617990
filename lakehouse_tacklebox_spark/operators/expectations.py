"""Data-quality expectations: warn / drop / fail, metrics in one pass.

Re-expresses DLT expectations (dlt-loans/01:119-136 EXPECT / DROP ROW /
FAIL UPDATE, quarantine at :131-136; 02-Retail_DLT_CDC_Python.py:142-144)
without Databricks. SURVEY.md §4 notes the naive port double-scans
(count violations, then filter); this uses ``df.observe`` accumulators
instead — violation counts ride along with the ONE real pass over the
data, which is the difference between 1× and 2× I/O on a 100 TB input.

Usage:
    checked = Expectations("silver")\
        .expect("valid_key", "id IS NOT NULL", action="drop")\
        .expect("positive_amount", "amount > 0", action="warn")\
        .apply(df)
    checked.df          # rows after drop-action filters
    checked.quarantine  # rows failing any drop-action expectation
    checked.metrics(spark)  # counts per expectation, after an action ran

``action="fail"`` raises ExpectationFailed on first violation, checked
at action time (the FAIL UPDATE gate).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


class ExpectationFailed(RuntimeError):
    pass


@dataclass
class _Rule:
    name: str
    condition: str
    action: str  # warn | drop | fail


@dataclass
class CheckedFrame:
    df: DataFrame
    quarantine: DataFrame
    _observation: Observation
    _rules: list[_Rule]

    def metrics(self) -> dict[str, int]:
        """Violation counts per expectation. Available after an action on
        ``df`` has executed (observe() semantics)."""
        got = self._observation.get
        return {r.name: got[f"violations_{r.name}"] for r in self._rules}


class Expectations:
    def __init__(self, name: str = "expectations"):
        self.name = name
        self._rules: list[_Rule] = []

    def expect(self, name: str, condition: str, action: str = "warn") -> "Expectations":
        if action not in ("warn", "drop", "fail"):
            raise ValueError(f"unknown action {action!r}")
        self._rules.append(_Rule(name, condition, action))
        return self

    # DLT-flavored aliases
    def expect_or_drop(self, name: str, condition: str) -> "Expectations":
        return self.expect(name, condition, "drop")

    def expect_or_fail(self, name: str, condition: str) -> "Expectations":
        return self.expect(name, condition, "fail")

    def apply(self, df: DataFrame) -> CheckedFrame:
        obs = Observation(self.name)
        counters = [
            F.sum((~F.coalesce(F.expr(r.condition), F.lit(False))).cast("long")).alias(f"violations_{r.name}")
            for r in self._rules
        ]
        observed = df.observe(obs, *counters) if counters else df
        drop_rules = [r for r in self._rules if r.action == "drop"]
        keep = F.lit(True)
        for r in drop_rules:
            keep = keep & F.coalesce(F.expr(r.condition), F.lit(False))
        kept = observed.filter(keep) if drop_rules else observed
        quarantine = observed.filter(~keep) if drop_rules else observed.limit(0)

        fail_rules = [r for r in self._rules if r.action == "fail"]
        for r in fail_rules:
            # FAIL gate: probe for one violating row (limit-1 scan, stops early)
            if df.filter(~F.coalesce(F.expr(r.condition), F.lit(False))).limit(1).count() > 0:
                raise ExpectationFailed(f"expectation {r.name!r} violated: {r.condition}")
        return CheckedFrame(df=kept, quarantine=quarantine, _observation=obs, _rules=self._rules)
