from lakehouse_tacklebox_spark.validation.datavalidator import (  # noqa: F401
    count_reconcile,
    diff_rows,
    hash_diff,
    row_hash,
    schema_diff,
)
