from lakehouse_tacklebox_spark.functions.money import dmoney, drate, dsum_dbl, round_dbl  # noqa: F401
