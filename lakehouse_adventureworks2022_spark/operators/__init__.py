from lakehouse_adventureworks2022_spark.operators.scd2 import scd2_apply  # noqa: F401
