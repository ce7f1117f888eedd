from lakehouse_adventureworks2022_spark.storage.tables import TableManager  # noqa: F401
