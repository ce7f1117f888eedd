from lakehouse_adventureworks2022_spark.sources.readers import (  # noqa: F401
    TABLES,
    date_spine,
    load_tables,
    read_table,
)
