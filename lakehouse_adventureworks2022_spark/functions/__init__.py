from lakehouse_adventureworks2022_spark.functions.dialect import (  # noqa: F401
    change_hash,
    date_key,
    fiscal_month,
    fiscal_quarter,
    fiscal_year,
    iso_day_of_week,
    money,
)
