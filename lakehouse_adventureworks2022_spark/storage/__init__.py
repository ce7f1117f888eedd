from lakehouse_adventureworks2022_spark.storage.ddl import CatalogDDL  # noqa: F401
from lakehouse_adventureworks2022_spark.storage.tables import TableManager  # noqa: F401
