from flatbread_spark.sources.tables import load_table, load_tables
from flatbread_spark.sources.pivot import pivot_table, crosstab

__all__ = ["load_table", "load_tables", "pivot_table", "crosstab"]
