from flatbread_spark.operators.aggregation import add_agg, add_subagg
from flatbread_spark.operators.totals import add_subtotals, add_totals, drop_totals

__all__ = ["add_agg", "add_subagg", "add_totals", "add_subtotals", "drop_totals"]
