from bigdata_project_spark.operators.merge import merge_all_columns, merge_keyed
from bigdata_project_spark.operators.distinct_on import distinct_on
from bigdata_project_spark.operators.union_conform import union_conform

__all__ = [
    "merge_all_columns",
    "merge_keyed",
    "distinct_on",
    "union_conform",
]
