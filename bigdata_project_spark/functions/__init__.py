from bigdata_project_spark.functions.scalars import (
    coalesce_blank,
    date_from_epoch_ms_plus1,
    parse_date_yyyymmdd,
    parse_ts_yyyymmddhh,
    split_part,
    tri_state_bool,
    weekend_flag,
)
from bigdata_project_spark.functions.geo import haversine_km

__all__ = [
    "coalesce_blank",
    "date_from_epoch_ms_plus1",
    "parse_date_yyyymmdd",
    "parse_ts_yyyymmddhh",
    "split_part",
    "tri_state_bool",
    "weekend_flag",
    "haversine_km",
]
