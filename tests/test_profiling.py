"""Semantics of column profiling and SCD2 interval extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_project_spark.operators.profiling import (
    query_profile_columns,
    query_scd2_event_type,
)
from bigdata_project_spark.sources.readers import load_table


def test_profile_matches_direct_aggregates(spark, sf_dir):
    out = query_profile_columns(spark, sf_dir).toPandas().set_index("col_name")
    li = load_table(spark, sf_dir, "lineitem")
    direct = li.agg(
        F.count_distinct("l_returnflag").alias("d"),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
    ).first()
    assert out.loc["l_returnflag", "n_distinct"] == direct["d"]
    assert out.loc["l_quantity", "min_num"] == direct["mn"]
    assert out.loc["l_quantity", "max_num"] == direct["mx"]
    assert (out["n_nulls"] == 0).all()  # fixture has no nulls
    assert out.loc["l_shipdate", "min_str"] is not None


def test_scd2_intervals_chain_per_user(spark, sf_dir):
    out = query_scd2_event_type(spark, sf_dir).toPandas()
    assert len(out) > 0
    for _, grp in out.groupby("user_id"):
        g = grp.sort_values("valid_from").reset_index(drop=True)
        # exactly one open interval per user, and it is the last one
        assert g["valid_to"].isna().sum() == 1
        assert g["valid_to"].iloc[-1] is None or g["valid_to"].isna().iloc[-1]
        # intervals chain: valid_to == next valid_from
        for i in range(len(g) - 1):
            assert g.loc[i, "valid_to"] == g.loc[i + 1, "valid_from"]
        # consecutive rows never repeat the same type (runs collapsed)
        types = list(g["event_type"])
        assert all(a != b for a, b in zip(types, types[1:]))
