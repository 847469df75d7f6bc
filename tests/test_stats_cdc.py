"""Semantic checks for operators/stats.py and operators/cdc.py (oracle
parity is covered by test_oracle_parity; these pin down the contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_project_spark.operators import cdc, stats


def test_cdc_ops_are_exhaustive_and_consistent(spark, sf_dir):
    rows = cdc.query_cdc_snapshot_diff(spark, sf_dir).collect()
    assert rows, "overlapping windows must produce changes"
    ops = {r["op"] for r in rows}
    assert ops <= {"I", "U", "D"}
    # the sliding window construction should exercise every op kind
    assert ops == {"I", "U", "D"}
    for r in rows:
        if r["op"] == "I":
            assert r["old_n"] is None and r["new_n"] is not None
        elif r["op"] == "D":
            assert r["new_n"] is None and r["old_n"] is not None
        else:
            assert r["old_n"] is not None and r["new_n"] is not None
            assert (r["old_n"], r["old_qty"]) != (r["new_n"], r["new_qty"])


def test_cdc_noop_keys_are_dropped(spark, sf_dir):
    out = cdc.query_cdc_snapshot_diff(spark, sf_dir)
    # every emitted key appears exactly once (it's a keyed diff, not a log)
    assert out.groupBy("l_orderkey").count().filter(F.col("count") > 1).count() == 0


def test_corr_matrix_matches_native_corr(spark, duck, sf_dir):
    rows = stats.query_feature_corr_matrix(spark, sf_dir).collect()
    d = len(stats.CORR_COLS)
    assert len(rows) == d * (d - 1) // 2
    for r in rows:
        assert -1.0 <= r["corr"] <= 1.0
        # 6-dp-rounded inputs vs native double corr: agree to ~1e-5
        (want,) = duck.execute(
            f"SELECT corr({r['col_a']}, {r['col_b']}) FROM lineitem"
        ).fetchone()
        assert r["corr"] == pytest.approx(want, abs=1e-4)


def test_group_ols_matches_numpy(spark, sf_dir):
    np = pytest.importorskip("numpy")
    got = {
        r["l_returnflag"]: r
        for r in stats.query_ml_group_ols(spark, sf_dir).collect()
    }
    pdf = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, grp in pdf.groupby("l_returnflag"):
        slope, intercept = np.polyfit(grp["l_quantity"], grp["l_extendedprice"], 1)
        assert got[flag]["slope"] == pytest.approx(slope, rel=1e-4)
        assert got[flag]["intercept"] == pytest.approx(intercept, rel=1e-3, abs=1.0)
        assert got[flag]["n_rows"] == len(grp)
