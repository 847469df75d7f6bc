"""Compaction: fewer files, identical rows."""

from __future__ import annotations

import glob

from bigdata_project_spark.operators.compaction import compact_parquet, plan_compaction
from bigdata_project_spark.sources.readers import load_table


def test_compact_small_files(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.repartition(32).write.parquet(src)  # simulate a micro-batch sink
    assert len(glob.glob(f"{src}/*.parquet")) == 32

    n_out = compact_parquet(spark, src, dst, target_bytes=10 * 1024 * 1024)
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) == n_out
    assert n_out < 32

    before = ev.collect()
    after = spark.read.parquet(dst).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_plan_compaction_scales_with_bytes(spark, sf_dir, tmp_path):
    src = str(tmp_path / "frag2")
    load_table(spark, sf_dir, "events").repartition(8).write.parquet(src)
    df = spark.read.parquet(src)
    tiny_target = plan_compaction(df, target_bytes=1)
    one_file = plan_compaction(df, target_bytes=1 << 40)
    assert one_file == 1
    assert tiny_target > 8  # byte-proportional, not file-count-based
