"""Pipeline runner: the E1 entry point materializes every silver table."""

from __future__ import annotations

from bigdata_project_spark.runner import SILVER_TABLES, run_silver_pipeline
from bigdata_project_spark.sources.sinks import drop_table


def test_run_silver_pipeline_materializes_all(spark, sf_dir):
    try:
        counts = run_silver_pipeline(spark, sf_dir, prefix="t_")
        assert set(counts) == {f"t_{n}" for n in SILVER_TABLES}
        assert all(c > 0 for c in counts.values()), counts
        # idempotent rebuild (CREATE OR REPLACE semantics)
        again = run_silver_pipeline(spark, sf_dir, prefix="t_")
        assert again == counts
        # materialized table answers queries
        assert "zone_level" in spark.table("t_silver_od").columns
    finally:
        for n in SILVER_TABLES:
            drop_table(spark, f"t_{n}")
