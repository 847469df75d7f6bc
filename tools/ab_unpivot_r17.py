"""Interleaved A/B: agg_unpivot_measures melt-then-aggregate (r16 form)
vs aggregate-then-melt (r17 §2.3 form).

Same-session form alternation A/B/A/B..., construction inside the timer,
noop sink, medians quoted — per the round method (host swings make
cross-column deltas weather).

Usage: python tools/ab_unpivot_r17.py [--runs 7]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_project_spark.plans.analytics import query_unpivot_measures  # noqa: E402
from bigdata_project_spark.session import get_spark  # noqa: E402
from bigdata_project_spark.sources.readers import load_table  # noqa: E402

_DEC = "decimal(18,2)"


def old_form(spark, sf_dir):
    """The r16 melt-then-aggregate form, verbatim."""
    li = load_table(spark, sf_dir, "lineitem")
    melted = (
        li.select(
            "l_returnflag",
            F.col("l_quantity").cast(_DEC).alias("quantity"),
            F.col("l_extendedprice").cast(_DEC).alias("extendedprice"),
            F.col("l_discount").cast(_DEC).alias("discount"),
            F.col("l_tax").cast(_DEC).alias("tax"),
        )
        .unpivot(
            ["l_returnflag"],
            ["quantity", "extendedprice", "discount", "tax"],
            "measure",
            "value",
        )
        .filter(F.col("value").isNotNull())
    )
    return (
        melted.groupBy("l_returnflag", "measure")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").cast("double").alias("sum_value"),
            F.max("value").cast("double").alias("max_value"),
        )
        .orderBy("l_returnflag", "measure")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--max-partition-bytes", default=None,
                    help="shrink splits on replicated input so scan work parallelizes")
    ap.add_argument("--out", default="ab_unpivot_r17.json")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-unpivot-r17")
    spark.sparkContext.setLogLevel("ERROR")
    if args.max_partition_bytes:
        spark.conf.set("spark.sql.files.maxPartitionBytes", args.max_partition_bytes)

    forms = {"old_melt": old_form, "new_preagg": query_unpivot_measures}
    times: dict[str, list[float]] = {k: [] for k in forms}
    # warm-up once per form (JIT/codegen caches), not timed
    for fn in forms.values():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for i in range(args.runs):
        # alternate order each iteration so a monotone host trend
        # cannot favor either form
        order = list(forms.items()) if i % 2 == 0 else list(forms.items())[::-1]
        for name, fn in order:
            spark.sparkContext.setJobDescription(f"ab_unpivot:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    out = {
        k: {"median": round(statistics.median(v), 3), "runs": [round(x, 3) for x in v]}
        for k, v in times.items()
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(HERE, args.out), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
