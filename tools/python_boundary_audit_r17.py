"""§4.4 audit of every Python-boundary operator (VERDICT r16 item 4).

For each registered query whose plan holds a Python evaluation node
(MapInPandas / ArrowEvalPython / BatchEvalPython / MapInArrow /
FlatMapGroupsInPandas), run it to completion through the noop sink and
inspect the EXECUTED plan (the AQE final plan, which is the only place
runtime exchange/stage reuse is visible — the r16 lesson: static plans
overstate duplication). Report, per query:

  py_static    Python nodes in the static formatted plan
  py_executed  Python nodes in the executed (final adaptive) plan
  reused_exch  ReusedExchange nodes in the executed plan
  verdict      SINGLE (py_executed == expected single-evaluation count)
               or DUP (more Python nodes executed than the operator's
               own pass structure accounts for -> each extra node is a
               whole extra corpus pass through the Python boundary,
               the sim_ann_lsh_buckets disease fixed in r16/e9f1f30)

The expected pass count per operator is declared below from the
operator source (how many distinct mapInPandas/pandas_udf call sites
its DAG invokes), so the audit flags optimizer DUPLICATION, not
multi-stage designs.

Usage: python tools/python_boundary_audit_r17.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PY_NODES = (
    "MapInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "PythonMapInArrow",
)

# The 13 registered queries whose static plans hold Python nodes (the
# r16 plan-shape sweep, tools/plan_shape_sweep_r16.txt), each with the
# number of DISTINCT Python passes the operator's own DAG structure
# invokes (verified against the operator source during the r17 audit; a
# higher executed count = optimizer duplication).
EXPECTED = {
    "dedup_embedding_cosine": 1,
    "multimodal_features": 1,
    "silver_zones_wkt": 1,
    "sim_ann_lsh_buckets": 2,   # signature pass + verify pass (e9f1f30)
    "sim_neardup_pairs": 1,
    "text_bpe_encode": 1,       # bpe.py pandas_udf tail-length
    "sim_knn_join": 1,
    "dedup_semantic": 1,
    "sim_ivf_kmeans_topk": 2,   # Lloyd assignment + query scoring
    "sim_ivfpq_topk": 2,        # ivf assign + adc score
    "sim_pq_adc_topk": 1,       # encode is behind a checkpoint
    "silver_zones_geom": 1,     # geo.py wkt_parse mapInPandas
    "emb_gram_blas": 1,         # graph.py XtX partials mapInPandas
}


def count_nodes(plan: str) -> tuple[int, int]:
    # An executed AdaptiveSparkPlan prints BOTH the final plan and the
    # "== Initial Plan ==" section — count only the final plan, or every
    # node is double-counted. A formatted static explain repeats node
    # names in the details section — count only the tree (up to the
    # first blank line).
    plan = plan.split("== Initial Plan ==")[0]
    tree = plan.split("\n\n")[0]
    py = sum(tree.count(n) for n in PY_NODES)
    reused = tree.count("ReusedExchange")
    return py, reused


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from bigdata_project_spark import registry
    from bigdata_project_spark.session import get_spark

    spark = get_spark("py-boundary-audit")
    q = registry.queries()
    names = args.names or [n for n in EXPECTED if n in q]
    rows = []
    for name in names:
        fn = q[name]
        df = fn(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        static_plan = buf.getvalue()
        py_static, _ = count_nodes(static_plan)
        spark.sparkContext.setJobDescription(f"py-audit {name}")
        # collect (not the noop sink): the noop write plans its OWN
        # QueryExecution, so the df's executedPlan would still print the
        # initial adaptive plan. collect() executes the df's own
        # QueryExecution, after which toString shows the FINAL adaptive
        # plan with ReusedExchange nodes — the thing this audit reads.
        # (Audit only; outputs here are topk/feature frames, MBs at most.)
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        py_exec, reused = count_nodes(executed)
        expected = EXPECTED.get(name)
        verdict = (
            "SINGLE"
            if expected is not None and py_exec <= expected
            else "DUP"
        )
        rows.append(
            {
                "query": name,
                "py_static": py_static,
                "py_executed": py_exec,
                "reused_exchange": reused,
                "expected_passes": expected,
                "verdict": verdict,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "python_boundary_audit_r17.json"
    )
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
