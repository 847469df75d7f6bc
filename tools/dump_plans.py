"""Dump .explain("formatted") for named queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX name...
Writes OUTDIR/<name>_<SUFFIX>.txt for each query name.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from bigdata_project_spark import registry
    from bigdata_project_spark.session import get_spark

    spark = get_spark("dump_plans")
    for name in names:
        fn = registry.queries()[name]
        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
        except Exception as e:  # streaming drains etc. still produce a frame
            buf.write(f"\n[explain failed: {e}]\n")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
