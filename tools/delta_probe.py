"""One-shot probe: is a transactional table format (Delta/Iceberg)
available in this image, so operators/merge.py could switch its
emulated MERGE to a real ``MERGE INTO``? (r9 verdict item 7: either
land the twin or record the negative probe once and drop the caveat.)

Writes tools/delta_probe_result.json. Checks, in order:
1. python packages (delta-spark / pyiceberg),
2. datasource registration (spark.read.format("delta") on a dummy path),
3. catalog SQL (CREATE TABLE ... USING delta / iceberg).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bigdata_project_spark.session import get_spark

    res: dict[str, object] = {"probe": "transactional-merge availability"}
    res["delta_spark_pkg"] = importlib.util.find_spec("delta") is not None
    res["pyiceberg_pkg"] = importlib.util.find_spec("pyiceberg") is not None
    spark = get_spark("delta_probe")
    res["spark_version"] = spark.version
    for fmt in ("delta", "iceberg"):
        try:
            spark.read.format(fmt).load("/tmp/__nonexistent_probe__")
            res[f"{fmt}_datasource"] = "available"
        except Exception as e:  # noqa: BLE001 — classifying the failure IS the probe
            t = str(e)
            if "DATA_SOURCE_NOT_FOUND" in t or "Failed to find" in t:
                res[f"{fmt}_datasource"] = "MISSING_JARS (DATA_SOURCE_NOT_FOUND)"
            else:
                res[f"{fmt}_datasource"] = "present-but-errored: " + t[:160]
        try:
            spark.sql(f"CREATE TABLE __probe_{fmt} (id INT) USING {fmt}")
            spark.sql(f"DROP TABLE __probe_{fmt}")
            res[f"{fmt}_catalog_sql"] = "available"
        except Exception as e:  # noqa: BLE001
            t = str(e)
            res[f"{fmt}_catalog_sql"] = (
                "MISSING_JARS (DATA_SOURCE_NOT_FOUND)"
                if "DATA_SOURCE_NOT_FOUND" in t or "Failed to find" in t
                else t[:160]
            )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "delta_probe_result.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
