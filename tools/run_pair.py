"""Matched-pair bench driver with automatic hour-state tagging.

Runs one full sf0.1 matched pair — the drift rule's honest unit
(BASELINE.md §2): Spark `bench.py` then DuckDB `tools/duckdb_bench.py`
on the same fixture back-to-back — bracketed by THREE
`tools/vm_state_probe.py` fingerprints (pre / between halves / post),
and stamps the resulting hour-state tag INTO both pair artifacts so the
round's gate ratio can be quoted from stable pairs only (r11 verdict
item 7: r11a proved a stable-fingerprint pair needs no attribution
caveat; this makes that read automatic instead of hand-derived).

Probe classification, calibrated on the 12 round-11 probes
(tools/vm_state_r11.jsonl) against BASELINE.md §4g's hand-written
attributions — the rule below reproduces every one of them
(clean: 17:09, 17:27, 18:28, 19:09, 20:42; degraded: 18:08, 18:46,
19:23, 19:46, 20:19, 20:48, 21:11):

    degraded  iff  py1 > 0.92 s  or  blas32 > 1.8 s  or  jvm20 > 4.5 s

Pair tag from the three probes (a half is degraded if either of its
bracketing probes is):

    stable            both halves clean        ← gate-quotable ratio
    entered-degraded  spark clean, duck degraded
    exited-degraded   spark degraded, duck clean
    degraded          both halves degraded

Usage:
    python tools/run_pair.py r12a
writes tools/bench_detail_sf0.1_r12a.json + tools/duckdb_bench_sf0.1_r12a.json
(each carrying a "pair" block with the tag and the three fingerprints)
and appends the probes to tools/vm_state_r12.jsonl.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

PY1_DEGRADED = 0.92
BLAS_DEGRADED = 1.8
JVM20_DEGRADED = 4.5


def probe_is_degraded(p: dict) -> bool:
    return (
        p["py1_sec"] > PY1_DEGRADED
        or p["blas32_sec"] > BLAS_DEGRADED
        or p["jvm20_sec"] > JVM20_DEGRADED
    )


def classify(pre: dict, mid: dict, post: dict) -> dict:
    spark_degraded = probe_is_degraded(pre) or probe_is_degraded(mid)
    duck_degraded = probe_is_degraded(mid) or probe_is_degraded(post)
    tag = {
        (False, False): "stable",
        (False, True): "entered-degraded",
        (True, False): "exited-degraded",
        (True, True): "degraded",
    }[(spark_degraded, duck_degraded)]
    return {
        "tag": tag,
        "gate_quotable": tag == "stable",
        "spark_half_degraded": spark_degraded,
        "duck_half_degraded": duck_degraded,
        "probes": {"pre": pre, "mid": mid, "post": post},
        "thresholds": {
            "py1_sec": PY1_DEGRADED,
            "blas32_sec": BLAS_DEGRADED,
            "jvm20_sec": JVM20_DEGRADED,
            "calibration": "12/12 r11 probes vs BASELINE.md 4g attributions",
        },
    }


def run_json_line(cmd: list[str]) -> dict:
    """Run a tool that prints one JSON object as its last stdout line."""
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, check=True
    ).stdout
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in output of {cmd}: {out[-500:]}")


def main() -> None:
    pair = sys.argv[1]  # e.g. r12a
    round_tag = re.match(r"(r\d+)", pair).group(1)
    vm_log = os.path.join(HERE, f"vm_state_{round_tag}.jsonl")

    def probe() -> dict:
        p = run_json_line([sys.executable, os.path.join(HERE, "vm_state_probe.py")])
        with open(vm_log, "a") as f:
            f.write(json.dumps(p, separators=(",", ":")) + "\n")
        state = "DEGRADED" if probe_is_degraded(p) else "clean"
        print(f"[pair {pair}] probe {p['utc']} {state} "
              f"py1={p['py1_sec']} blas={p['blas32_sec']} jvm20={p['jvm20_sec']}",
              flush=True)
        return p

    pre = probe()
    print(f"[pair {pair}] spark half (bench.py) ...", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, capture_output=True, text=True, check=True,
    )
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
        spark = json.load(f)
    print(f"[pair {pair}] spark total {spark['value']} s", flush=True)
    mid = probe()
    print(f"[pair {pair}] duckdb half (tools/duckdb_bench.py) ...", flush=True)
    duck = run_json_line([sys.executable, os.path.join(HERE, "duckdb_bench.py")])
    print(f"[pair {pair}] duckdb total {duck['value']} s", flush=True)
    post = probe()

    info = classify(pre, mid, post)
    info["ratio"] = round(spark["value"] / duck["value"], 2)
    # code-identity provenance: which commit both halves measured (the
    # BASELINE.md pair notes previously hand-wrote this; dirty = any
    # uncommitted source change, so a dirty stamp means "not exactly
    # this SHA")
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    dirty = bool(
        subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no",
             "--", "bigdata_project_spark", "bench.py", "__spark_entry__.py",
             "tools/duckdb_bench.py"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
    )
    info["code"] = {"head": head, "source_dirty": dirty}
    spark["pair"] = info
    duck["pair"] = info
    sp = os.path.join(HERE, f"bench_detail_sf0.1_{pair}.json")
    dp = os.path.join(HERE, f"duckdb_bench_sf0.1_{pair}.json")
    with open(sp, "w") as f:
        json.dump(spark, f, indent=1, sort_keys=True)
        f.write("\n")
    with open(dp, "w") as f:
        json.dump(duck, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"[pair {pair}] {spark['value']} s vs {duck['value']} s = "
        f"{info['ratio']}x  tag={info['tag']}"
        f"{'  (gate-quotable)' if info['gate_quotable'] else ''}",
        flush=True,
    )


if __name__ == "__main__":
    main()
