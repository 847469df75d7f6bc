"""Pin tools/run_pair.py's hour-state classifier to its calibration set.

The matched-pair gate read (BASELINE.md §4h) only counts stable-tagged
pairs, so the classifier's thresholds ARE part of the measurement
methodology. This test replays the 12 round-11 probes
(tools/vm_state_r11.jsonl) against the hand-written BASELINE.md §4g
attributions the thresholds were calibrated on — a silent threshold
edit that re-labels any calibration probe fails here, not in a later
round's bench read. Pure-python, no Spark session.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load_run_pair():
    spec = importlib.util.spec_from_file_location(
        "run_pair", os.path.join(_TOOLS, "run_pair.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


rp = _load_run_pair()

#: utc-hour:minute → hand-written r11 attribution (BASELINE.md §4g);
#: every vm_state_r11.jsonl probe must reproduce its label
_R11_ATTRIBUTION = {
    "17:09": False,
    "17:27": False,
    "18:08": True,
    "18:28": False,
    "18:46": True,
    "19:09": False,
    "19:23": True,
    "19:46": True,
    "20:19": True,
    "20:42": False,
    "20:48": True,
    "21:11": True,
}


def _r11_probes():
    path = os.path.join(_TOOLS, "vm_state_r11.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_calibration_reproduces_all_r11_attributions():
    probes = _r11_probes()
    assert len(probes) == len(_R11_ATTRIBUTION)
    for p in probes:
        key = p["utc"][11:16]
        assert key in _R11_ATTRIBUTION, f"unexpected probe time {p['utc']}"
        assert rp.probe_is_degraded(p) == _R11_ATTRIBUTION[key], (
            f"probe at {p['utc']} classifies "
            f"{'degraded' if rp.probe_is_degraded(p) else 'clean'}, "
            f"attribution says {'degraded' if _R11_ATTRIBUTION[key] else 'clean'}"
        )


CLEAN = {"py1_sec": 0.8, "blas32_sec": 0.5, "jvm20_sec": 2.5}
DEGRADED = {"py1_sec": 1.2, "blas32_sec": 0.5, "jvm20_sec": 2.5}


@pytest.mark.parametrize(
    "pre,mid,post,tag,quotable",
    [
        (CLEAN, CLEAN, CLEAN, "stable", True),
        # a degraded MID taints BOTH halves (conservative: either
        # bracketing probe marks the half)
        (CLEAN, DEGRADED, CLEAN, "degraded", False),
        (CLEAN, CLEAN, DEGRADED, "entered-degraded", False),
        (DEGRADED, CLEAN, CLEAN, "exited-degraded", False),
        (DEGRADED, DEGRADED, DEGRADED, "degraded", False),
    ],
)
def test_pair_tag_from_three_probes(pre, mid, post, tag, quotable):
    info = rp.classify(pre, mid, post)
    assert info["tag"] == tag
    assert info["gate_quotable"] is quotable
    assert info["spark_half_degraded"] == (
        rp.probe_is_degraded(pre) or rp.probe_is_degraded(mid)
    )
    assert info["duck_half_degraded"] == (
        rp.probe_is_degraded(mid) or rp.probe_is_degraded(post)
    )


def test_each_threshold_triggers_alone():
    base = dict(CLEAN)
    assert not rp.probe_is_degraded(base)
    for key, limit in (
        ("py1_sec", rp.PY1_DEGRADED),
        ("blas32_sec", rp.BLAS_DEGRADED),
        ("jvm20_sec", rp.JVM20_DEGRADED),
    ):
        p = dict(base)
        p[key] = limit + 0.01
        assert rp.probe_is_degraded(p), f"{key} over threshold must classify degraded"
        p[key] = limit
        assert not rp.probe_is_degraded(p), f"{key} at threshold must stay clean"
