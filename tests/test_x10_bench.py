"""Standing x10 scale gate (r7, verdict item 4).

Compares the committed x10 bench mirror against the same round's x1
(sf0.1) mirror, per query. The r6 one-off probes caught the
WindowGroupLimit and skew lessons; this pins the x10 check as a
per-round artifact so a plan regression sf0.1 is too small to show
fails a test instead of waiting for the next hand-run probe.

Bounds: a non-pair-bound headline query may cost at most
max(3.0x its x1 time, x1 + 0.5 s) at 10x the data (the absolute slack
absorbs scheduling constants on sub-0.3 s bases); the pair-bound
dedup lines (candidate/true-pair output grows with corpus density)
are bounded by linear-in-output growth, 10x. Skips when either
mirror is absent (fresh clone); rebuild recipe in SCALING.md
"Standing x10 bench".
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAIR_BOUND = {"q_dedup_jaccard", "q_dedup_jaccard_pruned", "q_dedup_near",
              "q_dedup_lsh_jaccard"}


def _latest(pattern: str):
    # sort by parsed round number, not path string: lexicographic order
    # would put r100 before r99 and silently compare a stale mirror
    paths = sorted(
        glob.glob(os.path.join(ROOT, pattern)),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not paths:
        pytest.skip(f"no {pattern} mirror committed")
    return json.load(open(paths[-1])), paths[-1]


def test_x10_ratios_bounded():
    x10, x10_path = _latest("BENCH_LOCAL_x10_r*.json")
    rnd = re.search(r"x10_(r\d+)\.json$", x10_path).group(1)
    x1_path = os.path.join(ROOT, f"BENCH_LOCAL_{rnd}.json")
    if not os.path.exists(x1_path):
        pytest.skip(f"no matching x1 mirror {x1_path}")
    x1 = json.load(open(x1_path))

    bad = []
    for name, t10 in x10["queries"].items():
        base = x1["queries"].get(name)
        if base is None:
            continue
        limit = 10.0 * base if name in PAIR_BOUND else max(3.0 * base, base + 0.5)
        if t10 > limit:
            bad.append(f"{name}: x1={base:.3f}s x10={t10:.3f}s limit={limit:.3f}s")
    assert not bad, "x10 scale regression:\n" + "\n".join(bad)
