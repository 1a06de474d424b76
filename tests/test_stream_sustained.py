"""Sustained multi-batch streaming: bounded-state assertion (round-6
verdict item 4).

tools/stream_probe.py drives the stateful families over >= 20 REAL
micro-batches (time-ordered shards, maxFilesPerTrigger=1) with the
watermark advancing between batches. Here two representative families —
the windowed agg (tumbling) and the heaviest state holder (the
stream-stream interval join) — must (a) actually execute >= 20 data
batches, (b) hold their state-row trajectory FLAT from mid-stream on
(plateau_ratio ~ 1.0; unbounded state reads ~2.0 on linear growth),
and (c) keep processing input after the plateau (the plateau isn't the
stream ending). The full 6-family sf0.1 run is recorded in SCALING.md.
"""

from __future__ import annotations

import os
import sys

SF = "/root/testdata/sf0.01"
SHARDS = 20

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def _run(spark, family):
    from stream_probe import run_family, stage_shards

    src = stage_shards(spark, SF, SHARDS)
    ckpt_root = os.path.join(os.path.dirname(src), f"ckpt_test_{family}")
    return run_family(spark, src, family, ckpt_root)


def _assert_bounded(result):
    s = result["summary"]
    assert s["n_data_batches"] >= SHARDS  # genuinely multi-batch
    assert s["state_rows_max"] > 0  # the operator really holds state
    # bounded state: flat from mid-stream on (watermark eviction keeps
    # pace with new windows); linear growth would read ~2.0
    assert s["plateau_ratio"] is not None and s["plateau_ratio"] <= 1.15, s
    # and rows kept flowing after the plateau — the last quartile of
    # batches still carries a meaningful share of the input
    data = [b for b in result["batches"] if b["input_rows"] > 0]
    tail_rows = sum(b["input_rows"] for b in data[-len(data) // 4 :])
    assert tail_rows > 0.05 * s["total_rows"], s


def test_tumbling_state_plateaus_over_20_batches(spark):
    _assert_bounded(_run(spark, "tumbling"))


def test_interval_join_state_plateaus_over_20_batches(spark):
    _assert_bounded(_run(spark, "join"))
