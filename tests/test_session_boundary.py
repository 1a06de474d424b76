"""Pin the exact-gap session-window boundary semantics (round-4 advisory).

The advisory suspected Spark treats an event at exactly prev_ts + gap as
a NEW session. Experiment says otherwise: Spark MERGES touching session
windows — an event whose window starts exactly where the previous one
ends extends the session (merge condition next.start <= prev.end), while
a gap of 5 min + 1 s starts a new one. The DuckDB gaps-and-islands
oracle therefore marks a new session on ``gap > 5 minutes`` (strict).
The driver fixture happens to contain no exact-300s gaps, so parity
alone would not catch a drift here — this test constructs one and pins
BOTH engines to the measured behavior.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from magictables_spark.plans.queries import REGISTRY
from tests.parity import compare

T0 = datetime(2024, 3, 1, 12, 0, 0)

# user 1: an exact 300-s gap (merges in Spark), then a 299-s gap (also
# merges); user 2: a 301-s gap (new session) — both sides of the
# boundary plus the boundary itself.
EVENTS = pd.DataFrame(
    {
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1, 1, 1, 2, 2],
        "ts": [
            T0,
            T0 + timedelta(seconds=300),
            T0 + timedelta(seconds=300 + 299),
            T0,
            T0 + timedelta(seconds=301),
        ],
    }
)


def _spark_sessions(spark):
    return (
        spark.createDataFrame(EVENTS)
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def test_exact_300s_gap_merges_session(spark):
    rows = {(r.user_id, r.session_start): r.n_events for r in _spark_sessions(spark).collect()}
    assert rows == {
        (1, "2024-03-01 12:00:00"): 3,  # 300-s and 299-s gaps both merge
        (2, "2024-03-01 12:00:00"): 1,
        (2, "2024-03-01 12:05:01"): 1,  # 301-s gap starts a new session
    }


def test_oracle_matches_spark_on_exact_gap(spark):
    """The REGISTERED window_session oracle, run on the synthetic
    boundary fixture, must match the registered Spark construction —
    pinning both engines to the same strict-> semantics."""
    con = duckdb.connect()
    con.register("events", EVENTS)
    rel = con.sql(REGISTRY["window_session"].oracle)
    ok, msg = compare(_spark_sessions(spark), rel)
    assert ok, msg
