"""Full-registry timing sweep at sf0.1 — the 10x-scale smoke the
sf0.01 correctness gate cannot provide.

Runs every registered query once (after a JVM/scan warm-up query) with
the noop sink and reports per-slug wall time, the slowest 15, and any
errors. This sweep found round 3's four scale defects (corr_exact
int64 overflow, the missing levenshtein cap, simjoin's string-array
verify, tfidf_mllib's dense 2^16 projection) — run it per round.

Usage: python tools/registry_sweep.py [--sf=/root/testdata/sf0.1]
           [--spill] [--out=/tmp/sweep.json]

``--spill`` (round-6 verdict item 7) additionally records, per query,
the shuffle spill (memory/disk bytes) and peak execution memory of the
stages that query executed, read from the Spark status REST API — so
"no spill at sf1" is a measured number, not an inference. Implies the
UI (SPARK_GRAFT_UI=1).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _StageMeter:
    """Per-query stage-metric deltas via the status REST API (the UI
    must be enabled). PySpark exposes no SparkListener hook, but every
    completed stage's memoryBytesSpilled / diskBytesSpilled /
    peakExecutionMemory is served by /api/v1; diffing the completed-
    stage set around each query attributes them per slug."""

    def __init__(self, spark):
        import urllib.request

        self._url = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{spark.sparkContext.applicationId}/stages"
        self._urlopen = urllib.request.urlopen
        self._seen: set[tuple[int, int]] = set()
        self.mark()  # swallow warm-up stages

    def _stages(self):
        # the UI REST endpoint is observability, not correctness: a
        # transient refusal (UI thread busy/restarting under load) must
        # not kill a multi-hour sweep — degrade to "no new stages seen"
        try:
            with self._urlopen(f"{self._url}?status=complete", timeout=30) as r:
                return json.load(r)
        except OSError as e:
            print(f"  (stage meter unavailable: {e})", flush=True)
            return []

    def mark(self) -> None:
        self._seen |= {
            (s["stageId"], s["attemptId"]) for s in self._stages()
        }

    def delta(self) -> dict:
        new = [
            s
            for s in self._stages()
            if (s["stageId"], s["attemptId"]) not in self._seen
        ]
        self._seen |= {(s["stageId"], s["attemptId"]) for s in new}
        return {
            "n_stages": len(new),
            "memory_spill_bytes": sum(s.get("memoryBytesSpilled", 0) for s in new),
            "disk_spill_bytes": sum(s.get("diskBytesSpilled", 0) for s in new),
            "peak_execution_memory": max(
                (s.get("peakExecutionMemory", 0) for s in new), default=0
            ),
            "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
        }


def main() -> int:
    sf = "/root/testdata/sf0.1"
    spill = False
    out = None
    only: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--sf"):
            sf = a.split("=", 1)[1]
        elif a == "--spill":
            spill = True
            os.environ["SPARK_GRAFT_UI"] = "true"
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif not a.startswith("--"):
            only.append(a)  # slug filter: sweep just these

    from magictables_spark.plans.queries import REGISTRY
    from magictables_spark.session import get_spark

    spark = get_spark("registry_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # same per-core split geometry as bench.py: the sf fixtures are
    # single parquet files, so the 128 MB default gives ONE map task per
    # table and serializes every map-heavy residual (the round-7 sf1
    # sweep saw a 245M-evaluation funnel join leg run on 1 core); 2 MB
    # splits engage the whole local[N] pool, matching what a many-file
    # production table gets for free
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))

    # warm the JVM + scan path so the alphabetically-first slug doesn't
    # absorb ~5 s of one-time cost and read as a regression
    next(iter(REGISTRY.values())).fn(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()

    meter = _StageMeter(spark) if spill else None

    from magictables_spark.plans.registry import QuadraticInputError

    times: dict[str, object] = {}
    metrics: dict[str, dict] = {}

    def _flush() -> None:
        # incremental checkpoint: a killed/crashed sweep keeps every
        # completed slug's reading (round-11: a 48-min sweep died on a
        # straggler and lost all 42 finished timings — never again)
        if out:
            tmp = f"{out}.tmp"
            with open(tmp, "w") as f:
                json.dump({"sf": sf, "times": times, "metrics": metrics}, f, indent=1)
            os.replace(tmp, out)

    todo = {s: REGISTRY[s] for s in only} if only else REGISTRY
    for slug, spec in sorted(todo.items()):
        t = time.perf_counter()
        try:
            spec.fn(spark, sf).write.format("noop").mode("overwrite").save()
            times[slug] = round(time.perf_counter() - t, 3)
            if meter is not None:
                metrics[slug] = meter.delta()
            _flush()
        except QuadraticInputError as e:
            # the declared-quadratic exact baselines REFUSE above the
            # guard — at probe scales that refusal is the correct
            # behavior (the scale twin is named in the message), not a
            # sweep failure
            times[slug] = f"GUARDED {str(e)[:110]}"
            if meter is not None:
                meter.mark()
            _flush()
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            times[slug] = f"ERR {type(e).__name__}: {str(e)[:90]}"
            if meter is not None:
                meter.mark()
            _flush()

    print(json.dumps(times))
    errs = {
        k: v for k, v in times.items()
        if isinstance(v, str) and v.startswith("ERR")
    }
    guarded = {
        k: v for k, v in times.items()
        if isinstance(v, str) and v.startswith("GUARDED")
    }
    num = {k: v for k, v in times.items() if not isinstance(v, str)}
    print(
        f"\nTOTAL {sum(num.values()):.1f}s over {len(num)} queries, "
        f"{len(errs)} errors, {len(guarded)} guarded-quadratic refusals"
    )
    for k, v in guarded.items():
        print("GUARDED", k, v[8:])
    for k, v in sorted(num.items(), key=lambda kv: -kv[1])[:15]:
        line = f"{k:35s} {v:7.2f}"
        if k in metrics:
            m = metrics[k]
            line += (
                f"  spill(mem/disk)={m['memory_spill_bytes']}/{m['disk_spill_bytes']}B"
                f" peak_exec_mem={m['peak_execution_memory']}B"
            )
        print(line)
    if metrics:
        spilled = {
            k: m for k, m in metrics.items()
            if m["memory_spill_bytes"] or m["disk_spill_bytes"]
        }
        print(f"\nSPILL: {len(spilled)}/{len(metrics)} queries spilled")
        for k, m in sorted(
            spilled.items(), key=lambda kv: -kv[1]["disk_spill_bytes"]
        )[:15]:
            print(f"{k:35s} mem={m['memory_spill_bytes']} disk={m['disk_spill_bytes']}")
    for k, v in errs.items():
        print("ERR", k, v)
    if out:
        with open(out, "w") as f:
            json.dump({"sf": sf, "times": times, "metrics": metrics}, f, indent=1)
        print("wrote", out)
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
