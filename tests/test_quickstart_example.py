"""Integration twin of the reference's example.ipynb: run the whole
examples/quickstart.py user journey (ingest -> chain -> NL transform ->
cache -> analytics operators) inside pytest."""

from __future__ import annotations

import os
import sys


def test_quickstart_runs_end_to_end(spark, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    try:
        import quickstart
    finally:
        sys.path.pop(0)

    quickstart.main()
    out = capsys.readouterr().out
    # every stage of the journey reported
    assert "ingested:" in out and "3 rows" in out
    assert "api_box_office" in out  # chain produced api_ columns
    assert "'title': 'Beta'" in out  # NL transform top-rated first
    assert "transform cache: second run used 0 LLM calls" in out
    for slug in ("dedup_exact", "sim_cosine_topk", "funnel_conversion"):
        assert f"{slug}:" in out

def test_pretrain_curation_example_runs(spark, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    try:
        import pretrain_curation
    finally:
        sys.path.pop(0)

    pretrain_curation.main()
    out = capsys.readouterr().out
    assert "pass the repetition gate" in out
    assert "pairs" in out and "PlanAudit: ok" in out
    assert out.strip().endswith("OK")


def test_warehouse_cache_survives_across_sessions(tmp_path):
    """The reference's headline caching behavior (README.md:246-248)
    cross-SESSION: run examples/warehouse_sessions.py twice as separate
    python processes (separate JVMs + SparkSessions) sharing one
    warehouse dir. The second session must perform ZERO API fetches and
    produce identical rows — the cache is the on-disk warehouse, not
    process state."""
    import subprocess

    repo = os.path.join(os.path.dirname(__file__), "..")
    script = os.path.join(repo, "examples", "warehouse_sessions.py")
    wh = str(tmp_path / "wh")
    outs = []
    for _ in range(2):
        r = subprocess.run(
            [sys.executable, script, wh],
            capture_output=True,
            text=True,
            timeout=900,
            cwd=repo,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(r.stdout)
    assert "fetches: 1" in outs[0]
    assert "fetches: 0" in outs[1]
    rows = [
        next(ln for ln in o.splitlines() if ln.startswith("rows:")) for o in outs
    ]
    assert rows[0] == rows[1]
    tables = [
        next(ln for ln in o.splitlines() if ln.startswith("table:")) for o in outs
    ]
    assert tables[0] == tables[1]
