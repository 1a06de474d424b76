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
