"""Cassette replay for the LIVE LLM client path (VERDICT r3 gap 3).

MockLLM tests hand canned strings straight to the pipeline; these tests
instead replay a RECORDED litellm completion (committed JSON under
tests/fixtures/llm_cassettes/, re-recordable from live calls with
tools/record_llm_cassettes.py) through ``LiteLLMClient`` itself — so the
real client code (message assembly, choices/message unwrapping) plus the
downstream fence extraction and SQL/JSON validation all execute, without
network or litellm installed. The replay transport also pins the prompt
contract: model name and recorded prompt anchors must match or the
replay fails."""

from __future__ import annotations

import json
import os
from types import SimpleNamespace

import pytest

from magictables_spark.llm import LiteLLMClient, generate_rows, key_infer, nl_transform

CASSETTE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "llm_cassettes")


def _to_ns(obj):
    if isinstance(obj, dict):
        return SimpleNamespace(**{k: _to_ns(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_to_ns(x) for x in obj]
    return obj


class CassetteTransport:
    """litellm.completion stand-in that replays a recorded response and
    asserts the outgoing request still matches the recording."""

    def __init__(self, name: str):
        with open(os.path.join(CASSETTE_DIR, f"{name}.json")) as f:
            self.calls = list(json.load(f)["calls"])
        self.n_replayed = 0

    def __call__(self, model: str, messages: list[dict]):
        assert self.calls, "cassette exhausted"
        call = self.calls.pop(0)
        assert model == call["model"], f"model drifted: {model} != {call['model']}"
        prompt = messages[-1]["content"]
        assert messages[-1]["role"] == "user"
        for anchor in call["prompt_must_contain"]:
            assert anchor in prompt, f"prompt contract drifted: {anchor!r} missing"
        self.n_replayed += 1
        return _to_ns(call["response"])


def _client(name: str) -> tuple[LiteLLMClient, CassetteTransport]:
    transport = CassetteTransport(name)
    return LiteLLMClient(model="gpt-4o-mini", completion=transport), transport


def test_transform_cassette_end_to_end(spark):
    """Recorded completion (prose + ```sql fence) -> fence extraction ->
    validate_sql -> actual Spark execution of the generated SQL."""
    df = spark.createDataFrame(
        [("Alpha", 8.1), ("Beta", 9.2), ("Gamma", 7.4)], ["title", "rating"]
    )
    llm, transport = _client("transform")
    out = nl_transform(df, "top 2 movies by rating", llm=llm)
    rows = [(r.title, r.rating) for r in out.collect()]
    assert rows == [("Beta", 9.2), ("Alpha", 8.1)]
    assert transport.n_replayed == 1


def test_key_infer_cassette_binds_placeholder(spark):
    """Placeholder {movie} has no name-matching column, so the
    deterministic fallback raises and the LLM path runs for real on the
    recorded ```json fence."""
    df = spark.createDataFrame([("Alpha",), ("Beta",)], ["film_title"])
    llm, transport = _client("key_infer")
    mapping = key_infer("http://api.example.com/movies/{movie}", df, llm=llm)
    assert mapping == {"movie": "film_title"}
    assert transport.n_replayed == 1


def test_gen_rows_cassette_produces_rows():
    llm, transport = _client("gen_rows")
    rows = generate_rows(llm, "the G7 countries and their capitals")
    assert len(rows) == 7
    assert {"country", "capital"} == set(rows[0])
    assert any(r["capital"] == "Tokyo" for r in rows)
    assert transport.n_replayed == 1


def test_cassette_pins_prompt_contract():
    """If the prompt template drifts away from what was recorded, the
    replay must fail loudly instead of silently replaying a stale
    completion."""
    llm, _ = _client("gen_rows")
    with pytest.raises(AssertionError, match="prompt contract drifted"):
        llm.complete("a prompt that matches no recorded anchors")


def test_cassette_pins_model():
    llm = LiteLLMClient(model="some-other-model", completion=CassetteTransport("gen_rows"))
    with pytest.raises(AssertionError, match="model drifted"):
        llm.complete("Produce tabular data answering this request: G7 countries")
