"""Facade round-trip + default_fetcher retry policy (reference
magictable.py:317-347: 5 retries, exp backoff, {} on final failure)."""

from __future__ import annotations

import pytest

from magictables_spark import MagicFrame, NotSoMagicFrame
from magictables_spark.sources import default_fetcher


def test_facade_roundtrip(spark):
    import pandas as pd

    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    ns = NotSoMagicFrame.from_pandas(spark, pdf)
    assert isinstance(ns.magic, MagicFrame)
    assert len(ns.magic.sources) == 1  # raw-data provenance id
    back = ns.to_pandas().sort_values("a").reset_index(drop=True)
    assert back.equals(pdf)


def test_facade_delegation_rewraps(spark):
    import pandas as pd

    ns = NotSoMagicFrame.from_pandas(spark, pd.DataFrame({"a": [1, 2, 3]}))
    filtered = ns.filter("a > 1")  # delegated through MagicFrame -> DataFrame
    assert isinstance(filtered, NotSoMagicFrame)
    assert sorted(filtered.to_pandas()["a"]) == [2, 3]


def test_facade_row_cap(spark):
    import pandas as pd

    ns = NotSoMagicFrame.from_pandas(spark, pd.DataFrame({"a": range(100)}))
    ns._row_cap = 10
    assert len(ns.to_pandas()) == 10


def test_default_fetcher_retries_then_empty(monkeypatch):
    """All attempts fail -> {} (null payload, not an exception), with
    the reference's 5-attempt policy."""
    import magictables_spark.sources as src

    attempts = []

    def failing_urlopen(url, timeout=None):
        attempts.append(url)
        raise OSError("connection refused")

    monkeypatch.setattr(src.urllib.request, "urlopen", failing_urlopen)
    monkeypatch.setattr(src.time, "sleep", lambda s: None)  # no real backoff in tests
    out = default_fetcher("http://nope.invalid/x")
    assert out == {}
    assert len(attempts) == 5


def test_default_fetcher_recovers_midway(monkeypatch):
    import io
    import magictables_spark.sources as src

    calls = {"n": 0}

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def flaky_urlopen(url, timeout=None):
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("flaky")
        return FakeResp(b'{"ok": true}')

    monkeypatch.setattr(src.urllib.request, "urlopen", flaky_urlopen)
    monkeypatch.setattr(src.time, "sleep", lambda s: None)
    assert default_fetcher("http://flaky/x") == {"ok": True}
    assert calls["n"] == 3


def test_default_fetcher_appends_params(monkeypatch):
    import io
    import magictables_spark.sources as src

    seen = []

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(
        src.urllib.request,
        "urlopen",
        lambda url, timeout=None: seen.append(url) or FakeResp(b"{}"),
    )
    default_fetcher("http://h/p", {"a": 1, "b": "x"})
    assert seen == ["http://h/p?a=1&b=x"]
    default_fetcher("http://h/p?c=2", {"a": 1})
    assert seen[1] == "http://h/p?c=2&a=1"
