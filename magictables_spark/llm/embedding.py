"""Production batch-embedding client (reference utils.py:179-242).

The reference ships a real — if never called by library code — batch
embedding path: provider picked by ``EMBEDDING_PROVIDER``, model by
``EMBEDDING_MODEL``, endpoint/key by ``{PROVIDER}_API_BASE`` /
``{PROVIDER}_API_KEY``; Jina speaks raw ``POST {base}/embeddings``
(OpenAI-shaped response), every other provider goes through
``litellm.embedding``; 5 attempts with exponential backoff
``2^attempt * base + uniform(0, 0.1 * 2^attempt)`` and a raise on the
last failure.  This module is the production twin of that path,
rebuilt with the same gating pattern as ``LiteLLMClient``:

- the transport is INJECTABLE, so committed cassettes replay a
  recorded provider response through the real client code (payload
  assembly, response unwrapping, retry/backoff) with no network and
  no litellm import;
- constructed with no transport, the Jina provider uses stdlib
  ``urllib`` and any other provider lazily imports litellm (gated —
  a clear error tells the caller to inject instead);
- the instance is an ``operators.embed.Embedder`` (callable
  ``Sequence[str] -> list[list[float] | None]``), so it drops
  straight into ``embed_texts(df, ..., embedder=ProviderEmbedder())``
  as the production replacement for the offline ``hash_embedder``.

Workers each construct their own transport lazily (the client pickles
into ``mapInPandas`` tasks before any socket exists), so at 100 TB the
concurrency knob stays the partition count, exactly like the chain
fetcher.
"""

from __future__ import annotations

import json
import os
import random
import time
from typing import Callable, Sequence

__all__ = ["ProviderEmbedder", "jina_http_transport"]

# (payload, api_base, api_key) -> OpenAI-shaped response dict
Transport = Callable[[dict, str, str | None], dict]


def jina_http_transport(payload: dict, api_base: str, api_key: str | None) -> dict:
    """The reference's Jina branch (utils.py:195-214): a bearer-auth
    JSON POST to ``{base}/embeddings``; non-2xx raises OSError (the
    retryable class, like the reference's APIError)."""
    import urllib.error
    import urllib.request

    headers = {"Content-Type": "application/json"}
    if api_key is not None:
        # never send the literal header "Bearer None" — an unset
        # {PROVIDER}_API_KEY omits auth (public/local endpoints) and
        # lets the server return its own 401 for protected ones
        headers["Authorization"] = f"Bearer {api_key}"
    req = urllib.request.Request(
        f"{api_base.rstrip('/')}/embeddings",
        data=json.dumps(payload).encode(),
        headers=headers,
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            body = resp.read()
    except urllib.error.HTTPError as exc:  # pragma: no cover - network
        raise OSError(
            f"embedding request failed with status {exc.code}: "
            f"{exc.read()[:200]!r}"
        ) from exc
    try:
        return json.loads(body.decode())
    except ValueError as exc:
        # malformed 2xx body is RETRYABLE, matching the reference:
        # aiohttp's response.json() raises ContentTypeError — a
        # ClientError subclass — inside its retry class
        # (reference utils.py:203-210, 227)
        raise OSError(
            f"embedding response was not valid JSON: {body[:200]!r}"
        ) from exc


def _litellm_transport(payload: dict, api_base: str, api_key: str | None) -> dict:
    try:
        import litellm
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "litellm not installed; inject a transport instead "
            "(ProviderEmbedder(transport=...))"
        ) from exc
    try:
        resp = litellm.embedding(
            model=payload["model"],
            input=payload["input"],
            api_base=api_base,
            api_key=api_key,
        )
    except litellm.exceptions.APIError as exc:
        # normalize provider errors into the one retryable class
        raise OSError(f"litellm embedding failed: {exc}") from exc
    return resp if isinstance(resp, dict) else resp.model_dump()


class ProviderEmbedder:
    """Retrying batch embedder with the reference's env contract and
    backoff schedule.  ``sleep``/``rand`` are injectable so tests can
    assert the exact delay sequence without waiting."""

    MAX_RETRIES = 5  # reference utils.py:181

    def __init__(
        self,
        model: str | None = None,
        provider: str | None = None,
        *,
        transport: Transport | None = None,
        base_delay: float = 1.0,
        sleep: Callable[[float], None] = time.sleep,
        rand: Callable[[float, float], float] = random.uniform,
    ):
        self.provider = (
            provider or os.getenv("EMBEDDING_PROVIDER", "openai")
        ).lower()
        self.model = model or os.getenv("EMBEDDING_MODEL", "text-embedding-3-small")
        self.api_base = os.getenv(
            f"{self.provider.upper()}_API_BASE", "https://api.openai.com/v1"
        )
        self.api_key = os.getenv(f"{self.provider.upper()}_API_KEY")
        self._transport = transport
        self.base_delay = base_delay
        self._sleep = sleep
        self._rand = rand

    def _resolve_transport(self) -> Transport:
        if self._transport is not None:
            return self._transport
        return jina_http_transport if self.provider == "jina" else _litellm_transport

    def __call__(self, texts: Sequence[str]) -> list[list[float] | None]:
        send = self._resolve_transport()
        payload = {"model": self.model, "input": list(texts)}
        for attempt in range(self.MAX_RETRIES):
            try:
                resp = send(payload, self.api_base, self.api_key)
                return [item["embedding"] for item in resp["data"]]
            except OSError:
                # the retryable class (reference retries ClientError/
                # APIError only; NotImplementedError from the litellm
                # gate and malformed-response errors propagate at once)
                if attempt == self.MAX_RETRIES - 1:
                    raise
                delay = (2**attempt) * self.base_delay + self._rand(
                    0.0, 0.1 * (2**attempt)
                )
                self._sleep(delay)
        raise AssertionError("unreachable")  # pragma: no cover
