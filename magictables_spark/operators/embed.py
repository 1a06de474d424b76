"""embed_texts — batch text embedding (reference utils.py:179-242:
litellm/Jina batch embeddings with retry; declared but never called by
library code — made real here).

Distributed shape: Arrow-batched ``mapInPandas``; each partition sends
its texts to the embedder in batches (the reference's asyncio batching
moves inside the task, like the chain fetcher). The embedder is
injectable: tests and offline runs use ``hash_embedder`` (deterministic
md5-seeded vectors — same contract, no network); production passes
``magictables_spark.llm.embedding.ProviderEmbedder`` — the gated
litellm/Jina client with the reference's env contract and 5-retry
backoff (utils.py:179-242) — or any other client-backed callable.
Failures embed as null, never task failure.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame

Embedder = Callable[[Sequence[str]], list[list[float] | None]]


def hash_embedder(dim: int = 32) -> Embedder:
    """Deterministic offline embedder: md5-seeded floats per text.
    Identical text -> identical vector (useful for dedup tests)."""

    def embed(texts: Sequence[str]) -> list[list[float] | None]:
        import hashlib

        out: list[list[float] | None] = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            h = hashlib.md5(t.encode()).digest()
            out.append([((h[i % 16] ^ (i // 16 * 37)) / 255.0) - 0.5 for i in range(dim)])
        return out

    return embed


def embed_texts(
    df: DataFrame,
    text_col: str,
    out_col: str = "embedding",
    embedder: Embedder | None = None,
    batch_size: int = 64,
    dim: int = 32,
) -> DataFrame:
    """Add an ``array<float>`` embedding column computed in Arrow
    batches. At 100 TB the bottleneck is the embedder endpoint, not
    Spark — partition count bounds concurrent requests."""
    emb = embedder or hash_embedder(dim)
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs: list = []
            texts = pdf[text_col].tolist()
            for i in range(0, len(texts), batch_size):
                vecs.extend(emb(texts[i : i + batch_size]))
            out = pdf.copy()
            out[out_col] = vecs
            yield out

    schema = ", ".join(f"`{name}` {dtype}" for name, dtype in df.dtypes) + f", `{out_col}` array<float>"
    return df.mapInPandas(run, schema=schema)
