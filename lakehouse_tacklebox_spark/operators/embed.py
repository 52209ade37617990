"""Embedding generation: iterator pandas UDF with per-partition model init.

The reference embeds/summarizes documents with an iterator-of-series
pandas UDF so the model loads ONCE per executor task, then streams
Arrow batches through it (llm-dolly-chatbot/02-Data-preparation.py:
169-183, F5 in SURVEY.md §2.10). Same dataflow here; the "model" is
injected, and the default is a deterministic hash-projection embedder
(no ML libraries in this environment) — a real pipeline passes a
sentence-transformer loader and nothing else changes.

Scale notes: iterator form amortizes model load across the whole
partition instead of per batch; embeddings stay in Arrow end to end.
Batch size is controlled by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


class HashEmbedder:
    """Deterministic stand-in model: token hashes scatter-added into a
    fixed-dim vector, L2-normalized. Loads "weights" at construction so
    the once-per-partition init is observable in tests."""

    def __init__(self, dim: int = 16):
        self.dim = dim
        self.init_count = 1  # stands in for weight loading

    def encode(self, texts: pd.Series) -> pd.Series:
        import zlib

        out = []
        for t in texts:
            vec = np.zeros(self.dim, dtype="float32")
            for tok in (t or "").lower().split():
                # crc32, not builtin hash(): per-process salting would make
                # driver and executors disagree
                h = zlib.crc32(tok.encode("utf-8")) & 0x7FFFFFFF
                vec[h % self.dim] += 1.0 + (h % 7) * 0.1
            norm = float(np.linalg.norm(vec))
            out.append((vec / norm if norm else vec).tolist())
        return pd.Series(out)


def embed_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 16,
    model_loader: Callable[[], object] | None = None,
) -> DataFrame:
    """Append an embedding column. ``model_loader`` is called once per
    partition (iterator pandas UDF), not once per batch or row."""
    loader = model_loader or (lambda: HashEmbedder(dim))

    @pandas_udf("array<float>")
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = loader()  # once per task — the F5 pattern
        for texts in batches:
            yield model.encode(texts)

    return df.withColumn(out_col, _embed(text_col))
