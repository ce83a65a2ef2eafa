"""Embeddings: deterministic feature-hashing encoder (the sandbox
stand-in for all-MiniLM-L6-v2, ``indexer/ingest.py:38,71`` — no model
downloads here) + cosine expressions shared by similarity search.

The encoder is an *iterator* pandas UDF so per-partition setup is
amortized exactly the way a real torch model would be (load once per
executor, then stream Arrow batches) — swapping in sentence-transformers
is a one-function change.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

DIM = 384
_TOKEN_RE = re.compile(r"\w+")


def encode_texts(texts: list[str], dim: int = DIM) -> np.ndarray:
    """Deterministic hash-projection embedding: token → (index, sign)
    via crc32, L2-normalized. Pure function of the text."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        if not t:
            continue
        for tok in _TOKEN_RE.findall(t.lower()):
            h = zlib.crc32(tok.encode("utf-8"))
            idx = h % dim
            sign = 1.0 if (h >> 31) & 1 == 0 else -1.0
            out[i, idx] += sign
        n = np.linalg.norm(out[i])
        if n > 0:
            out[i] /= n
    return out


@pandas_udf(ArrayType(FloatType()))
def embed_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # model-load site (amortized per partition; ``indexer/ingest.py:38``)
    for texts in batches:
        vecs = encode_texts(texts.fillna("").tolist())
        yield pd.Series(list(vecs))


# ------------------------------------------------------- cosine algebra
# Pure Column expressions over array<float> — JVM-side, codegen'd,
# and 1:1 translatable to DuckDB's list_cosine_similarity for oracles.


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
