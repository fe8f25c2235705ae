"""BM25 scoring in float32, matching the reference engine's golden scores.

The reference (quickwit-search/src/tests.rs:617-709, test_sort_bm25) pins
exact f32 scores for three indexing regimes:
  - record=freq + fieldnorms: full BM25
  - record=basic + fieldnorms: term frequency treated as 1
  - fieldnorms disabled: constant length norm

Formula (Lucene-style, k1=1.2, b=0.75):
    idf        = ln(1 + (N - df + 0.5) / (df + 0.5))      [computed in f32]
    weight     = idf * (k1 + 1)                            [f32]
    tf_norm(d) = tf / (tf + k1 * (1 - b + b * len(d)/avg)) [f32]
    score      = weight * tf_norm                          [f32]

The f32 evaluation order above reproduces the reference goldens bit-for-bit
(e.g. title:one -> [(0.1738279, 2), (0.15965714, 1), (0.12343242, 0)]).

Field lengths are stored quantized to a byte id via FIELD_NORMS_TABLE
(exact for lengths <= 40, geometric with 8 steps per doubling beyond — the
precise >40 table of the underlying library is not pinned by the reference
repo; ours is documented here and shared by engine and test oracle).
"""

from __future__ import annotations

import numpy as np

K1 = np.float32(1.2)
B = np.float32(0.75)
# exact-double variants for the SQL-oracle-comparable f64 scoring paths
# (float(np.float32(1.2)) != 1.2 — the f32 round-trip must not leak into
# the f64 formula the DuckDB oracle reproduces with literal 1.2)
K1_F64 = 1.2
B_F64 = 0.75


def _build_fieldnorm_table() -> np.ndarray:
    table = list(range(41))
    v = 40.0
    while len(table) < 256:
        v *= 2.0 ** (1.0 / 8.0)
        nxt = max(table[-1] + 1, int(v))
        table.append(min(nxt, 2**32 - 1))
    return np.asarray(table, dtype=np.int64)


FIELD_NORMS_TABLE = _build_fieldnorm_table()


def fieldnorm_to_id(lengths: np.ndarray) -> np.ndarray:
    """Quantize token counts to byte ids (largest id whose value <= len)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    ids = np.searchsorted(FIELD_NORMS_TABLE, lengths, side="right") - 1
    return np.clip(ids, 0, 255).astype(np.uint8)


def id_to_fieldnorm(ids: np.ndarray) -> np.ndarray:
    return FIELD_NORMS_TABLE[np.asarray(ids, dtype=np.int64)]


def idf_f32(doc_freq: int, doc_count: int) -> np.float32:
    """IDF in f32 arithmetic (order matters for bit-exactness)."""
    x = np.float32(1.0) + (
        (np.float32(doc_count) - np.float32(doc_freq) + np.float32(0.5))
        / (np.float32(doc_freq) + np.float32(0.5))
    )
    return np.float32(np.log(x))


class Bm25Weight:
    """Per-(term, segment) BM25 weight with a precomputed norm cache
    indexed by fieldnorm id (mirrors the reference's cached tf-norm table)."""

    __slots__ = ("weight", "cache")

    def __init__(self, doc_freq: int, doc_count: int, avg_fieldnorm: float,
                 boost: float = 1.0):
        idf = idf_f32(doc_freq, doc_count)
        self.weight = np.float32(idf * (K1 + np.float32(1.0))) * np.float32(boost)
        lens = id_to_fieldnorm(np.arange(256)).astype(np.float32)
        avg = np.float32(avg_fieldnorm) if avg_fieldnorm > 0 else np.float32(1.0)
        self.cache = (K1 * (np.float32(1.0) - B + B * lens / avg)).astype(
            np.float32)

    def score(self, tfs: np.ndarray, fieldnorm_ids: np.ndarray) -> np.ndarray:
        """Vectorized f32 scores for posting entries."""
        tf = np.asarray(tfs, dtype=np.float32)
        norm = self.cache[np.asarray(fieldnorm_ids, dtype=np.int64)]
        return (self.weight * (tf / (tf + norm))).astype(np.float32)

    def max_score(self, max_tf: np.ndarray, min_fieldnorm_id: np.ndarray
                  ) -> np.ndarray:
        """Upper bound of score for a block given its max tf and min
        fieldnorm id (block-max WAND metadata)."""
        return self.score(max_tf, min_fieldnorm_id)


def avg_fieldnorm_f32(fieldnorm_ids: np.ndarray) -> np.float32:
    """Average decoded fieldnorm of a segment, f32 division."""
    if len(fieldnorm_ids) == 0:
        return np.float32(0.0)
    total = id_to_fieldnorm(fieldnorm_ids).sum()
    return np.float32(np.float32(total) / np.float32(len(fieldnorm_ids)))
