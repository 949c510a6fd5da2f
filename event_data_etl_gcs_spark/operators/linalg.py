"""Distributed embedding linear algebra: Gram matrix / covariance and
power-iteration PCA — the whitening/projection primitives an embedding
curation pipeline needs (e.g. PCA-whitening before semantic dedup, or
low-rank projection before ANN indexing).

The distributed piece is the Gram matrix G[i,j] = sum_d x_di * x_dj.
Cross-engine exactness uses the round-6 quantized-integer device
(operators/clustering.QMEAN_SCALE): each product quantizes to
q = floor(x_i * x_j * 2^20 + 0.5) — the IEEE product is correctly
rounded identically in every engine, the power-of-two multiply only
shifts the exponent, floor(x + 0.5) is the portable rounding — and
int64 sums are exact in ANY order, so the result is
partitioning-independent AND identical between the relational
(conformance) spelling and the per-partition numpy (scale) spelling.

Scale shape: the relational form explodes dim^2/2 rows per vector —
fine at conformance scale, quadratic-in-dim data motion at 100 TB. The
scale path computes per-partition partial Grams in numpy (one
dim x dim int64 matrix per partition via mapInPandas) and sums the
partials: data moved = n_partitions * dim^2 longs, the corpus is
scanned once and never shuffled.

Power iteration runs DRIVER-SIDE on the dim x dim Gram (numpy, fixed
iteration count, deterministic seed vector) — the only data it touches
is the already-reduced matrix, so there is nothing distributed left to
get wrong; verified against numpy.linalg.eigh in tests (rows-only:
float-iterative, the graph_pagerank exemption class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import QMEAN_SCALE

GRAM_FOLD_MAX_N = 100_000  # relational spelling below; numpy partials above


def _gram_relational(emb: DataFrame, dim: int, id_col: str, vec_col: str) -> DataFrame:
    """(i, j, qsum) for i <= j — the oracle-mirrored spelling."""
    pairs = emb.select(
        F.posexplode(
            F.expr(
                f"flatten(transform(sequence(1, {dim}), gi -> "
                f"transform(sequence(gi, {dim}), gj -> struct(gi AS gi, gj AS gj, "
                f"CAST(floor(CAST(element_at({vec_col}, gi) AS DOUBLE) * "
                f"CAST(element_at({vec_col}, gj) AS DOUBLE) * {QMEAN_SCALE!r} + 0.5) "
                f"AS BIGINT) AS q))))"
            )
        ).alias("__p", "s")
    ).select(F.col("s.gi").alias("i"), F.col("s.gj").alias("j"), F.col("s.q").alias("q"))
    return pairs.groupBy("i", "j").agg(F.sum("q").alias("qsum"))


def _gram_partials(emb: DataFrame, dim: int, id_col: str, vec_col: str) -> DataFrame:
    """Per-partition numpy partial Grams, identical integers by
    construction (same quantization per element pair, int64 sums)."""
    import numpy as np
    import pandas as pd

    def fn(batches):
        acc = np.zeros((dim, dim), np.int64)
        any_rows = False
        chunk = 256  # keep the n x dim x dim product tensor cache-sized
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            for s in range(0, len(X), chunk):
                C = X[s : s + chunk]
                P = C[:, :, None] * C[:, None, :]
                P *= QMEAN_SCALE
                P += 0.5
                np.floor(P, out=P)
                acc += P.astype(np.int64).sum(axis=0)
        if not any_rows:
            return
        iu = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "i": (iu[0] + 1).astype(np.int64),
                "j": (iu[1] + 1).astype(np.int64),
                "q": acc[iu],
            }
        )

    parts = emb.select(vec_col).mapInPandas(fn, schema="i long, j long, q long")
    return parts.groupBy("i", "j").agg(F.sum("q").alias("qsum"))


def gram_matrix(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scoring: str = "auto",
) -> DataFrame:
    """(i, j, gram): upper-triangle Gram matrix entries (1-based dims),
    gram = quantized-exact sum of per-vector component products.

    ``scoring``: "fold" = relational explode (the oracle's shape),
    "partial" = per-partition numpy partials (the 100 TB shape),
    "auto" = fold at or below GRAM_FOLD_MAX_N corpus rows. Both
    spellings produce IDENTICAL integers (same per-pair quantization,
    exact int64 sums) — pinned by test.
    """
    # One probe row serves both dim inference and the empty-corpus check
    # (first() is None on an empty frame — raise clearly instead of the
    # bare TypeError; ADVICE r7). NULL/empty vectors are equally unusable.
    probe = emb.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if probe is None or not probe[0]:
        raise ValueError(
            f"gram_matrix: no non-null {vec_col!r} vectors in the corpus "
            "(empty input has no Gram matrix)"
        )
    dim = len(probe[0])
    if scoring == "auto":
        scoring = "fold" if emb.count() <= GRAM_FOLD_MAX_N else "partial"
    if scoring == "fold":
        qs = _gram_relational(emb, dim, id_col, vec_col)
    elif scoring == "partial":
        qs = _gram_partials(emb, dim, id_col, vec_col)
    else:
        raise ValueError(f"unknown scoring mode: {scoring}")
    return qs.select(
        "i",
        "j",
        (F.col("qsum").cast("double") / F.lit(QMEAN_SCALE)).alias("gram"),
    )


def top_principal_component(
    emb: DataFrame,
    n_iter: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple:
    """(eigenvector ndarray, eigenvalue float): dominant PC of the Gram
    matrix by fixed-count power iteration.

    The distributed work is gram_matrix (exact); the iteration runs on
    the driver over the dim x dim reduction with the deterministic
    all-ones seed — no RNG, no distributed float accumulation.
    Rows-only verification (numpy.linalg.eigh), the float-iterative
    exemption class.
    """
    import numpy as np

    rows = gram_matrix(emb, id_col, vec_col).collect()
    dim = max(r["j"] for r in rows)
    G = np.zeros((dim, dim), np.float64)
    for r in rows:
        G[r["i"] - 1, r["j"] - 1] = r["gram"]
        G[r["j"] - 1, r["i"] - 1] = r["gram"]
    v = np.ones(dim, np.float64) / np.sqrt(dim)
    for _ in range(n_iter):
        w = G @ v
        nrm = float(np.sqrt(np.dot(w, w)))
        if nrm == 0.0:
            return v, 0.0
        v = w / nrm
    lam = float(v @ (G @ v))
    return v, lam
