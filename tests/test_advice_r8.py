"""Regression tests for the round-8 ADVICE findings.

1. _vacated_partition_dirs: a float partition value with NO numerically
   matching directory must NOT resolve to the null partition directory
   (medium — delete_where would rmtree live rows).
2. gram_qsum: null/empty vectors filtered consistently in BOTH scoring
   paths (fold previously nulled them away, partial crashed in
   np.stack).
3. power_iteration_topk: fails loud (ValueError) when n_iter is too
   small to separate a near-degenerate spectrum, instead of silently
   returning a mixed eigenvector.
4. PCA fit memos invalidate when the corpus file changes under the same
   path (mtime/size fingerprint).
5. bench.py rejects unknown SPARK_GRAFT_BENCH_TIER values before
   starting a session.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# 1. medium: float no-match must not collide with the null-partition key
# ---------------------------------------------------------------------------


def test_float_no_match_does_not_select_null_partition(tmp_path):
    """_float_dir_match returns None on no numeric match; None is also
    the by_value KEY of __HIVE_DEFAULT_PARTITION__ — falling through to
    the lookup selected the null partition dir for rmtree even though it
    still held live rows (ADVICE r8, silent data loss)."""
    from event_data_etl_gcs_spark.sources.parquet_sink import (
        _vacated_partition_dirs,
    )

    d = tmp_path / "tbl"
    (d / "eps=0.5").mkdir(parents=True)
    (d / "eps=__HIVE_DEFAULT_PARTITION__").mkdir()

    # 0.25 matches no directory numerically -> nothing is vacated
    assert _vacated_partition_dirs(str(d), "eps", [0.25]) == []
    # sanity: a real numeric match and the explicit null value still work
    assert _vacated_partition_dirs(str(d), "eps", [0.5]) == [
        str(d / "eps=0.5")
    ]
    assert _vacated_partition_dirs(str(d), "eps", [None]) == [
        str(d / "eps=__HIVE_DEFAULT_PARTITION__")
    ]


def test_delete_where_float_no_match_preserves_null_partition(spark, tmp_path):
    """End-to-end: delete_where on a float-partitioned table whose
    predicate hits only a value with no surviving rows must leave the
    null partition's rows intact."""
    from event_data_etl_gcs_spark.sources.parquet_sink import delete_where

    d = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.5), (3, None)], "id int, eps double"
    )
    df.write.partitionBy("eps").parquet(d)

    # Delete every eps=0.5 row: the partition is fully vacated. The null
    # partition is untouched and must survive with its row.
    n = delete_where(spark, d, "eps = 0.5", "eps")
    assert n == 2
    left = spark.read.parquet(d)
    assert [r["id"] for r in left.collect()] == [3]
    assert left.filter(F.col("eps").isNull()).count() == 1


# ---------------------------------------------------------------------------
# 2. low: gram_qsum null/empty handling consistent across scoring paths
# ---------------------------------------------------------------------------


def _gram_rows(df):
    return sorted((r["i"], r["j"], r["qsum"]) for r in df.collect())


def test_gram_qsum_filters_null_and_empty_consistently(spark):
    from event_data_etl_gcs_spark.operators.linalg import gram_qsum

    clean = [(1, [1.0, 2.0]), (2, [0.5, -1.0]), (3, [2.0, 0.25])]
    dirty = clean + [(4, None), (5, [])]
    schema = "vec_id long, embedding array<double>"
    df_clean = spark.createDataFrame(clean, schema)
    df_dirty = spark.createDataFrame(dirty, schema)

    want = _gram_rows(gram_qsum(df_clean, scoring="fold"))
    # both paths over the dirty frame == clean-frame result
    assert _gram_rows(gram_qsum(df_dirty, scoring="fold")) == want
    assert _gram_rows(gram_qsum(df_dirty, scoring="partial")) == want


def test_gram_qsum_first_vector_empty_is_skipped(spark):
    """A corpus whose FIRST non-null vector is empty used to raise even
    though valid vectors follow (probe inspected one row only)."""
    from event_data_etl_gcs_spark.operators.linalg import gram_qsum

    schema = "vec_id long, embedding array<double>"
    df = spark.createDataFrame(
        [(1, []), (2, [1.0, 2.0]), (3, [0.5, -1.0])], schema
    ).coalesce(1).sortWithinPartitions("vec_id")
    got = _gram_rows(gram_qsum(df, scoring="fold"))
    want = _gram_rows(
        gram_qsum(
            spark.createDataFrame([(2, [1.0, 2.0]), (3, [0.5, -1.0])], schema),
            scoring="fold",
        )
    )
    assert got == want


def test_gram_qsum_all_null_still_raises(spark):
    from event_data_etl_gcs_spark.operators.linalg import gram_qsum

    df = spark.createDataFrame(
        [(1, None), (2, [])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no non-null"):
        gram_qsum(df)


# ---------------------------------------------------------------------------
# 3. low: power iteration fails loud on unconverged components
# ---------------------------------------------------------------------------


def test_power_iteration_raises_on_unconverged_spectrum():
    from event_data_etl_gcs_spark.operators.linalg import power_iteration_topk

    # Near-degenerate pair (ratio 0.999) in a random orthogonal basis,
    # so the all-ones seed mixes both: 3 iterations leave a visibly
    # mixed iterate whose residual is ~1e-4 * lam1 >> rtol.
    rng = np.random.RandomState(11)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    G = q @ np.diag([1.0, 0.999, 0.1]) @ q.T
    with pytest.raises(ValueError, match="did not converge"):
        power_iteration_topk(G, 2, n_iter=3)
    # enough iterations: converges and matches eigh
    vals, V = power_iteration_topk(G, 2, n_iter=50000)
    assert np.allclose(sorted(vals, reverse=True), [1.0, 0.999], atol=1e-9)


def test_power_iteration_clean_spectrum_unchanged():
    """The residual check must not change output on well-separated
    spectra: same values as numpy.linalg.eigh, no raise."""
    from event_data_etl_gcs_spark.operators.linalg import power_iteration_topk

    rng = np.random.RandomState(7)
    A = rng.randn(6, 6)
    G = A @ A.T + np.diag([30.0, 20.0, 12.0, 6.0, 2.0, 0.5])
    vals, V = power_iteration_topk(G, 3, n_iter=2000)
    ew = np.linalg.eigh(G)[0][::-1]
    assert np.allclose(vals, ew[:3], rtol=1e-8)
    for lam, v in zip(vals, V):
        assert np.linalg.norm(G @ v - lam * v) <= 1e-6 * abs(vals[0])


# ---------------------------------------------------------------------------
# 4. low: fit memo invalidation on corpus change
# ---------------------------------------------------------------------------


def test_fit_memo_invalidates_on_corpus_rewrite(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from event_data_etl_gcs_spark.operators.linalg import PCA_K
    from event_data_etl_gcs_spark.queries.pca import (
        _corpus_fingerprint,
        _fit_from_parquet,
    )

    dim = 16
    rng = np.random.RandomState(3)

    def write(seed_scale: float, mtime_ns: int):
        X = rng.randn(64, dim) * seed_scale
        t = pa.table(
            {
                "vec_id": pa.array(range(64), pa.int64()),
                "embedding": pa.array(X.tolist(), pa.list_(pa.float64())),
            }
        )
        p = str(tmp_path / "embeddings.parquet")
        pq.write_table(t, p)
        os.utime(p, ns=(mtime_ns, mtime_ns))

    assert PCA_K <= dim
    write(1.0, 1_000_000_000)
    fp1 = _corpus_fingerprint(str(tmp_path))
    m1 = _fit_from_parquet(str(tmp_path))
    write(3.0, 2_000_000_000)
    fp2 = _corpus_fingerprint(str(tmp_path))
    assert fp1 != fp2
    m2 = _fit_from_parquet(str(tmp_path))
    # different corpus under the same path -> different model, not the
    # memoized stale one (ADVICE r8)
    assert m1 != m2


# ---------------------------------------------------------------------------
# 5. low: bench tier validation
# ---------------------------------------------------------------------------


def test_bench_rejects_unknown_tier():
    env = dict(os.environ, SPARK_GRAFT_BENCH_TIER="headlines")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert p.returncode != 0
    assert "SPARK_GRAFT_BENCH_TIER" in (p.stderr + p.stdout)
