"""Regression tests for the round-7 ADVICE findings.

1. containment_check_batch replay idempotence (medium): plain appends
   duplicated sets/prefix/pairs state on a foreachBatch replay; now all
   state is batch_id-partitioned dynamic overwrite.
2. streaming semdedup empty-first-batch centroid commit (low).
3. gram_matrix on an empty/all-null corpus (low).
4. shard-hash int64 overflow at doc_id > ~3.47e9 (low).
5. scientific-notation float partition dirs in delete_where (low).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted(
        (r["id_a"], r["id_b"], r["containment"])
        for r in df.select("id_a", "id_b", "containment").collect()
    )


def test_containment_batch_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch with the same batch_id (foreachBatch replay
    after a crash between the state writes and the checkpoint commit)
    must not duplicate pairs OR index rows — duplicated sets rows would
    multiply verify-join output on every later batch (ADVICE r7)."""
    from event_data_etl_gcs_spark.operators.dedup import containment_pairs
    from event_data_etl_gcs_spark.streaming.neardedup import (
        containment_check_batch,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    b0 = docs.filter(F.col("doc_id") < n // 2)
    b1 = docs.filter(F.col("doc_id") >= n // 2)
    state = str(tmp_path / "state")
    pairs_path = str(tmp_path / "pairs")

    containment_check_batch(b0, state, pairs_path, 0)
    once = _pairs(spark.read.parquet(pairs_path))
    sets_once = spark.read.parquet(os.path.join(state, "sets")).count()

    # replay batch 0 (crash before checkpoint commit -> same batch_id)
    containment_check_batch(b0, state, pairs_path, 0)
    assert _pairs(spark.read.parquet(pairs_path)) == once
    assert spark.read.parquet(os.path.join(state, "sets")).count() == sets_once
    assert (
        spark.read.parquet(os.path.join(state, "sets"))
        .groupBy("id").count().filter(F.col("count") > 1).count() == 0
    )

    # batch 1 against the (non-duplicated) index -> exact batch parity
    containment_check_batch(b1, state, pairs_path, 1)
    got = _pairs(spark.read.parquet(pairs_path))
    want = _pairs(containment_pairs(docs))
    assert got == want
    assert len(got) == len(set(got))


def test_neardedup_check_batch_replay_is_idempotent(spark, tmp_path):
    """Same replay contract for the MinHash signature index."""
    from event_data_etl_gcs_spark.streaming.neardedup import (
        check_batch_against_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    b0 = docs.filter(F.col("doc_id") < 40)
    sig = str(tmp_path / "sigs")
    pp = str(tmp_path / "pairs")
    check_batch_against_index(b0, sig, pp, 0)
    n_sig = spark.read.parquet(sig).count()
    n_pairs = spark.read.parquet(pp).count()
    check_batch_against_index(b0, sig, pp, 0)  # replay
    assert spark.read.parquet(sig).count() == n_sig
    assert spark.read.parquet(pp).count() == n_pairs
    assert (
        spark.read.parquet(sig)
        .groupBy("id").count().filter(F.col("count") > 1).count() == 0
    )


def test_streaming_semdedup_empty_first_batch_defers_centroids(spark, tmp_path):
    """An all-zero-norm first delivery must NOT commit an empty centroid
    table (which would silently drop every later vector); centroids are
    derived on the first batch that has nonzero vectors (ADVICE r7)."""
    from event_data_etl_gcs_spark.streaming.semdedup import (
        read_semdedup_decisions,
        semdedup_ingest_batch,
    )

    dim = 4
    zero = spark.createDataFrame(
        [(i, [0.0] * dim) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "idx")
    semdedup_ingest_batch(zero, 0, idx, k=2)
    # no centroid table was committed for the all-zero batch
    assert not os.path.exists(os.path.join(idx, "centroids", "_SUCCESS"))

    real = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0, 0.0]),
         (12, [1.0, 0.001, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    semdedup_ingest_batch(real, 1, idx, k=2)
    assert os.path.exists(os.path.join(idx, "centroids", "_SUCCESS"))
    dec = read_semdedup_decisions(spark, idx)
    got = {(r["id"], r["kept"]) for r in dec.collect()}
    # every nonzero vector got a decision; 12 is a near-dup of 10
    assert {i for i, _ in got} == {10, 11, 12}
    assert (12, 0) in got


def test_gram_matrix_empty_corpus_raises_value_error(spark):
    import pytest

    from event_data_etl_gcs_spark.operators.linalg import gram_matrix

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        gram_matrix(empty)
    allnull = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="non-null"):
        gram_matrix(allnull)


def test_shard_hash_no_int64_overflow_at_huge_doc_id(spark):
    """doc_id * 2654435761 wraps int64 above ~3.47e9 (Spark wraps
    silently -> negative h, corrupted shard order). The reduced-operand
    form must give the identical modular value, nonnegative, at any
    doc_id — and match the unreduced value where it doesn't overflow."""
    from event_data_etl_gcs_spark.queries.layout import (
        SHARD_HASH_C,
        SHARD_HASH_P,
        hash_order_prefix_tokens,
    )

    big = 5_000_000_000
    docs = spark.createDataFrame(
        [(7, "a b c"), (123456, "x y"), (big, "t1 t2 t3 t4")],
        "doc_id long, text string",
    )
    # recompute h the way hash_order_prefix_tokens does (its output drops
    # h, so recompute through the same column expression)
    t = docs.select(
        "doc_id",
        (
            ((F.col("doc_id") % F.lit(SHARD_HASH_P))
             * F.lit(SHARD_HASH_C % SHARD_HASH_P))
            % F.lit(SHARD_HASH_P)
        ).alias("h"),
    )
    got = {r["doc_id"]: r["h"] for r in t.collect()}
    for d, h in got.items():
        assert 0 <= h < SHARD_HASH_P
        assert h == (d * SHARD_HASH_C) % SHARD_HASH_P  # exact math value
    # and the full prefix-sum pipeline runs clean over the huge id
    out = hash_order_prefix_tokens(docs)
    rows = {r["doc_id"]: r["cum_before"] for r in out.collect()}
    assert set(rows) == {7, 123456, big}
    assert all(v >= 0 for v in rows.values())


def test_delete_where_scientific_float_partition(spark, tmp_path):
    """A float partition value in the scientific range renders as
    '1.0E-5' in the hive path (Java Double.toString) but '1e-05' via
    Python str — string matching misses it, so a fully-vacated dir
    stayed on disk and its stale rows resurfaced (ADVICE r7). Matching
    is now numeric for floats."""
    from event_data_etl_gcs_spark.sources.parquet_sink import delete_where

    d = str(tmp_path / "fp")
    spark.createDataFrame(
        [(1, 10, 1e-5), (2, 20, 1e-5), (3, 30, 0.5)],
        "id long, val long, eps double",
    ).write.mode("overwrite").partitionBy("eps").parquet(d)
    def sci_dirs():
        return [
            e for e in os.listdir(d)
            if e.startswith("eps=") and "E" in e[len("eps="):].upper()
        ]

    assert sci_dirs(), f"expected a scientific-notation partition dir, got {os.listdir(d)}"

    deleted = delete_where(spark, d, "eps < 1e-4", "eps")
    assert deleted == 2
    # the vacated scientific dir is actually gone -> no stale resurfacing
    assert not sci_dirs()
    back = [(r["id"], r["eps"]) for r in spark.read.parquet(d).collect()]
    assert back == [(3, 0.5)]
