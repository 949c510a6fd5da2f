"""Independent-implementation cross-validation: our MinHash-LSH near-dup
pairs against (a) exact all-pairs Jaccard ground truth and (b)
pyspark.ml's MinHashLSH — a different hash family implemented by a
different team. Agreement of three independent computations is the
strongest correctness evidence available for an approximate operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.dedup import minhash_lsh_pairs
from event_data_etl_gcs_spark.operators.text import shingle_hash_set_sql
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.5


def _truth_pairs(sh):
    a, b = sh.alias("a"), sh.alias("b")
    return {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (
                F.size(F.array_intersect("a.hs", "b.hs"))
                / F.size(F.array_union("a.hs", "b.hs"))
            ).alias("j"),
        )
        .filter(f"j >= {THRESHOLD}")
        .collect()
    }


def test_minhash_lsh_agrees_with_truth_and_mllib(spark):
    docs = load_table(spark, SF, "documents")
    sh = (
        docs.select("doc_id", F.expr(shingle_hash_set_sql("text")).alias("hs"))
        .filter(F.size("hs") > 0)
        .cache()
    )
    truth = _truth_pairs(sh)
    assert len(truth) > 0

    # ours: banded candidates + exact verify -> must equal truth exactly
    # whenever banding recall is 1 at this scale; at minimum, verified
    # pairs are a SUBSET of truth (precision 1 by construction)
    ours = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, threshold=THRESHOLD)
        .select("id_a", "id_b")
        .collect()
    }
    assert ours <= truth
    assert len(ours & truth) / len(truth) >= 0.9

    # pyspark.ml's independent MinHashLSH (different hash family, pinned
    # seed): approximate join at Jaccard distance < 1 - THRESHOLD
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    toks = sh.select(
        "doc_id", F.expr("transform(hs, h -> CAST(h AS STRING))").alias("terms")
    )
    feat = (
        CountVectorizer(inputCol="terms", outputCol="features", binary=True)
        .fit(toks)
        .transform(toks)
    )
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feat)
    sim = mh.approxSimilarityJoin(feat, feat, THRESHOLD, distCol="dist")
    ml_pairs = {
        (
            min(r["datasetA"]["doc_id"], r["datasetB"]["doc_id"]),
            max(r["datasetA"]["doc_id"], r["datasetB"]["doc_id"]),
        )
        for r in sim.filter("datasetA.doc_id < datasetB.doc_id").collect()
    }
    assert len(ml_pairs & truth) / len(truth) >= 0.9
    # at sf0.001 all three computations agree exactly (28 pairs)
    assert ours == truth == ml_pairs
