"""Distributed BPE tokenizer training (iterated merges, integer-exact).

Extends the single-step `bpe_merge_candidates` query to full BPE merge
learning — the tokenizer-training stage of an LLM data pipeline — as a
Spark-first driver loop over the WORD-FREQUENCY table (the classic
Sennrich et al. 2016 formulation):

  1. One corpus shuffle, ever: whitespace tokens -> (word, count).
     At 100 TB the corpus is petabytes but the distinct-word table is
     millions of rows — everything after step 1 runs on that table.
  2. Per merge step: adjacent-symbol pair counts (posexplode + one
     groupBy over the vocab table, weighted by word count), pick the
     argmax pair under the total order (count DESC, left, right), then
     merge it into every word's symbol array MAP-SIDE with an
     `aggregate` fold — no shuffle, no UDF:
         acc ends with L and next symbol is R  ->  replace tail with LR
     which is exactly greedy left-to-right pair merging ("a a a a" with
     pair (a,a) -> "aa aa", not " aa a a").
  3. Only the k winning pairs and per-step counts ever reach the
     driver (k rows); symbol state stays distributed, localCheckpoint
     keeps the per-iteration plan shallow (same pattern as pagerank).

Everything is integer counts and string concatenation — deterministic
and engine-portable, so the full k-step training loop has an exact
DuckDB oracle (generated chained CTEs; see queries/vocab.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the distributed word-frequency table — the ONLY
    corpus-sized shuffle in BPE training."""
    from .text import tokens_sql

    return (
        docs.select(F.explode(F.expr(tokens_sql(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """(word, cnt, syms): character symbols plus the end-of-word marker.
    Character split via substring over a sequence — the same spelling
    DuckDB uses, so initial states are identical across engines."""
    # sequence(1, 0) is DESCENDING in Spark: guard the empty-word edge
    chars = F.expr(
        "CASE WHEN char_length(word) = 0 THEN CAST(array() AS array<string>) "
        "ELSE transform(sequence(1, char_length(word)), i -> substring(word, i, 1)) END"
    )
    return words.select(
        "word", "cnt", F.concat(chars, F.array(F.lit(END_OF_WORD))).alias("syms")
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """(left_tok, right_tok, pair_count): adjacent-pair counts over the
    symbol table, weighted by word frequency. Map-side explode, one
    vocab-sized (not corpus-sized) aggregation."""
    pairs = symbols.select(
        "cnt",
        F.explode(
            # sequence(1, 0) is DESCENDING in Spark: guard 1-symbol words
            F.expr(
                "CASE WHEN size(syms) >= 2 THEN "
                "transform(sequence(1, size(syms) - 1), "
                "i -> struct(syms[i - 1] AS l, syms[i] AS r)) "
                "ELSE CAST(array() AS array<struct<l: string, r: string>>) END"
            )
        ).alias("pr"),
    )
    return pairs.groupBy(
        F.col("pr.l").alias("left_tok"), F.col("pr.r").alias("right_tok")
    ).agg(F.sum("cnt").cast("long").alias("pair_count"))


def merge_pair_column(left: str, right: str):
    """Column: the word's symbol array with greedy left-to-right merges
    of (left, right) applied — a map-side `aggregate` fold, no shuffle.

    After a merge the accumulator tail becomes left||right which can
    never equal `left` again (right is non-empty), so a consumed symbol
    is never double-merged; runs like "a a a" therefore collapse to
    "aa a" exactly as sequential BPE does."""
    merged = F.lit(left + right)
    return F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Learn `n_merges` BPE merges; returns the merge table
    (step, left_tok, right_tok, pair_count) — k rows, the artifact a
    tokenizer ships. Deterministic: argmax under (count DESC, left,
    right) total order."""
    spark = docs.sparkSession
    symbols = initial_symbols(word_frequencies(docs, text_col)).localCheckpoint(
        eager=True
    )
    merges = []
    for step in range(n_merges):
        best = (
            pair_counts(symbols)
            .orderBy(F.desc("pair_count"), "left_tok", "right_tok")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0]["left_tok"], best[0]["right_tok"], best[0]["pair_count"]
        merges.append((step, l, r, c))
        symbols = symbols.select(
            "word", "cnt", merge_pair_column(l, r).alias("syms")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "step INT, left_tok STRING, right_tok STRING, pair_count LONG"
    )


def trained_symbols(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """(word, cnt, syms): every corpus word's symbolization under the
    learned merges — the distributed form of a trained tokenizer (apply
    = join words against this table; no per-document re-merging)."""
    symbols = initial_symbols(word_frequencies(docs, text_col))
    for row in bpe_train(docs, n_merges, text_col).collect():
        symbols = symbols.select(
            "word",
            "cnt",
            merge_pair_column(row["left_tok"], row["right_tok"]).alias("syms"),
        )
    return symbols


def bpe_vocab(docs: DataFrame, n_merges: int = 8, text_col: str = "text") -> DataFrame:
    """(token, n_words, total_count): the symbol vocabulary after
    `n_merges` learned merges — what the trained tokenizer's vocab file
    contains, with corpus statistics."""
    toks = trained_symbols(docs, n_merges, text_col).select(
        "cnt", F.explode("syms").alias("token")
    )
    return toks.groupBy("token").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("cnt").cast("long").alias("total_count"),
    )


def bpe_encode_stats(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): tokenize the corpus under the
    TRAINED tokenizer. Application is a symbolization-table join — each
    word instance looks up its merged symbol count — so encoding costs
    one join against the vocab-sized table, never a per-document merge
    replay. At 100 TB the symbolization table is the broadcast/bucketed
    dimension; the corpus side stays a map-side explode."""
    from .text import tokens_sql

    syms = trained_symbols(docs, n_merges, text_col).select(
        "word", F.size("syms").cast("long").alias("n_syms")
    )
    words = docs.select(
        "doc_id", F.explode(F.expr(tokens_sql(text_col))).alias("word")
    )
    return (
        words.join(syms, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
        )
    )
