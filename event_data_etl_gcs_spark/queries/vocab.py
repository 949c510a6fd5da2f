"""Tokenizer-vocabulary induction statistics (round 3).

The corpus-level counting a BPE tokenizer trainer runs before its first
merge: adjacent-pretoken pair frequencies (the merge-candidate table),
top-V vocabulary coverage (what fraction of token occurrences a V-entry
vocab captures), and per-source token diversity (Simpson index /
effective vocabulary size) — the concentration diagnostic used when
balancing corpus mixes.

All three are one-shuffle groupBy counts with distributed top-k
(`TakeOrderedAndProject`, never a global sort); floats are either a
single division of exact integers or an order-pinned fold, so every
query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.text import bpe_tokens_column, duck_bpe_tokens, duck_tokens, tokens_sql
from ..sources.catalog import load_table
from .registry import query

TOP_MERGES = 50
VOCAB_V = 500


@query(
    "bpe_merge_candidates",
    oracle=(
        f"WITH toks AS (SELECT {duck_bpe_tokens()} AS t FROM documents), "
        "pairs AS (SELECT t[i] AS left_tok, t[i + 1] AS right_tok "
        "FROM toks, unnest(range(1, len(t))) AS r(i)) "
        "SELECT left_tok, right_tok, CAST(count(*) AS BIGINT) AS pair_count "
        "FROM pairs GROUP BY left_tok, right_tok "
        f"ORDER BY pair_count DESC, left_tok, right_tok LIMIT {TOP_MERGES}"
    ),
    doc=(
        f"Top-{TOP_MERGES} adjacent BPE-pretoken pairs by corpus frequency "
        "— the candidate table for the first merge of BPE training. "
        "Map-side pair explosion, one count shuffle, distributed top-k "
        "with a total (count desc, left, right) order so the cut is "
        "deterministic. Counts are exact integers."
    ),
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # sequence(1, 0) is DESCENDING in Spark, so short docs need the guard.
    pairs = (
        docs.select(bpe_tokens_column().alias("t"))
        .select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN "
                    "transform(sequence(1, size(t) - 1), "
                    "i -> named_struct('left_tok', t[i - 1], 'right_tok', t[i])) "
                    "ELSE array() END"
                )
            ).alias("p")
        )
        .select("p.left_tok", "p.right_tok")
    )
    return (
        pairs.groupBy("left_tok", "right_tok")
        .agg(F.count("*").cast("long").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left_tok", "right_tok")
        .limit(TOP_MERGES)
    )


BPE_MERGES = 8


def _duck_bpe_train_ctes(n_merges: int = BPE_MERGES) -> str:
    """Chained-CTE DuckDB mirror of operators/bpe.py bpe_train: the full
    k-step merge loop, integer-exact. Per step: weighted adjacent-pair
    counts over the vocab table, argmax under (count DESC, left, right),
    then greedy left-to-right merge. The merge is relational: candidate
    positions island-grouped (gaps-and-islands) with only EVEN offsets
    within a run merging — overlapping candidates require left==right,
    and even-offset selection is exactly what a sequential left-to-right
    scan keeps ("a a a a" -> "aa aa"). Produces best_0..best_{k-1}."""
    parts = [
        f"words AS MATERIALIZED (SELECT t AS word, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM (SELECT unnest({duck_tokens('text')}) AS t FROM documents) "
        f"GROUP BY t), "
        "syms_0 AS MATERIALIZED (SELECT word, cnt, list_append("
        "list_transform(range(1, length(word) + 1), i -> substring(word, i, 1)), "
        "'</w>') AS s FROM words)"
    ]
    for i in range(n_merges):
        parts.append(
            f"pairs_{i} AS (SELECT s[p] AS l, s[p+1] AS r, "
            f"CAST(sum(cnt) AS BIGINT) AS c "
            f"FROM syms_{i}, unnest(range(1, len(s))) AS tp_{i}(p) "
            f"GROUP BY 1, 2), "
            f"best_{i} AS MATERIALIZED (SELECT l, r, c FROM pairs_{i} "
            f"ORDER BY c DESC, l, r LIMIT 1), "
            f"pos_{i} AS (SELECT word, cnt, p, s[p] AS sym, "
            f"(p < len(s) AND s[p] = (SELECT l FROM best_{i}) "
            f"AND s[p+1] = (SELECT r FROM best_{i})) AS cand "
            f"FROM syms_{i}, unnest(range(1, len(s) + 1)) AS tq_{i}(p)), "
            f"isl_{i} AS (SELECT *, p - row_number() OVER "
            f"(PARTITION BY word, cand ORDER BY p) AS grp FROM pos_{i}), "
            f"mrk_{i} AS (SELECT *, CASE WHEN cand THEN "
            f"(p - min(p) OVER (PARTITION BY word, grp, cand)) % 2 = 0 "
            f"ELSE FALSE END AS mstart FROM isl_{i}), "
            f"csm_{i} AS (SELECT *, COALESCE(lag(mstart) OVER "
            f"(PARTITION BY word ORDER BY p), FALSE) AS consumed FROM mrk_{i}), "
            f"syms_{i + 1} AS MATERIALIZED (SELECT word, cnt, "
            f"list(CASE WHEN mstart THEN sym || (SELECT r FROM best_{i}) "
            f"ELSE sym END ORDER BY p) AS s "
            f"FROM csm_{i} WHERE NOT consumed GROUP BY word, cnt)"
        )
    return ", ".join(parts)


def _duck_bpe_train_sql(n_merges: int = BPE_MERGES) -> str:
    steps = " UNION ALL ".join(
        f"SELECT {i} AS step, l AS left_tok, r AS right_tok, c AS pair_count "
        f"FROM best_{i}"
        for i in range(n_merges)
    )
    return f"WITH {_duck_bpe_train_ctes(n_merges)} {steps}"


@query(
    "bpe_train_merges",
    oracle=_duck_bpe_train_sql(),
    doc=(
        f"Full BPE tokenizer training ({BPE_MERGES} merges) on the "
        "word-frequency table: ONE corpus-sized shuffle ever, then each "
        "step is a vocab-table pair count + argmax under the (count "
        "DESC, left, right) total order + a MAP-SIDE aggregate-fold "
        "merge (no shuffle, no UDF). Integer counts + string concat "
        "end to end, so the whole k-step loop is engine-exact — the "
        "oracle replays all 8 steps as chained CTEs with a relational "
        "gaps-and-islands spelling of the greedy left-to-right merge."
    ),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=BPE_MERGES)


@query(
    "bpe_vocab_after_training",
    oracle=(
        f"WITH {_duck_bpe_train_ctes(BPE_MERGES)}, "
        f"fin AS (SELECT cnt, unnest(s) AS token FROM syms_{BPE_MERGES}) "
        "SELECT token, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(cnt) AS BIGINT) AS total_count FROM fin GROUP BY token"
    ),
    doc=(
        "The symbol vocabulary after the learned merges — the trained "
        "tokenizer's vocab file with corpus stats (distinct words using "
        "each symbol, total weighted occurrences). Same chained-CTE "
        "oracle as bpe_train_merges, read out at the final state."
    ),
)
def bpe_vocab_after_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_vocab

    docs = load_table(spark, sf_dir, "documents")
    return bpe_vocab(docs, n_merges=BPE_MERGES)


@query(
    "bpe_encode_stats",
    oracle=(
        f"WITH {_duck_bpe_train_ctes(BPE_MERGES)}, "
        f"docw AS (SELECT doc_id, unnest({duck_tokens('text')}) AS word "
        "FROM documents) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(len(s)) AS BIGINT) AS n_bpe_tokens "
        f"FROM docw JOIN syms_{BPE_MERGES} USING (word) GROUP BY doc_id"
    ),
    doc=(
        "Corpus tokenization under the TRAINED tokenizer: encoding is a "
        "join against the word->symbolization table (vocab-sized, the "
        "broadcast/bucketed dim at 100 TB), never a per-document merge "
        "replay. Per-doc word and BPE-token counts; integer-exact, "
        "oracle replays training then joins the final state."
    ),
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_encode_stats as _encode

    docs = load_table(spark, sf_dir, "documents")
    return _encode(docs, n_merges=BPE_MERGES)


@query(
    "vocab_coverage_topk",
    oracle=(
        f"WITH toks AS (SELECT unnest({duck_tokens('text')}) AS token "
        "FROM documents), "
        "c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token), "
        "total AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c), "
        f"top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT {VOCAB_V}) "
        "SELECT token, CAST(cnt AS BIGINT) AS token_count, "
        "CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank, "
        "CAST(sum(cnt) OVER (ORDER BY cnt DESC, token "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_count, "
        "CAST(sum(cnt) OVER (ORDER BY cnt DESC, token "
        "ROWS UNBOUNDED PRECEDING) AS DOUBLE) / (SELECT n FROM total) "
        "AS cum_coverage FROM top"
    ),
    doc=(
        f"Top-{VOCAB_V} whitespace tokens with cumulative corpus coverage "
        "— 'how big must the vocab be to cover X% of occurrences'. The "
        "corpus-wide count + distributed top-k do the heavy lifting; the "
        "cumulative window runs over the V surviving rows only (never a "
        "global single-partition window). Coverage = exact-integer "
        "cumsum / exact-integer total: one portable double division."
    ),
)
def vocab_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.expr(tokens_sql("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("n"))
    top = counts.orderBy(F.col("cnt").desc(), "token").limit(VOCAB_V)
    w = (
        Window.orderBy(F.col("cnt").desc(), "token")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), "token")
        ).cast("int"))
        .withColumn("cum_count", F.sum("cnt").over(w).cast("long"))
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            F.col("cnt").alias("token_count"),
            "rank",
            "cum_count",
            (F.col("cum_count").cast("double") / F.col("n").cast("double")).alias(
                "cum_coverage"
            ),
        )
    )


@query(
    "token_diversity_by_source",
    oracle=(
        "WITH toks AS (SELECT source, "
        f"unnest({duck_tokens('text')}) AS token FROM documents), "
        "c AS (SELECT source, token, count(*) AS cnt "
        "FROM toks GROUP BY source, token), "
        "g AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens, "
        "CAST(count(*) AS BIGINT) AS distinct_tokens, "
        "list(cnt ORDER BY token) AS cnts FROM c GROUP BY source), "
        "s AS (SELECT source, n_tokens, distinct_tokens, "
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(cnts, c -> CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE))), "
        "(acc, x) -> acc + x * x) AS p2 FROM g) "
        "SELECT source, n_tokens, distinct_tokens, "
        "1.0 - p2 AS simpson_index, 1.0 / p2 AS effective_vocab FROM s"
    ),
    doc=(
        "Per-source token diversity: Simpson index 1 - sum(p_i^2) and "
        "effective vocabulary 1/sum(p_i^2) — the concentration "
        "diagnostics for corpus-mix balancing. The p_i^2 fold is "
        "ORDER-PINNED (counts sorted by token before a left-to-right "
        "double fold), so the floats are bit-identical across engines "
        "and partitionings; entropy's ln() is deliberately avoided — "
        "log is not correctly-rounded IEEE, sqrt/division are."
    ),
)
def token_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.explode(F.expr(tokens_sql("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    g = c.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("distinct_tokens"),
        F.sort_array(F.collect_list(F.struct("token", "cnt"))).alias("pairs"),
    )
    p2 = F.expr(
        "aggregate(transform(pairs, "
        "p -> CAST(p.cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)"
    )
    return g.select(
        "source",
        "n_tokens",
        "distinct_tokens",
        (F.lit(1.0) - p2).alias("simpson_index"),
        (F.lit(1.0) / p2).alias("effective_vocab"),
    )


@query(
    "distinctive_terms_per_doc",
    oracle=(
        f"WITH toks AS (SELECT doc_id, unnest({duck_tokens('text')}) AS token "
        "FROM documents), "
        "tf AS (SELECT doc_id, token, count(*) AS tf FROM toks "
        "GROUP BY doc_id, token), "
        "df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks "
        "GROUP BY token) "
        "SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, "
        "CAST(df AS BIGINT) AS df, CAST(rnk AS INT) AS rank FROM ("
        "SELECT tf.doc_id, tf.token, tf.tf, df.df, "
        "row_number() OVER (PARTITION BY tf.doc_id "
        "ORDER BY tf.tf DESC, df.df, tf.token) AS rnk "
        "FROM tf JOIN df ON tf.token = df.token) t WHERE rnk <= 3"
    ),
    doc=(
        "Top-3 distinctive terms per document: rank by (term frequency "
        "desc, document frequency asc, term) — the integer-exact "
        "keyword-extraction ordering (log-free TF-IDF stands in for "
        "the libm-unportable tf*ln(N/df) score; the RANKING is what "
        "downstream consumes). The corpus is exploded ONCE: tf holds "
        "exactly one row per distinct (doc, term), so document frequency "
        "is a plain count over tf — no second explode and no "
        "count-distinct shuffle of raw (token, doc_id) pairs (the "
        "8.3x-at-100x outlier in SCALE_r3.md; the shared tf exchange is "
        "reused across both branches). The rank window partitions per "
        "doc, bounded by document vocabulary."
    ),
)
def distinctive_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.expr(tokens_sql("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    # count("tf") (never null, so == count(*)) keeps the tf column alive
    # in this branch: with it pruned, the df subplan canonicalizes to a
    # bare distinct and Catalyst cannot reuse the tf exchange — the
    # corpus would be exploded and aggregated twice.
    df = tf.groupBy("token").agg(
        F.count("tf").cast("long").alias("df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), "df", "token"
    )
    return (
        tf.join(df, "token")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tf", "df", "rank")
    )
