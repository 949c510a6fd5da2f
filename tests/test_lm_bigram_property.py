"""Property test: bigram_scores against an INDEPENDENT pure-Python
reference implementation (third engine, after Spark and DuckDB) on
hypothesis-generated corpora — exact float equality, because both
sides perform the identical IEEE ops in the identical order:
val = (c(prev)+V) / (c(prev,cur)+1) per position, left-to-right sum,
one divide by n."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from event_data_etl_gcs_spark.queries.lm_bigram import bigram_scores

_TOKENS = ["a", "b", "cc", "ddd", "e f".replace(" ", ""), "zz"]

_corpus = st.lists(
    st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=8),
    min_size=1,
    max_size=8,
)


def _reference(corpus: list[list[str]]):
    """Pure-Python mirror of the portable arithmetic."""
    ctx: dict[str, int] = {}
    bgc: dict[tuple[str, str], int] = {}
    vocab: set[str] = set()
    for toks in corpus:
        vocab.update(toks)
        for i in range(1, len(toks)):
            p, c = toks[i - 1], toks[i]
            ctx[p] = ctx.get(p, 0) + 1
            bgc[(p, c)] = bgc.get((p, c), 0) + 1
    out = {}
    for doc_id, toks in enumerate(corpus):
        if len(toks) < 2:
            continue
        vals = [
            float(ctx[toks[i - 1]] + len(vocab))
            / float(bgc[(toks[i - 1], toks[i])] + 1)
            for i in range(1, len(toks))
        ]
        acc = 0.0
        for v in vals:  # left-to-right, matching the pinned fold
            acc = acc + v
        out[doc_id] = (
            len(vals),
            acc / float(len(vals)),
            min(bgc[(toks[i - 1], toks[i])] for i in range(1, len(toks))),
        )
    return out


@settings(
    deadline=None,
    max_examples=12,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus)
def test_bigram_scores_match_python_reference_exactly(spark, corpus):
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.mean_inv_p, r.min_bigram_count)
        for r in bigram_scores(docs).collect()
    }
    assert got == _reference(corpus)
