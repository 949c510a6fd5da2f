"""Span-decontamination semantics pins on a constructed corpus where
the collision geometry is known exactly."""

from __future__ import annotations

from event_data_etl_gcs_spark.queries.decontam_span import (
    DECON_K,
    DECON_MARGIN,
    span_decontaminate,
)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "documents.parquet")
    df.write.parquet(out)
    return str(tmp_path)


def test_hit_span_plus_margin_removed(spark, tmp_path):
    # benchmark doc 0 (0 % 97 == 0) contains the gram "g0 g1 g2 g3";
    # train doc 1 embeds it at token positions 6..9 (1-based) inside
    # otherwise-unique tokens.
    bench_text = " ".join(f"g{i}" for i in range(DECON_K))
    train_toks = [f"u{i}" for i in range(1, 6)] + [
        f"g{i}" for i in range(DECON_K)
    ] + [f"v{i}" for i in range(1, 8)]
    rows = [
        (0, bench_text, "en", "bench", 0),
        (1, " ".join(train_toks), "en", "web", 0),
        (2, " ".join(f"w{i}" for i in range(12)), "en", "web", 0),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in span_decontaminate(spark, sf).collect()}

    # doc 2 untouched
    assert got[2]["n_hits"] == 0 and got[2]["n_removed"] == 0
    assert got[2]["text_clean"] == rows[2][1]

    # doc 1: hit at pos 6, removal window [6-M, 6+K-1+M]
    d1 = got[1]
    assert d1["n_hits"] == 1
    lo, hi = 6 - DECON_MARGIN, 6 + DECON_K - 1 + DECON_MARGIN
    expect_kept = [
        t for i, t in enumerate(train_toks, start=1) if not (lo <= i <= hi)
    ]
    assert d1["text_clean"] == " ".join(expect_kept)
    assert d1["n_removed"] == hi - lo + 1
    # benchmark docs are not in the output
    assert 0 not in got


def test_fully_contaminated_doc_survives_as_empty_spine(spark, tmp_path):
    gram = " ".join(f"g{i}" for i in range(DECON_K))
    rows = [
        (0, gram, "en", "bench", 0),
        (1, gram, "en", "web", 0),  # exact copy of the benchmark doc
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in span_decontaminate(spark, sf).collect()}
    assert got[1]["n_removed"] == DECON_K
    assert got[1]["text_clean"] == ""
    assert got[1]["n_tokens"] == DECON_K
