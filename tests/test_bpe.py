"""Iterated BPE training must equal a sequential pure-Python reference:
same merges in the same order, same final symbolization — including the
overlapping-run case ("a a a a" merges to "aa aa", never "aa a a")."""

from __future__ import annotations

from collections import Counter

from event_data_etl_gcs_spark.operators.bpe import (
    END_OF_WORD,
    bpe_train,
    initial_symbols,
    merge_pair_column,
    word_frequencies,
)


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Sequential reference (Sennrich et al.): greedy left-to-right
    merge of the (count DESC, left, right)-argmax pair each step."""
    vocab = {
        tuple(list(w) + [END_OF_WORD]): c for w, c in word_counts.items()
    }
    merges = []
    for step in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, c))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = cnt
        vocab = new_vocab
    return merges, vocab


def test_merge_fold_handles_overlapping_runs(spark):
    df = spark.createDataFrame(
        [("x", 1, ["a", "a", "a", "a"]), ("y", 1, ["b", "a", "a", "c"])],
        "word STRING, cnt LONG, syms ARRAY<STRING>",
    )
    got = {
        r["word"]: r["m"]
        for r in df.select("word", merge_pair_column("a", "a").alias("m")).collect()
    }
    assert got == {"x": ["aa", "aa"], "y": ["b", "aa", "c"]}


def test_bpe_train_matches_sequential_reference(spark):
    corpus = [
        ("the cat sat on the mat",),
        ("the cat ate the rat",),
        ("a cat and a rat and a mat",),
        ("low lower lowest low low",),
    ]
    docs = spark.createDataFrame(corpus, "text STRING")
    wc = {
        r["word"]: r["cnt"] for r in word_frequencies(docs).collect()
    }
    want_merges, want_vocab = _py_bpe(wc, n_merges=6)
    got = [
        (r["step"], r["left_tok"], r["right_tok"], r["pair_count"])
        for r in bpe_train(docs, n_merges=6).orderBy("step").collect()
    ]
    assert got == want_merges

    # final symbolization equal too: replay the learned merges via the
    # map-side fold and compare against the reference's final vocab
    syms = initial_symbols(word_frequencies(docs))
    for _, l, r, _c in want_merges:
        syms = syms.select(
            "word", "cnt", merge_pair_column(l, r).alias("syms")
        )
    got_vocab = {
        tuple(r["syms"]): r["cnt"] for r in syms.collect()
    }
    assert got_vocab == want_vocab


def test_merge_fold_property_random_sequences(spark):
    """Property: for random symbol sequences and random merge pairs, the
    map-side aggregate fold equals the sequential greedy reference."""
    import random

    rng = random.Random(7)
    alphabet = ["a", "b", "c", "ab", "bc"]
    cases = []
    for i in range(60):
        syms = [rng.choice(alphabet) for _ in range(rng.randint(1, 12))]
        l, r = rng.choice(alphabet), rng.choice(alphabet)
        cases.append((f"w{i}", l, r, syms))

    def reference(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    from event_data_etl_gcs_spark.operators.bpe import merge_pair_column

    # group cases by (l, r) so each merge expression runs over its batch
    by_pair = {}
    for w, l, r, syms in cases:
        by_pair.setdefault((l, r), []).append((w, syms))
    for (l, r), rows in by_pair.items():
        df = spark.createDataFrame(
            [(w, 1, syms) for w, syms in rows],
            "word STRING, cnt LONG, syms ARRAY<STRING>",
        )
        got = {
            row["word"]: row["m"]
            for row in df.select(
                "word", merge_pair_column(l, r).alias("m")
            ).collect()
        }
        for w, syms in rows:
            assert got[w] == reference(syms, l, r), (l, r, syms, got[w])
