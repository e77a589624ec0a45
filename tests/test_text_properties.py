"""Property-based tests for the round-5 text operators.

Hypothesis drives the DataFrame-level operators against naive Python
models over small randomized corpora. Few examples (each example runs
real Spark jobs) but adversarial shapes: empty docs, repeated tokens,
full-duplicate docs, boilerplate grams crossing the hot-window cap.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from polymarket_data_ingestor_spark.operators.dedup import (
    _py_grams,
    _py_tokens,
    substring_dup_pairs,
)
from polymarket_data_ingestor_spark.operators.text import bigram_lm_score

VOCAB = ["aa", "bb", "cc", "dd", "ee"]

corpora = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=14),
    min_size=2,
    max_size=6,
)


def _naive_substring_pairs(rows, k, min_shared, cap):
    gram_sets = {
        i: {g for g in _py_grams(_py_tokens(t), k) if g != ""}
        for i, t in rows
    }
    df = Counter(g for gs in gram_sets.values() for g in gs)
    kept = {i: {g for g in gs if df[g] <= cap}
            for i, gs in gram_sets.items()}
    ids = sorted(kept)
    out = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            shared = len(kept[ids[x]] & kept[ids[y]])
            if shared >= min_shared:
                out[(ids[x], ids[y])] = shared
    return out


def _naive_bigram_lm(rows):
    doc_bigrams = {}
    for i, t in rows:
        toks = _py_tokens(t)
        bg = [
            (toks[j], toks[j + 1])
            for j in range(len(toks) - 1)
            if toks[j] != "" and toks[j + 1] != ""
        ]
        if bg:
            doc_bigrams[i] = bg
    c2: Counter = Counter()
    c1: Counter = Counter()
    succ = set()
    for bg in doc_bigrams.values():
        for a, b in bg:
            c2[(a, b)] += 1
            c1[a] += 1
            succ.add(b)
    v = len(succ)
    return {
        i: (
            len(bg),
            sum(round(math.log((c2[p] + 1.0) / (c1[p[0]] + v)), 9)
                for p in bg) / len(bg),
        )
        for i, bg in doc_bigrams.items()
    }


@given(corpora)
@settings(max_examples=5, deadline=None)
def test_substring_pairs_match_naive_model(spark, docs):
    # small vocab → dense overlap; low cap exercises hot-window drops
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in substring_dup_pairs(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            k=3, min_shared=1, max_gram_docs=3,
        ).collect()
    }
    assert got == _naive_substring_pairs(rows, 3, 1, 3)


@given(corpora)
@settings(max_examples=5, deadline=None)
def test_bigram_lm_matches_naive_model(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in bigram_lm_score(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    want = _naive_bigram_lm(rows)
    assert set(got) == set(want)
    for i, (n, avg) in want.items():
        assert got[i][0] == n
        # tolerance instead of bit-parity: Python's round() is
        # round-half-even on binary doubles while the operator pins
        # Spark/DuckDB HALF_UP decimal rounding — they can differ by
        # 1e-9 per term at half-boundaries, which the 9-dp pre-round
        # bounds at ~1e-9 on the average
        assert got[i][1] == pytest.approx(avg, abs=5e-9)


# --- WordPiece counter vs naive greedy model -------------------------------

_WP_VOCAB = ("a", "b", "ab", "abc", "bca", "cab", "aaaa")
#   (NBSP) is NOT a separator for the ASCII-\s tokenizer — a word
# containing it has no matching piece at that position and collapses to
# [UNK]; the Unicode-aware str.strip()/str.split() would instead treat
# it as whitespace, which is exactly the divergence this alphabet pins
_wp_words = st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=8),
    min_size=0,
    max_size=6,
)
_wp_docs = st.lists(_wp_words, min_size=1, max_size=5)


def _naive_wordpiece_count(text: str, vocab: tuple[str, ...]) -> int:
    """Independent greedy longest-match model (no memo, no maxlen cap).

    Splits on ASCII whitespace only — Java/RE2-common semantics, matching
    the operator's contract and the DuckDB oracle's ASCII trim.
    """
    import re

    total = 0
    for w in re.split(r"\s+", text, flags=re.ASCII):
        if not w:
            continue
        pos, n = 0, 0
        while pos < len(w):
            piece = next(
                (
                    w[pos : pos + plen]
                    for plen in range(len(w) - pos, 0, -1)
                    if w[pos : pos + plen] in vocab
                ),
                None,
            )
            if piece is None:
                n = 1  # whole word collapses to [UNK]
                break
            n += 1
            pos += len(piece)
        total += n
    return total


@given(_wp_docs)
@settings(max_examples=5, deadline=None)
def test_wordpiece_counts_match_naive_model(spark, docs):
    from polymarket_data_ingestor_spark.operators.text import with_token_counts

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    got = {
        r["doc_id"]: r["n_tok"]
        for r in with_token_counts(
            spark.createDataFrame(rows, "doc_id long, text string"),
            vocab=_WP_VOCAB,
        ).collect()
    }
    assert got == {
        i: _naive_wordpiece_count(t, _WP_VOCAB) for i, t in rows
    }


def test_ccnet_perplexity_bucket_composition(spark):
    """The CCNet head/middle/tail recipe needs NO new operator — it is
    bigram_lm_score (corpus-trained LM quality) composed with
    quality_percentile_filter's percent_rank pattern. Pin the
    composition: terciles partition the scored docs deterministically,
    the 'head' bucket has the highest mean avg_logprob (lowest
    perplexity), and the bucketing is a pure function of the corpus
    (layout-independent)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from polymarket_data_ingestor_spark.operators.text import (
        bigram_lm_score,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    scored = bigram_lm_score(docs).select("doc_id", "avg_logprob")
    w = Window.orderBy(F.col("avg_logprob").desc(), F.col("doc_id"))
    bucketed = scored.withColumn(
        "bucket",
        F.least(
            F.lit(2),
            ((F.percent_rank().over(w)) * 3).cast("int"),
        ),
    )
    rows = bucketed.collect()
    n = len(rows)
    assert n > 30
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["avg_logprob"])
    assert set(by_bucket) == {0, 1, 2}
    # tercile sizes within 1 of each other (percent_rank boundaries)
    sizes = sorted(len(v) for v in by_bucket.values())
    assert sizes[-1] - sizes[0] <= 2, sizes
    # head (bucket 0) strictly better than tail (bucket 2) on average
    mean = {b: sum(v) / len(v) for b, v in by_bucket.items()}
    assert mean[0] > mean[1] > mean[2]
    # layout independence
    again = {
        r["doc_id"]: r["bucket"]
        for r in bucketed.repartition(13).collect()
    }
    assert again == {r["doc_id"]: r["bucket"] for r in rows}
