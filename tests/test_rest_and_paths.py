"""Tests: REST pagination logic (S1/S2), GCS path helper (S4), IVF ANN."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from polymarket_data_ingestor_spark.sources.paths import gcs_paths
from polymarket_data_ingestor_spark.sources.rest import (
    END_CURSOR,
    PAGE_SIZE,
    active_filter,
    decode_cursor,
    encode_cursor,
    fetch_markets,
    fetch_sampling_markets,
    markets_to_df,
)


def _fake_api(n_markets: int):
    """Offset-cursor paginated fake of the CLOB /markets endpoint."""
    calls = []

    def fetch_page(cursor: str) -> dict:
        calls.append(cursor)
        off = decode_cursor(cursor) if cursor else 0
        rows = [{"condition_id": f"m{i}"} for i in
                range(off, min(off + PAGE_SIZE, n_markets))]
        nxt = (encode_cursor(off + PAGE_SIZE)
               if off + PAGE_SIZE < n_markets else END_CURSOR)
        return {"data": rows, "next_cursor": nxt}

    return fetch_page, calls


def test_cursor_roundtrip():
    assert decode_cursor(encode_cursor(1500)) == 1500
    assert encode_cursor(0) == "MA=="  # base64("0"), like the reference


def test_fetch_markets_paginates_fully():
    fetch, calls = _fake_api(1203)
    got = fetch_markets(fetch)
    assert len(got) == 1203
    assert [m["condition_id"] for m in got[:2]] == ["m0", "m1"]
    assert len(calls) == 3  # 500 + 500 + 203


def test_fetch_markets_single_short_page():
    fetch, calls = _fake_api(7)
    assert len(fetch_markets(fetch)) == 7
    assert len(calls) == 1


def test_fetch_markets_retries_transient_errors():
    attempts = {"n": 0}

    def flaky(cursor: str) -> dict:
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise ConnectionError("transient")
        return {"data": [{"condition_id": "m0"}], "next_cursor": END_CURSOR}

    assert len(fetch_markets(flaky)) == 1
    assert attempts["n"] == 2


def test_fetch_markets_non_advancing_cursor_raises():
    """A server returning the same cursor with non-empty data must raise
    instead of spinning the pagination loop forever."""
    def stuck(cursor: str) -> dict:
        return {"data": [{"condition_id": "m0"}],
                "next_cursor": encode_cursor(0)}

    with pytest.raises(RuntimeError, match="non-advancing"):
        fetch_markets(stuck)


def test_fetch_sampling_markets_sequential():
    pages = [
        {"data": [{"condition_id": "a"}], "next_cursor": "XYZ"},
        {"data": [{"condition_id": "b"}], "next_cursor": END_CURSOR},
    ]
    it = iter(pages)
    got = fetch_sampling_markets(lambda c: next(it))
    assert [m["condition_id"] for m in got] == ["a", "b"]


def test_active_filter_clauses():
    base = {"enable_order_book": True, "accepting_orders": True,
            "archived": False, "closed": False}
    bad = [dict(base, enable_order_book=False),
           dict(base, accepting_orders=False),
           dict(base, archived=True),
           dict(base, closed=True)]
    assert active_filter([base] + bad) == [base]


def test_markets_to_df_schema_and_dynamic_fields(spark):
    mkts = [{
        "condition_id": "0xabc", "question": "Q?", "closed": False,
        "tokens": [{"outcome": "Yes", "price": 0.5, "token_id": "t",
                    "winner": False}],
        "someday_new_field": 42,
    }]
    df = markets_to_df(spark, mkts)
    row = df.first()
    assert row.condition_id == "0xabc"
    assert row.tokens[0].outcome == "Yes"
    assert row.other == {"someday_new_field": "42"}  # serde-flatten analogue


def test_gcs_paths():
    got = gcs_paths(
        "polymarket-data-bucket",
        datetime(2025, 9, 30, 13, 30, tzinfo=timezone.utc),
        datetime(2025, 9, 30, 15, 0, tzinfo=timezone.utc),
    )
    assert got == [
        "gs://polymarket-data-bucket/raw/2025-09-30-13.jsonl.zst",
        "gs://polymarket-data-bucket/raw/2025-09-30-14.jsonl.zst",
    ]


@pytest.mark.slow
def test_ivf_topk_recall_beats_lsh_style_subset(spark):
    from polymarket_data_ingestor_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = S.cosine_topk(emb, queries, k=10).toPandas()
    # the codebook fit must be bounded: a deterministic sample, not the
    # full corpus (at 100 TB a full-corpus KMeans fit per query batch
    # would dwarf the search itself)
    fit_fraction = 0.5
    n_total = emb.count()
    n_fit = emb.sample(fraction=fit_fraction, seed=42).count()
    assert n_fit < n_total * 0.7  # genuinely a sample
    codebook = S.fit_ivf_codebook(
        emb, n_clusters=8, fit_fraction=fit_fraction
    )
    assert len(codebook) == 8
    ivf = S.ivf_topk(
        emb, queries, k=10, n_probe=3, codebook=codebook
    ).toPandas()
    e = set(map(tuple, exact[["query_id", "vec_id"]].itertuples(index=False)))
    a = set(map(tuple, ivf[["query_id", "vec_id"]].itertuples(index=False)))
    recall = len(e & a) / len(e)
    # probing 3/8 clusters must capture well over the 3/8 random baseline
    assert recall >= 0.5
    merged = ivf.merge(exact, on=["query_id", "vec_id"], suffixes=("_a", "_e"))
    assert (merged.cos_a == merged.cos_e).all()
    # default path (no codebook passed) fits its own sampled codebook
    ivf2 = S.ivf_topk(emb, queries, k=10, n_clusters=8, n_probe=3).toPandas()
    assert len(ivf2) == len(ivf)


def test_pq_topk_recall_and_compression(spark):
    """Product quantization: codes are n_subspaces small ints (the 64x
    compression story), ADC top-k recalls well over half the exact
    neighbors at 8x16, recall rises with finer codebooks, and encoding
    is deterministic for a fixed seed."""
    import numpy as np

    from polymarket_data_ingestor_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = S.cosine_topk(emb, queries, k=10).toPandas()
    e = set(map(tuple, exact[["query_id", "vec_id"]].itertuples(index=False)))

    cbs = S.fit_pq_codebooks(emb, n_subspaces=8, n_centroids=16,
                             fit_fraction=0.5)
    assert len(cbs) == 8 and all(len(cb) == 16 for cb in cbs)
    assert len(cbs[0][0]) == 64 // 8  # subvector width

    # encode: every vector -> 8 codes in [0, 16)
    enc = S.pq_encode(emb, cbs).select("vec_id", "pq_codes").toPandas()
    codes = np.stack(enc["pq_codes"].to_numpy())
    assert codes.shape == (len(enc), 8)
    assert codes.min() >= 0 and codes.max() < 16
    # deterministic: refit with the same seed -> identical codes
    enc2 = S.pq_encode(
        emb, S.fit_pq_codebooks(emb, 8, 16, fit_fraction=0.5)
    ).select("vec_id", "pq_codes").toPandas()
    m = enc.merge(enc2, on="vec_id")
    assert all((a == b).all() for a, b in
               zip(m["pq_codes_x"], m["pq_codes_y"]))

    pq = S.pq_topk(emb, queries, k=10, codebooks=cbs).toPandas()
    a = set(map(tuple, pq[["query_id", "vec_id"]].itertuples(index=False)))
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall
    # refinement contract: quantization only chooses candidates — every
    # reported score is the EXACT cosine (equal to the anchor's)
    merged = pq.merge(exact, on=["query_id", "vec_id"],
                      suffixes=("_a", "_e"))
    assert (merged.score == merged.cos).all()

    # a finer quantizer (more centroids per subspace) must not recall
    # materially worse — quantization error is the only error source
    cbs_fine = S.fit_pq_codebooks(emb, n_subspaces=8, n_centroids=64,
                                  fit_fraction=1.0)
    pq_f = S.pq_topk(emb, queries, k=10, codebooks=cbs_fine).toPandas()
    af = set(map(tuple, pq_f[["query_id", "vec_id"]].itertuples(index=False)))
    recall_f = len(e & af) / len(e)
    assert recall_f >= recall - 0.05, (recall, recall_f)

    # output contract: ranked (score desc, id) per query, k rows max
    for qid, grp in pq.groupby("query_id"):
        keys = [(-s, i) for s, i in zip(grp["score"], grp["vec_id"])]
        assert keys == sorted(keys) and len(grp) <= 10
