"""Property-based kernel tests (SURVEY §5 plan item 2).

Hypothesis drives the packed replay kernel directly (no Spark session —
the kernel is a pure pandas function) against an independent model built
from plain dicts, over randomized message sequences: snapshots, diffs
(including deletes of missing levels), trades, interleaved assets, and
arbitrary arrival order vs sort keys.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from polymarket_data_ingestor_spark.operators.replay import (
    KIND_BOOK,
    KIND_CHANGE,
    KIND_TRADE,
    TICK_COLUMNS,
    _replay_group,
)

prices = st.integers(1, 60).map(lambda i: round(0.3 + i * 0.01, 2))
sizes = st.integers(0, 50).map(float)


@st.composite
def message(draw):
    kind = draw(st.sampled_from([KIND_BOOK, KIND_CHANGE, KIND_TRADE]))
    if kind == KIND_BOOK:
        def side_levels():
            ps = draw(st.lists(prices, max_size=5, unique=True))
            return [x for p in ps for x in (p, draw(sizes.filter(lambda s: s > 0)))]
        return kind, side_levels(), side_levels(), None
    if kind == KIND_CHANGE:
        n = draw(st.integers(1, 3))
        flat = []
        for _ in range(n):
            p = draw(prices)
            sign = draw(st.sampled_from([1.0, -1.0]))
            flat += [sign * p, draw(sizes)]  # size 0 ⇒ delete
        return kind, None, None, flat
    side = draw(st.sampled_from([1.0, -1.0]))
    return kind, None, None, [side * draw(prices), draw(sizes)]


def model_replay(msgs):
    """Independent model: plain dict book, explicit rules."""
    bids, asks = {}, {}
    rows = []
    for i, (kind, b, a, c) in enumerate(msgs):
        ts, mkt, asset = str(1000 + i), "m", "x"
        if kind == KIND_TRADE:
            sp, sz = c
            rows.append((ts, "TRADE", mkt, asset,
                         "BID" if sp > 0 else "ASK", abs(sp), sz))
            continue
        if kind == KIND_BOOK:
            bids = dict(zip(b[0::2], b[1::2]))
            asks = dict(zip(a[0::2], a[1::2]))
        else:
            for sp, sz in zip(c[0::2], c[1::2]):
                levels = bids if sp > 0 else asks
                p = abs(sp)
                if sz == 0:
                    levels.pop(p, None)
                else:
                    levels[p] = sz
        ask = (min(asks), asks[min(asks)]) if asks else (0.0, 0.0)
        bid = (max(bids), bids[max(bids)]) if bids else (0.0, 0.0)
        rows.append((ts, "BBO", mkt, asset, "ASK", ask[0], ask[1]))
        rows.append((ts, "BBO", mkt, asset, "BID", bid[0], bid[1]))
    return rows


@given(st.lists(message(), min_size=1, max_size=40),
       st.randoms(use_true_random=False))
@settings(max_examples=200, deadline=None)
def test_kernel_matches_model_any_arrival_order(msgs, rng):
    pdf = pd.DataFrame(
        {
            "kind_code": [m[0] for m in msgs],
            "timestamp": [str(1000 + i) for i in range(len(msgs))],
            "market": ["m"] * len(msgs),
            "asset_id": ["x"] * len(msgs),
            "bids_flat": [m[1] for m in msgs],
            "asks_flat": [m[2] for m in msgs],
            "changes_flat": [m[3] for m in msgs],
            "file_hour": ["h"] * len(msgs),
            "line_id": list(range(len(msgs))),
            "msg_idx": [0] * len(msgs),
        }
    )
    # arrival order is adversarial: the kernel must restore sort-key order
    pdf = pdf.sample(frac=1, random_state=rng.randint(0, 2**31)).reset_index(
        drop=True
    )
    got = _replay_group(pdf)
    got_rows = [tuple(r) for r in got[TICK_COLUMNS].itertuples(index=False)]
    assert got_rows == model_replay(msgs)


@given(st.lists(message(), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_kernel_row_count_invariants(msgs):
    pdf = pd.DataFrame(
        {
            "kind_code": [m[0] for m in msgs],
            "timestamp": [str(i) for i in range(len(msgs))],
            "market": ["m"] * len(msgs),
            "asset_id": ["x"] * len(msgs),
            "bids_flat": [m[1] for m in msgs],
            "asks_flat": [m[2] for m in msgs],
            "changes_flat": [m[3] for m in msgs],
            "file_hour": ["h"] * len(msgs),
            "line_id": list(range(len(msgs))),
            "msg_idx": [0] * len(msgs),
        }
    )
    got = _replay_group(pdf)
    n_book = sum(1 for m in msgs if m[0] != KIND_TRADE)
    n_trade = len(msgs) - n_book
    assert (got["kind"] == "BBO").sum() == 2 * n_book
    assert (got["kind"] == "TRADE").sum() == n_trade
    # ask row always precedes its bid row (emit_idx 0 then 1)
    bbo = got[got["kind"] == "BBO"]
    assert (bbo[bbo["emit_idx"] == 0]["side"] == "ASK").all()
    assert (bbo[bbo["emit_idx"] == 1]["side"] == "BID").all()
