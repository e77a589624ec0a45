"""Property-based pins for the pure monoid kernels (no Spark).

The Spark-level tests pin end-to-end behavior on fixed data; these
Hypothesis properties pin the ALGEBRA of the kernels under arbitrary
inputs, splits, and merge orders — only exact invariants that hold by
construction (never probabilistic bounds, which would flake):

* quantile sketch (_qsk_*): total weight conserved through any
  update/compaction/merge sequence; exact-regime merged state equals
  the one-pass multiset; bit-for-bit determinism; k-way merge is
  order-independent.
* Misra-Gries (_mg_trim + sum-then-trim merge): est <= true <=
  est + dec for every retained item; every item with true count > dec
  is retained; merge order-independence of the canonical reduce.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from polymarket_data_ingestor_spark.operators.analytics import (
    _mg_trim,
    _qsk_merge,
    _qsk_quantiles,
    _qsk_update,
)

values_lists = st.lists(
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e9, max_value=1e9),
    min_size=1, max_size=400,
)


def _weight(levels):
    return sum(len(b) << i for i, b in enumerate(levels))


def _multiset(levels):
    out = []
    for i, b in enumerate(levels):
        out.extend(sorted(b) * (1 << i))
    return sorted(out)


@settings(max_examples=80, deadline=None)
@given(values_lists, st.integers(2, 64), st.integers(1, 7))
def test_qsk_weight_conserved_and_deterministic(vals, k, chunks):
    def build():
        lv, fl = [[]], [False]
        step = max(1, len(vals) // chunks)
        for i in range(0, len(vals), step):
            _qsk_update(lv, fl, vals[i:i + step], k)
        return lv, fl

    lv1, fl1 = build()
    lv2, fl2 = build()
    assert lv1 == lv2 and fl1 == fl2          # deterministic
    assert _weight(lv1) == len(vals)          # weight exact, always
    # any reported quantile is an actual inserted value
    (q,) = _qsk_quantiles(lv1, (0.5,))
    assert q in vals


@settings(max_examples=80, deadline=None)
@given(values_lists, st.integers(1, 4))
def test_qsk_exact_regime_merge_equals_one_pass(vals, n_splits):
    k = len(vals) + 1  # capacity above n: no compaction anywhere
    parts = []
    for i in range(n_splits):
        lv, fl = [[]], [False]
        chunk = vals[i::n_splits]
        if chunk:
            _qsk_update(lv, fl, chunk, k)
        parts.append((lv, fl))
    merged = _qsk_merge(parts, k)
    merged_rev = _qsk_merge(parts[::-1], k)
    one = ([[]], [False])
    _qsk_update(one[0], one[1], vals, k)
    assert _multiset(merged[0]) == _multiset(one[0]) == sorted(vals)
    assert _multiset(merged_rev[0]) == _multiset(merged[0])


@settings(max_examples=80, deadline=None)
@given(values_lists, st.integers(2, 32), st.integers(2, 5))
def test_qsk_compacted_merge_order_independent(vals, k, n_splits):
    parts = []
    for i in range(n_splits):
        lv, fl = [[]], [False]
        chunk = vals[i::n_splits]
        if chunk:
            _qsk_update(lv, fl, chunk, k)
        parts.append((lv, fl))
    fwd = _qsk_merge(parts, k)
    rev = _qsk_merge(parts[::-1], k)
    assert [sorted(b) for b in fwd[0]] == [sorted(b) for b in rev[0]]
    assert fwd[1] == rev[1]
    assert _weight(fwd[0]) == len(vals)


items_lists = st.lists(
    st.sampled_from([f"i{j}" for j in range(30)]),
    min_size=1, max_size=300,
)


def _mg_build(items, k, chunks):
    counts: dict = {}
    dec = 0
    step = max(1, len(items) // chunks)
    for i in range(0, len(items), step):
        for it in items[i:i + step]:
            counts[it] = counts.get(it, 0) + 1
        dec += _mg_trim(counts, k)
    return counts, dec


@settings(max_examples=80, deadline=None)
@given(items_lists, st.integers(1, 12), st.integers(1, 6))
def test_mg_bounds_hold_under_any_split(items, k, chunks):
    true = {}
    for it in items:
        true[it] = true.get(it, 0) + 1
    counts, dec = _mg_build(items, k, chunks)
    assert len(counts) <= k
    for it, est in counts.items():
        assert 0 < est <= true[it] <= est + dec, (it, est, dec)
    for it, t in true.items():
        if t > dec:
            assert it in counts, (it, t, dec)


@settings(max_examples=80, deadline=None)
@given(items_lists, st.integers(1, 12), st.integers(2, 4))
def test_mg_canonical_merge_order_independent(items, k, n_splits):
    parts = [
        _mg_build(items[i::n_splits], k, 2) for i in range(n_splits)
    ]

    def reduce_all(ps):
        counts: dict = {}
        dec = 0
        for p, d in ps:
            for it, c in p.items():
                counts[it] = counts.get(it, 0) + c
            dec += d
        dec += _mg_trim(counts, k)
        return counts, dec

    assert reduce_all(parts) == reduce_all(parts[::-1])
    # the merged summary still satisfies the MG bounds vs the union
    true = {}
    for it in items:
        true[it] = true.get(it, 0) + 1
    counts, dec = reduce_all(parts)
    for it, est in counts.items():
        assert est <= true[it] <= est + dec


# --- top-k-by-score pack kernel (pure: _topk_pack over pair lists) ---

from polymarket_data_ingestor_spark.operators.analytics import (  # noqa: E402
    _topk_pack,
)

pairs_lists = st.lists(
    st.tuples(
        st.floats(allow_nan=False, allow_infinity=False,
                  min_value=-1e6, max_value=1e6),
        st.text(alphabet="abcd", min_size=1, max_size=3),
    ),
    min_size=1, max_size=200,
)


@settings(max_examples=80, deadline=None)
@given(pairs_lists, st.integers(1, 8), st.integers(1, 4))
def test_topk_pack_true_monoid_any_split(pairs, k, n_splits):
    """Pack(split) ∘ merge == pack(all): associative, commutative,
    idempotent on duplicate pairs — and the result IS the k best by
    (score DESC, id ASC) over the deduped pair set."""
    one = _topk_pack(list(pairs), k)
    packs = [_topk_pack(pairs[i::n_splits], k) for i in range(n_splits)]
    for order in (packs, packs[::-1]):
        carried = [
            (s, i) for p in order
            for s, i in zip(p["t_score"], p["t_id"])
        ]
        assert _topk_pack(carried, k) == one
    want = sorted(set(pairs), key=lambda t: (-t[0], t[1]))[:k]
    assert one["t_score"] == [s for s, _ in want]
    assert one["t_id"] == [i for _, i in want]
    # duplicate-idempotence: folding the result into itself is a no-op
    doubled = [(s, i) for s, i in zip(one["t_score"], one["t_id"])] * 2
    assert _topk_pack(doubled, k) == one
