"""Property-based differential tests for the integer-rational rank-pick
machinery that quantiles, deciles, Pareto shares, and CVaR all share: the
histogram pick must equal the naive answer computed on the fully
materialized, sorted value list — for any multiset of values.

The invariant under test: pick(q) = sorted_values[ceil(n·q) - 1] where the
histogram path computes searchsorted(cumsum, (n·num + den - 1)//den).
"""

import numpy as np
from hypothesis import given, settings, strategies as st


def _hist_pick(values: np.ndarray, num: int, den: int) -> int:
    """The repo's histogram rank pick (stages/quantiles.py::pick et al.)."""
    vals, cnts = np.unique(values, return_counts=True)
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    rank = (n * num + den - 1) // den
    i = int(np.searchsorted(cum, rank, side="left"))
    return int(vals[i])


def _naive_pick(values: np.ndarray, num: int, den: int) -> int:
    s = np.sort(values)
    n = len(s)
    rank = (n * num + den - 1) // den  # ceil(n·num/den), 1-based
    return int(s[rank - 1])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1,
             max_size=300),
    st.sampled_from([(1, 2), (9, 10), (1, 4), (3, 4), (99, 100), (1, 100)]),
)
def test_hist_pick_equals_naive(values, q):
    arr = np.asarray(values, dtype=np.int64)
    num, den = q
    assert _hist_pick(arr, num, den) == _naive_pick(arr, num, den)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1_000), min_size=2,
             max_size=300)
)
def test_tail_counts_tie_inclusive(values):
    """The Pareto/CVaR tail contract: entities ≥ the value at the rank
    cutoff, ties included — the tail never shrinks below n - rank + 1 and
    never includes a value strictly below the cutoff."""
    arr = np.asarray(values, dtype=np.int64)
    cutoff = _hist_pick(arr, 9, 10)
    tail = arr[arr >= cutoff]
    n = len(arr)
    rank = (n * 9 + 9) // 10
    assert len(tail) >= n - rank + 1
    assert tail.min() >= cutoff


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1,
             max_size=200)
)
def test_decile_assignment_partitions(values):
    """Decile assignment via searchsorted-left over the 9 cutoffs partitions
    the multiset: every value lands in exactly one decile 1..10, and decile
    boundaries are monotone (the queries166/167 contract)."""
    arr = np.asarray(values, dtype=np.int64)
    cuts = np.asarray(
        [_hist_pick(arr, d, 10) for d in range(1, 10)], dtype=np.int64
    )
    dec = np.searchsorted(cuts, arr, side="left") + 1
    assert dec.min() >= 1 and dec.max() <= 10
    # monotone: a bigger value never gets a smaller decile
    order = np.argsort(arr, kind="mergesort")
    assert (np.diff(dec[order]) >= 0).all()
