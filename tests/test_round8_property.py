"""Property tests for the round-8 per-value median-straddle
machinery — the identities every rank-based stats8 operator leans on,
checked against naive sorting on arbitrary multisets (no Spark).

The engine never sorts: medians come from per-VALUE counts via the
floored-rank straddle, and weighted medians (Hodges-Lehmann, VaR)
from the doubled-rank straddle. These tests pin that the straddle
conditions select exactly the element naive sorting selects, ties and
all — the cross-engine-determinism backbone of
levene/moods/hodges/wilcoxon/ks/revenue_var.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st


def _straddle_lower_median(values):
    """The engine's formulation: per-value counts, cumulative-below,
    value where cum < r <= cum + t with r = floor((n+1)/2)."""
    counts = Counter(values)
    n = len(values)
    r = (n + 1) // 2
    cum = 0
    for v in sorted(counts):
        t = counts[v]
        if cum < r <= cum + t:
            return v
        cum += t
    raise AssertionError("straddle found no median")


def _straddle_weighted_lower_median(weighted):
    """Doubled-rank straddle over (value, weight) pairs:
    2·cum < T + T%2 <= 2·(cum + w) — the hodges_lehmann formulation
    (avoids any division on the possibly-huge total T)."""
    total = sum(w for _, w in weighted)
    two_r = total + total % 2
    cum = 0
    for v, w in sorted(weighted):
        if 2 * cum < two_r <= 2 * (cum + w):
            return v
        cum += w
    raise AssertionError("weighted straddle found no median")


@given(st.lists(st.integers(min_value=-50, max_value=50), min_size=1,
                max_size=300))
@settings(max_examples=300, deadline=None)
def test_straddle_matches_sorted_lower_median(values):
    xs = sorted(values)
    want = xs[(len(xs) + 1) // 2 - 1]
    assert _straddle_lower_median(values) == want


@given(st.lists(st.tuples(st.integers(min_value=-30, max_value=30),
                          st.integers(min_value=1, max_value=40)),
                min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_weighted_straddle_matches_expanded_multiset(weighted):
    # collapse duplicate values the way a groupBy would
    counts = Counter()
    for v, w in weighted:
        counts[v] += w
    expanded = sorted(
        v for v, w in counts.items() for _ in range(w)
    )
    want = expanded[(len(expanded) + 1) // 2 - 1]
    assert _straddle_weighted_lower_median(list(counts.items())) == want


@given(st.lists(st.integers(min_value=1, max_value=50), min_size=2,
                max_size=200),
       st.lists(st.integers(min_value=1, max_value=50), min_size=2,
                max_size=200))
@settings(max_examples=200, deadline=None)
def test_ks_integer_crossmul_matches_float_sup(a, b):
    """ks_test_quantity's integer |fa·mb − fb·ma| argmax picks the
    same D as the floating-point sup over ECDF differences."""
    ma, mb = len(a), len(b)
    ca, cb = Counter(a), Counter(b)
    best_int = None
    fa = fb = 0
    for v in sorted(set(a) | set(b)):
        fa += ca.get(v, 0)
        fb += cb.get(v, 0)
        dnum = abs(fa * mb - fb * ma)
        if best_int is None or dnum > best_int:
            best_int = dnum
    want = max(
        abs(sum(1 for x in a if x <= v) / ma
            - sum(1 for x in b if x <= v) / mb)
        for v in set(a) | set(b)
    )
    assert abs(best_int / (ma * mb) - want) < 1e-12


def _rank2_triple(me, o1, o2):
    """friedman_test's doubled within-block average rank formula."""
    lt = (o1 < me) + (o2 < me)
    eq = (o1 == me) + (o2 == me)
    return 2 * lt + eq + 2


@given(st.tuples(st.integers(min_value=1, max_value=50),
                 st.integers(min_value=1, max_value=50),
                 st.integers(min_value=1, max_value=50)))
@settings(max_examples=300, deadline=None)
def test_doubled_rank_formula_matches_naive_tied_ranks(triple):
    q1, q2, q3 = triple
    vals = [q1, q2, q3]
    naive = []
    for x in vals:
        lt = sum(1 for y in vals if y < x)
        eq = sum(1 for y in vals if y == x)
        naive.append(lt + (eq + 1) / 2)
    got = [
        _rank2_triple(q1, q2, q3) / 2,
        _rank2_triple(q2, q1, q3) / 2,
        _rank2_triple(q3, q1, q2) / 2,
    ]
    assert got == naive
    assert sum(got) == 6.0  # rank sums of 3 items are invariant
