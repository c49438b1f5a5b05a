"""Property tests for the round-7 algebraic identities — pure Python,
no Spark session: these pin the MATH the entries rely on, independent
of any fixture."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=40))
def test_pettitt_midrank_identity(xs):
    """U_t = t(n+1) − 2·S_t (midranks) equals the pairwise sign-sum
    definition for EVERY split, under arbitrary tie structure — the
    identity that reduced ts_pettitt_changepoint from O(n³) to
    O(n log n)."""
    n = len(xs)
    sorted_vals = sorted(xs)

    def midrank2(v):  # doubled midrank — always an integer
        lo = sorted_vals.index(v) + 1
        hi = n - sorted_vals[::-1].index(v)
        return lo + hi

    mr2 = [midrank2(v) for v in xs]
    for t in range(1, n):
        u_def = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(t)
            for j in range(t, n)
        )
        assert 2 * u_def == 2 * t * (n + 1) - 2 * sum(mr2[:t])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=20),
)
def test_pps_hit_counts_partition_the_budget(ws, k):
    """sample_pps_systematic's integer hit-count formula: summed over
    all items, hits == k exactly (the selection points partition), each
    item's hits is within 1 of its expectation k·w/T, and any item with
    w ≥ T/k is guaranteed selection."""
    total = sum(ws)

    def npts(x):  # #selection points (2j+1)T/(2k) at or below x
        if 2 * k * x < total:
            return 0
        return (2 * k * x - total) // (2 * total) + 1

    c = 0
    hits = []
    for w in ws:
        lo, c = c, c + w
        hits.append(npts(c) - npts(lo))
    assert sum(hits) == k
    assert all(h >= 0 for h in hits)
    for w, h in zip(ws, hits):
        exp = k * w / total
        assert exp - 1 < h < exp + 1
        if w * k >= total:
            assert h >= 1


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-6, max_value=6, allow_nan=False),
                min_size=3, max_size=64))
def test_ad_folded_form_equals_paired_rank_form(zs):
    """stats_anderson_darling's single-pass fold equals the textbook
    paired-rank (i, n+1−i) form for any z sample."""
    import math

    def phi(z):
        return 1.0 / (1.0 + math.exp(-1.5976 * z - 0.07056 * z * z * z))

    z = sorted(zs)
    n = len(z)
    f = [phi(v) for v in z]
    if any(v <= 0.0 or v >= 1.0 for v in f):
        return  # extreme z saturates the CDF approx — outside the domain
    paired = sum(
        (2 * i - 1) * (math.log(f[i - 1]) + math.log(1 - f[n - i]))
        for i in range(1, n + 1)
    )
    folded = sum(
        (2 * i - 1) * math.log(f[i - 1]) + (2 * n + 1 - 2 * i) * math.log(1 - f[i - 1])
        for i in range(1, n + 1)
    )
    assert abs(paired - folded) < 1e-6 * max(1.0, abs(paired))
