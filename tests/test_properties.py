"""Property-based checks (hypothesis): the mergeable-summary contract —
any partitioning of the data must produce identical (or
tolerance-bounded) merged state. This is the invariant Ray Data's
arbitrary batching/scheduling relies on (SURVEY.md §7.4 'exactness
under distribution')."""

import numpy as np
from hypothesis import given, settings, strategies as st

from etl_data_validation_kio_ray.sketches import (
    CountingHist,
    FixedHistogram,
    HyperLogLog,
    TDigest,
)


values = st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=400)
cut = st.integers(min_value=0, max_value=400)


@given(values, cut)
@settings(max_examples=60, deadline=None)
def test_counting_hist_split_invariant(vals, c):
    vals = np.asarray(vals)
    c = min(c, len(vals))
    bulk = CountingHist(1, 500).update(vals)
    merged = (
        CountingHist(1, 500)
        .update(vals[:c])
        .merge(CountingHist(1, 500).update(vals[c:]))
    )
    assert np.array_equal(bulk.counts, merged.counts)
    # quantile matches numpy's method='inverted_cdf' discrete quantile
    for q in (0.1, 0.5, 0.9, 0.99):
        want = int(np.quantile(vals, q, method="inverted_cdf"))
        assert bulk.quantile(q) == want


@given(values, cut)
@settings(max_examples=40, deadline=None)
def test_fixed_histogram_split_invariant(vals, c):
    vals = np.asarray(vals, dtype=np.float64)
    c = min(c, len(vals))
    bulk = FixedHistogram(0, 512, 32).update(vals)
    merged = (
        FixedHistogram(0, 512, 32)
        .update(vals[:c])
        .merge(FixedHistogram(0, 512, 32).update(vals[c:]))
    )
    assert np.array_equal(bulk.counts, merged.counts)


@given(values, cut)
@settings(max_examples=30, deadline=None)
def test_hll_split_invariant_and_bound(vals, c):
    vals = np.asarray([f"k{v}-{i%7}" for i, v in enumerate(vals)], dtype=object)
    c = min(c, len(vals))
    bulk = HyperLogLog().update(vals)
    merged = HyperLogLog().update(vals[:c]).merge(HyperLogLog().update(vals[c:]))
    assert np.array_equal(bulk.registers, merged.registers)
    exact = len(set(vals.tolist()))
    assert abs(bulk.estimate() - exact) <= max(3.0, 0.15 * exact)


@given(values, cut)
@settings(max_examples=30, deadline=None)
def test_tdigest_split_tolerance(vals, c):
    vals = np.asarray(vals, dtype=np.float64)
    c = min(c, len(vals))
    bulk = TDigest().update(vals)
    merged = TDigest().update(vals[:c]).merge(TDigest().update(vals[c:]))
    spread = max(1.0, vals.max() - vals.min())
    for q in (0.25, 0.5, 0.9):
        assert abs(bulk.quantile(q) - merged.quantile(q)) <= 0.1 * spread
        if len(vals) >= 20:  # tiny samples: interpolation conventions differ
            assert abs(bulk.quantile(q) - float(np.quantile(vals, q))) <= 0.15 * spread
