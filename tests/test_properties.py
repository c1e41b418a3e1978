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


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FA0),
                max_size=120,
            ),
        ),
        min_size=0,
        max_size=60,
    ),
    st.integers(min_value=0, max_value=5),
)
@settings(max_examples=60, deadline=None)
def test_hash_string_array_properties(vals, seed):
    """Equal strings hash equal; hashing is batch-independent and
    null-distinguishing for any unicode content and seed."""
    import numpy as np
    import pyarrow as pa

    from etl_data_validation_kio_ray.functions.hashing import hash_string_array

    arr = pa.array(vals, pa.string())
    h = hash_string_array(arr, seed=seed)
    assert len(h) == len(vals) and h.dtype == np.uint64
    # equal values agree, unequal non-null values disagree (no observed
    # collisions in this tiny domain), independent of batch position
    for i, v in enumerate(vals):
        solo = hash_string_array(pa.array([v], pa.string()), seed=seed)[0]
        assert solo == h[i]
    by_val = {}
    for i, v in enumerate(vals):
        if v in by_val:
            assert h[by_val[v]] == h[i]
        by_val[v] = i


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "e f", ""]), min_size=0, max_size=15
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_shingle_stats_property(word_lists, k):
    """Vectorized distinct-kgram counts equal the tuple-set oracle for
    arbitrary word sequences (incl. empty words and repeats)."""
    import pyarrow as pa

    from etl_data_validation_kio_ray.functions.text import shingle_stats

    texts = [" ".join(ws) for ws in word_lists]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = shingle_stats(t, k=k)["n_shingles"].to_pylist()
    for text, g in zip(texts, got):
        ws = text.lower().split(" ")
        want = (
            len({tuple(ws[i : i + k]) for i in range(len(ws) - k + 1)})
            if len(ws) >= k
            else 0
        )
        assert g == want, (text, k, g, want)


@given(
    n=st.integers(min_value=1, max_value=500),
    k=st.integers(min_value=1, max_value=37),
)
@settings(max_examples=60, deadline=None)
def test_ntile_from_rank_property(n, k):
    """ntile_from_rank reproduces SQL NTILE for any (n, k): first n%k
    tiles hold ceil(n/k) rows, the rest floor(n/k), monotone over rank."""
    from etl_data_validation_kio_ray.pipelines.relational import ntile_from_rank

    tiles = ntile_from_rank(np.arange(1, n + 1), n, k)
    assert tiles.min() == 1 and tiles.max() == min(k, n)
    assert (np.diff(tiles) >= 0).all()
    sizes = np.bincount(tiles)[1:]
    q, r = divmod(n, k)
    expect = [q + 1] * r + [q] * (k - r)
    assert sizes.tolist() == [s for s in expect if s > 0]


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
        ),
        max_size=20,
    )
)
@settings(max_examples=40, deadline=None)
def test_canonicalize_text_property_matches_duckdb(texts):
    """RE2 canonicalization is bit-identical to the DuckDB twin for
    arbitrary unicode input (both engines are RE2)."""
    import duckdb
    import pyarrow as pa

    from etl_data_validation_kio_ray.functions.text import canonicalize_text

    got = canonicalize_text(pa.array(texts, pa.string())).to_pylist()
    if not texts:
        assert got == []
        return
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT trim(regexp_replace(lower(t), '[^a-z0-9]+', ' ', 'g')) "
            "FROM (SELECT unnest(?) AS t)",
            params=[texts],
        ).fetchall()
    ]
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=30), max_size=8), max_size=12
    )
)
@settings(max_examples=30, deadline=None)
def test_token_bigram_partial_property(docs):
    """The PRODUCTION bigram batch kernel (text._bigram_partial:
    boundary masking + run-length count) equals a per-document Python
    brute force for arbitrary lists, including empty and single-token
    documents."""
    import pyarrow as pa

    from etl_data_validation_kio_ray.functions.text import _bigram_partial

    t = pa.table({"tokens": pa.array(docs, pa.list_(pa.int32()))})
    want: dict = {}
    for d in docs:
        for a, b in zip(d, d[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1

    out = _bigram_partial(t, vocab=100)
    got = {
        (int(c) // 100, int(c) % 100): int(n)
        for c, n in zip(out["code"].to_pylist(), out["cnt"].to_pylist())
    }
    assert got == want


@given(
    ev=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # user
            st.integers(min_value=0, max_value=50),  # ts seconds
            st.integers(min_value=0, max_value=3),   # event kind (0,1,2 = steps)
        ),
        max_size=60,
    )
)
@settings(max_examples=25, deadline=None)
def test_funnel_counts_property(ray_session, ev):
    """funnel_counts == per-user brute-force step resolution for random
    event streams (ties, repeats, missing steps, noise types)."""
    import pandas as pd
    import ray.data as rd

    from etl_data_validation_kio_ray.pipelines.relational import funnel_counts

    steps = ["s0", "s1", "s2"]
    df = pd.DataFrame(
        {
            "u": [u for u, _, _ in ev],
            "ts": pd.to_datetime([t for _, t, _ in ev], unit="s"),
            "k": [f"s{k}" if k < 3 else "noise" for _, _, k in ev],
        }
    )
    got = funnel_counts(
        rd.from_pandas(df) if len(df) else rd.from_items([{"u": 0, "ts": pd.Timestamp(0), "k": "noise"}]),
        "u", "ts", "k", steps, num_buckets=4,
    )

    # brute force
    want = []
    users = sorted(set(df["u"])) if len(df) else []
    thresh = {u: None for u in users}
    alive = set(users)
    for s in steps:
        nxt = {}
        for u in sorted(alive):
            sub = df[(df["u"] == u) & (df["k"] == s)]
            if thresh[u] is not None:
                sub = sub[sub["ts"] >= thresh[u]]
            if len(sub):
                nxt[u] = sub["ts"].min()
        thresh = nxt
        alive = set(nxt)
        want.append(len(nxt))
    assert got["n_users"].tolist() == want
