"""Sketch unit tests — determinism, mergeability, accuracy."""

import numpy as np
import pandas as pd
import pytest

from etl_data_validation_kio_ray.sketches import (
    CountingHist,
    FixedHistogram,
    HyperLogLog,
    TDigest,
)
from etl_data_validation_kio_ray.sketches.hist import ks_stat, psi


def test_counting_hist_exact_quantiles_match_duckdb():
    import duckdb

    rng = np.random.default_rng(0)
    vals = np.clip(rng.lognormal(5, 1, 10_000).round(), 1, 8192).astype(np.int64)
    h = CountingHist(1, 8192).update(vals)
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"x": vals}))
    for q in (0.1, 0.25, 0.5, 0.9, 0.95, 0.99):
        want = con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        assert h.quantile(q) == want, q
    assert h.min() == vals.min() and h.max() == vals.max()
    assert h.sum() == vals.sum()


def test_counting_hist_merge_equals_bulk():
    rng = np.random.default_rng(1)
    a, b = rng.integers(1, 100, 500), rng.integers(1, 100, 700)
    m = CountingHist(1, 8192).update(a).merge(CountingHist(1, 8192).update(b))
    bulk = CountingHist(1, 8192).update(np.concatenate([a, b]))
    assert np.array_equal(m.counts, bulk.counts)


def test_hll_accuracy_and_merge_order_independence():
    rng = np.random.default_rng(2)
    vals = np.array([f"id-{i}" for i in range(50_000)], dtype=object)
    parts = np.array_split(vals, 7)
    h1 = HyperLogLog()
    for p in parts:
        h1.update(p)
    h2 = HyperLogLog()
    for p in reversed(parts):
        h2.update(p)
    assert np.array_equal(h1.registers, h2.registers)  # order-independent
    est = h1.estimate()
    assert abs(est - 50_000) / 50_000 < 0.03  # ~1.04/sqrt(2^14) ≈ 0.8% expected


def test_tdigest_quantiles():
    rng = np.random.default_rng(3)
    vals = rng.normal(100, 15, 100_000)
    td = TDigest()
    for chunk in np.array_split(vals, 13):
        td.update(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        want = np.quantile(vals, q)
        got = td.quantile(q)
        assert abs(got - want) < 0.02 * max(1.0, abs(want)) + 0.5, (q, got, want)
    # merge of sub-digests stays accurate
    halves = np.array_split(vals, 2)
    merged = TDigest().update(halves[0]).merge(TDigest().update(halves[1]))
    assert abs(merged.quantile(0.5) - np.median(vals)) < 1.0


def test_fixed_histogram_psi_ks():
    rng = np.random.default_rng(4)
    base = FixedHistogram(0, 100, 20).update(rng.normal(50, 10, 10_000))
    same = FixedHistogram(0, 100, 20).update(rng.normal(50, 10, 10_000))
    shifted = FixedHistogram(0, 100, 20).update(rng.normal(70, 10, 10_000))
    assert psi(base, same) < 0.05
    assert psi(base, shifted) > 0.5
    assert ks_stat(base, same) < 0.05
    assert ks_stat(base, shifted) > 0.3


def test_serialization_roundtrip():
    rng = np.random.default_rng(5)
    h = CountingHist(1, 100).update(rng.integers(1, 100, 100))
    assert np.array_equal(CountingHist.from_state(h.to_state()).counts, h.counts)
    hll = HyperLogLog().update(np.array(["a", "b"], dtype=object))
    assert np.array_equal(HyperLogLog.from_state(hll.to_state()).registers, hll.registers)
    td = TDigest().update(rng.normal(0, 1, 100))
    assert TDigest.from_state(td.to_state()).quantile(0.5) == td.quantile(0.5)


def test_heavy_hitters_exact_on_zipf(ray_session):
    """Two-pass MG heavy hitters == full value_counts HAVING, with key
    cardinality far above the counter budget k."""
    import ray.data as rd

    from etl_data_validation_kio_ray.sketches import heavy_hitters

    rng = np.random.Generator(np.random.Philox(key=[3, 7]))
    v = rng.zipf(1.3, 100_000).astype(np.int64)
    df = pd.DataFrame({"x": v})
    ds = rd.from_pandas(df).repartition(12)
    got = heavy_hitters(ds, "x", support=0.005, k=820)
    vc = df.x.value_counts()
    want = vc[vc >= int(np.ceil(0.005 * len(df)))].sort_index()
    assert df.x.nunique() > 820  # candidate budget genuinely exceeded
    assert got["key"].tolist() == want.index.tolist()
    assert got["count"].tolist() == want.values.tolist()

    # absolute threshold + list column flattening
    lists = pd.DataFrame({"toks": [v[i : i + 50].tolist() for i in range(0, 5000, 50)]})
    lds = rd.from_pandas(lists).repartition(4)
    flat = np.concatenate(lists.toks.to_numpy())
    vc2 = pd.Series(flat).value_counts()
    got2 = heavy_hitters(lds, "toks", threshold_count=100, k=512, list_col=True)
    want2 = vc2[vc2 >= 100].sort_index()
    assert got2["key"].tolist() == want2.index.tolist()
    assert got2["count"].tolist() == want2.values.tolist()


def test_heavy_hitters_guarantee_is_loud(ray_session):
    """A threshold inside the MG error bound must refuse, not silently
    under-report; and an unmeetable threshold returns empty, not junk."""
    import ray.data as rd

    from etl_data_validation_kio_ray.sketches import heavy_hitters

    ds = rd.from_pandas(
        pd.DataFrame({"x": np.arange(10_000, dtype=np.int64) % 5000})
    ).repartition(4)
    with pytest.raises(ValueError, match="error bound"):
        heavy_hitters(ds, "x", support=0.00001, k=8)
    with pytest.raises(ValueError, match="exactly one"):
        heavy_hitters(ds, "x")
    out = heavy_hitters(ds, "x", threshold_count=9999, k=64)
    assert out.empty


def test_grouped_hll_close_to_exact(ray_session):
    import ray.data as rd

    from etl_data_validation_kio_ray.sketches.hll import grouped_hll

    rng = np.random.Generator(np.random.Philox(key=[2, 41]))
    n = 20_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": rng.integers(0, 5000, n).astype(np.int64),
        }
    )
    sketches = grouped_hll(rd.from_pandas(df).repartition(6), "g", "v", p=12)
    for g, sub in df.groupby("g"):
        exact = sub["v"].nunique()
        est = sketches[g].estimate()
        assert abs(est - exact) / exact < 5 * 1.04 / np.sqrt(1 << 12)


def test_cms_one_sided_and_mergeable():
    from collections import Counter

    from etl_data_validation_kio_ray.sketches.cms import (
        cms_estimate,
        cms_merge,
        cms_partial,
    )

    rng = np.random.Generator(np.random.Philox(key=[7, 13]))
    keys = rng.zipf(1.3, 50_000).astype(np.int64) % 10_000
    # split into 5 batches, merge partials (order-independence)
    parts = [cms_partial(b) for b in np.array_split(keys, 5)]
    merged = cms_merge({"cms": p.tobytes()} for p in parts)
    merged_rev = cms_merge({"cms": p.tobytes()} for p in reversed(parts))
    assert np.array_equal(merged, merged_rev)
    whole = cms_partial(keys)
    assert np.array_equal(merged, whole)
    true = Counter(keys.tolist())
    probe = np.array(sorted(true, key=true.get, reverse=True)[:50], dtype=np.int64)
    est = cms_estimate(merged, probe)
    exact = np.array([true[k] for k in probe.tolist()])
    assert np.all(est >= exact)  # the one-sided guarantee
    # 4 rows of width 2048 over 50k items: overcount stays << N
    assert np.all(est - exact <= 4 * len(keys) // 2048)


def test_hll_intersection_query_self_asserts(ray_session):
    """The inclusion-exclusion composition query: runs end-to-end (it
    raises internally past 5 combined standard errors), emits one row
    of exact-integer register invariants (the oracle-able basis since
    round 5), and its exact side equals a pandas ground truth."""
    import pandas as pd

    import __ray_entry__ as m

    sf = "/root/testdata/sf0.001"
    out = m.queries()["hll_intersection"](sf)
    assert len(out) == 1
    assert set(out.columns) == {
        "zeros_view", "sum_reg_view", "wdot_view",
        "zeros_purchase", "sum_reg_purchase", "wdot_purchase",
        "zeros_union", "sum_reg_union", "wdot_union",
        "exact_intersection",
    }
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "user_id"])
    a = set(ev.loc[ev.event_type == "view", "user_id"])
    b = set(ev.loc[ev.event_type == "purchase", "user_id"])
    assert int(out["exact_intersection"].iloc[0]) == len(a & b)
    # union registers are elementwise max: never fewer zeros filled,
    # never a smaller register sum / weighted dot than either side
    r = out.iloc[0]
    assert r["zeros_union"] <= min(r["zeros_view"], r["zeros_purchase"])
    assert r["sum_reg_union"] >= max(r["sum_reg_view"], r["sum_reg_purchase"])
    assert r["wdot_union"] >= max(r["wdot_view"], r["wdot_purchase"])


def test_bloom_register_audit_state(ray_session):
    """The Bloom bitmap audit: invariants are consistent (popcount
    bounds, no false negatives for every build key) and stable across
    block arrival orders (OR-fold commutativity)."""
    import numpy as np
    import pyarrow.dataset as pds

    import ray.data as rd

    import __ray_entry__ as m
    from etl_data_validation_kio_ray.functions.bloom import (
        build_bloom,
        probe_bloom,
    )

    sf = "/root/testdata/sf0.001"
    out = m.queries()["bloom_register_audit"](sf)
    r = out.iloc[0]
    n_keys = rd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey"],
        filter=(pds.field("o_orderpriority") == "1-URGENT"),
    ).count()
    assert 0 < r.bits_set <= min(r.m_bits, r.k * n_keys)
    assert r.sum_idx_sq >= r.sum_idx  # idx >= 1 for all but bit 0
    # no false negatives: every build key probes true
    urgent = rd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey"],
        filter=(pds.field("o_orderpriority") == "1-URGENT"),
    )
    words = build_bloom(urgent, "o_orderkey", m_bits=int(r.m_bits), k=int(r.k))
    keys = urgent.to_pandas()["o_orderkey"].to_numpy()
    assert probe_bloom(keys, words, m_bits=int(r.m_bits), k=int(r.k)).all()
    # order independence: shuffled build gives the identical bitmap
    words2 = build_bloom(
        rd.from_pandas(
            urgent.to_pandas().sample(frac=1, random_state=7)
        ).repartition(5),
        "o_orderkey",
        m_bits=int(r.m_bits),
        k=int(r.k),
    )
    assert (words == words2).all()
