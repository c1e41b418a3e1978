"""Deterministic hash-rate sampling — the reproducible distributed
sampler a web-scale pipeline uses to reweight a source mixture or cut
train/val splits: keep a row iff splitmix64(id) % den < rate[group].
No RNG state, no seed plumbing, no order dependence — the decision is a
pure function of the row's id, so it is identical across runs, cluster
sizes, block layouts and engines (the SQL twin re-expresses splitmix64
in UHUGEINT modular arithmetic, verified bit-exact).

Reference analog: the reference's experiment harness samples violation
rows for its reports (/root/reference/src/app2/etl_validation — report
row sampling); here the sampling is promoted to a first-class,
reproducible pipeline operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import _splitmix64


def _keep_mask(
    t: pa.Table, id_col: str, group_col: str, rates: dict, den: int
) -> np.ndarray:
    """Boolean keep mask for a batch: splitmix64(id) % den < rate[group].
    Unknown groups raise loudly (a silent default would skew the
    mixture invisibly)."""
    ids = t[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    v = pc.cast(ids, pa.int64()).to_numpy(zero_copy_only=False)
    h = _splitmix64(v.view(np.uint64)) % np.uint64(den)
    groups = t[group_col]
    if isinstance(groups, pa.ChunkedArray):
        groups = groups.combine_chunks()
    # vectorized dict lookup: factorize the batch's groups (few distinct)
    dct = groups.dictionary_encode()
    cats = dct.dictionary.to_pylist()
    missing = [c for c in cats if c not in rates]
    if missing:
        raise KeyError(
            f"hash_rate_sample: no rate for group(s) {missing!r} — "
            "pass an explicit rate for every group"
        )
    per_cat = np.array([rates[c] for c in cats], dtype=np.uint64)
    codes = dct.indices.to_numpy(zero_copy_only=False)
    return h < per_cat[codes]


def hash_rate_sample(
    ds, *, id_col: str, group_col: str, rates: dict, den: int = 100
):
    """Filter ``ds`` to the deterministic per-group sample. ``rates``
    maps group -> integer numerator (keep probability = rate/den).
    Returns a LAZY Dataset — one vectorized streaming pass, no shuffle,
    no driver materialization; the kept set is a pure function of ids,
    so re-runs and resumes see the identical sample."""
    for g, r in rates.items():
        if not (0 <= int(r) <= den):
            raise ValueError(
                f"hash_rate_sample: rate {r} for group {g!r} outside [0, {den}]"
            )

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_keep_mask(t, id_col, group_col, rates, den)))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def hash_sample_stats(
    ds,
    *,
    id_col: str,
    group_col: str,
    rates: dict,
    den: int = 100,
    value_col: str | None = None,
) -> pd.DataFrame:
    """Per-group audit of the sample in ONE fused pass: (group, n_in,
    n_kept[, kept_<value_col>]) — per-batch partials collapse to at
    most |groups| rows before anything leaves a worker. All int64."""
    from ..pipelines.relational import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        keep = _keep_mask(t, id_col, group_col, rates, den)
        cols = {
            group_col: t[group_col],
            "n_in": pa.array(np.ones(t.num_rows, np.int64)),
            "n_kept": pa.array(keep.astype(np.int64)),
        }
        if value_col is not None:
            v = pc.cast(t[value_col], pa.int64()).to_numpy(zero_copy_only=False)
            cols[f"kept_{value_col}"] = pa.array(np.where(keep, v, 0))
        part = pa.table(cols)
        specs = [("n_in", "sum"), ("n_kept", "sum")]
        if value_col is not None:
            specs.append((f"kept_{value_col}", "sum"))
        out = part.group_by(group_col).aggregate(specs)
        return out.rename_columns([group_col] + [c for c, _ in specs])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    aggs = {"n_in": ("n_in", "sum"), "n_kept": ("n_kept", "sum")}
    if value_col is not None:
        aggs[f"kept_{value_col}"] = (f"kept_{value_col}", "sum")
    out = grouped_agg(partials, [group_col], aggs)
    for c in aggs:
        out[c] = out[c].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)
