"""Embedding-cosine near-duplicate detection.

Scale shape: random-hyperplane LSH (seeded, deterministic) buckets
vectors with ONE groupby shuffle; candidate pairs within a bucket are
verified with exact cosine. The hyperplane matrix is built once per
actor from the fixed seed (no broadcast needed — it's derived state,
the actor-pool analog of the reference's module-level compiled
validators)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


from ..functions.vectors import batch_vectors as _vectors


class HyperplaneBucketer:
    """Multi-table random-hyperplane LSH: ``n_tables`` independent
    hyperplane sets (all derived from the fixed seed). A pair is a
    candidate if it shares a bucket in ANY table — recall for pairs at
    cosine c is 1-(1-p^b)^T with p = 1 - arccos(c)/pi, so tables are
    the recall lever while planes-per-table bounds bucket size. Rows
    are exploded T-fold (table id folded into the bucket key), so the
    single groupby shuffle still moves each vector T times — keep T
    small (<= 8) or switch to a candidate-scan-then-gather layout like
    dedup/minhash.py when vectors are wide."""

    def __init__(
        self, vec_col="embedding", id_col="vec_id", *,
        dim=64, n_planes=16, n_tables=1, seed=11,
    ):
        rng = np.random.Generator(np.random.Philox(key=[seed, 0xA11CE]))
        self.planes = rng.standard_normal((dim, n_planes * n_tables)).astype(
            np.float32
        )
        self.n_planes, self.n_tables = n_planes, n_tables
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        dim = self.planes.shape[0]
        if batch.num_rows == 0:  # empty block: keep the vec schema stable
            return pa.table(
                {
                    self.id_col: batch[self.id_col],
                    "bucket": pa.array([], pa.int64()),
                    "vec": pa.FixedSizeListArray.from_arrays(
                        pa.array([], pa.float32()), dim
                    ),
                    "norm": pa.array([], pa.float64()),
                }
            )
        v = _vectors(batch, self.vec_col)
        n = len(v)
        proj = v @ self.planes  # (n, planes*tables)
        bits = (proj > 0).astype(np.uint64)
        keys = np.zeros((n, self.n_tables), dtype=np.uint64)
        for t in range(self.n_tables):  # table/plane-bounded loops
            for b in range(self.n_planes):
                keys[:, t] |= bits[:, t * self.n_planes + b] << np.uint64(b)
            keys[:, t] |= np.uint64(t) << np.uint64(self.n_planes)
        norm = np.linalg.norm(v, axis=1).astype(np.float64)  # float64 cosine math
        T = self.n_tables
        rep = np.repeat(np.arange(n, dtype=np.int64), T)
        flat = v.astype(np.float32, copy=False)[rep].ravel()
        vec_col = pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float32()), dim)
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                self.id_col: ids.take(pa.array(rep)),
                "bucket": pa.array(keys.reshape(-1).astype(np.int64)),
                "vec": vec_col,
                "norm": pa.array(norm[rep]),
            }
        )


MAX_BUCKET = 1024  # per-bucket cap on the O(m^2) cosine verify; loud


def embedding_dup_pairs(
    ds, vec_col="embedding", id_col="vec_id", *, dim=64, n_planes=16,
    n_tables=1, cosine_threshold=0.95, concurrency=4,
    report: dict | None = None,
) -> pd.DataFrame:
    """Verified (id_a < id_b, cosine >= threshold) near-dup pairs.

    ``n_tables`` > 1 enables multi-table LSH (OR-amplified recall; see
    HyperplaneBucketer). The in-bucket exact-cosine verify is O(m^2) in
    bucket size, so each bucket is capped at MAX_BUCKET members (first
    by id) and the number of truncated buckets is reported via
    ``report['truncated_buckets']`` / the result's ``.attrs`` and a log
    warning — the same loud-cap contract as the MinHash/SimHash
    stages."""
    bucketed = ds.map_batches(
        HyperplaneBucketer,
        fn_constructor_kwargs=dict(
            vec_col=vec_col, id_col=id_col, dim=dim,
            n_planes=n_planes, n_tables=n_tables,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )

    empty_group = pd.DataFrame(
        {
            "id_a": pd.Series(dtype=object),
            "id_b": pd.Series(dtype=object),
            "cosine": pd.Series(dtype="float64"),
            "trunc": pd.Series(dtype="int64"),
        }
    )
    cap = MAX_BUCKET  # snapshot: closures ship to workers by value

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        trunc = int(len(g) > cap)
        g = g.head(cap)
        if len(g) < 2:
            return empty_group
        V = np.stack(g["vec"].to_numpy())
        norms = g["norm"].to_numpy()
        sims = (V @ V.T) / np.maximum(np.outer(norms, norms), 1e-12)
        ids = g[id_col].to_numpy()
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= cosine_threshold
        out = pd.DataFrame(
            {
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "cosine": sims[iu, ju][keep],
                "trunc": 0,
            }
        )
        if trunc:
            if out.empty:  # keep the truncation visible even with 0 pairs
                out = pd.DataFrame(
                    {"id_a": [None], "id_b": [None], "cosine": [np.nan], "trunc": [1]}
                )
            else:
                out.iloc[0, out.columns.get_loc("trunc")] = 1
        return out

    raw = (
        bucketed.groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if "id_a" not in raw.columns:  # empty result loses schema
        raw = empty_group.copy()
    truncated = int(raw["trunc"].sum()) if len(raw) else 0
    if report is not None:
        report["truncated_buckets"] = truncated
    if truncated:
        import logging

        logging.getLogger(__name__).warning(
            "embedding_dup_pairs: %d LSH buckets exceeded MAX_BUCKET=%d and "
            "were truncated — pair coverage is incomplete for those buckets",
            truncated,
            cap,
        )
    pairs = raw[raw["id_a"].notna()].drop(columns=["trunc"])
    out = (
        pairs.drop_duplicates(["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    out.attrs["truncated_buckets"] = truncated
    return out
