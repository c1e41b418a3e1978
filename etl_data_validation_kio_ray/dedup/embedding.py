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
    def __init__(self, vec_col="embedding", id_col="vec_id", *, dim=64, n_planes=16, seed=11):
        rng = np.random.Generator(np.random.Philox(key=[seed, 0xA11CE]))
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _vectors(batch, self.vec_col)
        proj = v @ self.planes
        bits = (proj > 0).astype(np.uint64)
        key = np.zeros(len(v), dtype=np.uint64)
        for b in range(bits.shape[1]):  # n_planes-bounded
            key |= bits[:, b] << np.uint64(b)
        norm = np.linalg.norm(v, axis=1)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "bucket": pa.array(key.astype(np.int64)),
                "vec": pa.array(list(v.astype(np.float32))),
                "norm": pa.array(norm.astype(np.float64)),
            }
        )


def embedding_dup_pairs(
    ds, vec_col="embedding", id_col="vec_id", *, dim=64, n_planes=16,
    cosine_threshold=0.95, concurrency=4,
) -> pd.DataFrame:
    """Verified (id_a < id_b, cosine >= threshold) near-dup pairs."""
    bucketed = ds.map_batches(
        HyperplaneBucketer,
        fn_constructor_kwargs=dict(vec_col=vec_col, id_col=id_col, dim=dim, n_planes=n_planes),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values(id_col)
        V = np.stack(g["vec"].to_numpy())
        norms = g["norm"].to_numpy()
        sims = (V @ V.T) / np.maximum(np.outer(norms, norms), 1e-12)
        ids = g[id_col].tolist()
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= cosine_threshold
        return pd.DataFrame(
            {
                "id_a": [ids[i] for i in iu[keep]],
                "id_b": [ids[j] for j in ju[keep]],
                "cosine": sims[iu, ju][keep],
            }
        )

    pairs = (
        bucketed.groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if "id_a" not in pairs.columns:  # empty result loses schema
        return pd.DataFrame(
            {
                "id_a": pd.Series(dtype=object),
                "id_b": pd.Series(dtype=object),
                "cosine": pd.Series(dtype="float64"),
            }
        )
    return (
        pairs.drop_duplicates(["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
