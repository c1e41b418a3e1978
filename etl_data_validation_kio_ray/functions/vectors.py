"""Zero-copy-ish extraction of (n, dim) float32 matrices from Arrow
batches, handling both plain list<float> columns (from parquet) and
Ray's ArrowTensorArray extension columns (from in-memory ndarrays)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def batch_vectors(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if hasattr(col, "values"):  # plain ListArray / FixedSizeListArray
        flat = np.asarray(col.values.to_numpy(zero_copy_only=False), dtype=np.float32)
        dim = len(flat) // max(1, len(col))
        return flat.reshape(len(col), dim)
    # extension array (e.g. Ray ArrowTensorArray): to_numpy gives (n, dim)
    arr = col.to_numpy(zero_copy_only=False)
    return np.asarray(np.stack(list(arr)) if arr.dtype == object else arr, dtype=np.float32)


def grouped_embedding_stats(ds, vec_col: str, label_col: str):
    """Per-label embedding statistics: count, mean L2 norm, and norm of
    the centroid (mean vector) — the embedding-column profiling step a
    training-data pipeline runs before ANN / clustering.

    Scale shape: each batch collapses to one mergeable partial per
    label — (n, sum of norms, per-dimension vector sum) via sort +
    ``reduceat``, no per-row Python — so the exchange carries
    #labels x #batches rows of d+2 doubles; the final merge is a tiny
    driver-side reduce (same contract as the sketch partials). Norms
    accumulate in float64 regardless of storage dtype.

    Returns a pandas DataFrame (label, n, avg_norm, centroid_norm)
    sorted by label.
    """
    import pandas as pd
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum_norm": pa.array([], pa.float64()),
                    "sum_vec": pa.array([], pa.list_(pa.float64())),
                }
            )
        v = batch_vectors(t, vec_col).astype(np.float64)
        lab = t[label_col]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        labels = lab.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(labels, kind="stable")
        labels, v = labels[order], v[order]
        starts = np.flatnonzero(np.r_[True, labels[1:] != labels[:-1]])
        norms = np.sqrt(np.einsum("ij,ij->i", v, v))
        return pa.table(
            {
                "label": pa.array(labels[starts]),
                "n": pa.array(np.diff(np.r_[starts, len(labels)]).astype(np.int64)),
                "sum_norm": pa.array(np.add.reduceat(norms, starts)),
                "sum_vec": pa.array(list(np.add.reduceat(v, starts, axis=0))),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if not len(parts):
        return pd.DataFrame(columns=["label", "n", "avg_norm", "centroid_norm"])
    out = []
    for label, g in parts.groupby("label", sort=True):
        n = int(g["n"].sum())
        cent = np.sum(np.stack(g["sum_vec"].to_numpy()), axis=0) / n
        out.append(
            {
                "label": int(label),
                "n": n,
                "avg_norm": float(g["sum_norm"].sum() / n),
                "centroid_norm": float(np.sqrt(cent @ cent)),
            }
        )
    return pd.DataFrame(out)
