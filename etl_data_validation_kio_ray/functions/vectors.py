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


def _label_partial(t: pa.Table, vec_col: str, label_col: str) -> pa.Table:
    """Per-batch mergeable per-label partial: (label, n, sum of L2
    norms, per-dimension vector sum) via sort + ``reduceat`` — no
    per-row Python. Shared by grouped_embedding_stats and
    grouped_centroids."""
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


def grouped_centroids(ds, vec_col: str, label_col: str):
    """Per-label mean vector as a dense float64 matrix: returns
    (labels sorted int64 array, (L, d) centroid matrix, (L,) centroid
    L2 norms). Same partials-only exchange as grouped_embedding_stats;
    vectors never ride a shuffle whole."""
    parts = ds.map_batches(
        lambda t: _label_partial(t, vec_col, label_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    if not len(parts):
        return np.empty(0, np.int64), np.empty((0, 0)), np.empty(0)
    labels, cents = [], []
    for label, g in parts.groupby("label", sort=True):
        n = int(g["n"].sum())
        labels.append(int(label))
        cents.append(np.sum(np.stack(g["sum_vec"].to_numpy()), axis=0) / n)
    C = np.stack(cents)
    return (
        np.asarray(labels, dtype=np.int64),
        C,
        np.sqrt(np.einsum("ij,ij->i", C, C)),
    )


def embedding_outliers(
    ds,
    vec_col: str,
    label_col: str,
    *,
    id_col: str = "vec_id",
    k: int = 3,
):
    """Bottom-``k`` rows per label by cosine similarity to the label's
    OWN centroid — the embedding-space outlier screen a curation
    pipeline runs to surface mislabeled / off-distribution items.

    Two streaming passes: (1) the partials-only centroid exchange
    (grouped_centroids — at most #labels x #batches small rows move),
    (2) the centroid matrix broadcast once via ``ray.put`` and each
    batch scoring its rows vectorized (einsum dot / norms) and emitting
    only its per-label bottom-k partial, so the driver merge sees
    <= #labels x #batches x k tiny rows.

    Scores are quantized to int64 micro-units (np.round half-even,
    matching the SQL twin's round_even) BEFORE ranking, so the
    selection boundary is bit-deterministic across engines; ties break
    by ``id_col`` ASC. Raises on a zero-norm vector or centroid (cosine
    undefined) rather than emitting NaN rows.
    """
    import pandas as pd
    import ray

    labs, C, cn = grouped_centroids(ds, vec_col, label_col)
    if len(labs) and not np.all(cn > 0):
        raise ValueError("embedding_outliers: zero-norm centroid — cosine undefined")
    ref = ray.put((labs, C, cn))

    def bottomk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "label": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "cos_q6": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        labs, C, cn = ray.get(ref)
        v = batch_vectors(t, vec_col).astype(np.float64)
        lab_arr = t[label_col]
        if isinstance(lab_arr, pa.ChunkedArray):
            lab_arr = lab_arr.combine_chunks()
        lab = lab_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        row = np.searchsorted(labs, lab)
        nv = np.sqrt(np.einsum("ij,ij->i", v, v))
        if not np.all(nv > 0):
            raise ValueError(
                "embedding_outliers: zero-norm vector — cosine undefined"
            )
        cos = np.einsum("ij,ij->i", v, C[row]) / (nv * cn[row])
        q6 = np.round(cos * 1e6).astype(np.int64)
        order = np.lexsort((ids, q6, lab))
        lab_s, q_s, id_s = lab[order], q6[order], ids[order]
        starts = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
        counts = np.diff(np.r_[starts, len(lab_s)])
        take = np.concatenate(
            [np.arange(s, s + min(k, c)) for s, c in zip(starts, counts)]
        )
        return pa.table(
            {
                "label": pa.array(lab_s[take]),
                id_col: pa.array(id_s[take]),
                "cos_q6": pa.array(q_s[take]),
            }
        )

    parts = ds.map_batches(
        bottomk, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    parts = parts.sort_values(["label", "cos_q6", id_col])
    out = parts.groupby("label", sort=True).head(k).reset_index(drop=True)
    for c in ("label", id_col, "cos_q6"):
        out[c] = out[c].astype("int64")
    return out[["label", id_col, "cos_q6"]]


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

    parts = ds.map_batches(
        lambda t: _label_partial(t, vec_col, label_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
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
