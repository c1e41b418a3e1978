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
