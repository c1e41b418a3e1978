"""SimHash near-dup: 64-bit signatures, banded candidate search.

Signatures are computed per batch (vectorized); candidates share at
least one of four 16-bit bands (pigeonhole: any pair within Hamming
distance 3 shares a band), found with ONE groupby shuffle on the band
value; verification checks true Hamming distance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hamming64, simhash64, stable_hash64

N_BANDS = 4  # 4 x 16 bits


def add_simhash(ds, text_col="text", id_col="doc_id"):
    """Append ``simhash`` (int64 bit-pattern) per row."""

    def sh(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern(pc.utf8_lower(text), " ")
        flat = pc.list_flatten(words)
        offsets = np.asarray(words.offsets, dtype=np.int64)
        wh = stable_hash64(flat.to_pylist())
        sig = simhash64(wh, offsets)
        return batch.append_column("simhash", pa.array(sig.view(np.int64)))

    return ds.map_batches(sh, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dedup_pairs(
    ds, text_col="text", id_col="doc_id", *, max_hamming=3
) -> pd.DataFrame:
    """Verified (id_a < id_b, hamming <= max_hamming) pairs."""
    signed = add_simhash(ds, text_col, id_col)

    def explode_bands(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch[id_col].to_pylist()
        n = len(ids)
        band_vals = np.empty((n, N_BANDS), dtype=np.int64)
        for b in range(N_BANDS):
            band_vals[:, b] = ((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(
                np.int64
            ) + (b << 20)  # disambiguate bands in one key space
        return pa.table(
            {
                id_col: pa.array(np.repeat(np.asarray(ids, object), N_BANDS).tolist()),
                "band": pa.array(band_vals.ravel(), pa.int64()),
                "simhash": pa.array(np.repeat(sig, N_BANDS).view(np.int64)),
            }
        )

    exploded = signed.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "h_a": [], "h_b": []})
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids, sigs = g[id_col].tolist(), g["simhash"].tolist()
        rows = [
            (ids[i], ids[j], sigs[i], sigs[j])
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
        ]
        return pd.DataFrame(rows, columns=["id_a", "id_b", "h_a", "h_b"])

    pairs = (
        exploded.groupby("band")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(["id_a", "id_b"])
    )
    if pairs.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    d = hamming64(
        pairs.h_a.to_numpy().astype(np.int64).view(np.uint64),
        pairs.h_b.to_numpy().astype(np.int64).view(np.uint64),
    )
    pairs = pairs.assign(hamming=d).drop(columns=["h_a", "h_b"])
    return (
        pairs[pairs.hamming <= max_hamming]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
