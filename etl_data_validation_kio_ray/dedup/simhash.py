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

from ..functions.hashing import hamming64, hash_string_array, simhash64

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
        # char-buffer word hashing (functions/hashing.py) — no Python
        # object materialization per word
        wh = hash_string_array(flat)
        sig = simhash64(wh, offsets)
        return batch.append_column("simhash", pa.array(sig.view(np.int64)))

    return ds.map_batches(sh, batch_format="pyarrow", zero_copy_batch=True)


MAX_BUCKET = 200  # per-band-bucket candidate cap: truncation is LOUD


def simhash_dedup_pairs(
    ds, text_col="text", id_col="doc_id", *, max_hamming=3,
    report: dict | None = None,
) -> pd.DataFrame:
    """Verified (id_a < id_b, hamming <= max_hamming) pairs.

    Pair enumeration stays ON THE REDUCERS (one per band bucket) and is
    bounded: each bucket keeps its first MAX_BUCKET distinct ids (the
    16-bit band key is low-cardinality, so buckets grow linearly with
    corpus size — unbounded enumeration would be quadratic), pairs come
    from one vectorized ``np.triu_indices`` expansion, and the number
    of truncated buckets is summed into ``report['truncated_buckets']``
    / the result's ``.attrs`` and logged — a loud coverage cap, never a
    silent one."""
    signed = add_simhash(ds, text_col, id_col)
    cap = MAX_BUCKET  # snapshot: closures ship to workers by value

    def explode_bands(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = len(ids)
        band_vals = np.empty((n, N_BANDS), dtype=np.int64)
        for b in range(N_BANDS):
            band_vals[:, b] = ((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(
                np.int64
            ) + (b << 20)  # disambiguate bands in one key space
        take_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), N_BANDS))
        return pa.table(
            {
                id_col: ids.take(take_idx),
                "band": pa.array(band_vals.ravel(), pa.int64()),
                "simhash": pa.array(np.repeat(sig, N_BANDS).view(np.int64)),
            }
        )

    exploded = signed.map_batches(explode_bands, batch_format="pyarrow")

    empty_group = pd.DataFrame(
        {
            "id_a": pd.Series(dtype=object),
            "id_b": pd.Series(dtype=object),
            "h_a": pd.Series(dtype="int64"),
            "h_b": pd.Series(dtype="int64"),
            "trunc": pd.Series(dtype="int64"),
        }
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        trunc = int(len(g) > cap)
        g = g.head(cap)
        m = len(g)
        if m < 2:
            return empty_group
        iu, ju = np.triu_indices(m, k=1)
        ids = g[id_col].to_numpy()
        sigs = g["simhash"].to_numpy()
        out = pd.DataFrame(
            {
                "id_a": ids[iu],
                "id_b": ids[ju],
                "h_a": sigs[iu],
                "h_b": sigs[ju],
                "trunc": 0,
            }
        )
        # one flag per truncated BUCKET, summed driver-side before the
        # cross-bucket pair dedup
        out.iloc[0, out.columns.get_loc("trunc")] = trunc
        return out

    raw = (
        exploded.groupby("band")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    truncated = int(raw["trunc"].sum()) if len(raw) else 0
    if report is not None:
        report["truncated_buckets"] = truncated
    if truncated:
        import logging

        logging.getLogger(__name__).warning(
            "simhash_dedup_pairs: %d band buckets exceeded MAX_BUCKET=%d and "
            "were truncated — pair coverage is incomplete for those buckets",
            truncated,
            cap,
        )
    pairs = raw.drop(columns=["trunc"]).drop_duplicates(["id_a", "id_b"])
    if pairs.empty:
        out = pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        out.attrs["truncated_buckets"] = truncated
        return out
    d = hamming64(
        pairs.h_a.to_numpy().astype(np.int64).view(np.uint64),
        pairs.h_b.to_numpy().astype(np.int64).view(np.uint64),
    )
    pairs = pairs.assign(hamming=d).drop(columns=["h_a", "h_b"])
    out = (
        pairs[pairs.hamming <= max_hamming]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    out.attrs["truncated_buckets"] = truncated
    return out
