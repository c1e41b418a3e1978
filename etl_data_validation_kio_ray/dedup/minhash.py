"""Near-duplicate detection: MinHash + LSH banding.

Scale shape (ray_guide "Near-dup"): shingle+minhash per batch (narrow,
vectorized) -> explode to (band_id, band_key, doc_id) rows -> ONE
groupby shuffle on the band key -> per-bucket candidate pairs ->
verify exact shingle Jaccard -> verified pairs. The verify step
re-hashes only candidate docs (a tiny fraction), broadcast-gathered;
the partitioning assumption is that LSH buckets are small (docs per
(band, key) bucket bounded — enforced with a cap that flags
pathological buckets instead of exploding quadratically)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import band_keys, minhash_signatures, stable_hash64

MAX_BUCKET = 200  # pairs per bucket cap: |bucket| above this is flagged, not exploded


def _shingle_hashes(text: pa.Array, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Hashed word-k-gram shingles per row (flat, offsets). Word hashes
    are combined arithmetically across the k-window — no string
    concatenation, fully vectorized."""
    words = pc.split_pattern(pc.utf8_lower(text), " ")
    flat_words = pc.list_flatten(words)
    offsets = np.asarray(words.offsets, dtype=np.int64)
    wh = stable_hash64(flat_words.to_pylist())
    lens = np.diff(offsets)
    sh_lens = np.maximum(lens - k + 1, 0)
    # shingle i of a row combines word hashes i..i+k-1
    C = np.uint64(0x9E3779B97F4A7C15)
    n_flat = len(wh)
    if n_flat == 0 or sh_lens.sum() == 0:
        return np.empty(0, np.uint64), np.concatenate([[0], np.cumsum(sh_lens)])
    acc = np.zeros(n_flat, dtype=np.uint64)
    for j in range(k):  # k-bounded loop
        shifted = np.empty(n_flat, dtype=np.uint64)
        shifted[: n_flat - j] = wh[j:]
        shifted[n_flat - j :] = 0
        acc = (acc * C) ^ shifted
    # valid shingle start positions: within-row index <= len-k
    row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    pos_in_row = np.arange(n_flat, dtype=np.int64) - offsets[row_of]
    valid = pos_in_row < (lens[row_of] - k + 1)
    sh_offsets = np.concatenate([[0], np.cumsum(sh_lens)]).astype(np.int64)
    return acc[valid], sh_offsets


class MinHasher:
    """Actor-pool stage: permutation params computed once per actor."""

    def __init__(self, text_col="text", id_col="doc_id", *, num_perm=128, bands=32, k=3, seed=1):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k, self.seed = num_perm, bands, k, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, offsets = _shingle_hashes(text, self.k)
        sig = minhash_signatures(flat, offsets, num_perm=self.num_perm, seed=self.seed)
        bk = band_keys(sig, bands=self.bands)
        n = len(text)
        ids = batch[self.id_col].to_pylist()
        return pa.table(
            {
                self.id_col: pa.array(np.repeat(np.asarray(ids, object), self.bands).tolist()),
                "band_id": pa.array(np.tile(np.arange(self.bands), n), pa.int32()),
                "band_key": pa.array(bk.ravel(), pa.int64()),
            }
        )


def add_minhash_bands(ds, text_col="text", id_col="doc_id", *, num_perm=128, bands=32, k=3, concurrency=None):
    """Dataset -> exploded (id, band_id, band_key) rows.

    Task-based ``map_batches`` with a plain picklable MinHasher
    instance: its state is a few ints (permutation params derive
    deterministically from the seed inside the vectorized kernels), so
    there is nothing worth an actor pool's startup cost — and the
    task form lets Ray fuse the read with the hashing. ``concurrency``
    (optional) switches back to an actor pool."""
    hasher_kwargs = dict(
        text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, k=k
    )
    if concurrency:
        return ds.map_batches(
            MinHasher,
            fn_constructor_kwargs=hasher_kwargs,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    return ds.map_batches(
        MinHasher(**hasher_kwargs), batch_format="pyarrow", zero_copy_batch=True
    )


def minhash_dedup_pairs(
    ds,
    text_col="text",
    id_col="doc_id",
    *,
    num_perm=128,
    bands=32,
    k=3,
    jaccard_threshold=0.8,
    concurrency=4,
) -> pd.DataFrame:
    """Verified near-dup pairs (id_a < id_b, jaccard >= threshold).

    Final verification recomputes exact shingle Jaccard for candidate
    docs (gathered to the driver — candidates are assumed a small
    fraction; buckets above MAX_BUCKET are truncated and reported)."""
    banded = add_minhash_bands(
        ds, text_col, id_col, num_perm=num_perm, bands=bands, k=k, concurrency=concurrency
    )

    # Candidate buckets: almost every (band_id, band_key) bucket is a
    # singleton, so DON'T run a per-group callable over all of them —
    # find buckets with >1 row via the sort-based duplicate scan on a
    # combined 64-bit bucket key (8 bytes/row), then gather only rows
    # of those buckets (a tiny fraction) and form pairs.
    from ..stages.uniqueness import dup_values

    banded = banded.materialize()  # scanned twice; rows = docs x bands, narrow

    def to_bucket_key(t: pa.Table) -> pa.Table:
        bid = t["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        return pa.table({"bk": pa.array(bk * np.int64(1000003) + bid, pa.int64())})


    chunks = [
        (b if isinstance(b, pa.Table) else pa.Table.from_batches([b]))["bk"]
        .to_numpy(zero_copy_only=False)
        for b in banded.map_batches(to_bucket_key, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=2**20
        )
    ]
    all_bk = np.concatenate(chunks) if chunks else np.empty(0, np.int64)
    dup_bk = dup_values(all_bk)
    if len(dup_bk) == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})

    import ray

    dup_ref = ray.put(pa.array(dup_bk, pa.int64()))

    def keep_cand(t: pa.Table) -> pa.Table:
        bid = t["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        key = pa.array(bk * np.int64(1000003) + bid, pa.int64())
        return t.append_column("bk", key).filter(
            pc.is_in(key, value_set=ray.get(dup_ref))
        )

    cand = (
        banded.map_batches(keep_cand, batch_format="pyarrow")
        .to_pandas()
        .sort_values([id_col])
    )
    rows = []
    for _, g in cand.groupby("bk", sort=False):
        ids = sorted(g[id_col].unique())[:MAX_BUCKET]
        rows.extend((a, b) for i, a in enumerate(ids) for b in ids[i + 1 :])
    pairs = pd.DataFrame(rows, columns=["id_a", "id_b"]).drop_duplicates()
    if pairs.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})

    # exact verification on the candidate docs only
    cand_ids = set(pairs.id_a) | set(pairs.id_b)
    sub = ds.map_batches(
        lambda t: t.filter(
            pc.is_in(t[id_col], value_set=pa.array(list(cand_ids)))
        ).select([id_col, text_col]),
        batch_format="pyarrow",
    ).to_pandas()
    shingle_sets: dict = {}
    for _, r in sub.iterrows():
        ws = str(r[text_col]).lower().split(" ")
        shingle_sets[r[id_col]] = {tuple(ws[i : i + k]) for i in range(len(ws) - k + 1)}
    jac = []
    for _, r in pairs.iterrows():
        sa, sb = shingle_sets.get(r.id_a, set()), shingle_sets.get(r.id_b, set())
        u = len(sa | sb)
        jac.append(len(sa & sb) / u if u else 0.0)
    pairs = pairs.assign(jaccard=jac)
    return (
        pairs[pairs.jaccard >= jaccard_threshold]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
