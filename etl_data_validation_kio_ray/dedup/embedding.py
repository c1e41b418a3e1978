"""Embedding-cosine near-duplicate detection.

Scale shape: multi-table random-hyperplane LSH (seeded, deterministic)
emits NARROW (id, bucket) rows; multi-member buckets come from the
map-side-bucketed int64 dup scan (one low-cardinality shuffle of 12
bytes/row), candidate members gather to the driver (capped loudly),
and only candidate VECTORS are fetched for exact float64 cosine
verification — vectors never ride a shuffle. The hyperplane matrix is
built once per actor from the fixed seed (no broadcast needed — it's
derived state, the actor-pool analog of the reference's module-level
compiled validators)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


from ..functions.vectors import batch_vectors as _vectors


class HyperplaneBucketer:
    """Multi-table random-hyperplane LSH: ``n_tables`` independent
    hyperplane sets (all derived from the fixed seed). A pair is a
    candidate if it shares a bucket in ANY table — recall for pairs at
    cosine c is 1-(1-p^b)^T with p = 1 - arccos(c)/pi, so tables are
    the recall lever while planes-per-table bounds bucket size.

    Emits ONLY narrow (id, bucket) rows (table id folded into the
    bucket key) — vectors never travel with the bucket exchange; the
    pair stage gathers candidate vectors separately (the
    candidate-scan-then-gather layout of dedup/minhash.py)."""

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
        if batch.num_rows == 0:  # empty block: keep the schema stable
            return pa.table(
                {
                    self.id_col: batch[self.id_col],
                    "bucket": pa.array([], pa.int64()),
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
        T = self.n_tables
        rep = np.repeat(np.arange(n, dtype=np.int64), T)
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                self.id_col: ids.take(pa.array(rep)),
                "bucket": pa.array(keys.reshape(-1).astype(np.int64)),
            }
        )


MAX_BUCKET = 1024  # per-bucket candidate cap; truncation is LOUD
MAX_CANDIDATE_ROWS = 2_000_000  # driver-side gather cap (loud, not silent)


def embedding_dup_pairs(
    ds, vec_col="embedding", id_col="vec_id", *, dim=64, n_planes=16,
    n_tables=1, cosine_threshold=0.95, concurrency=4,
    report: dict | None = None,
) -> pd.DataFrame:
    """Verified (id_a < id_b, cosine >= threshold) near-dup pairs.

    ``n_tables`` > 1 enables multi-table LSH (OR-amplified recall; see
    HyperplaneBucketer). Fully distributed candidate scan, same layout
    as dedup/minhash.py — vectors NEVER travel with a shuffle:

      pass A: narrow (id, bucket) rows -> splitmix-mixed int64 key ->
              map-side bucketed dup scan
              (stages/uniqueness.dup_int64_column) -> the (tiny)
              multi-member bucket keys.
      pass B: narrow rows recomputed lazily, filtered by a broadcast
              probe; candidate bucket MEMBERS gather to the driver
              (capped loudly at MAX_CANDIDATE_ROWS); pairs enumerate
              via the shared bucket_pairs_vectorized with the
              per-bucket MAX_BUCKET cap and truncated_buckets
              reporting (report dict / .attrs / log warning).
      verify: ONLY candidate vectors gather (broadcast id probe);
              exact cosine computed in float64."""
    import logging

    import ray

    from ..functions.hashing import _splitmix64
    from ..stages.uniqueness import dup_int64_column
    from .minhash import bucket_pairs_vectorized

    empty = pd.DataFrame(
        {
            "id_a": pd.Series(dtype=object),
            "id_b": pd.Series(dtype=object),
            "cosine": pd.Series(dtype="float64"),
        }
    )
    if report is None:
        report = {}
    report.setdefault("truncated_buckets", 0)

    def bucketed():
        return ds.map_batches(
            HyperplaneBucketer,
            fn_constructor_kwargs=dict(
                vec_col=vec_col, id_col=id_col, dim=dim,
                n_planes=n_planes, n_tables=n_tables,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )

    def mixed_key(t: pa.Table) -> pa.Array:
        b = t["bucket"].to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.array(_splitmix64(b.copy()).view(np.int64))

    cand_keys = dup_int64_column(
        bucketed().map_batches(
            lambda t: pa.table({"h": mixed_key(t)}), batch_format="pyarrow"
        ),
        "h",
    )
    out = empty.copy()
    out.attrs["truncated_buckets"] = 0
    if cand_keys.num_rows == 0:
        return out

    keys_ref = ray.put(cand_keys["h"].combine_chunks())

    def keep_cand(t: pa.Table) -> pa.Table:
        key = mixed_key(t)
        mask = pc.is_in(key, value_set=ray.get(keys_ref))
        return pa.table({"bk": key, id_col: t[id_col]}).filter(mask)

    gathered = bucketed().map_batches(keep_cand, batch_format="pyarrow").to_pandas()
    if len(gathered) > MAX_CANDIDATE_ROWS:
        raise RuntimeError(
            f"{len(gathered)} candidate bucket rows exceeds driver gather cap "
            f"{MAX_CANDIDATE_ROWS}; reduce n_tables or raise n_planes"
        )
    pairs, truncated = bucket_pairs_vectorized(
        gathered["bk"].to_numpy(), gathered[id_col].to_numpy(),
        max_bucket=MAX_BUCKET,
    )
    report["truncated_buckets"] = truncated
    if truncated:
        logging.getLogger(__name__).warning(
            "embedding_dup_pairs: %d LSH buckets exceeded MAX_BUCKET=%d and "
            "were truncated — pair coverage is incomplete for those buckets",
            truncated,
            MAX_BUCKET,
        )
    out.attrs["truncated_buckets"] = truncated
    if pairs.empty:
        return out

    # exact cosine verification on candidate vectors only
    cand_ids = pd.unique(pd.concat([pairs.id_a, pairs.id_b], ignore_index=True))
    ids_ref = ray.put(pa.array(list(cand_ids)))

    def keep_vecs(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=ray.get(ids_ref))
        return t.select([id_col, vec_col]).filter(mask)

    sub = ds.map_batches(keep_vecs, batch_format="pyarrow").to_pandas()
    vecs = {
        i: np.asarray(v, dtype=np.float64)
        for i, v in zip(sub[id_col], sub[vec_col])
    }
    cos = []
    for a, b in zip(pairs.id_a, pairs.id_b):  # bounded: capped candidates
        va, vb = vecs.get(a), vecs.get(b)
        if va is None or vb is None:
            cos.append(float("nan"))
            continue
        denom = np.linalg.norm(va) * np.linalg.norm(vb)
        cos.append(float(va @ vb) / denom if denom > 0 else 0.0)
    pairs = pairs.assign(cosine=cos)
    out = (
        pairs[pairs.cosine >= cosine_threshold]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    out.attrs["truncated_buckets"] = truncated
    return out
