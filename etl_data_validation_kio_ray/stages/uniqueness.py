"""Global doc_id uniqueness — the one genuinely wide (shuffled) rule.

Analog of the reference's duplicate detection: GROUP BY id HAVING
COUNT(*) > 1 (/root/reference/src/app2/etl_validation/specs.py:110-143
at E, :148-169 at T) and the in-payload ``_find_duplicates``
(/root/reference/src/app2/validators/stg/uniqueness_suite/areas_uniqueness.py:32-39).

Scale design (SURVEY.md §7.3):

  1. The shuffle moves ONLY an 8-byte hash per row: the key scan
     (`read_parquet(columns=[id_col])`, heavy ``tokens`` column pruned
     at the read) is mapped to ``hash64(doc_id)`` and the
     ``groupby(h).count()`` shuffle exchanges int64s — at 10^12 rows
     that is the difference between shuffling ~8 TB and shuffling the
     full multi-hundred-TB id strings. High-cardinality uniform key,
     no salting needed.
  2. Candidate hashes with count>1 are a SMALL set (true duplicates +
     ~n²/2⁶⁴ expected 64-bit collisions). They are collected to the
     driver and broadcast.
  3. An EXACT confirm pass re-scans the keys with a vectorized
     ``is_in`` probe on the candidate hashes and counts the *actual*
     id strings of the hits — hash collisions are filtered here, so
     the result is exact, never probabilistic.

Producing violation rows is a final broadcast probe
(`duplicate_violations`) emitting one row per offending input row with
its real partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hll import hash64

MAX_DUP_KEYS_COLLECTED = 5_000_000  # driver-side safety valve


def blob_hashes(binary_arr) -> np.ndarray:
    """Concatenated int64 view over a binary column of hash blobs —
    ZERO-COPY: the Arrow data buffer of a dense binary array is exactly
    the blobs back-to-back, so no per-blob frombuffer+concatenate."""
    if isinstance(binary_arr, pa.ChunkedArray):
        binary_arr = binary_arr.combine_chunks()
    arr = binary_arr.drop_null()
    if len(arr) == 0:
        return np.empty(0, dtype=np.int64)
    offs_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    offs = np.frombuffer(offs_buf, dtype=np.int32)
    start = int(offs[arr.offset])
    end = int(offs[arr.offset + len(arr)])
    return np.frombuffer(data_buf, dtype=np.uint8)[start:end].view(np.int64)


def writable_blob_hashes(binary_arr) -> tuple[np.ndarray, object]:
    """Like :func:`blob_hashes` but the returned int64 array is
    WRITABLE — zero-copy into the column's own Arrow buffer when that
    buffer is mutable (freshly read / filtered, exclusively owned) and
    8-aligned, else a fresh copy.

    Returns ``(array, keepalive)``: the caller MUST hold ``keepalive``
    (the Arrow array backing a zero-copy view) for as long as the numpy
    array is used — the ctypes view does not itself reference the
    buffer. Mutating the view mutates the column; only use this on
    tables the caller owns exclusively and discards afterwards (the
    driver-side candidate scan over freshly-read kind=hash rows)."""
    if isinstance(binary_arr, pa.ChunkedArray):
        binary_arr = binary_arr.combine_chunks()
    arr = binary_arr.drop_null()
    if len(arr) == 0:
        return np.empty(0, dtype=np.int64), None
    offs_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    offs = np.frombuffer(offs_buf, dtype=np.int32)
    start = int(offs[arr.offset])
    end = int(offs[arr.offset + len(arr)])
    n = (end - start) // 8
    if data_buf.is_mutable and (data_buf.address + start) % 8 == 0:
        import ctypes

        view = np.ctypeslib.as_array(
            (ctypes.c_int64 * n).from_address(data_buf.address + start)
        )
        return view, arr
    return (
        np.frombuffer(data_buf, dtype=np.uint8)[start:end].view(np.int64).copy(),
        None,
    )


def dup_values(h: np.ndarray, *, sort_inplace: bool = False) -> np.ndarray:
    """Distinct values occurring more than once. sort+diff, not
    np.unique(return_counts): the sort-only path is dramatically faster
    (np.unique's extra passes dominate on large arrays) and duplicates
    are assumed rare, so the second-level dedupe input is tiny.

    ``sort_inplace=True`` sorts ``h``'s own memory (caller must own it
    exclusively): ``np.sort`` otherwise allocates a fresh copy whose
    first-touch page faults cost ~4x the sort itself on fragmented
    hosts (measured: 1.3 s fresh-alloc vs 0.26 s in-place over 16M
    int64) — this is the driver-tail path of every validation run."""
    if len(h) < 2:
        return np.empty(0, dtype=h.dtype if len(h) else np.int64)
    if sort_inplace and h.flags.writeable:
        h.sort()
        s = h
    else:
        s = np.sort(h)
    cand = s[1:][s[1:] == s[:-1]]
    if len(cand) == 0:
        return cand.copy()  # never alias the (possibly huge) sort buffer
    return np.unique(cand)  # tiny


def _collect(ds, schema: pa.Schema) -> pa.Table:
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=2**20)
    ]
    tables = [t.select(schema.names) for t in tables if t.num_rows]
    return pa.concat_tables(tables) if tables else schema.empty_table()


def _id_hashes(t: pa.Table, id_col: str) -> np.ndarray:
    ids = t[id_col].combine_chunks().drop_null()
    if len(ids) == 0:
        return np.empty(0, dtype=np.int64)
    return hash64(ids.to_numpy(zero_copy_only=False)).view(np.int64)


def dup_int64_column(ds, col: str = "h", *, num_buckets: int = 256) -> pa.Table:
    """Distinct int64 values of ``col`` occurring more than once
    GLOBALLY -> small pyarrow.Table ("h": int64).

    The generic distributed duplicate scan: every value lands in bucket
    ``value % num_buckets`` (map-side projection, 12 bytes/row through
    the exchange), the low-cardinality ``groupby('b')`` shuffle brings
    each bucket to one reducer, and one sort-based ``dup_values`` pass
    per bucket sees every occurrence. Callers feed PRE-MIXED hashes
    (splitmix64-style) so the modulo is uniform. Used by exact-dedup
    content hashes and the MinHash/SimHash LSH bucket-key scans."""
    nb = np.int64(num_buckets)

    def project(t: pa.Table) -> pa.Table:
        h = t[col].to_numpy(zero_copy_only=False)
        return pa.table(
            {"h": t[col], "b": pa.array((h % nb).astype(np.int32))}
        )

    def bucket_dups(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(dup_values(h), pa.int64())})

    return _collect(
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("b")
        .map_groups(bucket_dups, batch_format="pyarrow"),
        pa.schema([("h", pa.int64())]),
    )


def candidate_hashes_from_blobs(hash_ds, *, num_buckets: int = 256) -> pa.Table:
    """Dataset[(partition, payload: binary uint64-hash blob)] -> small
    pyarrow.Table ("h": int64) of hashes occurring more than once
    globally. All rows of a hash land in one ``h % num_buckets`` bucket,
    so one ``np.unique`` per bucket sees every occurrence.

    Map-side partitioning: each input blob is split into per-bucket
    sub-blobs BEFORE the exchange, so the ``groupby('b')`` shuffle sorts
    only (#blobs x num_buckets) binary rows — never one row per id.
    This is the classic shuffle-write layout expressed in Ray Data ops.
    """
    nb = np.int64(num_buckets)

    def partition_blobs(t: pa.Table) -> pa.Table:
        out_b: list[int] = []
        out_p: list[bytes] = []
        for blob in t["payload"].to_pylist():
            if not blob:
                continue
            h = np.frombuffer(blob, dtype=np.int64)
            b = (h % nb).astype(np.int32)
            order = np.argsort(b, kind="stable")
            hs, bs = h[order], b[order]
            cuts = np.flatnonzero(np.diff(bs)) + 1
            starts = np.concatenate(([0], cuts))
            ends = np.concatenate((cuts, [len(bs)]))
            for s, e in zip(starts, ends):
                out_b.append(int(bs[s]))
                out_p.append(hs[s:e].tobytes())
        return pa.table(
            {
                "b": pa.array(out_b, pa.int32()),
                "payload": pa.array(out_p, pa.binary()),
            }
        )

    def bucket_dups(g: pa.Table) -> pa.Table:
        h = blob_hashes(g["payload"])
        return pa.table({"h": pa.array(dup_values(h), pa.int64())})

    return _collect(
        hash_ds.map_batches(partition_blobs, batch_format="pyarrow")
        .groupby("b")
        .map_groups(bucket_dups, batch_format="pyarrow"),
        pa.schema([("h", pa.int64())]),
    )


def confirm_duplicates(keys_ds, cand: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Exact (id_col, dup_count) table for candidate hashes: re-scan the
    id column, keep rows whose hash is a candidate (collisions included),
    count the actual id strings. Empty candidates -> empty table."""
    import ray

    empty = pa.table(
        {id_col: pa.array([], pa.string()), "dup_count": pa.array([], pa.int64())}
    )
    if cand.num_rows == 0:
        return empty
    if cand.num_rows > MAX_DUP_KEYS_COLLECTED:
        raise RuntimeError(
            f"{cand.num_rows} candidate duplicate keys exceeds driver collect "
            f"cap {MAX_DUP_KEYS_COLLECTED}; input looks pathologically duplicated"
        )
    cand_ref = ray.put(cand["h"].combine_chunks())

    def probe(t: pa.Table) -> pa.Table:
        h = _id_hashes(t, id_col)
        ids = t[id_col].combine_chunks().drop_null()
        mask = pc.is_in(pa.array(h, pa.int64()), value_set=ray.get(cand_ref))
        return pa.table({id_col: ids.filter(mask)})

    hits = _collect(
        keys_ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([(id_col, pa.string())]),
    )
    if hits.num_rows == 0:
        return empty
    counts = pc.value_counts(hits[id_col].combine_chunks())
    vals, cnts = counts.field("values"), counts.field("counts")
    dup_mask = pc.greater(cnts, 1)
    out = pa.table(
        {
            id_col: vals.filter(dup_mask),
            "dup_count": pc.cast(cnts.filter(dup_mask), pa.int64()),
        }
    )
    order = pc.sort_indices(out, sort_keys=[(id_col, "ascending")])
    return out.take(order)


def duplicate_id_counts(
    keys_ds, id_col: str = "doc_id", *, num_buckets: int | None = None
) -> pa.Table:
    """Dataset[(id_col, ...)] -> pyarrow.Table (id_col, dup_count) of ids
    seen more than once. Exact (collision-checked); the shuffle carries
    only int64 hashes.

    The candidate scan buckets hashes by ``h % num_buckets`` and finds
    within-bucket repeats via one ``np.unique`` per bucket — a
    low-cardinality sort shuffle that avoids materializing a
    per-distinct-key aggregate (2M+ groups) through the object store.
    ``num_buckets`` bounds reducer memory: bucket size ≈ rows × 8B /
    num_buckets, so size it to rows/~30M per bucket at large scale
    (default: 4× input blocks, floor 64).
    """
    if num_buckets is None:
        try:
            num_buckets = max(64, keys_ds.num_blocks() * 4)
        except Exception:  # noqa: BLE001 — unbacked plans have no block count
            num_buckets = 256
    nb = np.int64(num_buckets)

    def to_bucketed_hash(t: pa.Table) -> pa.Table:
        h = _id_hashes(t, id_col)
        return pa.table(
            {
                "h": pa.array(h, pa.int64()),
                "b": pa.array((h % nb).astype(np.int32)),
            }
        )

    def bucket_dups(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(dup_values(h), pa.int64())})

    cand = _collect(
        keys_ds.map_batches(
            to_bucketed_hash, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("b")
        .map_groups(bucket_dups, batch_format="pyarrow"),
        pa.schema([("h", pa.int64())]),
    )
    return confirm_duplicates(keys_ds, cand, id_col)


def duplicate_violations(
    keys_ds,
    dup_table: pa.Table,
    id_col: str = "doc_id",
    partition_col: str | None = "partition",
):
    """Emit (rule_id, doc_id, partition, reason) for every row whose id
    is duplicated. ``dup_table`` is broadcast (ray.put) once and probed
    per batch with a vectorized semi-join."""
    import ray

    dup_ref = ray.put(dup_table)

    def probe(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        ids = batch[id_col].combine_chunks()
        mask = pc.is_in(ids, value_set=dup[id_col])
        hit = batch.filter(mask)
        n = hit.num_rows
        if n == 0:
            return pa.table(
                {
                    "rule_id": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.string()),
                    "partition": pa.array([], pa.string()),
                    "reason": pa.array([], pa.string()),
                }
            )
        # map each hit id -> its dup_count for the reason string
        idx = pc.index_in(hit[id_col].combine_chunks(), value_set=dup[id_col])
        cnt = dup["dup_count"].take(idx).to_pylist()
        parts = (
            hit[partition_col].to_pylist()
            if partition_col and partition_col in hit.column_names
            else ["all"] * n
        )
        return pa.table(
            {
                "rule_id": pa.array(["doc_id_unique"] * n, pa.string()),
                "doc_id": hit[id_col],
                "partition": pa.array(parts, pa.string()),
                "reason": pa.array(
                    [f"doc_id appears {int(c)} times" for c in cnt], pa.string()
                ),
            }
        )

    return keys_ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
