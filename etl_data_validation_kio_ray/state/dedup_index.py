"""Incremental cross-run dedup index: sharded stateful fingerprint set.

The batch operators in ``dedup/`` answer "which rows of THIS dataset
duplicate each other". A continuously-fed training-data pipeline needs
the other question: "which of these NEW rows were already ingested by
ANY previous run" — shared mutable state that the Dataset API cannot
express, so this is the package's one deliberate raw-actor component
(SURVEY.md §7 / ray_guide: actors for shared mutable indexes).

Design
------
- ``FingerprintShard`` actors each own ``h % num_shards`` of the 64-bit
  content-fingerprint space as a Python ``set`` (C-speed set algebra;
  no per-row Python loop anywhere — batches move as uint64 buffers and
  the shard answers with the (typically tiny) already-seen subset,
  which the caller turns into a row mask with ``pc.is_in``).
- ``DedupIndex.filter_new`` is a streaming ``map_batches`` stage: each
  batch fingerprints its content columns (the same vectorized hash as
  ``dedup_exact`` — identical content hashes identically across runs),
  collapses within-batch repeats (first row position wins), routes the
  distinct fingerprints to their shards, and keeps only first-seen
  rows. New fingerprints are registered atomically per shard call.
- ``save``/``load`` persist each shard as a raw uint64 buffer + a JSON
  manifest, so a later run (or a restarted one) dedups against
  everything prior runs ingested.

Semantics and caveats (documented contract)
-------------------------------------------
- Fingerprints are 64-bit content hashes: two DISTINCT contents collide
  with probability ~n^2/2^64 (~3e-8 at 1e9 rows); unlike
  ``dedup_exact`` there is no exact-content confirmation, which is the
  standard trade-off for an always-on streaming index.
- ``check_and_add`` is atomic per shard call, so when two concurrent
  batches race on the same new fingerprint exactly one row survives;
  WHICH row survives depends on arrival order (counts are
  deterministic, survivor identity is not).
- Consume the returned Dataset EXACTLY ONCE (write it or count it).
  Registration happens as blocks execute, so re-executing the lazy
  plan would see its own first pass's registrations and emit nothing.
- If Ray retries a failed ``filter_new`` task, registrations from the
  failed attempt survive, so that attempt's first-seen rows are
  dropped on retry (at-most-once emission). A two-phase probe/commit
  variant would flip this to at-least-once (duplicates possible);
  dedup pipelines conventionally prefer losing one copy of a
  duplicate-prone row over re-emitting, so at-most-once is the
  default and ``mode="probe"`` exposes the read-only half for callers
  that want to commit downstream.

Scale notes: shards hold ~8-60 bytes per fingerprint (set of Python
ints); at 10^10 unique documents shard the index over ~64 actors
spread across nodes (``num_shards``) — memory per shard stays ~10 GB
and every batch touches every shard at most once. Snapshot size is
8 bytes per fingerprint.

Reference analog: the load-time natural-key dedup
(/root/reference/src/app2/dds/load_dds.py:20-32, ON CONFLICT DO
NOTHING) — re-expressed as an engine-native index because a Ray
pipeline has no database to hand the conflict check to.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..dedup.exact import CHASH, content_hash_table

MANIFEST = "index_manifest.json"


def _shard_file(path: str, i: int) -> str:
    return os.path.join(path, f"shard_{i:05d}.u64")


class FingerprintShard:
    """One actor's slice of the fingerprint space. Instantiated via
    ``ray.remote(FingerprintShard)`` by DedupIndex (kept as a plain
    class so unit tests can drive it without a Ray session)."""

    def __init__(self, snapshot: bytes | None = None):
        self._seen: set[int] = (
            set(np.frombuffer(snapshot, dtype=np.uint64).tolist())
            if snapshot
            else set()
        )

    def check_and_add(self, blob: bytes) -> bytes:
        """uint64-buffer of (within-batch-distinct) fingerprints ->
        uint64-buffer of the subset ALREADY present; the rest are
        registered. Set algebra only — no per-element Python loop."""
        s = set(np.frombuffer(blob, dtype=np.uint64).tolist())
        prev = s & self._seen
        self._seen |= s
        return np.fromiter(prev, dtype=np.uint64, count=len(prev)).tobytes()

    def check(self, blob: bytes) -> bytes:
        """Read-only membership probe (mode='probe')."""
        s = set(np.frombuffer(blob, dtype=np.uint64).tolist())
        prev = s & self._seen
        return np.fromiter(prev, dtype=np.uint64, count=len(prev)).tobytes()

    def snapshot(self) -> bytes:
        return np.fromiter(
            self._seen, dtype=np.uint64, count=len(self._seen)
        ).tobytes()

    def count(self) -> int:
        return len(self._seen)


class DedupIndex:
    """Driver-side handle over the shard actors. ``path`` (optional)
    loads a previously saved index; ``save(path)`` persists it."""

    def __init__(self, num_shards: int = 16, path: str | None = None):
        import ray

        snaps: list[bytes | None] = [None] * num_shards
        if path is not None and os.path.exists(os.path.join(path, MANIFEST)):
            with open(os.path.join(path, MANIFEST)) as f:
                man = json.load(f)
            if man["num_shards"] != num_shards:
                raise ValueError(
                    f"index at {path} has {man['num_shards']} shards, "
                    f"requested {num_shards} — shard routing is h % "
                    f"num_shards, so the counts must match"
                )
            for i in range(num_shards):
                with open(_shard_file(path, i), "rb") as f:
                    snaps[i] = f.read()
        actor = ray.remote(num_cpus=0)(FingerprintShard)
        self.num_shards = num_shards
        self.shards = [actor.remote(snaps[i]) for i in range(num_shards)]

    def filter_new(self, ds, content_cols: list[str], *, mode: str = "register"):
        """Rows of ``ds`` whose content fingerprint the index has not
        seen. mode='register' (default) also registers them;
        mode='probe' is read-only. Consume the result exactly once."""
        import ray

        if mode not in ("register", "probe"):
            raise ValueError(f"mode must be register|probe, got {mode!r}")
        shards = self.shards
        n = self.num_shards
        method = "check_and_add" if mode == "register" else "check"

        def probe(t: pa.Table) -> pa.Table:
            t = content_hash_table(t, content_cols)
            h64 = t[CHASH]
            if isinstance(h64, pa.ChunkedArray):
                h64 = h64.combine_chunks()
            h = h64.to_numpy(zero_copy_only=False).astype(np.uint64)
            # within-batch repeats: first row position wins
            uniq, first_idx = np.unique(h, return_index=True)
            keep_local = np.zeros(len(h), dtype=bool)
            keep_local[first_idx] = True
            route = uniq % np.uint64(n)
            futs, touched = [], []
            for s in range(n):
                sub = uniq[route == np.uint64(s)]
                if len(sub):
                    futs.append(getattr(shards[s], method).remote(sub.tobytes()))
                    touched.append(s)
            prev_parts = [
                np.frombuffer(b, dtype=np.uint64) for b in ray.get(futs)
            ]
            prev = (
                np.concatenate(prev_parts)
                if prev_parts
                else np.empty(0, dtype=np.uint64)
            )
            fresh = pc.invert(
                pc.is_in(h64, value_set=pa.array(prev.astype(np.int64)))
            )
            mask = pc.and_(fresh, pa.array(keep_local))
            return t.filter(mask).drop_columns([CHASH])

        # task-parallel map: every task talks to the shared shard
        # actors, so the stage scales with CPUs while membership state
        # stays consistent
        return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)

    def total_fingerprints(self) -> int:
        import ray

        return int(sum(ray.get([s.count.remote() for s in self.shards])))

    def save(self, path: str) -> None:
        """Persist every shard (atomic per file: tmp + rename) plus a
        manifest; a later DedupIndex(num_shards, path=...) resumes from
        exactly this state."""
        import ray

        os.makedirs(path, exist_ok=True)
        blobs = ray.get([s.snapshot.remote() for s in self.shards])
        for i, b in enumerate(blobs):
            tmp = _shard_file(path, i) + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(b)
            os.replace(tmp, _shard_file(path, i))
        tmp = os.path.join(path, MANIFEST) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "num_shards": self.num_shards,
                    "total_fingerprints": sum(
                        len(b) // 8 for b in blobs
                    ),
                },
                f,
            )
        os.replace(tmp, os.path.join(path, MANIFEST))
