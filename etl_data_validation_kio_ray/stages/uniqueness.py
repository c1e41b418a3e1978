"""Global doc_id uniqueness — the one genuinely wide (shuffled) rule.

Analog of the reference's duplicate detection: GROUP BY id HAVING
COUNT(*) > 1 (/root/reference/src/app2/etl_validation/specs.py:110-143
at E, :148-169 at T) and the in-payload ``_find_duplicates``
(/root/reference/src/app2/validators/stg/uniqueness_suite/areas_uniqueness.py:32-39).

Scale design (SURVEY.md §7.3): the shuffle moves ONLY the key columns
(`read_parquet(columns=[id_col, partition_col])` upstream prunes the
heavy ``tokens`` column at the read), keyed on high-cardinality doc_id
— uniform hash partitioning, no salting needed. Producing violation
rows is two phases so the big side is never re-shuffled:

  1. ``groupby(id).count()`` -> filter count>1 -> SMALL dup-key table
     (duplicates are rare by construction; a dataset that is mostly
     duplicates would fail loudly at the driver collect).
  2. broadcast the dup-key set and re-scan the key columns with a
     vectorized ``is_in`` probe to emit one violation row per
     offending row, with its real partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_DUP_KEYS_COLLECTED = 5_000_000  # driver-side safety valve


def duplicate_id_counts(keys_ds, id_col: str = "doc_id"):
    """Dataset[(id_col, ...)] -> pyarrow.Table (id_col, dup_count) of ids
    seen more than once. Hash-partitioned shuffle on the id column."""
    # null ids are the schema rule's finding; Ray's sort-based groupby
    # cannot compare None with str, so drop them before the shuffle
    keys_ds = keys_ds.map_batches(
        lambda t: t.filter(pc.is_valid(t[id_col])), batch_format="pyarrow"
    )
    counted = keys_ds.groupby(id_col).count()

    def keep_dups(t: pa.Table) -> pa.Table:
        cnt_col = next(c for c in t.column_names if c != id_col)
        t = t.filter(pc.greater(t[cnt_col], 1))
        return t.select([id_col, cnt_col]).rename_columns([id_col, "dup_count"])

    dups = counted.map_batches(keep_dups, batch_format="pyarrow")
    batches = list(dups.iter_batches(batch_format="pyarrow", batch_size=2**20))
    empty = pa.table(
        {id_col: pa.array([], pa.string()), "dup_count": pa.array([], pa.int64())}
    )
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b]) for b in batches
    ]
    table = pa.concat_tables(tables or [empty])
    if table.num_rows > MAX_DUP_KEYS_COLLECTED:
        raise RuntimeError(
            f"{table.num_rows} duplicate keys exceeds driver collect cap "
            f"{MAX_DUP_KEYS_COLLECTED}; input looks pathologically duplicated"
        )
    return table


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
        import pandas as pd

        counts = pd.Series(
            dup["dup_count"].to_numpy(zero_copy_only=False),
            index=dup[id_col].to_pylist(),
        )
        hit_ids = hit[id_col].to_pylist()
        cnt = counts.loc[hit_ids].to_numpy()
        parts = (
            hit[partition_col].to_pylist()
            if partition_col and partition_col in hit.column_names
            else ["all"] * n
        )
        return pa.table(
            {
                "rule_id": pa.array(["doc_id_unique"] * n, pa.string()),
                "doc_id": pa.array(hit_ids, pa.string()),
                "partition": pa.array(parts, pa.string()),
                "reason": pa.array(
                    [f"doc_id appears {int(c)} times" for c in cnt], pa.string()
                ),
            }
        )

    return keys_ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
