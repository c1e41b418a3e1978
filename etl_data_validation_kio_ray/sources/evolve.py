"""Schema-evolution-tolerant Parquet reading: union datasets whose
files were written under DIFFERENT schema versions (columns added over
time) into one stream with the superset schema, null-filling columns a
version lacks.

Reference analog: the reference's loaders tolerate payload-version
drift by defaulting absent JSON fields
(/root/reference/src/app2/etl/loaders.py); re-expressed here at the
columnar layer: each version directory is its own Ray Dataset, columns
align by NAME to the superset schema (order-normalized), and the
per-version null-fill runs inside the fused read task — no exchange,
no driver materialization.

Scale note: schema unification is per-FILE metadata work plus an O(1)
column append per batch; the data path stays zero-copy Arrow. Type
PROMOTION (int32 -> int64 etc.) is applied when versions disagree on a
shared column's width; genuinely incompatible types raise loudly.
"""

from __future__ import annotations

import pyarrow as pa


def _superset_schema(schemas: list[pa.Schema]) -> pa.Schema:
    """Field-name union with numeric width promotion; first-seen order."""
    fields: dict[str, pa.DataType] = {}
    order: list[str] = []
    for sch in schemas:
        for f in sch:
            if f.name not in fields:
                fields[f.name] = f.type
                order.append(f.name)
                continue
            cur = fields[f.name]
            if cur.equals(f.type):
                continue
            # numeric promotion: pick the wider of two integer/float types
            both_int = pa.types.is_integer(cur) and pa.types.is_integer(f.type)
            both_float = pa.types.is_floating(cur) and pa.types.is_floating(
                f.type
            )
            if both_int or both_float:
                fields[f.name] = max((cur, f.type), key=lambda t: t.bit_width)
            else:
                raise ValueError(
                    f"read_evolved_parquet: column {f.name!r} has "
                    f"incompatible types across versions: {cur} vs {f.type}"
                )
    return pa.schema([pa.field(n, fields[n]) for n in order])


def read_evolved_parquet(version_dirs: list[str], **read_kwargs):
    """Read several Parquet directories written under different schema
    versions as ONE Dataset with the superset schema. Columns a version
    lacks are null-filled with the promoted type; shared columns are
    cast to the promoted type. Returns a lazy Dataset."""
    import pyarrow.parquet as pq
    import ray.data as rd

    if not version_dirs:
        raise ValueError("read_evolved_parquet: no version dirs given")
    import glob
    import os

    schemas = []
    for d in version_dirs:
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            raise FileNotFoundError(
                f"read_evolved_parquet: no parquet files under {d}"
            )
        schemas.append(pq.read_schema(files[0]))
    target = _superset_schema(schemas)

    def align(t: pa.Table, _target=target) -> pa.Table:
        cols = {}
        for f in _target:
            if f.name in t.column_names:
                c = t[f.name]
                if not c.type.equals(f.type):
                    c = c.cast(f.type)
                cols[f.name] = c
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        return pa.table(cols)

    parts = [
        rd.read_parquet(d, **read_kwargs).map_batches(
            align, batch_format="pyarrow", zero_copy_batch=True
        )
        for d in version_dirs
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
