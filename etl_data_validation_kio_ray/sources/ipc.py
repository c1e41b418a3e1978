"""Arrow IPC (Feather v2 / ``.arrow``) source + sink for the token
table — the zero-parse interchange format of the 2.1 file-exporter
family (reference's DB→file exporter family,
/root/reference/src/app2/etl_load/file_export.py analog at columnar
grain). Unlike CSV/JSONL, IPC carries the nested ``tokens:
list<int32>`` type natively, so the roundtrip certifies the schema
contract with NO stringify/parse lossy step in between.

Scale shape: the sink is a ``map_batches`` stage — every task writes
its own shard file ATOMICALLY (tmp + ``os.replace``) and emits only a
one-row manifest (path, rows), so no data returns to the driver and a
re-run of a failed task cannot leave a torn file. The reader maps
whole files (one IPC file = one Arrow table, memory-mapped by the
Arrow reader) through the same ``_normalize`` validation contract as
the JSON/CSV readers — schema errors surface per-partition in
``SCHEMA_ERROR_COL`` instead of killing the pipeline.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa

from .jsonl import _normalize


def write_token_ipc(ds, out_dir: str) -> list[dict]:
    """Write ``ds`` as one ``.arrow`` (IPC file format) shard per task.
    Returns the manifest rows (shard path + row count), collected at
    the driver — #tasks rows, never data."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        name = f"shard-{uuid.uuid4().hex}.arrow"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        final = os.path.join(out_dir, name)
        with pa.OSFile(tmp, "wb") as f:
            with pa.ipc.new_file(f, t.schema) as w:
                w.write_table(t)
        os.replace(tmp, final)
        return pa.table(
            {
                "path": pa.array([final], pa.string()),
                "rows": pa.array([t.num_rows], pa.int64()),
            }
        )

    return ds.map_batches(
        write_shard, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()


def read_token_ipc(path: str, *, partition: str | None = None):
    """IPC shard directory -> canonical token-table Dataset, through
    the same normalization/validation contract as
    :func:`..jsonl.read_token_json`."""
    import ray.data as rd

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".arrow")
    )
    if not files:
        raise FileNotFoundError(f"read_token_ipc: no .arrow shards in {path}")
    ds = rd.read_binary_files(files)

    def parse(batch: dict) -> pa.Table:
        tables = []
        for blob in batch["bytes"]:
            buf = pa.py_buffer(
                blob if isinstance(blob, bytes) else blob.tobytes()
            )
            tables.append(pa.ipc.open_file(buf).read_all())
        return _normalize(pa.concat_tables(tables), partition)

    # one input row = one whole shard file; batch_size=1 keeps peak
    # memory at a single decoded shard per task
    return ds.map_batches(parse, batch_size=1)
