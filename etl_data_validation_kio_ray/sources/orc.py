"""ORC source + sink for the token table — the columnar warehouse
interchange format alongside Parquet (input), Arrow IPC, CSV and JSONL
(reference's 2.1 DB→file exporter family,
/root/reference/scripts/export_input_from_db.py:1-199 analog). ORC
carries the nested ``tokens: list<int32>`` natively (no stringify/parse
step), so the roundtrip certifies the schema contract the same way the
IPC path does while exercising a second on-disk codec.

Scale shape mirrors ``sources/ipc.py``: the sink is a ``map_batches``
stage — each task writes its own shard ATOMICALLY (tmp + ``os.replace``)
and returns only a one-row manifest (path, rows), so no data returns to
the driver and a re-run of a failed task cannot leave a torn file. The
reader maps whole files through the same ``_normalize`` validation
contract as the JSON/CSV/IPC readers — schema errors surface
per-partition in ``SCHEMA_ERROR_COL`` instead of killing the pipeline.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa

from .jsonl import _normalize


def write_token_orc(ds, out_dir: str) -> list[dict]:
    """Write ``ds`` as one ``.orc`` shard per task. Returns the
    manifest rows (shard path + row count) — #tasks rows, never data."""
    import pyarrow.orc as orc

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        name = f"shard-{uuid.uuid4().hex}.orc"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        final = os.path.join(out_dir, name)
        orc.write_table(t, tmp)
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


def read_token_orc(path: str, *, partition: str | None = None):
    """ORC shard directory -> canonical token-table Dataset, through
    the same normalization/validation contract as the other readers."""
    import ray.data as rd

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".orc")
    )
    if not files:
        raise FileNotFoundError(f"read_token_orc: no .orc shards in {path}")
    ds = rd.read_binary_files(files)

    def parse(batch: dict) -> pa.Table:
        import pyarrow.orc as orc

        tables = []
        for blob in batch["bytes"]:
            buf = pa.py_buffer(
                blob if isinstance(blob, bytes) else blob.tobytes()
            )
            tables.append(orc.ORCFile(pa.BufferReader(buf)).read())
        return _normalize(pa.concat_tables(tables), partition)

    # one input row = one whole shard file; batch_size=1 keeps peak
    # memory at a single decoded shard per task
    return ds.map_batches(parse, batch_size=1)
