"""Declarative QUERY specs: one dict/YAML description compiles to BOTH
executors — a Ray Data pipeline (column-pruned read → vectorized
filter → map-side partial aggregate → small grouped exchange) and the
equivalent DuckDB SQL — so a user-written spec is cross-checked the
same way the hand-written driver queries are.

This extends the reference's declarative *rule* surface
(/root/reference/src/app2/etl_validation/specs.py:6-14, YAML loader
/root/reference/src/app2/validators/__init__.py:6-27) from checks to
full aggregation queries: the reference expresses each check as SQL
run by pluggable tools; here the ONE spec is the source of truth and
both engines are generated from it.

Spec grammar (all keys except ``table`` optional)::

    table:    orders                  # parquet stem under sf_dir
    columns:  [o_orderstatus, ...]    # pruned read (derived cols'
                                      # inputs are added automatically)
    filters:                          # AND-list, vectorized per batch
      - {col: o_orderstatus, op: eq, value: F}
      - {col: o_totalprice, op: ge, value: 1000.0}
      # ops: eq ne lt le gt ge in not_in
    derive:                           # vectorized derived columns
      price_c: {fn: cents, col: o_totalprice}   # round(x*100) int64
      yr:      {fn: year,  col: o_orderdate}    # timestamp -> int64
      mo:      {fn: month, col: o_orderdate}
      len:     {fn: strlen, col: o_comment}     # UTF-8 chars, int64
    group_by: [o_orderpriority, yr]
    aggs:                             # out_name: [fn] or [fn, col]
      n:          [count]
      sum_price:  [sum, price_c]      # sum/min/max need int64 inputs
    sort: [o_orderpriority, yr]       # defaults to group_by
    limit: 100                        # optional head after sort

Scale shape: filters and derivations run inside the fused read task;
aggregation rides :func:`..relational.grouped_agg` (per-batch Arrow
partials, the exchange moves one row per key per batch). ``limit``
applies after the grouped result, which is key-bounded.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_OPS = ("eq", "ne", "lt", "le", "gt", "ge", "in", "not_in")
_DERIVE_FNS = ("cents", "year", "month", "strlen")
_AGG_FNS = ("count", "sum", "min", "max")

_US_PER_DAY = 86_400_000_000


def _check(spec: dict) -> None:
    if "table" not in spec:
        raise ValueError("query spec: 'table' is required")
    for f in spec.get("filters", ()):
        if f.get("op") not in _OPS:
            raise ValueError(f"query spec: unknown filter op {f.get('op')!r}")
        if "col" not in f or "value" not in f:
            raise ValueError(f"query spec: filter needs col+value: {f}")
    for name, d in spec.get("derive", {}).items():
        if d.get("fn") not in _DERIVE_FNS:
            raise ValueError(
                f"query spec: unknown derive fn {d.get('fn')!r} for {name!r}"
            )
    for out, a in spec.get("aggs", {}).items():
        if not a or a[0] not in _AGG_FNS:
            raise ValueError(f"query spec: unknown agg {a!r} for {out!r}")
        if a[0] != "count" and len(a) != 2:
            raise ValueError(f"query spec: agg {out!r} needs [fn, col]")


def _needed_columns(spec: dict) -> list[str]:
    cols = set(spec.get("columns", ()))
    for f in spec.get("filters", ()):
        cols.add(f["col"])
    for d in spec.get("derive", {}).values():
        cols.add(d["col"])
    derived = set(spec.get("derive", {}))
    for g in spec.get("group_by", ()):
        if g not in derived:
            cols.add(g)
    for a in spec.get("aggs", {}).values():
        if a[0] != "count" and a[1] not in derived:
            cols.add(a[1])
    return sorted(cols)


def _apply_filters(t: pa.Table, filters) -> pa.Table:
    for f in filters:
        col, op, val = t[f["col"]], f["op"], f["value"]
        if op == "eq":
            mask = pc.equal(col, val)
        elif op == "ne":
            mask = pc.not_equal(col, val)
        elif op == "lt":
            mask = pc.less(col, val)
        elif op == "le":
            mask = pc.less_equal(col, val)
        elif op == "gt":
            mask = pc.greater(col, val)
        elif op == "ge":
            mask = pc.greater_equal(col, val)
        elif op == "in":
            mask = pc.is_in(col, value_set=pa.array(val))
        else:  # not_in
            mask = pc.invert(pc.is_in(col, value_set=pa.array(val)))
        t = t.filter(mask)
    return t


def _apply_derive(t: pa.Table, derive: dict) -> pa.Table:
    for name, d in derive.items():
        col, fn = t[d["col"]], d["fn"]
        if fn == "cents":
            v = np.round(
                col.to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            arr = pa.array(v)
        elif fn in ("year", "month"):
            ts = pc.cast(col, pa.timestamp("us"))
            arr = pc.cast(getattr(pc, fn)(ts), pa.int64())
        else:  # strlen
            arr = pc.cast(pc.utf8_length(col), pa.int64())
        t = t.append_column(name, arr)
    return t


def run_spec(sf_dir: str, spec: dict) -> pd.DataFrame:
    """Execute the spec as a Ray Data pipeline over ``sf_dir``."""
    import ray.data as rd

    from .relational import grouped_agg

    _check(spec)
    ds = rd.read_parquet(
        os.path.join(sf_dir, spec["table"] + ".parquet"),
        columns=_needed_columns(spec),
    )
    filters = list(spec.get("filters", ()))
    derive = dict(spec.get("derive", {}))

    def prep(t: pa.Table) -> pa.Table:
        return _apply_derive(_apply_filters(t, filters), derive)

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    keys = list(spec.get("group_by", ()))
    aggs = spec.get("aggs", {})
    if not keys:
        raise ValueError("query spec: ungrouped specs not supported yet")
    count_col = keys[0]  # count(*) counts the (never-null) group key
    plan = {
        out: ((count_col, "count") if a[0] == "count" else (a[1], a[0]))
        for out, a in aggs.items()
    }
    out = grouped_agg(prepped, keys, plan)
    for name, a in aggs.items():
        if a[0] in ("count", "sum", "min", "max"):
            out[name] = out[name].astype("int64")
    sort = list(spec.get("sort", keys))
    out = out.sort_values(sort, kind="mergesort").reset_index(drop=True)
    if "limit" in spec:
        out = out.head(int(spec["limit"])).reset_index(drop=True)
    return out[keys + list(aggs)]


def _sql_value(v: Any) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    return repr(v)


def _sql_expr(name: str, derive: dict) -> str:
    if name not in derive:
        return name
    d = derive[name]
    col, fn = d["col"], d["fn"]
    if fn == "cents":
        return f"CAST(round({col} * 100) AS BIGINT)"
    if fn in ("year", "month"):
        return f"CAST(date_part('{fn}', {col}) AS BIGINT)"
    return f"CAST(length({col}) AS BIGINT)"


def spec_to_sql(spec: dict) -> str:
    """Compile the SAME spec to its DuckDB twin (tables are
    pre-registered views named after the parquet stem)."""
    _check(spec)
    derive = dict(spec.get("derive", {}))
    keys = list(spec.get("group_by", ()))
    sel = [f"{_sql_expr(k, derive)} AS {k}" for k in keys]
    for out, a in spec.get("aggs", {}).items():
        if a[0] == "count":
            sel.append(f"CAST(count(*) AS BIGINT) AS {out}")
        else:
            sel.append(
                f"CAST({a[0]}({_sql_expr(a[1], derive)}) AS BIGINT) AS {out}"
            )
    where = []
    for f in spec.get("filters", ()):
        col, op, val = f["col"], f["op"], f["value"]
        if op in ("in", "not_in"):
            lst = ", ".join(_sql_value(v) for v in val)
            neg = "NOT " if op == "not_in" else ""
            where.append(f"{col} {neg}IN ({lst})")
        else:
            sym = {"eq": "=", "ne": "<>", "lt": "<", "le": "<=",
                   "gt": ">", "ge": ">="}[op]
            where.append(f"{col} {sym} {_sql_value(val)}")
    sql = "SELECT " + ",\n       ".join(sel) + f"\nFROM {spec['table']}"
    if where:
        sql += "\nWHERE " + " AND ".join(where)
    if keys:
        sql += "\nGROUP BY " + ", ".join(_sql_expr(k, derive) for k in keys)
    sort = list(spec.get("sort", keys))
    if sort:
        sql += "\nORDER BY " + ", ".join(sort)
    if "limit" in spec:
        sql += f"\nLIMIT {int(spec['limit'])}"
    return sql


def load_query_spec(path: str) -> dict:
    """Load a YAML spec file (safe loader; plain dict out)."""
    import yaml

    with open(path) as f:
        spec = yaml.safe_load(f)
    _check(spec)
    return spec
