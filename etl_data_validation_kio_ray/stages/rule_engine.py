"""The single-pass rule engine — an actor-pool ``map_batches`` stage.

Re-expresses the reference's per-suite validators
(/root/reference/src/app2/validators/{stg,dds}/*_suite/*.py) and the
declarative StageChecks (/root/reference/src/app2/etl_validation/specs.py:20-333)
as ONE vectorized pass over zero-copy Arrow batches. Like the
reference's module-level compiled ``Draft7Validator`` singletons
(schema_suite/matches_schema.py:56), all rule compilation — expected
schema, allowed-source set, baseline drift snapshot — happens once per
actor in ``__init__`` (broadcast via ``ray.put`` ObjectRefs), never per
batch.

Output is a union table so ONE scan of the input produces both
violation rows and mergeable stat partials (at 100 TB a second scan is
the thing to avoid):

    kind:      'violation' | 'partial'
    rule_id:   string
    partition: string
    doc_id:    string  (null for partials)
    reason:    string  (null for partials)
    payload:   binary  (pickled partial state; null for violations)

Wide rules (doc_id uniqueness) cannot be computed in a narrow pass —
see stages/uniqueness.py; drift partials are produced here and scored
against the baseline in stages/drift.py.
"""

from __future__ import annotations

import pickle
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.specs import RuleSpec
from ..sketches import CountingHist, FixedHistogram, HyperLogLog, TDigest
from ..sketches.hll import hash64

UNION_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("rule_id", pa.string()),
        ("partition", pa.string()),
        ("doc_id", pa.string()),
        ("reason", pa.string()),
        ("payload", pa.binary()),
    ]
)

# drift histogram shapes (FIXTURES.md F3)
NTOK_BINS = 64
TOKEN_BINS = 256


def bin_width(vocab_size: int) -> int:
    """Integer token-hist bin width: ceil(vocab/TOKEN_BINS). The
    histogram domain is [0, bin_width*TOKEN_BINS), slightly wider than
    the vocab — bin edges stay integral so binning is one int32
    divide."""
    return -(-vocab_size // TOKEN_BINS)

# per-worker-process engine cache for the task-based (fused) path: the
# compiled engine is built once per worker and reused by every task the
# worker executes — the task-pool equivalent of actor-pool __init__
# state. Keyed by a config fingerprint so differently-configured
# pipelines sharing a worker don't collide.
_WORKER_ENGINES: dict[str, "RuleEngine"] = {}


class CachedEngineFn:
    """Picklable ``map_batches`` callable that lazily builds (and
    caches per worker process) a :class:`RuleEngine`.

    Why not ``map_batches(RuleEngine, concurrency=N)``: an actor pool
    is a separate operator, so read -> engine crosses the object store
    and pays actor-pool startup on every run; a plain function fuses
    with ReadParquet into ONE task (`ReadParquet->MapBatches->Write`),
    keeping the heavy decoded token column entirely on the worker heap.
    The engine state (compiled rules, broadcast allowed-source set) is
    still built once per worker via the module-level cache above.
    """

    def __init__(self, engine_kwargs: dict):
        self.engine_kwargs = engine_kwargs
        self.cache_key = _config_key(engine_kwargs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eng = _WORKER_ENGINES.get(self.cache_key)
        if eng is None:
            eng = _WORKER_ENGINES[self.cache_key] = RuleEngine(**self.engine_kwargs)
            if len(_WORKER_ENGINES) > 8:  # bound worker-lifetime growth
                for k in list(_WORKER_ENGINES)[:-4]:
                    del _WORKER_ENGINES[k]
        return eng(batch)


def _config_key(engine_kwargs: dict) -> str:
    import hashlib

    try:
        blob = pickle.dumps(engine_kwargs, protocol=pickle.HIGHEST_PROTOCOL)
    except Exception:  # unpicklable kwargs fall back to per-instance key
        blob = repr(engine_kwargs).encode()
    return hashlib.md5(blob).hexdigest()


def _empty_like(n: int) -> dict[str, list]:
    return {k.name: [] for k in UNION_SCHEMA}


class RuleEngine:
    """Callable class for ``map_batches(RuleEngine, concurrency=N,
    batch_format='pyarrow', fn_constructor_kwargs=...)``."""

    def __init__(
        self,
        rules: dict[str, RuleSpec],
        *,
        partition_col: str | None = "partition",
        id_col: str = "doc_id",
        token_col: str = "tokens",
        len_col: str = "n_tok",
        source_col: str = "source",
        allowed_sources: Any = None,  # list | ObjectRef | None
        max_len: int = 8192,
        vocab_size: int = 50257,
    ):
        import ray

        self.rules = {r.rule_id: r for r in rules.values() if r.enabled}
        self.partition_col = partition_col
        self.id_col = id_col
        self.token_col = token_col
        self.len_col = len_col
        self.source_col = source_col

        inv = self.rules.get("row_invariants")
        self.min_len = int(inv.params.get("min_len", 1)) if inv else 1
        self.max_len = int(inv.params.get("max_len", max_len)) if inv else max_len
        self.vocab_size = int(inv.params.get("vocab_size", vocab_size)) if inv else vocab_size
        # stats histogram domain is independent of the invariant range:
        # a tight max_len must not clip the n_tok distribution stats
        stats = self.rules.get("column_stats")
        self.stats_hi = int((stats.params.get("hist_max") if stats else None) or 8192)

        # broadcast small side: resolve ObjectRef once per actor
        ref = self.rules.get("source_ref")
        allowed = allowed_sources
        if allowed is None and ref is not None:
            allowed = ref.params.get("allowed_sources")
        if allowed is not None and isinstance(allowed, ray.ObjectRef):
            allowed = ray.get(allowed)
        self.allowed_sources = (
            pa.array(sorted(set(allowed)), pa.string()) if allowed is not None else None
        )

        self.expected_schema = pa.schema(
            [
                (self.id_col, pa.string()),
                (self.token_col, pa.list_(pa.int32())),
                (self.len_col, pa.int32()),
                (self.source_col, pa.string()),
            ]
        )

    # ------------------------------------------------------------------ util

    def _emit_violation(self, out, rule_id, partition, doc_ids, reasons):
        n = len(doc_ids)
        out["kind"].extend(["violation"] * n)
        out["rule_id"].extend([rule_id] * n)
        out["partition"].extend([partition] * n)
        out["doc_id"].extend(doc_ids)
        out["reason"].extend(reasons)
        out["payload"].extend([None] * n)

    def _emit_partial(self, out, rule_id, partition, state: dict):
        out["kind"].append("partial")
        out["rule_id"].append(rule_id)
        out["partition"].append(partition)
        out["doc_id"].append(None)
        out["reason"].append(None)
        out["payload"].append(pickle.dumps(state, protocol=pickle.HIGHEST_PROTOCOL))

    # ------------------------------------------------------------------ main

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = _empty_like(0)
        if self.partition_col and self.partition_col in batch.column_names:
            parts = pc.unique(batch[self.partition_col])
            if len(parts) == 1:
                self._process(batch, str(parts[0].as_py()), out)
            else:
                for pval in sorted(p.as_py() for p in parts):
                    mask = pc.equal(batch[self.partition_col], pa.scalar(pval))
                    self._process(batch.filter(mask), str(pval), out)
        else:
            self._process(batch, "all", out)
        return pa.table(
            {k.name: pa.array(out[k.name], k.type) for k in UNION_SCHEMA},
            schema=UNION_SCHEMA,
        )

    def _process(self, sub: pa.Table, partition: str, out) -> None:
        # gate rule FIRST: rows failing the declarative predicate are
        # quarantined (violation rows + count) and excluded from every
        # downstream rule — the reference's HTTP-status gating filter
        # (experiments/stg_copy.py:67 `http_status BETWEEN 200 AND 299`,
        # etl_validation/specs.py:36) re-expressed declaratively
        if "row_gate" in self.rules:
            sub = self._rule_gate(sub, partition, out)
        nrows = sub.num_rows
        cols = set(sub.column_names)

        # ids stay Arrow; materialized to Python ONLY for the (rare)
        # violating rows via take — never a full to_pylist per batch
        ids_arr = sub[self.id_col].combine_chunks() if self.id_col in cols else None

        def take_ids(idx: np.ndarray) -> list:
            if ids_arr is None:
                return [None] * len(idx)
            return ids_arr.take(pa.array(idx, pa.int64())).to_pylist()

        def id_at(i: int) -> str | None:
            return ids_arr[int(i)].as_py() if ids_arr is not None else None

        # tokens: flat view once, reused by invariants + stats; no
        # int64 widening. When the ListArray is dense (unsliced,
        # offsets covering the whole child array — the normal case for
        # parquet-decoded blocks) the child `.values` IS the flattened
        # array, zero-copy; otherwise fall back to list_flatten (copy).
        tokens = lens_np = flat_np = None
        if self.token_col in cols:
            tokens = sub[self.token_col].combine_chunks()
            lens = pc.list_value_length(tokens)
            lens_np = (
                pc.fill_null(lens, -1).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            flat_np = None
            if (
                isinstance(tokens, pa.ListArray)
                and tokens.offset == 0
                and tokens.null_count == 0
                and tokens.values.null_count == 0
            ):
                offs = tokens.offsets
                if (
                    len(offs)
                    and offs[0].as_py() == 0
                    and offs[-1].as_py() == len(tokens.values)
                ):
                    flat_np = tokens.values.to_numpy(zero_copy_only=False)
            if flat_np is None:
                flat_np = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)

        n_tok_np = None
        if self.len_col in cols:
            n_tok = sub[self.len_col].combine_chunks()
            n_tok_np = (
                pc.fill_null(n_tok, -1).to_numpy(zero_copy_only=False).astype(np.int64)
            )

        # one max-reduction over the flat tokens (read-only, no
        # temporaries): the uint32 view maps negatives to huge values,
        # so `tok_max_u < vocab_size` proves EVERY token in-range —
        # letting the vocab check and the histogram clip skip their
        # full-array passes on clean data (the common case; bytes per
        # token is the scaling cost of this stage)
        tok_max_u = None
        if (
            flat_np is not None
            and len(flat_np)
            and flat_np.dtype == np.int32
            and ("row_invariants" in self.rules or "column_stats" in self.rules)
        ):
            tok_max_u = int(flat_np.view(np.uint32).max())

        # doc_id hashes: computed once, shared by the HLL stat and the
        # uniqueness rule's hash emission
        ids_hash = None
        if ids_arr is not None and (
            "doc_id_unique" in self.rules or "column_stats" in self.rules
        ):
            from ..sketches.hll import hash64

            valid_ids = ids_arr.drop_null()
            if len(valid_ids):
                ids_hash = hash64(valid_ids.to_numpy(zero_copy_only=False))
            else:
                ids_hash = np.empty(0, dtype=np.uint64)

        if "schema_types" in self.rules:
            self._rule_schema(sub, partition, out, take_ids, nrows)
        if "completeness_nulls" in self.rules:
            self._rule_completeness(sub, partition, out, nrows)
        if "row_invariants" in self.rules and tokens is not None:
            self._rule_invariants(
                partition, out, take_ids, nrows, lens_np, n_tok_np, flat_np,
                tok_max_u=tok_max_u,
            )
        if "source_ref" in self.rules and self.allowed_sources is not None and self.source_col in cols:
            self._rule_source_ref(sub, partition, out, take_ids)
        if "column_stats" in self.rules or "drift_ks_psi" in self.rules:
            self._rule_stats(
                sub, partition, out, nrows, lens_np, n_tok_np, flat_np, ids_hash,
                tok_max_u=tok_max_u,
            )
        if "doc_id_unique" in self.rules and ids_hash is not None:
            # one 'hash' row per (batch, partition): the raw 64-bit id
            # hashes as a binary blob. The uniqueness shuffle later
            # reads ONLY these small rows back — the id strings are
            # never re-decoded from the input (stages/uniqueness.py)
            out["kind"].append("hash")
            out["rule_id"].append("doc_id_unique")
            out["partition"].append(partition)
            out["doc_id"].append(None)
            out["reason"].append(None)
            out["payload"].append(ids_hash.tobytes())

    # ------------------------------------------------------------- kernels

    _GATE_OPS = {
        "==": pc.equal,
        "!=": pc.not_equal,
        "<": pc.less,
        "<=": pc.less_equal,
        ">": pc.greater,
        ">=": pc.greater_equal,
    }

    def _rule_gate(self, sub: pa.Table, partition: str, out) -> pa.Table:
        """Declarative row gate: keep rows satisfying ALL predicates
        ``params['predicates'] = [(col, op, value), ...]`` with op in
        ==, !=, <, <=, >, >=, in, not_in, not_null. Failing (or
        null-predicate) rows are quarantined: emitted as violations,
        counted in the partial, and EXCLUDED from downstream rules."""
        t0 = time.perf_counter()
        spec = self.rules["row_gate"]
        preds = spec.params.get("predicates", [])
        nrows = sub.num_rows
        keep = np.ones(nrows, dtype=bool)
        why: list[str] = []
        per_row_reason = np.full(nrows, -1, dtype=np.int32)
        for pi, (col, op, value) in enumerate(preds):
            if col not in sub.column_names:
                ok = np.zeros(nrows, dtype=bool)  # column gone: all gated
            else:
                arr = sub[col]
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                if op == "not_null":
                    m = pc.is_valid(arr)
                elif op in ("in", "not_in"):
                    # INFERRED set type (numeric promotion compares
                    # exact values, so 2.5 or out-of-range ints simply
                    # match nothing — forcing arr.type would truncate
                    # or overflow); empty sets need the column type
                    # because pa.array([]) is null-typed. The whole
                    # construction sits in the try so mixed-type value
                    # lists also get the contextual error.
                    try:
                        vs = (
                            pa.array(list(value))
                            if value
                            else pa.array([], type=arr.type)
                        )
                        m = pc.is_in(arr, value_set=vs)
                    except (
                        pa.ArrowTypeError,
                        pa.ArrowInvalid,
                        pa.ArrowNotImplementedError,
                    ) as e:
                        raise ValueError(
                            f"row_gate: values {value!r} not comparable to "
                            f"column {col!r} of type {arr.type}: {e}"
                        ) from e
                    if op == "not_in":
                        m = pc.invert(m)
                elif op in self._GATE_OPS:
                    m = self._GATE_OPS[op](arr, pa.scalar(value))
                else:
                    raise ValueError(f"row_gate: unknown op {op!r}")
                ok = pc.fill_null(m, False).to_numpy(zero_copy_only=False)
            newly = keep & ~ok
            per_row_reason[newly] = pi
            keep &= ok
            why.append(f"{col} {op} {value!r}")
        gated = np.flatnonzero(~keep)
        if len(gated):
            ids_arr = (
                sub[self.id_col].combine_chunks()
                if self.id_col in sub.column_names
                else None
            )
            ids = (
                ids_arr.take(pa.array(gated, pa.int64())).to_pylist()
                if ids_arr is not None
                else [None] * len(gated)
            )
            self._emit_violation(
                out, "row_gate", partition, ids,
                [f"gated: failed {why[per_row_reason[i]]}" for i in gated],
            )
        self._emit_partial(
            out, "row_gate", partition,
            {
                "rows_total": nrows,
                "rows_failed": int(len(gated)),
                "duration_ms": (time.perf_counter() - t0) * 1000,
            },
        )
        return sub.filter(pa.array(keep)) if len(gated) else sub

    def _rule_schema(self, sub, partition, out, take_ids, nrows):
        """Arrow-schema + required-field checks — analog of the Draft-7
        suites (schema_suite/matches_schema.py:59-88: required keys,
        types, minItems)."""
        t0 = time.perf_counter()
        rows_failed = 0
        # schema-level issues are emitted as PARTIAL state (one violation
        # row per partition at reduce time, not one per batch — exactness
        # under any batching, SURVEY.md §7.4)
        schema_errors: list[str] = []
        # reader-recorded nested-schema findings (sources/jsonl.py
        # SCHEMA_ERROR_COL): one violation per flagged row, with the
        # reader's precise reason — never silently dropped
        if "__schema_error" in sub.column_names:
            err = sub["__schema_error"]
            if isinstance(err, pa.ChunkedArray):
                err = err.combine_chunks()
            if err.null_count < len(err):
                bad = np.flatnonzero(
                    pc.is_valid(err).to_numpy(zero_copy_only=False)
                )
                reasons = err.take(pa.array(bad, pa.int64())).to_pylist()
                self._emit_violation(
                    out, "schema_types", partition, take_ids(bad), reasons
                )
                rows_failed += len(bad)
        for f in self.expected_schema:
            if f.name not in sub.column_names:
                schema_errors.append(f"column '{f.name}' missing")
                rows_failed += nrows
                continue
            actual = sub.schema.field(f.name).type
            if actual != f.type and not (
                pa.types.is_large_list(actual) and f.type == pa.list_(pa.int32())
                and actual.value_type == pa.int32()
            ):
                schema_errors.append(
                    f"column '{f.name}' type {actual} != expected {f.type}"
                )
                rows_failed += nrows
        # required (non-null) id + tokens
        for col in (self.id_col, self.token_col):
            if col not in sub.column_names:
                continue
            arr = sub[col]
            if arr.null_count:
                bad = np.flatnonzero(
                    pc.is_null(arr).combine_chunks().to_numpy(zero_copy_only=False)
                )
                self._emit_violation(
                    out, "schema_types", partition,
                    take_ids(bad),
                    [f"{col} is null"] * len(bad),
                )
                rows_failed += len(bad)
        self._emit_partial(
            out, "schema_types", partition,
            {
                "rows_total": nrows,
                "rows_failed": rows_failed,
                "schema_errors": sorted(set(schema_errors)),
                "duration_ms": (time.perf_counter() - t0) * 1000,
            },
        )

    def _rule_completeness(self, sub, partition, out, nrows):
        """Null-rate per column + empty-partition detection — analog of
        completeness_suite/matches_completeness.py:7-32 (list non-empty,
        declared count vs actual)."""
        t0 = time.perf_counter()
        null_counts = {
            c: int(sub[c].null_count)
            for c in sub.column_names
            if not c.startswith("__")  # reader-internal columns
        }
        any_null = np.zeros(nrows, dtype=bool)
        for c in null_counts:
            if null_counts[c]:
                any_null |= pc.is_null(sub[c]).combine_chunks().to_numpy(
                    zero_copy_only=False
                )
        self._emit_partial(
            out, "completeness_nulls", partition,
            {
                "rows_total": nrows,
                "rows_failed": int(any_null.sum()),
                "null_counts": null_counts,
                "duration_ms": (time.perf_counter() - t0) * 1000,
            },
        )

    def _rule_invariants(
        self, partition, out, take_ids, nrows, lens_np, n_tok_np, flat_np,
        tok_max_u=None,
    ):
        """Row-level predicates — analog of the consistency suites
        (consistency_suite/matches_consistency.py:18-50) and the
        out-of-range matchday check (etl_validation/specs.py:72-109).

        Three sub-conditions, one violation row per failed condition
        (mirrors one StageCheck per predicate in specs.py):
          len_mismatch : n_tok != len(tokens)
          len_range    : n_tok outside [min_len, max_len]
          vocab_range  : any token outside [0, vocab_size)

        ``tok_max_u``: precomputed unsigned max over the flat tokens
        (see _process) — skips the vocab compare entirely when clean.
        """
        t0 = time.perf_counter()
        rows_failed = 0
        if n_tok_np is not None:
            valid = (lens_np >= 0) & (n_tok_np >= 0)  # nulls handled by schema rule
            mism = np.flatnonzero(valid & (n_tok_np != lens_np))
            self._emit_violation(
                out, "row_invariants", partition,
                take_ids(mism),
                [
                    f"n_tok={n_tok_np[i]} != len(tokens)={lens_np[i]}"
                    for i in mism
                ],
            )
            rows_failed += len(mism)

            rng = np.flatnonzero(
                (n_tok_np >= 0)
                & ((n_tok_np < self.min_len) | (n_tok_np > self.max_len))
            )
            self._emit_violation(
                out, "row_invariants", partition,
                take_ids(rng),
                [
                    f"n_tok={n_tok_np[i]} out of range [{self.min_len},{self.max_len}]"
                    for i in rng
                ],
            )
            rows_failed += len(rng)

        if flat_np is not None and len(flat_np):
            if tok_max_u is not None:
                # precomputed max-reduction (read-only): all tokens
                # proven in-range -> no compare pass, no bool temporary
                bad_tok = (
                    None
                    if tok_max_u < self.vocab_size
                    else flat_np.view(np.uint32) >= np.uint32(self.vocab_size)
                )
            elif flat_np.dtype == np.int32:
                # one unsigned compare catches both negatives (wrap to
                # huge uint32) and >= vocab — single pass over the flat
                # token array instead of two compares + an OR
                bad_tok = flat_np.view(np.uint32) >= np.uint32(self.vocab_size)
            else:
                bad_tok = (flat_np < 0) | (flat_np >= self.vocab_size)
            if bad_tok is not None and bad_tok.any():
                # row index of each flat token — built ONLY when
                # violations exist (rare path)
                row_of_flat = np.repeat(
                    np.arange(nrows), np.where(lens_np < 0, 0, lens_np)
                )
                per_row = np.bincount(row_of_flat[bad_tok], minlength=nrows)
                bad_rows = np.flatnonzero(per_row)
                self._emit_violation(
                    out, "row_invariants", partition,
                    take_ids(bad_rows),
                    [
                        f"{per_row[i]} tokens out of vocab range [0,{self.vocab_size})"
                        for i in bad_rows
                    ],
                )
                rows_failed += len(bad_rows)

        self._emit_partial(
            out, "row_invariants", partition,
            {
                "rows_total": nrows,
                "rows_failed": rows_failed,
                "duration_ms": (time.perf_counter() - t0) * 1000,
            },
        )

    def _rule_source_ref(self, sub, partition, out, take_ids):
        """Broadcast hash semi-join probe against the allowed-sources
        dimension — analog of the FK NOT EXISTS anti-joins
        (dds/referential_suite/fact_match_fk.py:16-62): the small dim
        side is broadcast once per actor; violations are rows whose
        ``source`` has no match."""
        t0 = time.perf_counter()
        src = sub[self.source_col].combine_chunks()
        ok = pc.is_in(src, value_set=self.allowed_sources)
        bad_mask = pc.fill_null(pc.invert(ok), True)
        bad = np.flatnonzero(bad_mask.to_numpy(zero_copy_only=False))
        if len(bad):
            vals = src.take(pa.array(bad)).to_pylist()
            self._emit_violation(
                out, "source_ref", partition,
                take_ids(bad),
                [f"source '{v}' not in allowed_sources" for v in vals],
            )
        self._emit_partial(
            out, "source_ref", partition,
            {
                "rows_total": sub.num_rows,
                "rows_failed": int(len(bad)),
                "duration_ms": (time.perf_counter() - t0) * 1000,
            },
        )

    def _rule_stats(
        self, sub, partition, out, nrows, lens_np, n_tok_np, flat_np, ids_hash=None,
        tok_max_u=None,
    ):
        """Mergeable per-batch stat partials — replaces the reference's
        exact count_sql scalars + mart aggregates (specs.py:421-426,
        mart_views.sql:62-95) with the sketch partials the north star
        requires: count/null-rate, min/max, exact counting-hist
        quantiles + t-digest, HLL doc_id cardinality, and the drift
        histograms (n_tok 64 bins, per-source token values 256 bins)."""
        t0 = time.perf_counter()
        state: dict[str, Any] = {"rows_total": nrows, "rows_failed": 0}
        if n_tok_np is not None:
            valid = n_tok_np[n_tok_np >= 0]
            ch = CountingHist(1, self.stats_hi).update(valid)
            td = TDigest().update(valid.astype(np.float64))
            nh = FixedHistogram(1, self.stats_hi + 1, NTOK_BINS).update(valid)
            state["n_tok_hist"] = ch.to_state()
            state["n_tok_tdigest"] = td.to_state()
            state["n_tok_fixed"] = nh.to_state()
        if ids_hash is None and self.id_col in sub.column_names:
            arr = sub[self.id_col].combine_chunks()
            vals = arr.drop_null().to_numpy(zero_copy_only=False)
            ids_hash = hash64(vals)
        if ids_hash is not None:
            state["doc_id_hll"] = HyperLogLog().update_hashed(ids_hash).to_state()
        if flat_np is not None and self.source_col in sub.column_names and lens_np is not None:
            # per-source token histograms in ONE vectorized pass:
            # dictionary-encode source -> small int codes, repeat per
            # token, then a single 2-D bincount over
            # (code * TOKEN_BINS + token_bin) — no per-source scans of
            # the flat token array. All-int32 in-place arithmetic with
            # an INTEGER bin width (ceil(vocab/bins)) keeps memory
            # traffic at ~2 int32 passes over the flat array instead of
            # a float64 round-trip — this stage runs on every token of
            # the corpus, so bytes-per-token is the scaling cost.
            src = sub[self.source_col].combine_chunks()
            dict_arr = pc.dictionary_encode(src)
            names = dict_arr.dictionary.to_pylist()
            # fill_null BEFORE to_numpy: null indices otherwise surface
            # as float NaN whose int cast is platform-dependent
            codes = (
                pc.fill_null(dict_arr.indices, len(names))
                .to_numpy(zero_copy_only=False)
                .astype(np.int32)
            )
            flat_codes = np.repeat(codes, np.where(lens_np < 0, 0, lens_np))
            bin_w = np.int32(bin_width(self.vocab_size))
            bins = flat_np // bin_w  # int32; invalid tokens land outside
            if tok_max_u is None or tok_max_u >= self.vocab_size:
                # clip guards only INVALID tokens; the precomputed max
                # proves clean batches need no read+write clip pass
                np.clip(bins, 0, TOKEN_BINS - 1, out=bins)
            bins = bins.astype(np.int32, copy=False)
            flat_codes *= np.int32(TOKEN_BINS)
            flat_codes += bins
            counts = np.bincount(
                flat_codes, minlength=(len(names) + 1) * TOKEN_BINS
            ).reshape(len(names) + 1, TOKEN_BINS)
            token_hists: dict[str, dict] = {}
            for ci, name in enumerate([*names, None]):
                if counts[ci].sum() == 0 and name is None:
                    continue
                key = "" if name is None else str(name)
                row = counts[ci].astype(np.int64)
                if key in token_hists:  # null bucket merges with a real ""
                    row = row + np.asarray(token_hists[key]["counts"])
                h = FixedHistogram(0, int(bin_w) * TOKEN_BINS, TOKEN_BINS, row)
                token_hists[key] = h.to_state()
            state["token_hists"] = token_hists
        state["duration_ms"] = (time.perf_counter() - t0) * 1000
        self._emit_partial(out, "column_stats", partition, state)
