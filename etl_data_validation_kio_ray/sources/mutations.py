"""Fault-injection harness (FIXTURES.md F4).

Mirrors the reference's mutation experiment machinery: the STG payload
corruptions (/root/reference/src/app2/mutators/stg_mutations.py:28-93 —
duplicate_first, drop_required, corrupt_id, matchday_out_of_range,
drop_matches_key, swap_teams), the DDS fault injections
(/root/reference/src/app2/mutators/dds_mutations.py:93-178) and the
deterministic per-run seeding (stg_mutations.py:107). Each action copies
the baseline table into a mutated directory, exactly like the reference
copies the baseline run into a new ``exp_*`` run
(/root/reference/src/app2/experiments/stg_copy.py:47-97).

The expected-detection mapping (which rule must catch which action)
follows config/mutation_experiment.yml:16-164 and is encoded in
``EXPECTED_DETECTION`` for the tests.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# action -> rule_id that must flag it (None: only per-row token equality
# against the oracle detects it — the swap_teams analog, a semantic
# corruption that schema/stats checks must NOT flag)
EXPECTED_DETECTION = {
    "duplicate_first": "doc_id_unique",
    "drop_required": "schema_types",
    "corrupt_id": "row_invariants",
    "out_of_range": "row_invariants",
    "drop_key": "schema_types",
    "unknown_source": "source_ref",
    "vocab_violation": "row_invariants",
    "shift_distribution": "drift_ks_psi",
    "swap_like": None,
}


def _rng(seed: int, action: str, partition: int) -> np.random.Generator:
    # action index (not hash()) so the stream is stable across processes
    idx = sorted(EXPECTED_DETECTION).index(action)
    return np.random.Generator(
        np.random.Philox(key=[seed, idx * 1_000_003 + partition])
    )


def mutate_table(
    src_dir: str,
    dst_dir: str,
    action: str,
    *,
    seed: int = 7,
    target_partition: int = 0,
    k_rows: int = 5,
) -> str:
    """Copy ``src_dir`` to ``dst_dir`` applying ``action`` to the target
    partition. Deterministic for a given (seed, action, partition)."""
    if action not in EXPECTED_DETECTION:
        raise KeyError(f"unknown mutation action {action!r}")
    os.makedirs(dst_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(src_dir) if f.endswith(".parquet"))
    target = files[target_partition]
    for f in files:
        src, dst = os.path.join(src_dir, f), os.path.join(dst_dir, f)
        if f != target:
            shutil.copyfile(src, dst)
            continue
        t = pq.read_table(src)
        t = _apply(t, action, _rng(seed, action, target_partition), k_rows)
        pq.write_table(t, dst)
    return dst_dir


def _apply(t: pa.Table, action: str, rng: np.random.Generator, k: int) -> pa.Table:
    cols = {c: t[c].combine_chunks() for c in t.column_names}
    n = t.num_rows

    def rebuild(**overrides) -> pa.Table:
        arrays, names = [], []
        for c in t.column_names:
            names.append(c)
            arrays.append(overrides.get(c, cols[c]))
        return pa.table(dict(zip(names, arrays)))

    if action == "duplicate_first":
        # append a copy of the first row (same doc_id) — stg_mutations.py:36-38
        first = t.slice(0, 1)
        return pa.concat_tables([t, first])

    if action == "drop_required":
        # null out doc_id in the first row — stg_mutations.py:39-45
        ids = cols["doc_id"].to_pylist()
        ids[0] = None
        return rebuild(doc_id=pa.array(ids, pa.string()))

    if action == "corrupt_id":
        # n_tok no longer equals len(tokens) — corrupt_id analog :46-49
        nt = cols["n_tok"].to_numpy(zero_copy_only=False).copy()
        rows = rng.choice(n, size=min(k, n), replace=False)
        nt[rows] = nt[rows] + 1
        return rebuild(n_tok=pa.array(nt, pa.int32()))

    if action == "out_of_range":
        # n_tok = 999999 with tokens resized to match (matchday 999
        # analog :50-53) — range violated, len consistent
        rows = sorted(rng.choice(n, size=min(k, n), replace=False).tolist())
        tokens = cols["tokens"].to_pylist()
        nt = cols["n_tok"].to_numpy(zero_copy_only=False).copy()
        for r in rows:
            nt[r] = 999_999
            tokens[r] = (tokens[r] * (999_999 // max(1, len(tokens[r])) + 1))[:999_999]
        return rebuild(
            n_tok=pa.array(nt, pa.int32()),
            tokens=pa.array(tokens, pa.list_(pa.int32())),
        )

    if action == "drop_key":
        # whole column missing — drop_matches_key analog :31-34
        return t.drop_columns(["tokens"])

    if action == "unknown_source":
        src = np.asarray(cols["source"].to_pylist(), dtype=object)
        rows = rng.choice(n, size=min(k, n), replace=False)
        src[rows] = "MUTATED"
        return rebuild(source=pa.array(src.tolist(), pa.string()))

    if action == "vocab_violation":
        # token values outside [0, vocab): negative and >= vocab on k
        # rows; lengths unchanged so ONLY the vocab-range sub-check
        # fires (the matchday-out-of-range analog applied per token)
        rows = sorted(rng.choice(n, size=min(k, n), replace=False).tolist())
        tokens = cols["tokens"].to_pylist()
        for j, r in enumerate(rows):
            if tokens[r]:
                tokens[r] = list(tokens[r])
                tokens[r][0] = -7 if j % 2 == 0 else 2_000_000_000
        return rebuild(tokens=pa.array(tokens, pa.list_(pa.int32())))

    if action == "shift_distribution":
        # +512 to n_tok and pad tokens on ~30% of one source's rows —
        # the drift analog of the mart snapshot diff
        src = np.asarray(cols["source"].to_pylist(), dtype=object)
        candidates = np.flatnonzero(src == "web")
        rows = set(
            candidates[rng.random(len(candidates)) < 0.3].tolist()
        )
        tokens = cols["tokens"].to_pylist()
        nt = cols["n_tok"].to_numpy(zero_copy_only=False).copy()
        for r in rows:
            pad = rng.integers(0, 50257, size=512, dtype=np.int32)
            tokens[r] = tokens[r] + pad.tolist()
            nt[r] = nt[r] + 512
        return rebuild(
            n_tok=pa.array(nt, pa.int32()),
            tokens=pa.array(tokens, pa.list_(pa.int32())),
        )

    if action == "swap_like":
        # reverse token arrays on k rows: semantically corrupted but
        # schema/stats-invisible (swap_teams analog :54-92)
        rows = set(rng.choice(n, size=min(k, n), replace=False).tolist())
        tokens = cols["tokens"].to_pylist()
        for r in rows:
            tokens[r] = tokens[r][::-1]
        return rebuild(tokens=pa.array(tokens, pa.list_(pa.int32())))

    raise AssertionError(action)
