"""Exact substring (K-token window) deduplication.

The flagship LLM-corpus dedup beyond whole-document hashing: find
every K-token window that occurs two or more times ACROSS the corpus
and report, per document, how many of its window positions carry such
a globally repeated window (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better", arXiv:2107.06499 — their
suffix-array exact-substring scan re-expressed for a partitioned
token table; the reference itself has no token ops, cf. SURVEY.md §2
engine additions).

Scale shape — the established two-pass candidate-scan idiom
(dedup/scan.py, stages/uniqueness.py), never an all-pairs join:

* Pass A streams the (lazily recomputed) token Dataset, computes one
  64-bit hash per window position fully vectorized (K multiply-adds
  over the flat int32 token buffer — no per-row Python), and feeds
  ONLY the hashes into the generic distributed duplicate scan
  (``dup_int64_column``: 12 B/position map-side-bucketed exchange).
* Pass B recomputes the windows, broadcast-probes the candidate hash
  set (``ray.put`` once, ``np.isin`` per batch) and gathers ONLY the
  candidate positions together with their PACKED WINDOW BYTES
  (fixed-size binary, 4*K bytes). The driver-side gather is capped
  loudly (``MAX_CANDIDATE_ROWS``) exactly like the MinHash verify.
* Confirmation groups the candidate rows by exact window CONTENT, so
  a 64-bit hash collision can never create a false positive — the
  same hash-then-confirm exactness contract as doc_id uniqueness.

At 10^12 sequences the exchange carries 12 bytes per token position
(~12 TB for 10^12 x ~1 windows/token — proportional to the corpus but
narrow), and the gather is proportional to the TRUE duplicated-window
volume, which is the quantity being measured.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import _splitmix64

WINDOW_K = 16  # tokens per window (Lee et al. use 50 BPE tokens; the
#                synthetic docs are short, so 16 keeps windows/doc high)
MAX_CANDIDATE_ROWS = 2_000_000  # loud driver gather cap (dedup/scan idiom)
_ROLL_BASE = np.uint64(0x100000001B3)  # FNV-ish odd base for the lane fold


def _window_positions(
    tokens_col,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """ListArray -> (flat int32 tokens, int64 row index per valid
    window start, int64 flat start offset per valid window start,
    int64 WITHIN-document 0-based window position).

    A start offset ``s`` is valid when the whole window
    ``flat[s:s+K]`` lies inside one document.
    """
    if isinstance(tokens_col, pa.ChunkedArray):
        tokens_col = tokens_col.combine_chunks()
    flat = tokens_col.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
    offsets = tokens_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    n_win = np.maximum(counts - WINDOW_K + 1, 0)
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), n_win)
    # flat start offsets: for row d, offsets[d] .. offsets[d] + n_win[d] - 1
    base = np.repeat(offsets[:-1], n_win)
    within = np.arange(len(base), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(n_win)))[:-1], n_win
    )
    return flat, row_idx, base + within, within


def _window_hashes(flat: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """uint64 content hash of each K-window, vectorized: splitmix-mixed
    lanes folded with a Horner polynomial (K shifted multiply-adds over
    the flat buffer; mod 2^64 by natural uint64 wraparound)."""
    if len(starts) == 0:
        return np.empty(0, dtype=np.uint64)
    mixed = _splitmix64(flat.astype(np.uint64))
    h = np.zeros(len(starts), dtype=np.uint64)
    for j in range(WINDOW_K):
        h = h * _ROLL_BASE + mixed[starts + j]
    return _splitmix64(h)


def _window_bytes(flat: np.ndarray, starts: np.ndarray) -> pa.Array:
    """Packed window contents as fixed_size_binary(4*K) — the exact
    confirm key. Vectorized gather into an (m, K) int32 matrix viewed
    as raw little-endian bytes."""
    wtype = pa.binary(4 * WINDOW_K)
    if len(starts) == 0:
        return pa.array([], type=wtype)
    win = flat[starts[:, None] + np.arange(WINDOW_K, dtype=np.int64)[None, :]]
    buf = np.ascontiguousarray(win.astype("<i4")).tobytes()
    return pa.FixedSizeBinaryArray.from_buffers(
        wtype, len(starts), [None, pa.py_buffer(buf)]
    )


def confirmed_dup_positions(
    make_tokens_ds,
    *,
    id_col: str = "doc_id",
    max_rows: int = MAX_CANDIDATE_ROWS,
) -> pd.DataFrame:
    """The shared two-pass scan: returns one row per CONFIRMED
    duplicated window position — DataFrame (``id_col``: str,
    n_tok: int64, pos: int64 0-based within-doc window start) —
    where "confirmed" means the window's exact CONTENT occurs >= 2
    times corpus-wide. Empty (stable dtypes) when nothing repeats.

    ``make_tokens_ds()`` lazily builds a Dataset in the canonical token
    schema; it is called once per pass so nothing full-width is pinned.
    The driver-side gather is capped loudly at ``max_rows``.
    """
    import ray

    from ..stages.uniqueness import dup_int64_column

    def hash_only(t: pa.Table) -> pa.Table:
        flat, _rows, starts, _within = _window_positions(t["tokens"])
        return pa.table(
            {"h": pa.array(_window_hashes(flat, starts).view(np.int64))}
        )

    cand = dup_int64_column(
        make_tokens_ds().map_batches(hash_only, batch_format="pyarrow"), "h"
    )
    empty = pd.DataFrame(
        {
            id_col: pd.Series(dtype=object),
            "n_tok": pd.Series(dtype="int64"),
            "pos": pd.Series(dtype="int64"),
        }
    )
    if cand.num_rows == 0:
        return empty

    cand_sorted = np.sort(cand["h"].to_numpy(zero_copy_only=False))
    cand_ref = ray.put(cand_sorted)

    def keep_candidates(t: pa.Table) -> pa.Table:
        flat, rows, starts, within = _window_positions(t["tokens"])
        h = _window_hashes(flat, starts).view(np.int64)
        cs = ray.get(cand_ref)
        idx = np.searchsorted(cs, h)
        idx[idx == len(cs)] = 0
        mask = cs[idx] == h
        rows, starts, within = rows[mask], starts[mask], within[mask]
        ids = pc.cast(t[id_col], pa.string()).take(pa.array(rows))
        ntok = pc.cast(t["n_tok"], pa.int64()).take(pa.array(rows))
        return pa.table(
            {
                "w": _window_bytes(flat, starts),
                id_col: ids,
                "n_tok": ntok,
                "pos": pa.array(within, pa.int64()),
            }
        )

    gathered = (
        make_tokens_ds()
        .map_batches(keep_candidates, batch_format="pyarrow")
        .to_pandas()
    )
    if len(gathered) > max_rows:
        raise RuntimeError(
            f"{len(gathered)} candidate window positions exceed the driver "
            f"gather cap {max_rows} in the substring-dedup confirm; the "
            "corpus repeats itself pathologically — raise WINDOW_K or "
            "exact-dedup whole documents first"
        )
    if gathered.empty:
        return empty
    # exact confirm: only windows whose CONTENT occurs >= 2 times count
    wc = gathered.groupby("w", sort=False)["w"].transform("size")
    dup = gathered.loc[wc >= 2, [id_col, "n_tok", "pos"]]
    if dup.empty:
        return empty
    return dup.reset_index(drop=True)


def duplicated_window_report(
    make_tokens_ds,
    *,
    id_col: str = "doc_id",
    max_rows: int = MAX_CANDIDATE_ROWS,
) -> pd.DataFrame:
    """Per-document repeated-window report: DataFrame (``id_col``: str,
    n_windows: int64, dup_windows: int64) — one row per document that
    has at least one window whose exact content occurs >= 2 times
    corpus-wide, sorted by ``id_col``. ``n_windows`` = n_tok - K + 1.
    """
    dup = confirmed_dup_positions(
        make_tokens_ds, id_col=id_col, max_rows=max_rows
    )
    if dup.empty:
        return pd.DataFrame(
            {
                id_col: pd.Series(dtype=object),
                "n_windows": pd.Series(dtype="int64"),
                "dup_windows": pd.Series(dtype="int64"),
            }
        )
    per_doc = (
        dup.groupby(id_col, sort=True)
        .agg(n_tok=("n_tok", "first"), dup_windows=("pos", "size"))
        .reset_index()
    )
    return pd.DataFrame(
        {
            id_col: per_doc[id_col].astype(object),
            "n_windows": (per_doc["n_tok"] - WINDOW_K + 1).astype("int64"),
            "dup_windows": per_doc["dup_windows"].astype("int64"),
        }
    )


def duplicated_span_report(
    make_tokens_ds,
    *,
    id_col: str = "doc_id",
    max_rows: int = MAX_CANDIDATE_ROWS,
) -> pd.DataFrame:
    """Per-document LONGEST duplicated span — the quantity Lee et al.
    actually remove: a run of R consecutive duplicated window starts
    covers a span of R + K - 1 tokens. Gaps-and-islands over the
    confirmed positions (pos - rank is constant within a run — the
    same identity the SQL twin uses). Returns (``id_col``: str,
    dup_windows: int64, longest_run: int64, span_tok: int64), one row
    per document with any duplicated window, sorted by ``id_col``."""
    dup = confirmed_dup_positions(
        make_tokens_ds, id_col=id_col, max_rows=max_rows
    )
    if dup.empty:
        return pd.DataFrame(
            {
                id_col: pd.Series(dtype=object),
                "dup_windows": pd.Series(dtype="int64"),
                "longest_run": pd.Series(dtype="int64"),
                "span_tok": pd.Series(dtype="int64"),
            }
        )
    dup = dup.sort_values([id_col, "pos"], kind="mergesort")
    grp = dup["pos"].to_numpy() - dup.groupby(id_col, sort=False).cumcount().to_numpy()
    runs = (
        dup.assign(_g=grp)
        .groupby([id_col, "_g"], sort=False)
        .size()
        .reset_index(name="run_len")
    )
    per_doc = (
        runs.groupby(id_col, sort=True)
        .agg(dup_windows=("run_len", "sum"), longest_run=("run_len", "max"))
        .reset_index()
    )
    return pd.DataFrame(
        {
            id_col: per_doc[id_col].astype(object),
            "dup_windows": per_doc["dup_windows"].astype("int64"),
            "longest_run": per_doc["longest_run"].astype("int64"),
            "span_tok": (per_doc["longest_run"] + WINDOW_K - 1).astype(
                "int64"
            ),
        }
    )
