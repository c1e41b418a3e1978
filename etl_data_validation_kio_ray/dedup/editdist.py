"""Edit-distance verification of near-duplicate candidate pairs — the
character-level confirmation step of a fuzzy-dedup pipeline (exact hash
/ MinHash / SimHash / n-gram Jaccard / embedding cosine find CANDIDATE
pairs; Levenshtein distance is the precise, order-sensitive verdict on
each). Distance semantics match DuckDB's ``levenshtein`` exactly: unit-cost
insert/delete/substitute over UTF-8 BYTES (verified empirically —
DuckDB counts byte edits, not code points; identical on ASCII, where
this corpus lives), so the SQL twin is bit-exact.

Scale contract: the pair list is RESULT-proportional (bounded by the
upstream miner's caps), not corpus-proportional — same driver-side
bound as the MinHash pair-formation stage, enforced loudly via
``MAX_PAIRS``. Only the texts of docs that appear in a pair are
gathered (one broadcast id-set membership pass over the corpus; the
corpus itself never leaves the workers).

Reference analog: the reference's duplicate-detection rule family
(/root/reference/src/app2/validators/dds rules) at string-edit
granularity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Loud driver-side bound, same contract as dedup/minhash.py's
# MAX_CANDIDATE_ROWS: verification cost is |pairs| * O(len^2), and the
# text gather is 2*|pairs| rows — raise, never truncate silently.
MAX_PAIRS = 100_000


def _bytes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-8"), dtype=np.uint8)


def levenshtein(a: str, b: str) -> int:
    """Unit-cost Levenshtein over UTF-8 bytes (DuckDB semantics), one
    vectorized DP row per byte of ``a``: the sequential insertion chain
    cur[j] = min(cur[j], cur[j-1]+1) is a prefix-min with slope 1, i.e.
    ``arange + minimum.accumulate(cur - arange)`` — no per-cell Python."""
    if a == b:
        return 0
    ab = _bytes(a)
    bb = _bytes(b)
    if not len(ab):
        return len(bb)
    if not len(bb):
        return len(ab)
    m = len(bb)
    ar = np.arange(m + 1, dtype=np.int64)
    prev = ar.copy()
    for i, ca in enumerate(ab, 1):
        sub = prev[:-1] + (bb != ca)
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        cur[1:] = np.minimum(prev[1:] + 1, sub)
        cur = ar + np.minimum.accumulate(cur - ar)
        prev = cur
    return int(prev[-1])


def edit_distance_for_pairs(
    ds,
    pairs: pd.DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> pd.DataFrame:
    """Attach ``lev`` (plus char lengths ``len_a``/``len_b``) to each
    candidate pair. ``pairs`` is a small driver-side frame from an
    upstream miner (MinHash, n-gram Jaccard, embedding LSH); texts are
    gathered via ONE broadcast id-set membership pass over ``ds``."""
    import ray

    if len(pairs) > MAX_PAIRS:
        raise ValueError(
            f"edit_distance_for_pairs: {len(pairs)} pairs exceeds "
            f"MAX_PAIRS={MAX_PAIRS}; tighten the upstream miner's "
            "threshold/caps or shard the pair list"
        )
    if len(pairs) == 0:
        return pd.DataFrame(
            {
                a_col: pd.Series([], dtype="int64"),
                b_col: pd.Series([], dtype="int64"),
                "len_a": pd.Series([], dtype="int64"),
                "len_b": pd.Series([], dtype="int64"),
                "lev": pd.Series([], dtype="int64"),
            }
        )
    need = np.unique(
        np.concatenate(
            [pairs[a_col].to_numpy(np.int64), pairs[b_col].to_numpy(np.int64)]
        )
    )
    need_ref = ray.put(pa.array(need, pa.int64()))

    def gather(t: pa.Table) -> pa.Table:
        ids = ray.get(need_ref)
        mask = pc.is_in(t[id_col], value_set=ids)
        return t.filter(mask).select([id_col, text_col])

    texts = ds.map_batches(
        gather, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # bounded: <= 2 * |pairs| rows
    lut = dict(zip(texts[id_col].astype("int64"), texts[text_col]))
    missing = [i for i in need.tolist() if i not in lut]
    if missing:
        raise KeyError(
            f"edit_distance_for_pairs: pair ids absent from corpus: "
            f"{missing[:5]}{'...' if len(missing) > 5 else ''}"
        )
    av = pairs[a_col].to_numpy(np.int64)
    bv = pairs[b_col].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            a_col: av,
            b_col: bv,
            "len_a": np.array([len(lut[i]) for i in av], np.int64),
            "len_b": np.array([len(lut[i]) for i in bv], np.int64),
            "lev": np.array(
                [levenshtein(lut[x], lut[y]) for x, y in zip(av, bv)], np.int64
            ),
        }
    )
    return out.sort_values([a_col, b_col]).reset_index(drop=True)
