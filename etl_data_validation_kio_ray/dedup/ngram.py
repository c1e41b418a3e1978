"""Exact n-gram Jaccard similarity for candidate pairs — the verifier
used after MinHash/SimHash candidate generation, and a standalone
all-pairs tool for small inputs."""

from __future__ import annotations

import pandas as pd


def shingles(text: str, k: int = 3) -> set:
    ws = str(text).lower().split(" ")
    return {tuple(ws[i : i + k]) for i in range(max(0, len(ws) - k + 1))}


def jaccard(a: set, b: set) -> float:
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def jaccard_pairs_exact(
    df: pd.DataFrame, text_col="text", id_col="doc_id", *, k=3, threshold=0.8
) -> pd.DataFrame:
    """All-pairs exact n-gram Jaccard (driver-side; for tests and small
    candidate sets — the scale path is minhash_dedup_pairs)."""
    sets = {r[id_col]: shingles(r[text_col], k) for _, r in df.iterrows()}
    ids = sorted(sets)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = jaccard(sets[a], sets[b])
            if j >= threshold:
                rows.append((a, b, j))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])


def cross_corpus_contamination(
    train_ds,
    test_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_partitions: int = 32,
):
    """Train/test contamination check: how many TEST documents share at
    least one exact word-k-gram with the TRAIN corpus — the leakage
    screen an LLM data pipeline runs before holding out an eval set.

    Scale shape: each batch reduces to DISTINCT grams (train side) /
    DISTINCT (doc, gram) pairs (test side) with one Arrow hash-aggregate
    — raw text never rides the exchange, and within-batch repeats are
    collapsed before the shuffle. The sides then meet in ONE
    hash-partitioned semi-join on the gram (``hash_join``), and matched
    test docs are counted with a distinct aggregate. Grams travel as
    exact strings (bit-identical to the SQL twin); for corpora where
    the distinct-gram exchange dominates, the hashed-signature path is
    the MinHash family in this package (collision-free exactness is
    this operator's contract; MinHash trades it for traffic).

    Returns a one-row DataFrame (n_test_docs, n_contaminated): test
    docs with at least one gram (< k words -> no grams, excluded), and
    those sharing a gram with train.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..pipelines.relational import hash_join

    def _grams(t: pa.Table, with_doc: bool) -> pa.Table:
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern(pc.utf8_lower(pc.fill_null(text, "")), " ")
        flat = words.values if not isinstance(words, pa.ChunkedArray) else words.combine_chunks().values
        off = np.asarray(words.offsets, dtype=np.int64)
        off = off - off[0]
        n = len(flat)
        empty_cols = {"g": pa.array([], pa.string())}
        if with_doc:
            empty_cols[id_col] = pa.array([], t[id_col].type)
        if n < k:
            return pa.table(empty_cols)
        parts = [flat.slice(i, n - k + 1) for i in range(k)]
        grams = pc.binary_join_element_wise(*parts, " ")
        valid = np.ones(n - k + 1, dtype=bool)
        # windows straddling a doc boundary: starts s-j for j in 1..k-1
        # (vectorized over boundaries; k-1 passes, never per-document)
        for j in range(1, k):
            b = off[1:-1] - j
            b = b[(b >= 0) & (b <= n - k)]
            valid[b] = False
        cols = {"g": grams.filter(pa.array(valid))}
        if with_doc:
            counts = np.diff(off)
            docidx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
            ids = t[id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            cols[id_col] = ids.take(pa.array(docidx[: n - k + 1][valid]))
        out = pa.table(cols)
        keys = [id_col, "g"] if with_doc else ["g"]
        return out.group_by(keys).aggregate([]).select(list(empty_cols))

    train_grams = train_ds.map_batches(
        lambda t: _grams(t, False), batch_format="pyarrow", zero_copy_batch=True
    )
    # materialized: both the doc count and the join consume it, and the
    # gram extraction is the expensive stage
    test_pairs = test_ds.map_batches(
        lambda t: _grams(t, True), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # per-batch shrink to distinct doc ids, then a global distinct —
    # NOT a per-block count-and-sum: Ray splits large map outputs at
    # arbitrary row offsets (target_max_block_size), so one doc's pairs
    # can straddle blocks and a per-block count would double-count
    def _docs_only(t: pa.Table) -> pa.Table:
        return t.select([id_col]).group_by(id_col).aggregate([])

    n_test = (
        test_pairs.map_batches(
            _docs_only, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(id_col)
        .count()
        .count()
    )
    matched = hash_join(
        test_pairs,
        train_grams,
        on=("g",),
        num_partitions=num_partitions,
    )
    # shrink to per-batch distinct doc ids before the doc-level distinct
    # (a doc's grams match across many partitions)
    matched_docs = matched.map_batches(
        _docs_only, batch_format="pyarrow", zero_copy_batch=True
    )
    n_contaminated = matched_docs.groupby(id_col).count().count()
    import pandas as pd

    return pd.DataFrame(
        {"n_test_docs": [int(n_test)], "n_contaminated": [int(n_contaminated)]}
    )
