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
