"""Single-process pandas/duckdb oracle for every rule (FIXTURES.md F5).

Mirrors the reference's own correctness strategy: the same logical
check expressed through an independent mechanism must agree
(cross-tool agreement, SURVEY.md §5.2). Reads the raw partition files
directly and computes verdict counts + violation rows the slow way.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

VIOLATION_COLS = ["rule_id", "doc_id", "partition", "reason"]


def load_parts(table_dir: str) -> dict[str, pd.DataFrame]:
    """partition name -> DataFrame with exactly the columns its file has."""
    out = {}
    for f in sorted(glob.glob(os.path.join(table_dir, "*.parquet"))):
        t = pq.read_table(f)
        df = pd.DataFrame({c: t[c].to_pylist() for c in t.column_names})
        name = os.path.splitext(os.path.basename(f))[0]
        if "partition" not in df.columns:
            df["partition"] = name
        out[df["partition"].iloc[0] if len(df) else name] = df
    return out


def load_df(table_dir: str) -> pd.DataFrame:
    return pd.concat(load_parts(table_dir).values(), ignore_index=True)


def oracle_violations(
    table_dir_or_parts,
    *,
    allowed_sources: list[str] | None = None,
    min_len: int = 1,
    max_len: int = 8192,
    vocab_size: int = 50257,
) -> pd.DataFrame:
    parts = (
        load_parts(table_dir_or_parts)
        if isinstance(table_dir_or_parts, str)
        else table_dir_or_parts
    )
    rows = []

    for part, df in parts.items():
        has_tokens = "tokens" in df.columns

        # schema_types: missing required columns (one row per partition)
        for col in ("doc_id", "tokens", "n_tok", "source"):
            if col not in df.columns:
                rows.append(("schema_types", None, part, f"column '{col}' missing"))

        # schema_types: null doc_id / tokens rows
        for col in ["doc_id"] + (["tokens"] if has_tokens else []):
            for _, r in df[df[col].isna()].iterrows():
                rows.append(("schema_types", r["doc_id"], part, f"{col} is null"))

        if has_tokens:
            ok = df[df["tokens"].notna() & df["n_tok"].notna()]
            lens = ok["tokens"].map(len)
            for _, r in ok[ok["n_tok"] != lens].iterrows():
                rows.append(
                    (
                        "row_invariants",
                        r["doc_id"],
                        part,
                        f"n_tok={r['n_tok']} != len(tokens)={len(r['tokens'])}",
                    )
                )
            bad = df[
                df["n_tok"].notna() & ((df["n_tok"] < min_len) | (df["n_tok"] > max_len))
            ]
            for _, r in bad.iterrows():
                rows.append(
                    (
                        "row_invariants",
                        r["doc_id"],
                        part,
                        f"n_tok={r['n_tok']} out of range [{min_len},{max_len}]",
                    )
                )
            for _, r in ok.iterrows():
                arr = np.asarray(r["tokens"], dtype=np.int64)
                n_bad = int(((arr < 0) | (arr >= vocab_size)).sum())
                if n_bad:
                    rows.append(
                        (
                            "row_invariants",
                            r["doc_id"],
                            part,
                            f"{n_bad} tokens out of vocab range [0,{vocab_size})",
                        )
                    )

        if allowed_sources is not None and "source" in df.columns:
            for _, r in df[~df["source"].isin(allowed_sources)].iterrows():
                rows.append(
                    (
                        "source_ref",
                        r["doc_id"],
                        part,
                        f"source '{r['source']}' not in allowed_sources",
                    )
                )

    # doc_id_unique: global across partitions
    all_df = pd.concat(
        [df for df in parts.values() if "doc_id" in df.columns], ignore_index=True
    )
    counts = all_df["doc_id"].value_counts()
    dups = counts[counts > 1]
    for _, r in all_df[all_df["doc_id"].isin(dups.index)].iterrows():
        rows.append(
            (
                "doc_id_unique",
                r["doc_id"],
                r["partition"],
                f"doc_id appears {int(counts[r['doc_id']])} times",
            )
        )

    out = pd.DataFrame(rows, columns=VIOLATION_COLS)
    out = out.astype(object).where(pd.notna(out), None)  # NaN -> None like Arrow
    return (
        out.sort_values(["rule_id", "doc_id", "reason"], na_position="first")
        .reset_index(drop=True)
    )
