"""PII detection / redaction batch functions (email, phone, IPv4).

A training-data pipeline scrubs personal data before a corpus ships.
This module implements the standard regex family as vectorized Arrow
RE2 kernels — `pc.count_substring_regex` for per-row match counts and
`pc.replace_substring_regex` for global redaction — so scrubbing runs
inside `map_batches` with zero Python-per-row work and composes with
`grouped_agg` for the (tiny) per-group audit report.

The patterns deliberately stay inside the RE2 subset (no lookarounds,
no backreferences) so the DuckDB oracle — `regexp_extract_all` /
`regexp_replace(..., 'g')`, also RE2 — matches bit-for-bit: same
non-overlapping match semantics, same replacement order.

Reference analog: the reference validates payload fields against
format rules (/root/reference/src/app2/etl_validation/checks.py
regex/format checks); redaction extends that family into the
training-data scrub the north star lists.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Applied in THIS order on both engines. Replacement tokens contain no
# digits or '@', so an earlier redaction can never create or destroy a
# later pattern's match (email bodies may contain dotted digit runs
# that would otherwise read as IPv4).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # 2-3 digit country/area prefix then 3-3-4 groups (covers the
    # TPC-H c_phone shape NN-NNN-NNN-NNNN)
    "phone": (r"\b\d{2,3}-\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


def _as_string(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def pii_counts(text: pa.Array) -> dict[str, pa.Array]:
    """Non-overlapping match count per row for each PII kind (int64,
    null text counts as 0)."""
    text = _as_string(text)
    out = {}
    for kind, (pat, _) in PII_PATTERNS.items():
        c = pc.count_substring_regex(text, pattern=pat)
        out[kind] = pc.fill_null(pc.cast(c, pa.int64()), 0)
    return out


def redact(text: pa.Array) -> pa.Array:
    """Global redaction, all kinds, in PII_PATTERNS order."""
    text = _as_string(text)
    for pat, token in PII_PATTERNS.values():
        text = pc.replace_substring_regex(text, pattern=pat, replacement=token)
    return text


def scrub_table(
    batch: pa.Table, cols: list[str], keep: list[str] | None = None
) -> pa.Table:
    """Redact ``cols`` in place and append per-row audit columns:
    ``{kind}_n`` (matches summed across the scrubbed columns) and
    ``redacted_chars`` (total post-redaction length of the scrubbed
    columns — shrinks when a long email gives way to ``[EMAIL]``).
    ``keep`` limits the passthrough columns (default: all others)."""
    names = keep if keep is not None else [c for c in batch.column_names]
    out: dict[str, pa.Array] = {}
    totals: dict[str, pa.Array] = {}
    red_chars = None
    for col in cols:
        counts = pii_counts(batch[col])
        for kind, arr in counts.items():
            totals[kind] = arr if kind not in totals else pc.add(totals[kind], arr)
        r = redact(batch[col])
        out[col] = r
        ln = pc.fill_null(pc.cast(pc.utf8_length(r), pa.int64()), 0)
        red_chars = ln if red_chars is None else pc.add(red_chars, ln)
    for c in names:
        if c not in out:
            out[c] = _as_string(batch[c])
    for kind, arr in totals.items():
        out[f"{kind}_n"] = arr
    out["redacted_chars"] = red_chars
    return pa.table(out)
