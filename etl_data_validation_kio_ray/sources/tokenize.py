"""Deterministic word tokenizer over the ``documents`` table.

Analog of the reference's E-stage flattening of raw payloads into typed
rows (/root/reference/src/app2/dds/load_dds.py:18-176 — JSON extraction
projections): here the "extraction" turns free text into the engine's
canonical tokenized-sequence schema
(doc_id:string, tokens:list<int32>, n_tok:int32, source:string).

The token function is intentionally SQL-mirrorable so a DuckDB oracle
can verify per-row token-array equality (the north-rule invariant):

    token(word) = (utf8_length(word) * 2654435761) % 50257

Fully vectorized: split -> flatten -> utf8_length on the flat child ->
int64 multiply/mod in numpy -> rebuild the ListArray on the original
offsets. No Python loop touches a row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_MULTIPLIER = 2654435761
VOCAB_SIZE = 50257

# DuckDB mirror of tokenize_batch (kept adjacent so they evolve together).
TOKENIZE_SQL = """
SELECT
  CAST(doc_id AS VARCHAR) AS doc_id,
  list_transform(
    string_split(text, ' '),
    w -> CAST((length(w) * 2654435761) % 50257 AS INTEGER)
  ) AS tokens,
  CAST(length(string_split(text, ' ')) AS INTEGER) AS n_tok,
  source
FROM documents
""".strip()


def tokenize_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text, source) -> (doc_id, tokens, n_tok, source)."""
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern(text, " ")  # list<string>, keeps empties
    flat = pc.list_flatten(words)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    tok = ((lens * TOKEN_MULTIPLIER) % VOCAB_SIZE).astype(np.int32)
    tokens = pa.ListArray.from_arrays(words.offsets, pa.array(tok))
    n_tok = pc.cast(pc.list_value_length(words), pa.int32())
    doc_id = pc.cast(batch["doc_id"], pa.string())
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": n_tok,
            "source": batch["source"],
        }
    )


def tokenize_documents(ds):
    """Dataset of documents rows -> Dataset in canonical token schema."""
    return ds.map_batches(tokenize_batch, batch_format="pyarrow", zero_copy_batch=True)
