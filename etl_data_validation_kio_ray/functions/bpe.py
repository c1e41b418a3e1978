"""Byte-pair-encoding merge learning (tokenizer training) over a
distributed corpus.

The classic algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public) learns merges
from the WORD-FREQUENCY dictionary, not the raw corpus: the distributed
part of the job is exact word counting (one bucketed exchange, the same
kernel the top-words queries use), after which the dictionary — capped
at top-V words by (count DESC, word ASC), cap logged loudly — fits the
driver at any corpus size, and merge learning is a deterministic
driver-side loop over it.

Determinism contract: pair selection breaks count ties by (left ASC,
right ASC), so the merge sequence is a pure function of the word-count
table; two runs over different block layouts produce identical merges.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

END = "</w>"  # end-of-word sentinel, per the public BPE formulation


def learn_merges(
    word_counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from (word, count) pairs.
    Returns [(left, right, pair_count)] in merge order. Pure driver
    code over the bounded dictionary; O(num_merges x dict symbols)."""
    # symbol sequences per word; counts as Python ints (exact)
    seqs: list[list[str]] = [list(w) + [END] for w, _ in word_counts]
    freqs: list[int] = [int(c) for _, c in word_counts]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for seq, f in zip(seqs, freqs):
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 1:
            break
        merges.append((left, right, cnt))
        joined = left + right
        for seq in seqs:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == left and seq[i + 1] == right:
                    seq[i : i + 2] = [joined]
                else:
                    i += 1
    return merges


def bpe_merges_from_dataset(
    ds,
    *,
    text_col: str = "text",
    num_merges: int = 30,
    top_v: int = 5000,
) -> "list[tuple[str, str, int]]":
    """Distributed word counting -> driver-side merge learning. The
    top-``top_v`` cap keeps the driver dictionary bounded; when it
    truncates, the drop is LOGGED with the dropped mass (no silent
    caps)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..pipelines.relational import bucketed_group_agg

    def counts(t: pa.Table) -> pa.Table:
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern(
            pc.utf8_lower(pc.fill_null(text, "")), " "
        )
        flat = pc.list_flatten(words)
        g = (
            pa.table({"word": flat})
            .filter(pc.not_equal(flat, ""))
            .group_by("word")
            .aggregate([("word", "count")])
        )
        return pa.table(
            {"word": g["word"], "tf": g["word_count"].cast(pa.int64())}
        )

    freqs = bucketed_group_agg(
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True),
        "word",
        [("tf", "sum")],
    ).materialize()
    n_words = freqs.count()
    top = (
        freqs.sort(["tf", "word"], descending=[True, False])
        .limit(top_v)
        .to_pandas()
    )
    if n_words > top_v:
        logger.warning(
            "bpe_merges: word dictionary truncated %d -> %d (tail mass "
            "excluded from merge learning)",
            n_words,
            top_v,
        )
    wc = list(zip(top["word"].tolist(), top["tf"].tolist()))
    return learn_merges(wc, num_merges)
