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
    if len(df) > 20_000:
        raise ValueError(
            f"jaccard_pairs_exact is an O(n^2) driver-side verifier for "
            f"SMALL candidate sets (got {len(df)} rows); use "
            f"minhash_dedup_pairs for the distributed scale path"
        )
    sets = {r[id_col]: shingles(r[text_col], k) for _, r in df.iterrows()}
    ids = sorted(sets)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = jaccard(sets[a], sets[b])
            if j >= threshold:
                rows.append((a, b, j))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])


def semi_join_docs(
    probe_ds,
    build_ds,
    *,
    id_col: str,
    key_col: str = "g",
    num_partitions: int = 32,
):
    """Distributed SEMI-join: the ``id_col`` values of probe rows whose
    ``key_col`` appears anywhere in the build side. One hash-bucketed
    co-group (tagged union on hash(key) % num_partitions), then a
    per-bucket MEMBERSHIP test (``pc.is_in``) of probe keys against the
    bucket's build keys. Because membership is idempotent, duplicate
    build keys — e.g. a Zipfian-hot gram that survives per-batch dedup
    in B different build batches — cannot amplify a probe row B× the
    way an inner join on the key would (the skewed-key join blow-up at
    corpus scale). The build side never needs a global distinct: the
    one exchange here IS the distinct's exchange, minus its reduce.

    Returns a lazy Dataset of per-bucket-distinct ``id_col`` rows: a
    given id appears at most once per bucket (its keys may hash to
    several buckets), so callers do the cheap global distinct.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..pipelines.relational import dataset_arrow_schema, tag_bucket

    id_type = dataset_arrow_schema(probe_ds).field(id_col).type

    def _tag(t: pa.Table, is_probe: bool) -> pa.Table:
        ids = t[id_col] if is_probe else pa.nulls(t.num_rows, id_type)
        cols = pa.table(
            {
                key_col: t[key_col],
                id_col: ids,
                "__p": pa.array(np.full(t.num_rows, is_probe)),
            }
        )
        return tag_bucket(cols, key_col, num_partitions)

    both = build_ds.map_batches(
        lambda t: _tag(t, False), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        probe_ds.map_batches(
            lambda t: _tag(t, True), batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def _semi(g: pa.Table) -> pa.Table:
        p = g["__p"]
        if isinstance(p, pa.ChunkedArray):
            p = p.combine_chunks()
        probe = g.filter(p)
        build_keys = g.filter(pc.invert(p))[key_col]
        if isinstance(build_keys, pa.ChunkedArray):
            build_keys = build_keys.combine_chunks()
        hit = pc.is_in(probe[key_col], value_set=build_keys)
        out = probe.filter(hit).select([id_col])
        return out.group_by(id_col).aggregate([])

    return both.groupby("__b").map_groups(_semi, batch_format="pyarrow")


def gram_occurrences(
    t, *, text_col: str = "text", k: int = 3, carry: list[str] | None = None
):
    """One row per word-k-gram OCCURRENCE in the batch (no dedup):
    column ``g`` (the lowercased space-joined gram) plus each ``carry``
    column taken from the occurrence's row. Fully vectorized: one
    split_pattern over the batch's char buffer, k shifted slices joined
    element-wise, and doc-boundary windows masked with k-1 vectorized
    passes over the offsets — never a per-document Python loop."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    carry = carry or []
    text = t[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern(pc.utf8_lower(pc.fill_null(text, "")), " ")
    flat = (
        words.values
        if not isinstance(words, pa.ChunkedArray)
        else words.combine_chunks().values
    )
    off = np.asarray(words.offsets, dtype=np.int64)
    off = off - off[0]
    n = len(flat)
    empty_cols = {"g": pa.array([], pa.string())}
    for c in carry:
        empty_cols[c] = pa.array([], t[c].type)
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
    vmask = pa.array(valid)
    cols = {"g": grams.filter(vmask)}
    if carry:
        counts = np.diff(off)
        docidx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        take_idx = pa.array(docidx[: n - k + 1][valid])
        for c in carry:
            vals = t[c]
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            cols[c] = vals.take(take_idx)
    return pa.table(cols)


def dup_gram_stats(
    ds,
    *,
    text_col: str = "text",
    group_col: str = "source",
    k: int = 3,
    num_partitions: int | None = None,
):
    """Per-group duplicated-n-gram occurrence counts — the corpus
    quality metric "what fraction of this source's k-gram occurrences
    are duplicated somewhere in the corpus" (within- OR cross-document
    repeats both count; an occurrence is duplicated iff its gram's
    GLOBAL occurrence count is >= 2).

    Scale shape: each batch collapses its occurrences to (g, group,
    cnt) partials with one Arrow hash-aggregate, so the single
    hash-bucket exchange carries distinct-per-batch rows, never one row
    per occurrence. Each bucket owns its grams entirely (hash(g)
    buckets), so the global per-gram total is computable in-bucket;
    the bucket then emits <= |groups| partial rows and the final
    groupby is driver-trivial. Grams travel as exact strings
    (bit-identical to the SQL twin) as in cross_corpus_contamination.

    Returns a lazy Dataset of per-bucket partials (group_col, n_grams,
    dup_grams); callers sum per group (e.g. via relational.grouped_agg).

    Reference analog: the reference's duplicate-detection family
    (/root/reference/src/app2/validators/dds/rules_suite checks) at
    n-gram granularity rather than row granularity.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..pipelines.relational import resolve_num_buckets, tag_bucket

    nb = resolve_num_buckets(ds, num_partitions)

    def _partial(t: pa.Table) -> pa.Table:
        occ = gram_occurrences(t, text_col=text_col, k=k, carry=[group_col])
        part = occ.group_by(["g", group_col]).aggregate([([], "count_all")])
        part = part.rename_columns(["g", group_col, "cnt"])
        return tag_bucket(part, "g", nb)

    def _reduce(g: pa.Table) -> pa.Table:
        cnt = g["cnt"]
        if isinstance(cnt, pa.ChunkedArray):
            cnt = cnt.combine_chunks()
        cnt = pc.cast(cnt, pa.int64())
        tot = g.group_by("g").aggregate([("cnt", "sum")])
        dup_g = tot.filter(pc.greater(tot["cnt_sum"], 1))["g"]
        if isinstance(dup_g, pa.ChunkedArray):
            dup_g = dup_g.combine_chunks()
        isdup = pc.is_in(g["g"], value_set=dup_g)
        dup_cnt = pc.if_else(isdup, cnt, pa.scalar(0, pa.int64()))
        out = pa.table(
            {group_col: g[group_col], "n_grams": cnt, "dup_grams": dup_cnt}
        )
        out = out.group_by(group_col).aggregate(
            [("n_grams", "sum"), ("dup_grams", "sum")]
        )
        return out.rename_columns([group_col, "n_grams", "dup_grams"])

    tagged = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return tagged.groupby("__b").map_groups(_reduce, batch_format="pyarrow")


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
    hash-bucketed co-group (tagged union on hash(g) % num_partitions)
    where the test rows are filtered by MEMBERSHIP (``pc.is_in``)
    against the bucket's train grams — a true semi-join, so a gram
    that survives per-batch dedup in B train batches can never
    multiply a matching test row B× the way an inner join would
    (Zipfian hot grams at corpus scale made that a skewed-key blow-up).
    Grams travel as exact strings (bit-identical to the SQL twin); for
    corpora where the distinct-gram exchange dominates, the
    hashed-signature path is the MinHash family in this package
    (collision-free exactness is this operator's contract; MinHash
    trades it for traffic).

    Returns a one-row DataFrame (n_test_docs, n_contaminated): test
    docs with at least one gram (< k words -> no grams, excluded), and
    those sharing a gram with train.
    """
    import pyarrow as pa

    def _grams(t: pa.Table, with_doc: bool) -> pa.Table:
        carry = [id_col] if with_doc else []
        occ = gram_occurrences(t, text_col=text_col, k=k, carry=carry)
        keys = carry + ["g"]
        return occ.group_by(keys).aggregate([]).select(["g"] + carry)

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
    matched_docs = semi_join_docs(
        test_pairs,
        train_grams,
        id_col=id_col,
        key_col="g",
        num_partitions=num_partitions,
    )
    n_contaminated = matched_docs.groupby(id_col).count().count()
    import pandas as pd

    return pd.DataFrame(
        {"n_test_docs": [int(n_test)], "n_contaminated": [int(n_contaminated)]}
    )
