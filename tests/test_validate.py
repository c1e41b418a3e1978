"""End-to-end validation pipeline vs the single-process oracle."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from etl_data_validation_kio_ray.pipelines.validate import ValidationPipeline
from etl_data_validation_kio_ray.sources.synth import (
    generate_token_table,
    make_partition,
)

from .oracle import load_df, oracle_violations

ALLOWED = ["web", "books", "code", "wiki"]  # forums absent (FIXTURES.md F2)


def violations_df(result) -> pd.DataFrame:
    t = result.violations()
    return pd.DataFrame({c: t[c].to_pylist() for c in t.column_names})


def assert_violations_equal(engine_df: pd.DataFrame, oracle_df: pd.DataFrame):
    e = engine_df.reset_index(drop=True)
    o = oracle_df.reset_index(drop=True)
    assert len(e) == len(o), f"{len(e)} engine vs {len(o)} oracle rows"
    pd.testing.assert_frame_equal(e, o, check_dtype=False)


def test_clean_table_verdicts(ray_session, tiny_table, tmp_path):
    pipe = ValidationPipeline(allowed_sources=ALLOWED, shard_size=2)
    res = pipe.run(tiny_table, str(tmp_path / "run"))
    assert len(res.partitions) == 4
    # clean data: only source_ref fails (forums rows exist by skew)
    by_rule = {}
    for c in res.verdicts:
        by_rule.setdefault(c.rule_id, []).append(c)
    assert all(c.status == "PASS" for c in by_rule["schema_types"])
    assert all(c.status == "PASS" for c in by_rule["row_invariants"])
    assert all(c.status == "PASS" for c in by_rule["doc_id_unique"])
    srcs = by_rule["source_ref"]
    assert any(c.status == "FAIL" for c in srcs)  # ~1% forums rows

    oracle = oracle_violations(tiny_table, allowed_sources=ALLOWED)
    assert_violations_equal(violations_df(res), oracle)

    # engine counts match oracle per rule
    eng_counts = {
        (c.partition, c.rule_id): c.rows_failed
        for c in res.verdicts
        if c.rule_id == "source_ref"
    }
    want = (
        oracle[oracle.rule_id == "source_ref"]
        .groupby("partition")
        .size()
        .to_dict()
    )
    for part in res.partitions:
        assert eng_counts[(part, "source_ref")] == want.get(part, 0)


def test_exact_stats_match_oracle(ray_session, tiny_table, tmp_path):
    pipe = ValidationPipeline(allowed_sources=ALLOWED)
    res = pipe.run(tiny_table, str(tmp_path / "run"))
    df = load_df(tiny_table)
    g = res.metrics["global"]
    assert g["rows_total"] == len(df)
    assert g["n_tok"]["min"] == int(df.n_tok.min())
    assert g["n_tok"]["max"] == int(df.n_tok.max())
    assert g["n_tok"]["sum"] == int(df.n_tok.sum())
    # exact counting-hist quantiles == duckdb quantile_disc
    import duckdb

    con = duckdb.connect()
    con.register("t", df[["n_tok"]])
    for q, key in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
        want = con.execute(f"SELECT quantile_disc(n_tok, {q}) FROM t").fetchone()[0]
        assert g["n_tok"][key] == want
    # HLL estimate close to exact cardinality
    assert abs(g["doc_id_cardinality_est"] - df.doc_id.nunique()) / len(df) < 0.05
    # t-digest agrees with exact quantiles within tolerance
    assert abs(g["n_tok_tdigest"]["p50"] - df.n_tok.quantile(0.5)) <= max(
        2.0, 0.02 * df.n_tok.quantile(0.5)
    )


def test_resume_skips_completed(ray_session, tiny_table, tmp_path):
    out = str(tmp_path / "run")
    pipe = ValidationPipeline(allowed_sources=ALLOWED, shard_size=2)
    res1 = pipe.run(tiny_table, out)
    v1 = violations_df(res1)
    mtimes = {
        f: os.path.getmtime(os.path.join(out, "_manifests", f))
        for f in os.listdir(os.path.join(out, "_manifests"))
    }
    res2 = pipe.run(tiny_table, out, resume=True)  # no pending work
    v2 = violations_df(res2)
    pd.testing.assert_frame_equal(v1, v2)
    # narrow-pass shard outputs were not rebuilt (same stats re-read)
    assert res2.metrics["global"]["rows_total"] == res1.metrics["global"]["rows_total"]


def test_batching_invariance(ray_session, tiny_table, tmp_path):
    """Violations identical regardless of batch size / shard grouping."""
    a = ValidationPipeline(allowed_sources=ALLOWED, shard_size=1, batch_size=64).run(
        tiny_table, str(tmp_path / "a")
    )
    b = ValidationPipeline(allowed_sources=ALLOWED, shard_size=4, batch_size=997).run(
        tiny_table, str(tmp_path / "b")
    )
    pd.testing.assert_frame_equal(violations_df(a), violations_df(b))


def test_generator_determinism(tmp_path):
    t1 = make_partition(3, 100)
    t2 = make_partition(3, 100)
    assert t1.equals(t2)
    # per-row token-array equality of generated vs re-generated data
    assert t1["tokens"].to_pylist() == t2["tokens"].to_pylist()
