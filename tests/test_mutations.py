"""Fault-injection detection tests — the reference's dominant
correctness mechanism (SURVEY.md §5.1: 22 mutation iterations with
expected catch/no-catch per suite)."""

import pandas as pd
import pytest

from etl_data_validation_kio_ray.pipelines.validate import ValidationPipeline
from etl_data_validation_kio_ray.sources.mutations import (
    EXPECTED_DETECTION,
    mutate_table,
)

from .oracle import load_df, oracle_violations

ALLOWED = ["web", "books", "code", "wiki", "forums"]  # all clean here


def run_action(action, tiny_table, tmp_path, **pipe_kw):
    mut_dir = str(tmp_path / f"mut_{action}")
    mutate_table(tiny_table, mut_dir, action)
    pipe = ValidationPipeline(allowed_sources=ALLOWED, shard_size=2, **pipe_kw)
    res = pipe.run(mut_dir, str(tmp_path / f"out_{action}"))
    return mut_dir, res


@pytest.mark.parametrize(
    "action",
    [a for a, rule in EXPECTED_DETECTION.items() if rule not in (None, "drift_ks_psi")],
)
def test_mutation_detected_by_expected_rule(ray_session, tiny_table, tmp_path, action):
    expected_rule = EXPECTED_DETECTION[action]
    mut_dir, res = run_action(action, tiny_table, tmp_path)
    failing = {
        c.rule_id for c in res.verdicts if c.status in ("FAIL", "WARN") and c.rows_failed
    }
    assert expected_rule in failing, f"{action}: {expected_rule} not in {failing}"

    # violation rows byte-equal to the oracle
    oracle = oracle_violations(mut_dir, allowed_sources=ALLOWED)
    t = res.violations()
    eng = pd.DataFrame({c: t[c].to_pylist() for c in t.column_names})
    assert len(eng) == len(oracle), (action, len(eng), len(oracle))
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), oracle.reset_index(drop=True), check_dtype=False
    )


def test_swap_like_invisible_to_rules(ray_session, tiny_table, tmp_path):
    """Reversed token arrays (swap_teams analog): schema/stats/ref rules
    must all PASS — only per-row token equality catches it."""
    mut_dir, res = run_action("swap_like", tiny_table, tmp_path)
    assert all(c.status == "PASS" for c in res.verdicts if c.severity == "error")
    # per-row token-array equality against the unmutated table detects it
    clean = load_df(tiny_table).set_index("doc_id")
    mutated = load_df(mut_dir).set_index("doc_id")
    differing = sum(
        list(clean.loc[i, "tokens"]) != list(mutated.loc[i, "tokens"])
        for i in clean.index
    )
    assert differing == 5  # k_rows default


def test_drift_detected(ray_session, tiny_table, tmp_path):
    snap_dir = str(tmp_path / "snap")
    base_pipe = ValidationPipeline(allowed_sources=ALLOWED)
    base_pipe.build_snapshot(tiny_table, snap_dir)

    # unmutated data vs its own snapshot: no drift
    pipe = ValidationPipeline(
        allowed_sources=ALLOWED, baseline_snapshot_dir=snap_dir
    )
    res = pipe.run(tiny_table, str(tmp_path / "clean_run"))
    drift_checks = [c for c in res.verdicts if c.rule_id == "drift_ks_psi"]
    assert drift_checks and all(c.status == "PASS" for c in drift_checks)

    # shifted distribution: drift WARNs on the mutated partition
    mut_dir = str(tmp_path / "mut_shift")
    mutate_table(tiny_table, mut_dir, "shift_distribution")
    res2 = ValidationPipeline(
        allowed_sources=ALLOWED, baseline_snapshot_dir=snap_dir
    ).run(mut_dir, str(tmp_path / "drift_run"))
    drifted = [
        c for c in res2.verdicts if c.rule_id == "drift_ks_psi" and c.status == "WARN"
    ]
    assert drifted, "shift_distribution not flagged by drift_ks_psi"
    assert any(c.partition == "part-0000" for c in drifted)
