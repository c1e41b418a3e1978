"""Run reporting sinks.

Mirrors the reference's exported artifacts:
- summary CSV aggregating ``tech.validation_run``
  (/root/reference/scripts/run_manual_experiments.py:353-415, sample
  /root/reference/output/validation_summary_20260213_093525.csv) —
  here one row per (run, rule_group) from the per-partition manifests;
- plain-text run log export
  (/root/reference/scripts/run_manual_experiments.py:457-536) — here a
  readable report of partition verdicts, failed checks, and metrics.

Both read ONLY the tiny manifest/summary artifacts — never the data.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Any

from .checkpoint import RunState


def _load_summary(run_dir: str) -> dict[str, Any]:
    path = os.path.join(run_dir, "summary.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def summary_rows(run_dir: str) -> list[dict[str, Any]]:
    """One row per (run, rule_group): checks, failures, rows_failed —
    the shape of the reference's validation_summary CSV."""
    state = RunState(run_dir)
    agg: dict[tuple, dict[str, Any]] = defaultdict(
        lambda: {"checks_total": 0, "checks_failed": 0, "rows_failed": 0, "rows_total": 0}
    )
    from ..core.specs import default_rules

    groups = {r.rule_id: r.rule_group for r in default_rules().values()}
    for m in state.all_manifests():
        for c in m.checks:
            group = groups.get(c.get("rule_id"), c.get("rule_id"))
            slot = agg[(group,)]
            slot["checks_total"] += 1
            slot["checks_failed"] += 1 if c.get("status") == "FAIL" else 0
            slot["rows_failed"] += int(c.get("rows_failed", 0))
            slot["rows_total"] = max(slot["rows_total"], int(c.get("rows_total", 0)))
    rows = []
    for (group,), slot in sorted(agg.items()):
        rows.append({"run_dir": run_dir, "rule_group": group, **slot})
    return rows


def write_summary_csv(run_dirs: list[str] | str, out_path: str) -> str:
    """Aggregate one or more runs into a CSV (driver-side; manifest
    data only)."""
    import csv

    if isinstance(run_dirs, str):
        run_dirs = [run_dirs]
    rows: list[dict[str, Any]] = []
    for d in run_dirs:
        rows.extend(summary_rows(d))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fields = ["run_dir", "rule_group", "checks_total", "checks_failed", "rows_failed", "rows_total"]
    tmp = out_path + ".tmp"
    with open(tmp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    os.replace(tmp, out_path)
    return out_path


def run_report(run_dir: str) -> str:
    """Human-readable run report (the DB-log export analog)."""
    state = RunState(run_dir)
    summary = _load_summary(run_dir)
    lines = [
        f"validation run: {run_dir}",
        f"run verdict: {summary.get('run_verdict', '?')}",
        f"duration_s: {summary.get('duration_s', '?')}",
        "",
        "partitions:",
    ]
    for m in state.all_manifests():
        lines.append(
            f"  {m.partition}: {m.status} verdict={m.verdict} "
            f"rows={m.rows_total} attempts={m.attempts}"
        )
        for c in m.checks:
            if c.get("status") != "PASS":
                lines.append(
                    f"    {c.get('rule_id')}: {c.get('status')} "
                    f"rows_failed={c.get('rows_failed')}"
                )
        if m.error:
            lines.append(f"    error: {m.error}")
    g = summary.get("metrics_global") or {}
    if g:
        lines += ["", "global metrics:"]
        for k, v in sorted(g.items()):
            lines.append(f"  {k}: {v}")
    return "\n".join(lines)


def write_run_report(run_dir: str, out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(run_dir, "report.txt")
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(run_report(run_dir) + "\n")
    os.replace(tmp, out_path)
    return out_path
