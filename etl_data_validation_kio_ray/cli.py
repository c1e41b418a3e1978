"""Job entry point — the ``ray job submit`` launch path.

On a cluster:

    ray job submit --working-dir . -- \
        python -m etl_data_validation_kio_ray.cli validate \
        --input /data/tokens --out /data/validation/run1 \
        --allowed-sources web,books,code,wiki \
        --snapshot /data/validation/baseline --resume

Subcommands:
    validate   run the full validation pipeline (resumable)
    snapshot   build the drift-baseline snapshot from (clean) input
    report     write summary CSV + text report for a finished run

This module OWNS the Ray session (the library never calls ray.init —
driver contract); inside ``ray job submit`` the session attaches to the
running cluster via address="auto" semantics, standalone it starts a
local one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray() -> None:
    import ray

    if ray.is_initialized():
        return
    addr = os.environ.get("RAY_ADDRESS")
    if addr:
        # inside `ray job submit` / an existing cluster
        ray.init(address=addr, ignore_reinit_error=True)
    else:
        # standalone: start a local Ray (address="auto" would raise
        # ConnectionError when no cluster is running)
        ray.init(ignore_reinit_error=True)


def _pipeline(args):
    from .core.specs import default_rules, load_rules
    from .pipelines.validate import ValidationPipeline

    allowed = args.allowed_sources.split(",") if args.allowed_sources else None
    rules = default_rules(allowed_sources=allowed)
    if args.rules_config:
        rules = load_rules(args.rules_config, base=rules)
    return ValidationPipeline(
        rules,
        allowed_sources=allowed,
        baseline_snapshot_dir=args.snapshot,
        shard_size=args.shard_size,
    )


def cmd_validate(args) -> int:
    _init_ray()
    pipe = _pipeline(args)
    res = pipe.run(args.input, args.out, resume=args.resume)
    cross = None
    if args.cross_check:
        # second-executor agreement: re-run every rule's SQL twin in
        # DuckDB over sampled partitions (pipelines/crosscheck.py)
        from .pipelines.crosscheck import cross_check_run

        parts = None
        if args.cross_check_sample and args.cross_check_sample < len(res.partitions):
            parts = sorted(res.partitions)[:: max(
                1, len(res.partitions) // args.cross_check_sample
            )][: args.cross_check_sample]
        agree = cross_check_run(args.input, res, pipe.rules, partitions=parts)
        cross = {
            "checked": int(len(agree)),
            "disagreements": int((~agree.agree).sum()),
        }
        if cross["disagreements"]:
            sys.stderr.write(agree[~agree.agree].to_string() + "\n")
    print(
        json.dumps(
            {
                "run_verdict": res.run_verdict,
                "partitions": len(res.partitions),
                "duration_s": round(res.duration_s, 3),
                "phases": res.metrics.get("phases", {}),
                "out": args.out,
                **({"cross_check": cross} if cross else {}),
            }
        )
    )
    if cross and cross["disagreements"]:
        return 2  # executor disagreement outranks a FAIL verdict
    return 0 if res.run_verdict != "FAIL" or args.exit_zero else 1


def cmd_snapshot(args) -> int:
    _init_ray()
    pipe = _pipeline(args)
    path = pipe.build_snapshot(args.input, args.out)
    print(json.dumps({"snapshot": path}))
    return 0


def cmd_experiment(args) -> int:
    _init_ray()
    from .pipelines.experiment import run_experiment

    def factory():
        return _pipeline(args)

    res = run_experiment(
        args.input,
        args.out,
        actions=args.actions.split(",") if args.actions else None,
        pipeline_factory=factory,
    )
    print(
        json.dumps(
            {
                "all_detected": res.all_detected,
                "iterations": [i.to_dict() for i in res.iterations],
            }
        )
    )
    return 0 if res.all_detected else 1


def cmd_dedup(args) -> int:
    """Incremental cross-run dedup: stream --input through the
    persistent fingerprint index at --index, writing only
    first-ever-seen rows to --out (partitioned parquet). Re-running
    with the same index skips everything already ingested — the
    operational surface of state/dedup_index.py."""
    _init_ray()
    import ray.data as rd

    from .state.dedup_index import DedupIndex

    idx = DedupIndex(num_shards=args.num_shards, path=args.index
                     if os.path.exists(os.path.join(args.index, "index_manifest.json"))
                     else None)
    ds = rd.read_parquet(args.input)
    fresh = idx.filter_new(ds, args.content_cols.split(","))
    # consume EXACTLY once (module contract), counting via metadata
    fresh.write_parquet(args.out)
    # An all-duplicate ingest writes no files at all; count 0 then.
    try:
        written = rd.read_parquet(args.out).count()
    except FileNotFoundError:
        written = 0
    idx.save(args.index)
    print(
        json.dumps(
            {
                "out": args.out,
                "rows_written": int(written),
                "index": args.index,
                "index_fingerprints": idx.total_fingerprints(),
            }
        )
    )
    return 0


def cmd_sample(args) -> int:
    """Deterministic hash-rate downsampling: stream --input through
    functions/sampling.hash_rate_sample with per-group rates given as
    'group=pct' pairs (e.g. --rates web=30,books=80), writing the kept
    rows to --out. Re-running reproduces the identical sample — the
    kept set is a pure function of ids."""
    _init_ray()
    import ray.data as rd

    from .functions.sampling import hash_rate_sample, hash_sample_stats

    rates = {}
    for part in args.rates.split(","):
        g, _, r = part.partition("=")
        if not _ or not r.isdigit():
            raise SystemExit(f"--rates entry {part!r} is not group=pct")
        rates[g] = int(r)
    ds = rd.read_parquet(args.input)
    kept = hash_rate_sample(
        ds, id_col=args.id_col, group_col=args.group_col, rates=rates
    )
    kept.write_parquet(args.out)
    stats = hash_sample_stats(
        rd.read_parquet(args.input),
        id_col=args.id_col,
        group_col=args.group_col,
        rates=rates,
    )
    print(
        json.dumps(
            {
                "out": args.out,
                "groups": {
                    r[args.group_col]: {"n_in": int(r["n_in"]), "n_kept": int(r["n_kept"])}
                    for _, r in stats.iterrows()
                },
            }
        )
    )
    return 0


def cmd_chunk(args) -> int:
    """Context-window chunking plan: explode --input documents into
    sliding token windows (--size tokens overlapping by --overlap) and
    write the per-chunk boundary plan to --out (parquet). Deterministic
    — the plan is a pure per-row function, so re-runs and resumes
    reproduce it bit-for-bit."""
    _init_ray()
    import ray.data as rd

    from .functions.text import sliding_chunk_plan

    ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
    out = ds.map_batches(
        lambda t: sliding_chunk_plan(
            t,
            text_col=args.text_col,
            id_col=args.id_col,
            size=args.size,
            overlap=args.overlap,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out.write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    print(json.dumps({"out": args.out, "n_chunks": int(n)}))
    return 0


def cmd_report(args) -> int:
    from .state.report import write_html_report, write_run_report, write_summary_csv

    csv_path = write_summary_csv(args.run_dir, os.path.join(args.run_dir, "summary.csv"))
    txt_path = write_run_report(args.run_dir)
    html_path = write_html_report(args.run_dir)
    print(
        json.dumps(
            {"summary_csv": csv_path, "report": txt_path, "html": html_path}
        )
    )
    return 0


def cmd_export_rules(args) -> int:
    """Export the effective rule set as a Great Expectations suite
    (json, round-trippable) or Soda checks YAML (core/interchange.py);
    --import-suite loads a GE suite as the base rules first."""
    from .core.interchange import (
        rules_to_soda_checks,
        rules_to_suite,
        suite_to_rules,
    )
    from .core.specs import default_rules, load_rules

    allowed = args.allowed_sources.split(",") if args.allowed_sources else None
    if args.import_suite:
        with open(args.import_suite) as f:
            rules = suite_to_rules(json.load(f))
    else:
        rules = default_rules(allowed_sources=allowed)
    if args.rules_config:
        rules = load_rules(args.rules_config, base=rules)
    if args.format == "gx":
        payload = json.dumps(rules_to_suite(rules), indent=2) + "\n"
    else:
        payload = rules_to_soda_checks(rules)
    with open(args.out, "w") as f:
        f.write(payload)
    print(json.dumps({"out": args.out, "format": args.format, "rules": len(rules)}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_data_validation_kio_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--allowed-sources", default=None, help="comma-separated")
    common.add_argument("--snapshot", default=None, help="drift baseline dir")
    common.add_argument("--rules-config", default=None, help="YAML rule overrides")
    common.add_argument("--shard-size", type=int, default=64)

    v = sub.add_parser("validate", parents=[common])
    v.add_argument("--input", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--resume", action="store_true")
    v.add_argument(
        "--exit-zero", action="store_true", help="exit 0 even on FAIL verdict"
    )
    v.add_argument(
        "--cross-check",
        action="store_true",
        help="re-run every rule's SQL twin in DuckDB and require agreement",
    )
    v.add_argument(
        "--cross-check-sample",
        type=int,
        default=0,
        help="cross-check only N evenly-spaced partitions (0 = all)",
    )
    v.set_defaults(fn=cmd_validate)

    s = sub.add_parser("snapshot", parents=[common])
    s.add_argument("--input", required=True)
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_snapshot)

    e = sub.add_parser("experiment", parents=[common])
    e.add_argument("--input", required=True, help="clean baseline table dir")
    e.add_argument("--out", required=True)
    e.add_argument("--actions", default=None, help="comma-separated subset")
    e.set_defaults(fn=cmd_experiment)

    r = sub.add_parser("report")
    r.add_argument("--run-dir", required=True)
    r.set_defaults(fn=cmd_report)

    d = sub.add_parser("dedup")
    d.add_argument("--input", required=True, help="parquet dir to ingest")
    d.add_argument("--out", required=True, help="first-seen rows land here")
    d.add_argument("--index", required=True, help="persistent index dir")
    d.add_argument("--content-cols", default="text", help="comma-separated")
    d.add_argument("--num-shards", type=int, default=16)
    d.set_defaults(fn=cmd_dedup)

    sm = sub.add_parser("sample")
    sm.add_argument("--input", required=True, help="parquet dir to sample")
    sm.add_argument("--out", required=True, help="kept rows land here")
    sm.add_argument("--rates", required=True, help="group=pct[,group=pct...]")
    sm.add_argument("--id-col", default="doc_id")
    sm.add_argument("--group-col", default="source")
    sm.set_defaults(fn=cmd_sample)

    ck = sub.add_parser("chunk")
    ck.add_argument("--input", required=True, help="parquet dir of documents")
    ck.add_argument("--out", required=True, help="chunk plan lands here")
    ck.add_argument("--size", type=int, default=128)
    ck.add_argument("--overlap", type=int, default=32)
    ck.add_argument("--id-col", default="doc_id")
    ck.add_argument("--text-col", default="text")
    ck.set_defaults(fn=cmd_chunk)

    ex = sub.add_parser("export-rules", parents=[common])
    ex.add_argument("--out", required=True)
    ex.add_argument("--format", choices=("gx", "soda"), default="gx")
    ex.add_argument(
        "--import-suite",
        default=None,
        help="load a Great Expectations suite JSON as the base rules",
    )
    ex.set_defaults(fn=cmd_export_rules)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
