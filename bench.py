"""Benchmark harness (driver contract + north-rule evidence).

Default mode: `python bench.py`
  ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32), then
  1. headline job — full validation pipeline over a deterministic
     synthetic pre-tokenized corpus (BASELINE.json input_hint shape:
     doc_id, tokens:list<int32>, n_tok, source), reporting
     sequences/sec;
  2. per-query timings of the headline `queries()` pipelines over
     $GRAFT_SF_DIR (default /root/testdata/sf0.1).
  Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "headline_seq_per_s": ..., "headline_rows": ...}

Scaling mode: `python bench.py --scaling`
  Runs the SAME headline job twice in fresh child processes at
  num_cpus=8 and num_cpus=32 (N and 4N) on the same input and prints
  both throughputs + scaling efficiency (north rule: >= 0.8 from N to
  4N). In-sandbox stand-in for two cluster sizes — see BASELINE.md.

Child mode (internal): `python bench.py --child <num_cpus>`
  prints one JSON line {"rows": R, "sec": S, "seq_per_s": T}.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_PARTS = int(os.environ.get("GRAFT_BENCH_PARTS", "32"))
BENCH_ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "62500"))  # 32*62500 = 2M seqs
TOKENS_DIR = f"/tmp/kio_bench_tokens_p{BENCH_PARTS}_r{BENCH_ROWS}"
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# queries() entries timed in default mode — the headline pipelines
# (flagship validation + each distinct physical shape: shuffle dedup,
# groupby agg, explode-histogram, broadcast anti-join, window, ANN,
# minhash near-dup).
BENCH_QUERIES = [
    "validate_verdicts",
    "doc_id_unique_violations",
    "grouped_stats_by_source",
    "token_histogram",
    "exact_dedup",
    "customers_without_orders",
    "mart_kpi_lineitem",
    "events_window",
    "ann_topk",
    "minhash_pairs",
]


def _gen_corpus() -> int:
    """Deterministic synthetic token corpus (cached); returns rows."""
    from etl_data_validation_kio_ray.sources.synth import generate_token_table

    generate_token_table(
        TOKENS_DIR, partitions=BENCH_PARTS, rows_per_partition=BENCH_ROWS, seed=42
    )
    return BENCH_PARTS * BENCH_ROWS


def _headline(num_cpus: int) -> dict:
    """The north-rule job: validate the synthetic pre-tokenized corpus
    (all rules incl. the doc_id-uniqueness shuffle and drift vs a
    baseline snapshot held in actor state)."""
    from etl_data_validation_kio_ray.pipelines.validate import ValidationPipeline

    rows = _gen_corpus()
    snap_dir = os.path.join(TOKENS_DIR + "_state", "snapshot")
    pipe = ValidationPipeline(allowed_sources=["web", "books", "code", "wiki"])
    if not os.path.exists(os.path.join(snap_dir, "snapshot.pkl")):
        pipe.build_snapshot(TOKENS_DIR, snap_dir)
    out_dir = f"/tmp/kio_bench_run_{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    pipe = ValidationPipeline(
        allowed_sources=["web", "books", "code", "wiki"],
        baseline_snapshot_dir=snap_dir,
    )
    t0 = time.perf_counter()
    res = pipe.run(TOKENS_DIR, out_dir, resume=False)
    sec = time.perf_counter() - t0
    assert len(res.partitions) == BENCH_PARTS, res.partitions
    return {
        "rows": rows,
        "sec": round(sec, 3),
        "seq_per_s": round(rows / sec, 1),
        "phases": res.metrics.get("phases", {}),
    }


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )


def run_child(num_cpus: int) -> None:
    _init_ray(num_cpus)
    out = _headline(num_cpus)
    print(json.dumps(out))


def run_scaling() -> None:
    """Same job, same input, fresh processes at N=8 and 4N=32 CPUs."""
    _gen_corpus()  # build + cache corpus once, outside the timed children
    results = {}
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus)],
            capture_output=True,
            text=True,
            check=False,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr)
            raise SystemExit(f"child at num_cpus={cpus} failed")
        results[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
    t8, t32 = results[8]["seq_per_s"], results[32]["seq_per_s"]
    eff = (t32 / t8) / 4.0
    print(
        json.dumps(
            {
                "metric": "validation throughput scaling, N=8 vs 4N=32 CPUs, fresh sessions",
                "value": round(eff, 3),
                "unit": "scaling_efficiency",
                "rows": results[8]["rows"],
                "throughput_at_8": t8,
                "throughput_at_32": t32,
                "sec_at_8": results[8]["sec"],
                "sec_at_32": results[32]["sec"],
                "efficiency_target": 0.8,
                "pass": eff >= 0.8,
            }
        )
    )


def run_default() -> None:
    _init_ray(NUM_CPUS)
    # fresh caches so every timing below is real work
    shutil.rmtree("/tmp/kio_ray_cache", ignore_errors=True)

    queries: dict[str, float] = {}
    head = _headline(NUM_CPUS)
    queries["validate_synth_corpus"] = head["sec"]

    import __ray_entry__ as entry

    qs = entry.queries()
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        # force lazy Datasets to execute
        if hasattr(res, "count") and not hasattr(res, "columns"):
            res.count()
        elif hasattr(res, "num_rows"):
            pass
        queries[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(queries.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1] if "sf" in SF_DIR else SF_DIR
    print(
        json.dumps(
            {
                "metric": "end-to-end pipeline wall time (validation headline + query suite)",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in queries.items()},
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "num_cpus": NUM_CPUS,
                "headline_rows": head["rows"],
                "headline_seq_per_s": head["seq_per_s"],
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        run_child(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling()
    else:
        run_default()
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
