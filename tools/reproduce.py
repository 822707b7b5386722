#!/usr/bin/env python
"""One-command reproduction of the committed artifact surface (VERDICT r4
next-step #6).

Runs every artifact-generating tool in dependency order, strictly serially
(the dev TPU tunnel is single-client — CLAUDE.md), each step under its own
wall-clock timeout with output teed to reproduce_logs/<step>.log. CPU-only
steps run with the TPU claim disabled (PALLAS_AXON_POOL_IPS=).

    python tools/reproduce.py --list          # show the plan
    python tools/reproduce.py                 # run everything (many hours)
    python tools/reproduce.py --only mfu,bench
    python tools/reproduce.py --from serve    # resume mid-plan

Each step names the artifact files it regenerates, so drift between
STATUS.md claims and artifacts is mechanically checkable: after a full
run, `git status` shows exactly which artifacts changed. The README's
artifact table is generated from THIS table (``--readme-table``).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, argv, artifacts, needs_tpu, timeout_s)
# Order is dependency order: corpora/results first (later steps reuse the
# run dirs + checkpoints), microbenches after, plots/exports last.
STEPS = [
    ("results-full",
     [sys.executable, "tools/run_benchmarks.py", "--set", "full"],
     ["RESULTS.json", "RESULTS.md", "figures_data/"], True, 14400),
    ("results-extended",
     [sys.executable, "tools/run_benchmarks.py", "--set", "extended"],
     ["RESULTS_EXTENDED.json", "RESULTS_EXTENDED.md"], True, 14400),
    ("results-hard",
     [sys.executable, "tools/run_benchmarks.py", "--set", "hard"],
     ["RESULTS_HARD.json", "RESULTS_HARD.md", "figures_data_hard/"],
     True, 14400),
    ("ablations",
     [sys.executable, "tools/ablate_sp.py"],
     ["ABLATIONS.json"], True, 10800),
    ("gine",
     [sys.executable, "tools/gine_runs.py"],
     ["GINE.json"], True, 7200),
    ("pack-ab",
     [sys.executable, "tools/pack_ab.py"],
     ["PACK_AB.json"], True, 7200),
    ("zinc-pack-ab",
     [sys.executable, "tools/zinc_pack_ab.py"],
     ["ZINC_PACK_AB.json"], True, 7200),
    ("flash-ab",
     [sys.executable, "tools/flash_ab.py"],
     ["FLASH_AB.json", "FLASH_AB.rows.jsonl"], True, 7200),
    ("flash-epoch-ab",
     [sys.executable, "tools/flash_epoch_ab.py"],
     ["FLASH_EPOCH_AB.json"], True, 7200),
    ("epd-sweep",
     [sys.executable, "tools/epd_sweep.py"],
     ["EPD_SWEEP.json"], True, 7200),
    ("epd-profile",
     [sys.executable, "tools/epd_profile.py"],
     ["EPD_PROFILE.json"], True, 7200),
    ("roofline",
     [sys.executable, "tools/roofline.py"],
     ["ROOFLINE.json"], True, 3600),
    ("mfu",
     [sys.executable, "tools/mfu_bench.py"],
     ["MFU.json"], True, 10800),
    ("mfu-2048",
     [sys.executable, "tools/mfu_bench.py", "--d-model", "2048",
      "--batch", "16"],
     ["MFU.json"], True, 3600),
    ("mfu-attrib-2048",
     [sys.executable, "tools/mfu_bench.py", "--attrib", "--d-model", "2048",
      "--batch", "16", "--out", "MFU_ATTRIB_2048.json"],
     ["MFU_ATTRIB_2048.json"], True, 10800),
    ("mfu-attrib-1024",
     [sys.executable, "tools/mfu_bench.py", "--attrib", "--d-model", "1024",
      "--batch", "32", "--out", "MFU_ATTRIB_1024.json"],
     ["MFU_ATTRIB_1024.json"], True, 10800),
    ("dropout-microbench",
     [sys.executable, "tools/dropout_microbench.py"],
     ["DROPOUT_MICROBENCH.json"], True, 3600),
    ("mu-ab",
     [sys.executable, "tools/mu_ab.py"],
     ["MU_AB.json"], True, 10800),
    ("zinc-seeds",
     [sys.executable, "tools/zinc_seeds.py"],
     ["ZINC_SEEDS.json"], True, 10800),
    ("zinc-probe",
     [sys.executable, "tools/zinc_target_probe.py"],
     ["ZINC_TARGET_PROBE.json"], True, 10800),
    ("serve",
     [sys.executable, "tools/serve_bench.py", "--rerun"],
     ["SERVE_BENCH.json"], True, 7200),
    ("scaling",
     [sys.executable, "tools/run_benchmarks.py", "--set", "scaling"],
     ["SCALING.json"], False, 7200),
    ("crosscheck-ibtt",
     [sys.executable, "tools/ref_crosscheck.py", "--corpus", "both"],
     ["REF_CROSSCHECK.json"], False, 14400),
    ("crosscheck-r4",
     [sys.executable, "tools/ref_crosscheck.py", "--run", "all-r4"],
     ["REF_CROSSCHECK.json"], False, 14400),
    ("crosscheck-gps",
     [sys.executable, "tools/ref_crosscheck.py", "--run", "all-r5"],
     ["REF_CROSSCHECK.json"], False, 14400),
    ("graph-stats",
     [sys.executable, "tools/graph_stats_report.py"],
     ["GRAPH_STATS.json"], False, 3600),
    ("plots",
     [sys.executable, "tools/plot_results.py"],
     ["figures_out/"], False, 1800),
    ("notebooks",
     [sys.executable, "tools/make_notebooks.py"],
     ["notebooks/"], False, 1800),
    ("bench",
     [sys.executable, "bench.py"],
     ["(stdout north-star JSON line)"], False, 1800),
]


def readme_table() -> str:
    lines = ["| Artifact | Regenerate with | Step |",
             "|---|---|---|"]
    for name, argv, arts, tpu, _ in STEPS:
        cmd = " ".join(a for a in argv[1:])
        pre = "" if tpu else "PALLAS_AXON_POOL_IPS= "
        lines.append(f"| {', '.join(arts)} | `{pre}python {cmd}` | "
                     f"`{name}`{' (TPU)' if tpu else ''} |")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--readme-table", action="store_true",
                    help="print the artifact->command markdown table")
    ap.add_argument("--only", default=None,
                    help="comma-separated step names")
    ap.add_argument("--from", dest="from_step", default=None,
                    help="start at this step (resume)")
    args = ap.parse_args()

    if args.readme_table:
        print(readme_table())
        return
    if args.list:
        for name, argv, arts, tpu, to in STEPS:
            print(f"{name:18s} {'TPU' if tpu else 'cpu'} "
                  f"timeout={to:>6}s -> {', '.join(arts)}")
        return

    only = set(args.only.split(",")) if args.only else None
    started = args.from_step is None
    os.makedirs(os.path.join(ROOT, "reproduce_logs"), exist_ok=True)
    failures = []
    for name, argv, arts, tpu, to in STEPS:
        if not started:
            if name == args.from_step:
                started = True
            else:
                continue
        if only and name not in only:
            continue
        env = dict(os.environ)
        if not tpu:
            env["PALLAS_AXON_POOL_IPS"] = ""   # never claim the tunnel
        log = os.path.join(ROOT, "reproduce_logs", f"{name}.log")
        print(f"[{time.strftime('%H:%M:%S')}] {name}: {' '.join(argv)} "
              f"-> {log}", flush=True)
        with open(log, "w") as lf:
            try:
                rc = subprocess.run(argv, cwd=ROOT, env=env, stdout=lf,
                                    stderr=subprocess.STDOUT,
                                    timeout=to).returncode
            except subprocess.TimeoutExpired:
                rc = -1
                print(f"[{name}] TIMEOUT after {to}s", flush=True)
        if rc != 0:
            failures.append(name)
            print(f"[{name}] FAILED rc={rc} (see {log}) — continuing",
                  flush=True)
    if failures:
        print(f"\nDONE with {len(failures)} failed steps: "
              f"{', '.join(failures)}")
        sys.exit(1)
    print("\nDONE — all steps succeeded; `git status` shows refreshed "
          "artifacts")


if __name__ == "__main__":
    main()
