#!/usr/bin/env python
"""Serial benchmark campaign: train reference configurations and record
results (RESULTS.json + RESULTS.md) for comparison against BASELINE.md.

Run detached:  nohup python tools/run_benchmarks.py [--set quick|full] &
One process, runs sequential — the tunneled TPU is single-client. Each run
executes in a watchdog subprocess (``--child``): the tunneled backend's
remote compiles occasionally stall, so a run with no stdout progress for
``--stall-secs`` is killed and retried; the persistent compilation cache
(utils/jaxcache.py) makes completed compiles durable across retries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glearning_benchmark_tpu.utils.config import load_config, normalize_config  # noqa: E402

# (run name, model, config path, overrides)
RUNS_FULL = [
    # cycle_check (train ba+sbm, OOD test sfn) — baselines: MPNN .9961,
    # GPS .9822, AGTT .9727, IBTT .9651 val acc
    ("ibtt-cycle", "ibtt", "configs/ibtt_graph_token.yaml", {}),
    ("mpnn-cycle", "mpnn", "configs/mpnn_graph_token.yaml", {"dataset.num_graphs": 500}),
    ("agtt-cycle", "agtt", "configs/agtt_graph_token.yaml", {"dataset.num_graphs": 500}),
    ("gps-cycle", "ggps", "configs/gps_graph_token.yaml", {"dataset.num_graphs": 500}),
    # shortest_path — IBTT/AGTT train on path; MPNN/GPS on er+sbm+path
    ("ibtt-sp", "ibtt", "configs/ibtt_graph_token.yaml",
     {"dataset.task": "shortest_path", "dataset.train_algorithms": ["path"],
      "dataset.test_algorithm": "er", "train.epochs": 300,
      "train.epochs_per_dispatch": 25, "output.run_name": "ibtt-sp"}),
    ("agtt-sp", "agtt", "configs/agtt_graph_token.yaml",
     {"dataset.task": "shortest_path", "dataset.train_algorithms": ["path"],
      "dataset.test_algorithm": "er", "dataset.num_graphs": 500,
      "train.epochs": 300, "train.epochs_per_dispatch": 25,
      "output.run_name": "agtt-sp"}),
    ("mpnn-sp", "mpnn", "configs/mpnn_graph_token.yaml",
     {"dataset.task": "shortest_path",
      "dataset.train_algorithms": ["er", "sbm", "path"],
      "dataset.test_algorithm": "ba", "dataset.num_graphs": 300,
      "train.epochs": 300, "train.epochs_per_dispatch": 25,
      "output.run_name": "mpnn-sp"}),
    ("gps-sp", "ggps", "configs/gps_graph_token.yaml",
     {"dataset.task": "shortest_path",
      "dataset.train_algorithms": ["er", "sbm", "path"],
      "dataset.test_algorithm": "ba", "dataset.num_graphs": 300,
      "train.epochs": 300, "train.epochs_per_dispatch": 25,
      "output.run_name": "gps-sp"}),
    # zinc (stand-in corpus unless a real export is present)
    ("ibtt-zinc", "ibtt", "configs/ibtt_zinc.yaml",
     {"train.epochs_per_dispatch": 10}),
    ("agtt-zinc", "agtt", "configs/agtt_zinc.yaml",
     {"train.epochs_per_dispatch": 10}),
    ("mpnn-zinc", "mpnn", "configs/mpnn_zinc.yaml",
     {"train.epochs_per_dispatch": 10}),
    ("gps-zinc", "ggps", "configs/gps_zinc.yaml",
     {"train.epochs_per_dispatch": 10}),
]

RUNS_QUICK = [r[:3] + ({**r[3], "train.epochs": 10},) for r in RUNS_FULL[:4]]

# Difficulty-calibrated preset (VERDICT r3 next-step #2): the default corpus
# saturated 10 of 12 headline rows at 0.99-1.000; `dataset.difficulty: hard`
# regenerates the synthetic corpora with the per-algo plan in
# data/generator.py DIFFICULTY_PLANS (near-threshold er, thinned sbm,
# medium+large sizes). cycle_check here trains on er+sbm — near-threshold er
# supplies the balanced hard examples (ba's m∈{1,2} mix is decidable by gross
# edge counts at any size) — and tests OOD on ba (sfn is all-cyclic, i.e.
# single-class, at these sizes). Results land in RESULTS_HARD.json/.md.
_HARD = {"dataset.difficulty": "hard", "dataset.num_graphs": 500,
         "train.epochs_per_dispatch": 10}
_HARD_CYC = {**_HARD, "dataset.train_algorithms": ["er", "sbm"],
             "dataset.test_algorithm": "ba"}
_HARD_SP = {**_HARD, "dataset.task": "shortest_path", "train.epochs": 300,
            "train.epochs_per_dispatch": 25}
RUNS_HARD = [
    ("ibtt-cycle-hard", "ibtt", "configs/ibtt_graph_token.yaml",
     {**_HARD_CYC, "output.run_name": "ibtt-cycle-hard"}),
    ("mpnn-cycle-hard", "mpnn", "configs/mpnn_graph_token.yaml",
     {**_HARD_CYC, "output.run_name": "mpnn-cycle-hard"}),
    ("agtt-cycle-hard", "agtt", "configs/agtt_graph_token.yaml",
     {**_HARD_CYC, "output.run_name": "agtt-cycle-hard"}),
    ("gps-cycle-hard", "ggps", "configs/gps_graph_token.yaml",
     {**_HARD_CYC, "output.run_name": "gps-cycle-hard"}),
    ("ibtt-sp-hard", "ibtt", "configs/ibtt_graph_token.yaml",
     {**_HARD_SP, "dataset.train_algorithms": ["path"],
      "dataset.test_algorithm": "er", "output.run_name": "ibtt-sp-hard"}),
    ("agtt-sp-hard", "agtt", "configs/agtt_graph_token.yaml",
     {**_HARD_SP, "dataset.train_algorithms": ["path"],
      "dataset.test_algorithm": "er", "output.run_name": "agtt-sp-hard"}),
    ("mpnn-sp-hard", "mpnn", "configs/mpnn_graph_token.yaml",
     {**_HARD_SP, "dataset.train_algorithms": ["er", "sbm", "path"],
      "dataset.test_algorithm": "ba", "dataset.num_graphs": 300,
      "output.run_name": "mpnn-sp-hard"}),
    ("gps-sp-hard", "ggps", "configs/gps_graph_token.yaml",
     {**_HARD_SP, "dataset.train_algorithms": ["er", "sbm", "path"],
      "dataset.test_algorithm": "ba", "dataset.num_graphs": 300,
      "output.run_name": "gps-sp-hard"}),
]

# the other eight graph-token task families the reference documents but never
# exercises (docs/synthetic_data.md:29-42) — one row per family, all four
# model families represented; results land in RESULTS_EXTENDED.json/.md
_EXT = {"dataset.num_graphs": 500, "train.epochs": 100,
        "train.epochs_per_dispatch": 10}
RUNS_EXTENDED = [
    # test on er, not the default sfn: BA/Holme-Kim graphs are connected by
    # construction, so a sfn reachability test split is single-class
    ("ibtt-reach", "ibtt", "configs/ibtt_graph_token.yaml",
     {**_EXT, "dataset.task": "reachability", "dataset.test_algorithm": "er",
      "output.run_name": "ibtt-reach"}),
    ("ibtt-edgeexist", "ibtt", "configs/ibtt_graph_token.yaml",
     {**_EXT, "dataset.task": "edge_existence",
      "output.run_name": "ibtt-edgeexist"}),
    ("agtt-maxflow", "agtt", "configs/agtt_graph_token.yaml",
     {**_EXT, "dataset.task": "maximum_flow",
      "output.run_name": "agtt-maxflow"}),
    ("mpnn-degree", "mpnn", "configs/mpnn_graph_token.yaml",
     {**_EXT, "dataset.task": "node_degree", "output.run_name": "mpnn-degree"}),
    ("mpnn-nodecount", "mpnn", "configs/mpnn_graph_token.yaml",
     {**_EXT, "dataset.task": "node_count",
      "output.run_name": "mpnn-nodecount"}),
    # mean pooling is size-invariant, so node_count is architecture-blind at
    # the reference config; the add-pool row shows the task is solvable once
    # the readout can see graph size
    ("mpnn-nodecount-add", "mpnn", "configs/mpnn_graph_token.yaml",
     {**_EXT, "dataset.task": "node_count", "model.pooling": "add",
      "output.run_name": "mpnn-nodecount-add"}),
    ("mpnn-nodeclass", "mpnn", "configs/mpnn_graph_token.yaml",
     {**_EXT, "dataset.task": "node_classification",
      "dataset.train_algorithms": ["sbm"], "dataset.test_algorithm": "sbm",
      "output.run_name": "mpnn-nodeclass"}),
    ("gps-triangle", "ggps", "configs/gps_graph_token.yaml",
     {**_EXT, "dataset.task": "triangle_count",
      "output.run_name": "gps-triangle"}),
    ("gps-edgecount", "ggps", "configs/gps_graph_token.yaml",
     {**_EXT, "dataset.task": "edge_count",
      "output.run_name": "gps-edgecount"}),
]


def apply_overrides(cfg: dict, overrides: dict) -> dict:
    for key, val in overrides.items():
        cur = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = val
    return cfg


def run_one(name: str, model: str, config_path: str, overrides: dict,
            result_path: str) -> None:
    """Child entry: execute one training run, write its result JSON."""
    from glearning_benchmark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from glearning_benchmark_tpu.train.trainer import train

    cfg = normalize_config(load_config(config_path))
    cfg = apply_overrides(cfg, overrides)
    cfg.setdefault("output", {})["run_name"] = name
    t0 = time.time()
    res = train(cfg, model, verbose=True)
    te = {k: (float(v) if not hasattr(v, "tolist") else None)
          for k, v in res.test_metrics.items() if k != "confusion_matrix"}
    epochs = res.history
    # last half only: with epochs_per_dispatch>1 the first block smears its
    # compile time across its epochs' durations
    steady = [h["time/epoch_duration"] for h in epochs[len(epochs) // 2:]] or \
             [h["time/epoch_duration"] for h in epochs]
    out = {
        "model": model,
        "task": cfg["dataset"]["task"],
        "best_val": float(res.best_val),
        "test": te,
        "wall_s": round(time.time() - t0, 1),
        "epochs": len(epochs),
        "steady_epoch_s": round(sum(steady) / max(len(steady), 1), 4),
        "graphs_per_sec": round(max(h["throughput/graphs_per_sec"]
                                    for h in epochs), 1),
    }
    with open(result_path, "w") as f:
        json.dump(out, f)


_current_child = None


def _kill_child(signum=None, frame=None):
    global _current_child
    if _current_child is not None and _current_child.poll() is None:
        _current_child.kill()
    if signum is not None:
        sys.exit(1)


def run_with_watchdog(name, model, config_path, overrides, result_path,
                      stall_secs: int, max_tries: int = 4) -> dict:
    """Run the child under a no-output-progress watchdog with retries."""
    global _current_child
    import subprocess

    payload = json.dumps([name, model, config_path, overrides, result_path])
    for attempt in range(1, max_tries + 1):
        if os.path.exists(result_path):
            os.unlink(result_path)
        log = f"{result_path}.log"
        with open(log, "w") as lf:
            proc = subprocess.Popen(
                [sys.executable, "-u", os.path.abspath(__file__), "--child", payload],
                stdout=lf, stderr=subprocess.STDOUT,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            _current_child = proc
        last_size, last_change = -1, time.time()
        while True:
            rc = proc.poll()
            size = os.path.getsize(log) if os.path.exists(log) else 0
            if size != last_size:
                last_size, last_change = size, time.time()
            if rc is not None:
                break
            if time.time() - last_change > stall_secs:
                print(f"[{name}] attempt {attempt}: stalled "
                      f"({stall_secs}s without output) — killing", flush=True)
                proc.kill()
                proc.wait()
                rc = -9
                break
            time.sleep(5)
        if rc == 0 and os.path.exists(result_path):
            with open(result_path) as f:
                return json.load(f)
        print(f"[{name}] attempt {attempt} failed (rc={rc}); log tail:", flush=True)
        try:
            with open(log) as f:
                print("".join(f.readlines()[-8:]), flush=True)
        except OSError:
            pass
        time.sleep(10)
    return {"model": model, "error": f"failed after {max_tries} attempts"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", default="full",
                    choices=["quick", "full", "scaling", "extended", "hard"])
    ap.add_argument("--only", default=None, help="comma-separated run names")
    ap.add_argument("--out", default="RESULTS.json")
    ap.add_argument("--stall-secs", type=int, default=600)
    ap.add_argument("--rerun", action="store_true",
                    help="re-run entries already present in --out")
    ap.add_argument("--child", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        run_one(*json.loads(args.child))
        return

    import signal
    signal.signal(signal.SIGTERM, _kill_child)
    signal.signal(signal.SIGINT, _kill_child)

    if args.set == "scaling":
        # CPU-only multi-process host-scaling measurement (tokenize graphs/s
        # + vocab-build bytes/s at N=1,2,4) — delegates to scaling_bench.py,
        # which forces JAX_PLATFORMS=cpu in its children (never touches the
        # single-client TPU tunnel)
        import subprocess
        if args.only or args.rerun or args.stall_secs != 600:
            print("[scaling] note: --only/--rerun/--stall-secs do not apply; "
                  "use tools/scaling_bench.py directly for its knobs "
                  "(--mols/--hosts/--reps)", flush=True)
        out = args.out if args.out != "RESULTS.json" else "SCALING.json"
        rc = subprocess.call(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                          "scaling_bench.py"), "--out", out],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        sys.exit(rc)

    if args.set == "extended":
        runs = RUNS_EXTENDED
        if args.out == "RESULTS.json":
            args.out = "RESULTS_EXTENDED.json"
    elif args.set == "hard":
        runs = RUNS_HARD
        if args.out == "RESULTS.json":
            args.out = "RESULTS_HARD.json"
    else:
        runs = RUNS_FULL if args.set == "full" else RUNS_QUICK
    if args.only:
        wanted = set(args.only.split(","))
        runs = [r for r in runs if r[0] in wanted]

    results = {}
    if os.path.isfile(args.out):
        with open(args.out) as f:
            results = json.load(f)

    os.makedirs("/tmp/gbt_runs", exist_ok=True)
    for name, model, config_path, overrides in runs:
        if not args.rerun and name in results and "error" not in results[name]:
            print(f"[{name}] already done — skipping", flush=True)
            continue
        print(f"\n{'='*80}\nRUN {name} ({model})\n{'='*80}", flush=True)
        results[name] = run_with_watchdog(
            name, model, config_path, overrides,
            f"/tmp/gbt_runs/{name}.json", args.stall_secs)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"[{name}] -> {json.dumps(results[name])}", flush=True)

    # markdown summary (sits next to the json: RESULTS.json -> RESULTS.md)
    out_md = os.path.splitext(args.out)[0] + ".md"
    title = {"extended": "# RESULTS — extended task families (TPU)",
             "hard": "# RESULTS — hard difficulty preset "
                     "(dataset.difficulty: hard, TPU)"}.get(
        args.set, "# RESULTS — this framework (TPU)")
    lines = [title, "",
             "| run | model | task | best val | test | steady epoch (s) | graphs/s |",
             "|---|---|---|---|---|---|---|"]
    for name, r in results.items():
        if "error" in r:
            lines.append(f"| {name} | {r['model']} | — | ERROR | {r['error'][:60]} | | |")
            continue
        test_key = "mae" if r["task"] == "zinc" else "accuracy"
        test_val = r["test"].get(test_key)
        lines.append(
            f"| {name} | {r['model']} | {r['task']} | {r['best_val']:.4f} | "
            f"{test_key}={test_val:.4f} | {r['steady_epoch_s']} | {r['graphs_per_sec']} |")
    # standing interpretation notes survive table rewrites
    notes = os.path.splitext(out_md)[0] + "_NOTES.md"
    if args.set == "full" and os.path.isfile("RESULTS_NOTES.md"):
        notes = "RESULTS_NOTES.md"
    if os.path.isfile(notes):
        with open(notes) as f:
            lines += ["", f.read().rstrip()]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {args.out} / {out_md}", flush=True)

    # regenerate the reference-schema W&B CSV exports (figures_data parity;
    # reference figures/README.md:139-153) from whatever run dirs now exist.
    # Difficulty presets export to separate directories — default-preset CSVs
    # are the reference-comparable artifact and must not absorb hard-preset
    # series under the same filenames (ADVICE r4 medium #2).
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from export_csv import DEFAULT_RUN_DIRS, export_all
        dirs = [d for d in DEFAULT_RUN_DIRS if os.path.isdir(d)]
        for difficulty, out_dir in (("default", "figures_data"),
                                    ("hard", "figures_data_hard")):
            written = export_all(dirs, out_dir, difficulty=difficulty)
            if written:
                print(f"wrote {len(written)} {out_dir} CSVs", flush=True)
    except Exception as e:  # export failure must not fail the campaign
        print(f"[warn] figures_data export failed: {e}", flush=True)


if __name__ == "__main__":
    main()
