"""Physical-sanity guards over the committed benchmark artifacts.

Round 2 shipped an MFU.json row claiming 541% of peak — the exact class of
error these tests make impossible to re-commit: every benchmark JSON at the
repo root must satisfy its own physics (utilization < 1, p50 <= p99,
efficiency near-linear at most, measured time >= its FLOP bound when the
row claims to be flops-bound). Pure file checks — no device, no network.
"""

import json
import math
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(ROOT, name)
    if not os.path.isfile(path):
        pytest.skip(f"{name} not present")
    with open(path) as f:
        return json.load(f)


def test_mfu_rows_physically_possible():
    d = _load("MFU.json")
    assert d["rows"], "MFU.json has no rows"
    for r in d["rows"]:
        assert r["valid"] is True, f"invalid row committed: d{r['d_model']}"
        assert 0.0 < r["mfu"] < 1.0, f"impossible MFU {r['mfu']}"
        if "mfu_vs_measured_matmul" in r:
            assert 0.0 < r["mfu_vs_measured_matmul"] < 1.0
        # a step can never be faster than its own FLOP lower bound
        bound_s = r["flop_bound_ms"] * 1e-3
        assert r["step_s"] >= 0.95 * bound_s, (
            f"d{r['d_model']}: step_s {r['step_s']} beats its FLOP bound "
            f"{bound_s} — timing did not synchronize")
        # the fetch clock can never be FASTER than block_until_ready for
        # the same work (fetch includes the transfer); the reverse gap is
        # allowed — it is exactly the tunnel's early-ack failure mode that
        # fetch timing exists to defeat, and the fetch number stays honest
        if r.get("step_s_blocks_fetch") and r.get(
                "step_s_blocks_block_until_ready"):
            f0 = min(r["step_s_blocks_fetch"])
            b0 = min(r["step_s_blocks_block_until_ready"])
            assert f0 >= b0 * 0.95, (
                f"d{r['d_model']}: fetch clock {f0} beat block_until_ready "
                f"{b0} — physically impossible")
        # half-K block must scale ~linearly with K (no hidden fixed cost
        # inside the scan, no elided iterations)
        if "k_scaling_ratio_halfK" in r:
            assert 0.8 < r["k_scaling_ratio_halfK"] < 1.25


def test_mfu_regime_labels_match_bounds():
    d = _load("MFU.json")
    for r in d["rows"]:
        max_bound_ms = max(r["flop_bound_ms"], r["hbm_bound_ms"])
        step_ms = r["step_s"] * 1e3
        if r["regime"].startswith("overhead-bound"):
            assert step_ms > 3 * max_bound_ms
        elif r["regime"].startswith("flops-bound"):
            assert r["flop_bound_ms"] >= r["hbm_bound_ms"]
            assert step_ms <= 3 * r["flop_bound_ms"]


def test_flash_ab_rows_mutually_consistent():
    d = _load("FLASH_AB.json")
    for r in d["rows"]:
        for k, v in r.items():
            if k.endswith("_ms"):
                assert v > 0, f"{r['shape']}: {k} nonpositive"
        # fwd+bwd can never be faster than fwd alone on the same path
        assert r["xla_fwdbwd_ms"] >= r["xla_fwd_ms"]
        assert r["flash_fwdbwd_ms"] >= r["flash_fwd_ms"]
        # recorded speedups must equal the ratios they summarize
        assert math.isclose(r["fwdbwd_speedup"],
                            r["xla_fwdbwd_ms"] / r["flash_fwdbwd_ms"],
                            rel_tol=0.02)


def test_scaling_efficiencies_sane():
    d = _load("SCALING.json")
    for pt in d["points"] + d.get("cache_resident_points", []):
        for key in ("tokenize_efficiency", "vocab_efficiency"):
            assert 0.05 < pt[key] < 1.3, (
                f"N={pt['n_hosts']}: {key}={pt[key]} outside any "
                f"physically plausible weak-scaling band")
        # work-only clock must not exceed the barrier-inclusive one
        if "t_tok_incl_barrier_s" in pt:
            assert pt["t_tok_s"] <= pt["t_tok_incl_barrier_s"] * 1.001
    # the STREAM ceiling must bound the achieved tokenize traffic
    stream4 = next((s for s in d["stream_dram_ceiling"]
                    if s["n_procs"] == max(p["n_hosts"]
                                           for p in d["points"])), None)
    if stream4:
        biggest = max(d["points"], key=lambda p: p["n_hosts"])
        achieved = sum(biggest["tok_achieved_gb_per_s_per_host"])
        assert achieved <= stream4["aggregate_gb_per_s"] * 1.1


def test_serve_bench_percentiles_ordered():
    d = _load("SERVE_BENCH.json")
    fams = {f["family"] for f in d["families"]}
    assert fams == {"ibtt", "agtt", "mpnn", "ggps"}
    for fam in d["families"]:
        for r in fam["rows"]:
            assert r["warm_p50_ms"] <= r["warm_p99_ms"]
            assert r["cold_first_call_ms"] >= r["warm_p50_ms"]
            expect = r["batch"] / (r["warm_p50_ms"] * 1e-3)
            assert math.isclose(r["graphs_per_s_at_p50"], expect,
                                rel_tol=0.05)


def test_epd_sweep_monotone_amortization():
    d = _load("EPD_SWEEP.json")
    by_cfg = {}
    for r in d["rows"]:
        by_cfg.setdefault(r["config"], []).append(r)
    for cfg, rows in by_cfg.items():
        rows.sort(key=lambda r: r["epochs_per_dispatch"])
        steadies = [r["steady_epoch_s"] for r in rows]
        # dispatch amortization can plateau but must never make epochs
        # MUCH slower at higher K
        for a, b in zip(steadies, steadies[1:]):
            assert b <= a * 1.15, f"{cfg}: steady epoch grew {a}->{b}"
        assert steadies[-1] < steadies[0], f"{cfg}: no amortization at all"
