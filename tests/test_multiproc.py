"""Multi-process (N separate OS processes, jax.distributed local
coordinator) vocab builds must be id-identical to the single-process host
builds — the property that makes host-sharded corpora safe
(parallel/multiproc.py)."""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent("""
    import json, os, sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import jax
    if nproc > 1:
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=nproc, process_id=pid)
    sys.path.insert(0, "@REPO@")
    from glearning_benchmark_tpu.data.zinc import _synth_molecule
    from glearning_benchmark_tpu.parallel.data import host_shard_bounds
    from glearning_benchmark_tpu.parallel.multiproc import (
        multiprocess_vocab_build, multiprocess_zinc_vocab)
    from glearning_benchmark_tpu.tokenization.ibtt import tokenize_zinc_molecule

    N_MOLS = 60
    start, end = host_shard_bounds(N_MOLS, pid, nproc)
    mols = [_synth_molecule(4242 + i) for i in range(start, end)]
    zv = multiprocess_zinc_vocab(mols)
    texts = [tokenize_zinc_molecule(m) for m in mols]
    tv, _ = multiprocess_vocab_build(texts)
    print(json.dumps({"pid": pid, "zinc_vocab": zv, "text_vocab": tv}))
""").replace("@REPO@", REPO)


def _run_procs(nproc: int, port: int):
    procs = [subprocess.Popen([sys.executable, "-c", CHILD, str(i),
                               str(nproc), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True) for i in range(nproc)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def test_two_process_vocab_identical_to_host_build():
    from glearning_benchmark_tpu.data.zinc import _synth_molecule
    from glearning_benchmark_tpu.tokenization.ibtt import tokenize_zinc_molecule
    from glearning_benchmark_tpu.tokenization.ibtt_fast import build_zinc_vocab_fast
    from glearning_benchmark_tpu.tokenization.vocab import build_vocab_from_texts

    outs = _run_procs(2, port=29541)
    # every process derived the identical table
    assert outs[0]["zinc_vocab"] == outs[1]["zinc_vocab"]
    assert outs[0]["text_vocab"] == outs[1]["text_vocab"]

    # ... and it equals the single-process build over the global corpus
    mols = [_synth_molecule(4242 + i) for i in range(60)]
    host_zinc = build_zinc_vocab_fast(mols)
    assert outs[0]["zinc_vocab"] == host_zinc
    texts = [tokenize_zinc_molecule(m) for m in mols]
    host_text, _ = build_vocab_from_texts(texts)
    assert outs[0]["text_vocab"] == host_text


def test_single_process_degenerates_to_host_build():
    from glearning_benchmark_tpu.data.zinc import _synth_molecule
    from glearning_benchmark_tpu.parallel.multiproc import multiprocess_zinc_vocab
    from glearning_benchmark_tpu.tokenization.ibtt_fast import build_zinc_vocab_fast

    mols = [_synth_molecule(4242 + i) for i in range(30)]
    assert multiprocess_zinc_vocab(mols) == build_zinc_vocab_fast(mols)
