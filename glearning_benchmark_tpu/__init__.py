"""glearning_benchmark_tpu — a TPU-native graph-learning benchmark framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
KevinBian107/GLearning-Benchmark reference (PyTorch/PyG, single GPU):
four model families (MPNN/GIN, GraphGPS, IBTT, AGTT) on three tasks
(cycle_check, shortest_path, zinc), built TPU-first:

- compute path: jit/pjit over a ``jax.sharding.Mesh``, dense-adjacency
  message passing on the MXU, masked flash attention (Pallas on TPU),
  whole-corpus tokenize-once pipelines instead of per-batch Python loops;
- data path: a self-contained synthetic graph/task generator (the reference
  depends on three external repos that are git-ignored), byte-compatible
  token grammars, and deterministic vocab construction (the reference's
  ``hash(algo)`` / set-iteration nondeterminism is replaced by stable
  hashing and pinned ordering);
- parallel path: data-parallel sharding + psum-reduced vocab histograms /
  metric aggregation over ICI/DCN (absent entirely in the reference).

Layer map mirrors SURVEY.md: data/ (L0+L1), tokenization/ (L1 serialization),
models/ + ops/ (compute), train/ (L2 unified engine), parallel/ (new), and
train.py (L3 CLI).
"""

__version__ = "0.2.1"
