from .mesh import make_mesh, shard_batch_spec, replicated_spec
from .dist import psum_histogram, distributed_vocab_counts, all_reduce_metrics

__all__ = [
    "make_mesh", "shard_batch_spec", "replicated_spec",
    "psum_histogram", "distributed_vocab_counts", "all_reduce_metrics",
]
