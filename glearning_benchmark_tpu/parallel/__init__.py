from .mesh import (make_mesh, shard_batch_spec, replicated_spec,
                   param_shard_spec, shard_params)
from .dist import psum_histogram, distributed_vocab_counts, all_reduce_metrics
from .data import host_shard_bounds, shard_for_host, initialize_distributed
from .pipeline import gpipe_layers, pp_transformer_forward, stack_layer_params

__all__ = [
    "make_mesh", "shard_batch_spec", "replicated_spec",
    "param_shard_spec", "shard_params",
    "psum_histogram", "distributed_vocab_counts", "all_reduce_metrics",
    "host_shard_bounds", "shard_for_host", "initialize_distributed",
    "gpipe_layers", "pp_transformer_forward", "stack_layer_params",
]
