from remfx_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_params_channels,
    shard_tcn_params,
    shard_time,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_params_channels",
    "shard_tcn_params",
    "shard_time",
]
