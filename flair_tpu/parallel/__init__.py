"""Mesh construction, sharding rules, halo exchange (reference L7/NCCL layer).

The reference's distributed backbone is torch.distributed + NCCL
(dist_util.py:21-92, DDP at train_util.py:125-132). The TPU-native design
needs none of that machinery: a ``jax.sharding.Mesh`` over ICI plus sharding
annotations lets GSPMD insert all collectives (SURVEY.md §5.8).
"""

from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate_params,
)
from .halo import halo_exchange_frames
from .frame_sharded import frame_sharded, frame_sharded_temporal_attention
