"""Device mesh + sharding helpers.

The reference scales with one parallelism axis — data parallel over
NCCL/DDP (utils/__init__.py:5-23, models/build.py:9-14, SURVEY.md §2.29).
The TPU-native equivalent is a 1-D ``jax.sharding.Mesh`` over the ICI
with the batch sharded on a ``data`` axis: gradient all-reduce becomes an
XLA-inserted ``psum`` inside one jitted SPMD program — no wrapper module,
no SyncBatchNorm (backbones use frozen BN, see models/resnet.py), no
rendezvous sockets. Multi-host (DCN) uses :func:`initialize_multihost`
(the ``jax.distributed`` counterpart of the reference's TCP rendezvous).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over local (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_spec() -> P:
    return P(DATA_AXIS)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch with the leading dim sharded over ``data``."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params, opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def initialize_multihost(coordinator: str, num_hosts: int, host_id: int) -> None:
    """Multi-host runtime bring-up over DCN (replaces the reference's
    ``init_process_group('nccl', tcp://...)``, utils/util.py:105-124)."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_hosts,
        process_id=host_id,
    )
