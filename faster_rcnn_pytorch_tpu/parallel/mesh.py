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
    """1-D data-parallel mesh.

    Single-host: the first ``num_devices`` local devices (0 = all).
    Multi-host: a *global* mesh over ``num_devices`` devices of **every**
    process, ordered process-major so each host's batch shard lands on its
    own devices (the reference's DistributedSampler+DDP layout).
    """
    if devices is None:
        if jax.process_count() > 1:
            per_proc: dict[int, list] = {}
            for d in jax.devices():
                per_proc.setdefault(d.process_index, []).append(d)
            devices = []
            for p in sorted(per_proc):
                local = sorted(per_proc[p], key=lambda d: d.id)
                devices.extend(local[: num_devices or len(local)])
        else:
            devices = jax.local_devices()
            if num_devices:
                devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_spec() -> P:
    return P(DATA_AXIS)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a per-host batch with the leading dim sharded over ``data``.

    Multi-host: each process holds only its slice of the global batch;
    ``make_array_from_process_local_data`` assembles the global array.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def allgather_pyobj(obj):
    """Gather one picklable object from every process; returns the list
    ordered by process index (counterpart of the reference's pickled
    ``all_gather``, util/misc.py:89-129). Single-process: ``[obj]``."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.array([payload.size]))
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [
        pickle.loads(bytes(gathered[h][: int(s)]))
        for h, s in enumerate(np.asarray(sizes).reshape(-1))
    ]


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
