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
MODEL_AXIS = "model"


def make_mesh(num_devices: int = 0, devices=None, model_parallel: int = 1) -> Mesh:
    """``(data, model)`` device mesh.

    Single-host: the first ``num_devices`` local devices (0 = all).
    Multi-host: a *global* mesh over ``num_devices`` devices of **every**
    process, ordered process-major so each host's batch shard lands on its
    own devices (the reference's DistributedSampler+DDP layout).

    ``model_parallel`` folds the trailing mesh dim into a tensor-parallel
    ``model`` axis (consecutive device ids — ICI neighbours on TPU) for
    the Megatron-sharded roi-head FCs (:func:`param_shardings`); the
    default 1 degenerates to the reference's data-parallel-only design
    (SURVEY.md §2.29). The batch is sharded over ``data`` only, so each
    model group shares its data shard.
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
    n = len(devices)
    if n % model_parallel:
        raise ValueError(
            f"model_parallel={model_parallel} must divide {n} devices"
        )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


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


def _tp_spec(path, leaf, model_size: int) -> P:
    """Megatron column/row sharding for the roi-head FC pair, keyed by
    parameter path suffix. fc6 is column-parallel (output features
    sharded -> its bias shards too), fc7 row-parallel (input features
    sharded, replicated bias); XLA inserts the single all-reduce after
    fc7 from these annotations. The same suffix rule intentionally
    matches the optimizer's momentum-trace subtree (identical paths
    under ``trace/``), so one rule shards params and optimizer state
    alike. Everything else — backbone, RPN, cls/reg heads — replicates.
    """
    names = [
        str(getattr(q, "key", getattr(q, "name", ""))) for q in path
    ]
    joined = "/".join(names)
    shape = getattr(leaf, "shape", ())
    if joined.endswith("fc6/kernel") and len(shape) == 2:
        if shape[1] % model_size == 0:
            return P(None, MODEL_AXIS)
    elif joined.endswith("fc6/bias") and len(shape) == 1:
        if shape[0] % model_size == 0:
            return P(MODEL_AXIS)
    elif joined.endswith("fc7/kernel") and len(shape) == 2:
        if shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)
    return P()


def tree_shardings(tree, mesh: Mesh):
    """Pytree of ``NamedSharding`` for params / train state: replicated
    everywhere except the tensor-parallel roi-head FCs when the mesh has
    a non-trivial ``model`` axis (:func:`_tp_spec`)."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        MODEL_AXIS, 1
    )
    if model_size == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _tp_spec(path, leaf, model_size)
        ),
        tree,
    )


def shard_tree(tree, mesh: Mesh):
    """Place params / train state per :func:`tree_shardings` (replicated
    for a data-only mesh, Megatron head FCs on a ``(data, model)`` one)."""
    return jax.device_put(tree, tree_shardings(tree, mesh))


def initialize_multihost(coordinator: str, num_hosts: int, host_id: int) -> None:
    """Multi-host runtime bring-up over DCN (replaces the reference's
    ``init_process_group('nccl', tcp://...)``, utils/util.py:105-124)."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_hosts,
        process_id=host_id,
    )
