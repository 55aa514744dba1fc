"""Batch-dim SPMD partitioning for custom-kernel dispatches.

``pallas_call`` lowers to an opaque custom call: under ``jax.jit`` over
a device mesh the partitioner cannot see inside it, and the documented
default for unpartitioned custom ops is to GATHER their operands onto
every device — an all-gather of full feature maps per step on a real
multi-chip mesh. The roi ops are embarrassingly parallel over the batch
dim (the same data-parallel semantics the reference gets from DDP,
/root/reference/main.py), so :func:`batch_partitioned` registers exactly
that rule: shard dim 0 of every operand and result along whatever mesh
axis the operands arrive sharded on, replicate all other dims, and lower
each shard through the plain (shape-polymorphic) dispatch body.

Dispatch policy: callers wrap only when more than one device is
attached (``spmd_partition_enabled``) — on a single chip the wrapper is
pure overhead and the direct path is the measured one. Override with
``FRT_SPMD_PARTITION=0/1``.
"""

from __future__ import annotations

import os

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def spmd_partition_enabled() -> bool:
    v = os.environ.get("FRT_SPMD_PARTITION")
    if v in ("0", "1"):
        return v == "1"
    return jax.device_count() > 1


def _operand_batch_axis(arg_shapes):
    """First non-None dim-0 axis name among the operand shardings."""
    for info in jax.tree.leaves(arg_shapes):
        spec = getattr(info.sharding, "spec", None)
        if spec is not None and len(spec) and spec[0] is not None:
            return spec[0]
    return None


def batch_partitioned(fun, sharding_rule, need_replication_factors):
    """Wrap ``fun`` (array pytrees in/out, every leaf batched on dim 0)
    in a ``custom_partitioning`` that shards dim 0 and replicates the
    rest.

    ``fun`` must be shape-polymorphic over dim 0 (it lowers per shard)
    and free of closed-over array constants — jit it if its trace bakes
    numpy constants in. ``sharding_rule`` is the Shardy einsum-like rule
    (used when the Shardy partitioner is active; the callbacks below
    serve the legacy GSPMD partitioner).
    """
    from jax.experimental.custom_partitioning import custom_partitioning

    cp = custom_partitioning(fun)

    def _shard(mesh, b):
        return lambda info: NamedSharding(
            mesh, P(b, *([None] * (len(info.shape) - 1)))
        )

    def infer(mesh, arg_shapes, result_shape):
        b = _operand_batch_axis(arg_shapes)
        return jax.tree.map(_shard(mesh, b), result_shape)

    def partition(mesh, arg_shapes, result_shape):
        b = _operand_batch_axis(arg_shapes)
        return (
            mesh,
            fun,
            jax.tree.map(_shard(mesh, b), result_shape),
            jax.tree.map(_shard(mesh, b), arg_shapes),
        )

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=sharding_rule,
        need_replication_factors=need_replication_factors,
    )
    return cp
