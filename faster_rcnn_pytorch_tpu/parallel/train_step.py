"""Jitted SPMD training step: SGD + momentum + weight decay + LR schedules.

Counterpart of the reference's optimizer/scheduler wiring
(main.py:58-65: SGD(lr, momentum .9, weight_decay), MultiStepLR[16,22]
active / CosineAnnealing for the published VOC recipe) and of the unused
warmup-restart scheduler (scheduler.py:6-92). All expressed as optax
transforms; the gradient all-reduce across the ``data`` mesh axis is
inserted by XLA from the sharded-batch mean.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from faster_rcnn_pytorch_tpu.models.faster_rcnn import forward_train
from faster_rcnn_pytorch_tpu.parallel.mesh import DATA_AXIS


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def _decay_mask(params) -> Any:
    """Apply weight decay everywhere except frozen-BN statistics, mirroring
    torch's requires_grad=False exclusion for FrozenBatchNorm buffers."""

    def is_decayed(path, _):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return not any(str(n).startswith(("bn", "down_bn")) for n in names)

    return jax.tree_util.tree_map_with_path(is_decayed, params)


def make_lr_schedule(
    kind: str,
    base_lr: float,
    epochs: int,
    steps_per_epoch: int,
    milestones: tuple[int, ...] = (16, 22),
    eta_min: float = 5e-5,
    warmup_epochs: int = 0,
    gamma: float = 0.1,
    cycle_mult: float = 1.0,
    restart_gamma: float = 1.0,
    first_cycle_epochs: int = 0,
) -> Callable:
    """LR schedules: 'cosine' (published VOC recipe, README cosine to
    eta_min), 'multistep' (exp1 recipe, milestones epochs x0.1), both with
    optional linear warmup (the reference's ``warmup_epoch`` flag,
    config.py:26, finally wired), and 'cosine_warmup_restarts' (full
    parity with the reference's CosineAnnealingWarmupRestarts,
    scheduler.py:6-92, including ``cycle_mult`` cycle growth and
    ``restart_gamma`` per-cycle max-lr decay)."""
    warm = warmup_epochs * steps_per_epoch
    total = max(epochs * steps_per_epoch, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if kind == "cosine":
            t = jnp.clip((step - warm) / max(total - warm, 1), 0.0, 1.0)
            lr = eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t))
        elif kind == "multistep":
            epoch = step / steps_per_epoch
            drops = sum((epoch >= m).astype(jnp.float32) for m in milestones)
            lr = base_lr * gamma**drops
        elif kind == "constant":
            lr = jnp.asarray(base_lr, jnp.float32)
        elif kind == "cosine_warmup_restarts":
            # Exact parity with the reference's warmup-restart scheduler
            # (scheduler.py:6-92): ``schedule(t)`` equals the torch
            # scheduler's lr after ``t`` step() calls post-init. Cycle
            # lengths follow L_0 = first, L_{k+1} = int((L_k - warm) *
            # cycle_mult) + warm; each cycle's peak is base_lr *
            # restart_gamma**k; warmup ramps min->peak inside the cycle.
            assert cycle_mult >= 1.0, "cycle_mult < 1 unsupported"
            first = max((first_cycle_epochs or epochs) * steps_per_epoch, 1)
            assert warm < first, "warmup must be shorter than the first cycle"
            starts, lens = [0], [first]
            while starts[-1] + lens[-1] <= total and len(lens) < 64:
                starts.append(starts[-1] + lens[-1])
                lens.append(int((lens[-1] - warm) * cycle_mult) + warm)
            starts_a = jnp.asarray(starts, jnp.float32)
            lens_a = jnp.asarray(lens, jnp.float32)
            k = jnp.sum((step >= starts_a[1:]).astype(jnp.int32))
            s_in = step - starts_a[k]
            cur = lens_a[k]
            max_lr = base_lr * jnp.float32(restart_gamma) ** k.astype(jnp.float32)
            t = (s_in - warm) / jnp.maximum(cur - warm, 1.0)
            cos_lr = eta_min + 0.5 * (max_lr - eta_min) * (1 + jnp.cos(jnp.pi * t))
            if not warm:
                # init quirk: the reference's init_lr() overwrites the
                # post-construction lr to min_lr (scheduler.py:44-51),
                # so step 0 is min_lr even without warmup.
                return jnp.where(step < 1, eta_min, cos_lr)
            warm_lr = (max_lr - eta_min) * s_in / warm + eta_min
            return jnp.where(s_in < warm, warm_lr, cos_lr)
        else:
            raise ValueError(f"unknown schedule {kind!r}")
        if warm:
            lr = jnp.where(step < warm, base_lr * (step + 1) / warm, lr)
        return lr

    return schedule


def make_optimizer(
    params,
    schedule: Callable,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
) -> optax.GradientTransformation:
    """SGD with L2-into-gradient weight decay, torch-SGD semantics."""
    return optax.chain(
        optax.masked(optax.add_decayed_weights(weight_decay), _decay_mask(params)),
        optax.sgd(learning_rate=schedule, momentum=momentum, nesterov=False),
    )


def make_train_step(
    model, cfg, optimizer, mesh, donate: bool = True, state_shardings=None,
    grad_accum: int = 1,
):
    """Build the jitted SPMD train step.

    Returns ``step_fn(state, batch, rng) -> (state, metrics)`` where
    ``batch`` is sharded on the ``data`` axis and ``state`` follows
    ``state_shardings`` (default: fully replicated — the reference's
    DDP layout; pass ``parallel.mesh.tree_shardings(state, mesh)`` on a
    ``(data, model)`` mesh for the tensor-parallel head). The loss is averaged
    over the global batch, so XLA emits the psum that replaces DDP's
    gradient all-reduce; with a model axis it additionally inserts the
    Megatron all-reduce after fc7 from the weight shardings alone.

    ``grad_accum > 1`` splits the batch into that many micro-batches and
    accumulates their gradients inside ONE jitted step (``lax.scan``)
    before the single optimizer update — activation memory drops by the
    accumulation factor while the update stays a global-batch-mean SGD
    step. Micro-step RNGs are ``jax.random.split(rng, grad_accum)``;
    logged metrics are micro-step means. The reference has no
    counterpart (its recipes fit GPU memory at batch 1-4); on TPU this
    is how the exp1 global batch trains when HBM bounds the per-step
    batch. Requires ``batch % (grad_accum * mesh data size) == 0``.
    """
    repl = NamedSharding(mesh, P())
    if state_shardings is None:
        state_shardings = repl  # pytree-prefix: whole state replicated
    data = NamedSharding(mesh, P(DATA_AXIS))
    batch_shardings = {
        "image": data,
        "extent": data,
        "gt_boxes": data,
        "gt_labels": data,
        "gt_mask": data,
    }

    def loss_fn(params, batch, rng):
        out = model.apply(
            params,
            cfg,
            batch["image"],
            batch["extent"],
            batch["gt_boxes"],
            batch["gt_labels"],
            batch["gt_mask"],
            rng,
            method=forward_train,
        )
        losses = out.losses
        metrics = {
            "loss": losses.total,
            "rpn_cls": losses.rpn_cls,
            "rpn_reg": losses.rpn_reg,
            "roi_cls": losses.roi_cls,
            "roi_reg": losses.roi_reg,
            "num_pos_roi": out.num_pos_roi,
            "num_pos_rpn": out.num_pos_rpn,
        }
        return losses.total, metrics

    def accumulate(params, batch, rng):
        """Mean grads/metrics over ``grad_accum`` micro-batches.

        Micro-batches are interleaved slices (``batch[i::grad_accum]``),
        so each keeps the loader's shard layout and divides evenly over
        the ``data`` axis.
        """
        a = grad_accum
        micro = {
            k: v.reshape((v.shape[0] // a, a) + v.shape[1:]).swapaxes(0, 1)
            for k, v in batch.items()
        }
        rngs = jax.random.split(rng, a)

        def body(carry, xs):
            mb, step_rng = xs
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb, step_rng
            )
            carry = jax.tree.map(jnp.add, carry, grads)
            return carry, metrics

        zeros = jax.tree.map(jnp.zeros_like, params)
        gsum, metrics = jax.lax.scan(body, zeros, (micro, rngs))
        grads = jax.tree.map(lambda g: g / a, gsum)
        return grads, jax.tree.map(lambda m: m.mean(0), metrics)

    def step_fn(state: TrainState, batch, rng):
        if grad_accum > 1:
            grads, metrics = accumulate(state.params, batch, rng)
        else:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng
            )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, metrics

    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, batch_shardings, repl),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,) if donate else (),
    )


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )
