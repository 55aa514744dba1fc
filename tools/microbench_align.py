"""Micro-bench of the gather-based multiscale_roi_align internals."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402
_enable_cache()


from faster_rcnn_pytorch_tpu.ops.roi_align import multiscale_roi_align

B, N, C, S = 2, 1000, 256, 14
CAN = 800
ITERS = 20
WARMUP = 3


def timed(name, fn, feeds):
    out = None
    for i in range(WARMUP):
        out = fn(*feeds[i % len(feeds)])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*feeds[i % len(feeds)])  # in-order device queue
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:40s} {dt:9.3f} ms")
    return out


def main():
    rs = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rs.normal(size=(B, CAN // s, CAN // s, C)).astype(np.float32)).astype(jnp.bfloat16)
        for s in (4, 8, 16, 32)
    )
    xy1 = rs.uniform(0, 600, size=(B, N, 2))
    wh = np.exp(rs.uniform(np.log(8), np.log(500), size=(B, N, 2)))
    rois = jnp.asarray(
        np.concatenate([xy1, np.minimum(xy1 + wh, 800)], -1).astype(np.float32)
    )

    total_rows = sum(f.shape[1] * f.shape[2] for f in feats)
    flat = jnp.concatenate([f.reshape(B, -1, C) for f in feats], axis=1)
    idx = jnp.asarray(rs.randint(0, total_rows, size=(B, N * 28 * 28)).astype(np.int32))
    # clustered idx: rows within a 28x28 window per roi
    base = rs.randint(0, total_rows - 28 * 200, size=(B, N, 1, 1))
    win = (np.arange(28)[:, None] * 200 + np.arange(28)[None, :]).reshape(1, 1, -1)
    cidx = jnp.asarray((base.reshape(B, N, 1) + win).reshape(B, -1).astype(np.int32))

    nfeed = ITERS + WARMUP
    # gather fused into a cheap reduction (as in the real align, the
    # corner tensor feeds a contraction and need not materialise)
    gather_sum = jax.jit(
        lambda f, i: jax.vmap(lambda ff, ii: jnp.take(ff, ii, axis=0))(f, i)
        .astype(jnp.float32).sum()
    )
    idxs = [jnp.mod(idx + 37 * i, total_rows) for i in range(nfeed)]
    cidxs = [jnp.mod(cidx + 37 * i, total_rows) for i in range(nfeed)]
    jax.block_until_ready((idxs, cidxs))
    timed("gather+sum 1.57M random rows bf16", gather_sum,
          [(flat, i) for i in idxs])
    timed("gather+sum 1.57M clustered rows bf16", gather_sum,
          [(flat, i) for i in cidxs])

    # materialising gather (forced output)
    gather = jax.jit(lambda f, i: jax.vmap(lambda ff, ii: jnp.take(ff, ii, axis=0))(f, i))
    out = None
    for i in range(3):
        out = gather(flat, idxs[i])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(8):
        out = gather(flat, idxs[WARMUP + i])
        out.block_until_ready()  # serialize: avoid holding >1 800MB buffer
    print(f"{'gather materialised (serialized)':40s} {(time.perf_counter()-t0)/8*1000:9.3f} ms")
    del out

    align = jax.jit(
        lambda fs, r: jax.vmap(
            lambda f2, ri: multiscale_roi_align(f2, ri, strides=(4, 8, 16, 32))
        )(fs, r)
    )
    roi_feeds = [(feats, jnp.clip(rois + i * 0.37, 0, 800)) for i in range(nfeed)]
    jax.block_until_ready(roi_feeds)
    timed("full multiscale_roi_align (gather)", align, roi_feeds)

    # FC trunk on pooled output
    w6 = jnp.asarray(rs.normal(size=(7 * 7 * C, 1024)).astype(np.float32)).astype(jnp.bfloat16)
    w7 = jnp.asarray(rs.normal(size=(1024, 1024)).astype(np.float32)).astype(jnp.bfloat16)
    fc = jax.jit(lambda x: jnp.maximum(jnp.maximum(x @ w6, 0) @ w7, 0))
    pooleds = [
        jnp.asarray(rs.normal(size=(B, N, 7 * 7 * C)).astype(np.float32)).astype(jnp.bfloat16)
        for _ in range(6)
    ]
    jax.block_until_ready(pooleds)
    timed("fc trunk bf16", fc, [(p,) for p in pooleds])


if __name__ == "__main__":
    main()
