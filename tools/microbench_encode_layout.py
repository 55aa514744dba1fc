"""Layout experiment for the rpn_targets encode tail (A=160k anchors).

microbench_rpn_targets.py attributes ~2.3 of the 3.9 ms FPN rpn_targets
to the encode tail — [A, 4] fp32 elementwise math whose FLOPs are
trivial. Hypothesis: the minor-dim-4 layout lane-pads 4 -> 128 (97%
wasted bandwidth). Variants:

  A. current form: gather matched gt rows [A,4], xy_to_cxcy, encode
  B. SoA: per-component [A] vectors, matched gt via one-hot matvec,
     final jnp.stack back to [A,4]
  C. SoA without the final stack (tuple of [A] outputs)

Run: python tools/microbench_encode_layout.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

from tools.chaintime import chain_time

from faster_rcnn_pytorch_tpu.ops.boxes import encode, xy_to_cxcy

A = 159882
G = 24
B = 2


def main():
    rs = np.random.RandomState(0)
    anchors = jnp.asarray(rs.uniform(0, 1, size=(A, 4)).astype(np.float32))
    gt = jnp.asarray(rs.uniform(0, 1, size=(B, G, 4)).astype(np.float32))
    arg = jnp.asarray(rs.randint(0, G, size=(B, A)).astype(np.int32))
    labels = jnp.asarray((rs.uniform(size=(B, A)) < 0.01).astype(np.int32))

    def tail_current(i, g, a):
        def one(gi, ai):
            matched = gi[ai]
            reg = encode(xy_to_cxcy(matched + i * 1e-6), xy_to_cxcy(anchors), eps=1e-8)
            return jnp.where((labels[0] == 1)[:, None], reg, 0.0).sum()
        return jax.vmap(one)(g, a).sum()

    # SoA: anchors in cxcywh component vectors (constant-folded transposes)
    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    aw = jnp.maximum(anchors[:, 2] - anchors[:, 0], 1e-8)
    ah = jnp.maximum(anchors[:, 3] - anchors[:, 1], 1e-8)

    def soa_components(gi, ai, i):
        onehot = jax.nn.one_hot(ai, G, dtype=jnp.float32)  # [A, G]
        gcols = (gi + i * 1e-6).T  # [4, G]
        mx1 = onehot @ gcols[0]
        my1 = onehot @ gcols[1]
        mx2 = onehot @ gcols[2]
        my2 = onehot @ gcols[3]
        mcx = (mx1 + mx2) * 0.5
        mcy = (my1 + my2) * 0.5
        mw = jnp.maximum(mx2 - mx1, 1e-8)
        mh = jnp.maximum(my2 - my1, 1e-8)
        pos = labels[0] == 1
        tx = jnp.where(pos, (mcx - acx) / aw, 0.0)
        ty = jnp.where(pos, (mcy - acy) / ah, 0.0)
        tw = jnp.where(pos, jnp.log(mw / aw), 0.0)
        th = jnp.where(pos, jnp.log(mh / ah), 0.0)
        return tx, ty, tw, th

    def tail_soa_stack(i, g, a):
        def one(gi, ai):
            tx, ty, tw, th = soa_components(gi, ai, i)
            return jnp.stack([tx, ty, tw, th], axis=-1).sum()
        return jax.vmap(one)(g, a).sum()

    def tail_soa_nostack(i, g, a):
        def one(gi, ai):
            tx, ty, tw, th = soa_components(gi, ai, i)
            return tx.sum() + ty.sum() + tw.sum() + th.sum()
        return jax.vmap(one)(g, a).sum()

    for name, fn in (
        ("A. current [A,4] tail", tail_current),
        ("B. SoA + final stack  ", tail_soa_stack),
        ("C. SoA, no stack      ", tail_soa_nostack),
    ):
        t, *_ = chain_time(fn, args=(gt, arg))
        print(f"{name}: {t*1e3:7.2f} ms/b{B} (A={A})")


if __name__ == "__main__":
    main()
