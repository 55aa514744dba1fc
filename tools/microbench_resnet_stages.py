"""Per-stage attribution of the ResNet50 fwd+bwd cost at train b2.

The equal-work sweep (microbench_resnet_batch.py) shows the full
backbone fwd+bwd drops 13.3 -> 6.8 ms when rows are slabbed into
batch >= 8 at constant width — this attributes which stages carry the
gap so the slab pass targets only them.

Each stage is timed standalone with its real input shape (b2, 800px
canvas), fwd and fwd+bwd, plain vs row-slabbed equal-work where rows
divide: the stage's stride-1 bottleneck blocks only (a real slab pass
leaves the stride-2 entry block plain; this bench does the same by
timing entry and rest separately).

Run: python tools/microbench_resnet_stages.py
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

from faster_rcnn_pytorch_tpu.models.resnet import Bottleneck

# (label, width, in_ch, rows, cols, n_rest_blocks, entry_stride)
# input of each stage at an 800x800 canvas, b2.
STAGES = (
    ("layer1", 64, 64, 200, 200, 2, 1),
    ("layer2", 128, 256, 200, 200, 3, 2),
    ("layer3", 256, 512, 100, 100, 5, 2),
    ("layer4", 512, 1024, 50, 50, 2, 2),
)
B = 2


def time_block_run(label, width, in_ch, rows, cols, n_blocks, stride, slab):
    """Time n_blocks bottlenecks (first with ``stride``) on [b,rows,cols,in_ch]."""
    rs = np.random.RandomState(0)
    b, r = B, rows
    if slab > 1:
        if rows % slab:
            return None
        b, r = B * slab, rows // slab
    x = jnp.asarray(rs.normal(size=(b, r, cols, in_ch)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    import flax.linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, y):
            for i in range(n_blocks):
                y = Bottleneck(width, strides=stride if i == 0 else 1)(y)
            return y

    model = Stack()
    params = model.init(jax.random.key(0), x)

    def fwd(i, p, xx):
        return model.apply(p, xx + i.astype(jnp.bfloat16) * 1e-3).astype(
            jnp.float32
        ).sum()

    def fwdbwd(i, p, xx):
        g = jax.grad(
            lambda pp: (
                model.apply(pp, xx + i.astype(jnp.bfloat16) * 1e-3).astype(
                    jnp.float32
                )
                ** 2
            ).sum()
        )(p)
        return sum((t * t).sum() for t in jax.tree.leaves(g))

    t, *_ = chain_time(fwd, k_lo=2, k_hi=5, args=(params, x))
    tb, *_ = chain_time(fwdbwd, k_lo=2, k_hi=5, args=(params, x))
    return t, tb


def main():
    for label, width, in_ch, rows, cols, n_rest, entry_stride in STAGES:
        # entry block (strided) — never slabbed
        r = time_block_run(label, width, in_ch, rows, cols, 1, entry_stride, 1)
        if r:
            print(f"{label} entry  plain : fwd {r[0]*1e3:6.2f} | fwd+bwd {r[1]*1e3:6.2f} ms")
        out_rows = rows // entry_stride
        out_cols = cols // entry_stride
        for slab in (1, 2, 4):
            r = time_block_run(
                label, width, width * 4, out_rows, out_cols, n_rest, 1, slab
            )
            if r is None:
                continue
            tag = "plain" if slab == 1 else f"S={slab} "
            print(
                f"{label} rest x{n_rest} {tag}: fwd {r[0]*1e3:6.2f}"
                f" | fwd+bwd {r[1]*1e3:6.2f} ms"
            )


if __name__ == "__main__":
    main()
