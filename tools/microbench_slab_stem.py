"""Slab-batched VGG stem prototype: exactness + on-chip A/B.

tools/microbench_conv_shapes.py showed XLA's fast conv strategy for the
64-channel stem needs batch >= 8 (~70 TF/s) while b1-b4 get ~23 TF/s at
equal work. This prototypes the fix: split each image's rows into S
contiguous slabs with k halo rows (k = number of stacked 3x3/s1 convs in
the segment; SAME zero-padding reproduced by pre-padding), conv the
[B*S, slab_h + 2k, W, C] stack with VALID-height padding, and reshape
back — exact by construction, batch >= 8 by choice of S.

Run: python tools/microbench_slab_stem.py [batch]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
H = W = 800
CONVS = ((3, 64), (64, 64))  # stage 1: conv1_1, conv1_2


def make_weights(rs):
    ws = []
    for cin, cout in CONVS:
        ws.append(
            (
                jnp.asarray((rs.normal(size=(3, 3, cin, cout)) * 0.05).astype(np.float32)),
                jnp.asarray((rs.normal(size=(cout,)) * 0.01).astype(np.float32)),
            )
        )
    return ws


def conv(x, w, b, pad_h):
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        (1, 1),
        ((pad_h, pad_h), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + b.astype(x.dtype))


def stage_plain(x, ws):
    for w, b in ws:
        x = conv(x, w, b, 1)
    n, h, w_, c = x.shape
    return x.reshape(n, h // 2, 2, w_ // 2, 2, c).max(axis=(2, 4))


def stage_slab(x, ws, s):
    # Exactness note: halo rows that lie outside the image must be re-zeroed
    # after every intermediate conv — the plain network's next conv pads with
    # literal zeros there, while a computed halo row is relu(conv(0-pad)+b) != 0.
    k = len(ws)
    n, h, w_, c = x.shape
    slab = h // s
    xp = jnp.pad(x, ((0, 0), (k, k), (0, 0), (0, 0)))
    slabs = jnp.stack(
        [xp[:, i * slab : i * slab + slab + 2 * k] for i in range(s)], 1
    ).reshape(n * s, slab + 2 * k, w_, c)
    y = slabs
    for t, (w, b) in enumerate(ws, start=1):
        y = conv(y, w, b, 0)
        if t < k:
            halo = k - t
            g = (
                jnp.arange(s)[:, None] * slab
                + jnp.arange(slab + 2 * halo)[None, :]
                - halo
            )
            mask = ((g >= 0) & (g < h)).astype(y.dtype)
            y = y * jnp.tile(mask, (n, 1))[:, :, None, None]
    y = y.reshape(n, s * slab, w_, y.shape[-1])
    return y.reshape(n, (s * slab) // 2, 2, w_ // 2, 2, y.shape[-1]).max(
        axis=(2, 4)
    )


def main():
    rs = np.random.RandomState(0)
    ws = make_weights(rs)
    x = jnp.asarray(rs.normal(size=(B, H, W, 3)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    s = 1
    while B * s < 8:
        s *= 2

    ref = jax.jit(lambda v: stage_plain(v, ws))(x)
    out = jax.jit(lambda v: stage_slab(v, ws, s))(x)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
    print(f"S={s}  max |plain - slab| = {err:.3e}")

    for name, fn in (("plain", stage_plain), ("slab ", lambda v, w: stage_slab(v, w, s))):

        def fwd(i, xx):
            return fn(xx + i.astype(jnp.bfloat16) * 1e-3, ws).astype(jnp.float32).sum()

        t, *_ = chain_time(fwd, k_lo=2, k_hi=6, args=(x,))

        def fwdbwd(i, xx):
            g = jax.grad(
                lambda v: (fn(v, ws).astype(jnp.float32) ** 2).sum()
            )(xx + i.astype(jnp.bfloat16) * 1e-3)
            return (g.astype(jnp.float32) ** 2).sum()

        tb, *_ = chain_time(fwdbwd, k_lo=2, k_hi=6, args=(x,))
        print(f"stage1 {name} b{B}: fwd {t * 1e3:7.2f} ms   fwd+bwd {tb * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
