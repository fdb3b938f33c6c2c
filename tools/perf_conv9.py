"""Experiment: 3x3 conv as 9 shifted full-rate matmuls vs XLA's conv lowering.

docs/DESIGN.md §5 "Open": isolated big 256-ch convs already hit ~122 TFLOP/s,
but the high-res early stages measure lower. A 3x3 conv is exactly
sum_{dy,dx} shift(x)[.,dy,dx] @ W[dy,dx] — nine (N*H*W, Cin)@(Cin, Cout)
matmuls, which the MXU runs at peak; the question is whether 9x input reads
(HBM) eat the gain, and whether XLA's native lowering is already this.

Measures, per shape: conv_general_dilated vs the 9-tap einsum form, both
jitted whole (chained dispatches, scalar-sum sync — tunnel-safe timing).

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_conv9.py
"""
import time

import numpy as np


def timed_chain(fn, x, iters=30):
    import jax
    import jax.numpy as jnp

    # chain: y = fn(fn(...fn(x))) inside ONE jit so per-dispatch tunnel
    # latency (~2 ms) is paid once; sync on a scalar.
    @jax.jit
    def chain(v):
        for _ in range(iters):
            v = fn(v)
        return jnp.sum(v.astype(jnp.float32))

    float(chain(x))  # compile+warm
    t0 = time.perf_counter()
    s = chain(x)
    float(s)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    shapes = [
        # (N, H, W, C) at the r50 stage-1/2 working points, 640x960 input
        (16, 160, 240, 256),
        (16, 80, 120, 256),
        (16, 320, 480, 64),
    ]
    for (n, h, w, c) in shapes:
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((n, h, w, c)) * 0.1,
            jnp.bfloat16,
        )
        k = jnp.asarray(
            np.random.default_rng(1).standard_normal((3, 3, c, c)) * 0.02,
            jnp.bfloat16,
        )
        dn = ("NHWC", "HWIO", "NHWC")

        def conv_native(v):
            return jax.lax.conv_general_dilated(
                v, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)

        def conv_9tap(v):
            vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = None
            for dy in range(3):
                for dx in range(3):
                    sl = jax.lax.slice(
                        vp, (0, dy, dx, 0), (n, dy + h, dx + w, c))
                    t = jnp.einsum("nhwc,cd->nhwd", sl, k[dy, dx],
                                   preferred_element_type=jnp.float32)
                    out = t if out is None else out + t
            return out.astype(jnp.bfloat16)

        gflop = 2 * n * h * w * 9 * c * c / 1e9
        t_nat = timed_chain(conv_native, x)
        t_9 = timed_chain(conv_9tap, x)
        print(
            f"({n},{h},{w},{c}): native {t_nat*1e3:7.2f} ms "
            f"({gflop/t_nat/1e3:5.1f} TF/s) | 9-tap {t_9*1e3:7.2f} ms "
            f"({gflop/t_9/1e3:5.1f} TF/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
