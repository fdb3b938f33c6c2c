"""Forward/postprocess decomposition bench on the real TPU chip.

Measures the detector variants that drive the round-2 perf roadmap
(docs/DESIGN.md roofline): conv7 vs s2d stem, head tower width, topk method,
forward vs full detect (postprocess delta). Methodology per DESIGN.md §3:
chained async dispatches + ONE host transfer (block_until_ready returns
early over the axon tunnel).

Run:  env PYTHONPATH=/root/.axon_site python tools/perf_decompose.py [bs]
"""
import dataclasses
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from waymo_2d_tracking_tpu.config import DetectorConfig
    from waymo_2d_tracking_tpu.models.detector import DetectorRunner

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    hw = (640, 960)
    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (bs,) + hw + (3,)).astype(np.float32)
    )

    def timed(fn, *args, iters=10):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])  # real sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / iters

    base = DetectorConfig(image_size=hw)
    variants = {
        "conv7_h256": base,
        "s2d_h256": dataclasses.replace(base, stem="s2d"),
        "s2d_h128": dataclasses.replace(base, stem="s2d", head_channels=128),
        "s2d_h128_approx": dataclasses.replace(
            base, stem="s2d", head_channels=128, topk_method="approx"
        ),
        "s2d_h128_noP7": dataclasses.replace(
            base, stem="s2d", head_channels=128, fpn_levels=(3, 4, 5, 6)
        ),
    }
    for name, cfg in variants.items():
        runner = DetectorRunner(cfg)
        params = runner.init_params(jax.random.PRNGKey(0), batch_size=bs)
        fwd = jax.jit(lambda p, x: runner.module.apply(p, x))
        t_fwd = timed(fwd, params, images)
        t_det = timed(runner._detect, params, images)
        print(
            f"{name:>16}: fwd {t_fwd * 1e3:7.2f} ms/{bs}f "
            f"({bs / t_fwd:6.0f} fps) | detect {t_det * 1e3:7.2f} ms "
            f"({bs / t_det:6.0f} fps) | post {(t_det - t_fwd) * 1e3:6.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
