"""Round-2 perf sweep, part 2: the 1500-fps architecture point + micro costs.

Measures on the real TPU chip (methodology: chained dispatches + one host
transfer, per docs/DESIGN.md §3):

  1. micro: 3x3/s2 maxpool (reduce_window) and ImageNet-normalize costs at
     the stem's working set, to see whether a fused Pallas stem is worth it
  2. slim detector variants toward >=1500 fps (resnet34/18, 512x768,
     reid_channels, no-ReID config-2 style), forward AND full detect
  3. chunk scaling (bs 16 vs 32) for the best slim variant

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_sweep2.py
"""
import dataclasses
import time

import numpy as np


def timed(fn, *args, iters=10):
    import jax

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # real sync (block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def micro(bs=16):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from waymo_2d_tracking_tpu.models.resnet import space_to_depth_2x2

    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((bs, 640, 960, 3)),
        jnp.bfloat16,
    )
    k7 = jnp.asarray(
        np.random.default_rng(1).standard_normal((7, 7, 3, 64)) * 0.1,
        jnp.bfloat16,
    )
    k4 = jnp.asarray(
        np.random.default_rng(2).standard_normal((4, 4, 12, 64)) * 0.1,
        jnp.bfloat16,
    )
    dn = ("NHWC", "HWIO", "NHWC")
    conv7 = jax.jit(lambda v: jax.lax.conv_general_dilated(
        v, k7, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn))
    s2d = jax.jit(lambda v: jax.lax.conv_general_dilated(
        space_to_depth_2x2(v), k4, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=dn))
    print(f"stem conv7 7x7/s2 (16,640,960,3):  {timed(conv7, img, iters=30)*1e3:.2f} ms", flush=True)
    print(f"stem s2d 4x4/s1 (16,320,480,12):   {timed(s2d, img, iters=30)*1e3:.2f} ms", flush=True)

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((bs, 320, 480, 64)),
        jnp.bfloat16,
    )
    pool = jax.jit(lambda v: nn.max_pool(v, (3, 3), strides=(2, 2),
                                         padding=[(1, 1), (1, 1)]))
    print(f"maxpool 3x3/s2 (16,320,480,64) bf16: {timed(pool, x, iters=30)*1e3:.2f} ms", flush=True)

    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (bs, 640, 960, 3)), jnp.uint8
    )
    mean = jnp.asarray((0.485, 0.456, 0.406), jnp.float32)
    std = jnp.asarray((0.229, 0.224, 0.225), jnp.float32)
    norm = jax.jit(
        lambda v: ((v.astype(jnp.float32) / 255.0 - mean) / std).astype(jnp.bfloat16)
    )
    print(f"uint8->normalize->bf16 (16,640,960,3): {timed(norm, img)*1e3:.2f} ms", flush=True)


def variants(bs=16):
    import jax
    import jax.numpy as jnp

    from waymo_2d_tracking_tpu.config import DetectorConfig
    from waymo_2d_tracking_tpu.models.detector import DetectorRunner

    base = DetectorConfig(stem="s2d", head_channels=128, head_depth=3,
                          fpn_levels=(3, 4, 5, 6))
    vs = {
        "r50_s2d_h128d3_noP7_reid128@640": dataclasses.replace(
            base, reid_channels=128),
        "r34_s2d_h128d3_noP7_reid128@640": dataclasses.replace(
            base, backbone="resnet34", reid_channels=128),
        "r34_...@512x768": dataclasses.replace(
            base, backbone="resnet34", reid_channels=128,
            image_size=(512, 768)),
        "r18_h128d2_noP7_noreid@512x768": dataclasses.replace(
            base, backbone="resnet18", head_depth=2, embed_dim=0,
            image_size=(512, 768)),
        "r18_h128d2_noP7_reid128@512x768": dataclasses.replace(
            base, backbone="resnet18", head_depth=2, reid_channels=128,
            image_size=(512, 768)),
    }
    for name, cfg in vs.items():
        for b in ([bs] if "r18" not in name else [bs, 32]):
            runner = DetectorRunner(cfg)
            params = runner.init_params(jax.random.PRNGKey(0), batch_size=b)
            images = jnp.asarray(
                np.random.default_rng(0).uniform(
                    0, 1, (b,) + tuple(cfg.image_size) + (3,)
                ).astype(np.float32)
            )
            fwd = jax.jit(lambda p, x, r=runner: r.module.apply(p, x))
            t_fwd = timed(fwd, params, images, iters=30)
            t_det = timed(runner._detect, params, images, iters=30)
            print(
                f"{name:>34} bs{b:2d}: fwd {t_fwd*1e3:7.2f} ms ({b/t_fwd:6.0f} fps)"
                f" | detect {t_det*1e3:7.2f} ms ({b/t_det:6.0f} fps)"
                f" | post {(t_det-t_fwd)*1e3:6.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    micro()
    variants()
