"""Round-2 perf sweep, part 3: fpn128 variants, batch scaling, fixed micros,
tracker-step isolation.

Micro methodology fix vs perf_sweep2: sync on a scalar reduction, never pull
a big tensor across the ~21 MB/s tunnel (that corrupted sweep-2's micro rows
by hundreds of ms).

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_sweep3.py
"""
import dataclasses
import time

import numpy as np


def timed_small(fn, *args, iters=30):
    """Time fn whose output may be large: chain iters dispatches, then sync
    on a scalar sum so only 4 bytes cross the tunnel."""
    import jax
    import jax.numpy as jnp

    red = jax.jit(lambda *a: jnp.sum(jax.tree.leaves(fn(*a))[0].astype(jnp.float32)))
    float(red(*args))  # warm both jits
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args)
    s = red(*args)
    float(s)
    return (time.perf_counter() - t0) / iters


def timed(fn, *args, iters=30):
    import jax

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
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
        np.random.default_rng(0).standard_normal((bs, 640, 960, 3)), jnp.bfloat16
    )
    k7 = jnp.asarray(np.random.default_rng(1).standard_normal((7, 7, 3, 64)) * 0.1,
                     jnp.bfloat16)
    k4 = jnp.asarray(np.random.default_rng(2).standard_normal((4, 4, 12, 64)) * 0.1,
                     jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")
    conv7 = jax.jit(lambda v: jax.lax.conv_general_dilated(
        v, k7, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn))
    s2d = jax.jit(lambda v: jax.lax.conv_general_dilated(
        space_to_depth_2x2(v), k4, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=dn))
    print(f"stem conv7 (16f):   {timed_small(conv7, img)*1e3:7.2f} ms", flush=True)
    print(f"stem s2d   (16f):   {timed_small(s2d, img)*1e3:7.2f} ms", flush=True)

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((bs, 320, 480, 64)), jnp.bfloat16
    )
    pool = jax.jit(lambda v: nn.max_pool(v, (3, 3), strides=(2, 2),
                                         padding=[(1, 1), (1, 1)]))
    print(f"maxpool    (16f):   {timed_small(pool, x)*1e3:7.2f} ms", flush=True)

    u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (bs, 640, 960, 3),
                                                       np.uint8))
    mean = jnp.asarray((0.485, 0.456, 0.406), jnp.float32)
    std = jnp.asarray((0.229, 0.224, 0.225), jnp.float32)
    norm = jax.jit(lambda v: ((v.astype(jnp.float32) / 255.0 - mean) / std)
                   .astype(jnp.bfloat16))
    print(f"normalize  (16f):   {timed_small(norm, u8)*1e3:7.2f} ms", flush=True)


def tracker_micro():
    """Per-frame tracker step cost at the bench's settings (64 tracks)."""
    import jax

    from waymo_2d_tracking_tpu.config import TrackerConfig
    from waymo_2d_tracking_tpu.data.synthetic import SyntheticClipConfig, generate_clip
    from waymo_2d_tracking_tpu.tracker import Tracker

    for s, e in ((64, 128), (128, 128), (64, 0)):
        cfg = TrackerConfig(max_tracks=s, max_detections=64, embed_dim=e,
                            appearance_weight=0.3 if e else 0.0)
        dets, _ = generate_clip(
            SyntheticClipConfig(num_frames=64, num_objects=12, seed=0)
        )
        tracker = Tracker(cfg)
        state, outs = tracker.run(dets)
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        for _ in range(10):
            state, outs = tracker.run(dets)
        _ = np.asarray(outs.valid)
        dt = (time.perf_counter() - t0) / 10
        print(f"tracker scan S={s} E={e}: {dt/64*1e3:6.3f} ms/frame", flush=True)


def variants():
    import jax
    import jax.numpy as jnp

    from waymo_2d_tracking_tpu.config import DetectorConfig
    from waymo_2d_tracking_tpu.models.detector import DetectorRunner

    base = DetectorConfig(stem="s2d", head_channels=128, head_depth=3,
                          fpn_levels=(3, 4, 5, 6), reid_channels=128)
    vs = {
        "r34_fpn128@640x960": (dataclasses.replace(
            base, backbone="resnet34", fpn_channels=128), [16, 32]),
        "r50_fpn128@640x960": (dataclasses.replace(
            base, fpn_channels=128), [16]),
        "r34_fpn256@640x960_bs32": (dataclasses.replace(
            base, backbone="resnet34"), [32]),
        "r18_fpn128_d2_noreid@448x672": (dataclasses.replace(
            base, backbone="resnet18", fpn_channels=128, head_depth=2,
            embed_dim=0, image_size=(448, 672)), [32]),
        "r18_fpn128_d2_noreid@384x576": (dataclasses.replace(
            base, backbone="resnet18", fpn_channels=128, head_depth=2,
            embed_dim=0, image_size=(384, 576)), [32, 64]),
        "r18_fpn128_d2_reid128@448x672": (dataclasses.replace(
            base, backbone="resnet18", fpn_channels=128, head_depth=2,
            image_size=(448, 672)), [32]),
    }
    for name, (cfg, bss) in vs.items():
        for b in bss:
            runner = DetectorRunner(cfg)
            params = runner.init_params(jax.random.PRNGKey(0), batch_size=b)
            images = jnp.asarray(
                np.random.default_rng(0).uniform(
                    0, 1, (b,) + tuple(cfg.image_size) + (3,)
                ).astype(np.float32)
            )
            t_det = timed(runner._detect, params, images)
            print(f"{name:>30} bs{b:2d}: detect {t_det*1e3:7.2f} ms "
                  f"({b/t_det:6.0f} fps)", flush=True)


if __name__ == "__main__":
    micro()
    tracker_micro()
    variants()
