"""Int8 PTQ decision measurement (VERDICT r3 item 1).

Reconciles the contradiction between models/quant.py (claimed ~1.4x conv
win) and docs/DESIGN.md §"Closed roadmap items" (closed at ~1.2x): this is
the committed A/B that decides finish-or-cut for the w8a8 path.

Three measurements, all on the real chip, tunnel methodology (chained
async dispatches inside one jit / across dispatches, ONE host transfer to
sync, best-of-3 groups — block_until_ready returns early on the tunneled
backend):

1. conv micro: bf16 conv vs the FULL w8a8 pipeline QuantConv runs
   (quantize act -> int8 conv -> per-channel dequant) vs a raw int8 conv
   (the ceiling if quantize/dequant were free), at the headline mid-stage
   shape (32, 112, 168, 128) x (3, 3, 128, 128).
2. e2e: configs/headline.yaml float vs detector.quant=int8 (calibrated),
   same frames, same process, run_detect_track_bench methodology.
3. numerics: max |int8 - float| detection score delta on the same weights
   (random-weight proxy; real-data quality needs Waymo weights).

Decision rule (VERDICT r3): e2e win >= ~10% -> finish the wiring
(tests, serving-path calibration, preset, bench row); below -> delete
models/quant.py and the config knob, record the number in DESIGN.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def conv_micro():
    import jax
    import jax.numpy as jnp
    from jax import lax

    N, H, W, C = 32, 112, 168, 128
    K = 3
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(N, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, K, C, C)) * 0.05, jnp.float32)
    dn = lax.conv_dimension_numbers(x0.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    STEPS = 16

    def chain_bf16(x, w):
        xb = x.astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)

        def body(c, _):
            y = lax.conv_general_dilated(c, wb, (1, 1), "SAME",
                                         dimension_numbers=dn)
            return y * jnp.bfloat16(0.05), None

        out, _ = lax.scan(body, xb, None, length=STEPS)
        return out

    def chain_w8a8(x, w):
        # exactly QuantConv's int8 path: per-tensor act scale, per-channel
        # weight scale, int32 accum, float dequant
        kf = w
        wmax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))
        wscale = jnp.maximum(wmax, 1e-8) / 127.0
        wq = jnp.clip(jnp.round(kf / wscale), -127, 127).astype(jnp.int8)

        def body(c, _):
            ascale = jnp.float32(4.0) / 127.0  # static calibrated scale
            xq = jnp.clip(jnp.round(c / ascale), -127, 127).astype(jnp.int8)
            y = lax.conv_general_dilated(xq, wq, (1, 1), "SAME",
                                         dimension_numbers=dn,
                                         preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (wscale * ascale)
            return y * 0.05, None

        out, _ = lax.scan(body, x, None, length=STEPS)
        return out

    def chain_int8_raw(xq, wq):
        # ceiling: int8 in, int8 out, no quantize/dequant traffic
        def body(c, _):
            y = lax.conv_general_dilated(c, wq, (1, 1), "SAME",
                                         dimension_numbers=dn,
                                         preferred_element_type=jnp.int32)
            return (y >> 7).astype(jnp.int8), None

        out, _ = lax.scan(body, xq, None, length=STEPS)
        return out

    results = {}
    xq0 = jnp.clip(jnp.round(x0 / 0.05), -127, 127).astype(jnp.int8)
    wq0 = jnp.clip(jnp.round(w / 0.01), -127, 127).astype(jnp.int8)
    for name, fn, args in [
        ("bf16", jax.jit(chain_bf16), (x0, w)),
        ("w8a8_full", jax.jit(chain_w8a8), (x0, w)),
        ("int8_raw", jax.jit(chain_int8_raw), (xq0, wq0)),
    ]:
        out = fn(*args)
        _ = np.asarray(out)  # compile + real sync
        best = None
        for _group in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(8):
                o = fn(*args)
            _ = np.asarray(o)
            dt = (time.perf_counter() - t0) / 8 / STEPS
            best = dt if best is None else min(best, dt)
        results[name] = round(best * 1e3, 4)  # ms per conv call
    results["w8a8_speedup_vs_bf16"] = round(
        results["bf16"] / results["w8a8_full"], 3
    )
    results["raw_int8_speedup_vs_bf16"] = round(
        results["bf16"] / results["int8_raw"], 3
    )
    return results


def e2e_ab(order=("float", "int8")):
    """Modes: 'float', 'int8' (quant_scope='trunk', the round-5 default —
    head towers/ReID stay float after the trained-fixture quality collapse
    at scope 'all'; BASELINE.md int8-quality table), 'int8_all' (the
    round-4 whole-net scope, kept measurable for the perf delta)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from waymo_2d_tracking_tpu.config import load_config
    from waymo_2d_tracking_tpu.pipeline.run import SegmentPipeline
    from waymo_2d_tracking_tpu.tracker import init_state

    cfg_f = load_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "headline.yaml"))
    cfg_q = dataclasses.replace(
        cfg_f, detector=dataclasses.replace(
            cfg_f.detector, quant="int8", quant_scope="trunk"))
    cfg_qa = dataclasses.replace(
        cfg_f, detector=dataclasses.replace(
            cfg_f.detector, quant="int8", quant_scope="all"))

    chunk = cfg_f.pipeline.chunk_frames
    num_frames = 128
    src_hw = tuple(cfg_f.detector.image_size)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (num_frames,) + src_hw + (3,), np.uint8)
    dev_frames = [jax.device_put(frames[i:i + chunk])
                  for i in range(0, num_frames, chunk)]

    out = {}
    dets_by_mode = {}
    # share one float param tree so the A/B isolates the conv path
    pipe_f = SegmentPipeline(cfg_f, rng=jax.random.PRNGKey(0))
    cfgs = {"float": cfg_f, "int8": cfg_q, "int8_all": cfg_qa}
    for name in order:
        cfg = cfgs[name]
        pipeline = SegmentPipeline(cfg, params=pipe_f.params) \
            if name != "float" else pipe_f
        if name.startswith("int8"):
            pipeline.ensure_calibrated(dev_frames[0], src_hw)
        state = init_state(cfg.tracker)
        state, outputs, _ = pipeline._chunk_step(
            pipeline.params, state, dev_frames[0], src_hw)
        _ = np.asarray(outputs.valid)  # compile + real sync
        best = None
        for _group in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                state = init_state(cfg.tracker)
                for block in dev_frames:
                    state, outputs, _ = pipeline._chunk_step(
                        pipeline.params, state, block, src_hw)
            _ = np.asarray(outputs.valid)
            dt = (time.perf_counter() - t0) / 3
            best = dt if best is None else min(best, dt)
        out[f"{name}_fps"] = round(num_frames / best, 1)
        # numerics probe: detections on one chunk
        dets = pipeline.detector.detect(
            pipeline.params,
            jnp.asarray(frames[:8], jnp.float32) / 255.0)
        dets_by_mode[name] = jax.device_get(dets)
    out["e2e_speedup"] = round(out["int8_fps"] / out["float_fps"], 3)
    if "int8_all" in dets_by_mode:
        out["e2e_speedup_all"] = round(
            out["int8_all_fps"] / out["float_fps"], 3)
    for name in dets_by_mode:
        if name == "float":
            continue
        f, q = dets_by_mode["float"], dets_by_mode[name]
        out[f"score_max_abs_delta_{name}"] = round(
            float(np.max(np.abs(f.scores - q.scores))), 4)
        out[f"valid_agreement_{name}"] = round(
            float(np.mean(f.valid == q.valid)), 4)
    return out


if __name__ == "__main__":
    res = {}
    if "--e2e-only" not in sys.argv:
        res["conv_micro_ms"] = conv_micro()
        print(json.dumps(res, indent=2))
    order = (("int8", "int8_all", "float") if "--reverse" in sys.argv
             else ("float", "int8", "int8_all"))
    res["e2e"] = e2e_ab(order)
    res["e2e"]["order"] = list(order)
    print(json.dumps(res, indent=2))
