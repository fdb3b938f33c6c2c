"""Post-training w8a8 int8 quantization for the conv trunk (inference only).

Motivation (measured, tools/perf_int8.py, round 4, single v5e chip): the
v5e MXU runs int8 at 2x the bf16 rate. End-to-end on the headline preset
the quantized trunk wins **1.10-1.12x** (float 1741.5/1790.5 -> int8
1953.7/1967.4 fps/chip, A/B both orders in one process) — the committed
`configs/headline_int8.yaml` point. The isolated-conv picture explains why
the win is not 2x: a scan-chained standalone w8a8 conv (quantize -> int8
conv -> dequant, nothing to fuse into) measures SLOWER than bf16 (0.55x;
the int32 accumulator + quantize round-trips are pure HBM overhead), while
a raw int8->int8 conv hits 2.09x — inside the real model XLA fuses the
quantize into the preceding BN/ReLU and the dequant into the following
elementwise ops, landing in between. Numerics on shared random weights:
max |score delta| 0.0168, valid-flag agreement 1.0.

The reference stack has no quantization story at all (its CUDA/torch path
is fp32/fp16 [RECALLED]); this is a TPU-native production-serving feature,
not a parity item.

Scheme (the standard PTQ recipe):
  - weights: symmetric per-output-channel int8, quantized from the float
    params inside the jit (amortized over the chunk batch; weight tensors
    are ~MBs vs ~100s of MB of activations);
  - activations: symmetric per-tensor int8 with STATIC calibrated scales —
    one absmax pass over N calibration batches (mode='calib' records into
    the 'quant' variable collection), then quantize is a single fused
    clip/round/convert on the producer's output. Dynamic per-batch absmax
    was rejected: it adds a full HBM reduce pass per conv input, eroding
    most of the MXU win.
  - accumulation in int32 (preferred_element_type), dequantized per
    channel to float for BN/GN/ReLU/residual adds, which stay untouched.

``QuantConv`` is param-compatible with ``nn.Conv`` (same 'kernel'/'bias'
names and shapes, float32 storage): float checkpoints load into quantized
models unchanged, and `DetectorConfig.quant` is a pure inference-time
switch — training always runs the float path.
"""
from __future__ import annotations

from typing import Any, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Padding = Union[str, Sequence]


def quantize_symmetric(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Float -> int8 with symmetric scale (scale = absmax/127)."""
    q = jnp.round(x / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


class QuantConv(nn.Module):
    """Drop-in conv with three modes:

    - 'off':   exact nn.Conv semantics (cast to ``dtype``, float conv);
    - 'calib': float conv + record per-instance input absmax into the
               'quant' collection (apply with ``mutable=['quant']``);
    - 'int8':  w8a8 conv — weights per-channel, activations per-tensor
               using the calibrated absmax.

    Param names/shapes match nn.Conv exactly so float checkpoints load.
    A module instance applied at several pyramid levels (the shared FCOS
    towers) accumulates one absmax across all of them, matching how the
    single shared scale is then used at inference.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Padding = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    mode: str = "off"
    bias_init: Any = nn.initializers.zeros_init()
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features)
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias else None
        )
        dn = lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        pad = self.padding
        if not isinstance(pad, str):
            pad = tuple((int(lo), int(hi)) for lo, hi in pad)

        if self.mode == "int8":
            absmax = self.variable(
                "quant", "act_absmax", lambda: jnp.zeros((), jnp.float32)
            )
            # uncalibrated (zero) absmax falls back to 1.0 rather than
            # saturating everything — still wrong-scale, but finite. The
            # host-side guard lives in DetectorRunner.check_calibrated
            # (called by detect() and by every driver's calibration hook);
            # inside the jit there is nothing to raise with.
            a = jnp.where(absmax.value > 0, absmax.value, 1.0)
            ascale = a / 127.0
            k = kernel.astype(jnp.float32)
            wmax = jnp.max(jnp.abs(k), axis=(0, 1, 2))          # (features,)
            wscale = jnp.maximum(wmax, 1e-8) / 127.0
            xq = quantize_symmetric(x.astype(jnp.float32), ascale)
            wq = quantize_symmetric(k, wscale)
            y = lax.conv_general_dilated(
                xq, wq, tuple(self.strides), pad, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (wscale * ascale)
            if bias is not None:
                y = y + bias
            return y.astype(self.dtype)

        if self.mode == "calib":
            absmax = self.variable(
                "quant", "act_absmax", lambda: jnp.zeros((), jnp.float32)
            )
            absmax.value = jnp.maximum(
                absmax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
            )
        # float path ('off'/'calib'): bit-identical to nn.Conv
        y = lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            tuple(self.strides), pad, dimension_numbers=dn,
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def make_conv(quant: str, **kw) -> nn.Module:
    """Conv factory threaded through backbone/FPN/heads/ReID.

    quant='off' returns a plain nn.Conv (the existing float path, byte-for-
    byte untouched); 'calib'/'int8' return the QuantConv in that mode.
    """
    if quant == "off":
        return nn.Conv(**kw)
    if quant not in ("calib", "int8"):
        raise ValueError(f"quant mode must be off/calib/int8, got {quant!r}")
    return QuantConv(mode=quant, **kw)


def is_calibrated(variables) -> bool:
    """True if every recorded act_absmax in the 'quant' collection is > 0."""
    import jax

    q = variables.get("quant", None)
    if q is None:
        return False
    leaves = jax.tree_util.tree_leaves(q)
    return bool(leaves) and all(float(v) > 0 for v in leaves)
