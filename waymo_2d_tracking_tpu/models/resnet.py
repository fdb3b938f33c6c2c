"""ResNet-50 backbone in flax (component C5).

The reference detector's backbone is torch/cuDNN ResNet-50 (BASELINE
north-star: "CNN detector (backbone+FPN+heads)"). Here it is idiomatic flax:
NHWC layout (TPU native), bfloat16 compute / float32 params, convolutions
left to XLA:TPU (cuDNN's MXU equivalent — no custom kernel needed,
SURVEY.md §2.1).

Padding is explicit (torch convention: symmetric 3 for the 7x7 stem, 1 for
3x3) rather than 'SAME', so weights port 1:1 from a torch twin and the
numerics parity test (SURVEY.md §4) holds to 1e-4.

Returns the C2..C5 feature pyramid {2: /4, 3: /8, 4: /16, 5: /32}.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from waymo_2d_tracking_tpu.models.quant import make_conv


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with BN and projection shortcut."""

    features: int            # bottleneck width; output is 4x this
    stride: int = 1
    dtype: Any = jnp.bfloat16
    quant: str = "off"       # w8a8 inference quantization (models/quant.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        conv = lambda *a, **kw: make_conv(self.quant, *a, **kw)  # noqa: E731
        residual = x
        y = conv(features=self.features, kernel_size=(1, 1), use_bias=False,
                 dtype=self.dtype, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = conv(features=self.features, kernel_size=(3, 3),
                 strides=(self.stride, self.stride),
                 padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                 name="conv2")(y)
        y = norm("bn2")(y)
        y = nn.relu(y)
        y = conv(features=self.features * 4, kernel_size=(1, 1),
                 use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)

        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = conv(
                features=self.features * 4, kernel_size=(1, 1),
                strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    """3x3 -> 3x3 basic residual block (ResNet-18/34 family)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    quant: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        conv = lambda *a, **kw: make_conv(self.quant, *a, **kw)  # noqa: E731
        residual = x
        y = conv(features=self.features, kernel_size=(3, 3),
                 strides=(self.stride, self.stride),
                 padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                 name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = conv(features=self.features, kernel_size=(3, 3),
                 padding=[(1, 1), (1, 1)],
                 use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = conv(
                features=self.features, kernel_size=(1, 1),
                strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


def space_to_depth_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), channel order (2a+b)*C + c for
    pixel offsets (a, b) in the 2x2 patch — matches convert_stem_to_s2d."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def convert_stem_to_s2d(kernel7: jnp.ndarray) -> jnp.ndarray:
    """Exactly re-express a 7x7 stride-2 stem kernel (7, 7, C, O) as the
    equivalent 4x4 stride-1 kernel (4, 4, 4C, O) over 2x2 space-to-depth
    input (the MLPerf-TPU stem trick: raise C_in 3 -> 12 for better MXU lane
    utilization). Derivation: row 2y+dy-3 = 2(y + uoff) + a with
    a = (dy-3) mod 2, uoff = (dy-3-a)/2 in {-2..1} -> kernel tap uoff+2."""
    k7 = jnp.asarray(kernel7)
    _, _, c, o = k7.shape
    k4 = jnp.zeros((4, 4, 4 * c, o), k7.dtype)
    for dy in range(7):
        a = (dy - 3) % 2
        ky = (dy - 3 - a) // 2 + 2
        for dx in range(7):
            b = (dx - 3) % 2
            kx = (dx - 3 - b) // 2 + 2
            ch = (2 * a + b) * c
            k4 = k4.at[ky, kx, ch : ch + c, :].add(k7[dy, dx])
    return k4


class ResNet(nn.Module):
    """ResNet-v1. block='bottleneck' (50/101/152) or 'basic' (18/34).

    stem='conv7' is the standard 7x7/s2; stem='s2d' runs the weight-
    equivalent space-to-depth 4x4/s1 form (use convert_stem_to_s2d to port
    trained conv7 weights)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    block: str = "bottleneck"
    stem: str = "conv7"
    dtype: Any = jnp.bfloat16
    # Per-block rematerialization: backward recomputes each residual
    # block's activations from its input instead of keeping them in HBM.
    # Peak activation memory drops to ~one block's working set per
    # resolution; identical numerics (same ops replayed). Train-time only —
    # inference paths leave this False (jax.checkpoint's optimization
    # barriers can inhibit forward fusion).
    remat: bool = False
    quant: str = "off"   # w8a8 inference quantization (models/quant.py)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[int, jnp.ndarray]:
        x = x.astype(self.dtype)
        if self.stem == "s2d":
            x = space_to_depth_2x2(x)
            x = make_conv(self.quant, features=self.width, kernel_size=(4, 4),
                          strides=(1, 1),
                          padding=[(2, 1), (2, 1)], use_bias=False,
                          dtype=self.dtype, name="stem_conv")(x)
        else:
            x = make_conv(self.quant, features=self.width, kernel_size=(7, 7),
                          strides=(2, 2),
                          padding=[(3, 3), (3, 3)], use_bias=False,
                          dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        if self.remat:
            # lifted transform keeps scope/param names, so remat and plain
            # checkpoints are interchangeable; train flag is static
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        feats: Dict[int, jnp.ndarray] = {}
        for stage, num_blocks in enumerate(self.stage_sizes):
            width = self.width * (2 ** stage)
            for block in range(num_blocks):
                stride = 2 if (block == 0 and stage > 0) else 1
                x = block_cls(
                    features=width, stride=stride, dtype=self.dtype,
                    quant=self.quant,
                    name=f"stage{stage + 1}_block{block}",
                )(x, train)
            feats[stage + 2] = x  # C2 (/4) .. C5 (/32)
        return feats


def ResNet18(dtype: Any = jnp.bfloat16, stem: str = "conv7",
             remat: bool = False, quant: str = "off") -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), width=64, block="basic",
                  stem=stem, dtype=dtype, remat=remat, quant=quant)


def ResNet34(dtype: Any = jnp.bfloat16, stem: str = "conv7",
             remat: bool = False, quant: str = "off") -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), width=64, block="basic",
                  stem=stem, dtype=dtype, remat=remat, quant=quant)


def ResNet50(dtype: Any = jnp.bfloat16, stem: str = "conv7",
             remat: bool = False, quant: str = "off") -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), width=64, stem=stem, dtype=dtype,
                  remat=remat, quant=quant)


def ResNet101(dtype: Any = jnp.bfloat16, stem: str = "conv7",
              remat: bool = False, quant: str = "off") -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), width=64, stem=stem, dtype=dtype,
                  remat=remat, quant=quant)


def ResNet18Slim(dtype: Any = jnp.bfloat16, stem: str = "conv7",
                 remat: bool = False, quant: str = "off") -> ResNet:
    """Small twin for tests (same structure, 1-block stages)."""
    return ResNet(stage_sizes=(1, 1, 1, 1), width=16, stem=stem, dtype=dtype,
                  remat=remat, quant=quant)
