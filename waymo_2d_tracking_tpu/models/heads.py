"""Anchor-free detection heads (component C7), FCOS-style.

Shared conv towers (GroupNorm, shared weights across pyramid levels — the
standard FCOS design, and TPU-friendly: one set of weights, all levels
batchable) producing per-location class logits, ltrb box distances, and
centerness. Per-level learnable scale on the box branch.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from waymo_2d_tracking_tpu.models.quant import make_conv


class HeadTower(nn.Module):
    depth: int = 4
    channels: int = 256
    dtype: Any = jnp.bfloat16
    quant: str = "off"

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = make_conv(self.quant, features=self.channels,
                          kernel_size=(3, 3), padding=[(1, 1), (1, 1)],
                          dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"gn{i}")(x)
            x = nn.relu(x)
        return x


class FCOSHeads(nn.Module):
    """Apply shared cls/box towers to every pyramid level.

    Returns per level: (cls_logits (N,H,W,K), ltrb (N,H,W,4) in *stride
    units* (scaled by exp(scale_l)), centerness (N,H,W,1)).
    """

    num_classes: int = 3
    depth: int = 4
    channels: int = 256
    levels: Sequence[int] = (3, 4, 5, 6, 7)
    dtype: Any = jnp.bfloat16
    quant: str = "off"

    @nn.compact
    def __call__(self, feats: Dict[int, jnp.ndarray]):
        cls_tower = HeadTower(self.depth, self.channels, self.dtype,
                              quant=self.quant, name="cls_tower")
        box_tower = HeadTower(self.depth, self.channels, self.dtype,
                              quant=self.quant, name="box_tower")
        # predictor convs stay float: their outputs are decoded through
        # sigmoid/exp where int8 step noise moves scores directly, and at
        # 3-8 output channels they are a rounding error of the FLOP budget
        cls_conv = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            bias_init=nn.initializers.constant(-4.595),  # prior p=0.01 focal init
            name="cls_logits",
        )
        box_conv = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           name="box_ltrb")
        ctr_conv = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           name="centerness")

        out = {}
        for lvl in self.levels:
            x = feats[lvl]
            ct = cls_tower(x)
            bt = box_tower(x)
            scale = self.param(f"scale{lvl}", nn.initializers.ones, ())
            cls_logits = cls_conv(ct)
            ltrb = jnp.exp(box_conv(bt).astype(jnp.float32) * scale)
            ctr = ctr_conv(bt)
            out[lvl] = (cls_logits, ltrb, ctr)
        return out


def decode_level(
    ltrb: jnp.ndarray, stride: int
) -> jnp.ndarray:
    """Decode ltrb distances (N, H, W, 4, in stride units) to xyxy boxes in
    image coordinates. Location centers at ((j+0.5)s, (i+0.5)s)."""
    n, h, w, _ = ltrb.shape
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    cy = jnp.broadcast_to(ys[None, :, None], (n, h, w))
    cx = jnp.broadcast_to(xs[None, None, :], (n, h, w))
    d = ltrb * stride
    return jnp.stack(
        [cx - d[..., 0], cy - d[..., 1], cx + d[..., 2], cy + d[..., 3]], axis=-1
    )
