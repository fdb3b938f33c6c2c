"""Feature Pyramid Network (component C6).

Standard FPN (Lin et al.) over the ResNet C3..C5 stages, extended with
P6/P7 stride-2 convs (RetinaNet/FCOS convention) so heads see strides
8..128. Top-down upsampling is nearest-neighbor via reshape-broadcast —
a pure layout op that XLA fuses, no gather/resize kernel needed.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from waymo_2d_tracking_tpu.models.quant import make_conv


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, 2H, 2W, C) by broadcast (XLA-fusable, no gather)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class FPN(nn.Module):
    """Builds P3..P7 from C3..C5."""

    channels: int = 256
    levels: Sequence[int] = (3, 4, 5, 6, 7)
    dtype: Any = jnp.bfloat16
    quant: str = "off"   # w8a8 inference quantization (models/quant.py)

    @nn.compact
    def __call__(self, feats: Dict[int, jnp.ndarray]) -> Dict[int, jnp.ndarray]:
        conv = lambda *a, **kw: make_conv(self.quant, *a, **kw)  # noqa: E731
        # lateral 1x1 projections for C3..C5
        laterals = {
            lvl: conv(features=self.channels, kernel_size=(1, 1),
                      dtype=self.dtype, name=f"lateral{lvl}")(feats[lvl])
            for lvl in (3, 4, 5)
        }
        # top-down pathway
        merged = {5: laterals[5]}
        for lvl in (4, 3):
            up = nearest_upsample_2x(merged[lvl + 1])
            # crop in case of odd input sizes
            up = up[:, : laterals[lvl].shape[1], : laterals[lvl].shape[2], :]
            merged[lvl] = laterals[lvl] + up
        # 3x3 smoothing convs -> P3..P5
        outs = {
            lvl: conv(features=self.channels, kernel_size=(3, 3),
                      padding=[(1, 1), (1, 1)],
                      dtype=self.dtype, name=f"smooth{lvl}")(merged[lvl])
            for lvl in (3, 4, 5)
        }
        # P6/P7 from P5 (FCOS convention: convs on P5, not C5)
        if 6 in self.levels:
            outs[6] = conv(features=self.channels, kernel_size=(3, 3),
                           strides=(2, 2),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           name="p6")(outs[5])
        if 7 in self.levels:
            outs[7] = conv(features=self.channels, kernel_size=(3, 3),
                           strides=(2, 2),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           name="p7")(nn.relu(outs[6]))
        return {lvl: outs[lvl] for lvl in self.levels}
