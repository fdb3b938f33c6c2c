"""Full detector: ResNet-50 + FPN + FCOS heads + ReID, with device-side
post-processing (components C5-C11 assembled).

The reference runs backbone/heads on GPU, then NMS/top-k/RoI via CUDA
extensions and copies results to host per frame (SURVEY.md §3.1). Here the
whole path — forward, score decode, per-level candidate top-k, class-aware
Pallas NMS, RoIAlign + ReID embedding — is one jitted computation emitting a
fixed-shape ``Detections`` pytree that feeds the tracker directly on device.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from waymo_2d_tracking_tpu.config import DetectorConfig
from waymo_2d_tracking_tpu.models.fpn import FPN
from waymo_2d_tracking_tpu.models.heads import FCOSHeads, decode_level
from waymo_2d_tracking_tpu.models.reid import ReIDHead
from waymo_2d_tracking_tpu.models.resnet import ResNet, ResNet50
from waymo_2d_tracking_tpu.ops.nms import nms
from waymo_2d_tracking_tpu.ops.roi_align import roi_align
from waymo_2d_tracking_tpu.types import Detections

# class-aware NMS: boxes of different classes are offset far apart so one
# class-agnostic NMS pass never cross-suppresses (torchvision "batched_nms"
# trick, reimplemented).
_CLASS_NMS_OFFSET = 1e5


class Detector(nn.Module):
    """Raw forward: images (N, H, W, 3) -> per-level head outputs + P3."""

    cfg: DetectorConfig

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        from waymo_2d_tracking_tpu.models import resnet as resnet_mod

        factories = {
            "resnet18": resnet_mod.ResNet18,
            "resnet34": resnet_mod.ResNet34,
            "resnet50": resnet_mod.ResNet50,
            "resnet101": resnet_mod.ResNet101,
            "resnet18slim": resnet_mod.ResNet18Slim,  # test-size twin
        }
        if self.cfg.backbone not in factories:
            raise ValueError(f"unknown backbone {self.cfg.backbone}")
        self.backbone = factories[self.cfg.backbone](dtype=dtype)
        self.fpn = FPN(channels=self.cfg.fpn_channels,
                       levels=tuple(self.cfg.fpn_levels), dtype=dtype)
        self.heads = FCOSHeads(
            num_classes=self.cfg.num_classes, depth=self.cfg.head_depth,
            channels=self.cfg.fpn_channels, levels=tuple(self.cfg.fpn_levels),
            dtype=dtype,
        )
        if self.cfg.embed_dim > 0:
            self.reid = ReIDHead(embed_dim=self.cfg.embed_dim,
                                 channels=self.cfg.fpn_channels, dtype=dtype)

    def __call__(self, images, train: bool = False):
        c_feats = self.backbone(images, train=train)
        p_feats = self.fpn(c_feats)
        head_out = self.heads(p_feats)
        return head_out, p_feats

    def embed(self, pooled):
        """ReID embeddings for RoIAligned features (R, P, P, C) -> (R, E)."""
        return self.reid(pooled)

    def init_all(self, images):
        """Init-time method touching every submodule (setup-style modules only
        create params for branches actually executed)."""
        head_out, p_feats = self(images)
        if self.cfg.embed_dim > 0:
            lvl0 = min(self.cfg.fpn_levels)
            c = p_feats[lvl0].shape[-1]
            self.embed(jnp.zeros((1, 7, 7, c), p_feats[lvl0].dtype))
        return head_out


def _level_candidates(
    cls_logits: jnp.ndarray,   # (H, W, K)
    ltrb: jnp.ndarray,         # (H, W, 4) stride units
    ctr: jnp.ndarray,          # (H, W, 1)
    stride: int,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-level top-k candidates: (boxes (k,4), scores (k,), classes (k,))."""
    h, w, num_classes = cls_logits.shape
    prob = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    ctr_prob = jax.nn.sigmoid(ctr.astype(jnp.float32))
    score = jnp.sqrt(jnp.maximum(prob * ctr_prob, 0.0))        # (H, W, K) FCOS
    boxes = decode_level(ltrb[None], stride)[0]                # (H, W, 4)

    flat_scores = score.reshape(-1)                             # (H*W*K,)
    k_eff = min(k, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat_scores, k_eff)
    loc_idx = top_idx // num_classes
    cls_idx = (top_idx % num_classes).astype(jnp.int32)
    top_boxes = boxes.reshape(-1, 4)[loc_idx]
    return top_boxes, top_scores, cls_idx


def gather_candidates(
    head_out: Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    cfg: DetectorConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single image: per-level top-k candidates concatenated over levels.

    Returns (boxes (C,4), scores (C,), classes (C,)). Exposed separately so
    TTA (C19) can merge candidate sets from several views before one NMS.
    """
    cand_boxes, cand_scores, cand_classes = [], [], []
    for lvl in cfg.fpn_levels:
        cls_l, ltrb_l, ctr_l = head_out[lvl]
        b, s, c = _level_candidates(
            cls_l, ltrb_l, ctr_l, stride=2 ** lvl, k=cfg.pre_nms_topk
        )
        cand_boxes.append(b)
        cand_scores.append(s)
        cand_classes.append(c)
    return (
        jnp.concatenate(cand_boxes, axis=0),
        jnp.concatenate(cand_scores, axis=0),
        jnp.concatenate(cand_classes, axis=0),
    )


def select_detections(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    cfg: DetectorConfig,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Class-aware Pallas NMS + final top-D selection over candidates."""
    # global cross-level cap: NMS block count scales with candidate count,
    # and the tail below ~1k scores never survives anyway
    if 0 < cfg.nms_topk < boxes.shape[0]:
        scores, sel = jax.lax.top_k(scores, cfg.nms_topk)
        boxes = boxes[sel]
        classes = classes[sel]
    shifted = boxes + (classes.astype(jnp.float32) * _CLASS_NMS_OFFSET)[:, None]
    _nms_boxes, nms_scores, keep_idx, valid = nms(
        shifted, scores,
        iou_threshold=cfg.nms_iou_threshold,
        max_outputs=cfg.max_detections,
        score_threshold=cfg.score_threshold,
        interpret=interpret,
    )
    safe_idx = jnp.clip(keep_idx, 0, boxes.shape[0] - 1)
    out_boxes = jnp.where(valid[:, None], boxes[safe_idx], 0.0)
    out_classes = jnp.where(valid, classes[safe_idx], 0)
    return out_boxes, nms_scores, out_classes, valid


def postprocess_single(
    head_out: Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    cfg: DetectorConfig,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single image: head outputs -> (boxes (D,4), scores, classes, valid)."""
    boxes, scores, classes = gather_candidates(head_out, cfg)
    return select_detections(boxes, scores, classes, cfg, interpret=interpret)


class DetectorRunner:
    """Jitted detect() producing tracker-ready Detections.

    Batch axis = cameras and/or frames (shared-backbone multi-camera batch,
    BASELINE config 4).
    """

    def __init__(self, cfg: Optional[DetectorConfig] = None, interpret: bool | None = None):
        self.cfg = cfg or DetectorConfig()
        self.module = Detector(self.cfg)
        self._interpret = interpret
        self._detect = jax.jit(self._detect_impl)

    def init_params(self, rng, batch_size: int = 1):
        h, w = self.cfg.image_size
        images = jnp.zeros((batch_size, h, w, 3), jnp.float32)
        return self.module.init(rng, images, method=Detector.init_all)

    def _detect_impl(self, params, images) -> Detections:
        n = images.shape[0]
        head_out, p_feats = self.module.apply(params, images)

        def single(i):
            per_img = {
                lvl: tuple(t[i] for t in head_out[lvl]) for lvl in self.cfg.fpn_levels
            }
            boxes, scores, classes, valid = postprocess_single(
                per_img, self.cfg, interpret=self._interpret
            )
            if self.cfg.embed_dim > 0:
                lvl0 = min(self.cfg.fpn_levels)
                pooled = roi_align(
                    p_feats[lvl0][i], boxes, spatial_scale=1.0 / (2 ** lvl0),
                    output_size=7,
                )
                embeds = self.module.apply(params, pooled, method=Detector.embed)
                embeds = embeds * valid[:, None]
            else:
                embeds = jnp.zeros((boxes.shape[0], 1), jnp.float32)
            return Detections(
                boxes=boxes, scores=scores, classes=classes,
                embeds=embeds, valid=valid,
            )

        # sequential per image inside the jit: NMS/RoIAlign are Pallas calls
        # (not vmap-batchable); n is small (cameras x chunk)
        dets = [single(i) for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *dets)

    def detect(self, params, images) -> Detections:
        """images (N, H, W, 3) float32 [0,1]-ish -> batched Detections (N, D, ...)."""
        return self._detect(params, images)
