"""Full detector: ResNet-50 + FPN + FCOS heads + ReID, with device-side
post-processing (components C5-C11 assembled).

The reference runs backbone/heads on GPU, then NMS/top-k/RoI via CUDA
extensions and copies results to host per frame (SURVEY.md §3.1). Here the
whole path — forward, score decode, per-level candidate top-k, class-aware
Pallas NMS, RoIAlign + ReID embedding — is one jitted computation emitting a
fixed-shape ``Detections`` pytree that feeds the tracker directly on device.
"""
from __future__ import annotations

import contextlib
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
from waymo_2d_tracking_tpu.ops.nms import nms_batched
from waymo_2d_tracking_tpu.ops.roi_align import (
    roi_align_batched,
    roi_align_multilevel_batched,
)
from waymo_2d_tracking_tpu.types import Detections

# class-aware NMS: boxes of different classes are offset far apart so one
# class-agnostic NMS pass never cross-suppresses (torchvision "batched_nms"
# trick, reimplemented).
_CLASS_NMS_OFFSET = 1e5


def _merge_collection(variables, name: str, updates):
    """Deep-merge an updated flax collection into a variables dict (a
    partial apply — e.g. embed-only — returns only the entries it visited,
    so a plain replacement would drop the rest)."""

    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            out[k] = merge(dst[k], v) if (
                k in dst and isinstance(v, dict) and isinstance(dst[k], dict)
            ) else v
        return out

    variables = dict(variables)
    variables[name] = merge(dict(variables.get(name, {})), dict(updates))
    return variables


def _pool_reid_features(p_feats, boxes, cfg: DetectorConfig):
    """RoIAlign pyramid features for ReID — the ONE pooling rule shared by
    inference (_detect_impl) and training (forward_train), so the learned
    metric sees identical feature distributions in both."""
    if cfg.reid_multilevel:
        # pool from P3..P5 only (the torchvision MultiScaleRoIAlign
        # convention): P6/P7 are detection-only extra-stride levels
        lvls = [l for l in cfg.fpn_levels if l <= 5]
        return roi_align_multilevel_batched(
            {lvl: p_feats[lvl] for lvl in lvls},
            boxes,
            {lvl: 2 ** lvl for lvl in lvls},
            output_size=7,
        )
    lvl0 = min(cfg.fpn_levels)
    return roi_align_batched(
        p_feats[lvl0], boxes, spatial_scale=1.0 / (2 ** lvl0), output_size=7,
    )


def _precision_ctx(cfg: DetectorConfig):
    """float32 configs get TRUE f32 math on every backend.

    XLA:TPU's DEFAULT matmul/conv precision computes f32 convs with one
    bf16x bf16 MXU pass (~2^-8 relative error); CPU computes true f32. On
    the trained pixels fixture that stem-level 0.3% error amplifies through
    18 conv/BN layers into detection-score deltas up to 0.48, flipping the
    tracker's 0.55/0.65 gates on ~30 frame-slots of the seed-5 golden clip
    — the entire CPU<->TPU MOTA divergence (0.799 vs 0.887) diagnosed in
    round 5 (tools/diag_backend_drift.py; BASELINE.md "backend drift").
    dtype='float32' is the quality/parity path, so it gets HIGHEST
    (bf16x3 passes, f32-equivalent); the perf presets all run
    dtype='bfloat16' where DEFAULT is already exact for bf16 inputs —
    their speed is untouched.
    """
    if cfg.dtype == "float32":
        return jax.default_matmul_precision("highest")
    return contextlib.nullcontext()


class Detector(nn.Module):
    """Raw forward: images (N, H, W, 3) -> per-level head outputs + P3."""

    cfg: DetectorConfig
    # train-time backbone rematerialization (TrainConfig.remat); inference
    # builds leave this False — see models/resnet.py ResNet.remat
    remat: bool = False
    # w8a8 inference quantization mode: 'off' (float; ALWAYS used for
    # training — cfg.quant is inference-only), 'calib' (float + record
    # activation absmax into the 'quant' collection), 'int8' (quantized
    # conv trunk; models/quant.py). Param tree is identical in all modes.
    quant: str = "off"

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
        self.backbone = factories[self.cfg.backbone](
            dtype=dtype, stem=self.cfg.stem, remat=self.remat,
            quant=self.quant,
        )
        self.fpn = FPN(channels=self.cfg.fpn_channels,
                       levels=tuple(self.cfg.fpn_levels), dtype=dtype,
                       quant=self.quant)
        # quant_scope='trunk': the backbone/FPN (where the FLOPs are) run
        # int8, the head towers + ReID stay float — their outputs feed the
        # sigmoid/exp score decode and the cosine metric, where per-tensor
        # quant step noise moves the tracker's gates directly (measured on
        # the trained pixels fixture: scope 'all' collapses seed-5 MOTA
        # 0.797 -> 0.634; BASELINE.md int8-quality table).
        head_quant = self.quant if self.cfg.quant_scope == "all" else "off"
        if self.cfg.head_family == "centernet":
            from waymo_2d_tracking_tpu.models.centernet import CenterNetHeads

            self.heads = CenterNetHeads(
                num_classes=self.cfg.num_classes, depth=self.cfg.head_depth,
                channels=self.cfg.head_channels or self.cfg.fpn_channels,
                level=self.cfg.centernet_level,
                dtype=dtype, quant=head_quant,
            )
        else:
            self.heads = FCOSHeads(
                num_classes=self.cfg.num_classes, depth=self.cfg.head_depth,
                channels=self.cfg.head_channels or self.cfg.fpn_channels,
                levels=tuple(self.cfg.fpn_levels),
                dtype=dtype, quant=head_quant,
            )
        if self.cfg.embed_dim > 0:
            self.reid = ReIDHead(
                embed_dim=self.cfg.embed_dim,
                channels=self.cfg.reid_channels or self.cfg.fpn_channels,
                dtype=dtype, quant=head_quant,
            )

    def __call__(self, images, train: bool = False):
        with _precision_ctx(self.cfg):
            c_feats = self.backbone(images, train=train)
            p_feats = self.fpn(c_feats)
            head_out = self.heads(p_feats)
        return head_out, p_feats

    def embed(self, pooled):
        """ReID embeddings for RoIAligned features (R, P, P, C) -> (R, E)."""
        with _precision_ctx(self.cfg):
            return self.reid(pooled)

    def forward_train(self, images, rois=None):
        """Training forward: head outputs plus (optionally) ReID embeddings
        of the GT boxes — ONE apply so BatchNorm mutation stays coherent.

        rois: (N, G, 4) xyxy GT boxes (padded; callers mask by validity).
        Returns (head_out, embeds (N, G, E) or None). The embeddings train
        the ReID tower with a metric loss (train/losses.py
        reid_triplet_loss) — without this the tower only ever saw random
        init, VERDICT-class gap closed in round 3.
        """
        head_out, p_feats = self(images, train=True)
        embeds = None
        if rois is not None and self.cfg.embed_dim > 0:
            # pool exactly like inference (DetectorRunner._detect_impl) so
            # the trained metric sees the same feature distribution —
            # including the reid_multilevel scale-matched pooling
            with _precision_ctx(self.cfg):
                pooled = _pool_reid_features(p_feats, rois, self.cfg)
                n, g = rois.shape[:2]
                flat = pooled.reshape((n * g,) + pooled.shape[2:])
                embeds = self.reid(flat).reshape(n, g, -1)
        return head_out, embeds

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
    cls_logits: jnp.ndarray,   # (N, H, W, K)
    ltrb: jnp.ndarray,         # (N, H, W, 4) stride units
    ctr: jnp.ndarray,          # (N, H, W, 1)
    stride: int,
    k: int,
    method: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-level top-k candidates for a whole image batch:
    (boxes (N,k,4), scores (N,k), classes (N,k))."""
    n, h, w, num_classes = cls_logits.shape
    prob = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    ctr_prob = jax.nn.sigmoid(ctr.astype(jnp.float32))
    score = jnp.sqrt(jnp.maximum(prob * ctr_prob, 0.0))        # (N,H,W,K) FCOS
    boxes = decode_level(ltrb, stride)                          # (N,H,W,4)

    flat_scores = score.reshape(n, -1)                          # (N, H*W*K)
    k_eff = min(k, flat_scores.shape[1])
    if method == "approx":
        top_scores, top_idx = jax.lax.approx_max_k(flat_scores, k_eff)
    else:
        top_scores, top_idx = jax.lax.top_k(flat_scores, k_eff)
    loc_idx = top_idx // num_classes
    cls_idx = (top_idx % num_classes).astype(jnp.int32)
    top_boxes = jnp.take_along_axis(
        boxes.reshape(n, -1, 4), loc_idx[..., None], axis=1
    )
    return top_boxes, top_scores, cls_idx


def gather_candidates_batched(
    head_out: Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    cfg: DetectorConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched per-level top-k candidates concatenated over levels.

    head_out values are (N, H, W, ...) tensors. Returns (boxes (N,C,4),
    scores (N,C), classes (N,C)). Exposed separately so TTA (C19) can merge
    candidate sets from several views before one NMS.

    Dispatches on ``cfg.head_family`` — the centernet path produces the
    same (boxes, scores, classes) contract from heatmap peaks, so NMS,
    TTA union, ReID pooling and the tracker compose identically.
    """
    if cfg.head_family == "centernet":
        from waymo_2d_tracking_tpu.models.centernet import (
            gather_centernet_candidates_batched,
        )

        return gather_centernet_candidates_batched(head_out, cfg)
    cand_boxes, cand_scores, cand_classes = [], [], []
    for lvl in cfg.fpn_levels:
        cls_l, ltrb_l, ctr_l = head_out[lvl]
        b, s, c = _level_candidates(
            cls_l, ltrb_l, ctr_l, stride=2 ** lvl, k=cfg.pre_nms_topk,
            method=cfg.topk_method,
        )
        cand_boxes.append(b)
        cand_scores.append(s)
        cand_classes.append(c)
    return (
        jnp.concatenate(cand_boxes, axis=1),
        jnp.concatenate(cand_scores, axis=1),
        jnp.concatenate(cand_classes, axis=1),
    )


def gather_candidates(head_out, cfg):
    """Single-image variant of ``gather_candidates_batched`` (TTA path):
    head_out values are per-image (H, W, ...) tensors."""
    b, s, c = gather_candidates_batched(
        {lvl: tuple(t[None] for t in ts) for lvl, ts in head_out.items()},
        cfg,
    )
    return b[0], s[0], c[0]


def select_detections_batched(
    boxes: jnp.ndarray,        # (N, C, 4)
    scores: jnp.ndarray,       # (N, C)
    classes: jnp.ndarray,      # (N, C)
    cfg: DetectorConfig,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Class-aware Pallas NMS + final top-D selection, whole batch at once."""
    # global cross-level cap: NMS block count scales with candidate count,
    # and the tail below ~1k scores never survives anyway
    if 0 < cfg.nms_topk < boxes.shape[1]:
        scores, sel = jax.lax.top_k(scores, cfg.nms_topk)
        boxes = jnp.take_along_axis(boxes, sel[..., None], axis=1)
        classes = jnp.take_along_axis(classes, sel, axis=1)
    shifted = boxes + (classes.astype(jnp.float32) * _CLASS_NMS_OFFSET)[..., None]
    _nms_boxes, nms_scores, keep_idx, valid = nms_batched(
        shifted, scores,
        iou_threshold=cfg.nms_iou_threshold,
        max_outputs=cfg.max_detections,
        score_threshold=cfg.score_threshold,
        interpret=interpret,
    )
    safe_idx = jnp.clip(keep_idx, 0, boxes.shape[1] - 1)
    out_boxes = jnp.where(
        valid[..., None], jnp.take_along_axis(boxes, safe_idx[..., None], axis=1), 0.0
    )
    out_classes = jnp.where(valid, jnp.take_along_axis(classes, safe_idx, axis=1), 0)
    return out_boxes, nms_scores, out_classes, valid


def select_detections(boxes, scores, classes, cfg, interpret: bool | None = None):
    """Single-image variant of ``select_detections_batched`` (TTA path)."""
    b, s, c, v = select_detections_batched(
        boxes[None], scores[None], classes[None], cfg, interpret=interpret
    )
    return b[0], s[0], c[0], v[0]


def postprocess_batched(
    head_out: Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    cfg: DetectorConfig,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched head outputs -> (boxes (N,D,4), scores, classes, valid)."""
    boxes, scores, classes = gather_candidates_batched(head_out, cfg)
    return select_detections_batched(boxes, scores, classes, cfg, interpret=interpret)


def postprocess_single(
    head_out: Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    cfg: DetectorConfig,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single image: head outputs (H, W, ...) -> (boxes (D,4), scores,
    classes, valid)."""
    boxes, scores, classes = gather_candidates(head_out, cfg)
    return select_detections(boxes, scores, classes, cfg, interpret=interpret)


class DetectorRunner:
    """Jitted detect() producing tracker-ready Detections.

    Batch axis = cameras and/or frames (shared-backbone multi-camera batch,
    BASELINE config 4).
    """

    def __init__(self, cfg: Optional[DetectorConfig] = None, interpret: bool | None = None):
        self.cfg = cfg or DetectorConfig()
        self.module = Detector(self.cfg, quant=self.cfg.quant)
        self._interpret = interpret
        self._detect = jax.jit(self._detect_impl)
        if self.cfg.quant != "off":
            self._calib_module = Detector(self.cfg, quant="calib")
            self._calibrate = jax.jit(self._calibrate_impl)
        # weakref to a leaf of the last param tree that passed the
        # calibration guard (is_calibrated syncs every 'quant' leaf to host
        # — too costly per detect() call). A weakref, NOT id(params): ids
        # recycle after GC, so a fresh uncalibrated tree could alias the
        # passed one and silently skip the guard (review r4); a live leaf
        # identity can't alias, and leaves are immutable.
        self._calib_ok_leaf = None

    def init_params(self, rng, batch_size: int = 1):
        h, w = self.cfg.image_size
        images = jnp.zeros((batch_size, h, w, 3), jnp.float32)
        return self.module.init(rng, images, method=Detector.init_all)

    def calibrate(self, params, images):
        """One PTQ calibration pass (cfg.quant='int8'): run the FLOAT
        forward on representative images and fold the recorded per-conv
        activation absmax into the returned variables ('quant' collection).
        Call repeatedly to accumulate over several batches (absmax is a
        running maximum); detect() then uses the frozen scales."""
        if self.cfg.quant == "off":
            return params
        return self._calibrate(params, images)

    def _calibrate_impl(self, params, images):
        (head_out, p_feats), upd = self._calib_module.apply(
            params, images, mutable=["quant"]
        )
        params = _merge_collection(params, "quant", upd["quant"])
        if self.cfg.embed_dim > 0 and self.cfg.quant_scope == "all":
            # quant_scope='trunk' leaves the ReID tower float — it has no
            # 'quant' variables to calibrate (and flax's mutable apply
            # would return no 'quant' entry at all)
            # calibrate the ReID tower on REAL pooled features (its input
            # distribution), via the same postprocess as _detect_impl
            boxes, _, _, valid = postprocess_batched(
                head_out, self.cfg, interpret=self._interpret
            )
            pooled = _pool_reid_features(p_feats, boxes, self.cfg)
            # zero out invalid/padded slots: their RoIAlign output is a
            # degenerate-box artifact, not a serving-time input — letting it
            # into the absmax would skew the ReID tower's scales (ADVICE r3).
            # UNLESS the calibration batch has zero valid detections (e.g.
            # an online session's single dark first frame): all-zero pooled
            # features would record absmax 0 = "uncalibrated" and the
            # serving guard would raise on a legitimate stream — fall back
            # to the unmasked artifacts, which at least bound the range
            # (review r4).
            masked = pooled * valid[..., None, None, None].astype(pooled.dtype)
            pooled = jnp.where(jnp.any(valid), masked, pooled)
            n, d = boxes.shape[:2]
            flat = pooled.reshape((n * d,) + pooled.shape[2:])
            _, upd2 = self._calib_module.apply(
                params, flat, method=Detector.embed, mutable=["quant"]
            )
            params = _merge_collection(params, "quant", upd2["quant"])
        return params

    def _detect_impl(self, params, images) -> Detections:
        """Whole-batch detect: no Python loop over images — candidate top-k,
        Pallas NMS (gridded over the batch), RoIAlign, and the ReID head all
        run as single batched calls (round 1 serialized B postprocess chains
        per chunk, bloating both runtime and compile time).

        The whole impl runs under _precision_ctx so float32 configs get f32
        math in the RoIAlign separable matmuls and box decode too, not just
        inside the flax modules — embeddings feed cosine gates just as
        score-sensitive as the 0.55/0.65 thresholds."""
        with _precision_ctx(self.cfg):
            head_out, p_feats = self.module.apply(params, images)
            boxes, scores, classes, valid = postprocess_batched(
                head_out, self.cfg, interpret=self._interpret
            )
            n, d = boxes.shape[:2]
            if self.cfg.embed_dim > 0:
                pooled = _pool_reid_features(p_feats, boxes, self.cfg)
                flat = pooled.reshape((n * d,) + pooled.shape[2:])
                embeds = self.module.apply(params, flat, method=Detector.embed)
                embeds = embeds.reshape(n, d, -1) * valid[..., None]
            else:
                embeds = jnp.zeros((n, d, 1), jnp.float32)
        return Detections(
            boxes=boxes, scores=scores, classes=classes,
            embeds=embeds, valid=valid,
        )

    def check_calibrated(self, params) -> None:
        """Refuse to serve uncalibrated int8 (ADVICE r3 high): zero absmax
        falls back to scale 1.0 inside QuantConv — finite but wrong-scale
        outputs with no error. Every serving driver calibrates on its first
        real frames (pipeline/run.py calibrate_params_from_frames); anything
        that reaches a quantized forward without that step is a bug, and
        this raises instead of silently serving garbage.

        Host-syncs the 'quant' leaves once per quant state (memoized by a
        weakref to the FIRST LEAF OF THE 'quant' COLLECTION — keying off the
        whole tree's first leaf (ADVICE r4) let a tree that kept its weights
        but re-initialized 'quant' sail through the memo and serve with
        1.0-scale fallbacks, the exact failure this guard exists for)."""
        if self.cfg.quant == "off":
            return
        quant_leaves = jax.tree_util.tree_leaves(params.get("quant", {})) \
            if isinstance(params, dict) else []
        leaf = quant_leaves[0] if quant_leaves else None
        if (
            leaf is not None
            and self._calib_ok_leaf is not None
            and self._calib_ok_leaf() is leaf
        ):
            return
        from waymo_2d_tracking_tpu.models.quant import is_calibrated

        if not is_calibrated(params):
            raise RuntimeError(
                "detector.quant='int8' but the params carry no calibrated "
                "activation scales ('quant' collection absmax == 0). Run "
                "DetectorRunner.calibrate(params, representative_images) "
                "first — the pipeline drivers do this automatically on "
                "their first chunk (SegmentPipeline/MultiCamPipeline/"
                "OnlineTracker), or restore a calibrated checkpoint."
            )
        if leaf is not None:
            import weakref

            self._calib_ok_leaf = weakref.ref(leaf)

    def detect(self, params, images) -> Detections:
        """images (N, H, W, 3) float32 [0,1]-ish -> batched Detections (N, D, ...)."""
        self.check_calibrated(params)
        return self._detect(params, images)
