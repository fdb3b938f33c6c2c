"""Every committed configs/*.yaml preset must load into a valid Config
(unknown keys are rejected by config._update, so this catches preset/schema
drift), and the acceptance-matrix semantics of each preset must hold.

The five numbered presets are the BASELINE.json acceptance configs; the
production/fast presets are the round-2 measured bench points (BASELINE.md).
"""
import glob
import os

import pytest

from waymo_2d_tracking_tpu.config import load_config

CONFIGS_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "configs")
ALL_PRESETS = sorted(glob.glob(os.path.join(CONFIGS_DIR, "*.yaml")))


def test_presets_exist():
    names = {os.path.basename(p) for p in ALL_PRESETS}
    required = {
        "config1_tracker_cpu.yaml", "config2_detector_iou.yaml",
        "config3_reid_fused.yaml", "config4_multicam.yaml",
        "config5_full_sweep.yaml", "production.yaml", "fast.yaml",
        "headline.yaml", "train_detector.yaml",
    }
    assert required <= names, required - names


@pytest.mark.parametrize("path", ALL_PRESETS, ids=os.path.basename)
def test_preset_loads(path):
    cfg = load_config(path)
    assert cfg.tracker.max_tracks > 0
    assert cfg.tracker.assignment in ("auction", "greedy")
    assert cfg.detector.stem in ("conv7", "s2d")


def test_acceptance_matrix_semantics():
    c1 = load_config(os.path.join(CONFIGS_DIR, "config1_tracker_cpu.yaml"))
    assert c1.tracker.embed_dim == 0 and c1.tracker.appearance_weight == 0.0

    c2 = load_config(os.path.join(CONFIGS_DIR, "config2_detector_iou.yaml"))
    assert c2.detector.backbone == "resnet50"
    assert tuple(c2.detector.image_size) == (1280, 1920)
    assert c2.detector.embed_dim == 0

    c3 = load_config(os.path.join(CONFIGS_DIR, "config3_reid_fused.yaml"))
    assert c3.detector.embed_dim > 0 and c3.tracker.appearance_weight > 0

    c4 = load_config(os.path.join(CONFIGS_DIR, "config4_multicam.yaml"))
    assert len(c4.pipeline.cameras) == 5

    c5 = load_config(os.path.join(CONFIGS_DIR, "config5_full_sweep.yaml"))
    assert c5.pipeline.tta_flip and len(c5.pipeline.tta_scales) > 1
    assert c5.tracker.reid_recovery

    prod = load_config(os.path.join(CONFIGS_DIR, "production.yaml"))
    assert prod.detector.backbone == "resnet34"
    assert prod.detector.stem == "s2d"
    assert tuple(prod.detector.image_size) == (512, 768)
    assert prod.tracker.assignment == "auction"   # SORT parity on the headline

    fast = load_config(os.path.join(CONFIGS_DIR, "fast.yaml"))
    assert fast.tracker.assignment == "greedy"
    assert fast.detector.embed_dim == 0
    # Waymo native 1280x1920 must letterbox to these presets without padding
    for cfg, scale in ((prod, 2.5), (fast, 1280 / 384)):
        h, w = cfg.detector.image_size
        assert abs(1280 / h - 1920 / w) < 1e-9


def test_headline_preset_semantics():
    """bench.py default since round 3: appearance association AND recovery
    must stay ON (the quality-bearing claim of BASELINE.md round 3)."""
    hl = load_config(os.path.join(CONFIGS_DIR, "headline.yaml"))
    assert hl.detector.embed_dim == 128 and hl.tracker.embed_dim == 128
    assert hl.tracker.appearance_weight > 0
    assert hl.tracker.reid_recovery and hl.tracker.gallery_size > 1
    # round 3: n=64 auction == greedy speed, so the headline keeps
    # scipy-equal Hungarian semantics
    assert hl.tracker.assignment == "auction"
    h, w = hl.detector.image_size
    assert abs(1280 / h - 1920 / w) < 1e-9   # exact Waymo 2:3 letterbox
    assert hl.pipeline.chunk_frames == 128


def test_invalid_assignment_rejected():
    """ADVICE r2: a typo'd tracker.assignment must raise, not silently fall
    back to the auction path."""
    import dataclasses

    import pytest as _pytest

    from waymo_2d_tracking_tpu.config import TrackerConfig

    with _pytest.raises(ValueError, match="assignment"):
        TrackerConfig(assignment="greeedy")
    with _pytest.raises(ValueError, match="assignment"):
        dataclasses.replace(TrackerConfig(), assignment="hungarian")


def test_train_preset_semantics():
    """Committed training recipe: EMA + ReID metric loss + input pipeline
    on, detector shape drop-in compatible with production.yaml."""
    tr = load_config(os.path.join(CONFIGS_DIR, "train_detector.yaml"))
    prod = load_config(os.path.join(CONFIGS_DIR, "production.yaml"))
    assert tr.detector == prod.detector
    assert tr.train.ema_decay > 0.99
    assert tr.train.reid_loss_weight > 0 and tr.detector.embed_dim > 0
    assert tr.train.input_workers > 0 and tr.train.input_prefetch > 0
