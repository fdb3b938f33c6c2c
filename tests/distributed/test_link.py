"""Cross-camera identity linking (pipeline/link.py): mutual-best cosine
matches merge into global ids; the mesh path scores through the
ring-sharded gallery (parallel/ring.py — its production wiring) and must
equal the dense path exactly."""
import json
import os

import numpy as np
import pytest

from waymo_2d_tracking_tpu.io_out import submission as subm
from waymo_2d_tracking_tpu.parallel.sharding import make_mesh
from waymo_2d_tracking_tpu.pipeline import link as lk


def unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def make_cams(e=8):
    """Two cameras; track (1, 10) and (2, 20) share an appearance; the rest
    are orthogonal-ish singletons."""
    rng = np.random.default_rng(0)
    shared = unit(rng.standard_normal(e))
    cams = {
        1: (np.array([10, 11]), np.stack([shared, unit(rng.standard_normal(e))])),
        2: (np.array([20, 21]), np.stack([shared, unit(rng.standard_normal(e))])),
    }
    return cams


def test_mutual_best_merges_and_threshold_gates():
    cams = make_cams()
    mapping = lk.link_context(cams, threshold=0.9)
    assert mapping[(1, 10)] == mapping[(2, 20)]       # shared appearance merged
    assert mapping[(1, 11)] != mapping[(2, 21)]       # random ones stay apart
    # total global ids: 3 (merged pair + 2 singletons)
    assert len(set(mapping.values())) == 3
    # impossible threshold -> no merges
    mapping2 = lk.link_context(cams, threshold=1.1)
    assert len(set(mapping2.values())) == 4


def test_ring_path_equals_dense_path():
    cams = make_cams(e=16)
    mesh = make_mesh()
    dense = lk.best_cross_camera_matches(cams, mesh=None)
    ring = lk.best_cross_camera_matches(cams, mesh=mesh)
    assert len(dense) == len(ring)
    for d, r in zip(sorted(dense), sorted(ring)):
        assert d[:4] == r[:4]
        np.testing.assert_allclose(d[4], r[4], atol=1e-5)
    assert lk.link_context(cams, threshold=0.9, mesh=mesh) == lk.link_context(
        cams, threshold=0.9, mesh=None
    )


def test_link_tracks_end_to_end(tmp_path):
    out = str(tmp_path)
    e = 8
    cams = make_cams(e)
    # track files + gallery sidecars as run_segments would write them
    for cam, (ids, emb) in cams.items():
        recs = [
            subm.TrackRecord.from_xyxy("ctxL", 1000 * t, cam, f"{cam}_{tid}",
                                       1, (10, 10, 20, 20), 0.9)
            for tid in ids for t in range(2)
        ]
        subm.write_jsonl(os.path.join(out, f"ctxL_{cam}.jsonl"), recs)
        s = 4  # slot-table capacity 4, two real tracks
        track_id = np.full(s, -1, np.int32)
        status = np.zeros(s, np.int8)
        embed = np.zeros((s, e), np.float32)
        track_id[:2] = ids
        status[:2] = 2  # confirmed
        embed[:2] = emb
        np.savez(os.path.join(out, f"ctxL_{cam}.gallery.npz"),
                 track_id=track_id, status=status, embed=embed)

    report = lk.link_tracks(out, threshold=0.9)
    assert report["contexts"] == 1
    assert report["cross_camera_merges"] == 1
    linked1 = subm.read_jsonl(os.path.join(out, "linked", "ctxL_1.jsonl"))
    linked2 = subm.read_jsonl(os.path.join(out, "linked", "ctxL_2.jsonl"))
    ids1 = {r.object_id for r in linked1}
    ids2 = {r.object_id for r in linked2}
    assert ids1 & ids2, "shared object got different ids across cameras"
    assert all(i.startswith("g") for i in ids1 | ids2)


def test_cli_link(tmp_path, capsys):
    from waymo_2d_tracking_tpu import cli

    out = str(tmp_path)
    cams = make_cams()
    for cam, (ids, emb) in cams.items():
        subm.write_jsonl(os.path.join(out, f"ctxC_{cam}.jsonl"), [
            subm.TrackRecord.from_xyxy("ctxC", 0, cam, f"{cam}_{tid}", 1,
                                       (0, 0, 5, 5), 0.5)
            for tid in ids
        ])
        np.savez(os.path.join(out, f"ctxC_{cam}.gallery.npz"),
                 track_id=np.asarray(ids, np.int32),
                 status=np.full(len(ids), 2, np.int8),
                 embed=emb.astype(np.float32))
    cli.main(["link", "--out-dir", out, "--threshold", "0.9", "--sharded"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["cross_camera_merges"] == 1
