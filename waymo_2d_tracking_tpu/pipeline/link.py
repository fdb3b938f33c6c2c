"""Cross-camera track identity linking (SURVEY.md §5 long-horizon re-ID on
the product surface — wires parallel/ring.py's ring-sharded gallery scoring,
VERDICT r1 weak #4).

One driving context records 5 cameras; a physical object leaving one
camera's frustum reappears in another with a new per-camera track id. This
offline pass unifies identities: every camera's final track-table
embeddings (the ``.gallery.npz`` sidecars run_segments writes) are scored
against every OTHER camera's; mutual cosine matches above a threshold are
merged by union-find into global ids, and the per-camera track files are
rewritten with ``g{n}`` object ids.

The scoring is the §5 mechanism: with a device mesh, the concatenated
cross-camera gallery is ring-sharded over the 'data' axis and each camera's
queries orbit the ring via ppermute (``ring_gallery_topmatch``) — the
pattern that scales to whole-drive galleries that exceed one chip's HBM.
Without a mesh (or on one device) the same scores come from a dense matmul;
both paths are tested equal.

CLI: ``w2t link --out-dir OUT [--threshold 0.6]``
"""
from __future__ import annotations

import glob
import json
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from waymo_2d_tracking_tpu.io_out import submission as subm
from waymo_2d_tracking_tpu.types import SLOT_EMPTY


class _UnionFind:
    def __init__(self):
        self.parent: Dict = {}

    def find(self, a):
        p = self.parent.setdefault(a, a)
        if p != a:
            p = self.parent[a] = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def write_gallery_sidecar(path_jsonl: str, state, cam_index=None) -> None:
    """Final track-table embeddings next to a track JSONL — the input
    contract of `w2t link` (load_galleries below). ONE writer for every
    pipeline (run_segments / sharded / multicam); a schema change here
    cannot desynchronize the producers.

    state: host TrackerState (optionally with a leading camera/shard axis
    selected by cam_index). No-op when the config has no ReID embeddings.
    """
    sel = (lambda x: x[cam_index]) if cam_index is not None else (lambda x: x)
    if state.embed.shape[-1] <= 1:
        return
    np.savez(
        path_jsonl[: -len(".jsonl")] + ".gallery.npz",
        track_id=np.asarray(sel(state.track_id)),
        status=np.asarray(sel(state.status)),
        embed=np.asarray(sel(state.embed), np.float32),
    )


def load_galleries(out_dir: str) -> Dict[str, Dict[int, Tuple[np.ndarray, np.ndarray]]]:
    """{context: {camera: (track_ids (K,), embeds (K, E))}} with empty slots
    dropped (valid tracks only)."""
    out: Dict[str, Dict[int, Tuple[np.ndarray, np.ndarray]]] = {}
    for path in sorted(glob.glob(os.path.join(out_dir, "*.gallery.npz"))):
        m = re.match(r"(.+)_(\d+)\.gallery\.npz$", os.path.basename(path))
        if not m:
            continue
        ctx, cam = m.group(1), int(m.group(2))
        z = np.load(path)
        keep = (z["status"] != SLOT_EMPTY) & (z["track_id"] >= 0)
        out.setdefault(ctx, {})[cam] = (z["track_id"][keep], z["embed"][keep])
    return out


def best_cross_camera_matches(
    cams: Dict[int, Tuple[np.ndarray, np.ndarray]],
    mesh=None,
) -> List[Tuple[int, int, int, int, float]]:
    """For each track, its best match among all OTHER cameras' tracks.

    Returns rows (cam, track_id, other_cam, other_track_id, cosine_sim).
    With a mesh, scoring runs through the ring-sharded gallery kernel
    (padded to mesh-divisible sizes); else a dense numpy matmul.
    """
    cam_ids = sorted(cams)
    all_ids: List[Tuple[int, int]] = []   # (camera, track_id) per gallery row
    embeds: List[np.ndarray] = []
    for c in cam_ids:
        ids, emb = cams[c]
        all_ids.extend((c, int(t)) for t in ids)
        embeds.append(emb)
    if not all_ids:
        return []
    gallery = np.concatenate(embeds, axis=0).astype(np.float32)   # (N, E)
    n = gallery.shape[0]
    cam_of_row = np.array([c for c, _ in all_ids])

    rows: List[Tuple[int, int, int, int, float]] = []
    for c in cam_ids:
        ids, queries = cams[c]
        if len(ids) == 0:
            continue
        valid = cam_of_row != c                    # exclude own camera
        if mesh is not None:
            sims, idx = _ring_scores(queries, gallery, valid, mesh)
        else:
            s = queries.astype(np.float32) @ gallery.T            # (Q, N)
            s[:, ~valid] = -2.0
            idx = s.argmax(axis=1)
            sims = s[np.arange(len(ids)), idx]
            idx = np.where(sims <= -2.0, -1, idx)
        for q, (g, sim) in enumerate(zip(idx, sims)):
            if g < 0:
                continue
            oc, ot = all_ids[int(g)]
            rows.append((c, int(ids[q]), oc, ot, float(sim)))
    return rows


def _ring_scores(queries, gallery, valid, mesh):
    """Score via the ring-sharded gallery kernel with mesh-divisible padding."""
    import jax.numpy as jnp

    from waymo_2d_tracking_tpu.parallel.ring import ring_gallery_topmatch

    n_dev = mesh.devices.size
    q, e = queries.shape
    n = gallery.shape[0]
    qp = (-q) % n_dev
    np_ = (-n) % n_dev
    queries_p = np.concatenate([queries, np.zeros((qp, e), np.float32)], axis=0)
    gallery_p = np.concatenate([gallery, np.zeros((np_, e), np.float32)], axis=0)
    valid_p = np.concatenate([valid, np.zeros((np_,), bool)], axis=0)
    sims, idx = ring_gallery_topmatch(
        jnp.asarray(queries_p), jnp.asarray(gallery_p), jnp.asarray(valid_p), mesh
    )
    sims = np.asarray(sims)[:q]
    idx = np.asarray(idx)[:q]
    return sims, np.where(idx >= n, -1, idx)


def link_context(
    cams: Dict[int, Tuple[np.ndarray, np.ndarray]],
    threshold: float = 0.6,
    mesh=None,
) -> Dict[Tuple[int, int], str]:
    """(camera, track_id) -> global id ('g<n>') for one context. Mutual
    best matches above ``threshold`` merge; everything else keeps a
    singleton global id (so output ids are globally consistent either way).
    """
    rows = best_cross_camera_matches(cams, mesh=mesh)
    best: Dict[Tuple[int, int], Tuple[int, int, float]] = {
        (c, t): (oc, ot, s) for c, t, oc, ot, s in rows
    }
    uf = _UnionFind()
    for (c, t), (oc, ot, s) in best.items():
        if s < threshold:
            continue
        back = best.get((oc, ot))
        if back and back[0] == c and back[1] == t and back[2] >= threshold:
            uf.union((c, t), (oc, ot))            # mutual best match
    mapping: Dict[Tuple[int, int], str] = {}
    root_gid: Dict = {}
    for c in sorted(cams):
        ids, _ = cams[c]
        for t in ids:
            root = uf.find((c, int(t)))
            gid = root_gid.setdefault(root, len(root_gid))
            mapping[(c, int(t))] = f"g{gid}"
    return mapping


def link_tracks(
    out_dir: str,
    linked_dir: Optional[str] = None,
    threshold: float = 0.6,
    mesh=None,
) -> dict:
    """Rewrite per-(context, camera) track files with unified global ids.

    Returns a report: contexts, tracks, merged groups."""
    linked_dir = linked_dir or os.path.join(out_dir, "linked")
    os.makedirs(linked_dir, exist_ok=True)
    galleries = load_galleries(out_dir)
    n_tracks = n_merged = 0
    for ctx, cams in sorted(galleries.items()):
        mapping = link_context(cams, threshold=threshold, mesh=mesh)
        n_tracks += len(mapping)
        n_merged += len(mapping) - len(set(mapping.values()))
        for cam in sorted(cams):
            src = os.path.join(out_dir, f"{ctx}_{cam}.jsonl")
            if not os.path.exists(src):
                continue
            import dataclasses

            records = subm.read_jsonl(src)
            out = []
            for r in records:
                # emitted ids are "{camera}_{track_id}" (submission.py)
                try:
                    tid = int(str(r.object_id).rsplit("_", 1)[-1])
                except ValueError:
                    tid = None
                gid = mapping.get((cam, tid)) if tid is not None else None
                out.append(
                    r if gid is None else dataclasses.replace(r, object_id=gid)
                )
            subm.write_jsonl(os.path.join(linked_dir, f"{ctx}_{cam}.jsonl"), out)
    return {
        "contexts": len(galleries),
        "tracks": n_tracks,
        "cross_camera_merges": n_merged,
        "out": linked_dir,
    }
