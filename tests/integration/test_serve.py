"""`w2t serve` daemon: wire protocol round-trip over an AF_UNIX socket.

Covers: raw-ndarray frames, JPEG frames, stats, reset, graceful close,
and that with --warmup the server pre-compiles before binding (socket
existence = ready; without --warmup the first frame pays the compile).
"""
import json
import os
import threading
import time

import numpy as np
import pytest

from waymo_2d_tracking_tpu import cli
from waymo_2d_tracking_tpu.pipeline.server import TrackingClient

TINY = [
    "detector.backbone=resnet18slim", "detector.image_size=[64,96]",
    "detector.fpn_channels=32", "detector.head_depth=1",
    "detector.pre_nms_topk=32", "detector.max_detections=8",
    "detector.embed_dim=0", "detector.dtype=float32",
    "detector.score_threshold=0.01",
    "tracker.max_tracks=16", "tracker.max_detections=8",
    "tracker.embed_dim=0", "tracker.score_threshold=0.0",
    "tracker.birth_score_threshold=0.0", "tracker.n_init=1",
]


def test_serve_roundtrip(tmp_path):
    import cv2

    sock = str(tmp_path / "w2t.sock")
    argv = ["serve", "--socket", sock, "--max-requests", "20",
            "--warmup", "64", "96", "--set"] + TINY
    th = threading.Thread(target=cli.main, args=(argv,), daemon=True)
    th.start()
    # the server warms up (compiles) BEFORE binding; socket file = ready
    for _ in range(1200):
        if os.path.exists(sock):
            break
        time.sleep(0.1)
    else:
        pytest.fail("server socket never appeared (compile hang?)")

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    jpeg = cv2.imencode(".jpg", frame[:, :, ::-1])[1].tobytes()

    with TrackingClient(socket_path=sock) as c:
        r1 = c.step(frame, timestamp_micros=100)  # raw ndarray path
        assert r1["ok"] and isinstance(r1["records"], list)
        assert r1["latency_ms"] > 0
        for rec in r1["records"]:
            assert rec["timestamp_micros"] == 100

        r2 = c.step(jpeg, timestamp_micros=200)   # JPEG path
        assert r2["ok"]

        st = c.stats()
        assert st["stats"]["count"] == 2

        c.reset(context_name="ctxB")
        r3 = c.step(frame, timestamp_micros=300)
        assert r3["ok"]
        for rec in r3["records"]:
            assert rec["context_name"] == "ctxB"

        c.close_server()
    th.join(timeout=60)
    assert not th.is_alive()
    assert not os.path.exists(sock)  # unlinked on shutdown


def test_serve_scaled_decode_roundtrip(tmp_path):
    """decode_scale_denom=2 over the wire (round 4): compressed payloads
    decode scaled IN THE SESSION (not full-res in the server), records map
    back to full-res pixels, and --warmup H W (full-res dims) pre-compiles
    the scaled step shape so the first compressed frame pays no compile."""
    import cv2

    sock = str(tmp_path / "w2t_sd.sock")
    argv = ["serve", "--socket", sock, "--max-requests", "10",
            "--warmup", "128", "192", "--set"] + TINY + [
            "pipeline.decode_scale_denom=2"]
    th = threading.Thread(target=cli.main, args=(argv,), daemon=True)
    th.start()
    for _ in range(1200):
        if os.path.exists(sock):
            break
        time.sleep(0.1)
    else:
        pytest.fail("server socket never appeared (compile hang?)")

    rng = np.random.default_rng(1)
    # full-res 128x192 source; the session steps at 64x96 (denom 2)
    frame = rng.integers(0, 255, (128, 192, 3), dtype=np.uint8)
    frame[40:90, 60:150] = 255  # a bright blob so something detects
    jpeg = cv2.imencode(".jpg", frame[:, :, ::-1])[1].tobytes()

    with TrackingClient(socket_path=sock) as c:
        r = c.step(jpeg, timestamp_micros=100)
        assert r["ok"], r
        for rec in r["records"]:
            # box coordinates must be in FULL-RES pixels: anything beyond
            # the scaled 64x96 frame proves the /denom composition applied
            assert 0 <= rec["center_x"] <= 192 + 8
            assert 0 <= rec["center_y"] <= 128 + 8
        # raw full-res array payload still works in the same server (its
        # own warmed shape)
        r2 = c.step(frame, timestamp_micros=200)
        assert r2["ok"], r2
        c.close_server()
    th.join(timeout=60)
    assert not th.is_alive()


def test_serve_rejects_bad_message(tmp_path):
    """Unknown message types get {"ok": false}, and the server survives."""
    from waymo_2d_tracking_tpu.config import load_config
    from waymo_2d_tracking_tpu.pipeline.server import (
        TrackingServer,
        recv_response,
        send_message,
    )
    import socket as socketlib

    overrides = {}
    for kv in TINY:
        k, v = kv.split("=")
        sect, name = k.split(".")
        overrides.setdefault(sect, {})[name] = json.loads(v) \
            if v[0] in "[-0123456789" else v
    cfg = load_config(None, overrides)
    server = TrackingServer(cfg)
    sock = str(tmp_path / "s.sock")
    th = threading.Thread(
        target=server.serve,
        kwargs=dict(socket_path=sock, max_requests=4), daemon=True,
    )
    th.start()
    for _ in range(600):
        if os.path.exists(sock):
            break
        time.sleep(0.05)
    from waymo_2d_tracking_tpu.pipeline.server import _LEN

    # a header that is not valid UTF-8 must drop the CONNECTION, not the
    # daemon (review finding r3-serve #1: UnicodeDecodeError escaped serve())
    conn = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
    conn.connect(sock)
    conn.sendall(_LEN.pack(2) + b"\xff\xfe" + _LEN.pack(0))
    try:
        data = conn.recv(4)
    except ConnectionResetError:
        data = b""  # RST: server closed with our payload block unread
    assert data == b""  # server dropped this connection
    conn.close()

    conn = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
    conn.connect(sock)
    send_message(conn, {"type": "bogus"})
    resp = recv_response(conn)
    assert resp["ok"] is False and "bogus" in resp["error"]
    # server is still alive and serving on the same connection
    send_message(conn, {"type": "stats"})
    assert recv_response(conn)["ok"] is True
    send_message(conn, {"type": "close"})
    assert recv_response(conn)["ok"] is True
    conn.close()
    th.join(timeout=30)
    assert not th.is_alive()


def test_serve_multicam_roundtrip(tmp_path):
    """--multicam daemon: one rig tick (raw and JPEG encodings) per message."""
    import cv2

    sock = str(tmp_path / "mc.sock")
    argv = ["serve", "--socket", sock, "--multicam", "--max-requests", "20",
            "--warmup", "64", "96",
            "--set", 'pipeline.cameras=["FRONT","FRONT_LEFT"]'] + TINY
    th = threading.Thread(target=cli.main, args=(argv,), daemon=True)
    th.start()
    for _ in range(1200):
        if os.path.exists(sock):
            break
        time.sleep(0.1)
    else:
        pytest.fail("multicam server socket never appeared")

    rng = np.random.default_rng(1)
    rig = [rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
           for _ in range(2)]
    jpegs = [cv2.imencode(".jpg", f[:, :, ::-1])[1].tobytes() for f in rig]

    with TrackingClient(socket_path=sock) as c:
        r1 = c.step(rig, timestamp_micros=100)      # raw [N,H,W,3]
        assert r1["ok"] and isinstance(r1["records"], list)
        cams = {rec["camera_name"] for rec in r1["records"]}
        assert cams <= {1, 2}

        r2 = c.step(jpegs, timestamp_micros=200)    # jpeg_lens encoding
        assert r2["ok"]

        # wrong rig size is an error, server survives
        with pytest.raises(RuntimeError, match="cameras"):
            c.step(rig[:1], timestamp_micros=300)
        assert c.stats()["ok"]
        c.close_server()
    th.join(timeout=60)
    assert not th.is_alive()


def test_serve_snapshot_restore_failover(tmp_path):
    """Failover: snapshot server A's tracker state, restore into a fresh
    server B. Discriminative signals: restore->snapshot round-trips the
    state byte-for-byte (cold state differs), and every identity on the
    next step was already assigned by A (no rebirth under a fresh
    counter)."""

    def run_server(sock, warmup=True):
        argv = ["serve", "--socket", sock, "--max-requests", "50"]
        if warmup:
            argv += ["--warmup", "64", "96"]
        argv += ["--set"] + TINY
        th = threading.Thread(target=cli.main, args=(argv,), daemon=True)
        th.start()
        for _ in range(1200):
            if os.path.exists(sock):
                return th
            time.sleep(0.1)
        pytest.fail("server socket never appeared")

    def suffixes(recs):
        return {int(r["object_id"].rsplit("_", 1)[1]) for r in recs}

    rng = np.random.default_rng(0)
    frame1 = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    frame2 = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    frame3 = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)

    sock_a = str(tmp_path / "a.sock")
    run_server(sock_a)
    seen_a = set()
    with TrackingClient(socket_path=sock_a) as ca:
        seen_a |= suffixes(ca.step(frame1, timestamp_micros=100)["records"])
        seen_a |= suffixes(ca.step(frame2, timestamp_micros=200)["records"])
        snap = ca.snapshot()
        ca.close_server()
    assert snap["blob"] and seen_a

    # server B starts UN-warmed: the first frame's auto-warmup must NOT
    # wipe the restored state (regression: warmup used to end in reset())
    sock_b = str(tmp_path / "b.sock")
    run_server(sock_b, warmup=False)
    with TrackingClient(socket_path=sock_b) as cb:
        # cold server's state snapshot differs from A's (A has live tracks)
        cold = cb.snapshot()
        assert cold["blob"] != snap["blob"]

        cb.restore(snap["blob"], context_name=snap["context_name"])
        # restore -> snapshot round-trips the full state byte-for-byte:
        # track table, ages, embeddings, id counter — everything
        again = cb.snapshot()
        assert again["blob"] == snap["blob"]
        assert again["context_name"] == snap["context_name"]

        # the restored server keeps serving THROUGH the auto-warmup, and
        # A's identities continue: every id on the next step was already
        # assigned by A (no rebirth under a fresh counter)
        got = suffixes(cb.step(frame3, timestamp_micros=300)["records"])
        assert got and got <= seen_a, (seen_a, got)

        # config-mismatch snapshots are rejected, server stays usable
        with pytest.raises(RuntimeError, match="config|load|file"):
            cb.restore(snap["blob"][: len(snap["blob"]) // 2])
        assert cb.stats()["ok"]
        cb.close_server()


def test_serve_state_file_persists_across_restart(tmp_path):
    """--state-file: snapshot written on exit, restored at next start."""
    state_file = str(tmp_path / "tracker.state")
    sock = str(tmp_path / "s.sock")
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)

    def serve_once():
        argv = ["serve", "--socket", sock, "--max-requests", "20",
                "--state-file", state_file,
                "--warmup", "64", "96", "--set"] + TINY
        th = threading.Thread(target=cli.main, args=(argv,), daemon=True)
        th.start()
        for _ in range(1200):
            if os.path.exists(sock):
                return th
            time.sleep(0.1)
        pytest.fail("server socket never appeared")

    th = serve_once()
    with TrackingClient(socket_path=sock) as c:
        c.reset(context_name="ctxZ")
        c.step(frame, timestamp_micros=100)
        snap1 = c.snapshot()["blob"]
        c.close_server()
    th.join(timeout=30)
    assert os.path.exists(state_file)
    assert open(state_file, "rb").read() == snap1

    # second incarnation restores the file: state AND context survive
    th = serve_once()
    with TrackingClient(socket_path=sock) as c:
        again = c.snapshot()
        assert again["blob"] == snap1
        assert again["context_name"] == "ctxZ"
        c.close_server()
    th.join(timeout=30)

    # a corrupt state file must not block the restart: warn + serve fresh
    with open(state_file, "wb") as f:
        f.write(b"garbage")
    th = serve_once()
    with TrackingClient(socket_path=sock) as c:
        assert c.stats()["ok"]
        c.close_server()
    th.join(timeout=30)
