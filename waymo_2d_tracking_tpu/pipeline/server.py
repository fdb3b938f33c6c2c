"""Socket serving daemon over the online tracker (`w2t serve`).

The reference stack is an offline competition pipeline — there is no
serving story to cite (SURVEY.md §0/§3.1: per-segment batch scripts).
This module is the deployment-shaped surface the north-star framing asks
for ("large-scale production deployment and serving"): a long-lived
process that owns the compiled ``OnlineTracker`` session (pipeline/
online.py) and serves one camera stream over a local socket, so clients
pay per-frame serving latency (29.6 ms p50 on the headline preset,
BASELINE.md) and never the multi-minute XLA compile.

Design constraints, in order:
  - The device step is inherently serial (one tracker state), so the
    server is deliberately single-threaded: accept one connection at a
    time, process frames in arrival order. Horizontal scale = one server
    process per chip (the same shape as `--sharded` batch fan-out).
  - Zero dependencies: length-prefixed JSON + raw bytes over AF_UNIX or
    localhost TCP. No gRPC/protobuf server stack to vendor.
  - Crash-only: a client disconnect mid-message drops the connection and
    returns to accept; the tracker state persists across connections
    unless the client sends an explicit ``reset``.

Wire protocol (all lengths u32 big-endian):

  client -> server, one of:
    {"type": "frame", "timestamp_micros": int}   + payload (JPEG bytes or
        raw HxWx3 uint8 given "shape": [H, W, 3] in the header; against a
        multicam server: "shape": [N, H, W, 3] raw, or "jpeg_lens":
        [l1..lN] with N concatenated JPEGs)
    {"type": "reset", "context_name": str?}      (fresh track table)
    {"type": "stats"}                            (latency percentiles)
    {"type": "snapshot"}                         (serialize tracker state ->
                                                  base64 in the response;
                                                  failover / live-migration)
    {"type": "restore", "context_name": str?}    + payload (snapshot bytes)
                                                  (load state into a fresh
                                                  server; config must match)
    {"type": "close"}                            (server replies, exits loop)
  each message = [len][header JSON][len][payload]; payload may be empty.

  server -> client: [len][body JSON]
    frame  -> {"ok": true, "records": [TrackRecord dicts], "latency_ms": f}
    reset  -> {"ok": true}
    stats  -> {"ok": true, "stats": {...}}
    errors -> {"ok": false, "error": "..."}
"""
from __future__ import annotations

import dataclasses
import json
import socket
import struct
from typing import Optional, Tuple

_LEN = struct.Struct(">I")
MAX_MSG = 64 * 1024 * 1024  # refuse absurd lengths rather than OOM


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-message")
        buf.extend(chunk)
    return bytes(buf)


def _recv_block(conn: socket.socket) -> bytes:
    (n,) = _LEN.unpack(_recv_exact(conn, 4))
    if n > MAX_MSG:
        raise ConnectionError(f"message of {n} bytes exceeds {MAX_MSG}")
    return _recv_exact(conn, n) if n else b""


def _send_block(conn: socket.socket, data: bytes) -> None:
    conn.sendall(_LEN.pack(len(data)) + data)


def send_message(conn: socket.socket, header: dict, payload: bytes = b"") -> None:
    _send_block(conn, json.dumps(header).encode())
    _send_block(conn, payload)


def recv_response(conn: socket.socket) -> dict:
    return json.loads(_recv_block(conn).decode())


class TrackingServer:
    """Single-stream serving daemon; see module docstring for protocol.

    multicam=True serves a full camera rig per frame message
    (OnlineMultiCamTracker, one shared-backbone batch per tick): the
    header carries ``"shape": [N, H, W, 3]`` for raw payloads or
    ``"jpeg_lens": [l1..lN]`` for N concatenated JPEGs, N =
    ``len(cfg.pipeline.cameras)``.
    """

    def __init__(self, cfg, params=None, rng=None, camera_name: int = 1,
                 multicam: bool = False):
        from waymo_2d_tracking_tpu.pipeline.online import (
            OnlineMultiCamTracker,
            OnlineTracker,
        )

        self.multicam = bool(multicam)
        if self.multicam:
            num_cams = len(cfg.pipeline.cameras)
            self.sess = OnlineMultiCamTracker(
                cfg, camera_names=list(range(1, num_cams + 1)),
                params=params, rng=rng,
            )
        else:
            self.sess = OnlineTracker(cfg, params=params, rng=rng,
                                      camera_name=camera_name)
        self.cfg = cfg
        self._warmed: Optional[Tuple[int, int]] = None
        self.requests_served = 0

    def warmup(self, src_hw) -> float:
        """Compile the serving step for (H, W) sources; returns seconds.
        Owns the warmed-shape bookkeeping (callers must not set _warmed)."""
        src_hw = (int(src_hw[0]), int(src_hw[1]))
        secs = self.sess.warmup(src_hw)
        self._warmed = src_hw
        return secs

    def warmup_source(self, src_hw) -> float:
        """Deployment warmup for FULL-RES source dims (the `w2t serve
        --warmup H W` contract): compiles every step shape this source can
        produce — the scaled shape compressed payloads decode to (when
        pipeline.decode_scale_denom > 1) AND the raw shape pre-decoded
        array payloads arrive at. Without the scaled compile, the first
        compressed frame would pay the multi-minute XLA compile the flag
        exists to avoid."""
        h, w = int(src_hw[0]), int(src_hw[1])
        secs = 0.0
        sd = self.cfg.pipeline.decode_scale_denom
        if sd > 1:
            secs += self.warmup((-(-h // sd), -(-w // sd)))
        secs += self.warmup((h, w))
        return secs

    # -- request handlers --------------------------------------------------
    def _decode_frames(self, header: dict, payload: bytes):
        """Header+payload -> step() input: decoded uint8 array(s) for raw
        payloads; raw JPEG bytes for compressed ones (the session decodes
        at the preset's decode_scale_denom and owns the box-scale
        accounting — pre-decoding here would silently serve full-res)."""
        import numpy as np

        if "shape" in header:  # raw uint8, already decoded by the client
            arr = np.frombuffer(payload, np.uint8).reshape(header["shape"])
            return list(arr) if self.multicam else arr
        if "jpeg_lens" in header:  # N concatenated JPEGs (rig)
            frames, off = [], 0
            for n in header["jpeg_lens"]:
                frames.append(bytes(payload[off:off + int(n)]))
                off += int(n)
            return frames
        return bytes(payload)  # single JPEG

    def _step_src_hw(self, frames) -> Tuple[int, int]:
        """(H, W) the serving step will see for these frames: raw arrays
        as-is; compressed streams at decode_scale_denom. The full-res dims
        come from the JPEG header (a marker walk, no decode) per frame —
        NOT a once-per-session cache, so a reset + new stream at a
        different resolution re-warms instead of silently serving the old
        stream's geometry (review r4)."""
        import numpy as np

        first = frames[0] if isinstance(frames, list) else frames
        if isinstance(first, (bytes, bytearray)):
            from waymo_2d_tracking_tpu.data.jpeg import jpeg_dims

            h, w = jpeg_dims(bytes(first))
            sd = self.cfg.pipeline.decode_scale_denom
            return (-(-h // sd), -(-w // sd))
        arr = np.asarray(first)
        if arr.ndim != 3 or arr.shape[-1] != 3:
            raise ValueError(
                f"frame must be HxWx3 uint8, got shape {tuple(arr.shape)}"
                + ("" if self.multicam
                   else " (multicam payload against a single-camera server?)")
            )
        return tuple(arr.shape[:2])

    def _handle_frame(self, header: dict, payload: bytes) -> dict:
        frames = self._decode_frames(header, payload)
        # validate BEFORE warmup: a wrong-rank 'shape' header must not
        # trigger a garbage-shape XLA compile (minutes on a real backend)
        # while the single-threaded server blocks for every other client
        if self.multicam and len(frames) != self.sess.num_cams:
            raise ValueError(
                f"rig has {self.sess.num_cams} cameras, "
                f"got {len(frames)} frames"
            )
        src_hw = self._step_src_hw(frames)
        if self._warmed != src_hw:
            self.warmup(src_hw)
        records = self.sess.step(frames, int(header["timestamp_micros"]))
        return {
            "ok": True,
            "records": [dataclasses.asdict(r) for r in records],
            "latency_ms": round(self.sess.last_latency_ms(), 3),
        }

    # -- state snapshot / restore (failover, live migration) ---------------
    def _get_state(self):
        return self.sess.states if self.multicam else self.sess.state

    def _set_state(self, tree):
        if self.multicam:
            self.sess.states = tree
        else:
            self.sess.state = tree

    def state_bytes(self) -> bytes:
        """Serialize the full tracker state (track table, ages, embeddings,
        id counter) + context metadata to portable npz bytes."""
        import io as _io
        import json as _json

        import jax
        import numpy as np

        leaves = jax.tree.leaves(jax.device_get(self._get_state()))
        buf = _io.BytesIO()
        np.savez(
            buf, *[np.asarray(l) for l in leaves],
            meta=np.array(_json.dumps({
                "context_name": self.sess.context_name,
                "multicam": self.multicam,
            })),
        )
        return buf.getvalue()

    def load_state(self, data: bytes, context_name: Optional[str] = None):
        """Load state_bytes() output; shape/dtype-validated against this
        server's config. context_name overrides the snapshot's metadata."""
        import io as _io
        import json as _json

        import jax
        import numpy as np

        cur = self._get_state()
        treedef = jax.tree.structure(cur)
        cur_leaves = jax.tree.leaves(cur)
        with np.load(_io.BytesIO(bytes(data))) as z:
            names = sorted((k for k in z.files if k.startswith("arr_")),
                           key=lambda k: int(k.split("_")[1]))
            leaves = [z[k] for k in names]
            meta = (_json.loads(str(z["meta"]))
                    if "meta" in z.files else {})
        if len(leaves) != len(cur_leaves) or any(
            a.shape != tuple(b.shape) or a.dtype != b.dtype
            for a, b in zip(leaves, cur_leaves)
        ):
            raise ValueError(
                "snapshot does not match this server's tracker config "
                "(slots/embed_dim/multicam must be identical)")
        self._set_state(jax.device_put(jax.tree.unflatten(treedef, leaves)))
        if context_name is not None:
            self.sess.context_name = str(context_name)
        elif meta.get("context_name"):
            self.sess.context_name = str(meta["context_name"])

    def _handle_snapshot(self) -> dict:
        import base64

        return {
            "ok": True,
            "snapshot": base64.b64encode(self.state_bytes()).decode(),
            "context_name": self.sess.context_name,
            "multicam": self.multicam,
        }

    def _handle_restore(self, header: dict, payload: bytes) -> dict:
        self.load_state(payload, context_name=header.get("context_name"))
        return {"ok": True}

    def _handle(self, header: dict, payload: bytes) -> Tuple[dict, bool]:
        kind = header.get("type")
        if kind == "frame":
            return self._handle_frame(header, payload), False
        if kind == "snapshot":
            return self._handle_snapshot(), False
        if kind == "restore":
            return self._handle_restore(header, payload), False
        if kind == "reset":
            self.sess.reset()
            if "context_name" in header:
                self.sess.context_name = str(header["context_name"])
            return {"ok": True}, False
        if kind == "stats":
            return {"ok": True, "stats": self.sess.latency_stats(),
                    "requests": self.requests_served}, False
        if kind == "close":
            return {"ok": True}, True
        return {"ok": False, "error": f"unknown message type {kind!r}"}, False

    # -- accept loop ---------------------------------------------------------
    def serve(self, socket_path: Optional[str] = None,
              port: Optional[int] = None, max_requests: Optional[int] = None,
              on_ready=None) -> int:
        """Blocking accept loop. Returns requests served.

        socket_path: AF_UNIX path (preferred for on-host clients);
        port: localhost TCP port (0 = ephemeral). Exactly one required.
        max_requests / the "close" message bound the loop for tests and
        drain-before-upgrade deployments.
        """
        if (socket_path is None) == (port is None):
            raise ValueError("exactly one of socket_path/port required")
        if socket_path is not None:
            import os

            try:  # crash-only restart: a SIGKILLed daemon leaves the file
                os.unlink(socket_path)
            except OSError:
                pass
            srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            srv.bind(socket_path)
        else:
            srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            srv.bind(("127.0.0.1", port))
        srv.listen(1)
        if on_ready is not None:
            on_ready(srv.getsockname())
        closing = False
        try:
            while not closing:
                conn, _ = srv.accept()
                try:
                    while True:
                        try:
                            header = json.loads(_recv_block(conn).decode())
                            payload = _recv_block(conn)
                            if not isinstance(header, dict):
                                raise ValueError("header must be an object")
                        except (ConnectionError, json.JSONDecodeError,
                                UnicodeDecodeError, ValueError):
                            break  # client gone/garbled: drop connection
                        try:
                            resp, closing = self._handle(header, payload)
                        except Exception as e:  # serve errors, don't die
                            resp, closing = {"ok": False, "error": str(e)}, False
                        self.requests_served += 1
                        try:
                            _send_block(conn, json.dumps(resp).encode())
                        except OSError:
                            break  # client vanished mid-reply: drop, re-accept
                        if closing or (max_requests is not None
                                       and self.requests_served >= max_requests):
                            closing = True
                            break
                finally:
                    conn.close()
        finally:
            srv.close()
            if socket_path is not None:
                import os

                try:
                    os.unlink(socket_path)
                except OSError:
                    pass
        return self.requests_served


class TrackingClient:
    """Blocking client for TrackingServer (tests, sidecar processes).

    >>> with TrackingClient(socket_path="/tmp/w2t.sock") as c:
    ...     recs = c.step(jpeg_bytes, timestamp_micros=123)
    """

    def __init__(self, socket_path: Optional[str] = None,
                 port: Optional[int] = None):
        if (socket_path is None) == (port is None):
            raise ValueError("exactly one of socket_path/port required")
        if socket_path is not None:
            self._conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._conn.connect(socket_path)
        else:
            self._conn = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._conn.connect(("127.0.0.1", port))

    def _roundtrip(self, header: dict, payload: bytes = b"") -> dict:
        send_message(self._conn, header, payload)
        resp = recv_response(self._conn)
        if not resp.get("ok"):
            raise RuntimeError(f"server error: {resp.get('error')}")
        return resp

    def step(self, frame, timestamp_micros: int) -> dict:
        """frame: JPEG bytes or an HxWx3 uint8 ndarray (sent raw); against a
        multicam server, a list of N such frames (the rig's one tick)."""
        import numpy as np

        if isinstance(frame, (list, tuple)):  # camera rig tick
            if all(isinstance(f, np.ndarray) for f in frame):
                arr = np.stack(
                    [np.ascontiguousarray(f, np.uint8) for f in frame]
                )
                header = {"type": "frame",
                          "timestamp_micros": timestamp_micros,
                          "shape": list(arr.shape)}
                payload = arr.tobytes()
            else:
                blobs = [bytes(f) for f in frame]
                header = {"type": "frame",
                          "timestamp_micros": timestamp_micros,
                          "jpeg_lens": [len(b) for b in blobs]}
                payload = b"".join(blobs)
        elif isinstance(frame, np.ndarray):
            header = {"type": "frame", "timestamp_micros": timestamp_micros,
                      "shape": list(frame.shape)}
            payload = np.ascontiguousarray(frame, np.uint8).tobytes()
        else:
            header = {"type": "frame", "timestamp_micros": timestamp_micros}
            payload = bytes(frame)
        return self._roundtrip(header, payload)

    def reset(self, context_name: Optional[str] = None) -> None:
        header = {"type": "reset"}
        if context_name is not None:
            header["context_name"] = context_name
        self._roundtrip(header)

    def stats(self) -> dict:
        return self._roundtrip({"type": "stats"})

    def snapshot(self) -> dict:
        """{"blob": bytes, "context_name": str} — feed to restore() on a
        fresh server (same tracker config) to continue identities.
        (_roundtrip raises RuntimeError on server-side failures.)"""
        import base64

        r = self._roundtrip({"type": "snapshot"})
        return {"blob": base64.b64decode(r["snapshot"]),
                "context_name": r.get("context_name")}

    def restore(self, blob: bytes, context_name: Optional[str] = None):
        header = {"type": "restore"}
        if context_name is not None:
            header["context_name"] = context_name
        self._roundtrip(header, bytes(blob))

    def close_server(self) -> None:
        self._roundtrip({"type": "close"})

    def close(self) -> None:
        self._conn.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
