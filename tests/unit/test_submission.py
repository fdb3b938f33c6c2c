"""Tests for utils/protolite and io_out/submission (C21)."""
import numpy as np

from waymo_2d_tracking_tpu.utils import protolite as pb
from waymo_2d_tracking_tpu.io_out import submission as subm


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 2 ** 32, 2 ** 63 - 1]:
        data = pb.encode_varint(v)
        got, pos = pb.decode_varint(data, 0)
        assert got == v and pos == len(data)


def test_negative_varint_two_complement():
    data = pb.encode_varint(-5)
    got, _ = pb.decode_varint(data, 0)
    assert pb.as_sint(got) == -5


def test_message_fields_roundtrip():
    msg = (
        pb.field_varint(1, 42)
        + pb.field_double(2, 3.5)
        + pb.field_float(3, 1.25)
        + pb.field_string(4, "hello")
        + pb.field_message(5, pb.field_varint(1, 7))
    )
    fields = pb.parse_message(msg)
    assert fields[1] == [42]
    assert pb.as_double(fields[2][0]) == 3.5
    assert pb.as_float(fields[3][0]) == 1.25
    assert fields[4][0] == b"hello"
    inner = pb.parse_message(fields[5][0])
    assert inner[1] == [7]


def _records():
    return [
        subm.TrackRecord.from_xyxy(
            "ctx_a", 1000 + i, camera_name=1, object_id=f"1_{i}",
            object_type=subm.TYPE_VEHICLE, box_xyxy=(10 + i, 20, 110 + i, 80),
            score=0.9 - 0.1 * i,
        )
        for i in range(5)
    ]


def test_jsonl_roundtrip(tmp_path):
    path = str(tmp_path / "sub.jsonl")
    n = subm.write_jsonl(path, _records())
    assert n == 5
    back = subm.read_jsonl(path)
    assert back == _records()


def test_waymo_pb_roundtrip(tmp_path):
    path = str(tmp_path / "sub.pb")
    n = subm.write_waymo_pb(path, _records())
    assert n == 5
    back = subm.read_waymo_pb(path)
    for a, b in zip(back, _records()):
        assert a.context_name == b.context_name
        assert a.timestamp_micros == b.timestamp_micros
        assert a.object_id == b.object_id
        assert abs(a.center_x - b.center_x) < 1e-9
        assert abs(a.score - b.score) < 1e-6


def test_records_from_track_outputs():
    from waymo_2d_tracking_tpu.types import TrackOutputs
    import jax.numpy as jnp

    outputs = TrackOutputs(
        track_id=jnp.asarray([[3, -1], [3, 5]]),
        boxes=jnp.asarray(
            [[[0.0, 0, 10, 10], [0, 0, 0, 0]], [[2, 2, 12, 12], [50, 50, 70, 90]]]
        ),
        scores=jnp.asarray([[0.9, 0.0], [0.8, 0.7]]),
        classes=jnp.asarray([[0, 0], [0, 2]]),
        valid=jnp.asarray([[True, False], [True, True]]),
    )
    recs = subm.records_from_track_outputs(
        outputs, "ctx", [100, 200], camera_name=1, scale=2.0
    )
    assert len(recs) == 3
    assert recs[0].object_id == "1_3"
    # scale maps network coords back to source pixels (divide by scale)
    assert recs[0].center_x == 2.5 and recs[0].length == 5.0
    assert recs[2].object_type == subm.TYPE_CYCLIST
    assert recs[2].timestamp_micros == 200


def test_top_level_api_exports():
    import waymo_2d_tracking_tpu as w2t

    for name in ("Config", "Tracker", "DetectorRunner", "SegmentPipeline",
                 "MultiCamPipeline", "DetectorTrainer", "Detections",
                 "load_config"):
        assert getattr(w2t, name) is not None, name
