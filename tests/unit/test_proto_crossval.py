"""Cross-validate the hand-rolled proto wire format against the REAL
protobuf runtime (VERDICT round-1 "What's missing" #3).

The framework's protolite encoder/decoder (utils/protolite.py) and the two
schema tables (data/waymo.py _FRAME_SCHEMA, io_out/submission.py _F) were
only ever tested against themselves in round 1 — a tag/varint/nesting bug
would be invisible. Here we compile tests/protos/waymo_recalled.proto with
protoc into a descriptor set, build real message classes via the protobuf
runtime, and check BOTH directions:

  protolite-encoded bytes  --parse-->  real protobuf messages
  real protobuf-serialized bytes  --parse-->  protolite decoders

plus that the committed .proto's field numbers agree with the in-code
schema tables (so the "single correction point" promise stays true).

The field NUMBERS themselves are still [RECALLED] (no real sample file
exists here — SURVEY.md §0); what this buys is that the wire format around
them is provably correct protobuf.
"""
import shutil
import subprocess
import tempfile

import os

import pytest

PROTO_DIR = os.path.join(os.path.dirname(__file__), "..", "protos")

pytestmark = pytest.mark.skipif(
    shutil.which("protoc") is None, reason="protoc not available"
)


@pytest.fixture(scope="module")
def messages():
    """Compile the .proto -> descriptor set -> runtime message classes."""
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "ds.pb")
        subprocess.run(
            ["protoc", f"-I{PROTO_DIR}", f"--descriptor_set_out={out}",
             "waymo_recalled.proto"],
            check=True,
        )
        fds = descriptor_pb2.FileDescriptorSet()
        with open(out, "rb") as f:
            fds.ParseFromString(f.read())
    pool = descriptor_pool.DescriptorPool()
    for fd in fds.file:
        pool.Add(fd)
    def cls(name):
        return message_factory.GetMessageClass(
            pool.FindMessageTypeByName(f"waymo_recalled.{name}")
        )
    return {n: cls(n) for n in
            ("Box", "Label", "Object", "Objects", "Context", "CameraImage",
             "CameraLabels", "Frame")}


def test_proto_file_matches_submission_table(messages):
    """The committed .proto agrees with io_out/submission._F field by field."""
    from waymo_2d_tracking_tpu.io_out.submission import _F

    fields = {f.name: f.number for f in messages["Box"].DESCRIPTOR.fields}
    for k in ("center_x", "center_y", "center_z", "width", "length", "height",
              "heading"):
        assert fields[k] == _F[f"box.{k}"], k
    lab = {f.name: f.number for f in messages["Label"].DESCRIPTOR.fields}
    assert lab["box"] == _F["label.box"]
    assert lab["type"] == _F["label.type"]
    assert lab["id"] == _F["label.id"]
    obj = {f.name: f.number for f in messages["Object"].DESCRIPTOR.fields}
    assert obj["label"] == _F["object.label"]
    assert obj["score"] == _F["object.score"]
    assert obj["context_name"] == _F["object.context_name"]
    assert obj["frame_timestamp_micros"] == _F["object.timestamp"]
    assert obj["camera_name"] == _F["object.camera_name"]
    assert {f.name: f.number for f in messages["Objects"].DESCRIPTOR.fields}[
        "objects"] == _F["objects.objects"]


def test_proto_file_matches_frame_table(messages):
    from waymo_2d_tracking_tpu.data.waymo import _FRAME_SCHEMA as S

    fr = {f.name: f.number for f in messages["Frame"].DESCRIPTOR.fields}
    assert fr["context"] == S["frame.context"]
    assert fr["timestamp_micros"] == S["frame.timestamp"]
    assert fr["images"] == S["frame.images"]
    assert fr["camera_labels"] == S["frame.camera_labels"]
    assert {f.name: f.number for f in messages["Context"].DESCRIPTOR.fields}[
        "name"] == S["context.name"]
    ci = {f.name: f.number for f in messages["CameraImage"].DESCRIPTOR.fields}
    assert ci["name"] == S["camera_image.name"]
    assert ci["image"] == S["camera_image.image"]
    cl = {f.name: f.number for f in messages["CameraLabels"].DESCRIPTOR.fields}
    assert cl["name"] == S["camera_labels.name"]
    assert cl["labels"] == S["camera_labels.labels"]


_RECORDS = [
    dict(context_name="ctx_a", timestamp_micros=1550083467346370,
         camera_name=1, object_id="1_42", object_type=1,
         center_x=123.25, center_y=-4.5, length=55.0, width=17.125,
         score=0.875),
    dict(context_name="", timestamp_micros=0, camera_name=5,
         object_id="x", object_type=4, center_x=0.0, center_y=0.0,
         length=1e-8, width=1e8, score=1.0),
]


def test_submission_pb_parses_with_real_protobuf(messages, tmp_path):
    """Our writer's bytes decode exactly under the real protobuf runtime."""
    from waymo_2d_tracking_tpu.io_out.submission import TrackRecord, write_waymo_pb

    recs = [TrackRecord(**r) for r in _RECORDS]
    path = tmp_path / "subm.pb"
    write_waymo_pb(str(path), recs)

    parsed = messages["Objects"]()
    parsed.ParseFromString(path.read_bytes())
    assert len(parsed.objects) == len(recs)
    for got, want in zip(parsed.objects, recs):
        assert got.context_name == want.context_name
        assert got.frame_timestamp_micros == want.timestamp_micros
        assert got.camera_name == want.camera_name
        assert got.label.id == want.object_id
        assert got.label.type == want.object_type
        assert got.label.box.center_x == want.center_x
        assert got.label.box.center_y == want.center_y
        assert got.label.box.length == want.length
        assert got.label.box.width == want.width
        assert abs(got.score - want.score) < 1e-6


def test_real_protobuf_parses_with_our_reader(messages, tmp_path):
    """Bytes serialized by the real runtime decode exactly with our reader."""
    from waymo_2d_tracking_tpu.io_out.submission import read_waymo_pb

    objects = messages["Objects"]()
    for r in _RECORDS:
        o = objects.objects.add()
        o.context_name = r["context_name"]
        o.frame_timestamp_micros = r["timestamp_micros"]
        o.camera_name = r["camera_name"]
        o.score = r["score"]
        o.label.id = r["object_id"]
        o.label.type = r["object_type"]
        o.label.box.center_x = r["center_x"]
        o.label.box.center_y = r["center_y"]
        o.label.box.length = r["length"]
        o.label.box.width = r["width"]
    path = tmp_path / "real.pb"
    path.write_bytes(objects.SerializeToString())

    got = read_waymo_pb(str(path))
    assert len(got) == len(_RECORDS)
    for g, want in zip(got, _RECORDS):
        assert g.context_name == want["context_name"]
        assert g.timestamp_micros == want["timestamp_micros"]
        assert g.camera_name == want["camera_name"]
        assert g.object_id == want["object_id"]
        assert g.object_type == want["object_type"]
        assert g.center_x == want["center_x"]
        assert g.length == want["length"]
        assert abs(g.score - want["score"]) < 1e-6


def test_frame_roundtrip_against_real_protobuf(messages, tmp_path):
    """Frame protos built by the REAL runtime parse with data/waymo.py's
    walker (and our encode_frame bytes parse with the real runtime),
    wrapped in TFRecord framing that TensorFlow itself accepts."""
    from waymo_2d_tracking_tpu.data.waymo import (
        encode_frame, parse_frame, read_tfrecord, write_tfrecord,
    )

    jpeg = b"\xff\xd8FAKEJPEG\xff\xd9"
    frame = messages["Frame"]()
    frame.context.name = "segment-123_with_camera_labels"
    frame.timestamp_micros = 1550083467346370
    im = frame.images.add(); im.name = 1; im.image = jpeg
    im2 = frame.images.add(); im2.name = 2; im2.image = jpeg * 2
    cl = frame.camera_labels.add(); cl.name = 1
    lab = cl.labels.add()
    lab.id = "obj-7"; lab.type = 2
    lab.box.center_x = 100.0; lab.box.center_y = 50.0
    lab.box.length = 30.0; lab.box.width = 12.0

    got = parse_frame(frame.SerializeToString())
    assert got["context_name"] == "segment-123_with_camera_labels"
    assert got["timestamp"] == 1550083467346370
    assert got["images"][1] == jpeg and got["images"][2] == jpeg * 2
    (l,) = got["labels"][1]
    assert l["id"] == "obj-7" and l["type"] == 2
    assert l["xyxy"] == (85.0, 44.0, 115.0, 56.0)

    # our encoder -> real runtime
    ours = encode_frame(
        "segment-123_with_camera_labels", 1550083467346370,
        {1: jpeg}, {1: [{"id": "obj-7", "type": 2,
                         "xyxy": (85.0, 44.0, 115.0, 56.0)}]},
    )
    back = messages["Frame"]()
    back.ParseFromString(ours)
    assert back.context.name == "segment-123_with_camera_labels"
    assert back.images[0].image == jpeg
    assert back.camera_labels[0].labels[0].box.center_x == 100.0

    # TFRecord framing interop vs TensorFlow (the real reader of these files)
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "seg.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        w.write(frame.SerializeToString())
    (rec,) = list(read_tfrecord(path, verify_crc=True))
    assert rec == frame.SerializeToString()
    # and the reverse: our writer's file reads back through tf.data
    path2 = str(tmp_path / "seg2.tfrecord")
    write_tfrecord(path2, [ours])
    ds = list(tf.data.TFRecordDataset(path2))
    assert len(ds) == 1 and bytes(ds[0].numpy()) == ours
