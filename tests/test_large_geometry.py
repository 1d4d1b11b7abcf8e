"""Large-geometry (packed-representation) paths: repr switch, serialization
interop, checkpoint roundtrip, merge_blobs geometry guard."""

import numpy as np
import pyarrow as pa
import pytest

from raysketch.sketches.bloom import BloomSketch, PartitionedBloom

BIG_CAP = 20_000_000  # m ≈ 192 Mbit → packed repr (> 128 Mbit threshold)


def _keys(n, prefix="k"):
    return pa.array([f"{prefix}{i:010d}" for i in range(n)])


def test_packed_repr_selected_and_correct():
    pb = PartitionedBloom(BIG_CAP, 0.01, num_shards=256)
    assert pb._repr == "packed"
    keys = _keys(30000)
    pb.update_column(keys)
    assert pb.probe_column(keys).all()  # FN = 0 in packed repr
    fpr = pb.probe_column(_keys(30000, "x")).sum() / 30000
    assert fpr <= 0.015


def test_packed_roundtrip_and_merge():
    a = PartitionedBloom(BIG_CAP, 0.01, num_shards=64)
    b = PartitionedBloom(BIG_CAP, 0.01, num_shards=64)
    a.update_column(_keys(5000, "a"))
    b.update_column(_keys(5000, "b"))
    whole = PartitionedBloom(BIG_CAP, 0.01, num_shards=64)
    whole.update_column(_keys(5000, "a"))
    whole.update_column(_keys(5000, "b"))
    merged_blob = PartitionedBloom.merge_blobs([a.to_bytes(), b.to_bytes()])
    assert merged_blob == whole.to_bytes()
    back = PartitionedBloom.from_bytes(merged_blob)
    assert back._repr == "packed"
    assert back.probe_column(_keys(5000, "a")).all()
    assert back.count == 10000


def test_packed_shard_accessors():
    pb = PartitionedBloom(BIG_CAP, 0.01, num_shards=64)
    pb.update_column(_keys(5000))
    sid = int(np.argmax(pb.shard_counts))
    sk = pb.shard_sketch(sid)
    assert isinstance(sk, BloomSketch)
    assert sk.count == pb.shard_counts[sid]
    # set_shard roundtrip is identity
    pb2 = PartitionedBloom(BIG_CAP, 0.01, num_shards=64)
    for s in range(64):
        pb2.set_shard(s, pb.shard_sketch(s))
    assert pb2.to_bytes() == pb.to_bytes()


def test_merge_blobs_geometry_guard():
    a = PartitionedBloom(1000, 0.01, num_shards=16)
    b = PartitionedBloom(2000, 0.01, num_shards=16)
    with pytest.raises(ValueError):
        PartitionedBloom.merge_blobs([a.to_bytes(), b.to_bytes()])
