"""Multimodal plumbing tests: binary payload columns flow through
Arrow-batched decode operators with declared schemas; the decode kernels
are deterministic stubs (no codec libs in the container) but the Spark
contract — schema, fan-out shape, determinism across partitionings — is
fully exercised."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.multimodal import (
    audio_frame_energy,
    image_features,
    image_resize,
    video_frame_sample,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytes([0xFF, 0xD8, 0xFF]) + b"jpegpayload" * 40),
        (2, "image", bytes([0x89, 0x50, 0x4E, 0x47]) + b"pngdata" * 60),
        (3, "audio", b"RIFF" + bytes(range(256)) * 4),
        (4, "blob", b"\x00\x01\x02unknown"),
    ]
    return spark.createDataFrame(rows, "media_id long, modality string, payload binary")


def test_mime_sniffing(spark, media):
    got = {
        r["media_id"]: r["meta"]["mime"]
        for r in with_media_metadata(media).select("media_id", "meta").collect()
    }
    assert got == {
        1: "image/jpeg",
        2: "image/png",
        3: "audio/wav",
        4: "application/octet-stream",
    }


def test_image_features_shape_and_determinism(spark, media):
    imgs = media.filter(F.col("modality") == "image")
    a = {r["media_id"]: r.asDict() for r in image_features(imgs).collect()}
    b = {
        r["media_id"]: r.asDict()
        for r in image_features(imgs.repartition(4)).collect()
    }
    assert a == b, "decode must be deterministic across partitionings"
    assert set(a) == {1, 2}
    for r in a.values():
        assert r["width"] >= 16 and r["height"] >= 16
        assert len(r["phash"]) == 16  # 64-bit hex


def test_audio_frame_fanout(spark, media):
    audio = media.filter(F.col("modality") == "audio")
    frames = audio_frame_energy(audio, frame_samples=256).collect()
    # 4 + 256*4 bytes -> 4 full frames
    assert len(frames) == 4
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    assert all(0.0 <= r["rms"] <= 1.0 for r in frames)


def test_image_resize_contract(spark, media):
    imgs = media.filter(F.col("modality") == "image")
    out = {r["media_id"]: r.asDict() for r in image_resize(imgs, 8, 8).collect()}
    again = {
        r["media_id"]: r.asDict()
        for r in image_resize(imgs.repartition(4), 8, 8).collect()
    }
    assert out == again, "resize must be deterministic across partitionings"
    assert set(out) == {1, 2}
    for r in out.values():
        assert (r["width"], r["height"]) == (8, 8)
        assert len(r["payload"]) == 64  # exactly width*height bytes


def test_video_frame_sample_stride_and_cap(spark):
    rows = [
        (1, b"x" * 64),          # 1 frame  -> idx [0]
        (2, b"y" * (64 * 25)),   # 25 frames -> idx [0, 10, 20]
        (3, b"z" * (64 * 999)),  # 999 frames -> capped at 8 samples
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = video_frame_sample(df, every_n=10, max_frames=8, frame_bytes=64)
    got: dict[int, list[int]] = {}
    for r in out.collect():
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(got[1]) == [0]
    assert sorted(got[2]) == [0, 10, 20]
    assert sorted(got[3]) == [0, 10, 20, 30, 40, 50, 60, 70]
    sig = {(r["media_id"], r["frame_idx"]): r["frame_phash"] for r in out.collect()}
    assert all(len(s) == 16 for s in sig.values())
    # identical frame bytes -> identical signature (content-addressed)
    assert sig[(3, 0)] == sig[(3, 10)]


def test_payload_pruned_when_metadata_only(spark, media, tmp_path):
    """Column pruning: a metadata-only projection over parquet must not
    read the payload column (ReadSchema excludes it)."""
    path = str(tmp_path / "media")
    media.write.parquet(path)
    df = spark.read.parquet(path).select("media_id", "modality")
    plan = df._jdf.queryExecution().executedPlan().toString()
    line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    read_schema = line.split("ReadSchema:")[1]
    assert "payload" not in read_schema, read_schema


def test_empty_payload_survives_all_kernels(spark):
    """A zero-byte payload must yield a degenerate row, not crash the
    Arrow batch (the image kernel's mean threshold would otherwise
    divide by zero over an empty plane). Empty payloads decode as a
    single zero byte in both stub decoders."""
    df = spark.createDataFrame(
        [(1, b""), (2, b"nonempty-payload" * 8)], "media_id long, payload binary"
    )
    feats = {r["media_id"]: r.asDict() for r in image_features(df).collect()}
    assert set(feats) == {1, 2}
    assert (feats[1]["width"], feats[1]["height"]) == (16, 16)
    assert feats[1]["n_bytes"] == 0  # reports the true payload size

    frames = {r["media_id"]: r.asDict() for r in audio_frame_energy(df).collect()}
    assert frames[1]["rms"] == 1.0  # single -128 sample: sqrt(16384/16384)

    resized = {r["media_id"]: r.asDict() for r in image_resize(df, 8, 8).collect()}
    assert len(resized[1]["payload"]) == 64

    vids = [r for r in video_frame_sample(df).collect() if r["media_id"] == 1]
    assert [r["frame_idx"] for r in vids] == [0]


def test_video_near_dup_pairs_finds_reencodes_not_strangers(spark):
    """Planted duplicate clips (same payload, new id) hit jaccard 1.0;
    half-overlapping clips land between threshold tiers; unrelated
    clips never pair."""
    from hazelcast_jet_contrib_spark.operators.multimodal import (
        video_near_dup_pairs,
    )

    fb = 64

    def clip(seed: int, n_frames: int) -> bytes:
        import hashlib as _h

        return b"".join(
            _h.sha256(f"{seed}:{i}".encode()).digest()[:fb]
            for i in range(n_frames)
        )

    rows = [
        (1, clip(1, 40)),
        (2, clip(1, 40)),          # exact re-encode of 1
        (3, clip(1, 20) + clip(3, 20)),  # first half shared with 1
        (4, clip(4, 40)),          # unrelated
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in video_near_dup_pairs(
            df, threshold=0.2, every_n=5, max_frames=8, frame_bytes=fb
        ).collect()
    }
    assert out[(1, 2)] == 1.0
    assert 0.2 <= out[(1, 3)] < 1.0 and 0.2 <= out[(2, 3)] < 1.0
    assert not any(4 in p for p in out), "unrelated clip must not pair"
    # tighter threshold keeps only the exact re-encode
    strict = {
        (r["id_a"], r["id_b"])
        for r in video_near_dup_pairs(
            df, threshold=0.9, every_n=5, max_frames=8, frame_bytes=fb
        ).collect()
    }
    assert strict == {(1, 2)}
