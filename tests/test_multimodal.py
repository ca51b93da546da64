"""Multimodal plumbing: schema, actor signature, output layout (decode stubbed)."""

import numpy as np
import pyarrow as pa
import pytest

from gostatix_ray.stages.multimodal import FrameSample, ImageDecode, decode_images


def _media_batch(n=8):
    rng = np.random.default_rng(1)
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array([rng.bytes(256) for _ in range(n)], pa.large_binary()),
            "mime": pa.array(["image/png"] * n),
            "width": pa.array([64] * n, pa.int32()),
            "height": pa.array([48] * n, pa.int32()),
        }
    )


def test_decode_stub_deterministic():
    d = ImageDecode(feature_dim=8)
    a, b = d(_media_batch()), d(_media_batch())
    assert a["features"].to_pylist() == b["features"].to_pylist()
    assert len(a["features"][0].as_py()) == 8


def test_real_codec_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        ImageDecode(real_codec=True)


def test_frame_sample():
    batch = pa.table({"media_id": pa.array([1, 2], pa.int64()), "n_frames": pa.array([90, 10], pa.int64())})
    out = FrameSample(every_n=30)(batch)
    assert out["media_id"].to_pylist() == [1, 1, 1, 2]
    assert out["frame_idx"].to_pylist() == [0, 30, 60, 0]


def test_decode_pipeline_on_dataset(ray_session):
    import ray.data as rd

    rows = _media_batch(32).to_pylist()
    ds = rd.from_items(rows)
    out = decode_images(ds, feature_dim=4, batch_size=8, concurrency=2).to_pandas()
    assert len(out) == 32
    assert set(out.columns) == {"media_id", "width", "height", "features"}
    assert all(len(f) == 4 for f in out["features"])


def test_audio_features_stub():
    import pyarrow as pa

    from gostatix_ray.stages.multimodal import AudioFeatures

    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"\x01" * 64, b"\x02" * 64], pa.large_binary()),
            "duration_ms": pa.array([3000, 500], pa.int64()),
        }
    )
    out = AudioFeatures(frame_ms=1000)(batch)
    assert out["media_id"].to_pylist() == [1, 1, 1, 2]
    assert out["frame_idx"].to_pylist() == [0, 1, 2, 0]
    out2 = AudioFeatures(frame_ms=1000)(batch)
    assert out["energy"].to_pylist() == out2["energy"].to_pylist()


def test_real_codecs_available_smoke(ray_session):
    """Runs only when PIL is importable (absent in this sandbox): one
    real JPEG through decode_images(real_codec=True) — the mechanical
    stub swap documented in REAL_CODECS.md."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    import ray.data as rd

    img = PIL.new("RGB", (8, 6), color=(200, 10, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    rows = [{"media_id": 1, "payload": buf.getvalue(), "mime": "image/png",
             "width": 8, "height": 6}]
    from gostatix_ray.stages.multimodal import decode_images

    out = decode_images(rd.from_items(rows), real_codec=True, concurrency=1).to_pandas()
    assert len(out) == 1 and out["media_id"].iloc[0] == 1
