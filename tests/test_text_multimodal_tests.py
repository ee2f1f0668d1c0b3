"""Text-kernel exactness + multimodal plumbing tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from agr_loader_ray.stages.multimodal import DecodeImage, synth_media_table
from agr_loader_ray.stages.text import fingerprint_batch, token_quality_batch


def test_token_quality_matches_python():
    texts = ["a data row", "table value value a", "xyz", "one  two"]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
    out = token_quality_batch(t).to_pylist()
    stop = {"a", "data", "table", "row", "value"}
    for row, text in zip(out, texts):
        toks = text.split(" ")
        assert row["n_tokens"] == len(toks)
        assert row["n_chars_calc"] == len(text)
        assert row["stop_ratio"] == round(sum(w in stop for w in toks) / len(toks), 4)


def test_fingerprint_polynomial_exact():
    t = pa.table({"text": pa.array(["ab", "ba", "ab"])})
    out = fingerprint_batch(t)["fingerprint"].to_pylist()
    # h("ab") = 97*257 + 98
    assert out[0] == 97 * 257 + 98
    assert out[0] != out[1]
    assert out[0] == out[2]


def test_decode_image_stub_raises_without_fake():
    dec = DecodeImage()
    with pytest.raises(NotImplementedError):
        dec._decode(b"xxxxxxxx", 4, 4)


def test_multimodal_pipeline_with_fake_codec():
    tbl = synth_media_table(n=32)
    ds = ray.data.from_arrow(tbl)
    out = ds.map_batches(
        DecodeImage, fn_constructor_kwargs={"fake": True, "out_size": 8},
        batch_format="pyarrow", batch_size=8, concurrency=2,
    ).to_pandas()
    assert len(out) == 32
    assert all(len(f) == 8 for f in out["feature"])
    # deterministic: same payload -> same feature
    out2 = ray.data.from_arrow(tbl).map_batches(
        DecodeImage, fn_constructor_kwargs={"fake": True, "out_size": 8},
        batch_format="pyarrow", batch_size=8, concurrency=2,
    ).to_pandas()
    f1 = np.stack(out.sort_values("media_id")["feature"].to_numpy())
    f2 = np.stack(out2.sort_values("media_id")["feature"].to_numpy())
    np.testing.assert_array_equal(f1, f2)


def test_audio_pcm_decode_features_ground_truth():
    """Real PCM decode: pure sine rows must show rms ≈ amp/√2, zcr ≈ 2f/sr,
    spectral centroid near f (noise-free synthetic)."""
    import numpy as np
    import pyarrow as pa

    from agr_loader_ray.stages.multimodal import DecodeAudioPCM

    sr, n = 8000, 8000
    t = np.arange(n) / sr
    rows = []
    freqs = [200.0, 1000.0]
    for f in freqs:
        rows.append((0.5 * np.sin(2 * np.pi * f * t) * 32767).astype("<i2").tobytes())
    batch = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array(rows, pa.binary()),
        "sample_rate": pa.array([sr, sr], pa.int32()),
    })
    out = DecodeAudioPCM(frame=4096)(batch).to_pylist()
    for row, f in zip(out, freqs):
        assert abs(row["rms"] - 0.5 / np.sqrt(2)) < 0.01
        assert abs(row["zero_crossing_rate"] - 2 * f / sr) < 0.01
        assert abs(row["spectral_centroid_hz"] - f) < f * 0.25
        assert row["n_samples"] == n
    # monotonicity: higher frequency → higher zcr and centroid
    assert out[1]["zero_crossing_rate"] > out[0]["zero_crossing_rate"]
    assert out[1]["spectral_centroid_hz"] > out[0]["spectral_centroid_hz"]


def test_frame_sample_layout():
    import pyarrow as pa

    from agr_loader_ray.stages.multimodal import SampleFrames, synth_video_table

    tbl = synth_video_table(n=2, n_frames=24, frame_bytes=100)
    out = SampleFrames(every_k=8, max_frames=8)(tbl)
    df = out.to_pandas()
    # 24 frames, every 8th → indices 0, 8, 16 per video
    assert df.groupby("media_id")["frame_idx"].apply(list).tolist() == [[0, 8, 16]] * 2
    payload = tbl["payload"][0].as_py()
    got = df[df["media_id"] == 0].iloc[1]["frame"]
    assert bytes(got) == payload[800:900]  # frame 8 slice


def test_meanpool_resize_exact():
    import numpy as np

    from agr_loader_ray.stages.multimodal import meanpool_resize

    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = meanpool_resize(img, 2, 2)
    want = np.array([[2.5, 4.5], [10.5, 12.5]])
    np.testing.assert_array_equal(out, want)
    # non-dividing shape: edge-padded, deterministic
    out2 = meanpool_resize(img[:3, :3], 2, 2)
    assert out2.shape == (2, 2)


def test_audio_query_deterministic():
    import agr_loader_ray.pipelines.text_queries as tq

    a = tq.multimodal_audio_features("unused").to_pandas().sort_values("media_id")
    b = tq.multimodal_audio_features("unused").to_pandas().sort_values("media_id")
    assert (a["rms"].to_numpy() == b["rms"].to_numpy()).all()
    assert len(a) == 128
