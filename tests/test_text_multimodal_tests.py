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


def test_png_codec_roundtrip_all_filters():
    """Encode with every scanline filter (incl. rotating per-row) and
    decode back byte-exactly — gray, RGB and RGBA, odd shapes."""
    from agr_loader_ray.stages.png import png_decode, png_encode

    rng = np.random.default_rng(7)
    for shape in [(16, 16), (16, 16, 3), (16, 16, 4), (7, 13), (5, 9, 3), (1, 1)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for f in [None, 0, 1, 2, 3, 4, [y % 5 for y in range(shape[0])]]:
            np.testing.assert_array_equal(png_decode(png_encode(img, f)), img)


def test_png_decode_rejects_garbage():
    from agr_loader_ray.stages.png import png_decode

    with pytest.raises(ValueError):
        png_decode(b"xxxxxxxxxxxx")


def test_decode_image_real_codec_exact():
    """DecodeImage (real codec, default) must recover the exact pixel
    grid the synth fixture encoded — filter reconstruction proven."""
    from agr_loader_ray.stages.multimodal import _hash_bytes, synth_media_table

    tbl = synth_media_table(n=4, seed=42, size=16)
    out = DecodeImage(out_size=8)(tbl).to_pylist()
    for row in out:
        i = row["media_id"]
        px = _hash_bytes((42 + i) * 65536, 256).astype(np.int64)
        assert row["px_sum"] == int(px.sum())
        assert row["px_checksum"] == int((px * (np.arange(256) + 1)).sum())
        assert row["n_px"] == 256
        assert len(row["feature"]) == 8


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
    assert (a["sumsq"].to_numpy() == b["sumsq"].to_numpy()).all()
    assert (a["zc_count"].to_numpy() == b["zc_count"].to_numpy()).all()
    assert len(a) == 128


def test_frame_checksums_exact():
    """Vectorized frame slicing + checksum must equal the per-frame
    Python recomputation byte for byte."""
    from agr_loader_ray.stages.multimodal import (
        SampleFrames, frame_checksums, synth_video_table)

    tbl = synth_video_table(n=3, n_frames=24, frame_bytes=64)
    sampled = SampleFrames(every_k=8, max_frames=8)(tbl)
    out = frame_checksums(sampled).to_pylist()
    payloads = {r["media_id"]: r["payload"] for r in tbl.to_pylist()}
    for row in out:
        frame = payloads[row["media_id"]][row["frame_idx"] * 64:(row["frame_idx"] + 1) * 64]
        b = np.frombuffer(frame, np.uint8).astype(np.int64)
        assert row["frame_sum"] == int(b.sum())
        assert row["frame_checksum"] == int((b * (np.arange(64) + 1)).sum())
        assert row["frame_len"] == 64
