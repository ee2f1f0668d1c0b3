"""Property drills for the multimodal stage family (VERDICT r3 item 10:
"extend to the linkage/PPJoin and multimodal families next").

Every stage here is a deterministic pure function of its batch, so the
properties run the stage ``__call__`` directly against a per-row naive
Python/numpy reference — no Ray session, no oracle SQL.  Hypothesis
aims at the edges the fixed fixtures can't reach: 1-pixel-wide rows
(Sub/Paeth left-lane bootstrap), odd sizes that don't divide the pool
factor, clips shorter than one analysis window, zero-frame videos,
every scanline filter on every row."""

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
from hypothesis import given, settings

from agr_loader_ray.stages.multimodal import (
    AugmentImage,
    DecodeAudioPCM,
    FrameAudioWindows,
    ResizeImage,
    SampleFrames,
    frame_checksums,
    meanpool_resize,
)
from agr_loader_ray.stages.png import png_decode, png_encode


@st.composite
def image_and_filters(draw):
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 12))
    ch = draw(st.sampled_from([1, 3, 4]))
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    filters = [int(rng.integers(0, 5)) for _ in range(h)]
    return img, filters


@settings(max_examples=60, deadline=None)
@given(data=image_and_filters())
def test_png_roundtrip(data):
    img, filters = data
    assert np.array_equal(png_decode(png_encode(img, filters)), img)


@settings(max_examples=30, deadline=None)
@given(data=image_and_filters())
def test_png_filter0_scanlines_are_raw(data):
    """Spec check independent of the decoder: with filter 0 the IDAT
    stream is literally 0x00 + raw row bytes per scanline."""
    import struct
    import zlib

    img, _ = data
    enc = png_encode(img, 0)
    pos, idat = 8, []
    while pos + 8 <= len(enc):
        (ln,) = struct.unpack(">I", enc[pos:pos + 4])
        if enc[pos + 4:pos + 8] == b"IDAT":
            idat.append(enc[pos + 8:pos + 8 + ln])
        pos += 12 + ln
    raw = zlib.decompress(b"".join(idat))
    arr = img if img.ndim == 3 else img[:, :, None]
    h, w, ch = arr.shape
    stride = w * ch
    for y in range(h):
        base = y * (stride + 1)
        assert raw[base] == 0
        assert raw[base + 1:base + 1 + stride] == arr[y].tobytes()


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), h=st.integers(1, 15),
       w=st.integers(1, 15), oh=st.integers(1, 6), ow=st.integers(1, 6))
def test_meanpool_resize_matches_naive(seed, h, w, oh, ow):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w)).astype(np.float64)
    got = meanpool_resize(img, oh, ow)
    ph, pw = -(-h // oh) * oh, -(-w // ow) * ow
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    bh, bw = ph // oh, pw // ow
    want = np.empty((oh, ow))
    for i in range(oh):
        for j in range(ow):
            want[i, j] = padded[i * bh:(i + 1) * bh,
                                j * bw:(j + 1) * bw].mean()
    assert np.allclose(got, want)


def _gray_batch(rng, n, size):
    imgs = [rng.integers(0, 256, size=(size, size)).astype(np.uint8)
            for _ in range(n)]
    return imgs, pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array(
            [png_encode(im, [y % 5 for y in range(size)]) for im in imgs],
            pa.binary()),
    })


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 4),
       size=st.sampled_from([4, 5, 8, 9, 12]), factor=st.sampled_from([2, 3]))
def test_resize_image_matches_naive(seed, n, size, factor):
    rng = np.random.default_rng(seed)
    imgs, batch = _gray_batch(rng, n, size)
    out = ResizeImage(factor=factor)(batch)
    for i, im in enumerate(imgs):
        img = im.astype(np.int64)
        near = img[::factor, ::factor].reshape(-1)
        assert out["rz_sum"][i].as_py() == int(near.sum())
        assert out["rz_checksum"][i].as_py() == int(
            (near * (np.arange(len(near)) + 1)).sum())
        assert out["n_px_out"][i].as_py() == len(near)
        h = size - size % factor
        blocks = img[:h, :h].reshape(h // factor, factor,
                                     h // factor, factor).sum(axis=(1, 3)) \
            .reshape(-1)
        assert out["pool_checksum"][i].as_py() == int(
            (blocks * np.arange(len(blocks)) + blocks).sum())


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 4),
       size=st.sampled_from([4, 8, 12]), delta=st.integers(0, 255))
def test_augment_image_matches_naive(seed, n, size, delta):
    rng = np.random.default_rng(seed)
    imgs, batch = _gray_batch(rng, n, size)
    out = AugmentImage(brightness=delta)(batch)
    q, c = size // 4, size // 2
    wts = (np.arange(size * size, dtype=np.int64) + 1).reshape(size, size)
    cwts = (np.arange(c * c, dtype=np.int64) + 1).reshape(c, c)
    for i, im in enumerate(imgs):
        img = im.astype(np.int64)
        assert out["flip_checksum"][i].as_py() == int(
            (img[:, ::-1] * wts).sum())
        crop = img[q:q + c, q:q + c]
        assert out["crop_sum"][i].as_py() == int(crop.sum())
        assert out["crop_checksum"][i].as_py() == int((crop * cwts).sum())
        assert out["bright_sum"][i].as_py() == int(
            np.minimum(img + delta, 255).sum())


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 4),
       n_frames=st.integers(0, 12), frame_bytes=st.integers(1, 16),
       every_k=st.integers(1, 5), max_frames=st.integers(1, 4))
def test_sample_frames_matches_naive(seed, n, n_frames, frame_bytes,
                                     every_k, max_frames):
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=n_frames * frame_bytes)
                .astype(np.uint8).tobytes() for _ in range(n)]
    batch = pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array(payloads, pa.binary()),
        "n_frames": pa.array(np.full(n, n_frames, dtype=np.int32)),
        "frame_bytes": pa.array(np.full(n, frame_bytes, dtype=np.int32)),
    })
    out = SampleFrames(every_k=every_k, max_frames=max_frames)(batch)
    want = []  # (media_id, frame_idx, frame_bytes_payload)
    for i, p in enumerate(payloads):
        lim = min(n_frames, every_k * max_frames)
        for fidx in range(0, lim, every_k):
            want.append((i, fidx,
                         p[fidx * frame_bytes:(fidx + 1) * frame_bytes]))
    got = list(zip(out["media_id"].to_pylist(),
                   out["frame_idx"].to_pylist(),
                   out["frame"].to_pylist()))
    assert got == want
    # and the checksum kernel over the sampled frames matches naive math
    if len(want):
        sums = frame_checksums(out)
        for r, (_, _, fb) in enumerate(want):
            v = np.frombuffer(fb, np.uint8).astype(np.int64)
            assert sums["frame_sum"][r].as_py() == int(v.sum())
            assert sums["frame_checksum"][r].as_py() == int(
                (v * (np.arange(len(v)) + 1)).sum())


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 4),
       samples=st.integers(0, 600), frame=st.sampled_from([64, 256, 1024]))
def test_decode_audio_matches_naive(seed, n, samples, frame):
    rng = np.random.default_rng(seed)
    clips = [rng.integers(-32768, 32768, size=samples).astype("<i2")
             for _ in range(n)]
    batch = pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array([c.tobytes() for c in clips], pa.binary()),
        "sample_rate": pa.array(np.full(n, 8000, dtype=np.int32)),
    })
    out = DecodeAudioPCM(frame=frame)(batch)
    for i, c in enumerate(clips):
        s = c.astype(np.int64)
        assert out["n_samples"][i].as_py() == samples
        assert out["sumsq"][i].as_py() == int((s * s).sum())
        if samples:
            x = s / 32768.0
            flips = int(np.count_nonzero(
                np.signbit(x[1:]) != np.signbit(x[:-1])))
            assert out["zc_count"][i].as_py() == flips
            assert abs(out["rms"][i].as_py()
                       - float(np.sqrt(np.mean(x * x)))) < 1e-12
        else:
            assert out["zc_count"][i].as_py() == 0


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 4),
       samples=st.integers(0, 600), win=st.sampled_from([32, 128, 512]))
def test_frame_audio_windows_matches_naive(seed, n, samples, win):
    rng = np.random.default_rng(seed)
    clips = [rng.integers(-32768, 32768, size=samples).astype("<i2")
             for _ in range(n)]
    batch = pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array([c.tobytes() for c in clips], pa.binary()),
    })
    out = FrameAudioWindows(win=win)(batch)
    want = []
    for i, c in enumerate(clips):
        s = c.astype(np.int64)
        for widx in range(samples // win):
            seg = s[widx * win:(widx + 1) * win]
            want.append((i, widx, int((seg * seg).sum()),
                         int(np.abs(seg).max())))
    got = list(zip(out["media_id"].to_pylist(), out["window_idx"].to_pylist(),
                   out["energy"].to_pylist(), out["peak"].to_pylist()))
    assert got == want
