"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(mime, width/height or sample-rate, …).  Decode / resize /
feature-extract run as actor-pool ``map_batches`` stages with SMALL
batch sizes (large binary payloads: cap block bytes, not row counts —
SURVEY §7.5.5 wide-rows rule).

The decode libraries (Pillow, torchaudio, ffmpeg) are NOT in this
container, so the codec step is stubbed: ``DecodeImage`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded from the payload bytes) produces
fixed-shape arrays — making the Ray-side plumbing (schema, batch
sizing, actor signature, output layout) real and testable.

Reference analogue: the FASTA random-access helper — a heavy binary
resource opened once per worker and sliced per record
(``/root/reference/src/etl/helpers/assembly_sequence_helper.py:37-73``,
SURVEY S11/T2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table (no external data)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/png"] * n),
            "width": pa.array(rng.integers(16, 64, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 64, n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeImage:
    """Actor-pool stage: binary payload → fixed-size feature vector.

    Real pipelines plug a codec into ``_decode``; here it is stubbed.
    ``fake=True`` uses a deterministic stand-in so tests exercise the
    batch plumbing end-to-end.  Use with::

        ds.map_batches(DecodeImage, fn_constructor_kwargs={"fake": True},
                       batch_format="pyarrow", batch_size=32,   # small: wide rows
                       concurrency=(1, 4), num_cpus=1)
    """

    def __init__(self, out_size: int = 16, fake: bool = False):
        self.out_size = out_size
        self.fake = fake
        # real decoders would be constructed ONCE here (model load etc.)

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "pass fake=True for the deterministic stub"
            )
        # deterministic fake: hash-seeded pseudo-pixels at the target size
        seed = int.from_bytes(payload[:8], "little", signed=False)
        rng = np.random.default_rng(seed)
        return rng.random((self.out_size, self.out_size), dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            img = self._decode(payload, w, h)
            feats.append(img.mean(axis=0))  # toy feature: column means
        flat = pa.array(
            np.concatenate(feats).astype(np.float32).tolist(), pa.float32()
        )
        feat_col = pa.FixedSizeListArray.from_arrays(flat, self.out_size)
        return pa.table(
            {"media_id": batch["media_id"], "feature": feat_col}
        )


# ---------------------------------------------------------------------------
# Audio: raw PCM is decodable with numpy alone — this stage is REAL end to
# end (no stub): int16 little-endian payload → windowed RMS / zero-crossing
# / spectral-centroid features, fully vectorized per batch.
# ---------------------------------------------------------------------------
AUDIO_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),   # raw PCM s16le
        pa.field("sample_rate", pa.int32()),
    ]
)


def synth_audio_table(n: int = 64, seed: int = 42, samples: int = 8000,
                      sample_rate: int = 8000) -> pa.Table:
    """Deterministic synthetic PCM: per-row sine + noise."""
    rng = np.random.default_rng(seed)
    rows = []
    t = np.arange(samples) / sample_rate
    for i in range(n):
        f = 100.0 + 40.0 * (i % 10)
        wave = 0.6 * np.sin(2 * np.pi * f * t) + 0.1 * rng.standard_normal(samples)
        rows.append((np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes())
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(rows, pa.binary()),
            "sample_rate": pa.array(np.full(n, sample_rate, dtype=np.int32)),
        },
        schema=AUDIO_SCHEMA,
    )


class DecodeAudioPCM:
    """Actor-pool stage: s16le PCM payload → (rms, zero_crossing_rate,
    spectral_centroid_hz, n_samples).  A REAL decoder — raw PCM needs no
    external codec; FFT work is the per-batch heavy compute."""

    def __init__(self, frame: int = 1024):
        self.frame = frame  # analysis window (once per actor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms_out, zcr_out, cent_out, n_out = [], [], [], []
        for payload, sr in zip(batch["payload"].to_pylist(),
                               batch["sample_rate"].to_pylist()):
            x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
            n = len(x)
            n_out.append(n)
            if n == 0:
                rms_out.append(0.0); zcr_out.append(0.0); cent_out.append(0.0)
                continue
            rms_out.append(float(np.sqrt(np.mean(x * x))))
            zcr_out.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))))
            k = min(self.frame, n)
            # Hann window + power weighting: suppress leakage sidelobes so
            # the centroid tracks the dominant tone
            power = np.abs(np.fft.rfft(x[:k] * np.hanning(k))) ** 2
            freqs = np.fft.rfftfreq(k, d=1.0 / sr)
            denom = power.sum() or 1.0
            cent_out.append(float((freqs * power).sum() / denom))
        return pa.table({
            "media_id": batch["media_id"],
            "rms": pa.array(rms_out, pa.float64()),
            "zero_crossing_rate": pa.array(zcr_out, pa.float64()),
            "spectral_centroid_hz": pa.array(cent_out, pa.float64()),
            "n_samples": pa.array(n_out, pa.int64()),
        })


# ---------------------------------------------------------------------------
# Video: frame sampling.  The byte-slicing layout math is REAL (fixed-size
# frame grid, every-kth selection); only the per-frame pixel decode reuses
# the DecodeImage stub/fake.
# ---------------------------------------------------------------------------
VIDEO_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),     # n_frames × frame_bytes
        pa.field("n_frames", pa.int32()),
        pa.field("frame_bytes", pa.int32()),
    ]
)


def synth_video_table(n: int = 16, seed: int = 42, n_frames: int = 24,
                      frame_bytes: int = 1024) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = [rng.integers(0, 256, size=n_frames * frame_bytes,
                         dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(rows, pa.binary()),
            "n_frames": pa.array(np.full(n, n_frames, dtype=np.int32)),
            "frame_bytes": pa.array(np.full(n, frame_bytes, dtype=np.int32)),
        },
        schema=VIDEO_SCHEMA,
    )


class SampleFrames:
    """Actor-pool stage: video payload → every-kth-frame rows (explode).

    Output: one row per sampled frame (media_id, frame_idx, frame
    payload) — the shape a downstream DecodeImage pool consumes.  Keep
    ``batch_size`` small: rows are wide and the explode widens them
    further.
    """

    def __init__(self, every_k: int = 8, max_frames: int = 8):
        self.every_k = every_k
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, payload, nf, fb in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist(),
            batch["n_frames"].to_pylist(), batch["frame_bytes"].to_pylist(),
        ):
            picks = range(0, min(nf, self.every_k * self.max_frames), self.every_k)
            for i in picks:
                ids.append(mid)
                idxs.append(i)
                frames.append(payload[i * fb:(i + 1) * fb])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def meanpool_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real mean-pool downscale (exact when shapes divide; edge-padded
    otherwise) — the resize math a real decoder would feed."""
    h, w = img.shape
    ph, pw = -(-h // out_h) * out_h, -(-w // out_w) * out_w
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    return padded.reshape(out_h, ph // out_h, out_w, pw // out_w).mean(axis=(1, 3))
