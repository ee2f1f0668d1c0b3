"""Multimodal (image/audio/video) column stages.

Media payloads are opaque ``binary`` columns with typed metadata
(mime, width/height or sample-rate, …).  Decode / resize /
feature-extract run as actor-pool ``map_batches`` stages with SMALL
batch sizes (large binary payloads: cap block bytes, not row counts —
SURVEY §7.5.5 wide-rows rule).

All three decode paths are REAL in this container:

- **image**: pure-stdlib PNG codec (``stages/png.py`` — zlib inflate +
  per-scanline filter reconstruction), grayscale/RGB/RGBA 8-bit.
- **audio**: raw s16le PCM needs no codec — windowed RMS /
  zero-crossing / Hann-FFT spectral centroid, plus exact integer
  columns (sumsq, zc_count) for the typed-hash oracle gate.
- **video**: fixed-size frame-grid byte slicing (every-kth frame),
  fully vectorized offset math over the Arrow binary buffers.

The synth fixtures derive every payload byte from a multiplicative-hash
formula (``_hash_bytes``) that is exactly mirrorable in DuckDB HUGEINT
arithmetic, so decode → feature extraction is verified byte-exactly by
SQL oracles with no media input files (``pipelines/sketch_sql.py``).

Reference analogue: the FASTA random-access helper — a heavy binary
resource opened once per worker and sliced per record
(``/root/reference/src/etl/helpers/assembly_sequence_helper.py:37-73``,
SURVEY S11/T2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .png import png_decode, png_encode

#: multiplicative-hash constant (odd, 64-bit) for synth payload bytes —
#: inlined into the SQL oracles; see sketch_sql.multimodal oracles.
HASH_A = 6364136223846793005

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)


def _hash_bytes(base: int, n: int, shift: int = 24, mod: int = 256) -> np.ndarray:
    """Deterministic pseudo-random bytes: ((A*(base+i+1)) mod 2^64 >> shift)
    % mod for i in 0..n-1 — exactly mirrorable in SQL HUGEINT math."""
    idx = np.arange(n, dtype=np.uint64) + np.uint64(base + 1)
    with np.errstate(over="ignore"):
        v = np.uint64(HASH_A) * idx
    return ((v >> np.uint64(shift)) % np.uint64(mod)).astype(np.uint64)


def synth_media_table(n: int = 64, seed: int = 42, size: int = 16) -> pa.Table:
    """Deterministic PNG media table: pixel(id, y, x) = hash formula,
    REAL-encoded with a rotating per-row scanline filter (y % 5) so the
    decoder reconstructs through every filter path.  ``seed`` is part of
    the pixel-index base for fixture variety."""
    payloads = []
    for i in range(n):
        px = _hash_bytes((seed + i) * 65536, size * size).astype(np.uint8)
        img = px.reshape(size, size)
        payloads.append(png_encode(img, [y % 5 for y in range(size)]))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/png"] * n),
            "width": pa.array(np.full(n, size, dtype=np.int32)),
            "height": pa.array(np.full(n, size, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeImage:
    """Actor-pool stage: PNG payload → features (REAL stdlib codec).

    Emits per image: an ``out_size``-wide feature vector (column means
    of the mean-pool-resized grayscale), plus exact integer columns
    (px_sum, px_checksum, n_px) over the flattened pixel bytes — the
    SQL-comparable proof that decode inverted the encoder byte-exactly.

    ``fake=True`` keeps the old deterministic stand-in as a test seam
    (hash-seeded pseudo-pixels, no codec).  Use with::

        ds.map_batches(DecodeImage, batch_format="pyarrow",
                       batch_size=32,   # small: wide binary rows
                       concurrency=(1, 4), num_cpus=1)
    """

    def __init__(self, out_size: int = 16, fake: bool = False):
        self.out_size = out_size
        self.fake = fake
        # real decoders would load heavier state ONCE here (ICC tables,
        # model weights); the PNG path needs none

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.fake:
            # deterministic fake: hash-seeded pseudo-pixels (test seam)
            seed = int.from_bytes(payload[:8], "little", signed=False)
            rng = np.random.default_rng(seed)
            return (rng.random((height, width)) * 255).astype(np.uint8)
        return png_decode(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, sums, checks, npx = [], [], [], []
        for payload, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            img = self._decode(payload, w, h)
            flat = img.reshape(-1).astype(np.int64)
            sums.append(int(flat.sum()))
            checks.append(int((flat * (np.arange(len(flat)) + 1)).sum()))
            npx.append(len(flat))
            gray = img.astype(np.float64)
            if gray.ndim == 3:
                gray = gray.mean(axis=2)
            small = meanpool_resize(gray, self.out_size, self.out_size)
            feats.append(small.mean(axis=0).astype(np.float32))
        flat_f = pa.array(np.concatenate(feats).tolist(), pa.float32())
        feat_col = pa.FixedSizeListArray.from_arrays(flat_f, self.out_size)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": feat_col,
                "px_sum": pa.array(sums, pa.int64()),
                "px_checksum": pa.array(checks, pa.int64()),
                "n_px": pa.array(npx, pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
# Audio: raw PCM is decodable with numpy alone — REAL end to end.
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
    """Deterministic synthetic PCM: per-row sine + noise (signal
    ground-truth fixtures: rms ≈ a/√2, zcr ≈ 2f/sr, centroid ≈ f)."""
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


def synth_audio_hash_table(n: int = 128, samples: int = 8000,
                           sample_rate: int = 8000) -> pa.Table:
    """PCM payloads whose int16 samples come from the SQL-mirrorable
    hash formula: s(id, t) = hash16(id*samples + t) - 32768 — the
    typed-hash oracle fixture (exact integer features both sides)."""
    rows = []
    for i in range(n):
        s = _hash_bytes(i * samples, samples, shift=24, mod=65536).astype(np.int64)
        rows.append((s - 32768).astype("<i2").tobytes())
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(rows, pa.binary()),
            "sample_rate": pa.array(np.full(n, sample_rate, dtype=np.int32)),
        },
        schema=AUDIO_SCHEMA,
    )


class DecodeAudioPCM:
    """Actor-pool stage: s16le PCM payload → features.

    Float features (rms, zero_crossing_rate, spectral_centroid_hz) plus
    EXACT integer features (n_samples, sumsq = Σ s², zc_count = sign
    flips) — the integer pair is what the SQL oracle compares, immune
    to float summation-order differences.  Raw PCM needs no external
    codec; the FFT is the per-batch heavy compute."""

    def __init__(self, frame: int = 1024):
        self.frame = frame  # analysis window (once per actor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms_out, zcr_out, cent_out, n_out = [], [], [], []
        sumsq_out, zc_out = [], []
        for payload, sr in zip(batch["payload"].to_pylist(),
                               batch["sample_rate"].to_pylist()):
            s = np.frombuffer(payload, dtype="<i2").astype(np.int64)
            x = s.astype(np.float64) / 32768.0
            n = len(x)
            n_out.append(n)
            sumsq_out.append(int((s * s).sum()))
            if n == 0:
                rms_out.append(0.0); zcr_out.append(0.0); cent_out.append(0.0)
                zc_out.append(0)
                continue
            flips = np.signbit(x[1:]) != np.signbit(x[:-1])
            zc_out.append(int(np.count_nonzero(flips)))
            rms_out.append(float(np.sqrt(np.mean(x * x))))
            zcr_out.append(float(np.mean(flips)) if n > 1 else 0.0)
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
            "sumsq": pa.array(sumsq_out, pa.int64()),
            "zc_count": pa.array(zc_out, pa.int64()),
        })


# ---------------------------------------------------------------------------
# Video: frame sampling — vectorized byte-grid slicing over the Arrow
# binary buffers (no per-row Python).
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
    """Deterministic frame grids: byte(id, j) = hash formula over the
    flat payload index — SQL-mirrorable (``seed`` offsets the base)."""
    rows = [
        _hash_bytes((seed + i) * (1 << 24), n_frames * frame_bytes)
        .astype(np.uint8).tobytes()
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(rows, pa.binary()),
            "n_frames": pa.array(np.full(n, n_frames, dtype=np.int32)),
            "frame_bytes": pa.array(np.full(n, frame_bytes, dtype=np.int32)),
        },
        schema=VIDEO_SCHEMA,
    )


def _binary_parts(col: pa.ChunkedArray | pa.Array):
    """(offsets[int64], values[uint8]) of a binary column — zero-copy."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    values = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return off, values


class SampleFrames:
    """Actor-pool stage: video payload → every-kth-frame rows (explode).

    Output: one row per sampled frame (media_id, frame_idx, frame
    payload) — the shape a downstream DecodeImage pool consumes.  Fully
    vectorized: frame byte ranges are computed with offset arithmetic
    over the Arrow binary buffers and gathered in one fancy-index.
    Keep ``batch_size`` small: rows are wide and the explode widens
    them further.
    """

    def __init__(self, every_k: int = 8, max_frames: int = 8):
        self.every_k = every_k
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        off, values = _binary_parts(batch["payload"])
        nf = batch["n_frames"].to_numpy(zero_copy_only=False).astype(np.int64)
        fb = batch["frame_bytes"].to_numpy(zero_copy_only=False).astype(np.int64)
        mids = batch["media_id"].to_numpy(zero_copy_only=False)
        lim = np.minimum(nf, self.every_k * self.max_frames)
        n_pick = (lim + self.every_k - 1) // self.every_k  # len(range(0, lim, k))
        row = np.repeat(np.arange(len(nf)), n_pick)
        pick_start = np.concatenate(([0], np.cumsum(n_pick)[:-1]))
        local = np.arange(int(n_pick.sum()), dtype=np.int64) - pick_start[row]
        fidx = local * self.every_k
        # gather the frame bytes: one fancy-index over the values buffer
        fstart = off[row] + fidx * fb[row]
        flen = fb[row]
        out_off = np.concatenate(([0], np.cumsum(flen)))
        pos_row = np.repeat(np.arange(len(flen)), flen)
        within = np.arange(int(flen.sum()), dtype=np.int64) - out_off[pos_row]
        data = values[fstart[pos_row] + within]
        frames = pa.Array.from_buffers(
            pa.binary(), len(flen),
            [None, pa.py_buffer(out_off.astype(np.int32).tobytes()),
             pa.py_buffer(data.tobytes())],
        )
        return pa.table({
            "media_id": pa.array(mids[row], pa.int64()),
            "frame_idx": pa.array(fidx.astype(np.int32)),
            "frame": frames,
        })


def frame_checksums(t: pa.Table, col: str = "frame") -> pa.Table:
    """Exact integer features per frame: sum of bytes and the
    position-weighted checksum Σ byte[j]·(j+1) — vectorized segment
    sums over the binary buffer (reduceat), no per-row Python."""
    off, values = _binary_parts(t[col])
    starts, ends = off[:-1], off[1:]
    lens = ends - starts
    v = values.astype(np.int64)
    csum = np.concatenate(([0], np.cumsum(v)))
    fsum = csum[ends] - csum[starts]
    # position weights: byte j (0-based within frame) gets weight j+1
    pos_row = np.repeat(np.arange(len(lens)), lens)
    bounds = np.concatenate(([0], np.cumsum(lens)))
    within = np.arange(int(lens.sum()), dtype=np.int64) - bounds[pos_row]
    seg = values[starts[pos_row] + within].astype(np.int64)
    wsum_all = np.concatenate(([0], np.cumsum(seg * (within + 1))))
    wsum = wsum_all[bounds[1:]] - wsum_all[bounds[:-1]]
    return pa.table({
        "media_id": t["media_id"],
        "frame_idx": pa.array(t["frame_idx"].to_numpy(zero_copy_only=False)
                              .astype(np.int64)),
        "frame_sum": pa.array(fsum, pa.int64()),
        "frame_checksum": pa.array(wsum, pa.int64()),
        "frame_len": pa.array(lens, pa.int64()),
    })


def meanpool_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real mean-pool downscale (exact when shapes divide; edge-padded
    otherwise) — the resize math a real decoder would feed."""
    h, w = img.shape
    ph, pw = -(-h // out_h) * out_h, -(-w // out_w) * out_w
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    return padded.reshape(out_h, ph // out_h, out_w, pw // out_w).mean(axis=(1, 3))


class ResizeImage:
    """Actor-pool stage: PNG payload → REAL decode → downsample, emitting
    exact integer proofs of both resize paths:

    - nearest-neighbor gather (``img[::s, ::s]``): rz_sum + position-
      weighted rz_checksum over the resized grid;
    - 2×2 block-sum pooling (the integer core of mean-pool resize):
      pool_checksum over the same grid.

    Kernel work is numpy slicing/reshape over the decoded array — no
    per-pixel Python.  Same actor-pool shape as ``DecodeImage`` (decode
    state lives once per actor; small batches because rows carry wide
    binary payloads).
    """

    def __init__(self, factor: int = 2):
        self.factor = factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = self.factor
        ids, rz_sums, rz_checks, pool_checks, n_out = [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            img = png_decode(payload).astype(np.int64)
            near = img[::s, ::s]
            flat = near.reshape(-1)
            w = np.arange(len(flat), dtype=np.int64) + 1
            h, wd = img.shape
            blocks = img[: h - h % s, : wd - wd % s] \
                .reshape(h // s, s, wd // s, s).sum(axis=(1, 3)).reshape(-1)
            ids.append(mid)
            rz_sums.append(int(flat.sum()))
            rz_checks.append(int((flat * w).sum()))
            pool_checks.append(int((blocks * np.arange(len(blocks), dtype=np.int64)
                                    + blocks).sum()))
            n_out.append(len(flat))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "rz_sum": pa.array(rz_sums, pa.int64()),
            "rz_checksum": pa.array(rz_checks, pa.int64()),
            "pool_checksum": pa.array(pool_checks, pa.int64()),
            "n_px_out": pa.array(n_out, pa.int64()),
        })


class AugmentImage:
    """Actor-pool stage: PNG payload → REAL decode → training-data
    augmentation, emitting exact integer proofs of each transform:

    - horizontal flip: position-weighted checksum of the flipped grid
      (equivalently Σ p(y, W−1−x)·(y·W+x+1) over the original);
    - center crop (half side): crop_sum + weighted crop_checksum;
    - brightness shift (+delta, clipped at 255): bright_sum.

    Decoded images in one batch share a size, so everything after the
    per-payload PNG decode is ONE stacked numpy expression across the
    batch — no per-pixel Python.  Same actor-pool shape as DecodeImage
    (small batches: rows carry wide binary payloads).
    """

    def __init__(self, brightness: int = 40):
        self.brightness = brightness

    def __call__(self, batch: pa.Table) -> pa.Table:
        imgs = np.stack([
            png_decode(p).astype(np.int64)
            for p in batch["payload"].to_pylist()
        ])
        n, h, w = imgs.shape
        wts = (np.arange(h * w, dtype=np.int64) + 1).reshape(h, w)
        flipped = imgs[:, :, ::-1]
        q, c = h // 4, h // 2
        crop = imgs[:, q:q + c, q:q + c]
        cwts = (np.arange(c * c, dtype=np.int64) + 1).reshape(c, c)
        bright = np.minimum(imgs + self.brightness, 255)
        return pa.table({
            "media_id": batch["media_id"],
            "flip_checksum": pa.array((flipped * wts).sum(axis=(1, 2)), pa.int64()),
            "crop_sum": pa.array(crop.sum(axis=(1, 2)), pa.int64()),
            "crop_checksum": pa.array((crop * cwts).sum(axis=(1, 2)), pa.int64()),
            "bright_sum": pa.array(bright.sum(axis=(1, 2)), pa.int64()),
            "n_px": pa.array(np.full(n, h * w, dtype=np.int64)),
        })


class FrameAudioWindows:
    """Actor-pool stage: s16le PCM → fixed-length analysis windows with
    exact integer features (energy = Σ s², peak = max |s|) per window.
    Clips in a batch share a length, so framing is ONE stacked
    frombuffer + reshape across the batch — no per-clip Python.  The
    windowing step every streaming-audio feature pipeline starts with
    (the chunking sibling of DecodeAudioPCM's whole-clip features)."""

    def __init__(self, win: int = 1024):
        self.win = win

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        S = np.stack([np.frombuffer(p, dtype="<i2") for p in payloads]) \
            .astype(np.int64)
        n, total = S.shape
        nw = total // self.win
        W = S[:, : nw * self.win].reshape(n, nw, self.win)
        energy = (W * W).sum(axis=2).reshape(-1)
        peak = np.abs(W).max(axis=2).reshape(-1)
        mids = np.repeat(
            batch["media_id"].to_numpy(zero_copy_only=False), nw)
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "window_idx": pa.array(
                np.tile(np.arange(nw, dtype=np.int64), n)),
            "energy": pa.array(energy, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
        })
