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
