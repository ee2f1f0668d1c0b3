"""Pure-stdlib PNG codec (zlib + numpy) — no Pillow in this container.

Supports the non-interlaced 8-bit critical-chunk subset: grayscale
(color type 0), RGB (2) and RGBA (6), all five scanline filters on both
encode and decode.  This closes the image-codec gap: the decode stage
(``stages/multimodal.DecodeImage``) runs REAL pixels end to end, and
the synth fixtures encode with a rotating per-row filter so every
reconstruction path (None/Sub/Up/Average/Paeth) is exercised and
byte-exact-verified against the generative pixel formula.

Reference analogue: the heavy binary random-access helper
(``/root/reference/src/etl/helpers/assembly_sequence_helper.py:37-73``)
— a binary resource decoded per record inside a worker.

Filter math follows the PNG specification (RFC 2083 §6): filters
predict each byte from the byte to its left (offset bpp), the byte
above, or the Paeth choice of left/up/up-left, all mod 256.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_OF_CHANNELS = {1: 0, 3: 2, 4: 6}
_CHANNELS_OF_COLOR = {0: 1, 2: 3, 6: 4}


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload)))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over the channel lanes."""
    a16, b16, c16 = a.astype(np.int16), b.astype(np.int16), c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc_ = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    return np.where((pa <= pb) & (pa <= pc_), a, np.where(pb <= pc_, b, c))


def png_encode(img: np.ndarray, filters: int | list[int] | None = None) -> bytes:
    """Encode a uint8 image of shape (h, w), (h, w, 3) or (h, w, 4).

    ``filters``: per-row filter type(s) 0..4 (int for all rows, list per
    row, None → 0).  Rotating filters in fixtures exercises every
    decoder reconstruction path.
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = _COLOR_OF_CHANNELS[ch]
    rows = img.reshape(h, w * ch)
    if filters is None:
        frows = [0] * h
    elif isinstance(filters, int):
        frows = [filters] * h
    else:
        frows = list(filters)
        assert len(frows) == h
    out = []
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        raw = rows[y]
        left = np.zeros_like(raw)
        left[ch:] = raw[:-ch]
        upleft = np.zeros_like(prev)
        upleft[ch:] = prev[:-ch]
        f = frows[y]
        if f == 0:
            filt = raw
        elif f == 1:
            filt = raw - left
        elif f == 2:
            filt = raw - prev
        elif f == 3:
            filt = raw - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8)
        elif f == 4:
            filt = raw - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"bad filter {f}")
        out.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(out), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode to a uint8 array of shape (h, w) or (h, w, channels)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(typ + payload) != crc:
            raise ValueError(f"bad CRC in {typ!r}")
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", payload)
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if hdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = hdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError("only 8-bit non-interlaced PNG supported")
    ch = _CHANNELS_OF_COLOR.get(color)
    if ch is None:
        raise NotImplementedError(f"color type {color} unsupported")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = y * (stride + 1)
        f = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, offset=base + 1)
        if f == 0:
            rec = line.copy()
        elif f == 1:  # Sub: per-lane cumulative sum mod 256
            rec = np.add.accumulate(
                line.reshape(w, ch), axis=0, dtype=np.uint8).reshape(stride)
        elif f == 2:  # Up: fully vectorized
            rec = line + prev
        elif f == 3:  # Average: sequential along the row, lanes vectorized
            rec = np.empty(stride, dtype=np.uint8)
            left = np.zeros(ch, dtype=np.uint16)
            lanes = line.reshape(w, ch)
            up = prev.reshape(w, ch)
            rr = rec.reshape(w, ch)
            for x in range(w):
                rr[x] = lanes[x] + ((left + up[x]) // 2).astype(np.uint8)
                left = rr[x].astype(np.uint16)
        elif f == 4:  # Paeth: sequential along the row, lanes vectorized
            rec = np.empty(stride, dtype=np.uint8)
            lanes = line.reshape(w, ch)
            up = prev.reshape(w, ch)
            rr = rec.reshape(w, ch)
            left = np.zeros(ch, dtype=np.uint8)
            upleft = np.zeros(ch, dtype=np.uint8)
            for x in range(w):
                rr[x] = lanes[x] + _paeth(left, up[x], upleft)
                left, upleft = rr[x], up[x]
        else:
            raise ValueError(f"bad scanline filter {f}")
        out[y] = rec
        prev = rec
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img
