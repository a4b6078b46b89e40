"""Pure-numpy media codecs: PNG (grayscale/RGB) and WAV (PCM16).

The container ships no image/audio libraries, but PNG needs only zlib
(stdlib) plus the per-scanline unfiltering math, and WAV is plain RIFF
framing — so the "decode" stage of the multimodal pipeline can be REAL
here, not a stub. These kernels run inside the Arrow-batched
``mapInPandas`` stage of :mod:`.multimodal`; JPEG and friends stay
behind the pillow stub.

Encode writes filter-0 (None) scanlines — any standard viewer opens the
output. Decode implements all five PNG filter types (None/Sub/Up/
Average/Paeth), so externally-produced PNGs decode too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["png_encode", "png_decode", "wav_encode", "wav_decode"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """8-bit PNG from an HxW (grayscale) or HxWx3 (RGB) uint8 array."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("expected uint8 HxW or HxWx3 array")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError("expected 3 channels for RGB")
    h, w = img.shape[:2]
    color_type = 0 if img.ndim == 2 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = img.reshape(h, -1)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """uint8 HxW (grayscale) or HxWx3 (RGB) array from an 8-bit
    non-interlaced PNG. Handles every filter type; rejects palette /
    alpha / 16-bit / interlaced images (out of scope for the training
    pipeline's luma features)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in (0, 2):
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color_type}, "
            f"interlace={interlace}); only 8-bit gray/RGB non-interlaced"
        )
    ch = 1 if color_type == 0 else 3
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt IDAT length")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    if not scan[:, 0].any():
        # all scanlines filter-0 (what png_encode writes): no
        # unfiltering needed — skip the per-row Python loop entirely
        out = np.ascontiguousarray(scan[:, 1:])
        return out.reshape(h, w) if ch == 1 else out.reshape(h, w, 3)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub: left neighbor, sequential per pixel
            cur = line
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, 3)


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono PCM16 WAV from an int16 array."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("expected 1-D int16 samples")
    payload = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """(int16 samples, sample_rate) from a mono PCM16 WAV."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError("only mono PCM16 supported")
        elif tag == b"data":
            samples = np.frombuffer(payload, dtype=np.int16)
        pos += 8 + length + (length & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate
