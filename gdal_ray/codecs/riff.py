"""RIFF container codecs from the public specs: WAVE audio and AVI video.

Implemented from the Microsoft/IBM Multimedia Programming Interface spec
(RIFF, 1991) and the OpenDML AVI extensions — the container layer only,
in pure numpy.  Video frames are baseline JPEG ('MJPG' streams, decoded by
:mod:`gdal_ray.codecs.jpeg`, our from-spec ITU-T T.81 codec) or
uncompressed bottom-up BGR DIBs ('00db' chunks, BI_RGB).  Audio is PCM
8/16/32-bit or IEEE float32/64 ('fmt ' tags 1 and 3).

The reference treats media formats as pluggable leaf drivers
(frmts/... in yorickdewid/gdal); these are the two containers a
web-crawl media table actually carries that need no external codec
library, which makes the multimodal stages in
:mod:`gdal_ray.stages.multimodal` real end-to-end instead of stubbed.

All multi-byte integers are little-endian; every RIFF chunk is padded to
an even byte boundary.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_wav",
    "decode_wav",
    "encode_avi",
    "decode_avi",
]


# ---------------------------------------------------------------------------
# chunk plumbing


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(tag: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", tag + payload)


def _walk(buf: memoryview, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each chunk in range."""
    pos = start
    while pos + 8 <= end:
        tag = bytes(buf[pos : pos + 4])
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)


# ---------------------------------------------------------------------------
# WAVE


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """PCM16 WAVE.  ``samples``: int16 ``(n,)`` or ``(n, channels)``."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    block = 2 * ch
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 16)
    body = b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", s.tobytes())
    return _chunk(b"RIFF", body)


# --------------------------------------------------------------- G.711
# ITU-T G.711 companding (WAVE format tags 6 = A-law, 7 = µ-law) — the
# telephony/crawl audio formats.  Both laws are formula-defined by the
# public spec: sign + 3-bit exponent (segment) + 4-bit mantissa; µ-law
# adds bias 0x84 and inverts all bits, A-law XORs 0x55 on even bits.
# Decode is a 256-entry LUT built from the formula; encode is the
# vectorized inverse.  Known-properties pytest: two µ-law zeros, full-code
# self-consistency, max magnitudes 32124 (µ) / 32256 (A).

_MULAW_BIAS = 0x84


def _build_mulaw_lut() -> np.ndarray:
    codes = np.arange(256, dtype=np.uint8)
    u = ~codes
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    t = (((mant.astype(np.int32) << 3) + _MULAW_BIAS) << exp)
    mag = t - _MULAW_BIAS
    return np.where(u & 0x80, _MULAW_BIAS - t, mag).astype(np.int16)


def _build_alaw_lut() -> np.ndarray:
    codes = np.arange(256, dtype=np.uint8) ^ 0x55
    exp = (codes >> 4) & 0x07
    mant = (codes & 0x0F).astype(np.int32)
    t = np.where(exp == 0, (mant << 4) + 8,
                 ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(codes & 0x80, t, -t).astype(np.int16)  # sign bit = positive


MULAW_LUT = _build_mulaw_lut()
ALAW_LUT = _build_alaw_lut()


def mulaw_encode(s: np.ndarray) -> np.ndarray:
    """int16 linear -> µ-law codes (vectorized G.711 companding)."""
    x = np.asarray(s, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + _MULAW_BIAS
    exp = np.clip(np.floor(np.log2(mag)).astype(np.int32) - 7, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant)).astype(np.uint8)


def alaw_encode(s: np.ndarray) -> np.ndarray:
    """int16 linear -> A-law codes (vectorized G.711 companding)."""
    x = np.asarray(s, dtype=np.int32) >> 3  # 13-bit law
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x >= 0, x, -x - 1)
    exp = np.clip(np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 4,
                  0, 7)
    mant = np.where(exp == 0, (mag >> 1) & 0x0F, (mag >> exp) & 0x0F)
    return (((exp << 4) | mant) ^ mask).astype(np.uint8)


def encode_wav_g711(samples: np.ndarray, sample_rate: int = 8000,
                    law: str = "mulaw") -> bytes:
    """G.711-companded WAVE (format tag 7 µ-law / 6 A-law), 8 bits/sample."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    tag = 7 if law == "mulaw" else 6
    codes = (mulaw_encode(s) if law == "mulaw" else alaw_encode(s))
    fmt = struct.pack("<HHIIHH", tag, ch, sample_rate, sample_rate * ch, ch, 8)
    body = b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", codes.tobytes())
    return _chunk(b"RIFF", body)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 samples ``(n, channels)``, sample_rate).

    Accepts PCM 8 (unsigned, offset-128) / 16 / 32-bit and IEEE float32/64
    (format tags 1 and 3, plus WAVE_FORMAT_EXTENSIBLE 0xFFFE wrapping
    either); wider types are narrowed to int16 full-scale.
    """
    buf = memoryview(data)
    if bytes(buf[:4]) != b"RIFF" or bytes(buf[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    end = min(len(buf), 8 + riff_size)
    fmt_tag = ch = rate = bits = None
    raw = None
    for tag, off, size in _walk(buf, 12, end):
        if tag == b"fmt ":
            fmt_tag, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", buf, off)
            if fmt_tag == 0xFFFE and size >= 40:  # EXTENSIBLE: real tag leads the GUID
                (fmt_tag,) = struct.unpack_from("<H", buf, off + 24)
        elif tag == b"data":
            raw = bytes(buf[off : off + size])
    if fmt_tag is None or raw is None:
        raise ValueError("WAVE missing fmt / data chunk")
    if fmt_tag == 1:  # PCM
        if bits == 16:
            s = np.frombuffer(raw, dtype="<i2")
        elif bits == 8:
            s = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8
        elif bits == 32:
            s = (np.frombuffer(raw, dtype="<i4") >> 16).astype(np.int16)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif fmt_tag == 3:  # IEEE float
        f = np.frombuffer(raw, dtype="<f4" if bits == 32 else "<f8")
        s = np.clip(np.round(f * 32767.0), -32768, 32767).astype(np.int16)
    elif fmt_tag == 6:  # G.711 A-law
        s = ALAW_LUT[np.frombuffer(raw, dtype=np.uint8)]
    elif fmt_tag == 7:  # G.711 µ-law
        s = MULAW_LUT[np.frombuffer(raw, dtype=np.uint8)]
    else:
        raise ValueError(f"unsupported WAVE format tag {fmt_tag}")
    n = len(s) // ch * ch
    return s[:n].reshape(-1, ch), int(rate)


# ---------------------------------------------------------------------------
# AVI

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def _dib_from_frame(frame: np.ndarray) -> bytes:
    """uint8 (h,w) or (h,w,3) RGB → bottom-up BGR24 rows padded to 4 bytes."""
    if frame.ndim == 2:
        frame = np.repeat(frame[:, :, None], 3, axis=2)
    h, w = frame.shape[:2]
    bgr = frame[::-1, :, ::-1]  # bottom-up, RGB→BGR
    stride = (w * 3 + 3) & ~3
    row = np.zeros((h, stride), np.uint8)
    row[:, : w * 3] = bgr.reshape(h, w * 3)
    return row.tobytes()


def _frame_from_dib(payload: bytes, w: int, h: int, bits: int) -> np.ndarray:
    stride = ((w * bits // 8) + 3) & ~3
    rows = np.frombuffer(payload, np.uint8)[: h * stride].reshape(h, stride)
    if bits == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return bgr[::-1, :, ::-1].copy()
    if bits == 8:  # grayscale palette assumed identity
        return rows[::-1, :w].copy()
    raise ValueError(f"unsupported DIB bit depth {bits}")


def encode_avi(
    frames: np.ndarray,
    fps: float = 25.0,
    *,
    codec: str = "MJPG",
    quality: int = 85,
) -> bytes:
    """frames uint8 ``(n, h, w)`` or ``(n, h, w, 3)`` → AVI bytes.

    ``codec='MJPG'`` stores each frame as a baseline JPEG ('00dc' chunks);
    ``codec='DIB '`` stores uncompressed bottom-up BGR24 ('00db').
    """
    frames = np.asarray(frames, dtype=np.uint8)
    n = len(frames)
    h, w = frames.shape[1:3]
    if codec == "MJPG":
        from gdal_ray.codecs.jpeg import encode_jpeg

        payloads = [encode_jpeg(f, quality=quality) for f in frames]
        ckid, compression, bitcount = b"00dc", b"MJPG", 24
    elif codec == "DIB ":
        payloads = [_dib_from_frame(f) for f in frames]
        ckid, compression, bitcount = b"00db", struct.pack("<I", 0), 24
    else:
        raise ValueError(f"unsupported AVI codec {codec!r}")

    scale, rate = 1000, int(round(fps * 1000))
    bufsz = max(len(p) for p in payloads) if payloads else 0
    avih = struct.pack(
        "<14I",
        int(1e6 * scale / max(rate, 1)),  # dwMicroSecPerFrame
        bufsz * int(fps + 1),  # dwMaxBytesPerSec (advisory)
        0,
        _AVIF_HASINDEX,
        n,
        0,
        1,  # dwStreams
        bufsz,
        w,
        h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIii4H",
        b"vids",
        compression if codec == "MJPG" else b"DIB ",
        0, 0, 0, 0,
        scale, rate, 0, n, bufsz, -1, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, bitcount,
        compression if codec == "MJPG" else b"\x00\x00\x00\x00",
        len(payloads[0]) if payloads else 0,
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = b"".join(_chunk(ckid, p) for p in payloads)
    movi = _list(b"movi", movi_chunks)
    # idx1 offsets are relative to the 'movi' fourcc position
    idx = bytearray()
    off = 4
    for p in payloads:
        idx += struct.pack("<4sIII", ckid, _AVIIF_KEYFRAME, off, len(p))
        off += 8 + len(p) + (len(p) & 1)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return _chunk(b"RIFF", body)


def decode_avi(data: bytes) -> tuple[np.ndarray, float]:
    """→ (uint8 frames ``(n, h, w, 3)``, fps).  MJPG and BI_RGB DIB streams."""
    buf = memoryview(data)
    if bytes(buf[:4]) != b"RIFF" or bytes(buf[8:12]) != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    end = min(len(buf), 8 + riff_size)
    fps, w, h, bits = 25.0, None, None, 24
    compression = b"\x00\x00\x00\x00"
    frames: list[np.ndarray] = []

    def _scan_strl(off, size):
        nonlocal fps, w, h, bits, compression
        for tag, o, s in _walk(buf, off, off + size):
            if tag == b"strh" and s >= 48:
                fcc_type = bytes(buf[o : o + 4])
                if fcc_type != b"vids":
                    continue
                scale, rate = struct.unpack_from("<II", buf, o + 20)
                if scale:
                    fps = rate / scale
            elif tag == b"strf" and s >= 40:
                _bi, bw, bh, _pl, bbits, comp = struct.unpack_from("<IiiHH4s", buf, o)
                w, h, bits, compression = bw, abs(bh), bbits, comp
        return None

    def _scan(off, size):
        for tag, o, s in _walk(buf, off, off + size):
            if tag == b"LIST":
                kind = bytes(buf[o : o + 4])
                if kind == b"strl":
                    _scan_strl(o + 4, s - 4)
                else:
                    _scan(o + 4, s - 4)
            elif tag[2:] == b"dc" or (tag[2:] == b"db" and compression == b"\x00\x00\x00\x00"):
                payload = bytes(buf[o : o + s])
                if tag[2:] == b"dc" or compression in (b"MJPG", b"mjpg"):
                    from gdal_ray.codecs.jpeg import decode_jpeg

                    f = decode_jpeg(payload)
                    if f.ndim == 2:
                        f = np.repeat(f[:, :, None], 3, axis=2)
                    frames.append(f)
                else:
                    frames.append(_frame_from_dib(payload, w, h, bits))
        return None

    _scan(12, end - 12)
    if not frames:
        raise ValueError("AVI contains no video frames")
    return np.stack(frames), float(fps)
