"""MPEG audio (MP3) frame indexing from the public ISO/IEC 11172-3 /
13818-3 header layout.

Audio-corpus curation needs duration / bitrate / sample-rate / frame
counts for billions of MP3s WITHOUT full decode — the scan is a header
walk that skips every payload.  This module makes that layer real:

- 4-byte frame-header parse (version 1/2/2.5, layers I-III, the
  published bitrate and sample-rate tables, padding bit, CRC flag,
  channel mode),
- the frame-length arithmetic (spec §2.4.3.1: Layer I
  ``(12·bitrate/rate + pad)·4``; Layers II/III
  ``N·bitrate/rate + pad`` with N=144 (MPEG1 L2/L3, MPEG2 L2) or 72
  (MPEG2/2.5 L3)),
- ID3v2 tag skip (syncsafe size) and ID3v1 trailer detection,
- Xing/Info VBR header parse (frame/byte totals + 100-byte TOC) at the
  version/mode-dependent side-info offset,
- a synthesizer (`build_mp3`) emitting spec-valid frames with
  deterministic filler payloads so tests and oracle queries exercise
  the real walker with no encoder lib.

Payload (hybrid filterbank) DECODE is honestly gated — no MP3 codec
lib exists in this sandbox; `decode_mp3` raises naming the gap.  The
walker is the part a 100-TB curation pass actually runs.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

# bitrate tables, kbps; index 0 = "free", 15 = invalid  (ISO 11172-3
# table B.1 / 13818-3).  Key: (version_group, layer) where version_group
# is 1 for MPEG1 and 2 for MPEG2/2.5.
_BITRATES = {
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
          0: [11025, 12000, 8000]}  # keyed by the 2-bit version field


@dataclass
class Mp3Frame:
    offset: int
    size: int
    version: float        # 1, 2, or 2.5
    layer: int            # 1..3
    bitrate_kbps: int
    sample_rate: int
    padding: bool
    crc: bool
    channels: int
    samples: int          # samples per frame for this version/layer


def parse_frame_header(data: bytes, off: int) -> Mp3Frame | None:
    """Parse a 4-byte header at off; None if not a valid frame sync."""
    if off + 4 > len(data):
        return None
    h = struct.unpack_from(">I", data, off)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    vbits = (h >> 19) & 3          # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    lbits = (h >> 17) & 3          # 1=III, 2=II, 3=I
    if vbits == 1 or lbits == 0:
        return None
    version = {0: 2.5, 2: 2.0, 3: 1.0}[vbits]
    layer = 4 - lbits
    crc = ((h >> 16) & 1) == 0
    bidx = (h >> 12) & 0xF
    ridx = (h >> 10) & 3
    if bidx in (0, 15) or ridx == 3:
        return None
    vgroup = 1 if vbits == 3 else 2
    bitrate = _BITRATES[(vgroup, layer)][bidx]
    rate = _RATES[vbits][ridx]
    padding = bool((h >> 9) & 1)
    mode = (h >> 6) & 3
    channels = 1 if mode == 3 else 2
    if layer == 1:
        size = (12 * bitrate * 1000 // rate + padding) * 4
        samples = 384
    else:
        n = 144 if (vgroup == 1 or layer == 2) else 72
        # spec: MPEG2/2.5 Layer III uses 72 (576 samples); MPEG2 Layer II
        # keeps 144.  Layer II always 1152 samples.
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        size = n * bitrate * 1000 // rate + padding
    return Mp3Frame(offset=off, size=size, version=version, layer=layer,
                    bitrate_kbps=bitrate, sample_rate=rate, padding=padding,
                    crc=crc, channels=channels, samples=samples)


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    b = data[6:10]
    if any(x & 0x80 for x in b):
        return 0
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
    footer = 10 if (data[5] & 0x10) else 0
    return 10 + size + footer


def _side_info_len(f: Mp3Frame) -> int:
    """Layer III side-info length (bytes) — where Xing lives."""
    if f.version == 1.0:
        return 32 if f.channels == 2 else 17
    return 17 if f.channels == 2 else 9


def parse_xing(data: bytes, f: Mp3Frame) -> dict | None:
    """Xing/Info VBR header in the first frame, or None."""
    p = f.offset + 4 + (2 if f.crc else 0) + _side_info_len(f)
    tag = data[p:p + 4]
    if tag not in (b"Xing", b"Info"):
        return None
    flags = struct.unpack_from(">I", data, p + 4)[0]
    out = {"tag": tag.decode(), "vbr": tag == b"Xing"}
    q = p + 8
    if flags & 1:
        out["frames"] = struct.unpack_from(">I", data, q)[0]; q += 4
    if flags & 2:
        out["bytes"] = struct.unpack_from(">I", data, q)[0]; q += 4
    if flags & 4:
        out["toc"] = bytes(data[q:q + 100]); q += 100
    if flags & 8:
        out["quality"] = struct.unpack_from(">I", data, q)[0]
    return out


def index_mp3(data: bytes, *, max_resync: int = 4096) -> dict:
    """Walk every frame; return the curation-scan summary.

    Resyncs across up to max_resync bytes of garbage between frames
    (real-world crawl MP3s contain junk); an ID3v1 trailer (128-byte
    'TAG') is recognized and not treated as junk.
    """
    start = _id3v2_size(data)
    end = len(data)
    if end - start >= 128 and data[end - 128:end - 125] == b"TAG":
        end -= 128
    frames: list[Mp3Frame] = []
    xing = None
    off = start
    junk = 0
    while off + 4 <= end:
        f = parse_frame_header(data, off)
        if f is None or f.offset + f.size > end:
            off += 1
            junk += 1
            if junk > max_resync:
                break
            continue
        junk = 0
        if not frames:
            xing = parse_xing(data, f)
        frames.append(f)
        off = f.offset + f.size
    audio_frames = frames[1:] if xing is not None else frames
    n = len(audio_frames)
    total_samples = sum(f.samples for f in audio_frames)
    rate = audio_frames[0].sample_rate if n else 0
    brs = np.array([f.bitrate_kbps for f in audio_frames], dtype=np.int64)
    return {
        "n_frames": n,
        "sample_rate": rate,
        "channels": audio_frames[0].channels if n else 0,
        "layer": audio_frames[0].layer if n else 0,
        "version": audio_frames[0].version if n else 0.0,
        "total_samples": total_samples,
        "duration_ms": (total_samples * 1000 // rate) if rate else 0,
        "total_bytes": int(sum(f.size for f in audio_frames)),
        "n_padded": int(sum(f.padding for f in audio_frames)),
        "is_vbr": bool(len(np.unique(brs)) > 1) if n else False,
        "avg_bitrate_kbps": float(brs.mean()) if n else 0.0,
        "xing": xing,
        "frames": frames,
    }


def decode_mp3(data: bytes) -> np.ndarray:
    raise NotImplementedError(
        "MP3 payload decode (polyphase filterbank + IMDCT) needs a codec "
        "lib absent from this sandbox; the frame INDEX path (index_mp3) "
        "is the real curation scan and is fully implemented")


# --------------------------------------------------------------- writer

_BR_INDEX = {(g, l): {b: i for i, b in enumerate(t)}
             for (g, l), t in _BITRATES.items()}
_RATE_INDEX = {vb: {r: i for i, r in enumerate(t)} for vb, t in _RATES.items()}


def build_frame(*, bitrate_kbps: int, sample_rate: int = 44100,
                padding: bool = False, version: float = 1.0, layer: int = 3,
                mono: bool = False, fill: int = 0) -> bytes:
    """One spec-valid frame with deterministic filler payload."""
    vbits = {1.0: 3, 2.0: 2, 2.5: 0}[version]
    vgroup = 1 if version == 1.0 else 2
    bidx = _BR_INDEX[(vgroup, layer)][bitrate_kbps]
    ridx = _RATE_INDEX[vbits][sample_rate]
    lbits = 4 - layer
    h = (0x7FF << 21) | (vbits << 19) | (lbits << 17) | (1 << 16) \
        | (bidx << 12) | (ridx << 10) | (int(padding) << 9) \
        | ((3 if mono else 0) << 6)
    f = parse_frame_header(struct.pack(">I", h) + b"\x00" * 8, 0)
    body = bytes((fill + i) % 256 for i in range(f.size - 4))
    return struct.pack(">I", h) + body


def build_mp3(frame_bitrates: list[int], *, sample_rate: int = 44100,
              pad_every: int = 0, id3v2: bytes | None = None,
              xing: bool = False, mono: bool = False) -> bytes:
    """Concatenate spec-valid MPEG1 Layer III frames (one bitrate per
    frame → VBR if they differ); optionally a leading ID3v2 tag and a
    Xing first frame."""
    parts = []
    if id3v2 is not None:
        size = len(id3v2)
        hdr = b"ID3\x04\x00\x00" + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                                          (size >> 7) & 0x7F, size & 0x7F])
        parts.append(hdr + id3v2)
    if xing:
        first = bytearray(build_frame(bitrate_kbps=frame_bitrates[0],
                                      sample_rate=sample_rate, mono=mono))
        si = 32 if not mono else 17
        p = 4 + si
        # flags=1 (frame count only) — the minimal spec-shaped header
        payload = b"Xing" + struct.pack(">II", 1, len(frame_bitrates))
        first[p:p + len(payload)] = payload
        parts.append(bytes(first))
    for i, br in enumerate(frame_bitrates):
        pad = bool(pad_every and (i % pad_every == pad_every - 1))
        parts.append(build_frame(bitrate_kbps=br, sample_rate=sample_rate,
                                 padding=pad, mono=mono, fill=i))
    return b"".join(parts)
