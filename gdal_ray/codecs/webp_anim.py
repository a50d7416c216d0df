"""Animated WebP (VP8X + ANIM + ANMF) mux/demux, from the public WebP
container specification.

The reference reads stills only (frmts/webp/webpdataset.cpp); animation
is part of the real-world crawl surface, so the engine can demux frames
(each an independent VP8 / VP8L sub-image decoded by our from-spec
codecs) and compose canvases with the spec's blend/dispose rules.  The
muxer writes spec-conformant animations from frame arrays — the
round-trip gate for the demuxer (no system demux library exists in this
environment).

Chunk layout (container spec):
- VP8X: flags byte (MSB-first: 2 reserved, ICC, Alpha, EXIF, XMP,
  Animation, 1 reserved) + 24-bit reserved + (canvas_w-1, canvas_h-1)
  as 24-bit LE.
- ANIM: background BGRA (4 bytes) + loop count (u16 LE).
- ANMF: frame_x/2, frame_y/2, w-1, h-1, duration_ms (each 24-bit LE),
  flags byte (bit 1 = no-blend, bit 0 = dispose-to-background), then the
  frame's image chunks (optional ALPH + VP8, or VP8L).
"""

from __future__ import annotations

import struct

import numpy as np

_FLAG_ANIM = 0x02
_FLAG_ALPHA = 0x10


def _u24(v: int) -> bytes:
    return struct.pack("<I", v)[:3]


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def encode_webp_anim(frames, durations_ms, *, offsets=None,
                     loop_count: int = 0, qindex: int = 12,
                     lossless: bool = False,
                     dispose_background: bool = False) -> bytes:
    """frames: list of (H,W,3) uint8 arrays (per-frame sizes may differ
    when offsets place them on the canvas); durations_ms per frame."""
    if not frames:
        raise ValueError("no frames")
    if offsets is None:
        offsets = [(0, 0)] * len(frames)
    canvas_w = max(o[0] + f.shape[1] for o, f in zip(offsets, frames))
    canvas_h = max(o[1] + f.shape[0] for o, f in zip(offsets, frames))
    body = b""
    flags = _FLAG_ANIM
    body += _chunk(b"VP8X", bytes([flags]) + b"\x00\x00\x00"
                   + _u24(canvas_w - 1) + _u24(canvas_h - 1))
    body += _chunk(b"ANIM", struct.pack("<IH", 0, loop_count))
    for (ox, oy), frame, dur in zip(offsets, frames, durations_ms):
        if ox % 2 or oy % 2:
            raise ValueError("frame offsets must be even (stored /2)")
        if lossless:
            from gdal_ray.codecs.webp import encode_webp

            sub = encode_webp(frame)
            # strip RIFF container -> inner VP8L chunk
            img = sub[12:]
        else:
            from gdal_ray.codecs.vp8 import encode_vp8

            payload = encode_vp8(frame, qindex=qindex)
            if len(payload) & 1:
                payload += b"\x00"
            img = b"VP8 " + struct.pack("<I", len(payload)) + payload
        fflags = 0x01 if dispose_background else 0x00
        hdr = (_u24(ox // 2) + _u24(oy // 2)
               + _u24(frame.shape[1] - 1) + _u24(frame.shape[0] - 1)
               + _u24(int(dur)) + bytes([fflags]))
        body += _chunk(b"ANMF", hdr + img)
    riff = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_webp_anim(data: bytes) -> dict:
    """-> {canvas_w, canvas_h, loop_count, frames: [{x, y, duration_ms,
    dispose, blend, image (H,W,3|4) uint8}]}"""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    out = {"frames": []}
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        payload = data[pos + 8:pos + 8 + size]
        if tag == b"VP8X":
            out["canvas_w"] = (struct.unpack("<I", payload[4:7] + b"\0")[0]) + 1
            out["canvas_h"] = (struct.unpack("<I", payload[7:10] + b"\0")[0]) + 1
            out["animated"] = bool(payload[0] & _FLAG_ANIM)
        elif tag == b"ANIM":
            out["loop_count"] = struct.unpack_from("<H", payload, 4)[0]
        elif tag == b"ANMF":
            fx = struct.unpack("<I", payload[0:3] + b"\0")[0] * 2
            fy = struct.unpack("<I", payload[3:6] + b"\0")[0] * 2
            fw = struct.unpack("<I", payload[6:9] + b"\0")[0] + 1
            fh = struct.unpack("<I", payload[9:12] + b"\0")[0] + 1
            dur = struct.unpack("<I", payload[12:15] + b"\0")[0]
            fflags = payload[15]
            from gdal_ray.codecs.webp import decode_webp

            sub = payload[16:]
            riff = b"WEBP" + sub
            img = decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)
            if img.shape[:2] != (fh, fw):
                raise ValueError("ANMF frame size mismatch")
            out["frames"].append({
                "x": fx, "y": fy, "duration_ms": dur,
                "dispose": bool(fflags & 0x01),
                "blend": not (fflags & 0x02),
                "image": img,
            })
        pos += 8 + size + (size & 1)
    if not out.get("animated") or not out["frames"]:
        raise ValueError("not an animated WebP")
    return out


def compose_webp_anim(data: bytes) -> list[np.ndarray]:
    """Demux + compose: full RGBA canvases per frame, applying the spec's
    alpha-blend and dispose-to-background rules in order."""
    meta = decode_webp_anim(data)
    H, W = meta["canvas_h"], meta["canvas_w"]
    canvas = np.zeros((H, W, 4), dtype=np.uint8)
    out = []
    for fr in meta["frames"]:
        img = fr["image"]
        if img.shape[2] == 3:
            img = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
        y0, x0 = fr["y"], fr["x"]
        h, w = img.shape[:2]
        region = canvas[y0:y0 + h, x0:x0 + w].astype(np.float64)
        src = img.astype(np.float64)
        if fr["blend"]:
            sa = src[:, :, 3:4] / 255.0
            da = region[:, :, 3:4] / 255.0
            oa = sa + da * (1 - sa)
            safe = np.where(oa == 0, 1.0, oa)
            rgb = (src[:, :, :3] * sa + region[:, :, :3] * da * (1 - sa)) / safe
            blended = np.dstack([rgb, oa * 255.0])
            canvas[y0:y0 + h, x0:x0 + w] = np.clip(
                np.round(blended), 0, 255).astype(np.uint8)
        else:
            canvas[y0:y0 + h, x0:x0 + w] = img
        out.append(canvas.copy())
        if fr["dispose"]:
            canvas[y0:y0 + h, x0:x0 + w] = 0
    return out
