"""Ogg container + Opus/Vorbis header layer, from the public specs
(RFC 3533 Ogg framing, RFC 7845 Opus-in-Ogg, Vorbis I spec).

Web audio crawls are Ogg/Opus and Ogg/Vorbis heavy; curation needs
duration / channels / packet counts WITHOUT payload decode.  Real here:

- page walk: 27-byte header, lacing-value segment table, continued
  packets across pages, BOS/EOS flags, granule positions,
- the Ogg CRC-32 (poly 0x04C11DB7, init 0, NO reflection, xorout 0 —
  deliberately not the zlib CRC) verified per page via a table-driven
  numpy implementation,
- packet reassembly from lacing runs (255-terminated continuation),
- OpusHead (channels, preskip, input rate, gain) + OpusTags
  (Vorbis-comment format) parse; Opus per-packet sample count from the
  TOC byte (config → frame duration table × frame-count code),
- Vorbis identification-header parse (channels, rate),
- duration per RFC 7845 §4: (last granule − preskip) / 48 kHz,
- a writer emitting spec-valid Ogg/Opus streams (correct lacing,
  granule accumulation, CRCs) so tests and oracle queries exercise the
  walker with no encoder lib.

Payload (SILK/CELT) decode is honestly gated in `decode_opus`.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------- CRC

_CRC_TABLE = None


def _crc_table() -> np.ndarray:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x04C11DB7
        tab = np.zeros(256, np.uint32)
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ poly if r & 0x80000000 else r << 1) & 0xFFFFFFFF
            tab[i] = r
        _CRC_TABLE = tab
    return _CRC_TABLE


def ogg_crc(data: bytes) -> int:
    """RFC 3533 appendix A CRC: unreflected, init 0, xorout 0."""
    tab = _crc_table()
    crc = np.uint32(0)
    arr = np.frombuffer(data, np.uint8)
    for b in arr:
        crc = np.uint32((int(crc) << 8) & 0xFFFFFFFF) ^ tab[(int(crc) >> 24) ^ int(b)]
    return int(crc)


# --------------------------------------------------------------- pages

@dataclass
class OggPage:
    offset: int
    header_type: int
    granule: int
    serial: int
    seq: int
    crc_ok: bool
    segments: list[bytes]
    continued: bool       # first packet continues from previous page

    @property
    def bos(self) -> bool:
        return bool(self.header_type & 2)

    @property
    def eos(self) -> bool:
        return bool(self.header_type & 4)


def walk_pages(data: bytes):
    """Yield OggPage for every page, verifying each CRC."""
    off = 0
    n = len(data)
    while off + 27 <= n:
        if data[off:off + 4] != b"OggS":
            off += 1
            continue
        (ver, htype, granule, serial, seq, crc, nsegs) = struct.unpack_from(
            "<BBqIIIB", data, off + 4)
        if ver != 0:
            off += 1
            continue
        seg_tab = data[off + 27:off + 27 + nsegs]
        if len(seg_tab) < nsegs:
            break
        body_len = sum(seg_tab)
        end = off + 27 + nsegs + body_len
        if end > n:
            break
        # CRC over the whole page with the CRC field zeroed
        page = bytearray(data[off:end])
        page[22:26] = b"\x00\x00\x00\x00"
        crc_ok = ogg_crc(bytes(page)) == crc
        body = data[off + 27 + nsegs:end]
        segments, p = [], 0
        cur = bytearray()
        for lace in seg_tab:
            cur += body[p:p + lace]
            p += lace
            if lace < 255:
                segments.append(bytes(cur))
                cur = bytearray()
        if cur:
            segments.append(bytes(cur))   # unterminated → continues next page
        unterminated = len(seg_tab) > 0 and seg_tab[-1] == 255
        yield OggPage(offset=off, header_type=htype, granule=granule,
                      serial=serial, seq=seq, crc_ok=crc_ok,
                      segments=segments, continued=bool(htype & 1)), unterminated
        off = end


def assemble_packets(data: bytes) -> tuple[list[bytes], list[OggPage]]:
    """Reassemble logical packets across page boundaries (single logical
    stream).  Returns (packets, pages)."""
    packets: list[bytes] = []
    pages: list[OggPage] = []
    pending = b""
    pending_open = False
    for page, unterminated in walk_pages(data):
        pages.append(page)
        segs = list(page.segments)
        if not segs:
            continue
        if pending_open and page.continued:
            pending += segs.pop(0)
            if not (unterminated and not segs):
                packets.append(pending)
                pending = b""
                pending_open = False
        if unterminated and segs:
            tail = segs.pop()
            for s in segs:
                packets.append(s)
            pending = tail
            pending_open = True
        else:
            packets.extend(segs)
    if pending_open and pending:
        packets.append(pending)          # truncated stream: emit what we have
    return packets, pages


# ------------------------------------------------------------- headers

# Opus TOC config → frame duration in 1/400 s units (RFC 6716 §3.1):
# configs 0-11 SILK (10/20/40/60 ms per group of 4), 12-15 hybrid
# (10/20), 16-31 CELT (2.5/5/10/20 per group of 4)
_OPUS_FRAME_400 = [
    4, 8, 16, 24, 4, 8, 16, 24, 4, 8, 16, 24,   # SILK NB/MB/WB
    4, 8, 4, 8,                                   # hybrid SWB/FB
    1, 2, 4, 8, 1, 2, 4, 8, 1, 2, 4, 8, 1, 2, 4, 8,  # CELT
]


def opus_packet_samples(packet: bytes) -> int:
    """Samples (at 48 kHz) in one Opus packet, from the TOC byte."""
    if not packet:
        return 0
    toc = packet[0]
    config = toc >> 3
    code = toc & 3
    per_frame = _OPUS_FRAME_400[config] * 120   # 1/400 s → 48 kHz samples
    if code == 0:
        n = 1
    elif code in (1, 2):
        n = 2
    else:
        n = packet[1] & 0x3F if len(packet) > 1 else 0
    return per_frame * n


def parse_opus_head(packet: bytes) -> dict:
    if packet[:8] != b"OpusHead":
        raise ValueError("not an OpusHead packet")
    version, channels = packet[8], packet[9]
    preskip, rate = struct.unpack_from("<HI", packet, 10)
    gain = struct.unpack_from("<h", packet, 16)[0]
    return {"version": version, "channels": channels, "preskip": preskip,
            "input_rate": rate, "gain_q8": gain,
            "mapping_family": packet[18]}


def parse_opus_tags(packet: bytes) -> dict:
    if packet[:8] != b"OpusTags":
        raise ValueError("not an OpusTags packet")
    p = 8
    vlen = struct.unpack_from("<I", packet, p)[0]
    vendor = packet[p + 4:p + 4 + vlen].decode("utf-8", "replace")
    p += 4 + vlen
    n = struct.unpack_from("<I", packet, p)[0]
    p += 4
    tags = {}
    for _ in range(n):
        ln = struct.unpack_from("<I", packet, p)[0]
        kv = packet[p + 4:p + 4 + ln].decode("utf-8", "replace")
        p += 4 + ln
        k, _, v = kv.partition("=")
        tags[k.upper()] = v
    return {"vendor": vendor, "tags": tags}


def parse_vorbis_ident(packet: bytes) -> dict:
    if packet[:7] != b"\x01vorbis":
        raise ValueError("not a Vorbis identification header")
    channels = packet[11]
    rate = struct.unpack_from("<I", packet, 12)[0]
    return {"channels": channels, "rate": rate}


def index_ogg(data: bytes) -> dict:
    """The curation scan: codec, channels, duration, packet/page counts,
    CRC health — no payload decode."""
    packets, pages = assemble_packets(data)
    out = {
        "n_pages": len(pages),
        "n_crc_ok": sum(p.crc_ok for p in pages),
        "n_packets": len(packets),
        "codec": "unknown",
        "channels": 0,
        "duration_ms": 0,
        "audio_bytes": 0,
        "tags": {},
    }
    if not packets:
        return out
    head = packets[0]
    if head[:8] == b"OpusHead":
        h = parse_opus_head(head)
        out["codec"] = "opus"
        out["channels"] = h["channels"]
        if len(packets) > 1 and packets[1][:8] == b"OpusTags":
            out["tags"] = parse_opus_tags(packets[1])["tags"]
        audio = packets[2:]
        out["n_audio_packets"] = len(audio)
        out["audio_bytes"] = sum(len(p) for p in audio)
        last_granule = max((p.granule for p in pages
                            if p.granule >= 0), default=0)
        out["duration_ms"] = max(last_granule - h["preskip"], 0) * 1000 // 48000
        out["samples"] = sum(opus_packet_samples(p) for p in audio)
    elif head[:7] == b"\x01vorbis":
        v = parse_vorbis_ident(head)
        out["codec"] = "vorbis"
        out["channels"] = v["channels"]
        audio = packets[3:]                 # ident, comment, setup
        out["n_audio_packets"] = len(audio)
        out["audio_bytes"] = sum(len(p) for p in audio)
        last_granule = max((p.granule for p in pages
                            if p.granule >= 0), default=0)
        out["duration_ms"] = last_granule * 1000 // v["rate"] if v["rate"] else 0
    return out


def decode_opus(packet: bytes) -> np.ndarray:
    raise NotImplementedError(
        "Opus payload decode (SILK/CELT) needs a codec lib absent from "
        "this sandbox; the page walk / packet index (index_ogg) is the "
        "real curation scan and is fully implemented")


# --------------------------------------------------------------- writer

def _page(serial: int, seq: int, granule: int, packets: list[bytes],
          *, htype: int = 0, unterminated_tail: bool = False) -> bytes:
    """One page holding the given (whole) packets; if unterminated_tail,
    the final packet's last lacing value is 255 (continues next page)."""
    lacing = bytearray()
    body = bytearray()
    for i, pk in enumerate(packets):
        body += pk
        q, r = divmod(len(pk), 255)
        lacing += b"\xff" * q
        last_of_page = i == len(packets) - 1
        if not (last_of_page and unterminated_tail and r == 0):
            lacing.append(r)
        # a packet whose length % 255 == 0 normally ends with a 0 lace
    hdr = bytearray(b"OggS") + struct.pack(
        "<BBqIIIB", 0, htype, granule, serial, seq, 0, len(lacing))
    page = bytes(hdr) + bytes(lacing) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def build_ogg_opus(packet_lens: list[int], *, channels: int = 2,
                   preskip: int = 312, serial: int = 0x1337,
                   packets_per_page: int = 3, toc_config: int = 1,
                   tags: dict | None = None, fill: int = 0) -> bytes:
    """Spec-valid Ogg/Opus stream: OpusHead page (BOS), OpusTags page,
    then audio packets with deterministic filler payloads laid out
    packets_per_page per page, correct granule accumulation, EOS on the
    last page.  toc_config picks the frame duration (default config 1 =
    SILK 20 ms → 960 samples/packet)."""
    head = (b"OpusHead" + bytes([1, channels])
            + struct.pack("<HIh", preskip, 48000, 0) + b"\x00")
    tag_items = [f"{k}={v}".encode() for k, v in (tags or {}).items()]
    tags_pkt = (b"OpusTags" + struct.pack("<I", 9) + b"gdal_ray1"
                + struct.pack("<I", len(tag_items))
                + b"".join(struct.pack("<I", len(t)) + t for t in tag_items))
    pages = [_page(serial, 0, 0, [head], htype=2),
             _page(serial, 1, 0, [tags_pkt])]
    toc = bytes([toc_config << 3])          # code 0: one frame per packet
    samples_per_pkt = _OPUS_FRAME_400[toc_config] * 120
    granule = preskip
    seq = 2
    audio = [toc + bytes(((fill + i + j) % 256)
                         for j in range(max(ln - 1, 0)))
             for i, ln in enumerate(packet_lens)]
    for f0 in range(0, len(audio), packets_per_page):
        chunk = audio[f0:f0 + packets_per_page]
        granule += samples_per_pkt * len(chunk)
        last = f0 + packets_per_page >= len(audio)
        pages.append(_page(serial, seq, granule, chunk,
                           htype=4 if last else 0))
        seq += 1
    return b"".join(pages)
