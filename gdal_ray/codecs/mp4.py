"""ISO Base Media File Format (MP4 / ISO/IEC 14496-12) mux + demux.

From the PUBLIC spec only (ISO/IEC 14496-12 box grammar; the QuickTime
File Format is the published ancestor of the same structure).  The
reference ships no MP4 raster driver — this module exists for the
multimodal-video side of the training-data pipeline (SURVEY.md §2 /
VERDICT "non-RIFF audio/video stubs"): it makes the CONTAINER layer
real (sample tables, chunk offsets, keyframe sync table, edit-free
timing) so only the elementary-stream codec remains pluggable.

What is real here:

- a full box walker (32-bit size, ``largesize`` 64-bit escape,
  size==0 "to end of file", nested container boxes),
- ``moov`` parse: mvhd/tkhd/mdhd/hdlr/stsd/stts/stsc/stsz/stco/co64/
  stss/ctts → a flat per-sample table (offset, size, dts, duration,
  keyframe) via vectorized numpy run-length expansion,
- a writer that emits ftyp + mdat + moov with a correct sample table
  for arbitrary per-sample sizes/durations/keyframe flags and a
  configurable samples-per-chunk layout,
- Motion-JPEG samples (sample entry fourcc ``jpeg``, the registered
  QuickTime motion-JPEG sample type): each sample is a real ITU-T T.81
  baseline JPEG, decoded by :mod:`gdal_ray.codecs.jpeg` — so the
  MJPEG-in-MP4 path decodes END TO END with no stub.

What is honestly gated: H.264/H.265/AAC elementary-stream decode
(``avc1``/``hvc1``/``mp4a`` samples parse and demux fine — their
payload decode raises ``NotImplementedError`` naming the codec; no
codec libs exist in this sandbox).

Scale shape: ``parse_mp4`` needs only the ``moov`` bytes (header-region
read); sample payloads are range-read per task exactly like the GeoTIFF
tile reader (sources/gtiff_reader.py) — the driver never touches
``mdat``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"udta",
    b"edts", b"mvex", b"moof", b"traf",
}


def walk_boxes(buf: memoryview, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end, header_size) for each
    top-level box in buf[start:end].  Handles size==1 (largesize) and
    size==0 (extends to end)."""
    off = start
    while off + 8 <= end:
        size = struct.unpack_from(">I", buf, off)[0]
        tag = bytes(buf[off + 4:off + 8])
        hdr = 8
        if size == 1:
            if off + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError(f"box {tag!r} overruns container")
        yield tag, off + hdr, off + size, hdr
        off += size


def _find(buf: memoryview, start: int, end: int, *path: bytes):
    """Descend a container path; return (payload_start, payload_end) of
    the first match, or None."""
    if not path:
        return start, end
    for tag, ps, pe, _ in walk_boxes(buf, start, end):
        if tag == path[0]:
            return _find(buf, ps, pe, *path[1:])
    return None


def _find_all(buf: memoryview, start: int, end: int, tag: bytes):
    return [(ps, pe) for t, ps, pe, _ in walk_boxes(buf, start, end)
            if t == tag]


@dataclass
class Mp4Track:
    track_id: int
    handler: str            # 'vide' | 'soun' | other fourcc
    codec: str               # sample-entry fourcc, e.g. 'jpeg', 'avc1'
    timescale: int
    width: int
    height: int
    # per-sample arrays (numpy, all length n_samples)
    offsets: np.ndarray = field(repr=False, default=None)
    sizes: np.ndarray = field(repr=False, default=None)
    dts: np.ndarray = field(repr=False, default=None)
    durations: np.ndarray = field(repr=False, default=None)
    keyframe: np.ndarray = field(repr=False, default=None)

    @property
    def n_samples(self) -> int:
        return 0 if self.sizes is None else int(len(self.sizes))

    @property
    def duration(self) -> int:
        return 0 if self.durations is None else int(self.durations.sum())


@dataclass
class Mp4File:
    major_brand: str
    movie_timescale: int
    movie_duration: int
    tracks: list[Mp4Track]


def _fullbox(buf: memoryview, ps: int) -> tuple[int, int, int]:
    """(version, flags, payload offset after the version/flags word)."""
    v = buf[ps]
    flags = struct.unpack_from(">I", buf, ps)[0] & 0xFFFFFF
    return v, flags, ps + 4


def _parse_stts(buf: memoryview, ps: int, pe: int) -> tuple[np.ndarray, np.ndarray]:
    _, _, p = _fullbox(buf, ps)
    n = struct.unpack_from(">I", buf, p)[0]
    arr = np.frombuffer(buf[p + 4:p + 4 + 8 * n], dtype=">u4").reshape(n, 2)
    counts = arr[:, 0].astype(np.int64)
    deltas = arr[:, 1].astype(np.int64)
    durations = np.repeat(deltas, counts)
    dts = np.concatenate([[0], np.cumsum(durations)[:-1]]) if len(durations) else np.zeros(0, np.int64)
    return dts, durations


def _parse_stsz(buf: memoryview, ps: int, pe: int) -> np.ndarray:
    _, _, p = _fullbox(buf, ps)
    fixed, n = struct.unpack_from(">II", buf, p)
    if fixed:
        return np.full(n, fixed, dtype=np.int64)
    return np.frombuffer(buf[p + 8:p + 8 + 4 * n], dtype=">u4").astype(np.int64)


def _parse_stco(buf: memoryview, ps: int, pe: int, *, co64: bool) -> np.ndarray:
    _, _, p = _fullbox(buf, ps)
    n = struct.unpack_from(">I", buf, p)[0]
    if co64:
        return np.frombuffer(buf[p + 4:p + 4 + 8 * n], dtype=">u8").astype(np.int64)
    return np.frombuffer(buf[p + 4:p + 4 + 4 * n], dtype=">u4").astype(np.int64)


def _parse_stsc(buf: memoryview, ps: int, pe: int, n_chunks: int) -> np.ndarray:
    """Expand the sample-to-chunk run table to per-chunk sample counts."""
    _, _, p = _fullbox(buf, ps)
    n = struct.unpack_from(">I", buf, p)[0]
    arr = np.frombuffer(buf[p + 4:p + 4 + 12 * n], dtype=">u4").reshape(n, 3)
    first = arr[:, 0].astype(np.int64)   # 1-based first_chunk
    spc = arr[:, 1].astype(np.int64)     # samples_per_chunk
    # run i covers chunks first[i] .. first[i+1]-1 (last run → n_chunks)
    ends = np.concatenate([first[1:], [n_chunks + 1]])
    return np.repeat(spc, (ends - first))


def _parse_stss(buf: memoryview, ps: int, pe: int, n_samples: int) -> np.ndarray:
    _, _, p = _fullbox(buf, ps)
    n = struct.unpack_from(">I", buf, p)[0]
    idx = np.frombuffer(buf[p + 4:p + 4 + 4 * n], dtype=">u4").astype(np.int64)
    key = np.zeros(n_samples, dtype=bool)
    key[idx - 1] = True
    return key


_TRUN_DATA_OFFSET = 0x000001
_TRUN_FIRST_FLAGS = 0x000004
_TRUN_DUR = 0x000100
_TRUN_SIZE = 0x000200
_TRUN_FLAGS = 0x000400
_TRUN_CTS = 0x000800
_TFHD_BASE_OFFSET = 0x000001
_TFHD_SAMPLE_DESC = 0x000002
_TFHD_DEF_DUR = 0x000008
_TFHD_DEF_SIZE = 0x000010
_TFHD_DEF_FLAGS = 0x000020
_TFHD_DEFAULT_BASE_IS_MOOF = 0x020000


def _parse_fragments(buf: memoryview, tracks: dict, defaults: dict):
    """Walk every moof at top level; append trun samples to the per-track
    accumulator lists in `tracks` (keyed by track_id)."""
    for tag, ps, pe, hdr in walk_boxes(buf, 0, len(buf)):
        if tag != b"moof":
            continue
        moof_start = ps - hdr
        for tps, tpe in _find_all(buf, ps, pe, b"traf"):
            tfhd = _find(buf, tps, tpe, b"tfhd")
            _, tf_flags, p = _fullbox(buf, tfhd[0])
            track_id = struct.unpack_from(">I", buf, p)[0]
            p += 4
            if tf_flags & _TFHD_BASE_OFFSET:
                base = struct.unpack_from(">Q", buf, p)[0]
                p += 8
            elif tf_flags & _TFHD_DEFAULT_BASE_IS_MOOF:
                base = moof_start
            else:
                base = moof_start  # first traf convention (§8.8.7)
            if tf_flags & _TFHD_SAMPLE_DESC:
                p += 4
            def_dur, def_size, def_flags = defaults.get(
                track_id, (0, 0, 0))
            if tf_flags & _TFHD_DEF_DUR:
                def_dur = struct.unpack_from(">I", buf, p)[0]; p += 4
            if tf_flags & _TFHD_DEF_SIZE:
                def_size = struct.unpack_from(">I", buf, p)[0]; p += 4
            if tf_flags & _TFHD_DEF_FLAGS:
                def_flags = struct.unpack_from(">I", buf, p)[0]; p += 4
            acc = tracks.setdefault(track_id, ([], [], []))
            offs, szs, durs_kf = acc
            for rps, rpe in _find_all(buf, tps, tpe, b"trun"):
                _, fl, q = _fullbox(buf, rps)
                n = struct.unpack_from(">I", buf, q)[0]; q += 4
                pos = base
                if fl & _TRUN_DATA_OFFSET:
                    pos = base + struct.unpack_from(">i", buf, q)[0]; q += 4
                first_flags = None
                if fl & _TRUN_FIRST_FLAGS:
                    first_flags = struct.unpack_from(">I", buf, q)[0]; q += 4
                for i in range(n):
                    dur, size, sfl = def_dur, def_size, def_flags
                    if fl & _TRUN_DUR:
                        dur = struct.unpack_from(">I", buf, q)[0]; q += 4
                    if fl & _TRUN_SIZE:
                        size = struct.unpack_from(">I", buf, q)[0]; q += 4
                    if fl & _TRUN_FLAGS:
                        sfl = struct.unpack_from(">I", buf, q)[0]; q += 4
                    elif i == 0 and first_flags is not None:
                        sfl = first_flags
                    if fl & _TRUN_CTS:
                        q += 4
                    offs.append(pos)
                    szs.append(size)
                    # sample_is_non_sync_sample is bit 16 of sample flags
                    durs_kf.append((dur, not (sfl >> 16) & 1))
                    pos += size


def parse_mp4(data: bytes) -> Mp4File:
    """Parse ftyp + moov into per-track flat sample tables.  Only the
    header region is touched — sample payloads stay in mdat and are
    addressed by (offset, size).  Fragmented files (moov carries mvex
    and samples live in moof/traf/trun runs — the DASH/HLS/CMAF segment
    shape every web video archive serves) are folded into the same flat
    table: tfhd defaults + trex fallbacks, default-base-is-moof and
    explicit base_data_offset addressing, per-sample or default
    durations/sizes/flags, first-sample-flags override."""
    buf = memoryview(data)
    major = "????"
    ms = _find(buf, 0, len(buf), b"ftyp")
    if ms is not None:
        major = bytes(buf[ms[0]:ms[0] + 4]).decode("latin-1")
    moov = _find(buf, 0, len(buf), b"moov")
    if moov is None:
        raise ValueError("no moov box (streaming init segment required)")

    mvhd = _find(buf, moov[0], moov[1], b"mvhd")
    v, _, p = _fullbox(buf, mvhd[0])
    if v == 1:
        mts, mdur = struct.unpack_from(">IQ", buf, p + 16)
    else:
        mts, mdur = struct.unpack_from(">II", buf, p + 8)

    tracks = []
    for tps, tpe in _find_all(buf, moov[0], moov[1], b"trak"):
        tkhd = _find(buf, tps, tpe, b"tkhd")
        v, _, p = _fullbox(buf, tkhd[0])
        track_id = struct.unpack_from(">I", buf, p + (16 if v == 1 else 8))[0]
        # width/height are 16.16 fixed point, last 8 bytes of tkhd
        w, h = struct.unpack_from(">II", buf, tkhd[1] - 8)
        mdia = _find(buf, tps, tpe, b"mdia")
        mdhd = _find(buf, mdia[0], mdia[1], b"mdhd")
        v, _, p = _fullbox(buf, mdhd[0])
        ts = struct.unpack_from(">I", buf, p + (16 if v == 1 else 8))[0]
        hdlr = _find(buf, mdia[0], mdia[1], b"hdlr")
        handler = bytes(buf[hdlr[0] + 8:hdlr[0] + 12]).decode("latin-1")
        stbl = _find(buf, mdia[0], mdia[1], b"minf", b"stbl")
        stsd = _find(buf, stbl[0], stbl[1], b"stsd")
        codec = bytes(buf[stsd[0] + 12:stsd[0] + 16]).decode("latin-1")

        dts, durations = _parse_stts(buf, *_find(buf, stbl[0], stbl[1], b"stts"))
        sizes = _parse_stsz(buf, *_find(buf, stbl[0], stbl[1], b"stsz"))
        co = _find(buf, stbl[0], stbl[1], b"stco")
        co64 = co is None
        if co64:
            co = _find(buf, stbl[0], stbl[1], b"co64")
        chunk_offs = (_parse_stco(buf, *co, co64=co64) if co is not None
                      else np.zeros(0, np.int64))
        spc = _parse_stsc(buf, *_find(buf, stbl[0], stbl[1], b"stsc"),
                          n_chunks=len(chunk_offs))
        n = len(sizes)
        # per-sample chunk index, then offset = chunk_off + within-chunk
        # prefix of earlier sample sizes (vectorized)
        chunk_of = np.repeat(np.arange(len(chunk_offs)), spc.astype(np.int64))[:n]
        csum = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        chunk_start_csum = np.concatenate(
            [[0], np.cumsum(spc.astype(np.int64))[:-1]])
        within = csum - csum[chunk_start_csum[chunk_of]] if n else csum
        offsets = chunk_offs[chunk_of] + within if n else np.zeros(0, np.int64)
        stss = _find(buf, stbl[0], stbl[1], b"stss")
        key = (_parse_stss(buf, *stss, n_samples=n) if stss is not None
               else np.ones(n, dtype=bool))
        tracks.append(Mp4Track(
            track_id=track_id, handler=handler, codec=codec, timescale=ts,
            width=w >> 16, height=h >> 16, offsets=offsets, sizes=sizes,
            dts=dts[:n], durations=durations[:n], keyframe=key))

    # fragmented: trex defaults + moof/traf/trun sample runs appended to
    # any track whose stbl is empty (the fMP4 init-segment convention)
    mvex = _find(buf, moov[0], moov[1], b"mvex")
    if mvex is not None:
        defaults = {}
        for xps, xpe in _find_all(buf, mvex[0], mvex[1], b"trex"):
            _, _, p = _fullbox(buf, xps)
            tid, _desc, ddur, dsize, dflags = struct.unpack_from(
                ">IIIII", buf, p)
            defaults[tid] = (ddur, dsize, dflags)
        frag: dict = {}
        _parse_fragments(buf, frag, defaults)
        for t in tracks:
            if t.track_id in frag and t.n_samples == 0:
                offs, szs, durs_kf = frag[t.track_id]
                t.offsets = np.array(offs, np.int64)
                t.sizes = np.array(szs, np.int64)
                t.durations = np.array([d for d, _ in durs_kf], np.int64)
                t.dts = np.concatenate(
                    [[0], np.cumsum(t.durations)[:-1]]) if len(offs) \
                    else np.zeros(0, np.int64)
                t.keyframe = np.array([k for _, k in durs_kf], bool)
    return Mp4File(major_brand=major, movie_timescale=mts,
                   movie_duration=mdur, tracks=tracks)


def read_sample(data: bytes, track: Mp4Track, i: int) -> bytes:
    o, s = int(track.offsets[i]), int(track.sizes[i])
    return bytes(data[o:o + s])


def decode_sample(data: bytes, track: Mp4Track, i: int) -> np.ndarray:
    """Decode one video sample to an RGB uint8 array.  Real for MJPEG
    ('jpeg' sample entries, via our ITU-T T.81 decoder); compressed AV
    codecs are honestly gated."""
    payload = read_sample(data, track, i)
    if track.codec == "jpeg":
        from gdal_ray.codecs.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        f"MP4 sample codec {track.codec!r}: no {track.codec} elementary-"
        "stream decoder in this sandbox (container demux is real; plug a "
        "codec lib here)")


# ---------------------------------------------------------------- writer

def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">I", (version << 24) | flags) + payload)


def _runs(values: np.ndarray) -> list[tuple[int, int]]:
    """Run-length encode → [(count, value)]."""
    if len(values) == 0:
        return []
    change = np.flatnonzero(np.diff(values)) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(values)]])
    return [(int(e - s), int(values[s])) for s, e in zip(starts, ends)]


def encode_mp4(samples: list[bytes], *, codec: str = "jpeg",
               width: int = 0, height: int = 0, timescale: int = 1000,
               durations=None, keyframes=None,
               samples_per_chunk: int = 4, use_co64: bool = False) -> bytes:
    """Mux opaque sample payloads into a minimal valid single-track MP4.

    durations: per-sample ticks (default 40 ticks each = 25 fps at the
    default millisecond timescale); keyframes: bool per sample (default:
    every sample is a sync sample and stss is omitted per spec).
    samples_per_chunk controls the stsc/stco layout so readers must
    exercise the real chunk→offset expansion.
    """
    n = len(samples)
    sizes = np.array([len(s) for s in samples], dtype=np.int64)
    durations = (np.full(n, 40, np.int64) if durations is None
                 else np.asarray(durations, np.int64))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")

    # chunk layout: fixed samples_per_chunk (last chunk ragged)
    spc = np.full((n + samples_per_chunk - 1) // max(samples_per_chunk, 1),
                  samples_per_chunk, np.int64)
    if n:
        spc[-1] = n - samples_per_chunk * (len(spc) - 1)
    mdat_payload = b"".join(samples)
    mdat_off = len(ftyp) + 8          # mdat payload starts after its header
    csum = np.concatenate([[0], np.cumsum(sizes)])
    chunk_first = np.concatenate([[0], np.cumsum(spc)])[:-1] if n else np.zeros(0, np.int64)
    chunk_offsets = mdat_off + csum[chunk_first]

    stts_runs = _runs(durations)
    stts = _full(b"stts", 0, 0, struct.pack(">I", len(stts_runs)) +
                 b"".join(struct.pack(">II", c, v) for c, v in stts_runs))
    # stsc: collapse equal samples_per_chunk runs (first_chunk is 1-based)
    stsc_entries = []
    for i, c in enumerate(spc.tolist()):
        if not stsc_entries or stsc_entries[-1][1] != c:
            stsc_entries.append((i + 1, c))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries)) +
                 b"".join(struct.pack(">III", f, c, 1) for f, c in stsc_entries))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n) +
                 b"".join(struct.pack(">I", int(s)) for s in sizes))
    if use_co64:
        stco = _full(b"co64", 0, 0, struct.pack(">I", len(chunk_offsets)) +
                     b"".join(struct.pack(">Q", int(o)) for o in chunk_offsets))
    else:
        stco = _full(b"stco", 0, 0, struct.pack(">I", len(chunk_offsets)) +
                     b"".join(struct.pack(">I", int(o)) for o in chunk_offsets))
    boxes = [stts, stsc, stsz, stco]
    if keyframes is not None:
        kf = np.asarray(keyframes, bool)
        if not kf.all():
            idx = np.flatnonzero(kf) + 1
            boxes.append(_full(b"stss", 0, 0, struct.pack(">I", len(idx)) +
                               b"".join(struct.pack(">I", int(i)) for i in idx)))
    # VisualSampleEntry per ISO 14496-12 §12.1.3
    entry = (struct.pack(">6xH", 1)                        # data_ref_index
             + b"\x00" * 16                                # pre_defined/reserved
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)  # h/v resolution 72dpi
             + struct.pack(">I", 0)                        # reserved
             + struct.pack(">H", 1)                        # frame_count
             + b"\x00" * 32                                # compressor name
             + struct.pack(">Hh", 24, -1))                 # depth, pre_defined
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) +
                 _box(codec.encode("latin-1"), entry))
    stbl = _box(b"stbl", stsd + b"".join(boxes))
    url = _full(b"url ", 0, 1, b"")
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + url))
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    total_dur = int(durations.sum())
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale,
                                            total_dur, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" +
                 b"\x00" * 12 + b"VideoHandler\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0) +
                 struct.pack(">I", total_dur) + b"\x00" * 8 +
                 struct.pack(">hhhh", 0, 0, 0, 0) +
                 struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000) +
                 struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, total_dur) +
                 struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10 +
                 struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000) +
                 b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def encode_mjpeg_mp4(frames: np.ndarray, *, fps: int = 25,
                     timescale: int = 1000, quality: int = 85,
                     samples_per_chunk: int = 4) -> bytes:
    """frames (n, h, w) grayscale or (n, h, w, 3) RGB uint8 → MJPEG-in-MP4
    via the real baseline-JPEG encoder."""
    from gdal_ray.codecs.jpeg import encode_jpeg

    payloads = [encode_jpeg(f, quality=quality) for f in frames]
    h, w = frames.shape[1], frames.shape[2]
    dur = timescale // fps
    return encode_mp4(payloads, codec="jpeg", width=w, height=h,
                      timescale=timescale,
                      durations=np.full(len(payloads), dur, np.int64),
                      samples_per_chunk=samples_per_chunk)


def encode_fmp4(samples: list[bytes], *, codec: str = "jpeg",
                width: int = 0, height: int = 0, timescale: int = 1000,
                default_duration: int = 40, durations=None, keyframes=None,
                samples_per_fragment: int = 4) -> bytes:
    """Fragmented MP4 (the DASH/HLS/CMAF segment shape): an init section
    (ftyp + moov with empty stbl + mvex/trex defaults) followed by
    moof+mdat pairs, each traf using default-base-is-moof addressing and
    a trun with per-sample sizes + flags.  parse_mp4 folds it back into
    the same flat sample table as a progressive file."""
    n = len(samples)
    kf = (np.ones(n, bool) if keyframes is None
          else np.asarray(keyframes, bool))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso5dash")

    entry = (struct.pack(">6xH", 1) + b"\x00" * 16
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)
             + struct.pack(">I", 0) + struct.pack(">H", 1)
             + b"\x00" * 32 + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) +
                 _box(codec.encode("latin-1"), entry))
    empty32 = struct.pack(">I", 0)
    stbl = _box(b"stbl", stsd
                + _full(b"stts", 0, 0, empty32)
                + _full(b"stsc", 0, 0, empty32)
                + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
                + _full(b"stco", 0, 0, empty32))
    url = _full(b"url ", 0, 1, b"")
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + url))
    minf = _box(b"minf", _full(b"vmhd", 0, 1, b"\x00" * 8) + dinf + stbl)
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, 0,
                                            0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" +
                 b"\x00" * 12 + b"VideoHandler\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0) +
                 struct.pack(">I", 0) + b"\x00" * 8 +
                 struct.pack(">hhhh", 0, 0, 0, 0) +
                 struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000) +
                 struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    trex = _full(b"trex", 0, 0, struct.pack(">IIIII", 1, 1,
                                            default_duration, 0, 0))
    mvex = _box(b"mvex", trex)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, 0) +
                 struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10 +
                 struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000) +
                 b"\x00" * 24 + struct.pack(">I", 2))
    out = [ftyp + _box(b"moov", mvhd + trak + mvex)]

    seq = 1
    for f0 in range(0, n, samples_per_fragment):
        chunk = samples[f0:f0 + samples_per_fragment]
        ckf = kf[f0:f0 + len(chunk)]
        cdur = (None if durations is None
                else np.asarray(durations, np.int64)[f0:f0 + len(chunk)])
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        tfhd = _full(b"tfhd", 0, _TFHD_DEF_DUR | _TFHD_DEFAULT_BASE_IS_MOOF,
                     struct.pack(">II", 1, default_duration))
        trun_flags = _TRUN_DATA_OFFSET | _TRUN_SIZE | _TRUN_FLAGS
        if cdur is not None:
            trun_flags |= _TRUN_DUR
        rows = b"".join(
            ((struct.pack(">I", int(cdur[i])) if cdur is not None else b"")
             + struct.pack(">II", len(s),
                           0 if k else (1 << 16)))    # non-sync bit
            for i, (s, k) in enumerate(zip(chunk, ckf)))
        # data_offset = moof size + mdat header (8); moof size is
        # independent of the offset value — build once with 0, measure,
        # rebuild with the real offset
        trun0 = _full(b"trun", 0, trun_flags,
                      struct.pack(">Ii", len(chunk), 0) + rows)
        traf = _box(b"traf", tfhd + trun0)
        moof = _box(b"moof", mfhd + traf)
        data_offset = len(moof) + 8
        trun = _full(b"trun", 0, trun_flags,
                     struct.pack(">Ii", len(chunk), data_offset) + rows)
        traf = _box(b"traf", tfhd + trun)
        moof = _box(b"moof", mfhd + traf)
        out.append(moof + _box(b"mdat", b"".join(chunk)))
        seq += 1
    return b"".join(out)


def decode_mjpeg_mp4(data: bytes) -> tuple[np.ndarray, float]:
    """MJPEG-in-MP4 → (frames, fps).  Fully real decode path."""
    mp4 = parse_mp4(data)
    vid = next(t for t in mp4.tracks if t.handler == "vide")
    frames = np.stack([decode_sample(data, vid, i)
                       for i in range(vid.n_samples)])
    fps = vid.timescale * vid.n_samples / max(vid.duration, 1)
    return frames, fps
