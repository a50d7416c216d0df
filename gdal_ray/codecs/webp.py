"""WebP lossless (VP8L) codec — pure stdlib + numpy, from the public
"WebP Lossless Bitstream Specification".

Real bitstreams: RIFF/WEBP container with a VP8L chunk; LSB-first bit
packing; canonical Huffman codes (simple and normal forms, incl. the
code-length code with repeat symbols 16/17/18 and the max-symbol field);
LZ77 backward references with the shared length/distance prefix coding;
color cache; transforms: predictor (all 14 modes), subtract-green and
color-indexing with pixel bundling.

Reference behavior: frmts/webp/webpdataset.cpp decodes through libwebp;
this is the sandbox's from-spec implementation of the same bitstream.
The encoder emits: optional subtract-green, optional uniform-mode
predictor transform, optional color-indexing (palette) with bundling,
literal pixels with per-image Huffman codes built from real symbol
frequencies, and distance-1 LZ77 runs (RLE) — decode(encode(x)) is exact
(lossless).

The decoder is feature-complete against real libwebp output: all four
transforms (predictor, cross-color, subtract-green, color-indexing),
meta-Huffman groups (spatially-varying code groups), the 120-entry 2D
distance-neighborhood map, color cache, and the headerless alpha-plane
variant used by lossy ALPH chunks (decode_alpha_plane) — verified
bit-exact against libwebp decodes of libwebp-encoded files in
tests/test_webp.py.  The encoder emits the simpler subset (single code
group, linear distances, no cross-color), which every decoder accepts.
"""

from __future__ import annotations

import struct

import numpy as np

# code-length-code symbol read order (spec §"Normal Code Length Code")
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_CL_EXTRA = {16: 2, 17: 3, 18: 7}   # extra bits for repeat symbols
_CL_OFFSET = {16: 3, 17: 3, 18: 11}  # repeat-count offsets
_DEFAULT_CODE_LENGTH = 8            # initial "previous" length for symbol 16

_NUM_LENGTH_CODES = 24   # green symbols 256..279 are LZ77 length prefixes
_NUM_DIST_CODES = 40
_PEEK = 15               # max huffman code length (spec) = LUT width

_HASH_MUL = 0x1E35A7BD   # color-cache hash multiplier (spec)

# spec §"Distance Mapping": codes 1..120 address a 2D pixel neighborhood;
# each byte encodes (yoffset << 4) | (8 - xoffset).  Normative table from
# the WebP Lossless Bitstream Specification.
_PLANE_CODES = (
    24, 7, 23, 25, 40, 6, 39, 41, 22, 26, 38, 42, 56, 5, 55, 57,
    21, 27, 54, 58, 37, 43, 72, 4, 71, 73, 20, 28, 53, 59, 70, 74,
    36, 44, 88, 69, 75, 52, 60, 3, 87, 89, 19, 29, 86, 90, 35, 45,
    68, 76, 85, 91, 51, 61, 104, 2, 103, 105, 18, 30, 102, 106, 34, 46,
    84, 92, 67, 77, 101, 107, 50, 62, 120, 1, 119, 121, 83, 93, 17, 31,
    100, 108, 66, 78, 118, 122, 33, 47, 117, 123, 49, 63, 99, 109, 82, 94,
    0, 116, 124, 65, 79, 16, 32, 98, 110, 48, 115, 125, 81, 95, 64, 114,
    126, 97, 111, 80, 113, 127, 96, 112,
)


# ---------------------------------------------------------------------------
# bit I/O — VP8L packs fixed-width values LSB-first; Huffman codes are read
# bit-by-bit starting from the code's MSB.

class _Writer:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, n: int):
        self.acc |= (int(v) & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, c: int, length: int):
        # huffman code: MSB of the code enters the stream first
        for i in range(length - 1, -1, -1):
            self.bits((c >> i) & 1, 1)

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


class _Reader:
    """O(1) sliding-window reads: a 32-bit little-endian word per byte
    offset (same trick as codecs/jpeg.py, mirrored for LSB-first order)."""

    def __init__(self, data: bytes):
        b = np.frombuffer(data + b"\x00" * 8, dtype=np.uint8).astype(np.uint32)
        self.words = (b[:-3] | (b[1:-2] << 8) | (b[2:-1] << 16) | (b[3:] << 24)).tolist()
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        v = (self.words[p >> 3] >> (p & 7)) & ((1 << n) - 1)
        self.pos = p + n
        return v


# ---------------------------------------------------------------------------
# canonical Huffman

def _canonical(lengths) -> dict[int, tuple[int, int]]:
    """lengths[sym] → {sym: (code, len)} in canonical (len, sym) order."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    out: dict[int, tuple[int, int]] = {}
    code, prev = 0, pairs[0][0] if pairs else 0
    for l, s in pairs:
        code <<= l - prev
        prev = l
        out[s] = (code, l)
        code += 1
    return out


def _bit_reverse(v: int, n: int) -> int:
    r = 0
    for _ in range(n):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


def _table_from_codes(codes: dict[int, tuple[int, int]]):
    """{sym: (code, len)} → decode table.  ('single', sym) for 0-bit codes,
    else ('lut', list) indexed by the next 15 stream bits (LSB-first window:
    bit 0 = first stream bit = code MSB, so the index's low bits are the
    bit-reversed code)."""
    if len(codes) == 1:
        return ("single", next(iter(codes)))
    lut = np.zeros(1 << _PEEK, dtype=np.int64)
    for s, (c, l) in codes.items():
        rev = _bit_reverse(c, l)
        idx = rev + (np.arange(1 << (_PEEK - l), dtype=np.int64) << l)
        lut[idx] = (s << 4) | l
    return ("lut", lut.tolist())


def _read_symbol(r: _Reader, table) -> int:
    kind, payload = table
    if kind == "single":
        return payload
    p = r.pos
    e = payload[(r.words[p >> 3] >> (p & 7)) & 0x7FFF]
    l = e & 15
    if l == 0:
        raise ValueError("invalid VP8L huffman code")
    r.pos = p + l
    return e >> 4


def _huff_lengths(freqs, maxlen: int):
    """Real frequency-based code lengths, depth-limited by flatten-retry."""
    import heapq

    n = len(freqs)
    used = [i for i, f in enumerate(freqs) if f > 0]
    lens = [0] * n
    if not used:
        return lens
    if len(used) == 1:
        lens[used[0]] = 1
        return lens
    f = {i: int(freqs[i]) for i in used}
    while True:
        heap = [(fv, i, None) for i, fv in f.items()]
        heapq.heapify(heap)
        cnt = n
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            heapq.heappush(heap, (a[0] + b[0], cnt, (a, b)))
            cnt += 1
        depths: dict[int, int] = {}
        stack = [(heap[0], 0)]
        while stack:
            node, d = stack.pop()
            if node[2] is None:
                depths[node[1]] = max(d, 1)
            else:
                stack.append((node[2][0], d + 1))
                stack.append((node[2][1], d + 1))
        if max(depths.values()) <= maxlen:
            break
        f = {i: max(1, fv >> 2) for i, fv in f.items()}  # flatten, retry
    for i, d in depths.items():
        lens[i] = d
    return lens


# ---------------------------------------------------------------------------
# LZ77 length/distance prefix coding (spec §"LZ77 Backward Reference")

def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value ≥ 1 → (prefix_code, extra_bits, extra_value)."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    e = x.bit_length() - 2
    top = x >> e  # 2 or 3
    return 2 * e + top, e, x - (top << e)


def _prefix_decode(code: int, r: _Reader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.read(extra) + 1


# ---------------------------------------------------------------------------
# Huffman code (de)serialization

def _write_huffman_code(w: _Writer, lengths, used_count: int, used_syms):
    """Emit one huffman code.  Simple form when ≤2 used symbols all ≤255;
    otherwise the normal code-length-code form."""
    if 1 <= used_count <= 2 and all(s <= 255 for s in used_syms):
        w.bits(1, 1)                     # simple
        w.bits(used_count - 1, 1)
        first = used_syms[0]
        if first <= 1:
            w.bits(0, 1)                 # first symbol in 1 bit
            w.bits(first, 1)
        else:
            w.bits(1, 1)
            w.bits(first, 8)
        if used_count == 2:
            w.bits(used_syms[1], 8)
        return
    w.bits(0, 1)                         # normal
    # RLE the length sequence with 16/17/18 (prev starts at 8)
    seq: list[tuple[int, int, int]] = []  # (symbol, extra_bits, extra_val)
    n = len(lengths)
    i, prev = 0, _DEFAULT_CODE_LENGTH
    while i < n:
        l = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == l:
            run += 1
        if l == 0:
            left = run
            while left >= 11:
                c = min(left, 138)
                seq.append((18, 7, c - 11))
                left -= c
            while left >= 3:
                c = min(left, 10)
                seq.append((17, 3, c - 3))
                left -= c
            for _ in range(left):
                seq.append((0, 0, 0))
        else:
            seq.append((l, 0, 0))
            left = run - 1
            if l == prev:
                left = run  # all copies can use 16
                seq.pop()
            while left >= 3:
                c = min(left, 6)
                seq.append((16, 2, c - 3))
                left -= c
            for _ in range(left):
                seq.append((l, 0, 0))
            prev = l
        i += run
    clfreq = [0] * 19
    for s, _, _ in seq:
        clfreq[s] += 1
    cl_lens = _huff_lengths(clfreq, 7)
    if sum(1 for l in cl_lens if l) == 1:
        # complete the code with a never-emitted dummy symbol
        solo = next(s for s, l in enumerate(cl_lens) if l)
        cl_lens[0 if solo else 1] = 1
        cl_lens[solo] = 1
    cl_codes = _canonical(cl_lens)
    # trim trailing zeros in read order
    num = 19
    while num > 4 and cl_lens[_CL_ORDER[num - 1]] == 0:
        num -= 1
    w.bits(num - 4, 4)
    for i in range(num):
        w.bits(cl_lens[_CL_ORDER[i]], 3)
    w.bits(0, 1)                         # no max_symbol field
    for s, eb, ev in seq:
        c, l = cl_codes[s]
        w.code(c, l)
        if eb:
            w.bits(ev, eb)


def _read_huffman_code(r: _Reader, alphabet_size: int):
    if r.read(1):                        # simple
        num = r.read(1) + 1
        first_8 = r.read(1)
        s0 = r.read(8 if first_8 else 1)
        codes = {s0: (0, 1)}
        if num == 2:
            s1 = r.read(8)
            codes = {s0: (0, 1), s1: (1, 1)}
        else:
            codes = {s0: (0, 0)}
        return _table_from_codes(codes)
    num = r.read(4) + 4
    cl_lens = [0] * 19
    for i in range(num):
        cl_lens[_CL_ORDER[i]] = r.read(3)
    cl_table = _table_from_codes(_canonical(cl_lens))
    if r.read(1):                        # explicit max_symbol
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    sym, prev = 0, _DEFAULT_CODE_LENGTH
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        l = _read_symbol(r, cl_table)
        if l < 16:
            lengths[sym] = l
            sym += 1
            if l:
                prev = l
        else:
            rep = _CL_OFFSET[l] + r.read(_CL_EXTRA[l])
            fill = prev if l == 16 else 0
            for _ in range(min(rep, alphabet_size - sym)):
                lengths[sym] = fill
                sym += 1
    return _table_from_codes(_canonical(lengths))


# ---------------------------------------------------------------------------
# predictor transform (spec §"Predictor Transform", 14 modes)

def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, L, T, TL, TR):
    """each of L/T/TL/TR is an (a, r, g, b) tuple; returns same."""
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return tuple(_avg2(_avg2(L[i], TR[i]), T[i]) for i in range(4))
    if mode == 6:
        return tuple(_avg2(L[i], TL[i]) for i in range(4))
    if mode == 7:
        return tuple(_avg2(L[i], T[i]) for i in range(4))
    if mode == 8:
        return tuple(_avg2(TL[i], T[i]) for i in range(4))
    if mode == 9:
        return tuple(_avg2(T[i], TR[i]) for i in range(4))
    if mode == 10:
        return tuple(_avg2(_avg2(L[i], TL[i]), _avg2(T[i], TR[i])) for i in range(4))
    if mode == 11:
        p = [L[i] + T[i] - TL[i] for i in range(4)]
        pl = sum(abs(p[i] - L[i]) for i in range(4))
        pt = sum(abs(p[i] - T[i]) for i in range(4))
        return L if pl < pt else T
    if mode == 12:
        return tuple(_clamp(L[i] + T[i] - TL[i]) for i in range(4))
    if mode == 13:
        # C-style truncating division per the spec's pseudo-code
        def half(v: int) -> int:
            return -((-v) >> 1) if v < 0 else v >> 1

        return tuple(
            _clamp(_avg2(L[i], T[i]) + half(_avg2(L[i], T[i]) - TL[i])) for i in range(4)
        )
    raise ValueError(f"bad predictor mode {mode}")


def _px(arr4, i):
    return (int(arr4[0][i]), int(arr4[1][i]), int(arr4[2][i]), int(arr4[3][i]))


def _predictor_pass(a, r, g, b, w, h, modes, size_bits, *, forward: bool):
    """Sequential predictor pass over the linear pixel stream.  forward:
    out = (pixel - pred) mod 256 using ORIGINAL neighbors; inverse:
    out = (residual + pred) mod 256 using RECONSTRUCTED neighbors.
    Edge rules per spec: (0,0) predicts ARGB black; row 0 uses L; column 0
    uses T; the top-right of the last column is the linear successor
    (first pixel of the current row)."""
    tw = (w + (1 << size_bits) - 1) >> size_bits
    src = (a, r, g, b)
    out = tuple(np.empty(w * h, dtype=np.int64) for _ in range(4))
    neigh = src if forward else out  # reconstructed == original on inverse
    for i in range(w * h):
        y, x = divmod(i, w)
        if i == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = _px(neigh, i - 1)
        elif x == 0:
            pred = _px(neigh, i - w)
        else:
            mode = int(modes[(y >> size_bits) * tw + (x >> size_bits)])
            pred = _predict(
                mode,
                _px(neigh, i - 1),
                _px(neigh, i - w),
                _px(neigh, i - w - 1),
                _px(neigh, i - w + 1),
            )
        for c in range(4):
            if forward:
                out[c][i] = (int(src[c][i]) - pred[c]) & 0xFF
            else:
                out[c][i] = (int(src[c][i]) + pred[c]) & 0xFF
    return out


# ---------------------------------------------------------------------------
# entropy image encode / decode (shared by main image, predictor subimage,
# palette)

def _encode_entropy_image(w: _Writer, a, r, g, b, *, use_rle: bool = True,
                          level0: bool = False):
    """Pixels as int arrays (linear order).  Emits: no color cache, (at
    level 0) no meta-Huffman, the 5 huffman codes (frequency-built), then
    literals + distance-1 runs."""
    n = len(g)
    argb = [
        (int(a[i]) << 24) | (int(r[i]) << 16) | (int(g[i]) << 8) | int(b[i])
        for i in range(n)
    ]
    # tokenize: distance-1 runs ≥ 4 → (copy, length); else literal index
    tokens: list[tuple[str, int]] = []
    i = 0
    while i < n:
        run = 0
        if use_rle and i > 0:
            while i + run < n and argb[i + run] == argb[i - 1] and run < 4096:
                run += 1
        if run >= 4:
            tokens.append(("copy", run))
            i += run
        else:
            tokens.append(("lit", i))
            i += 1
    gf = [0] * (256 + _NUM_LENGTH_CODES)
    rf, bf, af = [0] * 256, [0] * 256, [0] * 256
    df = [0] * _NUM_DIST_CODES
    for kind, v in tokens:
        if kind == "lit":
            gf[int(g[v])] += 1
            rf[int(r[v])] += 1
            bf[int(b[v])] += 1
            af[int(a[v])] += 1
        else:
            code, _, _ = _prefix_encode(v)
            gf[256 + code] += 1
            dcode, _, _ = _prefix_encode(1 + 120)  # linear distance 1
            df[dcode] += 1

    w.bits(0, 1)  # no color cache
    if level0:
        w.bits(0, 1)  # no meta-Huffman groups

    def emit_code(freqs):
        used = [s for s, f in enumerate(freqs) if f > 0]
        lens = _huff_lengths(freqs, _PEEK)
        if len(used) == 1 and used[0] > 255:
            # can't use simple form; complete the normal code with a dummy
            lens[0 if used[0] else 1] = 1
        _write_huffman_code(w, lens, len(used), used)
        if len(used) == 1 and used[0] <= 255:
            return {used[0]: (0, 0)}  # simple 1-symbol code reads 0 bits
        if len(used) == 2 and used[1] <= 255:
            return {used[0]: (0, 1), used[1]: (1, 1)}  # simple 2-symbol
        return _canonical(lens)

    gc = emit_code(gf)
    rc = emit_code(rf)
    bc = emit_code(bf)
    ac = emit_code(af)
    if not any(df):
        df[0] = 1  # unused distance code still must exist
    dc = emit_code(df)

    for kind, v in tokens:
        if kind == "lit":
            c, l = gc[int(g[v])]
            w.code(c, l)
            c, l = rc[int(r[v])]
            w.code(c, l)
            c, l = bc[int(b[v])]
            w.code(c, l)
            c, l = ac[int(a[v])]
            w.code(c, l)
        else:
            code, eb, ev = _prefix_encode(v)
            c, l = gc[256 + code]
            w.code(c, l)
            if eb:
                w.bits(ev, eb)
            dcode, deb, dev = _prefix_encode(121)
            c, l = dc[dcode]
            w.code(c, l)
            if deb:
                w.bits(dev, deb)


def _decode_entropy_pixels(r: _Reader, npix: int, *, level0: bool,
                           width: int = 0):
    """One entropy-coded image (after any transforms were read) → list of
    packed ARGB ints.  ``width`` resolves the 2D distance-neighborhood
    codes (≤120); 0 means reject them (sub-images our encoder never
    references that way)."""
    cache_bits = r.read(4) if r.read(1) else 0
    meta = None
    n_groups = 1
    if level0 and r.read(1):
        # meta prefix codes (spec §"Decoding of Meta Prefix Codes"):
        # an entropy sub-image assigns a prefix-code group per tile
        mb = r.read(3) + 2
        hh = npix // width
        tw = (width + (1 << mb) - 1) >> mb
        th = (hh + (1 << mb) - 1) >> mb
        sub = _decode_entropy_pixels(r, tw * th, level0=False, width=tw)
        meta_idx = [((p >> 8) & 0xFFFF) for p in sub]
        n_groups = max(meta_idx) + 1
        meta = (mb, tw, meta_idx)
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_huffman_code(r, 256 + _NUM_LENGTH_CODES + cache_size),
            _read_huffman_code(r, 256),
            _read_huffman_code(r, 256),
            _read_huffman_code(r, 256),
            _read_huffman_code(r, _NUM_DIST_CODES),
        ))
    green_tab, red_tab, blue_tab, alpha_tab, dist_tab = groups[0]
    cache = [0] * cache_size
    pixels: list[int] = []
    shift = 32 - cache_bits if cache_bits else 0
    while len(pixels) < npix:
        if meta is not None:
            mb, tw, meta_idx = meta
            i = len(pixels)
            g = meta_idx[((i // width) >> mb) * tw + ((i % width) >> mb)]
            green_tab, red_tab, blue_tab, alpha_tab, dist_tab = groups[g]
        s = _read_symbol(r, green_tab)
        if s < 256:
            gg = s
            rr = _read_symbol(r, red_tab)
            bb = _read_symbol(r, blue_tab)
            aa = _read_symbol(r, alpha_tab)
            px = (aa << 24) | (rr << 16) | (gg << 8) | bb
            pixels.append(px)
            if cache_bits:
                cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> shift] = px
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _prefix_decode(s - 256, r)
            dcode = _read_symbol(r, dist_tab)
            mapped = _prefix_decode(dcode, r)
            if mapped <= 120:
                if not width:
                    raise ValueError(
                        "VP8L 2D distance code in a width-less sub-image")
                pc = _PLANE_CODES[mapped - 1]
                dist = (pc >> 4) * width + (8 - (pc & 15))
                if dist < 1:
                    dist = 1
            else:
                dist = mapped - 120
            if dist > len(pixels):
                raise ValueError("VP8L backward reference before image start")
            for _ in range(length):
                px = pixels[-dist]
                pixels.append(px)
                if cache_bits:
                    cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> shift] = px
        else:
            px = cache[s - 256 - _NUM_LENGTH_CODES]
            pixels.append(px)
    return pixels


def _pixels_to_channels(pixels, npix):
    p = np.array(pixels[:npix], dtype=np.uint32)
    return (
        (p >> 24).astype(np.int64),
        ((p >> 16) & 0xFF).astype(np.int64),
        ((p >> 8) & 0xFF).astype(np.int64),
        (p & 0xFF).astype(np.int64),
    )


# ---------------------------------------------------------------------------
# public API

def encode_webp(arr: np.ndarray, *, subtract_green: bool = True,
                predictor_mode: int | None = None, predictor_bits: int = 4,
                palette: str = "auto") -> bytes:
    """uint8 (H,W,3) or (H,W) → lossless VP8L-in-RIFF bytes.

    ``predictor_mode``: apply the predictor transform with this uniform
    mode (0-13) over 2^predictor_bits blocks.  ``palette='auto'`` uses
    color-indexing (with pixel bundling) when the image has ≤256 distinct
    colors and no predictor was requested; 'off' disables."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    h, w_img, _ = arr.shape
    if h > 1 << 14 or w_img > 1 << 14:
        raise ValueError("VP8L dimensions limited to 2^14")
    rch = arr[:, :, 0].astype(np.int64).reshape(-1)
    gch = arr[:, :, 1].astype(np.int64).reshape(-1)
    bch = arr[:, :, 2].astype(np.int64).reshape(-1)
    ach = np.full(h * w_img, 255, dtype=np.int64)

    w = _Writer()
    w.bits(0x2F, 8)  # VP8L signature
    w.bits(w_img - 1, 14)
    w.bits(h - 1, 14)
    w.bits(0, 1)     # alpha hint
    w.bits(0, 3)     # version

    colors = np.unique(
        (ach << 24) | (rch << 16) | (gch << 8) | bch
    )
    use_palette = (
        palette == "auto" and predictor_mode is None and len(colors) <= 256
    )
    if use_palette:
        ncol = len(colors)
        lut = {int(c): i for i, c in enumerate(colors)}
        idx = np.array(
            [lut[int(p)] for p in (ach << 24) | (rch << 16) | (gch << 8) | bch],
            dtype=np.int64,
        )
        wb = 3 if ncol <= 2 else 2 if ncol <= 4 else 1 if ncol <= 16 else 0
        w.bits(1, 1)  # has transform
        w.bits(3, 2)  # color indexing
        w.bits(ncol - 1, 8)
        # palette subimage: component-wise delta vs previous entry
        pa = (colors >> 24).astype(np.int64)
        pr = ((colors >> 16) & 0xFF).astype(np.int64)
        pg = ((colors >> 8) & 0xFF).astype(np.int64)
        pb = (colors & 0xFF).astype(np.int64)
        da = np.diff(pa, prepend=0) & 0xFF
        dr = np.diff(pr, prepend=0) & 0xFF
        dg = np.diff(pg, prepend=0) & 0xFF
        db = np.diff(pb, prepend=0) & 0xFF
        _encode_entropy_image(w, da, dr, dg, db)
        if wb:
            pack = 1 << wb
            sub_bits = 8 >> wb
            packed_w = (w_img + pack - 1) >> wb
            packed = np.zeros(h * packed_w, dtype=np.int64)
            grid = idx.reshape(h, w_img)
            for j in range(pack):
                col = grid[:, j::pack]
                packed.reshape(h, packed_w)[:, : col.shape[1]] |= col << (j * sub_bits)
            gch = packed
            npix = h * packed_w
        else:
            gch = idx
            npix = h * w_img
        ach = np.full(npix, 255, dtype=np.int64)
        rch = np.zeros(npix, dtype=np.int64)
        bch = np.zeros(npix, dtype=np.int64)
        w.bits(0, 1)  # no more transforms
        _encode_entropy_image(w, ach, rch, gch, bch, level0=True)
    else:
        if subtract_green:
            w.bits(1, 1)
            w.bits(2, 2)  # subtract green
            rch = (rch - gch) & 0xFF
            bch = (bch - gch) & 0xFF
        if predictor_mode is not None:
            sb = predictor_bits
            w.bits(1, 1)
            w.bits(0, 2)  # predictor
            w.bits(sb - 2, 3)
            tw = (w_img + (1 << sb) - 1) >> sb
            th = (h + (1 << sb) - 1) >> sb
            modes = np.full(tw * th, predictor_mode, dtype=np.int64)
            _encode_entropy_image(
                w,
                np.full(tw * th, 255, dtype=np.int64),
                np.zeros(tw * th, dtype=np.int64),
                modes,
                np.zeros(tw * th, dtype=np.int64),
            )
            ach, rch, gch, bch = _predictor_pass(
                ach, rch, gch, bch, w_img, h, modes, sb, forward=True
            )
        w.bits(0, 1)  # no more transforms
        _encode_entropy_image(w, ach, rch, gch, bch, level0=True)

    payload = w.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF/WEBP bytes → uint8 (H,W,3) RGB (alpha dropped).

    Dispatches on the payload chunk: ``VP8L`` (lossless, this module) or
    ``VP8 `` (lossy key frame — the from-spec RFC 6386 decoder in
    vp8.py).  ``VP8X`` extended containers are walked for their image
    chunk; metadata chunks (EXIF/XMP/ICCP) are skipped."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    pos = 12
    payload = None
    alpha_chunk = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if tag == b"VP8L":
            payload = data[pos + 8 : pos + 8 + size]
            break
        if tag == b"ALPH":
            alpha_chunk = data[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size & 1)
            continue
        if tag == b"VP8 ":
            from gdal_ray.codecs.vp8 import decode_vp8

            rgb = decode_vp8(data[pos + 8 : pos + 8 + size]).rgb()
            if alpha_chunk is not None:
                alpha = decode_alpha_plane(alpha_chunk, rgb.shape[1],
                                           rgb.shape[0])
                return np.dstack([rgb, alpha])
            return rgb
        pos += 8 + size + (size & 1)  # VP8X/EXIF/XMP/ICCP: skip
    if payload is None:
        raise ValueError("no VP8L or VP8 chunk found")
    r = _Reader(payload)
    if r.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w_img = r.read(14) + 1
    h = r.read(14) + 1
    r.read(1)  # alpha hint
    if r.read(3) != 0:
        raise ValueError("unknown VP8L version")
    a, rr, gg, bb = _decode_vp8l_body(r, w_img, h)
    planes = [rr.reshape(h, w_img), gg.reshape(h, w_img), bb.reshape(h, w_img)]
    aa = np.asarray(a).reshape(h, w_img)
    if (aa != 255).any():
        planes.append(aa)
    return np.stack(planes, axis=2).astype(np.uint8)


def _decode_vp8l_body(r: "_Reader", w_img: int, h: int):
    """Transforms + entropy-coded pixels of a VP8L stream (everything
    after the signature/dimension header) -> (a, r, g, b) flat channel
    arrays.  Shared by the standalone VP8L path and the ALPH alpha-plane
    decoder (whose VP8L stream is headerless with implicit dimensions,
    per the WebP container spec)."""
    transforms = []
    cur_w = w_img
    while r.read(1):
        ttype = r.read(2)
        if ttype == 2:
            transforms.append(("subgreen",))
        elif ttype == 0:
            sb = r.read(3) + 2
            tw = (cur_w + (1 << sb) - 1) >> sb
            th = (h + (1 << sb) - 1) >> sb
            sub = _decode_entropy_pixels(r, tw * th, level0=False, width=tw)
            modes = [((p >> 8) & 0xFF) for p in sub]
            transforms.append(("pred", sb, modes))
        elif ttype == 3:
            ncol = r.read(8) + 1
            pal_px = _decode_entropy_pixels(r, ncol, level0=False, width=ncol)
            pa, pr, pg, pb = _pixels_to_channels(pal_px, ncol)
            pa = np.cumsum(pa) & 0xFF
            pr = np.cumsum(pr) & 0xFF
            pg = np.cumsum(pg) & 0xFF
            pb = np.cumsum(pb) & 0xFF
            wb = 3 if ncol <= 2 else 2 if ncol <= 4 else 1 if ncol <= 16 else 0
            if any(t[0] != "subgreen" for t in transforms):
                raise NotImplementedError(
                    "color-indexing combined with predictor/color transforms "
                    "is not supported (never emitted by this encoder)"
                )
            transforms.append(("palette", ncol, (pa, pr, pg, pb), wb, cur_w))
            if wb:
                cur_w = (cur_w + (1 << wb) - 1) >> wb
        else:  # ttype == 1: cross-color (spec §"Color Transform")
            sb = r.read(3) + 2
            tw = (cur_w + (1 << sb) - 1) >> sb
            th = (h + (1 << sb) - 1) >> sb
            sub = _decode_entropy_pixels(r, tw * th, level0=False, width=tw)
            # element pixel: red_to_blue<<16 | green_to_blue<<8 | green_to_red
            g2r = np.array([(p >> 0) & 0xFF for p in sub], dtype=np.uint8)
            g2b = np.array([(p >> 8) & 0xFF for p in sub], dtype=np.uint8)
            r2b = np.array([(p >> 16) & 0xFF for p in sub], dtype=np.uint8)
            transforms.append(("cross", sb, tw, th,
                               g2r.astype(np.int8), g2b.astype(np.int8),
                               r2b.astype(np.int8)))

    pixels = _decode_entropy_pixels(r, cur_w * h, level0=True, width=cur_w)
    a, rr, gg, bb = _pixels_to_channels(pixels, cur_w * h)

    for t in reversed(transforms):
        if t[0] == "palette":
            _, ncol, (pa, pr, pg, pb), wb, orig_w = t
            if wb:
                pack = 1 << wb
                sub_bits = 8 >> wb
                packed_w = (orig_w + pack - 1) >> wb
                packed = gg.reshape(h, packed_w)
                idx = np.zeros((h, packed_w * pack), dtype=np.int64)
                for j in range(pack):
                    idx[:, j::pack] = (packed >> (j * sub_bits)) & ((1 << sub_bits) - 1)
                idx = idx[:, :orig_w].reshape(-1)
            else:
                idx = gg
            idx = np.clip(idx, 0, ncol - 1)
            a, rr, gg, bb = pa[idx], pr[idx], pg[idx], pb[idx]
            cur_w = orig_w
        elif t[0] == "subgreen":
            rr = (rr + gg) & 0xFF
            bb = (bb + gg) & 0xFF
        elif t[0] == "cross":
            _, sb, tw, th, g2r, g2b, r2b = t
            ty = (np.arange(h) >> sb)
            tx = (np.arange(cur_w) >> sb)
            tidx = (ty[:, None] * tw + tx[None, :]).reshape(-1)
            G2R = g2r.astype(np.int32)[tidx]
            G2B = g2b.astype(np.int32)[tidx]
            R2B = r2b.astype(np.int32)[tidx]
            gs = gg.astype(np.uint8).astype(np.int8).astype(np.int32)
            red = (rr + ((G2R * gs) >> 5)) & 0xFF
            rs = red.astype(np.uint8).astype(np.int8).astype(np.int32)
            blue = (bb + ((G2B * gs) >> 5) + ((R2B * rs) >> 5)) & 0xFF
            rr, bb = red, blue
        elif t[0] == "pred":
            _, sb, modes = t
            a, rr, gg, bb = _predictor_pass(
                a, rr, gg, bb, cur_w, h, modes, sb, forward=False
            )
    return a, rr, gg, bb


def decode_alpha_plane(data: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk payload -> (h, w) uint8 alpha plane (WebP container
    spec: header byte = reserved(2) | preprocessing(2) | filtering(2) |
    compression(2); compression 0 = raw, 1 = headerless VP8L with the
    alpha values in the green channel; filters per the spec's
    horizontal/vertical/gradient predictive filtering)."""
    hdr = data[0]
    comp = hdr & 3
    filt = (hdr >> 2) & 3
    if comp == 0:
        plane = np.frombuffer(data, np.uint8, count=w * h,
                              offset=1).reshape(h, w).astype(np.int64)
    elif comp == 1:
        r = _Reader(data[1:])
        _, _, gg, _ = _decode_vp8l_body(r, w, h)
        plane = np.asarray(gg, dtype=np.int64).reshape(h, w)
    else:
        raise NotImplementedError(f"ALPH compression method {comp}")
    if filt == 0:
        return plane.astype(np.uint8)
    out = np.zeros((h, w), dtype=np.int64)
    if filt == 1:  # horizontal: left; row starts seed from the pixel above
        for y in range(h):
            seed = out[y - 1, 0] if y else 0
            out[y] = (np.cumsum(plane[y]) + seed) & 0xFF
    elif filt == 2:  # vertical: above; row 0 is horizontally chained
        out[0] = np.cumsum(plane[0]) & 0xFF
        out[1:] = (np.cumsum(plane[1:], axis=0) + out[0][None, :]) & 0xFF
    else:  # gradient: clip(left + above - above-left), sequential in x
        out[0] = np.cumsum(plane[0]) & 0xFF
        for y in range(1, h):
            left = (plane[y, 0] + out[y - 1, 0]) & 0xFF
            out[y, 0] = left
            above = out[y - 1]
            for x in range(1, w):
                g = left + above[x] - above[x - 1]
                g = 0 if g < 0 else (255 if g > 255 else g)
                left = (plane[y, x] + g) & 0xFF
                out[y, x] = left
    return out.astype(np.uint8)
