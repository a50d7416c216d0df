"""Progressive JPEG (ITU-T T.81 Annex G) — pure stdlib + numpy.

Spectral-selection + successive-approximation decode of SOF2 streams:
DC first/refinement scans (interleaved or single-component), AC
first/refinement scans (always single-component per T.81), EOB runs
(EOBn symbols with extension bits), ZRL in refinement, restart markers,
and Huffman/quant tables redefined between scans.  Coefficients
accumulate across scans in zigzag order and reconstruct through the
shared baseline tail (dequant → IDCT → upsample → color).

The encoder emits a libjpeg-style 10-scan script (DC Al=1 → AC bands at
Al=2/1 → AC refinement ×2 → DC refinement → chroma refinements), so
every decoder path above is exercised by the round-trip tests.  Like
the baseline encoder it writes 4:4:4 (or grayscale); the decoder
accepts any sampling factors ≤ 2×2.

Reference behavior: frmts/jpeg/jpgdataset.cpp decodes progressive JPEG
through libjpeg (jdphuff.c's algorithm is specified in T.81 G.2); this
is the sandbox's from-spec implementation of the same bitstream.
Performance: scalar per-symbol decode (~1 s/megapixel) — progressive is
a long-tail crawl format; the pooled-lane vectorized engine in jpeg.py
covers the baseline bulk.
"""

from __future__ import annotations

import struct

import numpy as np

from gdal_ray.codecs.jpeg import (
    HT_DC_CHROMA,
    HT_DC_LUMA,
    QT_CHROMA,
    QT_LUMA,
    UNZIGZAG,
    ZIGZAG,
    _BitWriter,
    _component_blocks,
    _fdct_blocks,
    _huff_codes,
    _huff_lut,
    _magnitude,
    _quality_scale,
    _reconstruct,
    _words32,
    rgb_to_ycbcr,
)

# A flat Huffman table holding ALL 256 run/size symbols (254 at 9 bits,
# 2 at 10 — Kraft sum 0.498 < 1, so no all-ones code).  Progressive AC
# scans need EOBn symbols (0x10..0xE0) that the Annex K baseline tables
# lack; a flat table keeps the encoder trivially correct at a small
# size cost, which the round-trip tests don't care about.
HT_AC_FLAT = (
    [0, 0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


# ---------------------------------------------------------------------------
# bit reader (per entropy segment)

class _Bits:
    def __init__(self, seg: np.ndarray):
        self.words = _words32(np.ascontiguousarray(seg)).tolist()
        self.pos = 0

    def peek16(self) -> int:
        p = self.pos
        return (self.words[p >> 3] >> (16 - (p & 7))) & 0xFFFF

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v

    def huff(self, lut: list) -> int:
        lu = lut[self.peek16()]
        length = lu & 31
        if length == 0:
            raise ValueError("bad Huffman code (progressive scan)")
        self.pos += length
        return lu >> 5


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _entropy_segments(buf: np.ndarray, start: int):
    """De-stuff + restart-split the entropy bytes of one scan.

    Returns (segments, stop) where stop is the absolute offset of the
    first marker after the scan (same vectorized scheme as
    jpeg._split_entropy, which also needs the scan-relative offsets)."""
    raw = buf[start:]
    ff = np.flatnonzero(raw[:-1] == 0xFF)
    nxt = raw[ff + 1]
    is_stuff = nxt == 0x00
    is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    stop_idx = np.flatnonzero(~is_stuff & ~is_rst)
    stop = int(ff[stop_idx[0]]) if stop_idx.size else len(raw)
    in_scan = ff < stop
    ff, is_stuff, is_rst = ff[in_scan], is_stuff[in_scan], is_rst[in_scan]
    delete = np.zeros(stop, dtype=bool)
    delete[ff[is_stuff] + 1] = True
    rst = ff[is_rst]
    delete[rst] = True
    delete[rst + 1] = True
    keep = ~delete
    clean = raw[:stop][keep]
    csum = np.cumsum(keep)
    bounds = csum[rst] if rst.size else np.empty(0, dtype=np.int64)
    offs = np.concatenate([[0], bounds, [len(clean)]]).astype(np.int64)
    segs = [clean[offs[i]: offs[i + 1]] for i in range(len(offs) - 1)]
    return segs, start + stop


# ---------------------------------------------------------------------------
# scan decoders (T.81 G.2; same control structure libjpeg's jdphuff.c
# implements from that spec)

def _scan_blocks(frame, scomp):
    """Yield (comp, padded-block-index) in scan order, grouped per data
    unit; returns (groups, units_per_restart_unit) where groups is a
    list of lists — one list of (comp, b) per MCU/data-unit."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    groups = []
    if len(scomp) == 1:
        c = scomp[0]
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        nbx = -(-cw // 8)
        nby = -(-ch // 8)
        nbx_pad = mcux * c["h"]
        for row in range(nby):
            for col in range(nbx):
                groups.append([(c, row * nbx_pad + col)])
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                g = []
                for c in scomp:
                    nbx_pad = mcux * c["h"]
                    for dv in range(c["v"]):
                        for dh in range(c["h"]):
                            g.append((c, (my * c["v"] + dv) * nbx_pad
                                      + mx * c["h"] + dh))
                groups.append(g)
    return groups


def _decode_dc_scan(segs, dri, frame, scomp, Ah, Al, luts):
    groups = _scan_blocks(frame, scomp)
    preds = {c["id"]: 0 for c in scomp}
    seg_idx = 0
    bits = _Bits(segs[0])
    p1 = 1 << Al
    for u, g in enumerate(groups):
        if dri and u and u % dri == 0:
            seg_idx += 1
            bits = _Bits(segs[seg_idx])
            preds = {c["id"]: 0 for c in scomp}
        for c, b in g:
            blk = c["coef"][b]
            if Ah == 0:
                s = bits.huff(luts[c["id"]])
                diff = _extend(bits.get(s), s) if s else 0
                preds[c["id"]] += diff
                blk[0] = preds[c["id"]] << Al
            else:
                if bits.get(1):
                    blk[0] |= p1


def _decode_ac_scan(segs, dri, frame, scomp, Ss, Se, Ah, Al, lut):
    groups = _scan_blocks(frame, scomp)
    c = scomp[0]
    coef = c["coef"]
    seg_idx = 0
    bits = _Bits(segs[0])
    eobrun = 0
    p1 = 1 << Al
    m1 = -p1
    for u, g in enumerate(groups):
        if dri and u and u % dri == 0:
            seg_idx += 1
            bits = _Bits(segs[seg_idx])
            eobrun = 0
        b = g[0][1]
        blk = coef[b]
        if Ah == 0:
            # --- first scan for this band (G.2.2)
            if eobrun:
                eobrun -= 1
                continue
            k = Ss
            while k <= Se:
                rs = bits.huff(lut)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:          # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += bits.get(r)
                    break
                k += r
                if k > Se:
                    raise ValueError("AC run past end of band")
                blk[k] = _extend(bits.get(s), s) << Al
                k += 1
        else:
            # --- refinement scan (G.2.3): one correction bit per
            # already-nonzero coefficient crossed, ±(1<<Al) for each
            # newly significant one
            k = Ss
            if eobrun == 0:
                while k <= Se:
                    rs = bits.huff(lut)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += bits.get(r)
                            break
                        val = 0          # ZRL: 16 zero-history skips
                    else:
                        if s != 1:
                            raise ValueError("refinement size != 1")
                        val = p1 if bits.get(1) else m1
                    while k <= Se:
                        cur = blk[k]
                        if cur != 0:
                            if bits.get(1) and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val != 0 and k <= Se:
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                while k <= Se:
                    cur = blk[k]
                    if cur != 0 and bits.get(1) and (cur & p1) == 0:
                        blk[k] = cur + (p1 if cur >= 0 else m1)
                    k += 1
                eobrun -= 1


# ---------------------------------------------------------------------------
# top-level decoder

def decode_jpeg_progressive(data: bytes) -> np.ndarray:
    buf = np.frombuffer(data, dtype=np.uint8)
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    luts: dict[tuple[int, int], list] = {}
    frame = None
    dri = 0
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                q = np.frombuffer(seg[i + 1: i + 65], dtype=np.uint8).astype(np.int64)
                qtables[tq] = q[UNZIGZAG].reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 15
                bits16 = list(seg[i + 1: i + 17])
                cnt = sum(bits16)
                values = list(seg[i + 17: i + 17 + cnt])
                luts[(cls, tid)] = _huff_lut(bits16, values).tolist()
                i += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                npad = (mcuy * c["v"]) * (mcux * c["h"])
                c["coef"] = [[0] * 64 for _ in range(npad)]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported SOF type")
        elif marker == 0xDD:
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            by_id = {c["id"]: c for c in frame["comps"]}
            scomp, tabs = [], []
            for si in range(ns):
                cid, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                scomp.append(by_id[cid])
                tabs.append((tt >> 4, tt & 15))
            Ss, Se, AhAl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            Ah, Al = AhAl >> 4, AhAl & 15
            segs, stop = _entropy_segments(buf, pos + seglen)
            if Ss == 0:
                if Se != 0:
                    raise ValueError("sequential scan in progressive stream")
                dc_luts = ({c["id"]: luts[(0, t[0])] for c, t in zip(scomp, tabs)}
                           if Ah == 0 else None)
                _decode_dc_scan(segs, dri, frame, scomp, Ah, Al, dc_luts)
            else:
                if ns != 1:
                    raise ValueError("interleaved AC scan (T.81 forbids)")
                _decode_ac_scan(segs, dri, frame, scomp, Ss, Se, Ah, Al,
                                luts[(1, tabs[0][1])])
            pos = stop
            continue
        pos += seglen
    if frame is None:
        raise ValueError("no frame found")
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    coefs = [np.asarray(c["coef"], dtype=np.float64) for c in comps]
    qs = [qtables[c["tq"]].astype(np.float64) for c in comps]
    return _reconstruct(coefs, comps, frame["h"], frame["w"],
                        mcux, mcuy, hmax, vmax, qs)


# ---------------------------------------------------------------------------
# encoder (libjpeg-style default scan script)

class _AcEncoder:
    """AC-scan entropy encoder with EOB-run accumulation (G.1.2.2-3)."""

    def __init__(self, bw: _BitWriter, tab):
        self.bw = bw
        self.tab = tab
        self.eobrun = 0
        self.pending = []            # correction bits owed after EOBn

    def flush_eobrun(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, length = self.tab[r << 4]
            self.bw.write(code, length)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def first_block(self, zz, Ss, Se, Al):
        bw, tab = self.bw, self.tab
        r = 0
        any_coef = False
        for k in range(Ss, Se + 1):
            t = abs(zz[k]) >> Al
            if t == 0:
                r += 1
                continue
            self.flush_eobrun()
            while r > 15:
                code, length = tab[0xF0]
                bw.write(code, length)
                r -= 16
            v = t if zz[k] > 0 else -t
            size, bits = _magnitude(v)
            code, length = tab[(r << 4) | size]
            bw.write(code, length)
            bw.write(bits, size)
            r = 0
            any_coef = True
        if r or not any_coef:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def refine_block(self, zz, Ss, Se, Al):
        bw, tab = self.bw, self.tab
        absv = [abs(zz[k]) >> Al for k in range(Ss, Se + 1)]
        eob_i = -1                    # last newly-significant index
        for i, t in enumerate(absv):
            if t == 1:
                eob_i = i
        r = 0                         # zero-history run since last emit
        br: list[int] = []            # correction bits owed in-block
        emitted = False
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            # emit ZRLs at ANY nonzero unless the run folds into the EOB
            # (each ZRL carries the correction bits its span crossed)
            while r > 15 and i <= eob_i:
                self.flush_eobrun()
                code, length = tab[0xF0]
                bw.write(code, length)
                r -= 16
                for b in br:
                    bw.write(b, 1)
                br = []
            if t > 1:                 # history coefficient: correction bit
                br.append(t & 1)
                continue
            # newly significant (t == 1)
            self.flush_eobrun()
            code, length = tab[(r << 4) | 1]
            bw.write(code, length)
            bw.write(1 if zz[Ss + i] > 0 else 0, 1)
            r = 0
            for b in br:
                bw.write(b, 1)
            br = []
            emitted = True
        if r or br or not emitted:
            self.eobrun += 1
            self.pending.extend(br)
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85,
                            restart_interval: int = 0) -> bytes:
    """Progressive 4:4:4 (or grayscale) JFIF encoder; arr uint8 (H,W[,3]).

    Emits the standard successive-approximation scan script so decoders
    see DC first+refine, AC band splits, AC refinements and EOB runs.
    ``restart_interval`` (data units) applies to every scan; 0 = none.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)
    planes = ([arr.astype(np.float64)] if gray
              else list(np.moveaxis(rgb_to_ycbcr(arr), -1, 0)))
    qts = [qt_l] + ([] if gray else [qt_c, qt_c])
    zzs = []
    for ci, plane in enumerate(planes):
        blocks = _component_blocks(plane) - 128.0
        coef = _fdct_blocks(blocks)
        q = qts[ci].reshape(8, 8).astype(np.float64)
        qc = np.round(coef / q).astype(np.int64).reshape(-1, 64)
        zzs.append(qc[:, ZIGZAG].tolist())

    ncomp = len(planes)
    out = bytearray()
    out += b"\xFF\xD8"
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xFF\xDB" + struct.pack(">H", 2 + 65) + b"\x00" + bytes(qt_l[ZIGZAG].astype(np.uint8))
    if not gray:
        out += b"\xFF\xDB" + struct.pack(">H", 2 + 65) + b"\x01" + bytes(qt_c[ZIGZAG].astype(np.uint8))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xFF\xC2" + struct.pack(">H", 2 + len(sof)) + sof
    dht = [(0, 0, HT_DC_LUMA), (1, 0, HT_AC_FLAT)]
    if not gray:
        dht.insert(1, (0, 1, HT_DC_CHROMA))
    for cls, tid, (bits16, values) in dht:
        payload = bytes([cls << 4 | tid]) + bytes(bits16) + bytes(values)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)

    dc_tabs = [_huff_codes(*HT_DC_LUMA)] + [_huff_codes(*HT_DC_CHROMA)] * (ncomp - 1)
    ac_tab = _huff_codes(*HT_AC_FLAT)
    nby, nbx = -(-h // 8), -(-w // 8)

    if gray:
        script = [([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                  ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0)]
    else:
        script = [([0, 1, 2], 0, 0, 0, 1),
                  ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
                  ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
                  ([0, 1, 2], 0, 0, 1, 0),
                  ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0)]

    n_blocks = nby * nbx
    for cis, Ss, Se, Ah, Al in script:
        sos = bytes([len(cis)])
        for ci in cis:
            dc_id = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (dc_id << 4) | 0])
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

        bw = _BitWriter()
        rst_no = 0
        if Ss == 0:
            preds = {ci: 0 for ci in cis}
            for m in range(n_blocks):
                if restart_interval and m and m % restart_interval == 0:
                    bw.flush()
                    out += bw.out
                    out += bytes([0xFF, 0xD0 + rst_no])
                    rst_no = (rst_no + 1) % 8
                    bw = _BitWriter()
                    preds = {ci: 0 for ci in cis}
                for ci in cis:
                    dc = zzs[ci][m][0]
                    if Ah == 0:
                        diff = (dc >> Al) - preds[ci]
                        preds[ci] = dc >> Al
                        size, bits = _magnitude(diff)
                        code, length = dc_tabs[ci][size]
                        bw.write(code, length)
                        if size:
                            bw.write(bits, size)
                    else:
                        bw.write((dc >> Al) & 1, 1)
        else:
            ci = cis[0]
            enc = _AcEncoder(bw, ac_tab)
            for m in range(n_blocks):
                if restart_interval and m and m % restart_interval == 0:
                    enc.flush_eobrun()
                    bw.flush()
                    out += bw.out
                    out += bytes([0xFF, 0xD0 + rst_no])
                    rst_no = (rst_no + 1) % 8
                    bw = _BitWriter()
                    enc = _AcEncoder(bw, ac_tab)
                if Ah == 0:
                    enc.first_block(zzs[ci][m], Ss, Se, Al)
                else:
                    enc.refine_block(zzs[ci][m], Ss, Se, Al)
            enc.flush_eobrun()
        bw.flush()
        out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)
