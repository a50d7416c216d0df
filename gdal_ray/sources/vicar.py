"""VICAR (JPL MIPL) raster driver — frmts/pds/vicardataset.cpp wire
facts from the public VICAR file-format spec:

- ASCII label at file start: ``LBLSIZE=n`` first, then ``KEY=VALUE``
  tokens (quoted strings, ``(a,b)`` lists); ``EOL=1`` appends a second
  label after the data (ignored on read).
- Geometry: NL lines x NS samples x NB bands; ORG BSQ/BIL/BIP; records
  of RECSIZE bytes with an NBB-byte binary prefix and NLB binary-header
  records before the pixels; FORMAT BYTE/HALF/FULL/REAL/DOUB/COMP with
  INTFMT LOW|HIGH and REALFMT IEEE|RIEEE|VAX (VAX F-floats converted
  arithmetically).
- COMPRESS BASIC/BASIC2: per-line records holding a bit-packed
  predictive RLE stream decoded byte-plane by byte-plane (3-bit delta
  codes -3..3, escape to run/literal; run lengths 4/8/24-bit).  BASIC
  prefixes each record with its own uint32 size (self-chaining);
  BASIC2 stores all record sizes in a table right after the label.

Scale shape: label parses driver-side; ``read_vicar`` fans row slabs
out per Ray task (uncompressed: exact seeks; compressed: the size
table/chain is walked once driver-side so tasks range-read their
records only).
"""

from __future__ import annotations

import re

import numpy as np

_FORMATS = {
    "BYTE": "u1", "HALF": "i2", "WORD": "i2", "FULL": "i4", "LONG": "i4",
    "REAL": "f4", "DOUB": "f8", "COMP": "c8", "COMPLEX": "c8",
}


def _parse_label(text: str) -> dict:
    out: dict = {}
    for key, val in re.findall(
            r"([A-Z0-9_]+)=('(?:[^']|'')*'|\([^)]*\)|[^\s]+)", text):
        if val.startswith("'"):
            out[key] = val[1:-1].replace("''", "'")
        elif val.startswith("("):
            out[key] = [v.strip().strip("'") for v in val[1:-1].split(",")]
        else:
            out[key] = val
    return out


def vicar_meta(path: str) -> dict:
    with open(path, "rb") as f:
        head = f.read(64).decode("latin-1", "replace")
        m = re.match(r"LBLSIZE=(\d+)", head)
        if not m:
            raise ValueError("not a VICAR file (no LBLSIZE)")
        lblsize = int(m.group(1))
        f.seek(0)
        lbl = _parse_label(f.read(lblsize).decode("latin-1", "replace"))
    fmt = lbl.get("FORMAT", "BYTE")
    if fmt not in _FORMATS:
        raise NotImplementedError(f"VICAR FORMAT {fmt}")
    base = _FORMATS[fmt]
    intfmt = lbl.get("INTFMT", "LOW")
    realfmt = lbl.get("REALFMT", "IEEE")
    if base.startswith(("i", "u")):
        dt = ("<" if intfmt == "LOW" else ">") + base
    else:
        # REALFMT: IEEE = big-endian, RIEEE = little-endian, VAX = F-float
        dt = (">" if realfmt == "IEEE" else "<") + base
    nl, ns = int(lbl["NL"]), int(lbl["NS"])
    nb = int(lbl.get("NB", 1))
    recsize = int(lbl["RECSIZE"])
    nbb = int(lbl.get("NBB", 0))
    nlb = int(lbl.get("NLB", 0))
    return {
        "driver": "VICAR", "width": ns, "height": nl, "bands": nb,
        "wire_dtype": dt, "dtype": np.dtype(dt).newbyteorder("=").name,
        "org": lbl.get("ORG", "BSQ"), "recsize": recsize, "nbb": nbb,
        "vax": realfmt == "VAX" and base.startswith("f"),
        "compress": lbl.get("COMPRESS", "NONE"),
        "data_offset": lblsize + nlb * recsize,
        "label": lbl,
    }


def _vax_to_f4(raw: np.ndarray) -> np.ndarray:
    """VAX F-float -> float64.  Stored as two LE 16-bit words; word0
    holds sign (bit 15), exponent (bits 14-7, bias 128), mantissa high
    (bits 6-0); word1 = mantissa low; value = s*(0.5 + m/2^24)*2^(e-128)."""
    u = raw.view(np.uint32) if raw.dtype != np.uint32 else raw
    u = u.astype(np.uint64)
    w0 = u & 0xFFFF
    w1 = u >> 16
    sign = np.where((w0 >> 15) & 1, -1.0, 1.0)
    exp = ((w0 >> 7) & 0xFF).astype(np.int64)
    frac = ((w0 & 0x7F) << 16) | w1
    val = sign * (0.5 + frac / float(1 << 24)) * np.exp2(exp - 128.0)
    return np.where(exp == 0, 0.0, val)


# ---------------------------------------------------------------- BASIC RLE


def _basic_decode(code: bytes, ns: int, wid: int) -> bytearray:
    """One compressed record -> ns*wid little-endian bytes (the spec's
    predictive bit-packed RLE, decoded per byte-plane)."""
    buf = bytearray(ns * wid)
    pos = 0
    bitptr = 0
    nbytes = len(code)

    def grab(nbit):
        nonlocal pos, bitptr
        shift = 8 - nbit - bitptr
        if pos >= nbytes:
            raise ValueError("VICAR BASIC: out of data")
        if shift > 0:
            v = (code[pos] >> shift) & ((1 << nbit) - 1)
            bitptr += nbit
            return v
        if shift < 0:
            v1 = code[pos] & ((1 << (nbit + shift)) - 1)
            pos += 1
            if pos >= nbytes:
                raise ValueError("VICAR BASIC: out of data")
            v2 = (code[pos] >> (8 + shift)) & ((1 << (-shift)) - 1)
            bitptr = -shift
            return (v1 << (-shift)) + v2
        v = code[pos] & ((1 << nbit) - 1)
        pos += 1
        bitptr = 0
        return v

    run = -3
    nval = 0
    old = 0
    ptop = ns * wid
    for iw in range(wid):
        ip = iw
        while ip < ptop:
            if run > -3:
                buf[ip] = nval & 0xFF
                run -= 1
                ip += wid
                continue
            v = grab(3)
            if v < 7:
                nval = (old + v - 3) & 0xFFFFFFFF
                buf[ip] = nval & 0xFF
                old = nval
                ip += wid
                continue
            if grab(1):
                rc = grab(4)
                if rc == 15:
                    rc = grab(8)
                    if rc == 255:
                        rc = grab(8) | (grab(8) << 8) | (grab(8) << 16)
                    else:
                        rc += 15
                run = rc
                v = grab(3)
                nval = (old + v - 3) & 0xFFFFFFFF if v < 7 else grab(8)
                buf[ip] = nval & 0xFF
                old = nval
            else:
                v = grab(8)
                buf[ip] = v
                old = v
            ip += wid
    return buf


def _compressed_record_ranges(path: str, m: dict):
    """[(offset, size)] of each compressed line record (label-adjacent
    size table for BASIC2; self-chaining uint32 prefixes for BASIC)."""
    import struct

    n = m["height"] * m["bands"]
    out = []
    with open(path, "rb") as f:
        if m["compress"] == "BASIC2":
            f.seek(m["data_offset"])
            sizes = struct.unpack("<%dI" % n, f.read(4 * n))
            off = m["data_offset"] + 4 * n
            for s in sizes:
                out.append((off, s))
                off += s
        else:  # BASIC
            off = m["data_offset"]
            for _ in range(n):
                f.seek(off)
                s = struct.unpack("<I", f.read(4))[0]
                out.append((off + 4, s - 4))
                off += s
    return out


def read_vicar_array(path: str) -> np.ndarray:
    """Full decode of a VICAR file -> (h, w) or (h, w, bands)."""
    m = vicar_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h, nb = m["width"], m["height"], m["bands"]
    if m["compress"] in ("BASIC", "BASIC2"):
        recs = _compressed_record_ranges(path, m)
        out = np.empty((nb, h, w), dtype=dt.newbyteorder("="))
        with open(path, "rb") as f:
            for i, (off, size) in enumerate(recs):
                f.seek(off)
                raw = _basic_decode(f.read(size), w, dt.itemsize)
                line = np.frombuffer(bytes(raw),
                                     dtype="<" + m["wire_dtype"][-2:])
                out[i // h, i % h] = line
        return out[0] if nb == 1 else out.transpose(1, 2, 0)
    rec = m["recsize"]
    nbb = m["nbb"]
    with open(path, "rb") as f:
        f.seek(m["data_offset"])
        org = m["org"]
        if org in ("BSQ", "BIL"):
            nrec = h * nb
        else:  # BIP: one record per PIXEL (RECSIZE = NB * itemsize)
            nrec = h * w
        data = f.read(nrec * rec)
    raw = np.frombuffer(data, dtype=np.uint8).reshape(nrec, rec)[:, nbb:]
    if m["vax"]:
        vals = _vax_to_f4(np.ascontiguousarray(raw).view("<u4")).astype(
            np.float32)
        px = rec - nbb
        vals = vals.reshape(nrec, px // 4)
    else:
        vals = np.ascontiguousarray(raw).view(dt)
    if m["org"] == "BSQ":
        arr = vals.reshape(nb, h, w)
        arr = arr[0] if nb == 1 else arr.transpose(1, 2, 0)
    elif m["org"] == "BIL":
        arr = vals.reshape(h, nb, w)
        arr = arr[:, 0, :] if nb == 1 else arr.transpose(0, 2, 1)
    else:
        arr = vals.reshape(h, w, nb)
        arr = arr[:, :, 0] if nb == 1 else arr
    return np.ascontiguousarray(arr).astype(
        arr.dtype.newbyteorder("="), copy=False)


def read_vicar(path: str, *, rows_per_block: int = 1024):
    """-> Dataset of row-slab chunks (row0, n_rows, band, data:binary).
    Compressed files: the record table is resolved driver-side; each Ray
    task range-reads and decodes only its own line records."""
    import pyarrow as pa
    import ray.data as rd

    m = vicar_meta(path)
    dt = np.dtype(m["wire_dtype"])
    w, h, nb = m["width"], m["height"], m["bands"]
    recs = _compressed_record_ranges(path, m) \
        if m["compress"] in ("BASIC", "BASIC2") else None
    items = [{"row0": lo, "n_rows": min(rows_per_block, h - lo), "band": b}
             for lo in range(0, h, rows_per_block) for b in range(nb)]

    def load(t: pa.Table) -> pa.Table:
        rows = {"row0": [], "n_rows": [], "band": [], "data": []}
        with open(path, "rb") as f:
            for it in t.to_pylist():
                lo, n, b = it["row0"], it["n_rows"], it["band"]
                if recs is not None:
                    out = np.empty((n, w), dtype=dt.newbyteorder("="))
                    for k in range(n):
                        off, size = recs[b * h + lo + k]
                        f.seek(off)
                        raw = _basic_decode(f.read(size), w, dt.itemsize)
                        out[k] = np.frombuffer(
                            bytes(raw), dtype="<" + m["wire_dtype"][-2:])
                else:
                    rec = m["recsize"]
                    nbb = m["nbb"]
                    if m["org"] == "BSQ":
                        f.seek(m["data_offset"] + (b * h + lo) * rec)
                        raw = np.frombuffer(f.read(n * rec),
                                            np.uint8).reshape(n, rec)[:, nbb:]
                    elif m["org"] == "BIL":
                        out_l = []
                        for k in range(n):
                            f.seek(m["data_offset"]
                                   + ((lo + k) * nb + b) * rec + nbb)
                            out_l.append(f.read(rec - nbb))
                        raw = np.frombuffer(b"".join(out_l),
                                            np.uint8).reshape(n, rec - nbb)
                    else:  # BIP: one record per pixel
                        f.seek(m["data_offset"] + lo * w * rec)
                        full = np.frombuffer(f.read(n * w * rec),
                                             np.uint8).reshape(
                            n, w, rec)[:, :, nbb:]
                        raw = full.reshape(n, w, nb, dt.itemsize)[
                            :, :, b, :].reshape(n, w * dt.itemsize)
                    if m["vax"]:
                        out = _vax_to_f4(np.ascontiguousarray(raw).view(
                            "<u4")).astype(np.float32).reshape(n, -1)
                    else:
                        out = np.ascontiguousarray(raw).view(dt).astype(
                            dt.newbyteorder("="))
                rows["row0"].append(lo)
                rows["n_rows"].append(n)
                rows["band"].append(b)
                rows["data"].append(np.ascontiguousarray(out).tobytes())
        return pa.table({
            "row0": pa.array(rows["row0"], pa.int64()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "band": pa.array(rows["band"], pa.int64()),
            "data": pa.array(rows["data"], pa.binary()),
        })

    nbk = max(1, min(len(items), 32))
    return rd.from_items(items, override_num_blocks=nbk).map_batches(
        load, batch_format="pyarrow")
