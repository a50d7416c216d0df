"""Minimal ISO/IEC 8211 (DDF) reader — the container under ADRG/ASRP/
USRP and S-57 (frmts/iso8211 in the reference).

Wire facts: every record opens with a 24-byte leader (record length
@0:5, leader id @6, field-area base address @12:17, entry map @20:24 =
sizes of the directory's length/position/reserved/tag columns), then a
directory of (tag, field length, field position) entries terminated by
FT (0x1E), then the field area (fields FT-terminated, subfields
UT-separated, 0x1F).  The first record (DDR, leader id 'L') describes
every field: field-control string + field name, the '!'-separated
subfield labels (a leading '*' marks a repeating group), and the
format string (``(A(3),I(4),2R(5),B(16),...)`` with repetition
multipliers).  Data records decode their fields by applying the DDR
formats over fixed-width slices.
"""

from __future__ import annotations

import re

FT = 0x1E
UT = 0x1F


def _parse_formats(fmt: str):
    """'(A(3),2I(4),...)' -> list of (type_char, width) expanded."""
    fmt = fmt.strip()
    if fmt.startswith("("):
        fmt = fmt[1:]
    if fmt.endswith(")"):
        fmt = fmt[:-1]
    out = []
    for part in re.split(r",", fmt):
        part = part.strip()
        if not part:
            continue
        m = re.match(r"(\d*)([AIRSCBb])\(?(\d*)\)?(.*)$", part)
        if not m:
            continue
        rep = int(m.group(1)) if m.group(1) else 1
        t = m.group(2)
        width = int(m.group(3)) if m.group(3) else None
        if t == "b":  # binary subtypes like b11, b12, b14
            sub = m.group(3) or "11"
            width = {"11": 1, "12": 2, "14": 4,
                     "21": 1, "22": 2, "24": 4}.get(sub, 1)
            t = "b" + sub
        elif t == "B" and width is not None:
            width = width // 8  # B(n) widths are in BITS
        for _ in range(rep):
            out.append((t, width))
    return out


class DDFField:
    __slots__ = ("tag", "name", "labels", "formats", "repeating")

    def __init__(self, tag, name, labels, formats, repeating):
        self.tag = tag
        self.name = name
        self.labels = labels
        self.formats = formats
        self.repeating = repeating


def _leader(buf, off):
    reclen = int(buf[off:off + 5])
    base = int(buf[off + 12:off + 17])
    sz_len = int(chr(buf[off + 20]))
    sz_pos = int(chr(buf[off + 21]))
    sz_tag = int(chr(buf[off + 23]))
    return reclen, base, sz_len, sz_pos, sz_tag


def _directory(buf, off, base, sz_len, sz_pos, sz_tag):
    p = off + 24
    entries = []
    end = off + base - 1  # directory ends with FT at base-1
    entry = sz_tag + sz_len + sz_pos
    while p + entry <= end:
        tag = buf[p:p + sz_tag].decode("latin-1")
        ln = int(buf[p + sz_tag:p + sz_tag + sz_len])
        pos = int(buf[p + sz_tag + sz_len:p + entry])
        entries.append((tag, ln, pos))
        p += entry
    return entries


class ISO8211Reader:
    def __init__(self, data: bytes):
        self.buf = data
        self.fields: dict = {}
        reclen, base, sl, sp, st = _leader(data, 0)
        for tag, ln, pos in _directory(data, 0, base, sl, sp, st):
            raw = data[base + pos:base + pos + ln]
            parts = raw.rstrip(bytes([FT])).split(bytes([UT]))
            name = parts[0].decode("latin-1") if parts else ""
            # strip the leading field-control characters (digits, ';&')
            name = re.sub(r"^[0-9;&\- ]*", "", name)
            labels = []
            repeating = False
            if len(parts) > 1:
                lab = parts[1].decode("latin-1")
                if lab.startswith("*"):
                    repeating = True
                    lab = lab[1:]
                labels = [s for s in lab.split("!") if s]
            formats = _parse_formats(parts[2].decode("latin-1")) \
                if len(parts) > 2 else []
            self.fields[tag] = DDFField(tag, name, labels, formats,
                                        repeating)
        self._first_dr = reclen

    def records(self):
        """Yield decoded data records: {tag: {label: [values...]}} plus
        '_raw' bytes per field."""
        buf = self.buf
        off = self._first_dr
        while off + 24 <= len(buf):
            try:
                reclen, base, sl, sp, st = _leader(buf, off)
            except ValueError:
                break
            rec: dict = {}
            for tag, ln, pos in _directory(buf, off, base, sl, sp, st):
                raw = buf[off + base + pos:off + base + pos + ln]
                raw = raw.rstrip(bytes([FT]))
                rec.setdefault(tag, []).append(self._decode_field(tag, raw))
            yield rec
            off += reclen

    def _decode_field(self, tag, raw: bytes):
        defn = self.fields.get(tag)
        out = {"_raw": raw}
        if defn is None or not defn.formats:
            return out
        vals: dict = {}
        p = 0
        labels = defn.labels or [f"f{i}" for i in
                                 range(len(defn.formats))]
        nf = max(1, len(defn.formats))
        idx = 0
        while p < len(raw):
            t, width = defn.formats[idx % nf]
            label = labels[idx % len(labels)] if labels else f"f{idx}"
            if width is None:  # delimited value
                q = raw.find(bytes([UT]), p)
                if q < 0:
                    q = len(raw)
                chunk = raw[p:q]
                p = q + 1
            else:
                chunk = raw[p:p + width]
                p += width
            if t.startswith("b"):
                v = int.from_bytes(chunk, "little",
                                   signed=t.startswith("b2"))
            elif t == "A" or t == "C":
                v = chunk.decode("latin-1")
            elif t == "I":
                s = chunk.decode("latin-1").strip()
                v = int(s) if s and s.lstrip("+-").isdigit() else 0
            elif t in ("R", "S"):
                try:
                    v = float(chunk)
                except ValueError:
                    v = 0.0
            else:
                v = chunk
            vals.setdefault(label, []).append(v)
            idx += 1
            if not defn.repeating and idx >= len(defn.formats) \
                    and p < len(raw) and len(defn.labels) == \
                    len(defn.formats):
                # non-repeating field fully consumed; ignore padding
                if idx >= nf:
                    break
        out.update(vals)
        return out
