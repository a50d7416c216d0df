"""S-57 ENC (electronic nautical chart) vector driver —
ogr/ogrsf_frmts/s57 over sources/iso8211.py.

Wire facts (IHO S-57 edition 3.1): one 8211 file; DSPM carries the
COMF/SOMF coordinate/sounding divisors; vector records (VRID, RCNM
110=isolated node VI, 120=connected node VC, 130=edge VE) hold SG2D
(YCOO,XCOO signed b24 / COMF) or SG3D (+VE3D / SOMF) coordinate
arrays and VRPT pointers (edges reference their begin/end connected
nodes); feature records (FRID: OBJL object class, PRIM 1=P 2=L 3=A)
hold ATTF attributes (ATTL code, ATVL string) and FSPT spatial
pointers (5-byte NAME = RCNM+RCID, ORNT 2 = reversed, USAG 2 =
interior boundary).  Geometry assembly: points from node coords
(SOUNDG: one MultiPoint z per feature), lines by concatenating
begin-node + SG2D + end-node per edge (reversed per ORNT), areas by
chaining edges into closed rings (exterior/interior via USAG).

Layer names use the public IHO object catalogue acronyms (Appendix A)
for the common classes; unknown codes surface as ``OBJL_<code>``.
"""

from __future__ import annotations

import struct

import numpy as np

from gdal_ray.sources.iso8211 import ISO8211Reader

# IHO S-57 Appendix A object-class acronyms (public standard), subset
# Object-class acronyms regenerated verbatim from the reference catalogue
# (ogr/ogrsf_frmts/s57/data/s57objectclasses.csv, cols OBJL->Acronym);
# round-5 fix: codes 115-120 were shifted by one (115 RIVBNK .. 120 SPLARE)
# and 131/136-143/160-162 were missing or misnamed.
_OBJL = {0: "", 1: "ADMARE", 2: "AIRARE", 3: "ACHBRT", 4: "ACHARE", 
    5: "BCNCAR", 6: "BCNISD", 7: "BCNLAT", 8: "BCNSAW", 9: "BCNSPP", 
    10: "BERTHS", 11: "BRIDGE", 12: "BUISGL", 13: "BUAARE", 14: "BOYCAR", 
    15: "BOYINB", 16: "BOYISD", 17: "BOYLAT", 18: "BOYSAW", 19: "BOYSPP", 
    20: "CBLARE", 21: "CBLOHD", 22: "CBLSUB", 23: "CANALS", 24: "CANBNK", 
    25: "CTSARE", 26: "CAUSWY", 27: "CTNARE", 28: "CHKPNT", 29: "CGUSTA", 
    30: "COALNE", 31: "CONZNE", 32: "COSARE", 33: "CTRPNT", 34: "CONVYR", 
    35: "CRANES", 36: "CURENT", 37: "CUSZNE", 38: "DAMCON", 39: "DAYMAR", 
    40: "DWRTCL", 41: "DWRTPT", 42: "DEPARE", 43: "DEPCNT", 44: "DISMAR", 
    45: "DOCARE", 46: "DRGARE", 47: "DRYDOC", 48: "DMPGRD", 49: "DYKCON", 
    50: "EXEZNE", 51: "FAIRWY", 52: "FNCLNE", 53: "FERYRT", 54: "FSHZNE", 
    55: "FSHFAC", 56: "FSHGRD", 57: "FLODOC", 58: "FOGSIG", 59: "FORSTC", 
    60: "FRPARE", 61: "GATCON", 62: "GRIDRN", 63: "HRBARE", 64: "HRBFAC", 
    65: "HULKES", 66: "ICEARE", 67: "ICNARE", 68: "ISTZNE", 69: "LAKARE", 
    70: "LAKSHR", 71: "LNDARE", 72: "LNDELV", 73: "LNDRGN", 74: "LNDMRK", 
    75: "LIGHTS", 76: "LITFLT", 77: "LITVES", 78: "LOCMAG", 79: "LOKBSN", 
    80: "LOGPON", 81: "MAGVAR", 82: "MARCUL", 83: "MIPARE", 84: "MORFAC", 
    85: "NAVLNE", 86: "OBSTRN", 87: "OFSPLF", 88: "OSPARE", 89: "OILBAR", 
    90: "PILPNT", 91: "PILBOP", 92: "PIPARE", 93: "PIPOHD", 94: "PIPSOL", 
    95: "PONTON", 96: "PRCARE", 97: "PRDARE", 98: "PYLONS", 99: "RADLNE", 
    100: "RADRNG", 101: "RADRFL", 102: "RADSTA", 103: "RTPBCN", 
    104: "RDOCAL", 105: "RDOSTA", 106: "RAILWY", 107: "RAPIDS", 
    108: "RCRTCL", 109: "RECTRC", 110: "RCTLPT", 111: "RSCSTA", 
    112: "RESARE", 113: "RETRFL", 114: "RIVERS", 115: "RIVBNK", 
    116: "ROADWY", 117: "RUNWAY", 118: "SNDWAV", 119: "SEAARE", 
    120: "SPLARE", 121: "SBDARE", 122: "SLCONS", 123: "SISTAT", 
    124: "SISTAW", 125: "SILTNK", 126: "SLOTOP", 127: "SLOGRD", 
    128: "SMCFAC", 129: "SOUNDG", 130: "SPRING", 131: "SQUARE", 
    132: "STSLNE", 133: "SUBTLN", 134: "SWPARE", 135: "TESARE", 
    136: "TS_PRH", 137: "TS_PNH", 138: "TS_PAD", 139: "TS_TIS", 
    140: "T_HMON", 141: "T_NHMN", 142: "T_TIMS", 143: "TIDEWY", 
    144: "TOPMAR", 145: "TSELNE", 146: "TSSBND", 147: "TSSCRS", 
    148: "TSSLPT", 149: "TSSRON", 150: "TSEZNE", 151: "TUNNEL", 
    152: "TWRTPT", 153: "UWTROC", 154: "UNSARE", 155: "VEGATN", 
    156: "WATTUR", 157: "WATFAL", 158: "WEDKLP", 159: "WRECKS", 
    160: "TS_FEB", 161: "ARCSLN", 162: "ASLXIS", 163: "NEWOBJ", 
    300: "M_ACCY", 301: "M_CSCL", 302: "M_COVR", 303: "M_HDAT", 
    304: "M_HOPA", 305: "M_NPUB", 306: "M_NSYS", 307: "M_PROD", 
    308: "M_QUAL", 309: "M_SDAT", 310: "M_SREL", 311: "M_UNIT", 
    312: "M_VDAT", 400: "C_AGGR", 401: "C_ASSO", 402: "C_STAC", 
    500: "$AREAS", 501: "$LINES", 502: "$CSYMB", 503: "$COMPS", 
    504: "$TEXTS", 17000: "achbrt", 17001: "achare", 17002: "canbnk", 
    17003: "depare", 17004: "dismar", 17005: "resare", 17006: "rivbnk", 
    17007: "sistat", 17008: "sistaw", 17009: "topmar", 17010: "berths", 
    17011: "bridge", 17012: "cblohd", 17013: "feryrt", 17014: "hrbare", 
    17015: "hrbfac", 17016: "lokbsn", 17017: "rdocal", 17018: "m_nsys", 
    17050: "notmrk", 17051: "wtwaxs", 17052: "wtwprf", 17053: "brgare", 
    17054: "bunsta", 17055: "comare", 17056: "hrbbsn", 17057: "lokare", 
    17058: "lkbspt", 17059: "prtare", 17060: "bcnwtw", 17061: "boywtw", 
    17062: "refdmp", 17063: "rtplpt", 17064: "termnl", 17065: "trnbsn", 
    20484: "atsctl", 20485: "airres + catasr", 20486: "imgare", 
    20487: "bchext", 20488: "bchprf", 20489: "bchare", 20490: "bedare", 
    20491: "botmft + catbot", 20492: "centre", 20494: "histob", 
    20495: "ctlasp + catcas", 20496: "divloc", 20497: "watloc", 
    20498: "drpzne", 20499: "envare", 20500: "fshare", 20501: "iscour", 
    20502: "lngare", 20503: "lndplc", 20504: "lndpnt", 20505: "lndste", 
    20506: "lndstp", 20507: "lndzne", 20508: "marman + catmma", 
    20509: "msiare", 20510: "mcmare", 20511: "mexasp + catmea", 
    20513: "patare + catpat", 20514: "qroute", 20515: "rdoare", 
    20516: "regasp", 20517: "sedlay", 20518: "seiare", 20519: "senanm", 
    20520: "shlloc", 20521: "seddep", 20522: "trfare", 20523: "twlscr", 
    20524: "turnpt", 20525: "viewpt", 20526: "btdare", 20527: "bprare", 
    20528: "lsrare", 20529: "pfdare", 20530: "resloc", 20531: "rkdare", 
    20532: "navaid + CATROS", 20533: "intwtr", 20534: "seaice", 
    20535: "iceadv", 20536: "brgare", 20537: "lndice", 20538: "icelin", 
    20539: "icerte", 20540: "icepol", 20541: "icelea", 20542: "icebrg", 
    20543: "icemov", 20544: "tfcrte", 20717: "u_defd", 20718: "smalbo", 
    21484: "m_conf + catcnf", 21485: "m_clas", 21486: "m_vers", 
    21487: "m_line",}


def _wkb_point(x, y):
    return struct.pack("<BIdd", 1, 1, x, y)


def _wkb_linestring(coords):
    out = [struct.pack("<BII", 1, 2, len(coords))]
    for x, y in coords:
        out.append(struct.pack("<dd", x, y))
    return b"".join(out)


def _wkb_polygon(rings):
    out = [struct.pack("<BII", 1, 3, len(rings))]
    for ring in rings:
        out.append(struct.pack("<I", len(ring)))
        for x, y in ring:
            out.append(struct.pack("<dd", x, y))
    return b"".join(out)


def _wkb_multipoint_z(pts):
    out = [struct.pack("<BII", 1, 0x80000004, len(pts))]
    for x, y, z in pts:
        out.append(struct.pack("<BIddd", 1, 0x80000001, x, y, z))
    return b"".join(out)


class S57File:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.reader = ISO8211Reader(f.read())
        self.comf = 1.0
        self.somf = 1.0
        self.nodes = {}   # (rcnm, rcid) -> [(x, y)] or [(x, y, z)]
        self.edges = {}   # rcid -> {"coords": [...], "start": key,
        #                            "end": key}
        self.features = []
        self.dsid = None
        self._load()

    def _load(self):
        for rec in self.reader.records():
            if "DSPM" in rec:
                d = rec["DSPM"][0]
                self.comf = float((d.get("COMF") or [1])[0]) or 1.0
                self.somf = float((d.get("SOMF") or [1])[0]) or 1.0
            if "DSID" in rec:
                self.dsid = rec["DSID"][0]
            if "VRID" in rec:
                v = rec["VRID"][0]
                rcnm = (v.get("RCNM") or [0])[0]
                rcid = (v.get("RCID") or [0])[0]
                coords = []
                if "SG2D" in rec:
                    g = rec["SG2D"][0]
                    ys = g.get("YCOO") or []
                    xs = g.get("XCOO") or []
                    coords = [(x / self.comf, y / self.comf)
                              for x, y in zip(xs, ys)]
                elif "SG3D" in rec:
                    g = rec["SG3D"][0]
                    ys = g.get("YCOO") or []
                    xs = g.get("XCOO") or []
                    zs = g.get("VE3D") or []
                    coords = [(x / self.comf, y / self.comf,
                               z / self.somf)
                              for x, y, z in zip(xs, ys, zs)]
                if rcnm in (110, 120):  # VI / VC nodes
                    self.nodes[(rcnm, rcid)] = coords
                elif rcnm == 130:  # VE edge
                    start = end = None
                    if "VRPT" in rec:
                        p = rec["VRPT"][0]
                        names = p.get("NAME") or []
                        topis = p.get("TOPI") or []
                        for nm, topi in zip(names, topis):
                            key = (nm[0], int.from_bytes(nm[1:5],
                                                         "little"))
                            if topi == 1:      # begin node
                                start = key
                            elif topi == 2:    # end node
                                end = key
                    self.edges[rcid] = {"coords": coords,
                                        "start": start, "end": end}
            if "FRID" in rec:
                fr = rec["FRID"][0]
                attrs = {}
                if "ATTF" in rec:
                    a = rec["ATTF"][0]
                    for code, val in zip(a.get("ATTL") or [],
                                         a.get("ATVL") or []):
                        attrs[int(code)] = val.rstrip("\x7f")
                fspt = []
                if "FSPT" in rec:
                    p = rec["FSPT"][0]
                    for nm, ornt, usag in zip(p.get("NAME") or [],
                                              p.get("ORNT") or [],
                                              p.get("USAG") or []):
                        fspt.append(((nm[0], int.from_bytes(
                            nm[1:5], "little")), ornt, usag))
                self.features.append({
                    "objl": (fr.get("OBJL") or [0])[0],
                    "prim": (fr.get("PRIM") or [0])[0],
                    "rcid": (fr.get("RCID") or [0])[0],
                    "attrs": attrs, "fspt": fspt,
                })

    # --------------------------------------------------- geometry

    def _edge_coords(self, rcid, ornt):
        e = self.edges.get(rcid)
        if e is None:
            return []
        pts = []
        if e["start"] and e["start"] in self.nodes:
            n = self.nodes[e["start"]]
            if n:
                pts.append(n[0][:2])
        pts.extend(c[:2] for c in e["coords"])
        if e["end"] and e["end"] in self.nodes:
            n = self.nodes[e["end"]]
            if n:
                pts.append(n[0][:2])
        if ornt == 2:
            pts = pts[::-1]
        return pts

    def geometry_wkb(self, feat):
        prim = feat["prim"]
        if prim == 1:  # point
            for key, _, _ in feat["fspt"]:
                node = self.nodes.get(key)
                if node:
                    if len(node[0]) == 3 or len(node) > 1:
                        return _wkb_multipoint_z(
                            [(c[0], c[1],
                              c[2] if len(c) > 2 else 0.0)
                             for c in node])
                    return _wkb_point(*node[0][:2])
            return None
        if prim == 2:  # line: concatenate edges
            coords = []
            for key, ornt, _ in feat["fspt"]:
                if key[0] != 130:
                    continue
                pts = self._edge_coords(key[1], ornt)
                if coords and pts and coords[-1] == pts[0]:
                    coords.extend(pts[1:])
                else:
                    coords.extend(pts)
            return _wkb_linestring(coords) if len(coords) >= 2 else None
        if prim == 3:  # area: chain edges into rings by usage
            ext, interiors = [], []
            cur = []
            cur_usag = None
            for key, ornt, usag in feat["fspt"]:
                if key[0] != 130:
                    continue
                pts = self._edge_coords(key[1], ornt)
                if not pts:
                    continue
                if cur and cur[-1] == pts[0]:
                    cur.extend(pts[1:])
                else:
                    if cur:
                        (ext if cur_usag != 2 else interiors).append(cur)
                    cur = list(pts)
                    cur_usag = usag
                if cur[0] == cur[-1] and len(cur) >= 4:
                    (ext if cur_usag != 2 else interiors).append(cur)
                    cur = []
            if cur:
                (ext if cur_usag != 2 else interiors).append(cur)
            rings = ext + interiors
            rings = [r if r[0] == r[-1] else r + [r[0]] for r in rings
                     if len(r) >= 3]
            return _wkb_polygon(rings) if rings else None
        return None


def s57_layers(path: str) -> dict:
    """-> {layer_name: [ {fid, wkb, attrs...} ]}, DSID first."""
    f = S57File(path)
    layers: dict = {}
    if f.dsid is not None:
        layers["DSID"] = [{"fid": 0, "wkb": None,
                           "dsnm": (f.dsid.get("DSNM") or [""])[0]}]
    for feat in f.features:
        name = _OBJL.get(feat["objl"], f"OBJL_{feat['objl']}")
        wkb = f.geometry_wkb(feat)
        layers.setdefault(name, []).append({
            "fid": feat["rcid"], "wkb": wkb,
            **{f"a{k}": v for k, v in feat["attrs"].items()},
        })
    return layers


def s57_meta(path: str) -> dict:
    layers = s57_layers(path)
    return {
        "driver": "S57",
        "n_layers": len(layers),
        "layers": [{"name": k, "n_features": len(v)}
                   for k, v in layers.items()],
    }


def read_s57(path: str, layer: str | None = None):
    """-> Dataset of feature rows (layer, fid, wkb)."""
    import pyarrow as pa
    import ray.data as rd

    layers = s57_layers(path)
    rows = []
    for name, feats in layers.items():
        if layer and name != layer:
            continue
        for ft in feats:
            rows.append({"layer": name, "fid": ft["fid"],
                         "wkb": ft["wkb"] or b""})
    return rd.from_items(rows)
