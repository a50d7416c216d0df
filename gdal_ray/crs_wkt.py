"""OGC WKT1 coordinate-system strings: parse -> proj-string params and
emit for the engine's supported CRS family.

The reference parses/exports WKT through OGRSpatialReference
(ogr/ogrspatialreference.cpp, importFromWkt/exportToWkt); here a small
recursive-descent parser maps WKT1 nodes to the crs.py `+proj=` front
end, so any WKT1 whose PROJECTION is in the supported family can feed
`transform_fn` — including .prj sidecar files next to shapefiles.

Supported both ways: GEOGCS (longlat), Transverse_Mercator (incl. the
UTM family), Mercator_1SP / web Mercator, Lambert_Conformal_Conic_2SP
and 1SP, Polar_Stereographic, Albers_Conic_Equal_Area,
Lambert_Azimuthal_Equal_Area, Sinusoidal, Mollweide, Equirectangular,
Cylindrical_Equal_Area, Robinson, and the ellipsoids WGS84 / GRS80 /
Bessel / sphere (SPHEROID gives a, 1/f explicitly, so any ellipsoid
parses).
"""

from __future__ import annotations


class WktNode:
    __slots__ = ("name", "values")

    def __init__(self, name, values):
        self.name = name
        self.values = values

    def children(self, name: str):
        return [v for v in self.values
                if isinstance(v, WktNode) and v.name.upper() == name.upper()]

    def child(self, name: str):
        c = self.children(name)
        return c[0] if c else None

    def strings(self):
        return [v for v in self.values if isinstance(v, str)]

    def numbers(self):
        return [v for v in self.values if isinstance(v, float)]


def parse_wkt(s: str) -> WktNode:
    """WKT1 text -> node tree.  Grammar: NAME[ value (, value)* ] where a
    value is a quoted string, a number, or a nested node."""
    pos = 0
    n = len(s)

    def skip_ws():
        nonlocal pos
        while pos < n and s[pos] in " \t\r\n":
            pos += 1

    def parse_node():
        nonlocal pos
        skip_ws()
        start = pos
        while pos < n and (s[pos].isalnum() or s[pos] in "_-"):
            pos += 1
        name = s[start:pos]
        skip_ws()
        if pos >= n or s[pos] not in "[(":
            raise ValueError(f"WKT: expected '[' after {name!r}")
        pos += 1
        values = []
        while True:
            skip_ws()
            if pos >= n:
                raise ValueError("WKT: unterminated node")
            c = s[pos]
            if c in "])":
                pos += 1
                break
            if c == ",":
                pos += 1
                continue
            if c == '"':
                pos += 1
                st = pos
                while pos < n and s[pos] != '"':
                    pos += 1
                values.append(s[st:pos])
                pos += 1
            elif c.isalpha():
                values.append(parse_node())
            else:
                st = pos
                while pos < n and s[pos] not in ",])":
                    pos += 1
                values.append(float(s[st:pos].strip()))
        return WktNode(name, values)

    node = parse_node()
    return node


_PROJECTION_MAP = {
    "TRANSVERSE_MERCATOR": "tmerc",
    "MERCATOR_1SP": "merc",
    "MERCATOR_AUXILIARY_SPHERE": "webmerc",
    "POPULAR_VISUALISATION_PSEUDO_MERCATOR": "webmerc",
    "LAMBERT_CONFORMAL_CONIC_2SP": "lcc",
    "LAMBERT_CONFORMAL_CONIC": "lcc",
    "LAMBERT_CONFORMAL_CONIC_1SP": "lcc",
    "POLAR_STEREOGRAPHIC": "stere",
    "ALBERS_CONIC_EQUAL_AREA": "aea",
    "LAMBERT_AZIMUTHAL_EQUAL_AREA": "laea",
    "SINUSOIDAL": "sinu",
    "MOLLWEIDE": "moll",
    "EQUIRECTANGULAR": "eqc",
    "CYLINDRICAL_EQUAL_AREA": "cea",
    "ROBINSON": "robin",
    "CASSINI_SOLDNER": "cass",
    "OBLIQUE_STEREOGRAPHIC": "sterea",
}

_PARAM_MAP = {
    "LATITUDE_OF_ORIGIN": "lat_0",
    "LATITUDE_OF_CENTER": "lat_0",
    "CENTRAL_MERIDIAN": "lon_0",
    "LONGITUDE_OF_CENTER": "lon_0",
    "SCALE_FACTOR": "k",
    "FALSE_EASTING": "x_0",
    "FALSE_NORTHING": "y_0",
    "STANDARD_PARALLEL_1": "lat_1",
    "STANDARD_PARALLEL_2": "lat_2",
}


def wkt_to_proj(wkt: str) -> str:
    """WKT1 -> '+proj=…' string consumable by crs.proj_pair."""
    root = parse_wkt(wkt)
    name = root.name.upper()
    if name == "GEOGCS":
        a, rf = _spheroid(root)
        return f"+proj=longlat +a={a:.17g} +rf={rf:.17g}" if rf else \
            f"+proj=longlat +R={a:.17g}"
    if name != "PROJCS":
        raise NotImplementedError(f"WKT root {root.name!r}")
    geog = root.child("GEOGCS")
    if geog is None:
        raise ValueError("PROJCS without GEOGCS")
    a, rf = _spheroid(geog)
    projn = root.child("PROJECTION")
    if projn is None:
        raise ValueError("PROJCS without PROJECTION")
    method = projn.strings()[0].upper() if projn.strings() else \
        projn.name.upper()
    proj = _PROJECTION_MAP.get(method)
    if proj is None:
        raise NotImplementedError(f"WKT projection {method!r}")
    params = {}
    for p in root.children("PARAMETER"):
        key = p.strings()[0].upper()
        if key in _PARAM_MAP and p.numbers():
            params[_PARAM_MAP[key]] = p.numbers()[0]
    # UTM detection: tmerc with k=0.9996, lat_0=0, x_0=500000
    parts = [f"+proj={proj}"]
    for k, v in params.items():
        parts.append(f"+{k}={v:.17g}")
    if rf:
        parts.append(f"+a={a:.17g} +rf={rf:.17g}")
    else:
        parts.append(f"+R={a:.17g}")
    return " ".join(parts)


def _spheroid(geogcs: WktNode) -> tuple[float, float]:
    datum = geogcs.child("DATUM")
    sph = datum.child("SPHEROID") if datum else None
    if sph is None:
        sph = geogcs.child("SPHEROID")
    if sph is None:
        raise ValueError("WKT: no SPHEROID")
    nums = sph.numbers()
    a = nums[0]
    rf = nums[1] if len(nums) > 1 else 0.0
    return a, rf


# ---------------------------------------------------------------------------
# emit

_WGS84_GEOGCS = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]]'
)


def _projcs(name: str, method: str, params: list, epsg: int | None) -> str:
    ps = ",".join(f'PARAMETER["{k}",{v:.12g}]' for k, v in params)
    auth = f',AUTHORITY["EPSG","{epsg}"]' if epsg else ""
    return (f'PROJCS["{name}",{_WGS84_GEOGCS},PROJECTION["{method}"],{ps},'
            f'UNIT["metre",1]{auth}]')


def epsg_to_wkt(epsg: int) -> str:
    """WKT1 for the engine's common WGS84-based codes."""
    if epsg == 4326:
        return _WGS84_GEOGCS
    if epsg == 3857:
        return _projcs(
            "WGS 84 / Pseudo-Mercator", "Mercator_1SP",
            [("central_meridian", 0), ("scale_factor", 1),
             ("false_easting", 0), ("false_northing", 0)], 3857)
    if 32601 <= epsg <= 32660 or 32701 <= epsg <= 32760:
        zone = epsg % 100
        south = epsg >= 32700
        return _projcs(
            f"WGS 84 / UTM zone {zone}{'S' if south else 'N'}",
            "Transverse_Mercator",
            [("latitude_of_origin", 0),
             ("central_meridian", -183 + 6 * zone),
             ("scale_factor", 0.9996), ("false_easting", 500000),
             ("false_northing", 10000000 if south else 0)], epsg)
    raise NotImplementedError(f"epsg_to_wkt({epsg}) — emit covers "
                              "4326/3857/UTM; parse covers far more")


def wkt_pair(wkt: str):
    """WKT1 -> (fwd, inv) transform functions via the proj front end."""
    from gdal_ray.crs import proj_pair

    return proj_pair(wkt_to_proj(wkt))
