"""Pure-numpy simple-features geometry: WKB codec + vectorized predicates.

Replaces the reference's OGRGeometry/GEOS stack (ogr/ogrgeometry.cpp,
ogr/ogr_wkb.cpp) for the subset this engine needs; geometry travels through
Ray Data pipelines as WKB binary columns, exactly like the reference's own
Arrow fast path tags columns ``ogc.wkb`` (ogr/ogrsf_frmts/generic/
ogrlayerarrow.cpp).
"""

from gdal_ray.geometry.wkb import (  # noqa: F401
    GeomType,
    decode_wkb,
    encode_point,
    encode_polygon,
    encode_multipolygon,
    polygon_rings,
)
from gdal_ray.geometry.predicates import (  # noqa: F401
    points_in_polygon,
    points_in_rings,
    polygon_area,
    ring_bbox,
    bbox_intersects,
)
