"""CSV-with-WKT vector source + sink — the OGR CSV driver's geometry mode
(ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp, `GEOMETRY=AS_WKT`: a `WKT` column
carries the geometry, every other column is an attribute).

Reads lower the WKT column to the engine's WKB geometry column via
`geometry/wkt.py`; writes render WKB back to a WKT column and stream
through `Dataset.write_csv` (one part per block — the native Ray sink
already gives partitioned, resumable output)."""

from __future__ import annotations

import pyarrow as pa

from gdal_ray.geometry.wkt import wkb_to_wkt, wkt_to_wkb


def read_csv_wkt(paths, wkt_col: str = "WKT"):
    """CSV file(s) with a WKT geometry column -> Dataset with `wkb`."""
    import ray.data

    def conv(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            names = [c for c in b.column_names if c != wkt_col]
            return pa.schema([("wkb", pa.binary())]
                             + [(n, b.schema.field(n).type) for n in names]).empty_table()
        wkb = pa.array([wkt_to_wkb(v) for v in b.column(wkt_col).to_pylist()],
                       pa.binary())
        out = b.drop_columns([wkt_col])
        return out.add_column(0, "wkb", wkb)

    return ray.data.read_csv(paths).map_batches(conv, batch_format="pyarrow")


def write_csv_wkt(ds, out_dir: str, *, geometry_col: str = "wkb",
                  wkt_col: str = "WKT") -> None:
    """Dataset with a WKB column -> partitioned CSV with a WKT column."""
    def conv(b: pa.Table) -> pa.Table:
        wkt = pa.array([wkb_to_wkt(v) for v in b.column(geometry_col).to_pylist()],
                       pa.string())
        out = b.drop_columns([geometry_col])
        return out.add_column(0, wkt_col, wkt)

    ds.map_batches(conv, batch_format="pyarrow").write_csv(out_dir)
