"""Layer algebra — OGRLayer::Union / Identity / Erase / SymDifference
(ogr/ogrsf_frmts/generic/ogrlayer.cpp:3763,4300,4730) re-expressed
Ray-Data-first.

The reference runs a nested loop per A-feature over the B-features whose
bboxes intersect it (a prepared-geometry filter), emitting up to three
feature classes:

  both    a ∩ b            (attrs of both)         Union, Identity
  a_only  a \\ (∪ matching b)  (B attrs null)      Union, Identity, Erase, SymDifference
  b_only  b \\ (∪ matching a)  (A attrs null)      Union, SymDifference

Distributed shape: B is the SMALL side, broadcast once per actor via
``ray.put``; the big A side streams through ``map_batches``.  "both" and
"a_only" rows are emitted locally per batch (each A feature is whole in
its batch).  "b_only" residuals need the sum of piece areas per B feature
across ALL A batches — a partial-combinable aggregate: zero rows for every
B feature union'd with the per-pair pieces, then one small
``grouped_aggregate`` shuffle keyed by ``b_id``.

Exactness contract (round 5 — no remaining disjointness caveats): the
pieces stage OWNS a_only exactness — it sees every matching B per A
feature locally, so it can union the B pieces geometrically or apply
inclusion–exclusion for overlapping B (queries._UnionPiecesOverlap:
strictly-pairwise box overlaps handled with one exact correction term;
oracle-verified).  The b_only residual is ``area(b) − Σ 'both' pieces
+ Σ 'b_corr' corrections``: a pieces stage whose A features overlap
emits hidden ``b_corr`` rows carrying the NEGATIVE pairwise
inclusion–exclusion term area(aᵢ∩aⱼ∩b) (queries._UnionPiecesOverlapA;
ownership of each A-pair is deterministic, so the term is emitted
exactly once regardless of batch boundaries) — exact for
strictly-pairwise A overlaps, the same order the B-side lift covers.
The per-pair piece areas come from the caller's clip kernel (convex
S–H clip or the ear-clip triangle machinery in geometry/ops.py), so
concave A features work wherever that kernel does."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CLASSES = {
    "union": ("both", "a_only", "b_only"),
    "identity": ("both", "a_only"),
    "erase": ("a_only",),
    "symdifference": ("a_only", "b_only"),
}

_SCHEMA = pa.schema(
    [("a_id", pa.int64()), ("b_id", pa.string()),
     ("cls", pa.string()), ("area2_u", pa.int64())]
)

# OGR emits NULL for the absent side's attributes; we use sentinels instead
# so results hash identically across engines (pandas silently converts
# int64-with-null to float64 NaN, which breaks value-hash comparison)
A_NULL = -1
B_NULL = ""


def _rows(a_ids, b_ids, cls, areas) -> pa.Table:
    return pa.table(
        {"a_id": pa.array(a_ids, pa.int64()), "b_id": pa.array(b_ids, pa.string()),
         "cls": pa.array([cls] * len(areas), pa.string()),
         "area2_u": pa.array(areas, pa.int64())},
        schema=_SCHEMA,
    )


def layer_algebra(ds_a, pieces_cls, b_ids: list, b_areas2: np.ndarray, op: str,
                  *, fn_constructor_kwargs=None, concurrency=(1, 4)):
    """Generic plan: ``pieces_cls`` is a callable-class map_batches stage
    turning an A batch into (a_id, b_id, cls='both'|'a_only', area2_u)
    rows per the contract above.  ``b_ids``/``b_areas2`` describe the
    broadcast B side (for b_only residuals).  Returns a Dataset with
    columns (a_id, b_id, cls, area2_u); class set depends on ``op``."""
    import ray.data as rd

    from gdal_ray.stages.agg import grouped_aggregate

    if op not in _CLASSES:
        raise ValueError(f"unknown layer-algebra op {op!r}")
    want = _CLASSES[op]

    pieces = ds_a.map_batches(
        pieces_cls, fn_constructor_kwargs=fn_constructor_kwargs or {},
        batch_format="pyarrow", concurrency=concurrency,
    )
    keep = [c for c in ("both", "a_only") if c in want]
    # always filter: hidden 'b_corr' correction rows (overlapping-A
    # pieces stages) must never reach the visible output
    out = pieces.filter(expr=" or ".join(f"cls == '{c}'" for c in keep))
    if "b_only" not in want:
        return out

    # b_only residual: area2(b) − Σ piece areas (+ the negative 'b_corr'
    # inclusion–exclusion rows from overlapping-A stages), via zero-row
    # union so B features that intersect nothing still surface
    zero = pa.table(
        {"b_id": pa.array(b_ids, pa.string()),
         "area2_u": pa.array(np.zeros(len(b_ids), np.int64), pa.int64())}
    )
    inter_by_b = pieces.filter(
        expr="cls == 'both' or cls == 'b_corr'"
    ).select_columns(["b_id", "area2_u"])
    sums = grouped_aggregate(
        rd.from_arrow(zero).union(inter_by_b), ["b_id"],
        [("area2_u", "sum", "inter2")],
    )
    lut = {b: int(a) for b, a in zip(b_ids, b_areas2)}

    def residual(t: pa.Table) -> pa.Table:
        ids = t.column("b_id").to_pylist()
        res = np.array([lut[b] for b in ids], np.int64) - t.column("inter2").to_numpy()
        sel = np.nonzero(res > 0)[0]
        return _rows([A_NULL] * len(sel), [ids[i] for i in sel], "b_only", res[sel])

    return out.union(sums.map_batches(residual, batch_format="pyarrow"))
