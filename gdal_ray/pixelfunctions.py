"""VRT pixel functions: per-pixel band-combination kernels with a
user-extensible registry.

Reference semantics: frmts/vrt/vrtderivedrasterband.cpp (derived bands
evaluate a named pixel function over source bands; users register their
own — including Python ones — via GDALAddDerivedBandPixelFunc) and the
builtin set in frmts/vrt/pixelfunctions.cpp.  Real-valued builtins are
implemented as vectorized numpy kernels over a list of band arrays;
complex-domain functions (real/imag/phase/conj/cmul) are gated — the
image tables here carry no complex rasters.

`apply_pixel_function(name, bands, **kwargs)` evaluates one kernel;
`register_pixel_function(name)` adds a user kernel (the extension hook);
the `pixfun` step in gdal_ray.pipeline exposes the registry to the
`!`-chained pipeline grammar.
"""

from __future__ import annotations

import numpy as np

_PIXFUNCS: dict[str, object] = {}

_COMPLEX_ONLY = ("real", "imag", "complex", "phase", "conj", "cmul",
                 "intensity", "mod")


def register_pixel_function(name: str):
    """GDALAddDerivedBandPixelFunc analogue."""
    def deco(fn):
        _PIXFUNCS[name] = fn
        return fn
    return deco


def pixel_function_names() -> list[str]:
    return sorted(_PIXFUNCS)


def apply_pixel_function(name: str, bands, **kwargs) -> np.ndarray:
    if name in _COMPLEX_ONLY:
        raise NotImplementedError(
            f"pixel function {name!r} operates on complex rasters "
            "(pixelfunctions.cpp); no complex band sources exist here")
    if name not in _PIXFUNCS:
        raise ValueError(
            f"unknown pixel function {name!r}; known: {', '.join(pixel_function_names())}")
    arrs = [np.asarray(b, dtype=np.float64) for b in bands]
    if not arrs:
        raise ValueError("pixel function needs at least one source band")
    return _PIXFUNCS[name](arrs, **kwargs)


def _need(arrs, n, name):
    if len(arrs) != n:
        raise ValueError(f"{name} needs exactly {n} source bands, got {len(arrs)}")


@register_pixel_function("sum")
def _sum(arrs, k: float = 0.0):
    out = np.full_like(arrs[0], k)
    for a in arrs:
        out += a
    return out


@register_pixel_function("diff")
def _diff(arrs):
    _need(arrs, 2, "diff")
    return arrs[0] - arrs[1]


@register_pixel_function("mul")
def _mul(arrs, k: float = 1.0):
    out = np.full_like(arrs[0], k)
    for a in arrs:
        out *= a
    return out


@register_pixel_function("div")
def _div(arrs):
    _need(arrs, 2, "div")
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(arrs[1] != 0, arrs[0] / arrs[1], 0.0)


@register_pixel_function("inv")
def _inv(arrs, k: float = 1.0):
    _need(arrs, 1, "inv")
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(arrs[0] != 0, k / arrs[0], 0.0)


@register_pixel_function("sqrt")
def _sqrt(arrs):
    _need(arrs, 1, "sqrt")
    return np.sqrt(np.maximum(arrs[0], 0.0))


@register_pixel_function("log10")
def _log10(arrs):
    _need(arrs, 1, "log10")
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(arrs[0] > 0, np.log10(np.maximum(arrs[0], 1e-300)), 0.0)


@register_pixel_function("dB")
def _db(arrs, fact: float = 20.0):
    _need(arrs, 1, "dB")
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(arrs[0] > 0,
                        fact * np.log10(np.maximum(arrs[0], 1e-300)), 0.0)


@register_pixel_function("dB2amp")
def _db2amp(arrs):
    _need(arrs, 1, "dB2amp")
    return 10.0 ** (arrs[0] / 20.0)


@register_pixel_function("dB2pow")
def _db2pow(arrs):
    _need(arrs, 1, "dB2pow")
    return 10.0 ** (arrs[0] / 10.0)


@register_pixel_function("pow")
def _pow(arrs, power: float = 1.0):
    _need(arrs, 1, "pow")
    return np.sign(arrs[0]) * np.abs(arrs[0]) ** power


@register_pixel_function("scale")
def _scale(arrs, offset: float = 0.0, scale: float = 1.0):
    _need(arrs, 1, "scale")
    return arrs[0] * scale + offset


@register_pixel_function("norm_diff")
def _norm_diff(arrs):
    """(A - B) / (A + B) — the NDVI shape (pixelfunctions.cpp NormDiff)."""
    _need(arrs, 2, "norm_diff")
    den = arrs[0] + arrs[1]
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(den != 0, (arrs[0] - arrs[1]) / den, 0.0)


@register_pixel_function("min")
def _min(arrs):
    out = arrs[0]
    for a in arrs[1:]:
        out = np.minimum(out, a)
    return out


@register_pixel_function("max")
def _max(arrs):
    out = arrs[0]
    for a in arrs[1:]:
        out = np.maximum(out, a)
    return out


@register_pixel_function("mean")
def _mean(arrs):
    return _sum(arrs) / len(arrs)


@register_pixel_function("replace_nodata")
def _replace_nodata(arrs, to: float = 0.0, nodata: float = 0.0):
    _need(arrs, 1, "replace_nodata")
    return np.where(arrs[0] == nodata, to, arrs[0])


@register_pixel_function("interpolate_linear")
def _interpolate_linear(arrs, t0: float = 0.0, dt: float = 1.0, t: float = 0.0):
    """Linear interpolation between successive bands at time t
    (pixelfunctions.cpp InterpolateLinear: bands are samples at
    t0, t0+dt, ...)."""
    if len(arrs) < 2:
        raise ValueError("interpolate_linear needs >= 2 source bands")
    pos = (t - t0) / dt
    i0 = int(np.clip(np.floor(pos), 0, len(arrs) - 2))
    frac = pos - i0
    return arrs[i0] * (1.0 - frac) + arrs[i0 + 1] * frac


# ----------------------------------------------------------- gdal_calc door

_CALC_FUNCS = {
    "sqrt": np.sqrt, "log": np.log, "log10": np.log10, "exp": np.exp,
    "abs": np.abs, "minimum": np.minimum, "maximum": np.maximum,
    "where": np.where, "floor": np.floor, "ceil": np.ceil,
    "sin": np.sin, "cos": np.cos, "tan": np.tan, "power": np.power,
    "clip": np.clip,
}


def eval_calc_expression(expr: str, bands: dict) -> np.ndarray:
    """Safe numpy expression evaluator for gdal_calc-style band math
    (apps/gdal_calc.py semantics: named input letters, numpy ufuncs,
    arithmetic/comparison operators).  Parses with `ast` and permits
    ONLY literals, band names, the whitelisted functions above, and
    arithmetic / comparison / boolean-array operators — no attribute
    access, no subscripts of non-bands, no calls outside the whitelist."""
    import ast

    allowed_ops = (ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv,
                   ast.Mod, ast.Pow, ast.USub, ast.UAdd,
                   ast.BitAnd, ast.BitOr, ast.BitXor, ast.Invert,
                   ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE)

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Constant) and isinstance(
                node.value, (int, float)):
            return node.value
        if isinstance(node, ast.Name):
            if node.id in bands:
                return bands[node.id]
            raise ValueError(f"unknown band {node.id!r}")
        if isinstance(node, ast.BinOp) and isinstance(node.op, allowed_ops):
            return _APPLY[type(node.op)](ev(node.left), ev(node.right))
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, allowed_ops):
            return _APPLY[type(node.op)](ev(node.operand))
        if isinstance(node, ast.Compare) and len(node.ops) == 1 \
                and isinstance(node.ops[0], allowed_ops):
            return _APPLY[type(node.ops[0])](ev(node.left),
                                             ev(node.comparators[0]))
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name) \
                and node.func.id in _CALC_FUNCS and not node.keywords:
            return _CALC_FUNCS[node.func.id](*[ev(a) for a in node.args])
        raise ValueError(f"disallowed syntax in calc expression: "
                         f"{ast.dump(node)[:80]}")

    import operator as op
    global _APPLY
    _APPLY = {
        ast.Add: op.add, ast.Sub: op.sub, ast.Mult: op.mul,
        ast.Div: op.truediv, ast.FloorDiv: op.floordiv, ast.Mod: op.mod,
        ast.Pow: op.pow, ast.USub: op.neg, ast.UAdd: op.pos,
        ast.BitAnd: op.and_, ast.BitOr: op.or_, ast.BitXor: op.xor,
        ast.Invert: op.invert,
        ast.Eq: op.eq, ast.NotEq: op.ne, ast.Lt: op.lt, ast.LtE: op.le,
        ast.Gt: op.gt, ast.GtE: op.ge,
    }
    return ev(ast.parse(expr, mode="eval"))
