"""Minimal SQL engine over ray.data.Dataset — the swq subset.

The reference parses and evaluates an SQL dialect in ogr/swq_expr_node.cpp
(ops: ogr/ogr_swq.h:44-58 — AND/OR/NOT, comparisons, LIKE, IN, BETWEEN,
IS NULL, CONCAT, SUBSTR, CAST, arithmetic) and executes SELECT with
aggregates/GROUP BY/ORDER BY/LIMIT in ogr_gensql.cpp.  This module is the
Ray-Data-native equivalent: a hand-written tokenizer + recursive-descent
parser producing an expression tree, compiled to vectorized
pyarrow.compute kernels inside map_batches; GROUP BY lowers to the
hash-bucket aggregate (stages/agg.py), ORDER BY to ds.sort, LIMIT to
ds.limit.

Grammar (grows as needed):
  [WITH name AS (select)[, ...]] select
  select := term {UNION [ALL|DISTINCT] | EXCEPT} term ...   (INTERSECT
            binds tighter; trailing ORDER BY/LIMIT bind to the whole)
  term   := SELECT item[, ...] FROM <table>
            [LEFT|INNER JOIN t2 ON a = b ... | ASOF JOIN t2 ON a = b
             AND l.ts >= r.ts]
    [WHERE expr] [GROUP BY [ROLLUP|CUBE (] col[, ...] [)]] [HAVING expr]
    [QUALIFY expr]
    [ORDER BY col [DESC][, ...]] [LIMIT n] [OFFSET m]
    (ORDER BY is null-safe: NULLS LAST, DuckDB's default)
  item := expr [AS name] | * | * EXCEPT (col[, ...])
       | agg(expr) [FILTER (WHERE cond)] [AS name] | COUNT(*) [AS name]
       | PERCENTILE_DISC(q) WITHIN GROUP (ORDER BY expr) [AS name]
       | winfn OVER ([PARTITION BY col,...] [ORDER BY col [DESC],...]
                     [ROWS BETWEEN (k|UNBOUNDED) PRECEDING AND CURRENT ROW
                      | RANGE BETWEEN k PRECEDING AND CURRENT ROW])
  agg  := SUM | MIN | MAX | AVG | COUNT | STDDEV_POP | STDDEV_SAMP
  winfn:= ROW_NUMBER() | RANK() | DENSE_RANK() | PERCENT_RANK()
       | CUME_DIST() | LAG/LEAD(e[, k]) | NTILE(n)
       | FIRST_VALUE/LAST_VALUE(e)
       | SUM/COUNT/AVG/MIN/MAX(e) | COUNT(*)   (stages/window.py)
  scalar fns: CONCAT, SUBSTR, UPPER, LOWER, LENGTH, ABS, FLOOR, CEIL,
       ROUND, COALESCE, CAST(e AS type), TRIM/LTRIM/RTRIM, REPLACE,
       REVERSE, CONTAINS, STARTS_WITH/ENDS_WITH, REGEXP_MATCHES, STRPOS,
       LEFT/RIGHT, LPAD/RPAD, SPLIT_PART, YEAR..SECOND, DATE_TRUNC,
       HSTORE_GET_VALUE, custom via register_sql_function
  predicates: = <> != < <= > >=, [NOT] LIKE/ILIKE, [NOT] IN (...|SELECT),
              [NOT] BETWEEN a AND b, IS [NOT] NULL, AND, OR, NOT,
              [NOT] EXISTS (SELECT) — uncorrelated, or single-equality
              correlated (decorrelated to a broadcast semi/anti-join);
              scalar subqueries (SELECT one value) as expressions
LIKE is case-sensitive (DuckDB semantics; the reference's OGR_SQL_LIKE_AS
_ILIKE toggle maps to ILIKE).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)|(?P<str>'(?:[^']|'')*')"
    r"|(?P<id>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op><>|!=|<=|>=|\|\||[=<>+\-*/%(),.])|(?P<end>$))"
)

_KEYWORDS = {
    "SELECT", "FROM", "WHERE", "GROUP", "ORDER", "BY", "LIMIT", "AS", "AND",
    "OR", "NOT", "IN", "LIKE", "ILIKE", "BETWEEN", "IS", "NULL", "CAST",
    "DESC", "ASC", "DISTINCT", "JOIN", "LEFT", "INNER", "ON",
    "UNION", "ALL", "OFFSET", "EXCEPT", "EXCLUDE",
    "HAVING", "CASE", "WHEN", "THEN", "ELSE", "END",
    "OVER", "PARTITION",
    "WITH", "INTERSECT", "EXISTS",
    "ROWS", "PRECEDING", "CURRENT", "ROW", "UNBOUNDED",
    "QUALIFY",
}


def _tokenize(s: str):
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos and not m.group("end"):
            raise ValueError(f"SQL tokenize error at {s[pos:pos+20]!r}")
        if m.group("end") is not None and m.group("num") is None \
           and m.group("str") is None and m.group("id") is None and m.group("op") is None:
            break
        pos = m.end()
        if m.group("num"):
            txt = m.group("num")
            out.append(("num", float(txt) if "." in txt else int(txt)))
        elif m.group("str"):
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("id"):
            t = m.group("id")
            out.append(("kw", t.upper()) if t.upper() in _KEYWORDS else ("id", t))
        elif m.group("op"):
            out.append(("op", m.group("op")))
    out.append(("eof", None))
    return out


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind, val=None):
        k, v = self.peek()
        if k == kind and (val is None or v == val):
            return self.next()
        return None

    def expect(self, kind, val=None):
        t = self.accept(kind, val)
        if t is None:
            raise ValueError(f"SQL parse error: expected {val or kind}, got {self.peek()}")
        return t


# AST nodes: ("col", name) ("lit", v) ("call", fn, args) ("cast", e, type)
# ("bin", op, l, r) ("un", op, e) ("like", e, pat, ci, neg) ("in", e, vals, neg)
# ("between", e, lo, hi, neg) ("isnull", e, neg) ("agg", fn, e|None)

_AGG_FNS = {"SUM", "MIN", "MAX", "AVG", "COUNT", "STDDEV_POP", "STDDEV_SAMP"}


def _parse_expr(p: _P):
    return _parse_or(p)


def _parse_or(p):
    e = _parse_and(p)
    while p.accept("kw", "OR"):
        e = ("bin", "or", e, _parse_and(p))
    return e


def _parse_and(p):
    e = _parse_not(p)
    while p.accept("kw", "AND"):
        e = ("bin", "and", e, _parse_not(p))
    return e


def _parse_not(p):
    if p.accept("kw", "NOT"):
        return ("un", "not", _parse_not(p))
    return _parse_cmp(p)


def _parse_cmp(p):
    e = _parse_add(p)
    neg = bool(p.accept("kw", "NOT"))
    k, v = p.peek()
    if k == "op" and v in ("=", "<>", "!=", "<", "<=", ">", ">="):
        if neg:
            raise ValueError("dangling NOT before comparison operator")
        p.next()
        return ("bin", v, e, _parse_add(p))
    if k == "kw" and v in ("LIKE", "ILIKE"):
        p.next()
        pat = p.expect("str")[1]
        return ("like", e, pat, v == "ILIKE", neg)
    if k == "kw" and v == "IN":
        p.next()
        p.expect("op", "(")
        if p.peek() == ("kw", "SELECT"):
            # [NOT] IN (SELECT ...) — uncorrelated semi/anti-join subquery,
            # resolved driver-side to a broadcast value set (ray.put once,
            # pc.is_in per batch).  Non-null contract for NOT IN (ANSI
            # NULL-in-list semantics are not modeled).
            sub = _parse_set_expr(p)
            p.expect("op", ")")
            return ("in_sub", e, sub, neg)
        vals = []
        while True:
            kk, vv = p.next()
            if kk not in ("num", "str"):
                raise ValueError("IN list expects literals")
            vals.append(vv)
            if not p.accept("op", ","):
                break
        p.expect("op", ")")
        return ("in", e, vals, neg)
    if k == "kw" and v == "BETWEEN":
        p.next()
        lo = _parse_add(p)
        p.expect("kw", "AND")
        hi = _parse_add(p)
        return ("between", e, lo, hi, neg)
    if k == "kw" and v == "IS":
        p.next()
        neg2 = bool(p.accept("kw", "NOT"))
        p.expect("kw", "NULL")
        return ("isnull", e, neg2)
    if neg:
        raise ValueError("dangling NOT")
    return e


def _parse_add(p):
    e = _parse_mul(p)
    while True:
        k, v = p.peek()
        if k == "op" and v in ("+", "-", "||"):
            p.next()
            e = ("bin", v, e, _parse_mul(p))
        else:
            return e


def _parse_mul(p):
    e = _parse_unary(p)
    while True:
        k, v = p.peek()
        if k == "op" and v in ("*", "/", "%"):
            p.next()
            e = ("bin", v, e, _parse_unary(p))
        else:
            return e


def _parse_unary(p):
    if p.accept("op", "-"):
        return ("un", "neg", _parse_unary(p))
    return _parse_primary(p)


def _parse_primary(p):
    k, v = p.next()
    if k == "kw" and v == "LEFT" and p.peek() == ("op", "("):
        k = "id"  # LEFT(...) the string function, not LEFT JOIN
    if k == "num" or k == "str":
        return ("lit", v)
    if k == "kw" and v == "NULL":
        return ("lit", None)
    if k == "kw" and v == "EXISTS":
        # EXISTS (SELECT ...) — uncorrelated: resolved driver-side to a
        # constant boolean (sub.limit(1) probe, never a full execution)
        p.expect("op", "(")
        sub = _parse_set_expr(p)
        p.expect("op", ")")
        return ("exists_sub", sub)
    if k == "kw" and v == "CAST":
        p.expect("op", "(")
        e = _parse_expr(p)
        p.expect("kw", "AS")
        ty = p.expect("id")[1].upper()
        p.expect("op", ")")
        return ("cast", e, ty)
    if k == "kw" and v == "CASE":
        # CASE WHEN cond THEN val [WHEN ...] [ELSE val] END (searched CASE)
        whens = []
        while p.accept("kw", "WHEN"):
            cond = _parse_expr(p)
            p.expect("kw", "THEN")
            whens.append((cond, _parse_expr(p)))
        if not whens:
            raise ValueError("CASE requires at least one WHEN branch")
        els = _parse_expr(p) if p.accept("kw", "ELSE") else None
        p.expect("kw", "END")
        return ("case", tuple(whens), els)
    if k == "id":
        if p.accept("op", "("):
            fn = v.upper()
            args = []
            star = False
            if fn == "COUNT" and p.accept("op", "*"):
                p.expect("op", ")")
                star = True
            elif fn == "COUNT" and p.accept("kw", "DISTINCT"):
                # SWQM_DISTINCT_LIST (ogr/ogr_swq.h:322)
                e = _parse_expr(p)
                p.expect("op", ")")
                return ("agg", "COUNT_DISTINCT", e)
            elif not p.accept("op", ")"):
                while True:
                    args.append(_parse_expr(p))
                    if not p.accept("op", ","):
                        break
                if p.peek() != ("kw", "ORDER"):
                    p.expect("op", ")")
                # else: ordered-aggregate tail — the fn branch consumes
                # ORDER BY ... and the closing paren
            if p.accept("kw", "OVER"):
                return _parse_over(p, fn, args, star)
            if fn == "STRING_AGG":
                # STRING_AGG(expr, 'sep' [ORDER BY key [DESC]]) — ordered
                # grouped concatenation (DuckDB ordered-aggregate syntax)
                if len(args) != 2 or args[1][0] != "lit":
                    raise ValueError(
                        "STRING_AGG takes (expr, 'separator' literal)")
                okey, odesc = None, False
                if p.accept("kw", "ORDER"):
                    p.expect("kw", "BY")
                    okey = _parse_expr(p)
                    odesc = bool(p.accept("kw", "DESC"))
                    if not odesc:
                        p.accept("kw", "ASC")
                    p.expect("op", ")")
                return ("agg", "STRAGG", (args[0], args[1][1], okey, odesc))
            if fn == "PERCENTILE_DISC":
                # PERCENTILE_DISC(q) WITHIN GROUP (ORDER BY expr) —
                # ordered-set aggregate, lowered to the exact 3-pass
                # histogram selection (stages/quantile.py)
                if len(args) != 1 or args[0][0] != "lit":
                    raise ValueError("PERCENTILE_DISC takes one literal")
                kk2, vv2 = p.peek()
                if not (kk2 == "id" and vv2.upper() == "WITHIN"):
                    raise ValueError("PERCENTILE_DISC requires WITHIN GROUP")
                p.next()
                p.expect("kw", "GROUP")
                p.expect("op", "(")
                p.expect("kw", "ORDER")
                p.expect("kw", "BY")
                oexpr = _parse_expr(p)
                p.expect("op", ")")
                return ("agg", "PDISC", (float(args[0][1]), oexpr))
            filt = None
            if p.peek()[0] == "id" and p.peek()[1].upper() == "FILTER":
                # agg(...) FILTER (WHERE cond) — ANSI; lowered to
                # CASE WHEN cond THEN arg END (aggregates skip NULLs)
                p.next()
                p.expect("op", "(")
                p.expect("kw", "WHERE")
                filt = _parse_expr(p)
                p.expect("op", ")")
            if star:
                if filt is not None:
                    return ("agg", "COUNT",
                            ("case", ((filt, ("lit", 1)),), None))
                return ("agg", "COUNT", None)
            if fn in _AGG_FNS:
                if len(args) != 1:
                    raise ValueError(f"{fn} takes one argument")
                arg0 = args[0]
                if filt is not None:
                    arg0 = ("case", ((filt, arg0),), None)
                return ("agg", fn, arg0)
            if filt is not None:
                raise ValueError("FILTER applies to aggregates only")
            return ("call", fn, args)
        if p.accept("op", "."):  # qualified column: table.col
            return ("col", v + "." + p.expect("id")[1])
        return ("col", v)
    if k == "op" and v == "(":
        if p.peek() == ("kw", "SELECT"):
            # scalar subquery: must produce exactly one row, one column;
            # resolved driver-side to a literal before compilation
            sub = _parse_set_expr(p)
            p.expect("op", ")")
            return ("scalar_sub", sub)
        e = _parse_expr(p)
        p.expect("op", ")")
        return e
    raise ValueError(f"SQL parse error near {v!r}")


def _parse_over(p: _P, fn: str, args: list, star: bool):
    """fn(args) OVER ([PARTITION BY c,...] [ORDER BY c [DESC],...]) —
    ANSI window functions (the reference's SQLite dialect gets these from
    sqlite3; the swq dialect has none).  Node:
    ("win", fn, arg_node|None, offset, partition_tuple, order_tuple,
    frame) — frame None (ANSI default RANGE ... CURRENT ROW, peer
    inclusive) or ("rows", n_preceding | None-for-unbounded)."""
    from gdal_ray.stages.window import WINDOW_FNS

    if fn not in WINDOW_FNS:
        raise ValueError(f"{fn} is not a window function")
    arg, offset = None, 1
    if fn in ("LAG", "LEAD"):
        if not 1 <= len(args) <= 2:
            raise ValueError(f"{fn} takes (expr[, offset])")
        arg = args[0]
        if len(args) == 2:
            if args[1][0] != "lit":
                raise ValueError(f"{fn} offset must be a literal")
            offset = int(args[1][1])
    elif fn in ("ROW_NUMBER", "RANK", "DENSE_RANK", "PERCENT_RANK",
                "CUME_DIST"):
        if args or star:
            raise ValueError(f"{fn}() takes no arguments")
    elif fn == "NTILE":
        # NTILE(n) — the tile count rides in the offset slot
        if len(args) != 1 or args[0][0] != "lit":
            raise ValueError("NTILE takes one literal tile count")
        offset = int(args[0][1])
        if offset < 1:
            raise ValueError("NTILE tile count must be >= 1")
    elif fn in ("FIRST_VALUE", "LAST_VALUE"):
        if len(args) != 1:
            raise ValueError(f"{fn} takes one argument")
        arg = args[0]
    elif not star:  # SUM/COUNT/AVG/MIN/MAX over an expression
        if len(args) != 1:
            raise ValueError(f"{fn} takes one argument")
        arg = args[0]
    p.expect("op", "(")
    partition, order = [], []
    if p.accept("kw", "PARTITION"):
        p.expect("kw", "BY")
        while True:
            partition.append(p.expect("id")[1])
            if not p.accept("op", ","):
                break
    if p.accept("kw", "ORDER"):
        p.expect("kw", "BY")
        while True:
            c = p.expect("id")[1]
            desc = bool(p.accept("kw", "DESC"))
            if not desc:
                p.accept("kw", "ASC")
            order.append((c, desc))
            if not p.accept("op", ","):
                break
    frame = None
    is_rows = bool(p.accept("kw", "ROWS"))
    # RANGE is deliberately NOT a reserved keyword (it would shadow
    # column names); detect the literal identifier instead
    is_range = False
    if not is_rows:
        kk, vv = p.peek()
        if kk == "id" and vv.upper() == "RANGE":
            p.next()
            is_range = True
    if is_rows or is_range:
        # ROWS: row-granular moving window.  RANGE k PRECEDING: VALUE
        # window [cur-k, cur] over ONE ascending numeric ORDER BY key,
        # peer-inclusive at both ends — exactly DuckDB's semantics.
        p.expect("kw", "BETWEEN")
        if p.accept("kw", "UNBOUNDED"):
            nprec = None
            p.expect("kw", "PRECEDING")
        elif p.accept("kw", "CURRENT"):
            p.expect("kw", "ROW")
            nprec = 0
        else:
            nprec = p.expect("num")[1]
            p.expect("kw", "PRECEDING")
        p.expect("kw", "AND")
        nfoll = 0
        if p.accept("kw", "CURRENT"):
            p.expect("kw", "ROW")
        elif p.accept("kw", "UNBOUNDED"):
            if not p.accept("id", "FOLLOWING"):
                kk3, vv3 = p.next()
                if not (kk3 == "id" and vv3.upper() == "FOLLOWING"):
                    raise ValueError("expected FOLLOWING")
            nfoll = None
        else:
            nfoll = int(p.expect("num")[1])
            kk3, vv3 = p.next()
            if not (kk3 == "id" and vv3.upper() == "FOLLOWING"):
                raise ValueError("expected FOLLOWING")
        if not order:
            raise ValueError("a ROWS/RANGE frame requires ORDER BY")
        if fn not in _ROWS_FRAME_FNS:
            raise ValueError(f"{fn} does not accept a ROWS/RANGE frame")
        if is_rows:
            frame = ("rows", None if nprec is None else int(nprec), nfoll)
        elif nprec is None and nfoll == 0:
            frame = None  # RANGE UNBOUNDED .. CURRENT ROW = ANSI default
        else:
            if nfoll != 0:
                raise NotImplementedError("RANGE ... FOLLOWING")
            if len(order) != 1 or order[0][1]:
                raise NotImplementedError(
                    "numeric RANGE frame needs exactly one ascending "
                    "ORDER BY key")
            frame = ("range", float(nprec))
    p.expect("op", ")")
    return ("win", fn, arg, offset, tuple(partition), tuple(order), frame)


_ROWS_FRAME_FNS = {"SUM", "COUNT", "AVG", "MIN", "MAX"}


def _collect_wins(node, out):
    if isinstance(node, tuple):
        if node and node[0] == "win":
            out.append(node)
            return
        for part in node:
            _collect_wins(part, out)
    elif isinstance(node, list):
        for part in node:
            _collect_wins(part, out)


def _rewrite_wins(node, mapping: dict):
    """Replace win nodes with their computed-column references."""
    if isinstance(node, tuple):
        if node and node[0] == "win":
            return ("col", mapping[node])
        return tuple(_rewrite_wins(part, mapping) for part in node)
    if isinstance(node, list):
        return [_rewrite_wins(part, mapping) for part in node]
    return node


def parse_select(sql: str) -> dict:
    p = _P(_tokenize(sql))
    ctes = []
    if p.accept("kw", "WITH"):
        # WITH name AS (select) [, name2 AS (select)] ... — each CTE is a
        # lazy Dataset registered under its name for later FROM clauses
        # (later CTEs may reference earlier ones)
        while True:
            name = p.expect("id")[1]
            p.expect("kw", "AS")
            p.expect("op", "(")
            ctes.append((name, _parse_set_expr(p)))
            p.expect("op", ")")
            if not p.accept("op", ","):
                break
    q = _parse_set_expr(p)
    p.expect("eof")
    if ctes:
        return {"with": ctes, "body": q}
    return q


def _steal_tail(rhs: dict) -> tuple[dict, dict]:
    """ANSI: a trailing ORDER BY/LIMIT/OFFSET binds to the whole set
    expression; the body parser attached it to the last arm — hoist."""
    if "items" in rhs:  # plain select
        tail = {"order": rhs["order"], "limit": rhs["limit"],
                "offset": rhs.get("offset", 0)}
        rhs = dict(rhs, order=[], limit=None, offset=0)
    else:  # nested setop: its own tail is the rightmost arm's
        tail = rhs["tail"]
        rhs = dict(rhs, tail={"order": [], "limit": None, "offset": 0})
    return rhs, tail


def _make_setop(kind: str, left: dict, right: dict) -> dict:
    right, tail = _steal_tail(right)
    return {"setop": kind, "left": left, "right": right, "tail": tail}


def _parse_set_term(p: _P) -> dict:
    """INTERSECT binds tighter than UNION/EXCEPT (ANSI precedence)."""
    q = _parse_select_body(p)
    while p.accept("kw", "INTERSECT"):
        kind = "intersectall" if p.accept("kw", "ALL") else "intersect"
        q = _make_setop(kind, q, _parse_select_body(p))
    return q


def _parse_set_expr(p: _P) -> dict:
    q = _parse_set_term(p)
    while True:
        if p.accept("kw", "UNION"):
            if p.accept("kw", "ALL"):
                q = _make_setop("unionall", q, _parse_set_term(p))
            else:
                p.accept("kw", "DISTINCT")
                q = _make_setop("union", q, _parse_set_term(p))
        elif p.accept("kw", "EXCEPT"):
            kind = "exceptall" if p.accept("kw", "ALL") else "except"
            q = _make_setop(kind, q, _parse_set_term(p))
        else:
            return q


def _parse_select_body(p: _P) -> dict:
    p.expect("kw", "SELECT")
    distinct = bool(p.accept("kw", "DISTINCT"))
    items = []
    while True:
        if p.accept("op", "*"):
            if p.accept("kw", "EXCEPT") or p.accept("kw", "EXCLUDE"):
                p.expect("op", "(")
                excl = [p.expect("id")[1]]
                while p.accept("op", ","):
                    excl.append(p.expect("id")[1])
                p.expect("op", ")")
                items.append((("star_except", tuple(excl)), None))
            else:
                items.append(("star", None))
        else:
            e = _parse_expr(p)
            name = None
            if p.accept("kw", "AS"):
                name = p.expect("id")[1]
            items.append((e, name))
        if not p.accept("op", ","):
            break
    p.expect("kw", "FROM")
    from_sub = None
    if p.accept("op", "("):
        # FROM (SELECT ...) [AS] alias — derived table: the subquery
        # executes into the table namespace under its alias
        from_sub = _parse_set_expr(p)
        p.expect("op", ")")
        table = "__sub"
        if p.accept("kw", "AS"):
            table = p.expect("id")[1]
        elif p.peek()[0] == "id" and p.peek()[1].upper() not in (
                "WHERE", "GROUP", "ORDER", "LIMIT", "LEFT", "INNER",
                "JOIN", "HAVING", "QUALIFY", "OFFSET", "ASOF", "UNION",
                "INTERSECT", "EXCEPT"):
            table = p.next()[1]
    else:
        table = p.expect("id")[1]
    joins = []  # (kind, table, left_key, right_key) — swq LEFT JOIN ON equality
    while True:
        kk, vv = p.peek()
        if kk == "id" and vv.upper() == "ASOF":
            # ASOF JOIN t ON l.k = r.k AND l.ts >= r.ts (DuckDB syntax):
            # nearest-preceding match per key — lowered to the
            # sort-merge asof operator (stages/joins.asof_join)
            p.next()
            p.expect("kw", "JOIN")
            t2 = p.expect("id")[1]
            p.expect("kw", "ON")
            joins.append(("asof", t2, _parse_expr(p), None))
            continue
        if p.accept("kw", "LEFT"):
            p.expect("kw", "JOIN")
            kind = "left"
        elif p.accept("kw", "INNER"):
            p.expect("kw", "JOIN")
            kind = "inner"
        elif p.accept("kw", "JOIN"):
            kind = "inner"
        else:
            break
        t2 = p.expect("id")[1]
        p.expect("kw", "ON")
        cond = _parse_expr(p)
        if not (isinstance(cond, tuple) and cond[0] == "bin" and cond[1] == "="
                and cond[2][0] == "col" and cond[3][0] == "col"):
            raise ValueError("JOIN ON requires column = column (swq subset)")
        joins.append((kind, t2, cond[2][1], cond[3][1]))
    where = group = None
    order = []
    limit = None
    if p.accept("kw", "WHERE"):
        where = _parse_expr(p)
    having = None
    rollup = False  # False | "rollup" | "cube"
    if p.accept("kw", "GROUP"):
        p.expect("kw", "BY")
        if p.peek()[0] == "id" and p.peek()[1].upper() in ("ROLLUP", "CUBE"):
            rollup = p.next()[1].lower()
            p.expect("op", "(")
        group = []
        while True:
            group.append(p.expect("id")[1])
            if not p.accept("op", ","):
                break
        if rollup:
            p.expect("op", ")")
        if p.accept("kw", "HAVING"):
            having = _parse_expr(p)
    qualify = None
    if p.accept("kw", "QUALIFY"):
        # post-window filter (DuckDB/Snowflake QUALIFY): runs after the
        # window columns are computed, before ORDER BY/LIMIT
        qualify = _parse_expr(p)
    if p.accept("kw", "ORDER"):
        p.expect("kw", "BY")
        while True:
            c = p.expect("id")[1]
            desc = bool(p.accept("kw", "DESC"))
            if not desc:
                p.accept("kw", "ASC")
            order.append((c, desc))
            if not p.accept("op", ","):
                break
    if p.accept("kw", "LIMIT"):
        limit = int(p.expect("num")[1])
    offset = 0
    if p.accept("kw", "OFFSET"):
        offset = int(p.expect("num")[1])
    return {"items": items, "table": table, "from_sub": from_sub,
            "joins": joins, "where": where,
            "group": group, "rollup": rollup, "having": having,
            "qualify": qualify, "order": order, "limit": limit,
            "offset": offset, "distinct": distinct}


# ---------------------------------------------------------------------------
# compiler: AST -> pa.Array function over a batch

_CAST_TYPES = {
    "INTEGER": pa.int64(), "INT": pa.int64(), "BIGINT": pa.int64(),
    "DOUBLE": pa.float64(), "FLOAT": pa.float64(), "REAL": pa.float64(),
    "VARCHAR": pa.string(), "TEXT": pa.string(), "STRING": pa.string(),
}


def _like_regex(pat: str) -> str:
    out = []
    for ch in pat:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


# User-registered SQL functions — the SWQCF_CUSTOM extension surface
# (ogr/ogr_swq.h:334, swq_op_registrar.cpp): fn(*arrow_args) -> Array.
_CUSTOM_FUNCS: dict[str, object] = {}


def register_sql_function(name: str, fn=None):
    """Register a custom scalar SQL function, callable from any SQL string
    run by execute_sql.  Usable as a decorator or a direct call."""
    key = name.upper()

    def _add(f):
        _CUSTOM_FUNCS[key] = f
        return f

    return _add if fn is None else _add(fn)


def _eval_with_funcs(node, batch, funcs):
    """Entry point used inside map_batches closures: Ray workers re-import
    this module, so driver-side register_sql_function state must travel in
    the serialized closure — `funcs` is the plan-time snapshot."""
    if funcs:
        _CUSTOM_FUNCS.update(funcs)
    return _eval(node, batch)


def _eval(node, batch: pa.Table):
    kind = node[0]
    if kind == "col":
        name = node[1]
        if name not in batch.column_names and "." in name:
            # qualified ref in a single-table scope (e.g. a correlated
            # EXISTS rewritten to a semi-join): fall back to the suffix
            suf = name.split(".", 1)[1]
            if suf in batch.column_names:
                return batch.column(suf)
        return batch.column(name)
    if kind == "lit":
        return pa.scalar(node[1])
    if kind == "cast":
        v = _eval(node[1], batch)
        ty = _CAST_TYPES[node[2]]
        if pa.types.is_integer(ty) and pa.types.is_floating(
            v.type if hasattr(v, "type") else pa.float64()
        ):
            # DuckDB DOUBLE→int CAST uses rint (round half to even);
            # only DECIMAL literals round half away from zero
            return pc.round(v, round_mode="half_to_even").cast(ty)
        return pc.cast(v, ty)
    if kind == "case":
        # searched CASE: evaluate branches last-to-first under pc.if_else;
        # a NULL condition does not match (ANSI), hence the fill_null
        out = _eval(node[2], batch) if node[2] is not None else None
        for cond, val in reversed(node[1]):
            c = _eval(cond, batch)
            if not isinstance(c, pa.Scalar):
                c = pc.fill_null(c, False)
            v = _eval(val, batch)
            if out is None:
                vt = v.type if hasattr(v, "type") else pa.float64()
                out = pa.nulls(len(batch), vt)
            out = pc.if_else(c, v, out)
        return out
    if kind == "un":
        v = _eval(node[2], batch)
        return pc.negate(v) if node[1] == "neg" else pc.invert(v)
    if kind == "bin":
        op, l, r = node[1], _eval(node[2], batch), _eval(node[3], batch)
        ops = {
            "+": pc.add, "-": pc.subtract, "*": pc.multiply,
            "/": pc.divide, "=": pc.equal, "<>": pc.not_equal,
            "!=": pc.not_equal, "<": pc.less, "<=": pc.less_equal,
            ">": pc.greater, ">=": pc.greater_equal,
            "and": pc.and_kleene, "or": pc.or_kleene,
        }
        if op == "%":
            return _mod(l, r)
        if op == "||":
            return pc.binary_join_element_wise(pc.cast(l, pa.string()), pc.cast(r, pa.string()), "")
        if op == "/" and pa.types.is_integer(_t(l)) and pa.types.is_integer(_t(r)):
            return pc.divide(l, r)  # arrow int/int = int (SQL integer division)
        return ops[op](l, r)
    if kind == "like":
        _, e, pat, ci, neg = node
        v = _eval(e, batch)
        m = pc.match_substring_regex(v, _like_regex(pat), ignore_case=ci)
        return pc.invert(m) if neg else m
    if kind == "in":
        _, e, vals, neg = node
        v = _eval(e, batch)
        m = pc.is_in(v, value_set=pa.array(vals))
        return pc.invert(m) if neg else m
    if kind == "in_ref":
        # broadcast semi/anti-join: the value set lives in the object
        # store; ray.get per batch is a local plasma read after the first
        _, e, ref, neg = node
        import ray

        v = _eval(e, batch)
        vals = ray.get(ref)
        if not pa.types.is_string(vals.type) and pa.types.is_string(_t(v)):
            vals = pc.cast(vals, pa.string())
        m = pc.is_in(v, value_set=vals)
        return pc.invert(m) if neg else m
    if kind == "between":
        _, e, lo, hi, neg = node
        v = _eval(e, batch)
        m = pc.and_(pc.greater_equal(v, _eval(lo, batch)), pc.less_equal(v, _eval(hi, batch)))
        return pc.invert(m) if neg else m
    if kind == "isnull":
        _, e, neg = node
        m = pc.is_null(_eval(e, batch))
        return pc.invert(m) if neg else m
    if kind == "call":
        fn, args = node[1], [_eval(a, batch) for a in node[2]]
        if fn == "CONCAT":
            parts = [pc.cast(a, pa.string()) for a in args]
            return pc.binary_join_element_wise(*parts, "")
        if fn == "SUBSTR" or fn == "SUBSTRING":
            for a in node[2][1:]:
                if not (isinstance(a, tuple) and a[0] == "lit" and isinstance(a[1], int)):
                    raise ValueError("SUBSTR start/length must be integer literals")
            start = node[2][1][1]  # literal 1-based
            length = node[2][2][1] if len(node[2]) > 2 else None
            stop = None if length is None else start - 1 + length
            return pc.utf8_slice_codeunits(args[0], start - 1, stop)
        if fn == "UPPER":
            return pc.utf8_upper(args[0])
        if fn == "LOWER":
            return pc.utf8_lower(args[0])
        if fn == "LENGTH" or fn == "LEN":
            return pc.utf8_length(args[0]).cast(pa.int64())
        if fn == "COALESCE" or fn == "IFNULL":
            out = args[0]
            for a in args[1:]:
                out = pc.coalesce(out, a)
            return out
        if fn == "ABS":
            return pc.abs(args[0])
        if fn == "FLOOR":
            return pc.floor(args[0])
        if fn == "CEIL" or fn == "CEILING":
            return pc.ceil(args[0])
        if fn == "ROUND":
            return pc.round(args[0])
        # --- string breadth (DuckDB-compatible names; identical-string
        # oracles) ---
        if fn == "TRIM":
            return pc.utf8_trim_whitespace(args[0])
        if fn == "LTRIM":
            return pc.utf8_ltrim_whitespace(args[0])
        if fn == "RTRIM":
            return pc.utf8_rtrim_whitespace(args[0])
        if fn == "REVERSE":
            return pc.utf8_reverse(args[0])
        if fn == "REPLACE":
            pat, rep = _lit_str(node, 1), _lit_str(node, 2)
            return pc.replace_substring(args[0], pattern=pat, replacement=rep)
        if fn == "CONTAINS":
            return pc.match_substring(args[0], _lit_str(node, 1))
        if fn == "STARTS_WITH" or fn == "PREFIX":
            return pc.starts_with(args[0], _lit_str(node, 1))
        if fn == "ENDS_WITH" or fn == "SUFFIX":
            return pc.ends_with(args[0], _lit_str(node, 1))
        if fn == "REGEXP_MATCHES":
            return pc.match_substring_regex(args[0], _lit_str(node, 1))
        if fn == "REGEXP_SPLIT_TO_ARRAY":
            return pc.split_pattern_regex(args[0], _lit_str(node, 1))
        if fn in ("STRING_SPLIT", "STR_SPLIT", "STRING_TO_ARRAY"):
            return pc.split_pattern(args[0], _lit_str(node, 1))
        if fn == "LEN_LIST" or fn == "LIST_LENGTH" or fn == "ARRAY_LENGTH":
            return pc.list_value_length(args[0]).cast(pa.int64())
        if fn == "UNNEST":
            raise NotImplementedError(
                "UNNEST is only supported at the top level of a plain "
                "SELECT list (wrap aggregations around it in a subquery "
                "or CTE, as in DuckDB)")
        if fn == "STRPOS" or fn == "INSTR":
            # 1-based, 0 when absent (DuckDB) — find_substring is 0/-1
            return pc.add(pc.find_substring(args[0], _lit_str(node, 1)),
                          pa.scalar(1, pa.int32())).cast(pa.int64())
        if fn == "LEFT":
            return pc.utf8_slice_codeunits(args[0], 0, _lit_int(node, 1))
        if fn == "RIGHT":
            n_ = _lit_int(node, 1)
            return pc.utf8_slice_codeunits(args[0], -n_) if n_ > 0                 else pc.utf8_slice_codeunits(args[0], 0, 0)
        if fn == "LPAD":
            return pc.utf8_lpad(args[0], _lit_int(node, 1),
                                padding=_lit_str(node, 2))
        if fn == "RPAD":
            return pc.utf8_rpad(args[0], _lit_int(node, 1),
                                padding=_lit_str(node, 2))
        if fn == "SPLIT_PART":
            # DuckDB: '' when the part is missing — pad with separators so
            # every requested index exists, then take it
            sep, idx1 = _lit_str(node, 1), _lit_int(node, 2)
            padded = pc.binary_join_element_wise(
                pc.cast(args[0], pa.string()),
                pa.scalar(sep * idx1), "")
            parts = pc.split_pattern(padded, sep)
            return pc.list_element(parts, idx1 - 1)
        # --- math breadth (Arrow kernels; libm-backed like DuckDB) ---
        if fn == "SQRT":
            return pc.sqrt(args[0])
        if fn == "POWER" or fn == "POW":
            return pc.power(args[0], args[1])
        if fn == "LN":
            return pc.ln(args[0])
        if fn == "LOG10" or fn == "LOG":
            return pc.log10(args[0])
        if fn == "LOG2":
            return pc.log2(args[0])
        if fn == "EXP":
            return pc.exp(args[0])
        if fn == "SIN":
            return pc.sin(args[0])
        if fn == "COS":
            return pc.cos(args[0])
        if fn == "TAN":
            return pc.tan(args[0])
        if fn == "ATAN":
            return pc.atan(args[0])
        if fn == "ATAN2":
            return pc.atan2(args[0], args[1])
        if fn == "SIGN":
            return pc.sign(args[0])
        if fn == "GREATEST":
            return pc.max_element_wise(*args)
        if fn == "LEAST":
            return pc.min_element_wise(*args)
        if fn == "PI":
            return pa.scalar(np.pi, pa.float64())
        if fn == "MOD":
            return _mod(args[0], args[1])
        # --- datetime breadth (Arrow temporal kernels) ---
        if fn in ("YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND"):
            out = getattr(pc, fn.lower())(args[0])
            return pc.cast(out, pa.int64())
        if fn == "DATE_TRUNC" or fn == "DATETRUNC":
            unit = _lit_str(node, 0).lower()
            return pc.floor_temporal(args[1], unit=unit)
        if fn == "HSTORE_GET_VALUE":
            # swq_op_general.cpp OGRHStoreGetValue: value of `key` in an
            # hstore string ('a=>1, "b"=>"x y"'); simple-value subset —
            # no commas/quotes inside values
            keynode = node[2][1]
            if not (isinstance(keynode, tuple) and keynode[0] == "lit"
                    and isinstance(keynode[1], str)):
                raise ValueError("HSTORE_GET_VALUE key must be a string literal")
            import re as _re

            pat = (r'(?:^|,)\s*"?' + _re.escape(keynode[1])
                   + r'"?\s*=>\s*"?(?P<v>[^,"]*)"?')
            st = pc.extract_regex(pc.cast(args[0], pa.string()), pat)
            return pc.utf8_trim_whitespace(pc.struct_field(st, "v"))
        if fn.startswith("ST_"):
            # SQLite-dialect spatial functions over WKB columns
            # (ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp)
            from gdal_ray.geometry.stfuncs import eval_st

            return eval_st(fn, args, node)
        if fn in _CUSTOM_FUNCS:  # SWQCF_CUSTOM (ogr/ogr_swq.h:334)
            out = _CUSTOM_FUNCS[fn](*args)
            if not isinstance(out, (pa.Array, pa.ChunkedArray, pa.Scalar)):
                out = pa.array(np.asarray(out))
            return out
        raise ValueError(f"unknown function {fn}")
    raise ValueError(f"cannot evaluate node {node[0]}")


def _lit_str(node, i: int) -> str:
    a = node[2][i]
    if not (isinstance(a, tuple) and a[0] == "lit" and isinstance(a[1], str)):
        raise ValueError(f"{node[1]} argument {i+1} must be a string literal")
    return a[1]


def _lit_int(node, i: int) -> int:
    a = node[2][i]
    if not (isinstance(a, tuple) and a[0] == "lit" and isinstance(a[1], int)):
        raise ValueError(f"{node[1]} argument {i+1} must be an integer literal")
    return a[1]


def _t(v):
    return v.type if hasattr(v, "type") else pa.float64()


def _mod(l, r):
    # SQL % on integers: numpy-style fmod semantics match DuckDB for
    # positive operands; use trunc-division remainder
    lt = _t(l)
    q = pc.cast(pc.trunc(pc.divide(pc.cast(l, pa.float64()), pc.cast(r, pa.float64()))), lt)
    return pc.subtract(l, pc.multiply(q, r))


def _collect_aggs(node, out):
    if isinstance(node, tuple):
        if node and node[0] == "agg":
            out.append(node)
            return
        for part in node:
            _collect_aggs(part, out)
    elif isinstance(node, list):
        for part in node:
            _collect_aggs(part, out)


def _default_name(node, idx):
    if node[0] == "col":
        return node[1]
    if node[0] == "agg":
        return f"{node[1].lower()}_{idx}"
    return f"expr_{idx}"


class _BroadcastLookupJoin:
    """swq JOIN lowering (ogr/ogr_swq.h:411-413, ogr_gensql.cpp indexed
    secondary lookup): the joined table is the SMALL side, shipped once per
    actor via ray.put as an Arrow table; each primary batch probes it with
    one vectorized ``pc.index_in`` (first match — OGR SQL JOIN semantics)
    and gathers the secondary columns with ``take`` (null index → null row,
    which IS the LEFT JOIN fill)."""

    def __init__(self, ref, key_col, sec_key, out_names, kind):
        import ray

        self.sec = ray.get(ref[0])
        self.key_col = key_col
        self.sec_key = self.sec.column(sec_key).combine_chunks()
        self.out_names = out_names  # [(sec_col, out_name)]
        self.kind = kind

    def __call__(self, b: pa.Table) -> pa.Table:
        probe = b.column(self.key_col)
        vs = self.sec_key
        if probe.type != vs.type:
            vs = pc.cast(vs, probe.type)
        idx = pc.index_in(probe, value_set=vs)
        if self.kind == "inner":
            valid = pc.is_valid(idx)
            b = b.filter(valid)
            idx = pc.filter(idx, valid)
        for sec_col, out_name in self.out_names:
            b = b.append_column(out_name, pc.take(self.sec.column(sec_col), idx))
        return b


def _rewrite_agg_nodes(node, rewrites: dict):
    """Replace aggregate sub-nodes with column refs to their computed
    output columns (HAVING evaluation over the aggregated table)."""
    if isinstance(node, tuple):
        if node and node[0] == "agg":
            return ("col", rewrites[node])
        return tuple(_rewrite_agg_nodes(part, rewrites) for part in node)
    if isinstance(node, list):
        return [_rewrite_agg_nodes(part, rewrites) for part in node]
    return node


def _rewrite_cols(node, resolve):
    if isinstance(node, list):
        return [_rewrite_cols(x, resolve) for x in node]
    if not isinstance(node, tuple):
        return node
    if node and node[0] == "col":
        return ("col", resolve(node[1]))
    if node and node[0] == "win":
        _, fn, arg, offset, partn, order, frame = node
        return ("win", fn,
                _rewrite_cols(arg, resolve) if arg is not None else None,
                offset, tuple(resolve(c) for c in partn),
                tuple((resolve(c), d) for c, d in order), frame)
    return tuple(_rewrite_cols(x, resolve) for x in node)


def _apply_asof_join(ds, q, tables):
    """Lower `FROM l ASOF JOIN r ON l.k = r.k AND l.ts >= r.ts` to
    stages/joins.asof_join: ONE equality (the key) + ONE >=/> inequality
    (the timestamps, left side first).  Inner semantics, DuckDB's
    default.  Output columns: the key under its left name, every other
    left column under its own name, right columns under their own names
    (collisions suffixed _r).  ts columns must be int64-castable
    (integers or timestamps)."""
    from gdal_ray.stages.joins import asof_join

    _, t2, cond, _unused = q["joins"][0]
    right_ds = tables[t2]
    lnames = list(ds.schema().names)
    rnames = list(right_ds.schema().names)
    ltable = q["table"]

    def side(name: str):
        base = name.split(".", 1)[1] if "." in name else name
        pre = name.split(".", 1)[0] if "." in name else None
        if pre == ltable or (pre is None and base in lnames):
            if base in lnames:
                return "left", base
        if pre == t2 or (pre is None and base in rnames):
            if base in rnames:
                return "right", base
        raise ValueError(f"ASOF JOIN: cannot resolve column {name!r}")

    eq = ineq = None
    for c in _conjuncts(cond):
        if not (isinstance(c, tuple) and c[0] == "bin"
                and c[2][0] == "col" and c[3][0] == "col"):
            raise NotImplementedError(
                "ASOF JOIN ON supports column-op-column conjuncts only")
        s2, n2 = side(c[2][1])
        s3, n3 = side(c[3][1])
        if {s2, s3} != {"left", "right"}:
            raise ValueError("ASOF JOIN conjunct must relate both tables")
        if c[1] == "=":
            if eq is not None:
                raise NotImplementedError("ASOF JOIN: one equality only")
            eq = (n2, n3) if s2 == "left" else (n3, n2)
        elif c[1] in (">=", ">", "<=", "<"):
            op = c[1]
            if s2 == "right":  # normalize: left column on the left side
                n2, n3 = n3, n2
                op = {">=": "<=", ">": "<", "<=": ">=", "<": ">"}[op]
            if op in ("<", "<="):
                raise NotImplementedError(
                    "ASOF JOIN: only nearest-PRECEDING (l.ts >= r.ts)")
            ineq = (n2, n3, op == ">")
        else:
            raise NotImplementedError(f"ASOF JOIN operator {c[1]!r}")
    if eq is None or ineq is None:
        raise ValueError("ASOF JOIN ON needs an equality AND an inequality")
    lkey, rkey = eq
    lts, rts, strict = ineq

    if lkey != rkey:
        # asof_join expects one shared key column name: rename right
        def rn_key(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [lkey if c == rkey else c for c in b.column_names])

        right_ds = right_ds.map_batches(rn_key, batch_format="pyarrow")

    if lkey == "ts" or rkey == "ts":
        raise NotImplementedError(
            "ASOF JOIN key column named 'ts' (rename it first)")

    # the operator prefixes data columns l_/r_ and reserves the literal
    # l_ts/r_ts slots — a user column named 'ts' would collide, so it
    # rides under a temp name on both sides
    def prep(side_ts, is_left):
        def fn(b: pa.Table) -> pa.Table:
            names = ["ts__c" if c == "ts" else c for c in b.column_names]
            b = b.rename_columns(names)
            return b.append_column("__jts", b.column(
                "ts__c" if side_ts == "ts" else side_ts))
        return fn

    safe = lambda c: "ts__c" if c == "ts" else c  # noqa: E731
    left_cols = [safe(c) for c in lnames if c != lkey]
    right_cols = [safe(c) for c in rnames if c not in (rkey, lkey)]

    out = asof_join(ds.map_batches(prep(lts, True), batch_format="pyarrow"),
                    right_ds.map_batches(prep(rts, False),
                                         batch_format="pyarrow"),
                    key=lkey, left_ts="__jts", right_ts="__jts",
                    left_cols=left_cols, right_cols=right_cols,
                    strict=strict)

    back = lambda c: "ts" if c == "ts__c" else c  # noqa: E731
    ren = {f"l_{c}": back(c) for c in left_cols}
    lplain = {back(c) for c in left_cols}
    for c in right_cols:
        ren[f"r_{c}"] = back(c) if (back(c) not in lplain
                                    and back(c) != lkey) else f"{back(c)}_r"

    def finish(b: pa.Table) -> pa.Table:
        return b.rename_columns([ren.get(c, c) for c in b.column_names])

    return out.map_batches(finish, batch_format="pyarrow")


def _apply_joins(ds, q, tables):
    """Lower the FROM join chain; returns (ds, resolve) where resolve maps
    a possibly-qualified column reference to its output column name."""
    import ray

    scope: dict[str, dict[str, str]] = {}  # alias -> {col: out_name}
    out_cols: list[str] = list(ds.schema().names)
    scope[q["table"]] = {c: c for c in out_cols}

    def resolve(name: str) -> str:
        if "." in name:
            tbl, c = name.split(".", 1)
            if tbl not in scope or c not in scope[tbl]:
                raise ValueError(f"unknown column reference {name!r}")
            return scope[tbl][c]
        hits = [m[name] for m in scope.values() if name in m]
        if len(set(hits)) == 1:
            return hits[0]
        if not hits:
            raise ValueError(f"unknown column {name!r}")
        raise ValueError(f"ambiguous column {name!r}; qualify with table name")

    for kind, t2, lk, rk in q["joins"]:
        if t2 not in tables:
            raise ValueError(f"unknown table {t2!r} in JOIN")
        # the ON keys may be written either way round — the one resolving in
        # the current scope is the primary-side key
        def _side(k):
            try:
                return resolve(k), True
            except ValueError:
                return k.split(".", 1)[-1], False

        l_name, l_in_scope = _side(lk)
        if l_in_scope:
            probe_col, sec_key = l_name, rk.split(".", 1)[-1]
        else:
            probe_col, sec_key = resolve(rk), l_name
        refs = tables[t2].to_arrow_refs()
        blocks = [t.replace_schema_metadata(None) for t in ray.get(refs)]
        # empty blocks can carry a degenerate schema — drop them
        blocks = [t for t in blocks if len(t)] or blocks[:1]
        sec = pa.concat_tables(blocks).combine_chunks()
        if sec_key not in sec.column_names:
            raise ValueError(f"unknown join key {sec_key!r} in table {t2!r}")
        out_names = []
        scope[t2] = {}
        for c in sec.column_names:
            out = c if c not in out_cols else f"{t2}.{c}"
            out_names.append((c, out))
            scope[t2][c] = out
            out_cols.append(out)
        ref = ray.put(sec)
        ds = ds.map_batches(
            _BroadcastLookupJoin,
            fn_constructor_kwargs={"ref": [ref], "key_col": probe_col,
                                   "sec_key": sec_key, "out_names": out_names,
                                   "kind": kind},
            batch_format="pyarrow", concurrency=(1, 4),
        )
    return ds, resolve


def execute_sql(sql: str, tables: dict):
    """Run a SELECT over ray.data Datasets.  tables: name -> Dataset.
    Returns a Dataset.  UNION ALL chains execute each arm and
    Dataset.union the streams (swq_parser.y:840)."""
    q = parse_select(sql)
    if "with" in q:
        tables = dict(tables)
        for name, sub in q["with"]:
            tables[name] = _execute_one(sub, tables)
        q = q["body"]
    return _execute_one(q, tables)


def _static_names(q) -> list[str] | None:
    """Output column names of a parsed select, derived WITHOUT executing
    the plan (Dataset.schema() triggers execution — calling it per set-op
    arm re-ran the whole upstream pipeline once per exchange).  None when
    a star item makes static naming impossible."""
    if "setop" in q:
        return _static_names(q["left"])
    names = []
    for idx, (node, name) in enumerate(q["items"]):
        if node == "star" or (isinstance(node, tuple)
                              and node[0] == "star_except"):
            return None
        names.append(name or _default_name(node, idx))
    return names


def _rename_to(ds, names: list[str]):
    """Positionally rename a Dataset's columns (set-op arms align by
    position, ANSI)."""
    def rn(b: pa.Table) -> pa.Table:
        if len(b.column_names) != len(names):
            raise ValueError(
                f"set operation arms have {len(names)} vs "
                f"{len(b.column_names)} columns")
        return b.rename_columns(names)

    return ds.map_batches(rn, batch_format="pyarrow")


def _flatten_setop_tree(q):
    """Leaves of ANY set-op tree in left-to-right order — the whole chain
    (ALL and DISTINCT variants alike) collapses to ONE exchange via
    multiplicity algebra over per-arm counts."""
    if "setop" not in q:
        return [q]
    return _flatten_setop_tree(q["left"]) + _flatten_setop_tree(q["right"])


def _execute_setop_tree(q, leaves, tables):
    """A chain like A UNION B INTERSECT C EXCEPT D runs as ONE hash-bucket
    exchange: every arm tags a one-hot presence column, the union groups
    by the full row summing presences, and the op tree evaluates on
    presence booleans per group (distinct semantics make presence
    sufficient) — k-1 shuffles collapse to 1."""
    import numpy as np

    from gdal_ray.stages.agg import grouped_aggregate

    names = _static_names(leaves[0])
    arms = []
    for i, leaf in enumerate(leaves):
        arm = _execute_one(leaf, tables)
        if names is None:
            names = arm.schema().names
        if i > 0:
            arm = _rename_to(arm, names)

        def tag(b: pa.Table, _i=i, _k=len(leaves)) -> pa.Table:
            for j in range(_k):
                b = b.append_column(
                    f"__p{j}", pa.array(np.full(
                        len(b), 1 if j == _i else 0, dtype=np.int64)))
            return b

        arms.append(arm.map_batches(tag, batch_format="pyarrow"))
    u = arms[0].union(*arms[1:])
    g = grouped_aggregate(
        u, list(names),
        [(f"__p{j}", "sum", f"__p{j}") for j in range(len(leaves))])

    def finish(b: pa.Table) -> pa.Table:
        cnts = [np.asarray(b.column(f"__p{j}").to_numpy(
            zero_copy_only=False), dtype=np.int64)
            for j in range(len(leaves))]
        pos = [0]  # leaf cursor during tree replay

        def ev(node):
            # multiplicity algebra (ANSI bag semantics):
            #   UNION ALL  l+r           UNION      1 if l+r>0
            #   INTERSECT ALL min(l,r)   INTERSECT  1 if l>0 and r>0
            #   EXCEPT ALL max(l-r, 0)   EXCEPT     1 if l>0 and r==0
            if "setop" not in node:
                m = cnts[pos[0]]
                pos[0] += 1
                return m
            lm = ev(node["left"])
            rm = ev(node["right"])
            k = node["setop"]
            if k == "unionall":
                return lm + rm
            if k == "union":
                return ((lm + rm) > 0).astype(np.int64)
            if k == "intersectall":
                return np.minimum(lm, rm)
            if k == "intersect":
                return ((lm > 0) & (rm > 0)).astype(np.int64)
            if k == "exceptall":
                return np.maximum(lm - rm, 0)
            return ((lm > 0) & (rm == 0)).astype(np.int64)  # except

        mult = ev(q)
        idx = np.repeat(np.arange(len(b), dtype=np.int64), mult)
        return b.take(pa.array(idx)).select(list(names))

    return g.map_batches(finish, batch_format="pyarrow")


def _execute_setop(kind: str, l, r, names: list[str] | None = None):
    """UNION [DISTINCT] / INTERSECT / EXCEPT via ONE hash-bucket group
    exchange: tag each arm with side indicators, union the streams, group
    by the full row, then filter on per-side presence counts — the
    distributed form of the ANSI distinct-set semantics."""
    from gdal_ray.stages.agg import grouped_aggregate

    if names is None:
        names = l.schema().names
    r = _rename_to(r, names)

    def tag(side):
        def fn(b: pa.Table) -> pa.Table:
            one = pa.array(np.full(len(b), 1 - side, dtype=np.int64))
            two = pa.array(np.full(len(b), side, dtype=np.int64))
            return b.append_column("__nl", one).append_column("__nr", two)
        return fn

    u = l.map_batches(tag(0), batch_format="pyarrow").union(
        r.map_batches(tag(1), batch_format="pyarrow"))
    g = grouped_aggregate(u, names, [("__nl", "sum", "__nl"),
                                     ("__nr", "sum", "__nr")])

    def finish(b: pa.Table) -> pa.Table:
        nl = b.column("__nl")
        nr = b.column("__nr")
        if kind == "intersect":
            mask = pc.and_(pc.greater(nl, 0), pc.greater(nr, 0))
        elif kind == "except":
            mask = pc.and_(pc.greater(nl, 0), pc.equal(nr, 0))
        else:  # union distinct: every group survives
            mask = None
        if mask is not None:
            b = b.filter(mask)
        return b.select(names)

    return g.map_batches(finish, batch_format="pyarrow")


def _resolve_sub_node(node, tables):
    """Driver-side resolution of uncorrelated subquery nodes:
      in_sub     -> broadcast value set (ray.put once; workers pc.is_in
                    against the plasma-shared array — the semi/anti-join
                    broadcast idiom, same contract as the broadcast join)
      exists_sub -> constant boolean via a limit(1) probe
      scalar_sub -> literal (must yield exactly 1 row x 1 column)
    """
    if isinstance(node, tuple):
        if node and node[0] == "in_sub":
            import ray

            _, e, sub, neg = node
            sub_ds = _execute_one(sub, tables)
            names = _static_names(sub) if "items" in sub or "setop" in sub \
                else None
            if names is None:
                names = sub_ds.schema().names
            if len(names) != 1:
                raise ValueError("IN (SELECT ...) must select one column")
            rows = sub_ds.take_all()
            vals = pa.array([row[names[0]] for row in rows])
            ref = ray.put(vals)
            return ("in_ref", _resolve_sub_node(e, tables), ref, neg)
        if node and node[0] == "exists_sub":
            sub = node[1]
            corr = _extract_correlation(sub, tables)
            if corr is not None:
                # correlated single-equality EXISTS ≡ semi-join: rewrite
                # to outer_expr IN (SELECT inner_col FROM t WHERE rest)
                # and reuse the broadcast value-set machinery
                outer_node, sub2 = corr
                return _resolve_sub_node(
                    ("in_sub", outer_node, sub2, False), tables)
            n = _execute_one(sub, tables).limit(1).count()
            return ("lit", bool(n))
        if node and node[0] == "scalar_sub":
            sub_ds = _execute_one(node[1], tables)
            names = sub_ds.schema().names
            rows = sub_ds.take(2)
            if len(names) != 1 or len(rows) != 1:
                raise ValueError(
                    "scalar subquery must produce exactly 1 row, 1 column")
            return ("lit", rows[0][names[0]])
        return tuple(_resolve_sub_node(part, tables) for part in node)
    if isinstance(node, list):
        return [_resolve_sub_node(part, tables) for part in node]
    return node


def _conjuncts(node) -> list:
    if isinstance(node, tuple) and node[:2] == ("bin", "and"):
        return _conjuncts(node[2]) + _conjuncts(node[3])
    return [node]


def _extract_correlation(sub: dict, tables: dict):
    """Detect EXISTS (SELECT ... FROM t WHERE t.k = outer.k [AND rest])
    — one equality conjunct whose sides split inner/outer.  Returns
    (outer_col_node, rewritten_sub) or None for the uncorrelated case.
    Scope: single-table subquery, plain-select body, ONE correlated
    equality; anything wider raises (loud, not wrong)."""
    if "setop" in sub or sub.get("joins") or sub.get("group"):
        return None
    if sub["table"] not in tables:
        return None
    inner_names = set(tables[sub["table"]].schema().names)
    tbl = sub["table"]

    def side(name: str):
        if name in inner_names:
            return "inner", name
        if "." in name:
            pre, rest = name.split(".", 1)
            if pre == tbl and rest in inner_names:
                return "inner", rest
        return "outer", name

    where = sub.get("where")
    if where is None:
        return None
    corr = None
    rest: list = []
    for c in _conjuncts(where):
        is_corr = False
        if (isinstance(c, tuple) and c[0] == "bin" and c[1] == "="
                and c[2][0] == "col" and c[3][0] == "col"):
            s2, n2 = side(c[2][1])
            s3, n3 = side(c[3][1])
            if {s2, s3} == {"inner", "outer"}:
                inner_col = n2 if s2 == "inner" else n3
                outer_col = n2 if s2 == "outer" else n3
                if corr is not None:
                    raise NotImplementedError(
                        "EXISTS with multiple correlated equalities "
                        "(composite-key semi-join)")
                corr = (("col", outer_col), ("col", inner_col))
                is_corr = True
        if not is_corr:
            for part in _conjuncts(c):
                # any OTHER outer reference makes the conjunct correlated
                # in a shape we don't lower — raise loudly
                bad = []
                _collect_cols(part, bad)
                if any(side(b)[0] == "outer" for b in bad):
                    raise NotImplementedError(
                        "correlated EXISTS beyond one equality conjunct")
            rest.append(c)
    if corr is None:
        return None
    outer_node, inner_node = corr
    new_where = None
    for c in rest:
        new_where = c if new_where is None else ("bin", "and", new_where, c)
    sub2 = dict(sub)
    sub2["where"] = new_where
    sub2["items"] = [(inner_node, None)]
    sub2["order"] = []
    sub2["limit"] = None
    sub2["distinct"] = True  # value set: dedup before broadcast
    return outer_node, sub2


def _collect_cols(node, out: list):
    if isinstance(node, tuple):
        if node and node[0] == "col":
            out.append(node[1])
            return
        for part in node:
            _collect_cols(part, out)
    elif isinstance(node, list):
        for part in node:
            _collect_cols(part, out)


def _has_sub(node) -> bool:
    if isinstance(node, (tuple, list)):
        if node and node[0] in ("in_sub", "exists_sub", "scalar_sub"):
            return True
        return any(_has_sub(part) for part in node)
    return False


def _resolve_subqueries_in_q(q: dict, tables: dict) -> dict:
    dirty = any(
        _has_sub(part) for part in
        ([q["where"], q.get("having")] + [it[0] for it in q["items"]])
        if part is not None and part != "star"
    )
    if not dirty:
        return q
    q = dict(q)
    if q["where"] is not None:
        q["where"] = _resolve_sub_node(q["where"], tables)
    if q.get("having") is not None:
        q["having"] = _resolve_sub_node(q["having"], tables)
    q["items"] = [
        (node if node == "star" else _resolve_sub_node(node, tables), name)
        for node, name in q["items"]
    ]
    return q


def _null_safe_sort(ds, order: list[tuple[str, bool]]):
    """ds.sort with NULLS LAST (DuckDB's default ordering) that survives
    null keys: Ray's sample sort compares raw Python values and raises on
    None vs str, so each key gets an is_null flag column sorted first and
    a null-filled twin — O(1) extra columns, dropped after the sort."""
    import pyarrow.compute as _pc

    keys = []
    tmp: list[str] = []

    def prep(b: pa.Table) -> pa.Table:
        for i, (c, _d) in enumerate(order):
            col = b.column(c)
            b = b.append_column(
                f"__nf{i}", _pc.cast(_pc.is_null(col), pa.int8()))
            fill = _pc.fill_null(col, _first_nonnull_sentinel(col.type))
            b = b.append_column(f"__nk{i}", fill)
        return b

    for i, (c, d) in enumerate(order):
        keys.append((f"__nf{i}", False))  # nulls last, either direction
        keys.append((f"__nk{i}", d))
        tmp += [f"__nf{i}", f"__nk{i}"]
    out = ds.map_batches(prep, batch_format="pyarrow").sort(
        [k for k, _ in keys], descending=[d for _, d in keys])
    return out.map_batches(lambda b: b.drop_columns(tmp),
                           batch_format="pyarrow")


def _first_nonnull_sentinel(t: pa.DataType):
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ""
    if pa.types.is_floating(t):
        return 0.0
    if pa.types.is_integer(t):
        return 0
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return 0
    if pa.types.is_boolean(t):
        return False
    return 0


def _execute_one(q: dict, tables: dict):
    if "setop" in q:
        def _all_unionall(node):
            if "setop" not in node:
                return True
            return (node["setop"] == "unionall"
                    and _all_unionall(node["left"])
                    and _all_unionall(node["right"]))

        if _all_unionall(q):
            # pure UNION ALL chain: stream-union, NO exchange
            leaves = _flatten_setop_tree(q)
            parts = [_execute_one(leaf, tables) for leaf in leaves]
            names = _static_names(leaves[0])
            if names is None:
                names = parts[0].schema().names
            ds = parts[0].union(*[_rename_to(p_, names)
                                  for p_ in parts[1:]])
        else:
            ds = _execute_setop_tree(q, _flatten_setop_tree(q), tables)
        tail = q["tail"]
        if tail["order"]:
            ds = _null_safe_sort(ds, tail["order"])
        if tail["offset"]:
            ds = ds.split_at_indices([tail["offset"]])[1]
        if tail["limit"] is not None:
            ds = ds.limit(tail["limit"])
        return ds
    q = _resolve_subqueries_in_q(q, tables)
    if q.get("from_sub") is not None:
        tables = dict(tables)
        tables[q["table"]] = _execute_one(q["from_sub"], tables)
    ds = tables[q["table"]]
    funcs = dict(_CUSTOM_FUNCS)  # snapshot for worker-side closures

    special = _referenced_special_fields(q)
    if special:
        ds = _add_special_fields(ds, special)

    if q["joins"] and q["joins"][0][0] == "asof":
        if len(q["joins"]) != 1:
            raise NotImplementedError("ASOF JOIN chained with other joins")
        ds = _apply_asof_join(ds, q, tables)
        q = dict(q)
        q["joins"] = []

    if q["joins"]:
        ds, resolve = _apply_joins(ds, q, tables)
        q = dict(q)
        q["items"] = [
            ((node if node == "star" else _rewrite_cols(node, resolve)), name)
            for node, name in q["items"]
        ]
        if q["where"] is not None:
            q["where"] = _rewrite_cols(q["where"], resolve)
        if q.get("having") is not None:
            q["having"] = _rewrite_cols(q["having"], resolve)
        if q.get("qualify") is not None:
            q["qualify"] = _rewrite_cols(q["qualify"], resolve)
        if q["group"]:
            q["group"] = [resolve(g) for g in q["group"]]
        q["order"] = [(resolve(c), d) for c, d in q["order"]]

    if q["where"] is not None:
        where = q["where"]

        def filt(b: pa.Table) -> pa.Table:
            mask = _eval_with_funcs(where, b, funcs)
            if isinstance(mask, pa.Scalar):  # constant predicate (EXISTS)
                return b if mask.as_py() else b.slice(0, 0)
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
            return b.filter(pc.fill_null(mask, False))

        ds = ds.map_batches(filt, batch_format="pyarrow")

    items = q["items"]
    has_agg = any(
        it[0] != "star" and _has_agg(it[0]) for it in items
    )

    wins = []
    for node, _ in items:
        if node != "star" and not (isinstance(node, tuple) and node[0] == "star_except"):
            _collect_wins(node, wins)
    if q.get("qualify") is not None:
        # QUALIFY may reference select-list aliases (DuckDB): substitute
        # the aliased expressions before collecting window nodes
        alias_map = {name: node for node, name in items
                     if name is not None and node != "star"}

        def subst(node):
            if isinstance(node, tuple):
                if node and node[0] == "col" and node[1] in alias_map:
                    return alias_map[node[1]]
                return tuple(subst(x) for x in node)
            if isinstance(node, list):
                return [subst(x) for x in node]
            return node

        q = dict(q)
        q["qualify"] = subst(q["qualify"])
        _collect_wins(q["qualify"], wins)
        if not wins:
            raise ValueError("QUALIFY requires a window function")
        if q["group"] or has_agg:
            raise NotImplementedError("QUALIFY with GROUP BY/aggregates")
    temp_names: set = set()
    if wins:
        # ANSI window lowering: one bucketed shuffle per distinct OVER
        # clause (stages/window.py), results land in __w{i} columns the
        # projection then references.  WHERE already ran (SQL order).
        if q["group"] or has_agg:
            raise NotImplementedError("window functions mixed with GROUP BY/aggregates")
        from gdal_ray.stages.window import window_apply

        uniq: list = []
        for wnode in wins:
            if wnode not in uniq:
                uniq.append(wnode)
        mapping: dict = {}
        argcols: dict = {}
        by_clause: dict = {}
        for i, wnode in enumerate(uniq):
            _, fn, arg, offset, partn, order, frame = wnode
            mapping[wnode] = f"__w{i}"
            if arg is None:
                acol = None
            elif arg[0] == "col":
                acol = arg[1]
            else:
                acol = f"__warg{i}"
                argcols[acol] = arg
            by_clause.setdefault((partn, order), []).append(
                (f"__w{i}", fn, acol, offset, frame))
        if argcols:
            def add_args(b: pa.Table, _argcols=argcols) -> pa.Table:
                for name, node in _argcols.items():
                    v = _eval_with_funcs(node, b, funcs)
                    if isinstance(v, pa.Scalar):
                        v = pa.array([v.as_py()] * len(b))
                    b = b.append_column(name, v)
                return b

            ds = ds.map_batches(add_args, batch_format="pyarrow")
        for (partn, order), specs in by_clause.items():
            ds = window_apply(ds, partition=list(partn), order=list(order),
                              specs=specs)
        if q.get("qualify") is not None:
            qnode = _rewrite_wins(q["qualify"], mapping)

            def qfilt(b: pa.Table, _qn=qnode) -> pa.Table:
                mask = _eval_with_funcs(_qn, b, funcs)
                if isinstance(mask, pa.Scalar):
                    return b if mask.as_py() else b.slice(0, 0)
                if isinstance(mask, pa.ChunkedArray):
                    mask = mask.combine_chunks()
                return b.filter(pc.fill_null(mask, False))

            ds = ds.map_batches(qfilt, batch_format="pyarrow")
        items = [
            (node if node == "star" or (isinstance(node, tuple) and node[0] == "star_except")
             else _rewrite_wins(node, mapping), name)
            for node, name in items
        ]
        temp_names = set(mapping.values()) | set(argcols)

    if q["group"] or has_agg:
        if q.get("distinct"):
            raise NotImplementedError("SELECT DISTINCT with aggregates")
        if _has_stragg(q["items"]):
            ds = _execute_stragg(ds, q, funcs)
        elif _has_pdisc(q["items"]):
            ds = _execute_pdisc(ds, q, funcs)
        elif q.get("rollup"):
            ds = _execute_rollup(ds, q, funcs)
        else:
            ds = _execute_aggregate(ds, q, funcs)
    elif q.get("having") is not None:
        raise ValueError("HAVING requires GROUP BY")
    elif any(isinstance(n, tuple) and n[0] == "call" and n[1] == "UNNEST"
             for n, _ in items):
        # UNNEST in the select list (DuckDB semantics): the list expression
        # expands to one row per element; sibling columns repeat via
        # list_parent_indices — a pure per-batch flat map, no shuffle.
        un = [idx for idx, (n, _) in enumerate(items)
              if isinstance(n, tuple) and n[0] == "call" and n[1] == "UNNEST"]
        if len(un) != 1:
            raise NotImplementedError("one UNNEST per select list")
        if any(n == "star" or (isinstance(n, tuple) and n[0] == "star_except")
               for n, _ in items):
            raise NotImplementedError("UNNEST with * (name the columns)")
        u = un[0]
        inner_node = items[u][0][2][0]

        def project_unnest(b: pa.Table) -> pa.Table:
            inner = _eval_with_funcs(inner_node, b, funcs)
            if isinstance(inner, pa.ChunkedArray):
                inner = inner.combine_chunks()
            parent = pc.list_parent_indices(inner)
            flat = pc.list_flatten(inner)
            cols, names = [], []
            for idx, (node, name) in enumerate(items):
                if idx == u:
                    v = flat
                else:
                    v = _eval_with_funcs(node, b, funcs)
                    if isinstance(v, pa.Scalar):
                        v = pa.array([v.as_py()] * len(b))
                    if isinstance(v, pa.ChunkedArray):
                        v = v.combine_chunks()
                    v = pc.take(v, parent)
                cols.append(v)
                names.append(name or _default_name(node, idx))
            return pa.table(dict(zip(names, cols)))

        ds = ds.map_batches(project_unnest, batch_format="pyarrow")
        if q.get("distinct"):
            from gdal_ray.stages.agg import grouped_aggregate

            names = [name or _default_name(node, idx)
                     for idx, (node, name) in enumerate(items)]
            ds = grouped_aggregate(ds, names, [(names[0], "count", "__n")])
            ds = ds.drop_columns(["__n"]).map_batches(
                lambda b: b.select(names), batch_format="pyarrow")
    else:
        def project(b: pa.Table) -> pa.Table:
            cols, names = [], []
            for idx, (node, name) in enumerate(items):
                if node == "star" or (isinstance(node, tuple) and node[0] == "star_except"):
                    skip = set(node[1]) if node != "star" else set()
                    skip |= temp_names  # window temp columns never surface
                    for n in b.column_names:
                        if n in skip:
                            continue
                        cols.append(b.column(n))
                        names.append(n)
                    continue
                v = _eval_with_funcs(node, b, funcs)
                if isinstance(v, pa.Scalar):
                    v = pa.array([v.as_py()] * len(b))
                cols.append(v)
                names.append(name or _default_name(node, idx))
            return pa.table(dict(zip(names, cols)))

        ds = ds.map_batches(project, batch_format="pyarrow")
        if q.get("distinct"):
            # SWQM_DISTINCT_LIST (ogr_swq.h:322) generalized to the full
            # select list: exact dedup via one hash-bucket group exchange
            from gdal_ray.stages.agg import grouped_aggregate

            if any(it[0] == "star" or (isinstance(it[0], tuple) and it[0][0] == "star_except")
                   for it in items):
                raise NotImplementedError("SELECT DISTINCT * (name the columns)")
            names = [name or _default_name(node, idx)
                     for idx, (node, name) in enumerate(items)]
            ds = grouped_aggregate(ds, names, [(names[0], "count", "__n")])
            ds = ds.drop_columns(["__n"]).map_batches(
                lambda b: b.select(names), batch_format="pyarrow")

    if q["order"]:
        ds = _null_safe_sort(ds, q["order"])
    if q.get("offset"):
        # OFFSET skips rows of the (ordered) result: split the stream at the
        # row index — distributed, no driver materialization
        ds = ds.split_at_indices([q["offset"]])[1]
    if q["limit"] is not None:
        ds = ds.limit(q["limit"])
    return ds


def _has_agg(node):
    out = []
    _collect_aggs(node, out)
    return bool(out)


def _has_stragg(items) -> bool:
    def walk(node):
        if isinstance(node, tuple):
            if node and node[0] == "agg" and node[1] == "STRAGG":
                return True
            return any(walk(x) for x in node)
        return False

    return any(walk(n) for n, _ in items if n != "star")


def _execute_stragg(ds, q, funcs=None):
    """STRING_AGG path: shuffle (group, value, order-key) rows once by
    the group keys, then a per-group vectorized sort + join.  Every
    select item must be a group key or [CAST of] STRING_AGG; grouped-
    result contract (one row per group).  Ties on the ORDER BY key
    resolve by value (deterministic)."""
    group = q["group"]
    if not group:
        raise NotImplementedError("STRING_AGG needs GROUP BY")
    if q.get("having") is not None or q.get("rollup"):
        raise NotImplementedError("STRING_AGG with HAVING/ROLLUP")
    plan = []  # (kind, out_name, expr, sep, okey, odesc)
    for idx, (node, name) in enumerate(q["items"]):
        inner = node
        if isinstance(inner, tuple) and inner[0] == "cast":
            inner = inner[1]
        if isinstance(inner, tuple) and inner[0] == "col"                 and inner[1] in group:
            plan.append(("key", inner[1], None, None, None, None))
            continue
        if isinstance(inner, tuple) and inner[0] == "agg"                 and inner[1] == "STRAGG":
            e, sep, okey, odesc = inner[2]
            plan.append(("sa", name or _default_name(node, idx),
                         e, sep, okey, odesc))
            continue
        if isinstance(inner, tuple) and inner[0] == "agg" and (
                inner[1] in ("COUNT", "SUM", "MIN", "MAX", "AVG")):
            plan.append(("agg", name or _default_name(node, idx),
                         inner[2], inner[1], None, None))
            continue
        raise NotImplementedError(
            "STRING_AGG queries: every item must be a group key, a "
            "STRING_AGG, or a plain aggregate")
    fsnap = funcs or {}
    aggs = [p_ for p_ in plan if p_[0] == "sa"]
    plain = [p_ for p_ in plan if p_[0] == "agg"]

    def prep(b: pa.Table) -> pa.Table:
        cols = {g: b.column(g) for g in group}
        for i, (_k, _n, e, _s, okey, _d) in enumerate(aggs):
            v = _eval_with_funcs(e, b, fsnap)
            if isinstance(v, pa.Scalar):
                v = pa.array([v.as_py()] * len(b))
            cols[f"__sv{i}"] = pc.cast(v, pa.string())
            if okey is not None:
                ov = _eval_with_funcs(okey, b, fsnap)
                if isinstance(ov, pa.Scalar):
                    ov = pa.array([ov.as_py()] * len(b))
                cols[f"__so{i}"] = ov
        for i, (_k, _n, e, fn, _o, _d) in enumerate(plain):
            if e is None:  # COUNT(*)
                cols[f"__pa{i}"] = pa.array(np.ones(len(b), np.int64))
            else:
                v = _eval_with_funcs(e, b, fsnap)
                if isinstance(v, pa.Scalar):
                    v = pa.array([v.as_py()] * len(b))
                cols[f"__pa{i}"] = v
        return pa.table(cols)

    prepped = ds.map_batches(prep, batch_format="pyarrow")

    def concat(g: pa.Table) -> pa.Table:
        out = {k: [g.column(k)[0]] for k in group}
        for i, (_k, out_name, _e, sep, okey, odesc) in enumerate(aggs):
            sv = g.column(f"__sv{i}")
            if okey is not None:
                order = pc.sort_indices(
                    g.select([f"__so{i}", f"__sv{i}"]),
                    sort_keys=[(f"__so{i}",
                                "descending" if odesc else "ascending"),
                               (f"__sv{i}", "ascending")])
                sv = sv.take(order)
            vals = [v for v in sv.to_pylist() if v is not None]
            out[out_name] = [sep.join(vals)]
        for i, (_k, out_name, e, fn, _o, _d) in enumerate(plain):
            col = g.column(f"__pa{i}")
            if fn == "COUNT":
                out[out_name] = [int(len(col) - col.null_count)]
            elif fn == "SUM":
                out[out_name] = [pc.sum(col).as_py()]
            elif fn == "AVG":
                out[out_name] = [pc.mean(col).as_py()]
            else:
                out[out_name] = [getattr(pc, fn.lower())(col).as_py()]
        names = [p_[1] for p_ in plan]
        return pa.table({n: pa.array(out[n]) for n in names})

    return prepped.groupby(list(group)).map_groups(
        concat, batch_format="pyarrow")


def _has_pdisc(items) -> bool:
    def walk(node):
        if isinstance(node, tuple):
            if node and node[0] == "agg" and node[1] == "PDISC":
                return True
            return any(walk(x) for x in node)
        return False

    return any(walk(n) for n, _ in items if n != "star")


_SPECIAL_FIELDS = ("FID", "OGR_GEOMETRY", "OGR_GEOM_WKT", "OGR_GEOM_AREA")


def _referenced_special_fields(q) -> list[str]:
    """OGR SQL special fields (ogr_gensql.cpp / ogr_swq.h SWQ special
    field indices): FID (stable row id), OGR_GEOMETRY (type name),
    OGR_GEOM_WKT, OGR_GEOM_AREA — computed lazily only when referenced,
    over tables carrying a `wkb` geometry column."""
    cols: list = []
    for node, _ in q["items"]:
        if node != "star":
            _collect_cols(node, cols)
    for part in (q.get("where"), q.get("having"), q.get("qualify")):
        if part is not None:
            _collect_cols(part, cols)
    for c, _ in q.get("order", []):
        cols.append(c)
    return [f for f in _SPECIAL_FIELDS if f in set(cols)]


def _add_special_fields(ds, fields: list[str]):
    def add(b: pa.Table) -> pa.Table:
        n = len(b)
        if "FID" in fields:
            # stable content-free id is impossible batch-locally; OGR's
            # FID is the read order — use a per-batch hash-free running
            # id seeded by the batch's first wkb bytes? NO: keep honest —
            # FID requires a source that provides it; raise if absent
            if "fid" in b.column_names:
                b = b.append_column("FID", b.column("fid"))
            else:
                raise NotImplementedError(
                    "FID special field needs a source 'fid' column")
        if not any(f in fields for f in _SPECIAL_FIELDS[1:]):
            return b
        if "wkb" not in b.column_names:
            raise ValueError("OGR_GEOM_* special fields need a 'wkb' column")
        from gdal_ray.geometry.predicates import polygon_area
        from gdal_ray.geometry.wkb import polygon_parts
        from gdal_ray.geometry.wkt import wkb_to_wkt

        wkbs = b.column("wkb").to_pylist()
        if "OGR_GEOMETRY" in fields:
            def tname(w):
                g = int.from_bytes(w[1:5], "little" if w[0] else "big")
                return {1: "POINT", 2: "LINESTRING", 3: "POLYGON",
                        4: "MULTIPOINT", 5: "MULTILINESTRING",
                        6: "MULTIPOLYGON"}.get(g & 0xFF, f"GEOMETRY{g}")

            b = b.append_column(
                "OGR_GEOMETRY", pa.array([tname(w) for w in wkbs]))
        if "OGR_GEOM_WKT" in fields:
            b = b.append_column(
                "OGR_GEOM_WKT", pa.array([wkb_to_wkt(w) for w in wkbs]))
        if "OGR_GEOM_AREA" in fields:
            areas = []
            for w in wkbs:
                try:
                    a = sum(polygon_area(r) for r in polygon_parts(w))
                except Exception:
                    a = 0.0  # non-areal geometry: OGR returns 0
                areas.append(a)
            b = b.append_column("OGR_GEOM_AREA",
                                pa.array(areas, pa.float64()))
        return b

    return ds.map_batches(add, batch_format="pyarrow")


def _execute_pdisc(ds, q, funcs=None):
    """Ordered-set aggregate path: every select item must be a group key
    or [CAST of] PERCENTILE_DISC — lowered to exact_group_quantiles (one
    streaming histogram-selection per distinct ORDER BY expression; NO
    sort).  Mixing with other aggregates raises loudly."""
    from gdal_ray.stages.quantile import exact_group_quantiles

    group = q["group"]
    if not group:
        raise NotImplementedError("PERCENTILE_DISC needs GROUP BY")
    if q.get("having") is not None or q.get("rollup"):
        raise NotImplementedError("PERCENTILE_DISC with HAVING/ROLLUP")
    plan = []  # (out_name, q, expr)
    for idx, (node, name) in enumerate(q["items"]):
        inner = node
        if isinstance(inner, tuple) and inner[0] == "cast":
            inner = inner[1]
        if isinstance(inner, tuple) and inner[0] == "col"                 and inner[1] in group:
            plan.append(("key", inner[1], None, None))
            continue
        if isinstance(inner, tuple) and inner[0] == "agg"                 and inner[1] == "PDISC":
            qv, oexpr = inner[2]
            plan.append(("pd", name or _default_name(node, idx), qv, oexpr))
            continue
        raise NotImplementedError(
            "PERCENTILE_DISC queries: every item must be a group key or "
            "a PERCENTILE_DISC aggregate")

    # one temp value column per distinct ORDER BY expression
    exprs = []
    for kind, _n, _qv, oe in plan:
        if kind == "pd" and oe not in exprs:
            exprs.append(oe)
    fsnap = funcs or {}

    def addvals(b: pa.Table) -> pa.Table:
        for i, oe in enumerate(exprs):
            v = _eval_with_funcs(oe, b, fsnap)
            if isinstance(v, pa.Scalar):
                v = pa.array([v.as_py()] * len(b))
            b = b.append_column(f"__pd{i}", pc.cast(v, pa.float64()))
        return b

    vds = ds.map_batches(addvals, batch_format="pyarrow")

    frames = []
    for i, oe in enumerate(exprs):
        qs = []
        for kind, _n, qv, oe2 in plan:
            if kind == "pd" and oe2 == oe and qv not in qs:
                qs.append(qv)
        t = exact_group_quantiles(vds, f"__pd{i}", qs, list(group))
        df = t.to_pandas().rename(columns={
            f"p{int(round(qv2 * 100))}": f"__e{i}_p{int(round(qv2 * 100))}"
            for qv2 in qs})
        frames.append(df)

    # assemble driver-side (one row per group — grouped-result contract)
    base = frames[0]
    for df in frames[1:]:
        base = base.merge(df, on=list(group), how="outer")
    cols = {}
    for kind, name, qv, oe in plan:
        if kind == "key":
            cols[name] = base[name]
        else:
            i = exprs.index(oe)
            cols[name] = base[f"__e{i}_p{int(round(qv * 100))}"]
    import pandas as pd

    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(cols),
                                              preserve_index=False))


def _execute_rollup(ds, q, funcs=None):
    """GROUP BY ROLLUP(a, b, ...) (prefix grouping sets) or CUBE(...)
    (all-subset grouping sets): one hash-bucket aggregate PER set, dropped keys
    re-added as typed nulls, arms unioned.  HAVING applies per grouping
    set (ANSI).  Contract: rolled-up group columns appear in the select
    list only as bare columns (expressions of them raise)."""
    group = q["group"]
    schema = ds.schema().base_schema
    gtypes = {c: schema.field(c).type for c in group}

    def _uses_dropped(node, dropped):
        if isinstance(node, tuple):
            if node and node[0] == "col" and node[1] in dropped:
                return True
            return any(_uses_dropped(x, dropped) for x in node)
        if isinstance(node, list):
            return any(_uses_dropped(x, dropped) for x in node)
        return False

    if q["rollup"] == "cube":
        # CUBE: every subset of the group keys (2^k grouping sets)
        import itertools

        sets = []
        for k in range(len(group), -1, -1):
            for combo in itertools.combinations(group, k):
                sets.append(list(combo))
    else:  # ROLLUP: prefixes
        sets = [group[:k] for k in range(len(group), -1, -1)]

    arms = []
    for keep in sets:
        dropped = set(group) - set(keep)
        items_k = []
        null_cols = []  # (position, name, type)
        for pos, (node, name) in enumerate(q["items"]):
            if isinstance(node, tuple) and node[0] == "col"                     and node[1] in dropped:
                null_cols.append((pos, name or node[1], gtypes[node[1]]))
                continue
            if node != "star" and _uses_dropped(node, dropped):
                raise NotImplementedError(
                    "ROLLUP: rolled-up key used inside an expression")
            items_k.append((node, name))
        arm_q = dict(q)
        arm_q.update(items=items_k, group=keep, rollup=False,
                     order=[], limit=None, offset=0)
        arm = _execute_aggregate(ds, arm_q, funcs)

        def add_nulls(b: pa.Table, _nc=tuple(null_cols)) -> pa.Table:
            for pos, name, typ in _nc:
                b = b.add_column(min(pos, b.num_columns), name,
                                 pa.nulls(len(b), typ))
            return b

        if null_cols:
            arm = arm.map_batches(add_nulls, batch_format="pyarrow")
        arms.append(arm)
    return arms[0].union(*arms[1:])


def _execute_aggregate(ds, q, funcs=None):
    from gdal_ray.stages.agg import grouped_aggregate

    group = q["group"] or []
    items = q["items"]
    # assign each agg node a materialized input column, each select item a name
    agg_specs = []   # (input_col, fn, out_col)
    agg_nodes = []
    pre_cols = []    # (name, expr) computed per batch before grouping

    for idx, (node, name) in enumerate(items):
        if node == "star":
            raise ValueError("SELECT * not supported with GROUP BY")
        aggs_here = []
        _collect_aggs(node, aggs_here)
        if not aggs_here:
            if node[0] == "col" and node[1] in group:
                continue
            # GROUP BY <select alias> of an expression: materialize the
            # expression as a column under the alias before grouping
            alias = name or _default_name(node, idx)
            if alias in group:
                pre_cols.append((alias, node))
                continue
            raise ValueError("non-aggregate select item must be a GROUP BY column")
        post_cast = None
        if node[0] == "cast" and node[1][0] == "agg":
            post_cast = _CAST_TYPES[node[2]]
            node = node[1]
        if node[0] != "agg":
            raise ValueError("aggregate expressions must be top-level (e.g. SUM(x))")
        agg_nodes.append((node, name or _default_name(node, idx), post_cast))

    # HAVING: rewrite each aggregate in the predicate to the output column
    # of a matching SELECT aggregate, adding hidden aggregates (__h{i},
    # dropped by the final select) for ones the SELECT list doesn't compute
    having = q.get("having")
    if having is not None:
        h_aggs: list = []
        _collect_aggs(having, h_aggs)
        rewrites = {}
        for i, hn in enumerate(h_aggs):
            match = next((out for n2, out, _ in agg_nodes if n2 == hn), None)
            if match is None:
                match = f"__h{i}"
                agg_nodes.append((hn, match, None))
            rewrites[hn] = match
        having = _rewrite_agg_nodes(having, rewrites)

    fn_map = {"SUM": "sum", "MIN": "min", "MAX": "max", "AVG": "mean", "COUNT": "count"}
    post_casts = {}
    stddev_posts = []   # (out_name, s_col, q_col, n_col, sample)
    distinct_nodes = [n for n in agg_nodes if n[0][1] == "COUNT_DISTINCT"]
    if distinct_nodes:
        # SWQM_DISTINCT_LIST: two-stage exact distinct (group ∪ value,
        # then count per group).  Scoped to the sole aggregate in the
        # SELECT — matching the reference's single-target DISTINCT mode.
        if len(agg_nodes) != 1:
            raise ValueError(
                "COUNT(DISTINCT ...) must be the only aggregate in the SELECT"
            )
        return _execute_count_distinct(ds, q, agg_nodes[0], funcs)
    for j, (node, out_name, post_cast) in enumerate(agg_nodes):
        _, fn, arg = node
        if post_cast is not None:
            post_casts[out_name] = post_cast
        if fn in ("STDDEV_POP", "STDDEV_SAMP"):
            # lowered to (Σx, Σx², n) partials — the same decomposition
            # ogr_gensql.cpp uses for its streaming STDDEV evaluation
            s, qq, n = f"__sd{j}_s", f"__sd{j}_q", f"__sd{j}_n"
            pre_cols.append((s, ("cast", arg, "DOUBLE")))
            pre_cols.append((qq, ("cast", ("bin", "*", arg, arg), "DOUBLE")))
            agg_specs.append((s, "sum", s))
            agg_specs.append((qq, "sum", qq))
            agg_specs.append((s, "count", n))
            stddev_posts.append((out_name, s, qq, n, fn == "STDDEV_SAMP"))
            continue
        if arg is None:  # COUNT(*)
            in_col = "__one"
            pre_cols.append((in_col, ("lit", 1)))
        elif arg[0] == "col":
            in_col = arg[1]
        else:
            in_col = f"__a{j}"
            pre_cols.append((in_col, arg))
        agg_specs.append((in_col, fn_map[fn], out_name))

    def prep(b: pa.Table) -> pa.Table:
        cols = {}
        for name, expr in pre_cols:
            v = _eval_with_funcs(expr, b, funcs)
            if isinstance(v, pa.Scalar):
                v = pa.array([v.as_py()] * len(b), pa.int64())
            cols[name] = v
        for g in group:
            if g not in cols:  # plain source column (vs select-alias exprs)
                cols[g] = b.column(g)
        for spec in agg_specs:
            if spec[0] not in cols:
                cols[spec[0]] = b.column(spec[0])
        return pa.table(cols)

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    if group:
        out = grouped_aggregate(prepped, group, agg_specs)
    else:
        def add_key(b: pa.Table) -> pa.Table:
            return b.append_column("__k", pa.array(np.zeros(len(b), np.int64)))

        out = grouped_aggregate(prepped.map_batches(add_key, batch_format="pyarrow"),
                                ["__k"], agg_specs)
        out = out.drop_columns(["__k"])
    # order output columns as written in the SELECT list; honour aliases on
    # plain group columns ("SELECT g AS grp ... GROUP BY g" emits "grp")
    names, renames = [], {}
    for idx, (node, name) in enumerate(items):
        if node[0] == "col" and not _has_agg(node):
            names.append(node[1])
            if name is not None and name != node[1]:
                renames[node[1]] = name
        else:
            names.append(name or _default_name(node, idx))

    def reorder(b: pa.Table) -> pa.Table:
        for out_name, s, qq, n, sample in stddev_posts:
            sv = b.column(s).to_numpy().astype(np.float64)
            qv = b.column(qq).to_numpy().astype(np.float64)
            nv = b.column(n).to_numpy().astype(np.float64)
            m2 = qv - sv * sv / nv
            denom = np.maximum(nv - 1.0, 1.0) if sample else nv
            var = np.maximum(m2, 0.0) / denom
            if sample:  # STDDEV_SAMP of a single row is NULL
                var = np.where(nv > 1.0, var, np.nan)
            b = b.append_column(out_name, pa.array(np.sqrt(var), pa.float64()))
        if having is not None:
            mask = _eval_with_funcs(having, b, funcs)
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
            b = b.filter(pc.fill_null(mask, False))
        b = b.select(names)
        if renames:
            b = b.rename_columns([renames.get(n, n) for n in b.column_names])
        for nm, ty in post_casts.items():
            i = b.schema.get_field_index(nm)
            b = b.set_column(i, nm, pc.cast(b.column(nm), ty))
        return b

    return out.map_batches(reorder, batch_format="pyarrow")


def _execute_count_distinct(ds, q, agg_node, funcs=None):
    """COUNT(DISTINCT expr) [GROUP BY g...]: exact two-stage distinct —
    groupby(group ∪ value) first-wins, then count per group (the plan
    q_count_distinct uses; one extra exchange, no per-group sets)."""
    from gdal_ray.stages.agg import grouped_aggregate

    group = q["group"] or []
    node, out_name, post_cast = agg_node
    arg = node[2]
    items = q["items"]

    def prep(b: pa.Table) -> pa.Table:
        cols = {g: b.column(g) for g in group}
        v = _eval_with_funcs(arg, b, funcs)
        if isinstance(v, pa.Scalar):
            v = pa.array([v.as_py()] * len(b))
        cols["__dv"] = v
        cols["__one"] = pa.array(np.ones(len(b), np.int64))
        return pa.table(cols)

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    d1 = grouped_aggregate(prepped, group + ["__dv"], [("__one", "count", "__c")])
    if group:
        out = grouped_aggregate(d1, group, [("__c", "count", out_name)])
    else:
        def add_key(b: pa.Table) -> pa.Table:
            return b.append_column("__k", pa.array(np.zeros(len(b), np.int64)))

        out = grouped_aggregate(
            d1.map_batches(add_key, batch_format="pyarrow"),
            ["__k"], [("__c", "count", out_name)],
        ).drop_columns(["__k"])

    names, renames = [], {}
    for idx, (n_node, name) in enumerate(items):
        if n_node[0] == "col" and not _has_agg(n_node):
            names.append(n_node[1])
            if name is not None and name != n_node[1]:
                renames[n_node[1]] = name
        else:
            names.append(name or _default_name(n_node, idx))

    def reorder(b: pa.Table) -> pa.Table:
        b = b.select(names)
        if renames:
            b = b.rename_columns([renames.get(n, n) for n in b.column_names])
        if post_cast is not None:
            i = b.schema.get_field_index(renames.get(out_name, out_name))
            nm = b.column_names[i]
            b = b.set_column(i, nm, pc.cast(b.column(nm), post_cast))
        return b

    return out.map_batches(reorder, batch_format="pyarrow")
