"""Mini-compiler for the reference's query-string surface (SURVEY.md §2.6).

The reference accepts three kinds of user strings
(/root/reference/src/service/interface/interfaces.ts:176-331):

* ``join_condition`` — free-form boolean over ``geometry_target`` /
  ``geometry_source`` using the PostGIS vocabulary observed in
  /root/reference/test/unit/spatial-query.test.ts:19,111,135:
  ``ST_Intersects(ST_Buffer(geometry_target, 2), geometry_source)``,
  ``degrees(ST_Angle(geometry_target, geometry_source)) < 30``.
* ``join_filter_target`` / ``join_filter_source`` — column comparisons
  (``=,!=,>,<,>=,<=``; interfaces.ts:97) where unknown columns read the
  JSON properties bag (interfaces.ts:100-102).
* ``aggregate`` — entries like ``ARRAY_AGG(highway) as lamps``, parsed to
  an AST in the reference via node-sql-parser (interfaces.ts:364-420)
  with virtual-column rewrites (``_id`` -> ``<dim>_id``, ``_u_id``/
  ``_v_id`` -> ``orig_node_id``/``dest_node_id``, interfaces.ts:398-405).

Here each string is parsed (hand-rolled recursive descent — no string
SQL is ever executed) into either a Spark ``Column`` (filters,
aggregates: pure Catalyst, JVM-evaluated) or a ``SpatialPredicate`` — a
small AST the two-phase join evaluates vectorized in the refine kernel,
plus the candidate-distance bound extracted from its ``ST_Buffer`` /
``ST_DWithin`` terms.

Input hygiene mirrors interfaces.ts:71-93 (keyword denylist + whitespace
collapse), upgraded to an allowlist grammar: anything unparseable is an
InputException, matching the reference's error taxonomy
(spatial-query.test.ts:153-185).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, functions as F

from .schema import DIMENSIONS


class InputException(ValueError):
    """Bad user input (mirrors the reference's InputException)."""


_FORBIDDEN = re.compile(
    r";|\b(drop|delete|update|insert|alter|create|truncate)\b", re.IGNORECASE)


def check_hygiene(s: str) -> str:
    """Denylist + whitespace collapse (interfaces.ts:71-93,146-170)."""
    if s and _FORBIDDEN.search(s):
        raise InputException(f"forbidden keyword in input: {s!r}")
    return re.sub(r"\s+", " ", s or "").strip()


# ---------------------------------------------------------------------------
# Tokenizer / recursive-descent parser -> tuple AST
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"""
    \s*(
        >=|<=|!=|<>|=|>|<
      | \(|\)|,
      | '(?:[^']*)'
      | "(?:[^"]*)"
      | [A-Za-z_][A-Za-z0-9_:.]*
      | -?\d+\.?\d*(?:[eE][+-]?\d+)?
    )""", re.VERBOSE)


def _tokenize(s: str) -> list[str]:
    toks, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise InputException(f"cannot parse input near {s[pos:pos+20]!r}")
        toks.append(m.group(1))
        pos = m.end()
    return toks


class _Parser:
    """expr := and_expr (OR and_expr)* ; and_expr := cmp (AND cmp)* ;
    cmp := term ((=|!=|<|>|<=|>=) term)? ; term := func(...) | ident |
    number | 'string' | (expr)"""

    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise InputException("unexpected end of expression")
        self.i += 1
        return t

    def parse(self):
        node = self.expr()
        if self.peek() is not None:
            raise InputException(f"unexpected trailing token {self.peek()!r}")
        return node

    def expr(self):
        node = self.and_expr()
        while self.peek() and self.peek().lower() == "or":
            self.next()
            node = ("or", node, self.and_expr())
        return node

    def and_expr(self):
        node = self.cmp()
        while self.peek() and self.peek().lower() == "and":
            self.next()
            node = ("and", node, self.cmp())
        return node

    def cmp(self):
        left = self.term()
        t = self.peek()
        if t in (">=", "<=", "!=", "<>", "=", ">", "<"):
            op = self.next()
            right = self.term()
            return ("cmp", "!=" if op == "<>" else op, left, right)
        return left

    def term(self):
        t = self.next()
        if t == "(":
            node = self.expr()
            if self.next() != ")":
                raise InputException("expected ')'")
            return node
        if t.startswith("'") or t.startswith('"'):
            return ("str", t[1:-1])
        if re.fullmatch(r"-?\d+\.?\d*(?:[eE][+-]?\d+)?", t):
            return ("num", float(t))
        if self.peek() == "(":
            self.next()
            args = []
            if self.peek() != ")":
                args.append(self.expr())
                while self.peek() == ",":
                    self.next()
                    args.append(self.expr())
            if self.next() != ")":
                raise InputException("expected ')' after function args")
            return ("func", t.lower(), args)
        return ("ident", t)


def parse_expression(s: str):
    return _Parser(_tokenize(check_hygiene(s))).parse()


# ---------------------------------------------------------------------------
# Spatial predicate (join_condition) compilation
# ---------------------------------------------------------------------------

_SPATIAL_FUNCS = {"st_intersects", "st_buffer", "st_dwithin", "st_distance",
                  "st_angle", "degrees", "st_contains", "st_within",
                  "st_crosses", "st_touches"}


@dataclass
class SpatialPredicate:
    """Compiled join_condition: AST for the refine kernel + the candidate
    distance bound (meters; math.inf => no proximity bound => the join
    must fall back to an unbounded candidate strategy, exactly as the
    reference's pure-angle predicate does in PostGIS)."""
    ast: tuple
    bound_m: float
    text: str = ""
    needs: set[str] = field(default_factory=set)
    # {'dist', 'angle', 'contains_ts', 'contains_st', 'crosses', 'touches'}


def _validate_spatial(node, needs: set[str]) -> None:
    kind = node[0]
    if kind in ("and", "or"):
        _validate_spatial(node[1], needs)
        _validate_spatial(node[2], needs)
    elif kind == "cmp":
        _validate_spatial(node[2], needs)
        _validate_spatial(node[3], needs)
    elif kind == "func":
        name, args = node[1], node[2]
        if name not in _SPATIAL_FUNCS:
            raise InputException(f"unsupported function in join_condition: {name}")
        if name in ("st_distance", "st_dwithin", "st_intersects"):
            needs.add("dist")
        if name == "st_angle":
            needs.add("angle")
        if name in ("st_contains", "st_within"):
            needs.add(_contains_key(name, args))
        if name in ("st_crosses", "st_touches"):
            _check_two_geom_args(name, args)
            needs.add(name[3:])  # crosses / touches
        for a in args:
            _validate_spatial(a, needs)
    elif kind == "ident":
        if node[1].lower() not in ("geometry_target", "geometry_source"):
            raise InputException(
                f"only geometry_target/geometry_source allowed in join_condition, got {node[1]!r}")
    elif kind in ("num", "str"):
        pass
    else:  # pragma: no cover
        raise InputException(f"bad node {kind}")


def _check_two_geom_args(name: str, args) -> None:
    """ST_Crosses/ST_Touches take the two bare geometry sides in either
    order — both are symmetric for the engine's line-line scope
    (PostGIS line-line crosses/touches are symmetric relations)."""
    if (len(args) != 2 or any(a[0] != "ident" for a in args)
            or sorted(a[1].lower() for a in args)
            != ["geometry_source", "geometry_target"]):
        pretty = "ST_Crosses" if name == "st_crosses" else "ST_Touches"
        raise InputException(
            f"{pretty} takes exactly (geometry_target, geometry_source) "
            "or (geometry_source, geometry_target)")


def _contains_key(name: str, args) -> str:
    """Which ctx array ST_Contains/ST_Within reads: the container must
    be one bare geometry side and the contained the other (the engine's
    scope is polygon-side-contains-point-side; PostGIS ST_Within(a, b)
    == ST_Contains(b, a), interfaces.ts:278-279 accepts any boolean)."""
    if (len(args) != 2 or any(a[0] != "ident" for a in args)
            or sorted(a[1].lower() for a in args)
            != ["geometry_source", "geometry_target"]):
        raise InputException(
            "ST_Contains/ST_Within take exactly (geometry_target, "
            "geometry_source) or (geometry_source, geometry_target)")
    container = (args[0] if name == "st_contains" else args[1])[1].lower()
    return ("contains_ts" if container == "geometry_target"
            else "contains_st")


def _bound_of(node) -> float:
    """Candidate distance bound: a pair farther apart than this can never
    satisfy the predicate. AND takes the min of children (one bounded
    conjunct suffices); OR takes the max (all branches must be bounded)."""
    kind = node[0]
    if kind == "and":
        return min(_bound_of(node[1]), _bound_of(node[2]))
    if kind == "or":
        return max(_bound_of(node[1]), _bound_of(node[2]))
    if kind == "cmp":
        op, l, r = node[1], node[2], node[3]
        # ST_Distance(a,b) < d  /  d > ST_Distance(a,b)
        for a, b, flip in ((l, r, False), (r, l, True)):
            if (a[0] == "func" and a[1] == "st_distance" and b[0] == "num"):
                effective = {"<": "<", "<=": "<=", ">": ">", ">=": ">="}[op] if not flip else \
                    {"<": ">", "<=": ">=", ">": "<", ">=": "<="}[op]
                if effective in ("<", "<="):
                    return b[1]
        return math.inf
    if kind == "func":
        name, args = node[1], node[2]
        if name == "st_dwithin" and len(args) == 3 and args[2][0] == "num":
            return args[2][1]
        if name in ("st_contains", "st_within", "st_crosses",
                    "st_touches"):
            return 0.0
        if name == "st_intersects" and len(args) == 2:
            d = 0.0
            for a in args:
                if a[0] == "func" and a[1] == "st_buffer":
                    if len(a[2]) != 2 or a[2][1][0] != "num":
                        raise InputException("ST_Buffer needs (geometry, meters)")
                    d += a[2][1][1]
            return d
        return math.inf
    return math.inf


def compile_join_condition(s: str) -> SpatialPredicate:
    if not s or not s.strip():
        raise InputException("join_condition is required")
    ast = parse_expression(s)
    needs: set[str] = set()
    _validate_spatial(ast, needs)
    bound = _bound_of(ast)
    return SpatialPredicate(ast=ast, bound_m=bound, text=s, needs=needs)


def eval_spatial(node, ctx: dict):
    """Evaluate the predicate AST on a pair batch. ``ctx`` provides numpy
    arrays: 'dist' (min geometry-geometry distance, m) and 'angle'
    (acute angle between line orientations, deg). Returns numpy bool/float
    arrays. Buffered-geometry terms were already folded into 'dist'."""
    import numpy as np
    kind = node[0]
    if kind == "and":
        return eval_spatial(node[1], ctx) & eval_spatial(node[2], ctx)
    if kind == "or":
        return eval_spatial(node[1], ctx) | eval_spatial(node[2], ctx)
    if kind == "cmp":
        op = node[1]
        l = eval_spatial(node[2], ctx)
        r = eval_spatial(node[3], ctx)
        return {"=": lambda: l == r, "!=": lambda: l != r, "<": lambda: l < r,
                ">": lambda: l > r, "<=": lambda: l <= r, ">=": lambda: l >= r}[op]()
    if kind == "num":
        return node[1]
    if kind == "func":
        name, args = node[1], node[2]
        if name == "st_intersects":
            d = 0.0
            for a in args:
                if a[0] == "func" and a[1] == "st_buffer":
                    d += a[2][1][1]
            # touching counts as intersecting; buffered => within distance d.
            # polygon-area containment is folded into ctx['dist'] (0 inside).
            return ctx["dist"] <= d + 1e-9
        if name == "st_dwithin":
            return ctx["dist"] <= args[2][1] + 1e-9
        if name in ("st_contains", "st_within"):
            return ctx[_contains_key(name, args)]
        if name in ("st_crosses", "st_touches"):
            return ctx[name[3:]]
        if name == "st_distance":
            return ctx["dist"]
        if name == "st_angle":
            return np.radians(ctx["angle"])
        if name == "degrees":
            # exact degrees when wrapping ST_Angle (avoid deg->rad->deg
            # float drift at threshold values like 30.0)
            if args[0][0] == "func" and args[0][1] == "st_angle":
                return ctx["angle"]
            return np.degrees(eval_spatial(args[0], ctx))
    raise InputException(f"cannot evaluate node {node!r}")


# ---------------------------------------------------------------------------
# Column filters (join_filter_target / join_filter_source)
# ---------------------------------------------------------------------------


def _ident_to_col(name: str, columns: list[str], dim: str | None = None) -> Column:
    """Virtual-column rewrites (interfaces.ts:398-405) then fixed-column
    lookup, falling back to the props bag (interfaces.ts:100-102,392-395).
    Everything read from props is a string, matching JSONB ->> semantics."""
    low = name.lower()
    if dim is not None:
        pk = DIMENSIONS[dim]["pk"][0]
        if low == "_id":
            return F.col(pk)
        if low == "_u_id":
            return F.col("orig_node_id")
        if low == "_v_id":
            return F.col("dest_node_id")
    if name in columns:
        return F.col(name)
    if low.startswith("ext:"):
        return F.col("props").getItem(name[4:])
    return F.col("props").getItem(name)


def _compile_value(node, columns: list[str], dim: str | None):
    if node[0] == "ident":
        return _ident_to_col(node[1], columns, dim), True
    if node[0] == "str":
        return F.lit(node[1]), False
    if node[0] == "num":
        v = node[1]
        return F.lit(int(v) if v == int(v) else v), False
    raise InputException(f"unsupported filter term {node!r}")


def compile_filter(s: str, columns: list[str], dim: str | None = None) -> Column | None:
    """Filter string -> Spark Column (pure Catalyst). Comparisons against
    props-bag values compare as strings for =/!= and as doubles for
    ordering comparisons (JSONB ->> returns text; numeric compare is the
    practical meaning of e.g. ``confidence > 0.5``)."""
    if not s or not s.strip():
        return None
    ast = parse_expression(s)

    def build(node) -> Column:
        kind = node[0]
        if kind == "and":
            return build(node[1]) & build(node[2])
        if kind == "or":
            return build(node[1]) | build(node[2])
        if kind == "cmp":
            op, l, r = node[1], node[2], node[3]
            lc, _ = _compile_value(l, columns, dim)
            rc, _ = _compile_value(r, columns, dim)
            if op in (">", "<", ">=", "<=") and (l[0] == "num" or r[0] == "num"):
                lc = lc.cast("double") if l[0] == "ident" else lc
                rc = rc.cast("double") if r[0] == "ident" else rc
            return {"=": lc == rc, "!=": lc != rc, "<": lc < rc,
                    ">": lc > rc, "<=": lc <= rc, ">=": lc >= rc}[op]
        raise InputException(f"filters must be comparisons, got {node!r}")

    return build(ast)


# ---------------------------------------------------------------------------
# Aggregates (interfaces.ts:247-273,364-420)
# ---------------------------------------------------------------------------

_AGG_FUNCS = {
    "array_agg": F.collect_list,
    "collect_list": F.collect_list,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "sum": F.sum,
}

_AGG_RE = re.compile(
    r"^\s*([A-Za-z_]+)\s*\(\s*([A-Za-z_][A-Za-z0-9_:.]*|\*)\s*\)\s*(?:as\s+([A-Za-z_][A-Za-z0-9_]*))?\s*$",
    re.IGNORECASE)


@dataclass
class CompiledAggregate:
    func: str
    column: str
    alias: str

    def to_column(self, columns: list[str], dim: str | None) -> Column:
        fn = _AGG_FUNCS[self.func]
        if self.column == "*":
            if self.func != "count":
                raise InputException("only COUNT(*) supports '*'")
            return fn(F.lit(1)).alias(self.alias)
        col = _ident_to_col(self.column, columns, dim)
        # FILTER (WHERE col IS NOT NULL) parity (interfaces.ts:348-350):
        # collect_list drops nulls natively; count ignores nulls; min/max/
        # avg/sum ignore nulls — all match the reference's NULL filter.
        return fn(col).alias(self.alias)


def compile_aggregate(s: str) -> CompiledAggregate:
    s = check_hygiene(s)
    m = _AGG_RE.match(s)
    if not m:
        raise InputException(f"cannot parse aggregate {s!r}")
    func, col, alias = m.group(1).lower(), m.group(2), m.group(3)
    if func not in _AGG_FUNCS:
        raise InputException(f"unsupported aggregate function {func!r}")
    if alias is None:
        alias = col.replace(":", "_").replace(".", "_").replace("*", "all")
    return CompiledAggregate(func=func, column=col, alias=alias)
