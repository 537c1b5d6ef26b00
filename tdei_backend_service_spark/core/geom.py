"""Vectorized geometry kernels + minimal WKB codec (pure numpy).

The reference delegates every spatial predicate to PostGIS
(`ST_Intersects`, `ST_Buffer`, `ST_Angle`, distance-within — see
/root/reference/src/service/interface/interfaces.ts:278-279 and
/root/reference/test/unit/spatial-query.test.ts:19,111,135). Shapely is
unavailable in this environment, so the exact-refine phase of the
two-phase join uses these numpy kernels, batch-evaluated inside
Arrow-backed pandas UDFs (no per-row Python).

Geometries are stored as standard little-endian 2D WKB in BinaryType
columns (Point=1, LineString=2, Polygon=3). Ragged batches are held as a
flat ``coords`` array + ``offsets`` (CSR-style), so every kernel is a
pure array computation:

* ``point_polyline_dist``   — min distance from paired points to polylines
  (drives `ST_Intersects(ST_Buffer(line, d), point)`, kNN tagging)
* ``point_in_polygon``      — ray-casting PIP for paired points/polygons
* ``polyline_orientation``  — first->last vertex bearing (drives
  `degrees(ST_Angle(a, b)) < t` style predicates)
* ``bbox_intersects``       — envelope test for bbox extraction of
  line/polygon layers

Metric distances use an equirectangular local projection (meters), which
matches the reference's "predicates on pre-projected EPSG:3857 columns"
semantics near the equator (SURVEY.md §1.1).
"""

from __future__ import annotations

import struct

import numpy as np

from .cells import M_PER_DEG_LAT, M_PER_DEG_LON_EQ

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3


# ---------------------------------------------------------------------------
# WKB codec (little-endian, 2D only — all this engine writes or reads)
# ---------------------------------------------------------------------------


def wkb_point(lon: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, lon, lat)


def wkb_linestring(coords) -> bytes:
    coords = np.asarray(coords, dtype=np.float64)
    return struct.pack("<BII", 1, WKB_LINESTRING, len(coords)) + coords.tobytes()


def wkb_polygon(ring) -> bytes:
    """Single exterior ring; caller must close it (first == last)."""
    ring = np.asarray(ring, dtype=np.float64)
    return struct.pack("<BIII", 1, WKB_POLYGON, 1, len(ring)) + ring.tobytes()


class RaggedGeoms:
    """CSR batch of parsed geometries: coords (N,2) + offsets (M+1,).

    ``kinds[i]`` is the WKB geometry type. Polygons keep only the exterior
    ring (the engine never generates holes; a hole-bearing WKB raises).
    """

    __slots__ = ("coords", "offsets", "kinds")

    def __init__(self, coords: np.ndarray, offsets: np.ndarray, kinds: np.ndarray):
        self.coords = coords
        self.offsets = offsets
        self.kinds = kinds

    def __len__(self) -> int:
        return len(self.kinds)

    def n_points(self) -> np.ndarray:
        return np.diff(self.offsets)


def parse_wkb_batch(blobs) -> RaggedGeoms:
    """Parse an iterable of WKB byte strings into one ragged batch."""
    coords_parts: list[np.ndarray] = []
    offsets = [0]
    kinds = []
    total = 0
    for b in blobs:
        if b is None:
            kinds.append(0)
            offsets.append(total)
            continue
        b = bytes(b)
        if b[0] != 1:
            raise ValueError("only little-endian WKB supported")
        gtype = struct.unpack_from("<I", b, 1)[0] & 0xFF
        if gtype == WKB_POINT:
            c = np.frombuffer(b, dtype="<f8", count=2, offset=5).reshape(1, 2)
        elif gtype == WKB_LINESTRING:
            n = struct.unpack_from("<I", b, 5)[0]
            c = np.frombuffer(b, dtype="<f8", count=2 * n, offset=9).reshape(n, 2)
        elif gtype == WKB_POLYGON:
            nrings = struct.unpack_from("<I", b, 5)[0]
            if nrings != 1:
                raise ValueError("polygons with holes not supported")
            n = struct.unpack_from("<I", b, 9)[0]
            c = np.frombuffer(b, dtype="<f8", count=2 * n, offset=13).reshape(n, 2)
        else:
            raise ValueError(f"unsupported WKB geometry type {gtype}")
        coords_parts.append(c)
        total += len(c)
        kinds.append(gtype)
        offsets.append(total)
    coords = np.concatenate(coords_parts) if coords_parts else np.zeros((0, 2))
    return RaggedGeoms(coords.astype(np.float64, copy=False),
                       np.asarray(offsets, dtype=np.int64),
                       np.asarray(kinds, dtype=np.int64))


# ---------------------------------------------------------------------------
# Local metric projection
# ---------------------------------------------------------------------------


def to_local_m(lon: np.ndarray, lat: np.ndarray, lat0: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """Equirectangular meters relative to (0, 0) with cos(lat0) x-scale."""
    scale = M_PER_DEG_LON_EQ * np.cos(np.radians(lat0))
    return np.asarray(lon) * scale, np.asarray(lat) * M_PER_DEG_LAT


# ---------------------------------------------------------------------------
# Pair kernels (one point paired with one geometry per row)
# ---------------------------------------------------------------------------


def _pair_segments(geom_idx: np.ndarray, geoms: RaggedGeoms):
    """Expand (pair -> geometry) into (pair -> each segment of that geometry).

    Returns (pair_of_seg, a, b): per segment its owning pair row and the
    segment endpoints (n,2). Fully vectorized via repeat/cumsum.
    """
    npts = geoms.n_points()[geom_idx]
    nsegs = np.maximum(npts - 1, 0)
    pair_of_seg = np.repeat(np.arange(geom_idx.size, dtype=np.int64), nsegs)
    # index of each segment's first vertex in geoms.coords
    starts = geoms.offsets[:-1][geom_idx]
    seg_base = np.repeat(starts, nsegs)
    local = np.arange(nsegs.sum(), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(nsegs)[:-1]]), nsegs)
    first = seg_base + local
    a = geoms.coords[first]
    b = geoms.coords[first + 1]
    return pair_of_seg, a, b


def _seg_dist(px, py, a, b, sx, sy):
    """Point-to-segment distance (meters) for aligned arrays."""
    apx = (px - a[:, 0]) * sx
    apy = (py - a[:, 1]) * sy
    abx = (b[:, 0] - a[:, 0]) * sx
    aby = (b[:, 1] - a[:, 1]) * sy
    ab2 = abx * abx + aby * aby
    t = np.clip(np.divide(apx * abx + apy * aby, ab2,
                          out=np.zeros_like(ab2), where=ab2 > 0), 0.0, 1.0)
    dx = apx - t * abx
    dy = apy - t * aby
    return np.sqrt(dx * dx + dy * dy)


def point_polyline_dist(px: np.ndarray, py: np.ndarray, geom_idx: np.ndarray,
                        geoms: RaggedGeoms, lat0: float = 0.0) -> np.ndarray:
    """Per pair (point i, geometry geom_idx[i]): min point-to-segment
    distance in meters. Works for LineString and Polygon boundaries;
    a Point geometry (1 vertex, 0 segments) yields point-point distance.

    Two hot-path specializations (kNN tagging is the #2 stage cost at
    16M rows; VERDICT r1 #9): single-segment pairs — the common case for
    simple road edges — skip the segment expansion and the scatter-min
    entirely, and multi-segment pairs reduce with ``minimum.reduceat``
    over the contiguous per-pair segment runs instead of the much
    slower ``np.minimum.at`` scatter.
    """
    n = px.size
    out = np.full(n, np.inf, dtype=np.float64)
    sx = M_PER_DEG_LON_EQ * np.cos(np.radians(lat0))
    sy = M_PER_DEG_LAT

    npts_all = geoms.n_points()[geom_idx]
    nsegs = np.maximum(npts_all - 1, 0)
    single = np.flatnonzero(nsegs == 1)
    if single.size:
        first = geoms.offsets[:-1][geom_idx[single]]
        out[single] = _seg_dist(px[single], py[single],
                                geoms.coords[first], geoms.coords[first + 1],
                                sx, sy)
    multi = np.flatnonzero(nsegs > 1)
    if multi.size:
        pair_of_seg, a, b = _pair_segments(geom_idx[multi], geoms)
        d = _seg_dist(px[multi][pair_of_seg], py[multi][pair_of_seg],
                      a, b, sx, sy)
        # _pair_segments emits each pair's segments contiguously, so a
        # reduceat over the run starts replaces the scatter-min
        bounds = np.concatenate([[0], np.cumsum(nsegs[multi])[:-1]])
        out[multi] = np.minimum.reduceat(d, bounds)

    # degenerate geometries (single vertex => no segments): point distance
    npts = npts_all
    lone = np.flatnonzero(npts == 1)
    if lone.size:
        v = geoms.coords[geoms.offsets[:-1][geom_idx[lone]]]
        dx = (px[lone] - v[:, 0]) * sx
        dy = (py[lone] - v[:, 1]) * sy
        out[lone] = np.sqrt(dx * dx + dy * dy)
    return out


def point_in_polygon(px: np.ndarray, py: np.ndarray, geom_idx: np.ndarray,
                     geoms: RaggedGeoms) -> np.ndarray:
    """Per pair: ray-casting point-in-polygon (boundary counts as inside is
    NOT guaranteed — callers needing closed semantics combine with a
    distance-0 test). Polygons must be closed rings.
    """
    pair_of_seg, a, b = _pair_segments(geom_idx, geoms)
    inside = np.zeros(px.size, dtype=bool)
    if not pair_of_seg.size:
        return inside
    x = px[pair_of_seg]
    y = py[pair_of_seg]
    ay, by = a[:, 1], b[:, 1]
    ax, bx = a[:, 0], b[:, 0]
    cond = (ay > y) != (by > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = ax + (y - ay) / (by - ay) * (bx - ax)
    crosses = cond & (x < xin)
    # XOR-accumulate crossings per pair
    flips = np.zeros(px.size, dtype=np.int64)
    np.add.at(flips, pair_of_seg[crosses], 1)
    return (flips % 2) == 1


def pair_contains(cont_idx: np.ndarray, cont: RaggedGeoms,
                  pt_idx: np.ndarray, pts: RaggedGeoms) -> np.ndarray:
    """Per pair: polygon ``cont[cont_idx[i]]`` contains the point
    ``pts[pt_idx[i]]`` (ray-cast parity; boundary semantics undefined,
    same as point_in_polygon — fixtures keep points interior). Only
    polygons can contain; any other container kind contains nothing.
    The contained side must be single points — the engine's ST_Contains
    scope (zone-contains-point); anything else raises."""
    npts = pts.n_points()[pt_idx]
    if npts.size and (npts != 1).any():
        raise ValueError(
            "ST_Contains/ST_Within: the contained side must be points")
    p = pts.coords[pts.offsets[:-1][pt_idx]]
    out = np.zeros(pt_idx.size, dtype=bool)
    sub = np.flatnonzero(cont.kinds[cont_idx] == WKB_POLYGON)
    if sub.size:
        out[sub] = point_in_polygon(p[sub, 0], p[sub, 1], cont_idx[sub],
                                    cont)
    return out


def polyline_orientation(geoms: RaggedGeoms) -> np.ndarray:
    """Bearing (degrees in [0, 180)) of each geometry's first->last vertex
    chord — the segment-orientation notion behind the reference's
    `degrees(ST_Angle(a, b)) < 30` predicate (angle *between* two lines is
    the difference of orientations, folded to [0, 90])."""
    first = geoms.coords[geoms.offsets[:-1].clip(max=len(geoms.coords) - 1)]
    last_idx = np.maximum(geoms.offsets[1:] - 1, geoms.offsets[:-1])
    last = geoms.coords[last_idx.clip(max=len(geoms.coords) - 1)]
    ang = np.degrees(np.arctan2(last[:, 1] - first[:, 1], last[:, 0] - first[:, 0]))
    return np.mod(ang, 180.0)


def angle_between_deg(orient_a: np.ndarray, orient_b: np.ndarray) -> np.ndarray:
    """Acute angle between two line orientations, in [0, 90]."""
    d = np.abs(orient_a - orient_b) % 180.0
    return np.minimum(d, 180.0 - d)


def _seg_seg_dist(a0, a1, b0, b1, sx: float, sy: float) -> np.ndarray:
    """Min distance between segment pairs (n,2 arrays each), in meters.
    Zero if they properly intersect; else min of the 4 endpoint-to-segment
    distances. Fully vectorized."""
    scale = np.array([sx, sy])
    p, q = a0 * scale, a1 * scale
    r, s = b0 * scale, b1 * scale

    def cross(o, a, b):
        return (a[:, 0] - o[:, 0]) * (b[:, 1] - o[:, 1]) - (a[:, 1] - o[:, 1]) * (b[:, 0] - o[:, 0])

    d1 = cross(r, s, p)
    d2 = cross(r, s, q)
    d3 = cross(p, q, r)
    d4 = cross(p, q, s)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0)

    def pt_seg(pt, s0, s1):
        d = s1 - s0
        l2 = (d * d).sum(axis=1)
        t = np.clip(np.divide(((pt - s0) * d).sum(axis=1), l2,
                              out=np.zeros_like(l2), where=l2 > 0), 0, 1)
        proj = s0 + t[:, None] * d
        return np.sqrt(((pt - proj) ** 2).sum(axis=1))

    dist = np.minimum.reduce([pt_seg(p, r, s), pt_seg(q, r, s),
                              pt_seg(r, p, q), pt_seg(s, p, q)])
    dist[proper] = 0.0
    return dist


def pair_min_dist(idx_a: np.ndarray, geoms_a: RaggedGeoms,
                  idx_b: np.ndarray, geoms_b: RaggedGeoms,
                  lat0: float = 0.0) -> np.ndarray:
    """Per pair (geoms_a[idx_a[i]], geoms_b[idx_b[i]]): min distance in
    meters between the two geometries, any kind combination. Polygon
    interiors count (a point/geometry inside a polygon has distance 0).

    Vectorized via a full (segments_a x segments_b) expansion per pair —
    fine for street-scale geometries (2-5 vertices); candidate pruning
    keeps pair counts bounded.
    """
    sx = M_PER_DEG_LON_EQ * np.cos(np.radians(lat0))
    sy = M_PER_DEG_LAT
    n = idx_a.size
    out = np.full(n, np.inf)
    npts_a = geoms_a.n_points()[idx_a]
    npts_b = geoms_b.n_points()[idx_b]

    a_is_pt = npts_a == 1
    b_is_pt = npts_b == 1

    # point-point
    m = a_is_pt & b_is_pt
    if m.any():
        pa = geoms_a.coords[geoms_a.offsets[:-1][idx_a[m]]]
        pb = geoms_b.coords[geoms_b.offsets[:-1][idx_b[m]]]
        out[m] = np.sqrt(((pa[:, 0] - pb[:, 0]) * sx) ** 2 + ((pa[:, 1] - pb[:, 1]) * sy) ** 2)

    # point vs poly(line)
    m = a_is_pt & ~b_is_pt
    if m.any():
        pa = geoms_a.coords[geoms_a.offsets[:-1][idx_a[m]]]
        out[m] = point_polyline_dist(pa[:, 0], pa[:, 1], idx_b[m], geoms_b, lat0)
    m = ~a_is_pt & b_is_pt
    if m.any():
        pb = geoms_b.coords[geoms_b.offsets[:-1][idx_b[m]]]
        out[m] = point_polyline_dist(pb[:, 0], pb[:, 1], idx_a[m], geoms_a, lat0)

    # poly(line) vs poly(line): expand all segment pairs
    m = ~a_is_pt & ~b_is_pt
    if m.any():
        rows = np.flatnonzero(m)
        na = (npts_a[rows] - 1).astype(np.int64)
        nb = (npts_b[rows] - 1).astype(np.int64)
        combos = na * nb
        pair_of = np.repeat(rows, combos)
        local = np.arange(combos.sum(), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(combos)[:-1]]), combos)
        nb_rep = np.repeat(nb, combos)
        a_loc = local // nb_rep
        b_loc = local % nb_rep
        a_first = np.repeat(geoms_a.offsets[:-1][idx_a[rows]], combos) + a_loc
        b_first = np.repeat(geoms_b.offsets[:-1][idx_b[rows]], combos) + b_loc
        d = _seg_seg_dist(geoms_a.coords[a_first], geoms_a.coords[a_first + 1],
                          geoms_b.coords[b_first], geoms_b.coords[b_first + 1], sx, sy)
        np.minimum.at(out, pair_of, d)

    # polygon interior: anything whose representative vertex lies inside
    # the other side's polygon is at distance 0
    a_is_poly = geoms_a.kinds[idx_a] == WKB_POLYGON
    b_is_poly = geoms_b.kinds[idx_b] == WKB_POLYGON
    if b_is_poly.any():
        rows = np.flatnonzero(b_is_poly)
        pa = geoms_a.coords[geoms_a.offsets[:-1][idx_a[rows]]]
        inside = point_in_polygon(pa[:, 0], pa[:, 1], idx_b[rows], geoms_b)
        out[rows[inside]] = 0.0
    if a_is_poly.any():
        rows = np.flatnonzero(a_is_poly)
        pb = geoms_b.coords[geoms_b.offsets[:-1][idx_b[rows]]]
        inside = point_in_polygon(pb[:, 0], pb[:, 1], idx_a[rows], geoms_a)
        out[rows[inside]] = 0.0
    return out


def geom_bbox(geoms: RaggedGeoms) -> np.ndarray:
    """(M,4) min_lon,min_lat,max_lon,max_lat per geometry (empty -> nan)."""
    m = len(geoms)
    out = np.full((m, 4), np.nan)
    npts = geoms.n_points()
    ok = npts > 0
    if not np.any(ok):
        return out
    idx = np.repeat(np.arange(m), npts)
    for j, (col, fn) in enumerate([(0, np.minimum), (1, np.minimum), (0, np.maximum), (1, np.maximum)]):
        acc = np.full(m, np.inf if fn is np.minimum else -np.inf)
        fn.at(acc, idx, geoms.coords[:, col])
        out[:, j] = acc
    out[~ok] = np.nan
    return out


def bbox_intersects(gbox: np.ndarray, min_lon: float, min_lat: float,
                    max_lon: float, max_lat: float) -> np.ndarray:
    """Envelope-overlap test: geometry bbox vs query bbox (closed)."""
    return ((gbox[:, 0] <= max_lon) & (gbox[:, 2] >= min_lon)
            & (gbox[:, 1] <= max_lat) & (gbox[:, 3] >= min_lat))


def segments_intersect_bbox(geom_idx: np.ndarray, geoms: RaggedGeoms,
                            min_lon: float, min_lat: float,
                            max_lon: float, max_lat: float) -> np.ndarray:
    """Per listed geometry: does any segment (or vertex) truly intersect the
    closed bbox? Exact for LineStrings; for Polygons this is boundary
    intersection — callers OR it with point_in_polygon(bbox corner) to get
    full area-intersection semantics.
    """
    # Liang-Barsky style clip test per segment, vectorized.
    pair_of_seg, a, b = _pair_segments(geom_idx, geoms)
    res = np.zeros(geom_idx.size, dtype=bool)
    if pair_of_seg.size:
        dx = b[:, 0] - a[:, 0]
        dy = b[:, 1] - a[:, 1]
        t0 = np.zeros(len(a))
        t1 = np.ones(len(a))
        ok = np.ones(len(a), dtype=bool)
        for pj, qj in ((-dx, a[:, 0] - min_lon), (dx, max_lon - a[:, 0]),
                       (-dy, a[:, 1] - min_lat), (dy, max_lat - a[:, 1])):
            par = pj == 0
            ok &= ~(par & (qj < 0))
            with np.errstate(divide="ignore", invalid="ignore"):
                r = np.where(par, 0.0, qj / np.where(pj == 0, 1.0, pj))
            t0 = np.where(~par & (pj < 0), np.maximum(t0, r), t0)
            t1 = np.where(~par & (pj > 0), np.minimum(t1, r), t1)
        ok &= t0 <= t1
        np.logical_or.at(res, pair_of_seg, ok)

    # single-vertex geometries: point-in-bbox
    npts = geoms.n_points()[geom_idx]
    lone = np.flatnonzero(npts == 1)
    if lone.size:
        v = geoms.coords[geoms.offsets[:-1][geom_idx[lone]]]
        res[lone] = ((v[:, 0] >= min_lon) & (v[:, 0] <= max_lon)
                     & (v[:, 1] >= min_lat) & (v[:, 1] <= max_lat))
    return res


def pair_line_relate(idx_a: np.ndarray, geoms_a: RaggedGeoms,
                     idx_b: np.ndarray, geoms_b: RaggedGeoms
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per pair (geoms_a[idx_a[i]], geoms_b[idx_b[i]]) of LINESTRINGS,
    the three DE-9IM facts ST_Crosses / ST_Touches reduce to for
    line-line (PostGIS semantics; both are symmetric on lines):

      ii0 — interiors share at least one isolated POINT (a proper
            segment crossing, or a non-endpoint vertex of one line
            lying on the other's interior);
      ii1 — interiors share a 1-dimensional piece (collinear segment
            overlap of positive length);
      any — the lines intersect at all.

    Then ``crosses = ii0 & ~ii1`` (dim of the interior intersection is
    exactly 0) and ``touches = any & ~ii0 & ~ii1`` (they meet only at
    boundary points — a line's boundary is its two GLOBAL endpoints,
    so a T-junction endpoint-on-interior contact is touches, while an
    interior-vertex contact is crosses).

    Orientation tests use double cross products (not exact rational
    predicates): contacts are classified reliably when coordinates are
    >= a few ulp apart along each axis, and axis-aligned fixtures are
    sign-exact (the degenerate subtraction is exactly 0). Raises on
    non-LineString inputs — point/polygon relate is out of the
    engine's scope (SURVEY §2.6 vocabulary note).

    Documented divergence from OGC/PostGIS (ADVICE r6 low #1): a
    CLOSED LineString (first coord == last coord) has an EMPTY
    boundary under the OGC mod-2 rule, so PostGIS classifies another
    line passing through the ring's anchor vertex as ST_Crosses; this
    kernel treats the anchor like any other global endpoint and
    reports ST_Touches. Geometries with no segments (< 2 points)
    contact nothing.
    """
    for idx, g, side in ((idx_a, geoms_a, "a"), (idx_b, geoms_b, "b")):
        kinds = g.kinds[idx]
        if kinds.size and (kinds != WKB_LINESTRING).any():
            raise ValueError(
                "ST_Crosses/ST_Touches: both sides must be LineStrings")

    n = idx_a.size
    ii0 = np.zeros(n, dtype=bool)
    ii1 = np.zeros(n, dtype=bool)
    anyc = np.zeros(n, dtype=bool)
    if n == 0:
        return ii0, ii1, anyc

    # segment-pair expansion (pair_min_dist's combos machinery)
    npts_a = geoms_a.n_points()[idx_a]
    npts_b = geoms_b.n_points()[idx_b]
    # degenerate LineStrings (ADVICE r6 low #3): a 0- or 1-point
    # geometry has no segments — clamp so combos stays non-negative
    # (np.repeat would otherwise raise an uninformative ValueError).
    # Documented rule: segment-free geometries contact nothing here.
    na = np.maximum(npts_a - 1, 0).astype(np.int64)
    nb = np.maximum(npts_b - 1, 0).astype(np.int64)
    combos = na * nb
    if combos.sum() == 0:
        return ii0, ii1, anyc
    pair_of = np.repeat(np.arange(n, dtype=np.int64), combos)
    local = np.arange(combos.sum(), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(combos)[:-1]]), combos)
    nb_rep = np.repeat(nb, combos)
    a_loc = local // nb_rep
    b_loc = local % nb_rep
    a_first = np.repeat(geoms_a.offsets[:-1][idx_a], combos) + a_loc
    b_first = np.repeat(geoms_b.offsets[:-1][idx_b], combos) + b_loc
    p = geoms_a.coords[a_first]
    q = geoms_a.coords[a_first + 1]
    r = geoms_b.coords[b_first]
    s = geoms_b.coords[b_first + 1]

    def cross(o, a, b):
        return ((a[:, 0] - o[:, 0]) * (b[:, 1] - o[:, 1])
                - (a[:, 1] - o[:, 1]) * (b[:, 0] - o[:, 0]))

    d1 = cross(r, s, p)   # p relative to rs
    d2 = cross(r, s, q)
    d3 = cross(p, q, r)   # r relative to pq
    d4 = cross(p, q, s)

    # proper crossing: strictly opposite sides both ways -> an isolated
    # interior-interior contact of both segments (hence both lines)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))

    # collinear overlap: all four orientations zero and the projections
    # onto the dominant axis overlap in a range of positive length
    col = (d1 == 0) & (d2 == 0) & (d3 == 0) & (d4 == 0)
    axis = (np.abs(q[:, 0] - p[:, 0]) + np.abs(s[:, 0] - r[:, 0])
            < np.abs(q[:, 1] - p[:, 1]) + np.abs(s[:, 1] - r[:, 1])
            ).astype(np.int64)
    ax = np.take_along_axis(p, axis[:, None], 1)[:, 0]
    bx = np.take_along_axis(q, axis[:, None], 1)[:, 0]
    cx = np.take_along_axis(r, axis[:, None], 1)[:, 0]
    dx = np.take_along_axis(s, axis[:, None], 1)[:, 0]
    lo = np.maximum(np.minimum(ax, bx), np.minimum(cx, dx))
    hi = np.minimum(np.maximum(ax, bx), np.maximum(cx, dx))
    overlap1 = col & (hi > lo)

    # endpoint-on-segment contacts (includes shared vertices and the
    # single-point case of collinear contact). For each contact point v
    # classify: interior-to-line unless v IS that line's global
    # endpoint (first/last coordinate, exact compare on both axes).
    def _global_ends(geoms, idx_rep):
        first = geoms.offsets[:-1][idx_rep]
        last = geoms.offsets[1:][idx_rep] - 1
        return geoms.coords[first], geoms.coords[last]

    a_end0, a_end1 = _global_ends(geoms_a, idx_a[pair_of])
    b_end0, b_end1 = _global_ends(geoms_b, idx_b[pair_of])

    def _is_global_end(v, e0, e1):
        return (((v[:, 0] == e0[:, 0]) & (v[:, 1] == e0[:, 1]))
                | ((v[:, 0] == e1[:, 0]) & (v[:, 1] == e1[:, 1])))

    def _on_seg(v, s0, s1, orient_zero):
        inx = (v[:, 0] >= np.minimum(s0[:, 0], s1[:, 0])) \
            & (v[:, 0] <= np.maximum(s0[:, 0], s1[:, 0]))
        iny = (v[:, 1] >= np.minimum(s0[:, 1], s1[:, 1])) \
            & (v[:, 1] <= np.maximum(s0[:, 1], s1[:, 1]))
        return orient_zero & inx & iny

    contact_any = proper | overlap1
    contact_ii0 = proper.copy()
    # v is an endpoint of one segment lying on the other segment
    for v, s0, s1, dz, v_ends, o_ends in (
            (p, r, s, d1, (a_end0, a_end1), (b_end0, b_end1)),
            (q, r, s, d2, (a_end0, a_end1), (b_end0, b_end1)),
            (r, p, q, d3, (b_end0, b_end1), (a_end0, a_end1)),
            (s, p, q, d4, (b_end0, b_end1), (a_end0, a_end1))):
        on = _on_seg(v, s0, s1, dz == 0)
        if not on.any():
            continue
        contact_any |= on
        int_own = ~_is_global_end(v, *v_ends)
        int_other = ~_is_global_end(v, *o_ends)
        contact_ii0 |= on & int_own & int_other

    np.logical_or.at(ii0, pair_of, contact_ii0)
    np.logical_or.at(ii1, pair_of, overlap1)
    np.logical_or.at(anyc, pair_of, contact_any)
    return ii0, ii1, anyc
