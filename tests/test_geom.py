import numpy as np

from tdei_backend_service_spark.core import geom


def _batch(*blobs):
    return geom.parse_wkb_batch(list(blobs))


def test_wkb_roundtrip():
    g = _batch(
        geom.wkb_point(-122.3, 47.6),
        geom.wkb_linestring([(-1, 0), (1, 0), (1, 1)]),
        geom.wkb_polygon([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]),
    )
    assert list(g.kinds) == [geom.WKB_POINT, geom.WKB_LINESTRING, geom.WKB_POLYGON]
    assert list(g.n_points()) == [1, 3, 5]
    assert np.allclose(g.coords[0], [-122.3, 47.6])


def test_point_segment_distance():
    # horizontal line at lat 0 from lon 0 to 0.01; point 0.001 deg north
    g = _batch(geom.wkb_linestring([(0, 0), (0.01, 0)]))
    px = np.array([0.005, -0.001, 0.005])
    py = np.array([0.001, 0.0, 0.0])
    d = geom.point_polyline_dist(px, py, np.zeros(3, dtype=np.int64), g)
    assert abs(d[0] - 0.001 * geom.M_PER_DEG_LAT) < 0.01      # perpendicular
    assert abs(d[1] - 0.001 * geom.M_PER_DEG_LON_EQ) < 0.01   # beyond endpoint
    assert d[2] < 1e-9                                        # on the line


def test_point_point_distance_degenerate():
    g = _batch(geom.wkb_point(0.0, 0.0))
    d = geom.point_polyline_dist(np.array([0.0]), np.array([0.001]),
                                 np.zeros(1, dtype=np.int64), g)
    assert abs(d[0] - 0.001 * geom.M_PER_DEG_LAT) < 0.01


def test_point_in_polygon():
    g = _batch(geom.wkb_polygon([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]),
               geom.wkb_polygon([(5, 5), (6, 5), (6, 6), (5, 6), (5, 5)]))
    px = np.array([1.0, 3.0, 5.5, 1.0])
    py = np.array([1.0, 1.0, 5.5, 1.0])
    gi = np.array([0, 0, 1, 1], dtype=np.int64)
    got = geom.point_in_polygon(px, py, gi, g)
    assert list(got) == [True, False, True, False]


def test_pip_brute_force_property():
    # random convex quads vs random points, compared to matplotlib-free
    # brute force via the same ray-cast logic written scalar
    rng = np.random.default_rng(11)
    for _ in range(20):
        cx, cy = rng.uniform(-10, 10, 2)
        w, h = rng.uniform(0.5, 3, 2)
        ring = [(cx - w, cy - h), (cx + w, cy - h), (cx + w, cy + h), (cx - w, cy + h), (cx - w, cy - h)]
        g = _batch(geom.wkb_polygon(ring))
        px = rng.uniform(-12, 12, 200)
        py = rng.uniform(-12, 12, 200)
        got = geom.point_in_polygon(px, py, np.zeros(200, dtype=np.int64), g)
        expect = (np.abs(px - cx) < w) & (np.abs(py - cy) < h)
        # exclude points within eps of the boundary (open/closed boundary)
        interior = (np.abs(np.abs(px - cx) - w) > 1e-9) & (np.abs(np.abs(py - cy) - h) > 1e-9)
        assert np.array_equal(got[interior], expect[interior])


def test_orientation_and_angle():
    g = _batch(geom.wkb_linestring([(0, 0), (1, 0)]),      # east: 0 deg
               geom.wkb_linestring([(0, 0), (0, 1)]),      # north: 90
               geom.wkb_linestring([(0, 0), (1, 1)]),      # 45
               geom.wkb_linestring([(1, 1), (0, 0)]))      # 225 -> folds to 45
    o = geom.polyline_orientation(g)
    assert np.allclose(o, [0, 90, 45, 45])
    assert np.allclose(geom.angle_between_deg(o[:2], o[1:3]), [90, 45])
    assert geom.angle_between_deg(np.array([10.0]), np.array([170.0]))[0] == 20.0


def test_geom_bbox_and_intersects():
    g = _batch(geom.wkb_linestring([(0, 0), (2, 1)]),
               geom.wkb_polygon([(5, 5), (6, 5), (6, 6), (5, 6), (5, 5)]))
    box = geom.geom_bbox(g)
    assert np.allclose(box[0], [0, 0, 2, 1])
    hits = geom.bbox_intersects(box, 1.5, 0.5, 7, 7)
    assert list(hits) == [True, True]
    hits2 = geom.bbox_intersects(box, 3, 3, 4, 4)
    assert list(hits2) == [False, False]


def test_segments_intersect_bbox_exact():
    # diagonal line whose bbox overlaps the query box but the line misses it
    g = _batch(geom.wkb_linestring([(0, 0), (10, 10)]),
               geom.wkb_linestring([(0, 9), (1, 10)]))
    idx = np.array([0, 1], dtype=np.int64)
    got = geom.segments_intersect_bbox(idx, g, 8.0, 0.0, 10.0, 2.0)
    assert list(got) == [False, False]
    got2 = geom.segments_intersect_bbox(idx, g, 4.0, 4.0, 6.0, 6.0)
    assert list(got2) == [True, False]


# ---------------------------------------------------------------------------
# pair_line_relate (ST_Crosses / ST_Touches facts)
# ---------------------------------------------------------------------------

def _relate(a_pts, b_pts):
    ga = geom.parse_wkb_batch([geom.wkb_linestring(a_pts)])
    gb = geom.parse_wkb_batch([geom.wkb_linestring(b_pts)])
    z = np.zeros(1, dtype=np.int64)
    ii0, ii1, anyc = geom.pair_line_relate(z, ga, z, gb)
    crosses = bool(ii0[0] and not ii1[0])
    touches = bool(anyc[0] and not ii0[0] and not ii1[0])
    return crosses, touches, bool(anyc[0])


def test_line_relate_de9im_cases():
    """Exact-coordinate DE-9IM case table (all coords are small ints or
    halves — exactly representable, so every orientation sign and
    equality is exact)."""
    # proper X crossing -> crosses
    assert _relate([(0, 0), (2, 2)], [(0, 2), (2, 0)]) == (True, False, True)
    # T-junction: A's global endpoint on B's interior -> touches
    assert _relate([(1, 0), (1, 1)], [(0, 1), (2, 1)]) == (False, True, True)
    # interior VERTEX of A on B's interior -> interiors meet at a point
    # -> crosses (the bent polyline pivots on B without crossing it)
    assert _relate([(0, 0), (1, 1), (2, 0)],
                   [(0, 1), (2, 1)]) == (True, False, True)
    # shared global endpoint only -> touches
    assert _relate([(0, 0), (1, 1)], [(1, 1), (2, 0)]) == (False, True, True)
    # collinear overlap of positive length -> neither (ST_Overlaps)
    assert _relate([(0, 0), (2, 0)], [(1, 0), (3, 0)]) == (False, False, True)
    # collinear, meeting at exactly one shared endpoint -> touches
    assert _relate([(0, 0), (1, 0)], [(1, 0), (2, 0)]) == (False, True, True)
    # disjoint -> nothing
    assert _relate([(0, 0), (1, 0)], [(0, 1), (1, 1)]) == (False, False, False)
    # crossing AND collinear overlap elsewhere -> interior intersection
    # is 1-dimensional -> neither crosses nor touches
    assert _relate([(0, 0), (2, 0), (2, -1), (1, -1), (1, 1)],
                   [(1, 0), (3, 0)]) == (False, False, True)
    # B's endpoint on A's interior VERTEX: boundary-of-B on interior-of-A
    # -> touches
    assert _relate([(0, 0), (1, 1), (2, 0)],
                   [(1, 1), (1, 3)]) == (False, True, True)
    # non-LineString input raises
    import pytest
    pt = geom.parse_wkb_batch([geom.wkb_point(0.0, 0.0)])
    ln = geom.parse_wkb_batch([geom.wkb_linestring([(0, 0), (1, 0)])])
    z = np.zeros(1, dtype=np.int64)
    with pytest.raises(ValueError, match="LineStrings"):
        geom.pair_line_relate(z, pt, z, ln)


def test_line_relate_symmetry_and_batch():
    """Symmetric on lines, and the ragged batch path scatters per-pair
    results independently."""
    cases = [
        ([(0, 0), (2, 2)], [(0, 2), (2, 0)]),
        ([(1, 0), (1, 1)], [(0, 1), (2, 1)]),
        ([(0, 0), (2, 0)], [(1, 0), (3, 0)]),
        ([(0, 0), (1, 0)], [(0, 1), (1, 1)]),
    ]
    for a_pts, b_pts in cases:
        assert _relate(a_pts, b_pts) == _relate(b_pts, a_pts)
    ga = geom.parse_wkb_batch([geom.wkb_linestring(a) for a, _ in cases])
    gb = geom.parse_wkb_batch([geom.wkb_linestring(b) for _, b in cases])
    idx = np.arange(4, dtype=np.int64)
    ii0, ii1, anyc = geom.pair_line_relate(idx, ga, idx, gb)
    assert list(ii0) == [True, False, False, False]
    assert list(ii1) == [False, False, True, False]
    assert list(anyc) == [True, True, True, False]


def test_line_relate_random_vs_exact_fraction_reference():
    """Randomized differential: pair_line_relate vs a scalar reference
    computed in EXACT rational arithmetic (fractions.Fraction) on
    small-integer coordinates — orientation signs, on-segment tests,
    interior/boundary classification and collinear-overlap length are
    all exact in the reference, so any disagreement is a kernel bug."""
    import itertools
    from fractions import Fraction as Fr

    rng = np.random.default_rng(17)

    def ref_relate(A, B):
        a_ends = {A[0], A[-1]}
        b_ends = {B[0], B[-1]}

        def orient(p, q, r):
            return (Fr(q[0] - p[0]) * Fr(r[1] - p[1])
                    - Fr(q[1] - p[1]) * Fr(r[0] - p[0]))

        def on_seg(v, s0, s1):
            return (orient(s0, s1, v) == 0
                    and min(s0[0], s1[0]) <= v[0] <= max(s0[0], s1[0])
                    and min(s0[1], s1[1]) <= v[1] <= max(s0[1], s1[1]))

        ii0 = ii1 = anyc = False
        for (p, q), (r, s) in itertools.product(
                zip(A, A[1:]), zip(B, B[1:])):
            d1, d2 = orient(r, s, p), orient(r, s, q)
            d3, d4 = orient(p, q, r), orient(p, q, s)
            if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) \
                    and 0 not in (d1, d2, d3, d4):
                ii0 = anyc = True
            if d1 == d2 == d3 == d4 == 0:
                ax = 0 if max(abs(q[0] - p[0]), abs(s[0] - r[0])) \
                    >= max(abs(q[1] - p[1]), abs(s[1] - r[1])) else 1
                lo = max(min(p[ax], q[ax]), min(r[ax], s[ax]))
                hi = min(max(p[ax], q[ax]), max(r[ax], s[ax]))
                if hi > lo:
                    ii1 = anyc = True
            for v, s0, s1, own, other in ((p, r, s, a_ends, b_ends),
                                          (q, r, s, a_ends, b_ends),
                                          (r, p, q, b_ends, a_ends),
                                          (s, p, q, b_ends, a_ends)):
                if on_seg(v, s0, s1):
                    anyc = True
                    if v not in own and v not in other:
                        ii0 = True
        return ii0, ii1, anyc

    n_checked = 0
    for _ in range(400):
        na, nb = int(rng.integers(2, 5)), int(rng.integers(2, 5))
        # small-int grid => collinear/touch/cross configs all occur often
        A = [tuple(map(int, rng.integers(0, 5, 2))) for _ in range(na)]
        B = [tuple(map(int, rng.integers(0, 5, 2))) for _ in range(nb)]
        # drop degenerate zero-length segments (unmodeled input)
        if any(a == b for a, b in zip(A, A[1:])) or \
           any(a == b for a, b in zip(B, B[1:])):
            continue
        ga = geom.parse_wkb_batch(
            [geom.wkb_linestring([(float(x), float(y)) for x, y in A])])
        gb = geom.parse_wkb_batch(
            [geom.wkb_linestring([(float(x), float(y)) for x, y in B])])
        z = np.zeros(1, dtype=np.int64)
        ii0, ii1, anyc = geom.pair_line_relate(z, ga, z, gb)
        want = ref_relate(A, B)
        assert (bool(ii0[0]), bool(ii1[0]), bool(anyc[0])) == want, (A, B)
        n_checked += 1
    assert n_checked > 300
