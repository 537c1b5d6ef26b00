"""Property-based invariants (hypothesis) for the numpy kernels — the
correctness oracle strategy from SURVEY.md §5: randomized parity between
the indexed/vectorized paths and brute-force definitions."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tdei_backend_service_spark.core import cells, geom

lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
lats = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
depths = st.integers(min_value=3, max_value=24)


@given(lons, lats, depths)
@settings(max_examples=200, deadline=None)
def test_encode_bounds_contain_point(lon, lat, depth):
    c = cells.encode(np.array([lon]), np.array([lat]), depth)
    lo0, la0, lo1, la1 = cells.cell_bounds(c)
    assert lo0[0] - 1e-9 <= lon <= lo1[0] + 1e-9
    assert la0[0] - 1e-9 <= lat <= la1[0] + 1e-9
    assert cells.cell_depth(c)[0] == depth


@given(lons, lats, depths, depths)
@settings(max_examples=200, deadline=None)
def test_parent_consistency(lon, lat, d1, d2):
    lo, hi = min(d1, d2), max(d1, d2)
    child = cells.encode(np.array([lon]), np.array([lat]), hi)
    assert cells.cell_parent(child, lo)[0] == cells.encode(
        np.array([lon]), np.array([lat]), lo)[0]


@given(st.integers(min_value=0, max_value=(1 << 29) - 1),
       st.integers(min_value=0, max_value=(1 << 29) - 1))
@settings(max_examples=300, deadline=None)
def test_morton_roundtrip_prop(x, y):
    m = cells.morton2(np.array([x], dtype=np.uint64),
                      np.array([y], dtype=np.uint64))
    x2, y2 = cells.unmorton2(m)
    assert (x2[0], y2[0]) == (x, y)


coords = st.lists(st.tuples(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False)),
    min_size=2, max_size=6)


@given(coords, st.floats(min_value=-1.2, max_value=1.2, allow_nan=False),
       st.floats(min_value=-1.2, max_value=1.2, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_point_polyline_dist_matches_bruteforce(pts, px, py):
    g = geom.parse_wkb_batch([geom.wkb_linestring(pts)])
    got = geom.point_polyline_dist(np.array([px]), np.array([py]),
                                   np.zeros(1, dtype=np.int64), g)[0]
    # brute force: dense sampling along each segment (upper bound of true
    # distance; true distance <= sampled min, and got <= sampled min too)
    sx, sy = geom.M_PER_DEG_LON_EQ, geom.M_PER_DEG_LAT
    best = np.inf
    a = np.asarray(pts)
    for i in range(len(a) - 1):
        ts = np.linspace(0, 1, 2000)
        xs = a[i, 0] + ts * (a[i + 1, 0] - a[i, 0])
        ys = a[i, 1] + ts * (a[i + 1, 1] - a[i, 1])
        d = np.sqrt(((px - xs) * sx) ** 2 + ((py - ys) * sy) ** 2)
        best = min(best, d.min())
    # sampling grid spacing bounds the error
    seg_len = np.sqrt(((np.diff(a[:, 0]) * sx) ** 2
                       + (np.diff(a[:, 1]) * sy) ** 2)).max()
    tol = seg_len / 1999 + 1e-6
    assert got <= best + 1e-9
    assert got >= best - tol


@given(coords, depths.filter(lambda d: d <= 20),
       st.floats(min_value=0.0, max_value=0.01, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_segment_cover_superset(pts, depth, pad):
    """Every sampled point of every segment lands inside the padded cover
    (the zero-false-negative guarantee the two-phase join rests on)."""
    a = np.asarray(pts)
    seg_idx, cover = cells.cover_segments(a[:-1, 0], a[:-1, 1],
                                          a[1:, 0], a[1:, 1], depth, pad)
    for i in range(len(a) - 1):
        ts = np.linspace(0, 1, 17)
        xs = a[i, 0] + ts * (a[i + 1, 0] - a[i, 0])
        ys = a[i, 1] + ts * (a[i + 1, 1] - a[i, 1])
        pc = cells.encode(xs, ys, depth)
        mine = cover[seg_idx == i]
        assert np.isin(pc, mine).all()


@given(st.text(max_size=200), st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_minhash_similarity_monotone(a, b):
    """Identical strings -> identical signatures; signature agreement is
    a [0,1] fraction."""
    from tdei_backend_service_spark.pipeline.dedup import _hash_shingles
    sa = _hash_shingles(a.lower(), 5)
    sb = _hash_shingles(b.lower(), 5)
    if a.lower() == b.lower():
        assert np.array_equal(sa, sb)
    assert sa.size >= 1 and sb.size >= 1


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=100, deadline=None)
def test_qimg_psnr_invariant_random_payload(data):
    """qimg round-trip respects the PSNR >= 40 dB gate for ANY pixel
    content (the input_hint invariant is unconditional)."""
    from tdei_backend_service_spark.codecs import decode_qimg, encode_qimg, psnr
    side = max(int(np.sqrt(max(len(data) // 3, 4))), 2)
    need = 3 * side * side
    padded = (data + b"\x00" * need) [:need]
    buf = np.frombuffer(padded, dtype=np.uint8).reshape(side, side, 3)
    out = decode_qimg(encode_qimg(buf))
    assert psnr(buf, out) >= 40.0


@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=0, max_size=500),
       st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=150, deadline=None)
def test_wav_roundtrip_prop(samples, rate):
    from tdei_backend_service_spark.codecs.audio import parse_wav, wav_bytes
    s = np.array(samples, dtype=np.int16)
    back, r = parse_wav(wav_bytes(s, rate))
    assert r == rate and np.array_equal(back, s)


@given(st.integers(min_value=0, max_value=6),
       st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=5),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=150, deadline=None)
def test_vraw_roundtrip_prop(n, w, h, seed):
    from tdei_backend_service_spark.codecs.video import parse_vraw, vraw_bytes
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    assert np.array_equal(parse_vraw(vraw_bytes(frames)), frames)


@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=1, max_size=300))
@settings(max_examples=150, deadline=None)
def test_audio_feature_invariants_prop(samples):
    """Pure-kernel invariants mirrored from the operator's math: rms
    floor <= peak, zero crossings < n, and all exact for constants."""
    import math
    s = np.array(samples, dtype=np.int64)
    peak = int(np.abs(s).max())
    rms = math.isqrt(int((s * s).sum()) // s.size)
    sign = np.sign(s)
    zc = int((sign[1:] != sign[:-1]).sum())
    assert 0 <= rms <= peak
    assert 0 <= zc < s.size
    if len(set(samples)) == 1:
        assert zc == 0 and peak == abs(samples[0]) and rms == peak


metric_lats = st.floats(min_value=0.0, max_value=85.0, allow_nan=False)


@given(coords, st.floats(min_value=-0.5, max_value=0.5),
       st.floats(min_value=-0.5, max_value=0.5), metric_lats)
@settings(max_examples=200, deadline=None)
def test_point_polyline_dist_local_metric_transform_equivalence(
        pts, px, py, lat0):
    """The cos(lat0) local metric equals the equator metric applied to
    lon-pre-scaled coordinates: d_lat0(p, g) == d_0(scale(p), scale(g))
    where scale multiplies every lon by cos(lat0). Pins that the metric
    touches ONLY the lon axis and does so uniformly across the
    single-segment and reduceat kernel specializations."""
    c = np.cos(np.radians(lat0))
    g = geom.parse_wkb_batch([geom.wkb_linestring(pts)])
    gs = geom.parse_wkb_batch(
        [geom.wkb_linestring([(x * c, y) for x, y in pts])])
    idx = np.zeros(1, dtype=np.int64)
    d_local = geom.point_polyline_dist(
        np.array([px]), np.array([py]), idx, g, lat0)
    d_scaled = geom.point_polyline_dist(
        np.array([px * c]), np.array([py]), idx, gs, 0.0)
    assert np.allclose(d_local, d_scaled, rtol=1e-9, atol=1e-9)


@given(coords, coords, metric_lats)
@settings(max_examples=150, deadline=None)
def test_pair_min_dist_local_metric_transform_equivalence(a, b, lat0):
    """Same transform-equivalence for the geometry-geometry kernel
    (segment-pair expansion + polygon-interior rule: axis scaling
    preserves containment, so the zero-distance cases agree too)."""
    c = np.cos(np.radians(lat0))

    def ls(ptset, scale):
        return geom.wkb_linestring([(x * (c if scale else 1.0), y)
                                    for x, y in ptset])
    ga = geom.parse_wkb_batch([ls(a, False)])
    gb = geom.parse_wkb_batch([ls(b, False)])
    gas = geom.parse_wkb_batch([ls(a, True)])
    gbs = geom.parse_wkb_batch([ls(b, True)])
    idx = np.zeros(1, dtype=np.int64)
    d_local = geom.pair_min_dist(idx, ga, idx, gb, lat0)
    d_scaled = geom.pair_min_dist(idx, gas, idx, gbs, 0.0)
    assert np.allclose(d_local, d_scaled, rtol=1e-9, atol=1e-9)


@given(st.floats(min_value=0.1, max_value=5e6, allow_nan=False),
       metric_lats)
@settings(max_examples=300, deadline=None)
def test_depth_for_radius_local_extent_guarantee(radius_m, lat0):
    """depth_for_radius_m's contract under the local metric: at the
    returned depth, the cell extent is >= radius on BOTH axes in local
    meters (lon meters scaled by cos), so one neighbor ring always
    covers the predicate radius."""
    d = cells.depth_for_radius_m(radius_m, lat0)
    coslat = max(np.cos(np.radians(lat0)), 1e-6)
    lat_m = 180.0 / (1 << d) * cells.M_PER_DEG_LAT
    lon_m = 360.0 / (1 << d) * cells.M_PER_DEG_LON_EQ * coslat
    # the guarantee saturates at both clip ends (see the docstring):
    # continental radii pin at depth 1, sub-cm radii at MAX_DEPTH
    raw = min(np.floor(np.log2(180.0 * cells.M_PER_DEG_LAT / radius_m)),
              np.floor(np.log2(360.0 * cells.M_PER_DEG_LON_EQ * coslat
                               / radius_m)))
    if 1 <= raw and d < cells.MAX_DEPTH:
        assert lat_m >= radius_m * (1 - 1e-12)
        assert lon_m >= radius_m * (1 - 1e-12)
    elif raw < 1:
        assert d == 1  # saturated, documented
