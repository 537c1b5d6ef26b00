"""Deterministic synthetic fixtures (FIXTURES.md T1-T4): geotagged
image+caption records plus edge/zone vector layers — no external data.

Determinism strategy: every row-level value derives from a splitmix64
hash of (seed, row id) — pure vectorized arithmetic — and pixel content
from a counter-based Philox stream keyed by (seed, row id). The same
(seed, i) therefore yields identical rows no matter how rows are
distributed across Spark partitions, which is what makes the distributed
generator (`synth_images_df`, a mapInPandas over spark.range) reproduce
the driver-side pandas generator bit-for-bit.

Placement: fraction ``skew`` of images cluster in one dense "city core"
cell (exercises salting / AQE skew handling, FIXTURES.md T4), the rest
uniform over REGION.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..codecs.image import ahash64, encode_image
from ..core import geom

# 0.1deg x 0.1deg test region (lon_min, lat_min, lon_max, lat_max)
REGION = (-122.35, 47.60, -122.25, 47.70)
DENSE_CENTER = (-122.335, 47.608)  # "city core" for the skew fixture
WORDS = ("curb ramp crossing sidewalk lamp bench stair signal bollard tree "
         "hydrant bike rail plaza alley").split()
HIGHWAYS = ("footway", "street_lamp", "residential", "crossing", "steps")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform [0,1) per id (vectorized, seed-independent salt)."""
    h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(salt * 0x9E3779B9))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _positions(ids: np.ndarray, seed: int, skew: float):
    u_sel = _u01(ids, seed + 1)
    u_lon = _u01(ids, seed + 2)
    u_lat = _u01(ids, seed + 3)
    lon0, lat0, lon1, lat1 = REGION
    lon = lon0 + u_lon * (lon1 - lon0)
    lat = lat0 + u_lat * (lat1 - lat0)
    dense = u_sel < skew
    # dense cluster: ~300 m square around the core (one hot res-8 cell)
    lon = np.where(dense, DENSE_CENTER[0] + (u_lon - 0.5) * 0.004, lon)
    lat = np.where(dense, DENSE_CENTER[1] + (u_lat - 0.5) * 0.003, lat)
    return lon, lat


def synth_images_pandas(ids: np.ndarray, seed: int = 42, dataset_id: str = "ds-a",
                        skew: float = 0.3, img_px: int = 8, with_bytes: bool = True,
                        dup_src_ids: np.ndarray | None = None,
                        jitter_deg: float = 0.0,
                        props_as_map: bool = True) -> pd.DataFrame:
    """Generate one batch of image rows for the given global row ids.

    ``dup_src_ids`` (same length as ids, -1 for "not a duplicate") makes a
    row a pixel/caption/phash-exact duplicate of another row id, with
    coordinates jittered by up to ``jitter_deg`` — the union-dedup fixture
    (FIXTURES.md T4: same pixels/phash/caption, coords jittered
    < proximity/2).
    """
    ids = np.asarray(ids, dtype=np.int64)
    n = ids.size
    content_ids = ids.copy()
    if dup_src_ids is not None:
        dup_src_ids = np.asarray(dup_src_ids, dtype=np.int64)
        is_dup = dup_src_ids >= 0
        content_ids = np.where(is_dup, dup_src_ids, ids)

    lon, lat = _positions(content_ids, seed, skew)
    if jitter_deg:
        lon = lon + (_u01(ids, seed + 7) - 0.5) * 2 * jitter_deg
        lat = lat + (_u01(ids, seed + 8) - 0.5) * 2 * jitter_deg

    hsh = _splitmix64(content_ids.astype(np.uint64) ^ np.uint64(seed))
    fmt = np.where(content_ids % 2 == 0, "png", "qimg")
    # vectorized string assembly (no per-row Python in the hot path)
    words_arr = np.asarray(WORDS, dtype=object)
    captions = ("caption " + pd.Series(content_ids).astype(str) + " "
                + pd.Series(words_arr[(hsh % np.uint64(len(WORDS))).astype(np.int64)]))
    hw_arr = np.asarray(HIGHWAYS, dtype=object)
    highway = hw_arr[((hsh >> np.uint64(8)) % np.uint64(len(HIGHWAYS))).astype(np.int64)]
    ada = np.where((hsh >> np.uint64(16)) % np.uint64(2) == 0, "true", "false")

    blobs: list[bytes | None] = []
    phash = np.zeros(n, dtype=np.int64)
    ws = np.full(n, img_px, dtype=np.int32)
    hs = np.full(n, img_px, dtype=np.int32)
    if with_bytes:
        from ..codecs.image import decode_image
        for k in range(n):
            rng = np.random.Generator(np.random.Philox(key=[seed, int(content_ids[k])]))
            img = rng.integers(0, 256, size=(img_px, img_px, 3), dtype=np.uint8)
            blob = encode_image(img, str(fmt[k]))
            blobs.append(blob)
            # phash describes the STORED image: hash the decoded payload so
            # lossy quantization can never desync phash from bytes
            phash[k] = ahash64(decode_image(blob, str(fmt[k])))
    else:
        blobs = [None] * n
        phash = (hsh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)

    out = pd.DataFrame({
        "image_id": "img-" + pd.Series(ids).astype(str).str.zfill(8),
        "bytes": blobs,
        "w": ws, "h": hs,
        "fmt": fmt.astype(object),
        "caption": captions.to_numpy(),
        "phash": phash,
        "lon": lon, "lat": lat,
        "highway": highway,
        "ada_compliant": ada,
        "dataset_id": dataset_id,
    })
    if props_as_map:
        # driver-side convenience (small fixtures); the distributed path
        # assembles the map JVM-side in synth_images_df instead
        out["props"] = [{"highway": hw, "ada_compliant": a}
                        for hw, a in zip(highway, ada)]
        out = out[["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                   "lon", "lat", "props", "dataset_id"]]
    return out


def synth_images_df(spark, n: int, seed: int = 42, dataset_id: str = "ds-a",
                    skew: float = 0.3, img_px: int = 8, with_bytes: bool = True,
                    n_dups_of: tuple[int, int] | None = None,
                    jitter_deg: float = 0.0, parallelism: int | None = None):
    """Distributed generator: spark.range(n) -> mapInPandas(batch gen).

    ``n_dups_of=(d, src_n)`` marks the first d rows as duplicates of rows
    hash-spread over [0, src_n) — used to build dataset B sharing D images
    with dataset A for the union fixture.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..core.schema import IMAGES_SCHEMA
    d, src_n = n_dups_of if n_dups_of else (0, 1)

    flat_schema = T.StructType(
        [f for f in IMAGES_SCHEMA.fields if f.name != "props"]
        + [T.StructField("highway", T.StringType()),
           T.StructField("ada_compliant", T.StringType())])

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            dup = None
            if d:
                dup = np.where(ids < d, _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed + 99)).astype(np.int64) % src_n, -1)
            out = synth_images_pandas(ids, seed=seed, dataset_id=dataset_id,
                                      skew=skew, img_px=img_px,
                                      with_bytes=with_bytes, dup_src_ids=dup,
                                      jitter_deg=jitter_deg, props_as_map=False)
            yield out[[f.name for f in flat_schema.fields]]

    rng_df = spark.range(0, n, 1, parallelism or spark.sparkContext.defaultParallelism)
    flat = rng_df.mapInPandas(gen, schema=flat_schema)
    # props map built JVM-side (dict-per-row in Python is the slow path)
    return (flat.withColumn("props", F.create_map(
                F.lit("highway"), F.col("highway"),
                F.lit("ada_compliant"), F.col("ada_compliant")))
            .select(*[f.name for f in IMAGES_SCHEMA.fields]))


# ---------------------------------------------------------------------------
# Vector layers (FIXTURES.md T2/T3): street-grid edges, quad zones
# ---------------------------------------------------------------------------


def synth_edges_pandas(n_edges: int, seed: int = 42, dataset_id: str = "ds-a") -> pd.DataFrame:
    """Street grid spanning REGION: alternating horizontal/vertical
    polyline segments with 2-4 vertices, deterministic node ids."""
    lon0, lat0, lon1, lat1 = REGION
    ids = np.arange(n_edges, dtype=np.int64)
    hsh = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed + 1000))
    rows = []
    n_lines = max(int(np.sqrt(n_edges / 2)), 1)
    segs_per_line = max(n_edges // (2 * n_lines), 1)
    eid = 0
    for horiz in (True, False):
        for li in range(n_lines):
            frac = (li + 0.5) / n_lines
            for si in range(segs_per_line):
                if eid >= n_edges:
                    break
                f0 = si / segs_per_line
                f1 = (si + 1) / segs_per_line
                h = int(hsh[eid % n_edges] % 3)  # 0..2 extra mid vertices
                ts = np.linspace(f0, f1, 2 + h)
                if horiz:
                    coords = np.stack([lon0 + ts * (lon1 - lon0),
                                       np.full_like(ts, lat0 + frac * (lat1 - lat0))], axis=1)
                else:
                    coords = np.stack([np.full_like(ts, lon0 + frac * (lon1 - lon0)),
                                       lat0 + ts * (lat1 - lat0)], axis=1)
                rows.append({
                    "edge_id": eid,
                    "orig_node_id": eid * 2,
                    "dest_node_id": eid * 2 + 1,
                    "geometry": geom.wkb_linestring(coords),
                    "props": {"highway": "footway" if eid % 2 == 0 else "residential",
                              "surface": "concrete" if eid % 3 == 0 else "asphalt"},
                    "dataset_id": dataset_id,
                })
                eid += 1
    # top up to exactly n_edges with short diagonal filler segments
    while eid < n_edges:
        f = (eid + 0.5) / n_edges
        x = lon0 + f * (lon1 - lon0)
        y = lat0 + f * (lat1 - lat0)
        rows.append({
            "edge_id": eid, "orig_node_id": eid * 2, "dest_node_id": eid * 2 + 1,
            "geometry": geom.wkb_linestring([(x, y), (x + 1e-3, y + 1e-3)]),
            "props": {"highway": "footway" if eid % 2 == 0 else "residential",
                      "surface": "asphalt"},
            "dataset_id": dataset_id,
        })
        eid += 1
    return pd.DataFrame(rows)


def synth_edges_df(spark, n_edges: int, seed: int = 42, dataset_id: str = "ds-a"):
    from ..core.schema import EDGES_SCHEMA
    return spark.createDataFrame(synth_edges_pandas(n_edges, seed, dataset_id), schema=EDGES_SCHEMA)


def synth_zones_pandas(n_zones: int, seed: int = 42, dataset_id: str = "ds-a") -> pd.DataFrame:
    """Convex quads tiling part of REGION; every third zone is enlarged by
    30% so some zones overlap (FIXTURES.md T3)."""
    lon0, lat0, lon1, lat1 = REGION
    side = max(int(np.ceil(np.sqrt(n_zones))), 1)
    w = (lon1 - lon0) / side
    h = (lat1 - lat0) / side
    rows = []
    for zid in range(n_zones):
        gx, gy = zid % side, zid // side
        grow = 0.3 if zid % 3 == 0 else 0.0
        x0 = lon0 + gx * w - grow * w / 2
        y0 = lat0 + gy * h - grow * h / 2
        x1 = x0 + w * (1 + grow)
        y1 = y0 + h * (1 + grow)
        ring = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
        rows.append({
            "zone_id": zid,
            "node_ids": [zid * 4, zid * 4 + 1, zid * 4 + 2, zid * 4 + 3],
            "geometry": geom.wkb_polygon(ring),
            "props": {"zone_type": "plaza" if zid % 2 == 0 else "park"},
            "dataset_id": dataset_id,
        })
    return pd.DataFrame(rows)


def synth_zones_df(spark, n_zones: int, seed: int = 42, dataset_id: str = "ds-a"):
    from ..core.schema import ZONES_SCHEMA
    return spark.createDataFrame(synth_zones_pandas(n_zones, seed, dataset_id), schema=ZONES_SCHEMA)
