"""tdei_backend_service_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch rebuild of the query capabilities of
TaskarCenterAtUW/TDEI-backend-service (reference at /root/reference, a
Node.js service delegating all spatial compute to PostGIS stored
functions) as an idiomatic Spark DataFrame engine:

* multi-resolution integer cell index (Morton grid, H3/S2-style) replaces
  the PostGIS GiST index as the spatial access path,
* two-phase joins (cell equi-join candidates -> vectorized numpy refine)
  replace `content.tdei_dataset_spatial_join`,
* kNN nearest-edge tagging via batched ring-expansion joins replaces
  `content.dataset_tag_road`,
* union + proximity dedup replaces `content.tdei_union_dataset`,
* bbox extraction replaces `content.bbox_intersect`,
* GeoJSON / OSM-XML exports replace `content.extract_dataset` /
  `content.export_osm_xml`.

Everything is DataFrame-first; Python executes only inside Arrow-batched
pandas UDFs (no per-row Python).
"""

__version__ = "0.1.0"
