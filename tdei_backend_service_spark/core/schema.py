"""Table schemas (SURVEY.md §1.3 mapping of the reference data model).

Reference tables -> engine tables:

* ``content.node`` / ``content.extension_point`` point features
  (/root/reference/src/service/interface/interfaces.ts:195-199,225-228)
  -> ``images``: geotagged image+caption records per BASELINE.json
  input_hint, plus engine-derived cell/tile columns.
* ``content.edge`` (interfaces.ts:191-194) -> ``edges`` (WKB LineString +
  graph endpoints orig/dest_node_id; the reference's `_u_id`/`_v_id`
  virtual columns, interfaces.ts:401-405).
* ``content.zone`` / ``extension_polygon`` (interfaces.ts:200-204,233-236)
  -> ``zones`` (WKB Polygon + node_ids array).
* ``feature::jsonb`` properties bag (interfaces.ts:101) ->
  ``props: map<string,string>`` (the reference reads properties as text
  via ``->>``, so a string-valued map is faithful).
"""

from __future__ import annotations

from pyspark.sql import types as T

# input_hint columns first, engine-derived columns after.
IMAGES_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), True),
    T.StructField("w", T.IntegerType(), True),
    T.StructField("h", T.IntegerType(), True),
    T.StructField("fmt", T.StringType(), True),
    T.StructField("caption", T.StringType(), True),
    T.StructField("phash", T.LongType(), True),
    T.StructField("lon", T.DoubleType(), False),
    T.StructField("lat", T.DoubleType(), False),
    T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("dataset_id", T.StringType(), False),
])

# engine-derived (added by ingest.encode_cells): h3-ladder cell ids,
# tile key, partition prefix
DERIVED_CELL_COLS = ["cell_r7", "cell_r8", "cell_r9", "cell_r10", "cell_p5",
                     "tile_z", "tile_x", "tile_y", "tile_key"]

EDGES_SCHEMA = T.StructType([
    T.StructField("edge_id", T.LongType(), False),
    T.StructField("orig_node_id", T.LongType(), True),
    T.StructField("dest_node_id", T.LongType(), True),
    T.StructField("geometry", T.BinaryType(), False),
    T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("dataset_id", T.StringType(), False),
])

ZONES_SCHEMA = T.StructType([
    T.StructField("zone_id", T.LongType(), False),
    T.StructField("node_ids", T.ArrayType(T.LongType()), True),
    T.StructField("geometry", T.BinaryType(), False),
    T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("dataset_id", T.StringType(), False),
])

# dimension registry: the reference's dimension -> table binding switch
# (interfaces.ts:189-244). Targets: edge/node/zone only (:189-207);
# sources additionally allow the extension dimensions (:212-244).
DIMENSIONS = {
    "edge": {"table": "edges", "pk": ["edge_id"], "kind": "line"},
    "node": {"table": "images", "pk": ["image_id"], "kind": "point"},
    "zone": {"table": "zones", "pk": ["zone_id"], "kind": "polygon"},
    # extension layers share the images/edges/zones physical tables in the
    # rebuild; kept as aliases so the API surface matches the reference.
    "point": {"table": "images", "pk": ["image_id"], "kind": "point", "source_only": True},
    "line": {"table": "edges", "pk": ["edge_id"], "kind": "line", "source_only": True},
    "polygon": {"table": "zones", "pk": ["zone_id"], "kind": "polygon", "source_only": True},
    "extension": {"table": "images", "pk": ["image_id"], "kind": "point", "source_only": True},
}

TARGET_DIMENSIONS = {k for k, v in DIMENSIONS.items() if not v.get("source_only")}
