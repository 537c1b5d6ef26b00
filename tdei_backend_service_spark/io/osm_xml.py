"""O5 osw_osm_query — OSM XML export.

Reference: ``content.export_osm_xml(tdei_dataset_id)`` returns text
lines streamed in batches of 5000 to a .osm file
(/root/reference/src/service/services/osw-osm-query-service.ts:39-44;
streaming at /root/reference/src/service/base/osm-backend-abstract.ts:77-99,
batch size :79, line append :50), preceded by a dataset-existence check
(osw-osm-query-service.ts:30-37).

Spark plan: each XML line is built JVM-side (concat/format_string over
columns — no Python in the row path), written as partitioned text;
the driver stitches header + node lines + way lines + footer. Node ids
are the graph node ids; edges become <way> elements referencing their
orig/dest nodes, props becoming <tag> children.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, functions as F


class NotFoundException(ValueError):
    """Dataset missing — mirrors the reference's HTTP 404 path
    (osw-osm-query-service.ts:30-37)."""


def _xml_escape(col):
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col.cast("string"), "&", "&amp;"), "<", "&lt;"),
        '"', "&quot;")


def _tags_fragment():
    """props map -> concatenated <tag k=.. v=../> fragment (JVM-side)."""
    entries = F.map_entries(F.coalesce(F.col("props"),
                                       F.create_map().cast("map<string,string>")))
    frag = F.transform(entries, lambda e: F.concat(
        F.lit('<tag k="'), _xml_escape(e["key"]),
        F.lit('" v="'), _xml_escape(e["value"]), F.lit('"/>')))
    return F.array_join(frag, "")


def node_lines(images: DataFrame) -> DataFrame:
    line = F.concat(
        F.lit('<node id="'), F.xxhash64(F.col("image_id")),
        F.lit('" lat="'), F.col("lat").cast("string"),
        F.lit('" lon="'), F.col("lon").cast("string"),
        F.lit('" version="1">'), _tags_fragment(), F.lit("</node>"))
    return images.select(line.alias("line"))


def way_lines(edges: DataFrame) -> DataFrame:
    line = F.concat(
        F.lit('<way id="'), F.col("edge_id").cast("string"),
        F.lit('" version="1">'),
        F.lit('<nd ref="'), F.col("orig_node_id").cast("string"), F.lit('"/>'),
        F.lit('<nd ref="'), F.col("dest_node_id").cast("string"), F.lit('"/>'),
        _tags_fragment(), F.lit("</way>"))
    return edges.select(line.alias("line"))


def export_osm_xml(layers: dict[str, DataFrame], dataset_id: str,
                   out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    known = any(not df.filter(F.col("dataset_id") == dataset_id).isEmpty()
                for df in layers.values())
    if not known:
        raise NotFoundException(f"dataset {dataset_id!r} not found")

    final = os.path.join(out_dir, f"{dataset_id}.osm")
    with open(final, "w") as out:
        out.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        out.write('<osm version="0.6" generator="tdei-backend-service-spark">\n')
        for layer, maker in (("images", node_lines), ("edges", way_lines)):
            df = layers.get(layer)
            if df is None:
                continue
            part_dir = os.path.join(out_dir, f"_parts_osm_{layer}")
            maker(df.filter(F.col("dataset_id") == dataset_id)) \
                .write.mode("overwrite").text(part_dir)
            for p in sorted(glob.glob(os.path.join(part_dir, "part-*"))):
                with open(p) as f:
                    shutil.copyfileobj(f, out)
            shutil.rmtree(part_dir)
        out.write("</osm>\n")
    return final
