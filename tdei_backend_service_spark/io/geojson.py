"""O6 extract_dataset — OSW GeoJSON FeatureCollection export.

Reference: ``content.extract_dataset(tdei_dataset_id)`` returns one
cursor per layer file; the Node side assembles
``{"$schema": ..., <catalog metadata>, "type": "FeatureCollection",
"features": [...]}`` with rows joined by ',' and files named
``osw.<layer>s.geojson``
(/root/reference/src/service/base/osw-backend-abstract.ts:71-77,112-145;
file naming :120; metadata header :131-145; empty-result message :88-90).

Spark plan: the per-row Feature JSON is built entirely JVM-side with
``to_json(struct(...))`` (points) or a vectorized WKB->coordinates UDF
(lines/polygons), written as partitioned text; the driver then streams
part files into the single .geojson (header + comma-joined features +
footer) — the reference's cursor-append loop, minus the cursors. The
distributed write scales with the data; only the final concatenation is
single-stream, same as any single-file export.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..core import geom

NO_DATA_MESSAGE = "No data found for given prarameters."  # sic — matches osw-backend-abstract.ts:89


def _geometry_json_udf():
    @F.pandas_udf(T.StringType())
    def _gj(wkb: pd.Series) -> pd.Series:
        g = geom.parse_wkb_batch(wkb)
        out = []
        for i in range(len(g)):
            c = g.coords[g.offsets[i]:g.offsets[i + 1]]
            if g.kinds[i] == geom.WKB_POINT:
                out.append(json.dumps({"type": "Point", "coordinates": list(c[0])}))
            elif g.kinds[i] == geom.WKB_LINESTRING:
                out.append(json.dumps({"type": "LineString",
                                       "coordinates": [list(p) for p in c]}))
            elif g.kinds[i] == geom.WKB_POLYGON:
                out.append(json.dumps({"type": "Polygon",
                                       "coordinates": [[list(p) for p in c]]}))
            else:
                out.append("null")
        return pd.Series(out)
    return _gj


def feature_lines(df: DataFrame, exclude: tuple = ("bytes",)) -> DataFrame:
    """One GeoJSON Feature JSON string per row (column ``feature``).

    Points use lon/lat; vector layers decode WKB. Fixed columns (minus
    the heavy binary payload) plus the props bag become properties —
    the reference stores the full Feature per row (interfaces.ts:311-315).
    """
    has_geom = "geometry" in df.columns
    prop_cols = [c for c in df.columns
                 if c not in exclude + ("geometry", "lon", "lat", "props")]
    props_merged = F.map_concat(
        F.map_filter(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in prop_cols]),
                F.array(*[F.col(c).cast("string") for c in prop_cols])),
            lambda k, v: v.isNotNull()),
        F.coalesce(F.col("props"), F.create_map().cast("map<string,string>")))
    if has_geom:
        geometry = _geometry_json_udf()(F.col("geometry"))
    else:
        geometry = F.to_json(F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col("lon"), F.col("lat")).alias("coordinates")))
    feature = F.concat(
        F.lit('{"type":"Feature","geometry":'), geometry,
        F.lit(',"properties":'), F.to_json(props_merged), F.lit("}"))
    return df.select(feature.alias("feature"))


def export_geojson_sharded(df: DataFrame, out_dir: str, layer: str,
                           shards: int | None = None) -> str:
    """Scale-path export: newline-delimited GeoJSON features written as
    ``shards`` parallel text files under ``<out_dir>/<layer>.ndjson/``
    (no single-stream tail; each shard is a valid feature-per-line file,
    the common big-data GeoJSON interchange). Returns the directory."""
    part_dir = os.path.join(out_dir, f"{layer}.ndjson")
    out = feature_lines(df)
    if shards:
        out = out.repartition(shards)
    out.write.mode("overwrite").text(part_dir)
    return part_dir


def export_geojson(df: DataFrame, out_dir: str, layer: str,
                   metadata: dict | None = None) -> str | None:
    """Write ``osw.<layer>s.geojson``; returns the path, or None with the
    reference's no-data message semantics when the layer is empty."""
    part_dir = os.path.join(out_dir, f"_parts_{layer}")
    feature_lines(df).write.mode("overwrite").text(part_dir)

    parts = sorted(glob.glob(os.path.join(part_dir, "part-*")))
    final = os.path.join(out_dir, f"osw.{layer}s.geojson")
    wrote_any = False
    with open(final, "w") as out:
        # metadata keys first, then $schema only if the metadata didn't
        # already carry one — buildAdditionalInfo's order and dedup rule
        # (osw-backend-abstract.ts:131-145)
        header = dict(metadata or {})
        header.setdefault(
            "$schema",
            "https://sidewalks.washington.edu/opensidewalks/0.2/schema.json")
        head_json = json.dumps(header)[1:-1]  # splice metadata before features
        out.write("{" + (head_json + "," if head_json else "")
                  + '"type":"FeatureCollection","features":[')
        first = True
        for p in parts:
            with open(p) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    if not first:
                        out.write(",")
                    out.write(line)
                    first = False
                    wrote_any = True
        out.write("]}")
    shutil.rmtree(part_dir)
    if not wrote_any:
        os.remove(final)
        return None
    return final


def extract_dataset(layers: dict[str, DataFrame], dataset_id: str,
                    out_dir: str, metadata: dict | None = None,
                    layer_metadata: dict[str, dict] | None = None,
                    extensions: list[tuple[str, dict, DataFrame | None]] | None = None,
                    ) -> dict[str, str]:
    """Full dataset export: one GeoJSON file per layer (skipping empty
    layers), mirroring the reference's per-layer cursor files.

    ``layer_metadata`` maps layer name -> per-file info blob spliced into
    that file's FeatureCollection header — the reference's
    event_info/node_info/zone_info columns
    (osw-backend-abstract.ts:159-162, header build :131-145).
    ``extensions`` lists (name, file_meta, rows) extra GeoJSON layers —
    the reference's content.extension_file registry
    (osw-backend-abstract.ts:165-169,183-189); each is written as
    ``osw.<name>s.geojson`` with ``file_meta`` in its header. An
    extension with no rows still counts as requested but is skipped with
    the same empty-layer semantics as standard layers."""
    os.makedirs(out_dir, exist_ok=True)
    per_layer = layer_metadata or {}
    out: dict[str, str] = {}
    for layer, df in layers.items():
        meta = dict(metadata or {})
        meta.update(per_layer.get(layer, {}))
        path = export_geojson(df.filter(F.col("dataset_id") == dataset_id),
                              out_dir, layer, meta)
        if path:
            out[layer] = path
    for name, file_meta, rows in extensions or []:
        if rows is None:
            continue
        meta = dict(metadata or {})
        meta.update(file_meta or {})
        path = export_geojson(rows, out_dir, name, meta)
        if path:
            out[name] = path
    return out
