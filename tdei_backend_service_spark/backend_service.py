"""Job validation + service dispatch — the engine's front door.

Reference: /root/reference/src/service/backend-service.ts —
Ajv message-schema validation (:13-35, errors joined :70), service
lookup from services.json (:77-82), required-parameter check (:85-91),
dispatch switch (:94-113). The queue itself (Azure Service Bus,
subscriptions.json) is transport, not query semantics; here a job is a
plain dict and the runner is synchronous — a driver-side job loop or a
Structured Streaming foreachBatch can wrap it unchanged.

A ``Catalog`` holds the layer DataFrames per logical table; services
resolve their inputs from it, mirroring the reference's
dimension->table binding.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .core.compiler import InputException
from .operators.bbox import bbox_intersect
from .operators.spatial_join import spatial_join
from .operators.tag_road import dataset_tag_road
from .operators.union_dataset import union_dataset

# service registry: name -> required/optional parameters
# (mirrors /root/reference/src/services.json)
SERVICES: dict[str, dict] = {
    "bbox_intersect": {
        "required": ["tdei_dataset_id", "bbox"],
        "optional": [],
    },
    "dataset_tag_road": {
        "required": ["source_dataset_id", "target_dataset_id"],
        "optional": ["attrs", "cutoff_m"],
    },
    "spatial_join": {
        "required": ["source_dataset_id", "source_dimension",
                     "target_dataset_id", "target_dimension",
                     "join_condition", "aggregate"],
        "optional": ["join_filter_target", "join_filter_source"],
    },
    "union_dataset": {
        "required": ["tdei_dataset_id_one", "tdei_dataset_id_two"],
        "optional": ["proximity"],
    },
    "osw_osm_query": {
        "required": ["tdei_dataset_id"],
        "optional": [],
    },
}


class ServiceNotFoundException(ValueError):
    """Unknown service (backend-service.ts:77-82)."""


@dataclass
class Catalog:
    """Logical tables: every dataset's layers live in shared DataFrames
    filtered by dataset_id — the reference's multi-tenant table layout."""
    images: DataFrame
    edges: DataFrame | None = None
    zones: DataFrame | None = None
    # per-dataset per-layer info blobs -> FeatureCollection headers: one
    # row (dataset_id, layer, info_json) per blob — the reference's
    # content.dataset event_info/node_info/zone_info/ext_*_info columns
    # (osw-backend-abstract.ts:159-162)
    dataset_info: DataFrame | None = None
    # extension-layer registry (dataset_id, name, file_meta JSON) + the
    # extension feature rows (dataset_id, name, lon/lat|geometry, props)
    # — the reference's content.extension_file
    # (osw-backend-abstract.ts:165-169,183-189)
    extension_files: DataFrame | None = None
    extensions: DataFrame | None = None

    def layers(self) -> dict[str, DataFrame]:
        out = {"images": self.images}
        if self.edges is not None:
            out["edges"] = self.edges
        if self.zones is not None:
            out["zones"] = self.zones
        return out

    def layer_metadata(self, dataset_id: str) -> dict[str, dict]:
        """{layer: header-info dict} for one dataset. The registry is
        per-dataset tiny (a handful of blobs), so the collect is
        bounded by construction."""
        import json as _json
        if self.dataset_info is None:
            return {}
        from pyspark.sql import functions as F
        rows = (self.dataset_info
                .filter(F.col("dataset_id") == dataset_id).collect())
        out: dict[str, dict] = {}
        for r in rows:
            try:
                blob = _json.loads(r["info_json"]) if r["info_json"] else None
            except (ValueError, TypeError):
                blob = None
            if isinstance(blob, dict) and blob:
                out[r["layer"]] = blob
        return out

    def extension_layers(self, dataset_id: str) \
            -> list[tuple[str, dict, DataFrame | None]]:
        """[(name, file_meta, rows)] for one dataset's registered
        extension files; rows is None when no feature table is loaded."""
        import json as _json
        if self.extension_files is None:
            return []
        from pyspark.sql import functions as F
        regs = (self.extension_files
                .filter(F.col("dataset_id") == dataset_id)
                .select("name", "file_meta").collect())
        out = []
        for r in regs:
            try:
                meta = _json.loads(r["file_meta"]) if r["file_meta"] else {}
            except (ValueError, TypeError):
                meta = {}
            rows = None
            if self.extensions is not None:
                rows = (self.extensions
                        .filter((F.col("dataset_id") == dataset_id)
                                & (F.col("name") == r["name"]))
                        .drop("name"))
            out.append((r["name"], meta if isinstance(meta, dict) else {}, rows))
        return out

    def for_dimension(self, dim: str) -> DataFrame:
        from .core.schema import DIMENSIONS
        if dim not in DIMENSIONS:
            raise InputException(f"invalid dimension {dim!r}")
        table = DIMENSIONS[dim]["table"]
        df = {"images": self.images, "edges": self.edges, "zones": self.zones}[table]
        if df is None:
            raise InputException(f"dimension {dim!r} has no table loaded")
        return df


def validate_request(message: dict) -> tuple[str, dict]:
    """Message-shape + required-parameter validation
    (backend-service.ts:67-91). Returns (service, parameters)."""
    if not isinstance(message, dict):
        raise InputException("message must be an object")
    data = message.get("data", message)
    service = data.get("service")
    params = data.get("parameters")
    if not isinstance(service, str) or not service:
        raise InputException("missing required field: service")
    if not isinstance(params, dict):
        raise InputException("missing required field: parameters")
    spec = SERVICES.get(service)
    if spec is None:
        raise ServiceNotFoundException(f"service not found: {service}")
    missing = [p for p in spec["required"] if p not in params]
    if missing:
        raise InputException(
            f"required parameters missing: {', '.join(missing)}")
    unknown = [p for p in params
               if p not in spec["required"] + spec["optional"]]
    if unknown:
        # Ajv removeAdditional drops extras (backend-service.ts:13-35)
        params = {k: v for k, v in params.items() if k not in unknown}
    return service, params


def dispatch(catalog: Catalog, message: dict):
    """Run one job. DataFrame-returning services yield per-layer
    DataFrames; export services return output paths."""
    service, p = validate_request(message)

    if service == "bbox_intersect":
        return bbox_intersect(catalog.layers(), p["tdei_dataset_id"], p["bbox"])

    if service == "spatial_join":
        return spatial_join(
            catalog.for_dimension(p["target_dimension"]), p["target_dimension"],
            p["target_dataset_id"],
            catalog.for_dimension(p["source_dimension"]), p["source_dimension"],
            p["source_dataset_id"],
            p["join_condition"], p["aggregate"],
            p.get("join_filter_target"), p.get("join_filter_source"))

    if service == "dataset_tag_road":
        if catalog.edges is None:
            raise InputException("no edges table loaded")
        return dataset_tag_road(
            catalog.images, p["target_dataset_id"],
            catalog.edges, p["source_dataset_id"],
            attrs=p.get("attrs"), cutoff_m=float(p.get("cutoff_m", 50.0)))

    if service == "union_dataset":
        return union_dataset(catalog.images, p["tdei_dataset_id_one"],
                             catalog.images, p["tdei_dataset_id_two"],
                             proximity=p.get("proximity"))

    if service == "osw_osm_query":
        import tempfile

        from .io.osm_xml import export_osm_xml
        out_dir = tempfile.mkdtemp(prefix="osm_export_")
        return export_osm_xml(catalog.layers(), p["tdei_dataset_id"], out_dir)

    raise ServiceNotFoundException(service)  # pragma: no cover
