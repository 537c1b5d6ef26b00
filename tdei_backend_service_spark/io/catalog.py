"""Table catalog: partitioned parquet + manifest, an Iceberg-shaped
abstraction.

BASELINE.json's north_star calls for Iceberg tables; this sandbox ships
no Iceberg runtime jar (checked: pyspark 4.1.2 jars contain neither
iceberg nor delta), so the catalog keeps Iceberg's *query-relevant*
properties on plain parquet — exactly the properties the reference got
from Postgres indexes/partitioning:

* partition spec ``(dataset_id, cell_p5)``: the dataset filter on every
  reference query (interfaces.ts:319,323) prunes directories, and the
  coarse spatial prefix prunes to the bbox's region — directory-level
  partition pruning replaces the GiST index scan;
* parquet min/max column stats on lon/lat/envelopes: row-group pruning
  for range predicates (PushedFilters);
* snapshot semantics: writes land under ``snapshot=<n>`` directories
  with the manifest recording the current snapshot — the reference's
  in-place ``dataset_tag_road`` UPDATE becomes a new snapshot
  (SURVEY.md §3.3), readable while the next one builds.

Swapping in real Iceberg is a write/read-path change only (same
partition spec, same snapshot concept); every operator consumes plain
DataFrames.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

PARTITION_SPEC = ["dataset_id", "cell_p5"]


class Catalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self.meta_path = os.path.join(warehouse, "_catalog.json")
        self.meta = self._load()

    def _load(self) -> dict:
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                return json.load(f)
        return {"tables": {}}

    def _save(self) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.meta, f, indent=1, sort_keys=True)
        os.replace(tmp, self.meta_path)

    def write_snapshot(self, name: str, df: DataFrame,
                       partition_by: list[str] | None = None,
                       cluster_by: str | None = "cell_r8") -> int:
        """Write a new immutable snapshot of ``name``; returns its id.
        The previous snapshot stays readable until retired.

        ``cluster_by``: sort rows within each file by this column
        (default the res-8 cell id — Z-order, so spatially-near rows are
        byte-near). Parquet min/max stats per row group then prune bbox
        range predicates much harder than random row order would.
        """
        t = self.meta["tables"].setdefault(name, {"snapshots": [], "current": -1})
        snap = (t["snapshots"][-1] + 1) if t["snapshots"] else 0
        path = os.path.join(self.warehouse, name, f"snapshot={snap}")
        cols = partition_by if partition_by is not None else [
            c for c in PARTITION_SPEC if c in df.columns]
        if cluster_by and cluster_by in df.columns:
            df = df.sortWithinPartitions(cluster_by)
        writer = df.write.mode("overwrite")
        if cols:
            writer = writer.partitionBy(*cols)
        writer.parquet(path)
        t["snapshots"].append(snap)
        t["current"] = snap
        t["partition_by"] = cols
        self._save()
        return snap

    def read(self, spark: SparkSession, name: str,
             snapshot: int | None = None) -> DataFrame:
        t = self.meta["tables"][name]
        snap = t["current"] if snapshot is None else snapshot
        return spark.read.parquet(
            os.path.join(self.warehouse, name, f"snapshot={snap}"))

    def current_snapshot(self, name: str) -> int:
        return self.meta["tables"][name]["current"]
