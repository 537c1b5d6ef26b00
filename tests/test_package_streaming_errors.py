import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from tdei_backend_service_spark.datagen import synth_images_df
from tdei_backend_service_spark.exceptions import (AmbiguousColumnError,
                                                   EngineError,
                                                   QuerySyntaxError,
                                                   UndefinedColumnError,
                                                   classify_spark_error)
from tdei_backend_service_spark.io.geojson import NO_DATA_MESSAGE, export_geojson
from tdei_backend_service_spark.io.package import response_message, zip_outputs
from tdei_backend_service_spark.streaming.ingest import ingest_available


def test_zip_and_response(spark, tmp_path):
    out = str(tmp_path)
    export_geojson(synth_images_df(spark, 20, with_bytes=False), out, "node")
    msg = response_message("m-1", "bbox_intersect", out, success=True)
    assert msg["data"]["success"]
    zpath = msg["data"]["file_upload_path"]
    assert zpath.endswith("export.zip") and os.path.exists(zpath)
    import zipfile
    with zipfile.ZipFile(zpath) as z:
        assert "osw.nodes.geojson" in z.namelist()
    assert os.path.exists(os.path.join(out, "job_response.json"))


def test_response_no_data(tmp_path):
    os.makedirs(tmp_path / "empty", exist_ok=True)
    msg = response_message("m-2", "bbox_intersect", str(tmp_path / "empty"),
                           success=True)
    assert not msg["data"]["success"]
    assert msg["data"]["message"] == NO_DATA_MESSAGE  # sic, reference typo


def test_error_classification(spark):
    df = spark.range(3)
    try:
        df.select(F.col("nope")).collect()
    except AnalysisException as e:
        mapped = classify_spark_error(e)
        assert isinstance(mapped, UndefinedColumnError)
        assert "nope" in str(mapped)
    try:
        spark.sql("SELEC 1")
    except Exception as e:
        mapped = classify_spark_error(e)
        assert isinstance(mapped, (QuerySyntaxError, EngineError))
    assert isinstance(classify_spark_error(RuntimeError("boom")), EngineError)


def test_streaming_ingest_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    manifest = str(tmp_path / "stream_manifest.jsonl")

    # drop batch 1, ingest, drop batch 2, ingest again (restart semantics)
    synth_images_df(spark, 100, with_bytes=False).write.mode("overwrite").parquet(landing)
    ingest_available(spark, landing, table, ckpt, manifest)
    assert spark.read.parquet(table).count() == 100

    synth_images_df(spark, 50, with_bytes=False, dataset_id="ds-b") \
        .write.mode("append").parquet(landing)
    ingest_available(spark, landing, table, ckpt, manifest)
    got = spark.read.parquet(table)
    assert got.count() == 150  # second run ingests ONLY the new files
    assert got.select("dataset_id").distinct().count() == 2
    assert "cell_r8" in got.columns  # enrichment applied in-stream
    lines = [json.loads(l) for l in open(manifest)]
    assert sum(e["rows"] for e in lines) == 150
