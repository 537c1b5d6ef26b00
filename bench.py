#!/usr/bin/env python
"""Benchmark harness: headline spatial-join + tile-assignment suite.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec}, "sf": ..., "rows_per_sec": ...}

Each query materializes fully via a noop write (no driver collect).
The suite mirrors BASELINE.json's metric: bbox / spatial join / kNN
tagging / union-dedup / tile assignment over the geotagged fixture,
plus the dedup/text pipeline stages.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    import __spark_entry__ as E
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("tdei-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    headline = [
        "bbox_points", "bbox_edges", "cell_grid_agg", "tile_assign",
        "spatial_join_count", "zone_pip_count", "knn_tag", "union_dedup",
        "groupby_pricing", "topk_customers", "token_count", "exact_dedup",
        "minhash_dedup", "winnow_fingerprint", "embedding_topk", "ivf_topk",
        # r3 additions: angle predicate (cross-join + bounded paths) and
        # the O5/O6 export line builders
        "angle_join", "angle_buffer_join", "osm_ways", "geojson_lines",
        "audio_features", "video_frames", "tile_pyramid",
        # r4: every remaining contract query gets a wall-time row
        # (VERDICT r3 missing #3) — relational/text/LSH/PIP variants,
        # the iterative CC collapse, the real-decode metadata oracle,
        # the payload-invariant sweep, and both streaming operators
        "pagination", "proj_filter_join", "events_rollup",
        "events_top_per_user", "langid", "text_quality", "fingerprint",
        "simhash_dedup", "embedding_neardup", "tri_zone_pip",
        "union_cc", "decode_meta", "image_phash_dedup",
        "pack_docs", "sample_per_key", "quality_filter", "quantize_vecs",
        "ngram_top",
        # r5: cross-modal composition, domain-mixture resampling, and
        # the int8-scan + float-rerank IVF path
        "cross_modal_dedup", "incremental_phash_dedup",
        "incremental_embedding_dedup", "incremental_union",
        "incremental_minhash_dedup",
        "mix_domains", "ivf_quantized_topk", "ivf_indexed_topk",
        # r5 continuation: cleansing tier + zonal image stats
        "decontam_hits", "decontam_survivors", "line_dedup",
        "zonal_image_stats", "curate_corpus", "pii_redact",
        "corpus_shuffle",
        # r5 continuation: semantic-cluster dedup (cc over pair graphs)
        "hamming_cluster_dedup", "embedding_cluster_dedup",
        "corpus_report",
        "payload_invariants",
        "streaming_dedup", "windowed_events",
        # r5 fourth session: temporal tier, ranked kNN, keep-best
        # survivor policy, session windows, bucketed stores,
        # incremental tiles
        "sessionize", "asof_join", "knn_rank", "cluster_keep_best",
        "session_windows", "store_phash_dedup", "store_embedding_dedup",
        "incremental_tiles",
        # r5 fifth session: raster render tier (real PNG encode/decode),
        # geo-visual dedup, manifest-lineage tile store, live-layer merge
        "tile_raster", "raster_pyramid", "tile_mosaic",
        "geo_visual_dedup", "tile_viewport", "incremental_raster",
        "augment_meta", "streaming_tiles", "incremental_geo_visual",
        "raster_extract",
        # r5 sixth session: raster analytics (focal smoothing, layer
        # algebra, zonal stats over the decoded layer, hotspot top-k)
        "raster_focal", "raster_algebra", "zonal_raster",
        "raster_hotspots", "zone_burnin", "viewport_similar",
        "viewport_caption_similar",
        # r5 seventh session: trajectory tier + trajectory x raster
        # (speed heat-map layer, DDA route burn-in through PNG codec)
        "map_match", "trip_stats", "od_matrix", "coverage_gaps",
        "trip_segments", "speed_raster", "route_raster",
        "stay_points", "co_location", "edge_usage", "co_travelers",
        # r5 eighth session: geofence episodes + the visual raster
        # layer + per-tile representative thumbnails
        "zone_visits", "brightness_raster", "tile_gallery",
        "gallery_pyramid", "tile_terms", "decode_mse",
        "streaming_zones", "zonal_brightness", "incremental_gallery", "incremental_brightness",
        "incremental_terms",
        # r5 ninth session: graph traversal + analytics tier and the
        # rational TF-IDF retrieval rows
        "graph_hops", "network_distance", "triangle_count", "pagerank",
        "tfidf_search", "bm25_search", "viewport_tfidf",
        "postings", "cooccur_pmi", "service_area",
        "kcore", "link_jaccard",
        # r6: public connected-components (sidewalk islands) + the
        # ST_Contains predicate path
        "connected_components", "zone_contains_count",
        "dwithin_local_count",
        # r6 continuation: local metric on kNN tagging + union dedup,
        # leakage-aware geo holdout + split leak audit
        "knn_local_tag", "union_local_dedup",
        "geo_split_assign", "split_leak_pairs",
        "domain_split_assign", "coverage_gaps_local",
        # r6 continuation: line-line relate predicates
        "edge_cross_count",
    ]
    # every contract row gets a wall-time row (VERDICT r3 missing #3) —
    # self-maintaining: rows added to queries() but not listed above
    # are appended instead of silently dropping out of the bench
    headline += sorted(k for k in qs if k not in headline)

    # input size for throughput: rows entering the spatial suite
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()

    timings: dict[str, float] = {}
    for name in headline:
        fn = qs[name]
        # warm the input file listing cache, then time the full pipeline
        t0 = time.time()
        _materialize(fn(spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    spatial_rows = n_orders * 4 + n_cust * 2  # rows processed by the spatial suite
    spatial_secs = sum(timings[q] for q in
                       ("bbox_points", "cell_grid_agg", "tile_assign",
                        "spatial_join_count", "knn_tag", "union_dedup"))
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "spatial-join + tile-assignment suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows_per_sec": round(spatial_rows / max(spatial_secs, 1e-9), 1),
        "cpus": CPUS,
    }
    # Full per-query JSON first + a sidecar file; the LAST line is a
    # compact summary (slowest 12 queries only) so a tail-capture of
    # ~2000 chars always parses (VERDICT r5 wrong #2: the 121-query map
    # overflowed the driver's capture window and 'parsed' came back
    # null).
    print(json.dumps(result))
    try:
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/bench_full_latest.json", "w") as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:12])
    print(json.dumps({**{k: v for k, v in result.items() if k != "queries"},
                      "n_queries": len(timings),
                      "queries": slowest,
                      "queries_full": "BENCH/bench_full_latest.json"}))
    spark.stop()


if __name__ == "__main__":
    main()
