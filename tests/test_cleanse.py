"""pipeline/cleanse.py — eval-set decontamination and boilerplate line
removal, on small planted corpora with hand-computed answers."""

import pytest
from pyspark.sql import Row, functions as F

from tdei_backend_service_spark.pipeline.cleanse import (
    contamination_hits, decontaminate, dedup_lines, frequent_lines)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in rows])


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_contamination_hits_counts_distinct_grams(spark):
    train = _docs(spark, [
        (1, "a b c d e"),          # grams: "a b c","b c d","c d e"
        (2, "x y z w"),            # no overlap
        (3, "a b c a b c d"),      # distinct grams incl. "a b c","b c d"
    ])
    ev = _docs(spark, [(100, "a b c d")])  # eval grams: "a b c","b c d"
    got = {r["doc_id"]: r["n_hits"]
           for r in contamination_hits(train, ev, n=3).collect()}
    assert got == {1: 2, 3: 2}  # doc 2 absent (zero hits)


def test_contamination_distinct_within_doc(spark):
    # a doc repeating one contaminated gram 3 times still counts 1
    train = _docs(spark, [(1, "a b c a b c a b c")])
    ev = _docs(spark, [(9, "a b c")])
    [r] = contamination_hits(train, ev, n=3).collect()
    assert (r["doc_id"], r["n_hits"]) == (1, 1)


def test_decontaminate_min_hits_threshold(spark):
    train = _docs(spark, [
        (1, "a b c d e"),   # 3 hits vs eval below
        (2, "a b c x y"),   # 1 hit
        (3, "p q r s t"),   # 0 hits
    ])
    ev = _docs(spark, [(9, "a b c d e f")])
    assert sorted(r["doc_id"] for r in
                  decontaminate(train, ev, n=3, min_hits=1).collect()) == [3]
    assert sorted(r["doc_id"] for r in
                  decontaminate(train, ev, n=3, min_hits=2).collect()) == [2, 3]


def test_decontaminate_short_docs_never_contaminated(spark):
    # texts shorter than n words produce no grams on either side
    train = _docs(spark, [(1, "a b"), (2, "a b c")])
    ev = _docs(spark, [(9, "a b")])
    out = sorted(r["doc_id"] for r in
                 decontaminate(train, ev, n=3).collect())
    assert out == [1, 2]


def test_decontaminate_preserves_columns(spark):
    train = spark.createDataFrame(
        [Row(doc_id=1, text="p q r", source="s0", n_chars=5)])
    ev = _docs(spark, [(9, "a b c")])
    out = decontaminate(train, ev, n=3)
    assert out.columns == ["doc_id", "text", "source", "n_chars"]
    assert out.count() == 1


# ---------------------------------------------------------------------------
# line dedup
# ---------------------------------------------------------------------------

BOILER = "subscribe now"


def _lined(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text="\n".join(ls))
                                  for i, ls in rows])


def test_dedup_lines_removes_frequent_keeps_order(spark):
    docs = _lined(spark, [
        (1, ["alpha one", BOILER, "alpha two"]),
        (2, [BOILER, "beta one"]),
        (3, ["gamma one", BOILER]),
        (4, ["delta one"]),
    ])
    out = {r["doc_id"]: r for r in
           dedup_lines(docs, max_doc_freq=2).collect()}
    assert out[1]["text"] == "alpha one\nalpha two"
    assert (out[1]["n_lines_kept"], out[1]["n_lines_removed"]) == (2, 1)
    assert out[2]["text"] == "beta one"
    assert out[4]["text"] == "delta one"
    assert out[4]["n_lines_removed"] == 0


def test_dedup_lines_threshold_is_strictly_greater(spark):
    # line appears in exactly max_doc_freq docs -> KEPT
    docs = _lined(spark, [(1, ["common line", "u1"]),
                          (2, ["common line", "u2"])])
    out = {r["doc_id"]: r for r in
           dedup_lines(docs, max_doc_freq=2).collect()}
    assert out[1]["text"] == "common line\nu1"
    # one doc lower threshold -> removed
    out1 = {r["doc_id"]: r for r in
            dedup_lines(docs, max_doc_freq=1).collect()}
    assert out1[1]["text"] == "u1"
    assert out1[1]["n_lines_removed"] == 1


def test_dedup_lines_doc_frequency_not_occurrences(spark):
    # 3 repeats inside ONE doc is doc-frequency 1 -> kept
    docs = _lined(spark, [(1, ["rep", "rep", "rep"]), (2, ["other"])])
    out = {r["doc_id"]: r["text"] for r in
           dedup_lines(docs, max_doc_freq=1).collect()}
    assert out[1] == "rep\nrep\nrep"


def test_dedup_lines_fully_boilerplate_doc_survives_empty(spark):
    docs = _lined(spark, [(1, [BOILER]), (2, [BOILER]), (3, [BOILER]),
                          (4, ["real text"])])
    out = {r["doc_id"]: r for r in
           dedup_lines(docs, max_doc_freq=2).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["text"] == ""
    assert (out[1]["n_lines_kept"], out[1]["n_lines_removed"]) == (0, 1)


def test_frequent_lines_relation(spark):
    docs = _lined(spark, [(1, ["a", "b"]), (2, ["a", "c"]), (3, ["a"])])
    rows = frequent_lines(docs, max_doc_freq=2).collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 3


def test_dedup_lines_broadcasts_frequent_relation(spark):
    """The kill test must not shuffle the corpus: the frequent-line
    relation joins via BroadcastHashJoin (plan-pinned)."""
    docs = _lined(spark, [(1, ["a", "b"]), (2, ["a"]), (3, ["a"])])
    plan = dedup_lines(docs, max_doc_freq=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# zonal image stats (entry-level composition)
# ---------------------------------------------------------------------------


def test_zonal_image_stats_empty_zone_semantics(spark):
    """count grafts 0 for an empty zone; sum/max stay NULL (O2d)."""
    import __spark_entry__ as E
    from tdei_backend_service_spark import fixtures_tpch as FX
    from tdei_backend_service_spark.operators.spatial_join import \
        spatial_join
    zones = FX.quad_zones(spark, side=4, dataset_id="tpch-z")
    # keep only points in the first lon quarter -> zones 4..15 empty
    imgs = (FX.orders_images(spark, "/root/testdata/sf0.001")
            .filter((F.col("o_orderkey") * 2654435761) % 100000 < 25000))
    out = spatial_join(zones, "zone", "tpch-z", imgs, "point", "tpch",
                       "ST_Intersects(geometry_target, geometry_source)",
                       ["count(*) as n", "sum(w) as sum_w"])
    rows = {r["zone_id"]: r["props"] for r in out.collect()}
    assert len(rows) == 16
    empty = [z for z, p in rows.items() if p.get("ext:n") == "0"]
    assert len(empty) == 12
    for z in empty:
        assert "ext:sum_w" not in rows[z]
    full = [z for z, p in rows.items() if p.get("ext:n") != "0"]
    for z in full:
        assert int(rows[z]["ext:sum_w"]) > 0


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_planted(spark):
    from tdei_backend_service_spark.pipeline.cleanse import redact_pii
    docs = _docs(spark, [
        (1, "mail me at bob.smith@corp.io or sue_x@a.b.co thanks"),
        (2, "call 206-555-0147 or 425-555-9999 now"),
        (3, "clean text with digits 123 and dots. end"),
        (4, "mixed a@b.cd and 111-222-3333"),
    ])
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 0
    assert "sue_x" not in out[1]["text"]
    assert "corp.io" not in out[1]["text"] and "<EMAIL>" in out[1]["text"]
    assert out[2]["n_phones"] == 2 and out[2]["n_emails"] == 0
    assert out[2]["text"] == "call <PHONE> or <PHONE> now"
    assert out[3]["n_emails"] == 0 and out[3]["n_phones"] == 0
    assert out[3]["text"].endswith("dots. end")
    assert out[4]["text"] == "mixed <EMAIL> and <PHONE>"


def test_redact_pii_email_before_phone(spark):
    """A phone-shaped digit run inside an email local part is consumed
    by the email pass and must not count as a phone."""
    from tdei_backend_service_spark.pipeline.cleanse import redact_pii
    docs = _docs(spark, [(1, "odd 111-222-3333x@q.com addr")])
    [r] = redact_pii(docs).collect()
    assert r["n_emails"] == 1
    assert r["n_phones"] == 0
    assert r["text"] == "odd <EMAIL> addr"
