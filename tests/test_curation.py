import pandas as pd
from pyspark.sql import functions as F

from tdei_backend_service_spark.pipeline.curation import (filter_top_fraction,
                                                          pack_documents,
                                                          sample_per_key)


def test_pack_documents_block_assignment(spark):
    # one shard (n_shards=1): starts are a plain prefix cumsum
    rows = [(0, 100), (1, 100), (2, 100), (3, 700), (4, 50)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "n_tokens"]))
    out = {r.doc_id: r for r in
           pack_documents(df, budget=256, n_shards=1).collect()}
    # starts: 0, 100, 200, 300, 1000
    assert (out[0].pack_id, out[0].pack_offset) == (0, 0)
    assert (out[1].pack_id, out[1].pack_offset) == (0, 100)
    assert (out[2].pack_id, out[2].pack_offset) == (0, 200)
    # doc 3 starts in pack 1 and is longer than the budget
    assert (out[3].pack_id, out[3].pack_offset) == (1, 44)
    assert (out[4].pack_id, out[4].pack_offset) == (3, 232)
    assert all(r.shard == 0 for r in out.values())


def test_pack_documents_shards_are_independent(spark):
    rows = [(i, 64) for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "n_tokens"]))
    out = pack_documents(df, budget=128, n_shards=4).collect()
    # each shard holds ids i%4==s in id order: starts 0,64,128,... ->
    # pack flips every 2 docs, independent of other shards
    for r in out:
        assert r.shard == r.doc_id % 4
        rank_in_shard = r.doc_id // 4
        assert r.pack_id == rank_in_shard // 2
        assert r.pack_offset == (rank_in_shard % 2) * 64


def test_sample_per_key_deterministic_and_bounded(spark):
    rows = [(i, f"src{i % 3}") for i in range(200)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source"]))
    a = sorted((r.source, r.doc_id)
               for r in sample_per_key(df, "source", k=5).collect())
    b = sorted((r.source, r.doc_id)
               for r in sample_per_key(df, "source", k=5).collect())
    assert a == b  # reproducible
    per_key = {}
    for s, d in a:
        per_key.setdefault(s, []).append(d)
    assert set(per_key) == {"src0", "src1", "src2"}
    assert all(len(v) == 5 for v in per_key.values())
    # a different seed picks a different (still deterministic) set
    c = sorted((r.source, r.doc_id)
               for r in sample_per_key(df, "source", k=5, seed=99).collect())
    assert c != a


def test_sample_per_key_small_groups_pass_through(spark):
    rows = [(1, "only"), (2, "only")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source"]))
    out = sample_per_key(df, "source", k=10).collect()
    assert sorted(r.doc_id for r in out) == [1, 2]


def test_filter_top_fraction_integer_rule(spark):
    from tdei_backend_service_spark.pipeline.curation import \
        filter_top_fraction
    # key A: 5 rows -> keep floor-style rk*2 <= 5 -> ranks 1,2
    # key B: 4 rows -> ranks 1,2
    rows = ([(i, "A", float(100 - i)) for i in range(5)]
            + [(10 + i, "B", float(50 - i)) for i in range(4)])
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "score"]))
    out = sorted((r.source, r.doc_id) for r in
                 filter_top_fraction(df, "score", "source").collect())
    assert out == [("A", 0), ("A", 1), ("B", 10), ("B", 11)]
    # ties: equal scores break on lower id
    rows2 = [(1, "C", 1.0), (2, "C", 1.0), (3, "C", 1.0), (4, "C", 0.5)]
    df2 = spark.createDataFrame(
        pd.DataFrame(rows2, columns=["doc_id", "source", "score"]))
    out2 = sorted(r.doc_id for r in
                  filter_top_fraction(df2, "score", "source").collect())
    assert out2 == [1, 2]


# -- property-based parity vs pure-python references ----------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_docs = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(0, 500),
              st.sampled_from(["a", "b", "c"])),
    min_size=1, max_size=60, unique_by=lambda t: t[0])


@settings(max_examples=10, deadline=None)
@given(_docs, st.integers(1, 300), st.integers(1, 4))
def test_pack_documents_matches_reference(spark, docs, budget, n_shards):
    import pandas as pd
    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "n_tokens", "src"]))
    got = {r.doc_id: (r.shard, r.pack_id, r.pack_offset)
           for r in pack_documents(df, budget, n_shards).collect()}
    shards: dict = {}
    for d, t, _ in sorted(docs):
        shards.setdefault(d % n_shards, []).append((d, t))
    want = {}
    for s, members in shards.items():
        cum = 0
        for d, t in members:
            want[d] = (s, cum // budget, cum % budget)
            cum += t
    assert got == want


@settings(max_examples=10, deadline=None)
@given(_docs, st.integers(1, 3), st.integers(1, 4))
def test_filter_top_fraction_matches_reference(spark, docs, num, den):
    import pandas as pd
    if num > den:
        num = den  # fraction <= 1
    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "score", "src"]))
    got = sorted(r.doc_id for r in
                 filter_top_fraction(df, "score", "src", num, den).collect())
    want = []
    by_key: dict = {}
    for d, sc, k in docs:
        by_key.setdefault(k, []).append((d, sc))
    for k, members in by_key.items():
        members.sort(key=lambda t: (-t[1], t[0]))
        n = len(members)
        want += [d for d, _ in members[: (n * num) // den]]
    assert got == sorted(want)


@settings(max_examples=10, deadline=None)
@given(_docs, st.integers(1, 8), st.integers(0, 100))
def test_sample_per_key_matches_reference(spark, docs, k, seed):
    import pandas as pd
    from tdei_backend_service_spark.pipeline.curation import PACK_SCRAMBLE
    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "n", "src"]))
    got = sorted(r.doc_id for r in
                 sample_per_key(df, "src", k, seed=seed,
                                method="scramble").collect())
    by_key: dict = {}
    for d, _, kk in docs:
        by_key.setdefault(kk, []).append(d)
    want = []
    for kk, ids in by_key.items():
        ids.sort(key=lambda d: (((d + seed) * PACK_SCRAMBLE) % (1 << 32), d))
        want += ids[:k]
    assert got == sorted(want)


def test_sample_per_key_xxhash64_vs_scramble_stride_bias(spark):
    """Differential test for the two permutation methods (VERDICT r4
    next #2): ids laid out on the stride s = C^-1 mod 2^32 make the
    affine scramble MONOTONE in rank — its 'sample' is exactly the
    first-k prefix (maximally biased) — while xxhash64's avalanche
    output still samples uniformly across the range."""
    import pandas as pd
    from tdei_backend_service_spark.pipeline.curation import (PACK_SCRAMBLE,
                                                              SCRAMBLE_MAX_ID)
    inv = pow(PACK_SCRAMBLE, -1, 1 << 32)
    n, k = 200, 20
    # scramble(id_j) = j (seed 0); keep only ids inside the validated
    # scramble range — the monotone-in-j property is unaffected
    js = [j for j in range(4 * n)
          if (inv * j) % (1 << 32) <= SCRAMBLE_MAX_ID][:n]
    ids = [(inv * j) % (1 << 32) for j in js]
    rank = {d: pos for pos, d in enumerate(ids)}
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ids, "source": "s"}))
    scr = sorted(rank[r.doc_id] for r in
                 sample_per_key(df, "source", k=k, seed=0,
                                method="scramble").collect())
    assert scr == list(range(k))  # the documented affine failure mode
    xx = sorted(rank[r.doc_id] for r in
                sample_per_key(df, "source", k=k, seed=0,
                               method="xxhash64").collect())
    assert len(xx) == k
    assert xx != list(range(k))   # not the biased prefix
    assert max(xx) > n // 2       # spread over the whole range


def test_mix_domains_exact_totals_and_copy_indices(spark):
    from tdei_backend_service_spark.pipeline.curation import mix_domains
    rows = ([(i, "up") for i in range(10)]          # 3/1 -> 30 rows
            + [(100 + i, "down") for i in range(10)]  # 1/3 -> 3 rows
            + [(200 + i, "frac") for i in range(10)]  # 5/2 -> 25 rows
            + [(300 + i, "plain") for i in range(4)])  # default 1/1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source"]))
    out = mix_domains(df, "source",
                      {"up": (3, 1), "down": (1, 3), "frac": (5, 2)}).collect()
    per_key: dict = {}
    for r in out:
        per_key.setdefault(r.source, []).append((r.doc_id, r.copy))
    assert len(per_key["up"]) == 30
    assert len(per_key["down"]) == 3
    assert len(per_key["frac"]) == 25
    assert sorted(per_key["plain"]) == [(300 + i, 0) for i in range(4)]
    # up-sampling: every row appears 3x with copies 0,1,2
    ups: dict = {}
    for d, c in per_key["up"]:
        ups.setdefault(d, []).append(c)
    assert all(sorted(v) == [0, 1, 2] for v in ups.values())
    # down-sampling: a subset, each exactly once with copy 0
    assert all(c == 0 for _, c in per_key["down"])
    assert len({d for d, _ in per_key["down"]}) == 3
    # 5/2: each row 2 or 3 copies, contiguous from 0
    fr: dict = {}
    for d, c in per_key["frac"]:
        fr.setdefault(d, []).append(c)
    assert all(sorted(v) == list(range(len(v))) and len(v) in (2, 3)
               for v in fr.values())
    assert sum(len(v) for v in fr.values()) == 25


def test_mix_domains_deterministic(spark):
    from tdei_backend_service_spark.pipeline.curation import mix_domains
    rows = [(i, f"s{i % 2}") for i in range(50)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source"]))
    w = {"s0": (1, 2), "s1": (7, 3)}
    a = sorted((r.doc_id, r.copy) for r in mix_domains(df, "source", w).collect())
    b = sorted((r.doc_id, r.copy) for r in mix_domains(df, "source", w).collect())
    assert a == b
    c = sorted((r.doc_id, r.copy)
               for r in mix_domains(df, "source", w, seed=99).collect())
    assert c != a  # different permutation -> different down-sampled set


@settings(max_examples=10, deadline=None)
@given(_docs, st.integers(0, 4), st.integers(1, 3), st.integers(0, 100))
def test_mix_domains_matches_reference(spark, docs, num, den, seed):
    import pandas as pd
    from tdei_backend_service_spark.pipeline.curation import (PACK_SCRAMBLE,
                                                              mix_domains)
    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "n", "src"]))
    got = sorted((r.src, r.doc_id, r.copy) for r in
                 mix_domains(df, "src", {"a": (num, den)}, seed=seed,
                             default=(2, 1), method="scramble").collect())
    by_key: dict = {}
    for d, _, kk in docs:
        by_key.setdefault(kk, []).append(d)
    want = []
    for kk, ids in by_key.items():
        ids.sort(key=lambda d: (((d + seed) * PACK_SCRAMBLE) % (1 << 32), d))
        n_, d_ = (num, den) if kk == "a" else (2, 1)
        for rk, d in enumerate(ids, start=1):
            for c in range((rk * n_) // d_ - ((rk - 1) * n_) // d_):
                want.append((kk, d, c))
    assert got == sorted(want)


def test_sample_per_key_scramble_validates_id_range(spark):
    import pandas as pd
    import pytest
    from tdei_backend_service_spark.pipeline.curation import SCRAMBLE_MAX_ID
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, SCRAMBLE_MAX_ID + 10], "source": "s"}))
    with pytest.raises(Exception, match="out of range"):
        sample_per_key(df, "source", k=5, method="scramble").collect()
    # xxhash64 has no range limit
    out = sample_per_key(df, "source", k=5, method="xxhash64").collect()
    assert len(out) == 2


# ---------------------------------------------------------------------------
# global_shuffle
# ---------------------------------------------------------------------------


def test_global_shuffle_matches_flat_rank(spark):
    """The two-phase bucket rank must equal a flat single-order rank."""
    from tdei_backend_service_spark.pipeline.curation import (
        PACK_SCRAMBLE, global_shuffle)
    ids = [3, 17, 1, 999, 250_000, 42, 7, 0]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r["shuffle_pos"]
           for r in global_shuffle(df, method="scramble",
                                   n_buckets=16).collect()}
    ref = sorted(ids, key=lambda i: (((i + 7) * PACK_SCRAMBLE) % (1 << 32), i))
    assert got == {i: pos for pos, i in enumerate(ref)}


def test_global_shuffle_dense_permutation_both_methods(spark):
    from tdei_backend_service_spark.pipeline.curation import global_shuffle
    df = spark.range(0, 3000, 1, 8).withColumnRenamed("id", "doc_id")
    for method in ("scramble", "xxhash64"):
        pos = [r["shuffle_pos"] for r in
               global_shuffle(df, method=method, n_buckets=64).collect()]
        assert sorted(pos) == list(range(3000)), method
    a = global_shuffle(df, method="scramble", n_buckets=64)
    b = global_shuffle(df, method="xxhash64", n_buckets=64)
    joined = a.select("doc_id", F.col("shuffle_pos").alias("pa")) \
              .join(b.select("doc_id", F.col("shuffle_pos").alias("pb")),
                    "doc_id")
    assert joined.filter(F.col("pa") != F.col("pb")).count() > 0


def test_global_shuffle_seed_changes_order(spark):
    from tdei_backend_service_spark.pipeline.curation import global_shuffle
    df = spark.range(0, 500, 1, 4).withColumnRenamed("id", "doc_id")
    a = global_shuffle(df, seed=7)
    b = global_shuffle(df, seed=8)
    j = a.select("doc_id", F.col("shuffle_pos").alias("pa")) \
         .join(b.select("doc_id", F.col("shuffle_pos").alias("pb")), "doc_id")
    assert j.filter(F.col("pa") != F.col("pb")).count() > 0


def test_global_shuffle_no_single_partition_sort(spark):
    """The rank plan must never collapse to one partition (the naive
    global-window shape): no SinglePartition exchange."""
    from tdei_backend_service_spark.pipeline.curation import global_shuffle
    df = spark.range(0, 1000, 1, 8).withColumnRenamed("id", "doc_id")
    plan = global_shuffle(df, n_buckets=32) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_global_shuffle_scramble_range_guard(spark):
    from tdei_backend_service_spark.pipeline.curation import global_shuffle
    df = spark.createDataFrame([(1 << 62,)], "doc_id long")
    import pytest as _pt
    with _pt.raises(Exception, match="out of range"):
        global_shuffle(df, method="scramble").collect()


# ---------------------------------------------------------------------------
# geo_split — leakage-aware spatial holdout
# ---------------------------------------------------------------------------

def _geo_rows(n, lon0=-122.35, lat0=47.60, step=1e-5):
    import numpy as np
    rng = np.random.default_rng(11)
    return pd.DataFrame({
        "doc_id": range(n),
        "lon": lon0 + rng.integers(0, 10000, n) * step,
        "lat": lat0 + rng.integers(0, 10000, n) * step,
    })


def test_geo_split_same_cell_same_split(spark):
    """The leakage guarantee: rows inside one depth-d cell always share
    a split — planted clusters of 5 records jittered ~1/20 of a cell
    around centers well inside cell interiors."""
    from tdei_backend_service_spark.pipeline.curation import geo_split
    import numpy as np
    depth = 16
    size = 360.0 / (1 << depth)
    rng = np.random.default_rng(3)
    rows = []
    for c in range(200):
        # cell-center anchors: (ix+0.5, iy+0.5) in cell units
        ix = int(rng.integers(580000, 590000))
        iy = int(rng.integers(500000, 501000))
        cx = (ix + 0.5) * size - 180.0
        cy = (iy + 0.5) * (size / 2) - 90.0
        for j in range(5):
            rows.append({"doc_id": c * 10 + j,
                         "lon": cx + float(rng.uniform(-size / 20, size / 20)),
                         "lat": cy + float(rng.uniform(-size / 40, size / 40))})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = geo_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, depth=depth)
    got = {r.doc_id: r.split for r in out.collect()}
    assert len(got) == 1000 and set(got.values()) <= {"train", "val", "test"}
    for c in range(200):
        labels = {got[c * 10 + j] for j in range(5)}
        assert len(labels) == 1, f"cluster {c} split across {labels}"
    # sanity: with 200 independent cells all three splits appear
    assert len(set(got.values())) == 3


def test_geo_split_fractions_and_partition(spark):
    """Fractions are honored at cell granularity (xxhash64 avalanche):
    over ~10k distinct populated cells each split lands within a few
    points of its target share, and the labels partition the input."""
    from tdei_backend_service_spark.pipeline.curation import geo_split
    df = spark.createDataFrame(_geo_rows(20000))
    out = geo_split(df, {"train": 0.9, "val": 0.05, "test": 0.05},
                    depth=20).cache()
    n = out.count()
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert n == 20000 and sum(counts.values()) == n
    assert abs(counts["train"] / n - 0.9) < 0.03
    assert abs(counts.get("val", 0) / n - 0.05) < 0.02
    assert abs(counts.get("test", 0) / n - 0.05) < 0.02
    # determinism: a second invocation is identical row-for-row
    again = geo_split(spark.createDataFrame(_geo_rows(20000)),
                      {"train": 0.9, "val": 0.05, "test": 0.05}, depth=20)
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in again.collect()}
    assert a == b
    out.unpersist()


def test_geo_split_group_col_and_validation(spark):
    """group_col mode: the split unit is an arbitrary key (near-dup
    cluster id); string groups hash with xxhash64, scramble demands an
    integral column; bad fraction sets raise."""
    from tdei_backend_service_spark.pipeline.curation import geo_split
    import pytest as _pt
    rows = pd.DataFrame({"doc_id": range(300),
                         "cluster": [f"c{i % 60}" for i in range(300)],
                         "gid": [i % 60 for i in range(300)]})
    df = spark.createDataFrame(rows)
    out = geo_split(df, {"train": 0.5, "test": 0.5}, group_col="cluster")
    got = {}
    for r in out.collect():
        got.setdefault(r.cluster, set()).add(r.split)
    assert all(len(v) == 1 for v in got.values())
    # integral group + scramble works; string group + scramble raises
    geo_split(df, {"a": 0.5, "b": 0.5}, group_col="gid",
              method="scramble").collect()
    with _pt.raises(ValueError, match="integral group_col"):
        geo_split(df, {"a": 0.5, "b": 0.5}, group_col="cluster",
                  method="scramble")
    with _pt.raises(ValueError, match="sum to 1"):
        geo_split(df, {"a": 0.5, "b": 0.6})
    with _pt.raises(ValueError, match="> 0"):
        geo_split(df, {"a": 1.5, "b": -0.5})
    with _pt.raises(ValueError, match="zero width"):
        geo_split(df, {"a": 0.9999999, "b": 0.0000001})


def test_geo_split_scramble_matches_duckdb(spark):
    """Cross-engine parity of the scramble path: DuckDB computes the
    identical label from the identical closed form (the contract-row
    guarantee, checked here on synthetic coords at depth 20)."""
    import duckdb
    from tdei_backend_service_spark.pipeline.curation import geo_split
    pdf = _geo_rows(5000)
    df = spark.createDataFrame(pdf)
    out = geo_split(df, {"train": 0.8, "val": 0.1, "test": 0.1},
                    depth=20, method="scramble")
    got = {r.doc_id: r.split for r in out.collect()}
    want = dict(duckdb.connect().execute("""
        SELECT doc_id,
               CASE WHEN bkt < 800000 THEN 'train'
                    WHEN bkt < 900000 THEN 'val' ELSE 'test' END
        FROM (SELECT doc_id,
                     ((CAST(FLOOR((lon + 180.0) / (360.0 / 1048576.0)) AS BIGINT) * 4294967296
                       + CAST(FLOOR((lat + 90.0) / (180.0 / 1048576.0)) AS BIGINT))
                      % 999983 + 7) * 2654435761 % 1000000 AS bkt
              FROM pdf)
    """).fetchall())
    assert got == want


def test_split_leak_audit_flags_cross_split_dups(spark):
    """Near-dup pairs (within proximity + equal payload keys) whose
    splits differ are flagged; same-split dups, far pairs, and
    payload-mismatched neighbors are not. The metric_lat option flips
    a 0.668 m-equator / 0.450 m-local pair in and out of scope."""
    from tdei_backend_service_spark.pipeline.curation import split_leak_audit
    lat = 47.6
    rows = pd.DataFrame([
        # leak: 0.22 m apart, same payload, different splits
        {"image_id": "a0", "lon": -122.30, "lat": lat, "phash": 1,
         "caption": "x", "split": "train"},
        {"image_id": "b0", "lon": -122.30, "lat": lat + 2e-6, "phash": 1,
         "caption": "x", "split": "test"},
        # same-split dup: not a leak
        {"image_id": "a1", "lon": -122.20, "lat": lat, "phash": 2,
         "caption": "y", "split": "train"},
        {"image_id": "b1", "lon": -122.20, "lat": lat + 2e-6, "phash": 2,
         "caption": "y", "split": "train"},
        # payload mismatch at zero distance: not a dup at all
        {"image_id": "a2", "lon": -122.10, "lat": lat, "phash": 3,
         "caption": "z", "split": "train"},
        {"image_id": "b2", "lon": -122.10, "lat": lat, "phash": 4,
         "caption": "z", "split": "test"},
        # metric-flip pair: 6e-6 deg lon apart, different splits
        {"image_id": "a3", "lon": -122.00, "lat": lat, "phash": 5,
         "caption": "w", "split": "train"},
        {"image_id": "b3", "lon": -122.00 + 6e-6, "lat": lat, "phash": 5,
         "caption": "w", "split": "test"},
    ])
    df = spark.createDataFrame(rows)
    eq = split_leak_audit(df)
    assert [(r.pk_a, r.pk_b) for r in eq.collect()] == [("a0", "b0")]
    loc = split_leak_audit(df, metric_lat=lat)
    assert sorted((r.pk_a, r.pk_b) for r in loc.collect()) == [
        ("a0", "b0"), ("a3", "b3")]
