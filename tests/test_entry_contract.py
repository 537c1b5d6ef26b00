import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) == 10  # one per fixture edge
    assert {f.name for f in df.schema.fields} == {"edge_id", "n"}


def test_queries_and_oracles_align():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # every SQL-expressible operator has its oracle
    assert len(oracles) >= 16
    assert len(qs) >= 22


@pytest.mark.parametrize("name", ["bbox_points", "knn_tag", "union_dedup",
                                  "spatial_join_count", "langid"])
def test_query_runs_small(spark, name):
    df = E.queries()[name](spark, SF)
    assert df.count() > 0


def test_payload_invariants_scale_and_zero_fn(spark):
    """payload_invariants rows scale with sf and EVERY generated image
    passes its decode invariant (zero false negatives) — the driver's
    rows-only count then pins the invariant check (VERDICT r2 next #8)."""
    assert E._payload_rows_for("/root/testdata/sf0.001") == 200
    assert E._payload_rows_for("/root/testdata/sf0.01") == 2000
    assert E._payload_rows_for("/root/testdata/sf0.1") == 20000
    df = E.queries()["payload_invariants"](spark, SF)
    assert df.count() == 200  # all 200 generated rows pass
