import math

import numpy as np
import pytest

from tdei_backend_service_spark.core import compiler as C


def test_hygiene_denylist():
    # mirrors /root/reference/test/unit/spatial-query.test.ts:179-185
    for bad in ["x; DROP TABLE", "delete from t", "1=1; truncate x"]:
        with pytest.raises(C.InputException):
            C.check_hygiene(bad)
    assert C.check_hygiene("  a   b  ") == "a b"


def test_join_condition_buffer_intersects():
    p = C.compile_join_condition(
        "ST_Intersects(ST_Buffer(geometry_target, 2), geometry_source)")
    assert p.bound_m == 2.0
    assert p.needs == {"dist"}
    got = C.eval_spatial(p.ast, {"dist": np.array([0.5, 1.9999, 2.5])})
    assert list(got) == [True, True, False]


def test_join_condition_angle():
    p = C.compile_join_condition(
        "degrees(ST_Angle(geometry_target, geometry_source)) < 30")
    assert math.isinf(p.bound_m)
    assert p.needs == {"angle"}
    got = C.eval_spatial(p.ast, {"angle": np.array([10.0, 29.9, 30.0, 45.0])})
    assert list(got) == [True, True, False, False]


def test_join_condition_conjunction_bound():
    p = C.compile_join_condition(
        "ST_Intersects(ST_Buffer(geometry_target, 5), geometry_source) "
        "AND degrees(ST_Angle(geometry_target, geometry_source)) < 30")
    assert p.bound_m == 5.0
    got = C.eval_spatial(p.ast, {"dist": np.array([1.0, 1.0, 9.0]),
                                 "angle": np.array([10.0, 40.0, 10.0])})
    assert list(got) == [True, False, False]


def test_join_condition_dwithin_and_distance():
    assert C.compile_join_condition(
        "ST_DWithin(geometry_target, geometry_source, 7)").bound_m == 7.0
    assert C.compile_join_condition(
        "ST_Distance(geometry_target, geometry_source) < 3").bound_m == 3.0
    p = C.compile_join_condition(
        "ST_Intersects(geometry_target, geometry_source)")
    assert p.bound_m == 0.0


def test_join_condition_or_bound_is_max():
    p = C.compile_join_condition(
        "ST_DWithin(geometry_target, geometry_source, 2) OR "
        "ST_DWithin(geometry_target, geometry_source, 10)")
    assert p.bound_m == 10.0


def test_join_condition_errors():
    with pytest.raises(C.InputException):
        C.compile_join_condition("ST_Evil(geometry_target)")
    with pytest.raises(C.InputException):
        C.compile_join_condition("ST_Intersects(geometry_target, other_col)")
    with pytest.raises(C.InputException):
        C.compile_join_condition("")
    with pytest.raises(C.InputException):
        C.compile_join_condition("DROP TABLE x")


def test_aggregate_parse():
    a = C.compile_aggregate("ARRAY_AGG(highway) as lamps")
    assert (a.func, a.column, a.alias) == ("array_agg", "highway", "lamps")
    a2 = C.compile_aggregate("count(*)")
    assert (a2.func, a2.column, a2.alias) == ("count", "*", "all")
    a3 = C.compile_aggregate("AVG(ext:confidence)")
    assert a3.alias == "ext_confidence"
    # virtual columns parse fine (rewrite happens at binding time,
    # interfaces.ts:398-405)
    assert C.compile_aggregate("ARRAY_AGG(_u_id) as us").column == "_u_id"


def test_aggregate_errors():
    # mirrors spatial-query.test.ts:171-177 (bad aggregate syntax)
    for bad in ["not an agg", "ARRAY_AGG(", "median(x)", "sum(a+b)"]:
        with pytest.raises(C.InputException):
            C.compile_aggregate(bad)


def test_st_contains_compiles_bound_zero_and_needs():
    from tdei_backend_service_spark.core.compiler import (
        compile_join_condition)
    p = compile_join_condition(
        "ST_Contains(geometry_target, geometry_source)")
    assert p.bound_m == 0.0
    assert p.needs == {"contains_ts"}
    p2 = compile_join_condition(
        "ST_Within(geometry_target, geometry_source)")
    assert p2.bound_m == 0.0 and p2.needs == {"contains_st"}
    # conjunct with a distance bound keeps the tighter bound (min)
    p3 = compile_join_condition(
        "ST_Contains(geometry_target, geometry_source) and "
        "ST_DWithin(geometry_target, geometry_source, 500)")
    assert p3.bound_m == 0.0 and p3.needs == {"contains_ts", "dist"}


def test_st_contains_arg_validation():
    from tdei_backend_service_spark.core.compiler import (
        InputException, compile_join_condition)
    for bad in ("ST_Contains(geometry_target)",
                "ST_Contains(geometry_source, geometry_source)",
                "ST_Within(ST_Buffer(geometry_target, 5), geometry_source)",
                "ST_Contains(geometry_target, 7)"):
        with pytest.raises(InputException):
            compile_join_condition(bad)
