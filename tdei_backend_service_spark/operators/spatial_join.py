"""O2 spatial_join — θ-spatial left join + group-by + property grafting.

Reference: ``content.tdei_dataset_spatial_join(target_id, <generated
SQL>, target_dim)`` — service at
/root/reference/src/service/services/spatial-query-service.ts:28-37,
query builder at /root/reference/src/service/interface/interfaces.ts:176-331.
The generated template (interfaces.ts:303-328):

    SELECT <target_pk>, JSONB_SET(target.feature, '{properties}',
           COALESCE(props,'{}') || <CASE aggs>, TRUE) AS feature
    FROM <target_dim> target
    LEFT JOIN <source_dim> source ON <join_condition>
         AND source.tdei_dataset_id = $src [AND <filters>]
    WHERE target.tdei_dataset_id = $tgt
    GROUP BY <target_pk>, target.feature

Semantics preserved here (SURVEY.md §2.2):
* O2a: join_condition compiled once (core/compiler.py), evaluated in the
  two-phase join (core/join.py) — candidates by cell, exact refine.
* O2b: join filters applied to each side BEFORE the join — equivalent to
  ON-clause placement under a left join.
* O2c/O2d: null-filtered aggregation; per aggregate the grafted
  ``ext:<alias>`` key appears iff the reference's
  ``CASE WHEN agg FILTER (WHERE col IS NOT NULL) IS NOT NULL`` fires:
  ARRAY_AGG -> only when at least one non-null value matched;
  COUNT -> always (0 for unmatched targets — COUNT over the null-padded
  left-join row is 0, which is not null); MIN/MAX/AVG/SUM -> only when
  non-null. Values are grafted into the string-valued ``props`` map as
  JSON text (arrays) or plain string scalars.
* O2e: exactly one output row per target feature; zero-match targets pass
  through with props untouched; empty aggregate list -> bare target scan.
* O2f: dimension registry validation (invalid dimension -> InputException,
  interfaces.ts:206,243).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.compiler import (CompiledAggregate, InputException,
                             compile_aggregate, compile_filter,
                             compile_join_condition)
from ..core.join import GeomSide, two_phase_join
from ..core.schema import DIMENSIONS, TARGET_DIMENSIONS


def _resolve_dimension(dim: str, as_target: bool) -> dict:
    if dim not in DIMENSIONS:
        raise InputException(f"invalid dimension {dim!r}")
    if as_target and dim not in TARGET_DIMENSIONS:
        raise InputException(f"dimension {dim!r} cannot be a join target")
    return DIMENSIONS[dim]


def _geom_side(df: DataFrame, dim_info: dict, carry: list[str]) -> GeomSide:
    kind = dim_info["kind"]
    if kind == "point":
        return GeomSide(df=df, pk=dim_info["pk"][0], kind=kind, carry=carry)
    return GeomSide(df=df, pk=dim_info["pk"][0], kind=kind,
                    geom_col="geometry", carry=carry)


def _agg_physical_column(agg: CompiledAggregate, df: DataFrame, dim: str) -> F.Column:
    from ..core.compiler import _ident_to_col
    if agg.column == "*":
        return F.lit(1)
    return _ident_to_col(agg.column, df.columns, dim)


def spatial_join(target_df: DataFrame, target_dimension: str, target_dataset_id: str,
                 source_df: DataFrame, source_dimension: str, source_dataset_id: str,
                 join_condition: str, aggregate: list[str] | None,
                 join_filter_target: str | None = None,
                 join_filter_source: str | None = None,
                 depth: int | None = None,
                 broadcast_source: bool | None = None,
                 adaptive_skew: bool | str = "auto",
                 skew_threshold_rows: int = 2_000_000,
                 metric_lat: float | None = None) -> DataFrame:
    t_info = _resolve_dimension(target_dimension, as_target=True)
    s_info = _resolve_dimension(source_dimension, as_target=False)
    pred = compile_join_condition(join_condition)

    t_pk = t_info["pk"][0]
    s_pk = s_info["pk"][0]

    t_base = target_df.filter(F.col("dataset_id") == target_dataset_id)
    s_base = source_df.filter(F.col("dataset_id") == source_dataset_id)

    tf = compile_filter(join_filter_target, target_df.columns, target_dimension)
    sf = compile_filter(join_filter_source, source_df.columns, source_dimension)
    if sf is not None:
        s_base = s_base.filter(sf)
    # target join-filter lives in the ON clause (interfaces.ts:320-321):
    # it restricts which targets can MATCH, not which targets appear.
    t_joinable = t_base.filter(tf) if tf is not None else t_base

    aggs = [compile_aggregate(a) for a in (aggregate or []) if a and a.strip()]
    if not aggs:
        # no-aggregate case: bare passthrough of the target scan
        # (interfaces.ts:296-298)
        return t_base

    # compute narrow aggregate input columns on the source BEFORE the join
    # so only (pk, agg inputs) travel through the candidate shuffle
    carry_names = []
    for i, a in enumerate(aggs):
        name = f"_aggin_{i}"
        s_base = s_base.withColumn(name, _agg_physical_column(a, source_df, source_dimension))
        carry_names.append(name)

    t_side = _geom_side(t_joinable, t_info, carry=[])
    s_side = _geom_side(s_base, s_info, carry=carry_names)

    pairs = two_phase_join(t_side, s_side, pred, depth=depth,
                           broadcast_source=broadcast_source,
                           adaptive_skew=adaptive_skew,
                           skew_threshold_rows=skew_threshold_rows,
                           metric_lat=metric_lat)

    agg_exprs = []
    for i, a in enumerate(aggs):
        fn = {"array_agg": F.collect_list, "collect_list": F.collect_list,
              "count": F.count, "min": F.min, "max": F.max,
              "avg": F.avg, "sum": F.sum}[a.func]
        agg_exprs.append(fn(F.col(f"s__aggin_{i}")).alias(f"_agg_{i}"))
    agged = pairs.groupBy(F.col(f"t_{t_pk}").alias(t_pk)).agg(*agg_exprs)

    out = t_base.join(agged, on=t_pk, how="left")

    # graft: props || {ext:alias: value} per O2d presence rules
    graft_maps = []
    for i, a in enumerate(aggs):
        c = F.col(f"_agg_{i}")
        key = F.lit(f"ext:{a.alias}")
        if a.func in ("array_agg", "collect_list"):
            present = c.isNotNull() & (F.size(c) > 0)
            value = F.to_json(c)
        elif a.func == "count":
            present = F.lit(True)
            value = F.coalesce(c, F.lit(0)).cast("string")
        else:
            present = c.isNotNull()
            value = c.cast("string")
        graft_maps.append(F.when(present, F.create_map(key, value))
                          .otherwise(F.create_map().cast("map<string,string>")))

    merged = F.coalesce(F.col("props"), F.create_map().cast("map<string,string>"))
    for gm in graft_maps:
        merged = F.map_concat(merged, gm)
    out = out.withColumn("props", merged)
    return out.drop(*[f"_agg_{i}" for i in range(len(aggs))])
