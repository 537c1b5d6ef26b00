"""§2.3 generic relational operators — the reference's REST-side dynamic
query builder, re-expressed as DataFrame ops.

Reference: /root/reference/src/database/dynamic-query-object.ts —
projection (:30-32), inner equi-join on a shared column (:34-36),
conjunctive WHERE (:18-28,38-41), ORDER BY (:42-44), LIMIT/OFFSET
pagination with page_size capped at 50 (:45-58, cap :52, skip calc :51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PAGE_SIZE_CAP = 50  # dynamic-query-object.ts:52


def dynamic_query(df: DataFrame,
                  select: list[str] | None = None,
                  join: tuple[DataFrame, str] | None = None,
                  where: list[tuple[str, object]] | None = None,
                  order_by: tuple[str, str] | None = None,
                  page_no: int = 1, page_size: int = 10) -> DataFrame:
    """Paged listing query. ``where`` is a list of (column, value) equality
    conditions (the reference binds ``col = $n`` params). Pagination uses
    Spark's native offset/limit (Spark >= 3.4) — no row_number shuffle."""
    out = df
    if join is not None:
        other, on = join
        out = out.join(other, on=on, how="inner")
    for col, val in (where or []):
        out = out.filter(F.col(col) == F.lit(val))
    if select:
        out = out.select(*select)
    if order_by is not None:
        col, direction = order_by
        out = out.orderBy(F.col(col).desc() if str(direction).upper() == "DESC"
                          else F.col(col).asc())
    page_size = min(int(page_size), PAGE_SIZE_CAP)
    page_no = max(int(page_no), 1)
    skip = page_size * (page_no - 1)  # dynamic-query-object.ts:51
    if skip:
        out = out.offset(skip)
    return out.limit(page_size)
