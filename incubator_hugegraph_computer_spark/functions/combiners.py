"""Message/value combiner library — Spark aggregate expressions.

One-to-one parity with the reference's combiner classes
(``computer-api/.../core/combiner/*.java``, SURVEY.md §2.2). A combiner
here is a function ``column -> aggregate Column`` applied inside the
inbox ``groupBy(dst).agg(...)`` of a message pass; Spark's hash
aggregate gives sender-side (partial, map-side) + receiver-side (final)
combining automatically — the same two application points as the
reference's sort pipeline (``SortManager.java:180-215``).

| reference class                       | here            |
|---------------------------------------|-----------------|
| Double/Float/Int/LongValueSumCombiner | ``sum``         |
| ValueMinCombiner / ValueMaxCombiner   | ``vmin``/``vmax`` (length-first order for strings — BytesUtil.compare, §1.3) |
| OverwriteCombiner                     | ``overwrite``   |
| IdListMergeCombiner                   | ``id_list_merge`` |
| IdSetMergeCombiner                    | ``id_set_merge``  |
| Merge{Old,New}PropertiesCombiner /    | ``merge_old_properties`` / ``merge_new_properties`` / ``overwrite_properties`` (map columns) |
|   OverwritePropertiesCombiner         |                 |
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def sum(col) -> Column:  # noqa: A001 - mirrors the reference's naming
    """``*ValueSumCombiner`` (Double/Float/Int/Long): numeric sum."""
    return F.sum(col)


def vmin(col, string_ids: bool = False) -> Column:
    """``ValueMinCombiner`` — min by Value.compareTo. For string ids the
    reference orders length-first then bytewise (``BytesUtil.compare``,
    computer-api/.../util/BytesUtil.java:61-73): min over
    struct(length, value) reproduces it exactly."""
    c = F.col(col) if isinstance(col, str) else col
    if string_ids:
        return F.min(F.struct(F.length(c).alias("l"), c.alias("v"))).getField("v")
    return F.min(c)


def vmax(col, string_ids: bool = False) -> Column:
    """``ValueMaxCombiner`` — max counterpart of :func:`vmin`."""
    c = F.col(col) if isinstance(col, str) else col
    if string_ids:
        return F.max(F.struct(F.length(c).alias("l"), c.alias("v"))).getField("v")
    return F.max(c)


def overwrite(col) -> Column:
    """``OverwriteCombiner`` — keep one message, any order
    (the reference keeps whichever arrives last in sort order; used only
    where the algorithm is insensitive to the choice)."""
    return F.first(col)


def id_list_merge(col) -> Column:
    """``IdListMergeCombiner`` — concatenate id lists."""
    return F.flatten(F.collect_list(col))


def id_set_merge(col) -> Column:
    """``IdSetMergeCombiner`` — union of id sets."""
    return F.array_distinct(F.flatten(F.collect_list(col)))


def merge_old_properties(col, key_type: str = "string", value_type: str = "string") -> Column:
    """``MergeOldPropertiesCombiner`` — map merge where already-present
    keys win: fold maps in arrival order, adding only new keys.
    ``key_type``/``value_type`` type the empty-map fold seed."""
    return F.aggregate(
        F.collect_list(col),
        F.expr(f"cast(map() as map<{key_type},{value_type}>)"),
        lambda acc, m: F.map_concat(
            acc, F.map_filter(m, lambda k, _: ~F.array_contains(F.map_keys(acc), k))
        ),
    )


def merge_new_properties(col, key_type: str = "string", value_type: str = "string") -> Column:
    """``MergeNewPropertiesCombiner`` — map merge where later keys win:
    fold maps, dropping overwritten keys from the accumulator first."""
    return F.aggregate(
        F.collect_list(col),
        F.expr(f"cast(map() as map<{key_type},{value_type}>)"),
        lambda acc, m: F.map_concat(
            F.map_filter(acc, lambda k, _: ~F.array_contains(F.map_keys(m), k)), m
        ),
    )


def overwrite_properties(col) -> Column:
    """``OverwritePropertiesCombiner`` — keep one whole property map."""
    return F.first(col)
