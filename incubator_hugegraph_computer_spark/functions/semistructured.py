"""Schema-on-read extraction over semi-structured (JSON) columns.

Web-scale event and document corpora carry ragged JSON property bags;
the scalable pattern is to parse them ONCE per row into a typed struct
with ``from_json`` (JVM-side Jackson, inside whole-stage codegen — never
a Python json.loads) and let every downstream expression read struct
fields. Unparseable rows yield NULL fields instead of failing the job —
the behavior a 100 TB ingest needs (corrupt records are data, not
exceptions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def parse_props(
    events: DataFrame, json_col: str = "props", keys: tuple[str, ...] = ("k",)
) -> DataFrame:
    """Append one typed column per requested key, extracted from the
    JSON bag. One parse per row regardless of how many keys are read.

    Refuses key names that collide with existing columns — silently
    replacing a typed top-level column with a JSON-extracted one would
    corrupt downstream aggregates (e.g. ``props_stats`` averaging the
    extracted field where the caller meant the real ``value`` column)."""
    clash = set(keys) & set(events.columns)
    if clash:
        raise ValueError(
            f"extracted keys {sorted(clash)} collide with existing columns; "
            "rename the keys or drop the columns first"
        )
    schema = StructType([StructField(k, LongType()) for k in keys])
    parsed = events.withColumn("_p", F.from_json(F.col(json_col), schema))
    for k in keys:
        parsed = parsed.withColumn(k, F.col("_p").getField(k))
    return parsed.drop("_p")


def props_stats(
    events: DataFrame, json_col: str = "props", key: str = "k"
) -> DataFrame:
    """Per-event-type rollup over an extracted JSON property: count,
    sum/avg of the property, avg of the typed ``value`` column. One
    parse + one shuffle (the groupBy); partial aggregation is map-side."""
    p = parse_props(events, json_col=json_col, keys=(key,))
    return (
        p.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(key).cast("long").alias("sum_k"),
            F.avg(key).alias("_avg_k"),
            F.avg("value").alias("_avg_value"),
        )
        .select(
            "event_type",
            "n_events",
            "sum_k",
            F.round("_avg_k", 6).alias("avg_k"),
            F.round("_avg_value", 6).alias("avg_value"),
        )
    )
