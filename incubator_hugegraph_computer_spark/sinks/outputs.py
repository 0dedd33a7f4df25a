"""Output sinks — parity with the reference's ComputerOutput family.

| reference | here |
|---|---|
| ``output/hdfs/HdfsOutput.java:38-115`` — per-partition text files of `id <delimiter> value`, optional merge of partition files into one | :func:`write_hdfs_text` |
| ``io/CsvStructGraphOutput.java:38-90`` — vertex rows as delimited columns (id, value fields flattened) | :func:`write_csv_struct` |
| ``io/JsonStructGraphOutput.java:48-100`` — vertex rows as JSON objects | :func:`write_json_struct` |
| ``output/LogOutput.java`` / ``LimitedLogOutput.java`` — debugging sink | :func:`log_output` |
| ``ComputerOutput.filter`` hook (applied per vertex before write, ``FileGraphPartition.java:258``) | the ``output_filter`` Column argument on every writer |

All writers take a result DataFrame whose first column is the vertex
``id``; remaining columns are the value payload. The ``merge`` flag on
the text writer mirrors ``HdfsOutputMerger`` (coalesce to one file) —
a driver-funnel by design, only for small result exports; the default
keeps one file per partition exactly like the reference's per-partition
output step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _filtered(result: DataFrame, output_filter: Column | None) -> DataFrame:
    # ComputerOutput.filter analogue: per-vertex predicate before write
    return result if output_filter is None else result.where(output_filter)


def write_hdfs_text(
    result: DataFrame,
    path: str,
    delimiter: str = ",",
    merge: bool = False,
    output_filter: Column | None = None,
) -> None:
    """``id<delimiter>value[<delimiter>value...]`` lines
    (HdfsOutput.writeString semantics); ``merge=True`` = the
    HdfsOutputMerger partition-file merge (single output file)."""
    df = _filtered(result, output_filter)
    # concat_ws SKIPS nulls (shifting later fields left); coalesce each
    # field to '' so every line keeps its full column positions
    line = F.concat_ws(
        delimiter,
        *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns],
    )
    out = df.select(line.alias("value"))
    if merge:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)


def write_csv_struct(
    result: DataFrame,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    output_filter: Column | None = None,
) -> None:
    """CsvStructGraphOutput: flattened delimited columns. Struct/array
    value columns are JSON-encoded into their cell (the reference
    serializes nested values field-by-field; CSV cells must be scalar)."""
    df = _filtered(result, output_filter)
    cols = []
    for name, dtype in df.dtypes:
        if dtype.startswith(("struct", "array", "map")):
            cols.append(F.to_json(F.col(name)).alias(name))
        else:
            cols.append(F.col(name))
    df.select(*cols).write.mode("overwrite").option("header", header).option(
        "sep", delimiter
    ).csv(path)


def write_json_struct(
    result: DataFrame,
    path: str,
    output_filter: Column | None = None,
) -> None:
    """JsonStructGraphOutput: one JSON object per vertex row."""
    _filtered(result, output_filter).write.mode("overwrite").json(path)


def log_output(
    result: DataFrame,
    limit: int | None = 20,
    output_filter: Column | None = None,
) -> None:
    """LogOutput / LimitedLogOutput: print rows for debugging; ``limit``
    caps the rows like LimitedLogOutput; ``limit=None`` streams every
    row through ``toLocalIterator`` (one computation, no driver-side
    collect of the whole result, unlike show(count()) which would run
    the plan twice and buffer everything)."""
    df = _filtered(result, output_filter)
    if limit is not None:
        df.show(limit, truncate=False)
        return
    for row in df.toLocalIterator():
        print(row)
