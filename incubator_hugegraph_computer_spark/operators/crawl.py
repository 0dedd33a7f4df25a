"""Crawl frontier scheduling — politeness-aware fetch-slot assignment.

The operational layer a web crawler puts on top of an importance
measure (PageRank / OPIC / host rank): order the frontier by priority,
but never fetch the same host more often than the politeness delay
allows, and cap the per-host budget so one giant host cannot starve
the rest of the frontier. This completes the crawl tier alongside
``operators/opic.py`` (importance while crawling) and
``operators/quotient.py`` (host aggregation): importance says WHAT is
worth fetching, the schedule says WHEN it may be fetched.

Semantics (deterministic, window-expressible):

    host(v)     = v % host_mod          (the sandbox's host surrogate —
                                         the same grouping rule as
                                         quotient_graph / host_rank)
    priority(v) = in-degree(v)          (popularity proxy; callers can
                                         pass any (id, priority) frame)
    slot(v)     = rank of v within its host under
                  (priority DESC, id ASC) − 1
    fetch_ms(v) = slot(v) · delay_ms    (hosts crawl in parallel; the
                                         politeness gap is per-host)
    budget: rows with slot ≥ budget are dropped (per-host frontier cap)

Scale shape: ONE shuffle on the host key; the per-host window is
bounded by the per-host page count (real crawls have millions of
hosts, so per-host partitions are small — the %mod surrogate only
concentrates them at sandbox scale). No global ordering, no collect;
the priority column arrives from a prior job's output (e.g. OPIC
ranks) via an id-keyed join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def crawl_schedule(
    graph: Graph,
    host_mod: int = 64,
    delay_ms: int = 500,
    budget: int | None = None,
    priority: DataFrame | None = None,
) -> DataFrame:
    """(id, host, slot, fetch_ms) — per-host politeness schedule.

    ``priority``: optional (id, priority double) frame; defaults to the
    in-degree of the directed edge set (0 for never-cited pages).
    Ties break on id ASC, so the schedule is exactly replayable.
    """
    v = graph.vertices.select("id", (F.col("id") % host_mod).alias("host"))
    if priority is None:
        indeg = graph.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").cast("double").alias("priority")
        )
    else:
        indeg = priority.select("id", F.col("priority").cast("double"))
    ranked = (
        v.join(indeg, "id", "left")
        .withColumn("priority", F.coalesce("priority", F.lit(0.0)))
        .withColumn(
            "slot",
            F.row_number().over(
                Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("id"))
            )
            - F.lit(1),
        )
    )
    if budget is not None:
        ranked = ranked.where(F.col("slot") < budget)
    return ranked.select(
        "id",
        "host",
        "slot",
        (F.col("slot") * F.lit(delay_ms)).cast("long").alias("fetch_ms"),
    )
