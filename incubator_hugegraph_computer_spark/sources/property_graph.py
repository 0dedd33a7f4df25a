"""Property-graph ingest: labels + property maps + EdgeFrequency dedup.

Reference data model: a vertex carries (label, id, properties)
(``computer-api/.../core/graph/vertex/Vertex.java:27-60``), an edge
carries (label, name — the sort value —, targetId, properties)
(``edge/Edge.java:25-44``). During the input step duplicate rows are
collapsed under a configured property combiner
(``Merge{Old,New}PropertiesCombiner`` / ``OverwritePropertiesCombiner``,
``computer-api/.../core/combiner/*.java``), and the identity of an edge
is governed by ``EdgeFrequency``
(``computer-api/.../core/config/EdgeFrequency.java:23-42``):

    SINGLE            — one edge per (src, dst)
    SINGLE_PER_LABEL  — one edge per (src, label, dst)
    MULTIPLE          — one edge per (src, label, name, dst)

Here both load steps are a single groupBy over the identity key with the
chosen property combiner — Spark's partial aggregation gives the same
sender-side combining the reference applies in its input sort pipeline.
Property merge order inside a duplicate group follows a deterministic
``_seq`` ordering column when provided (the reference merges in arrival
order, which is partition-dependent there too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.functions import combiners
from incubator_hugegraph_computer_spark.graph import Graph

EDGE_FREQUENCIES = ("SINGLE", "SINGLE_PER_LABEL", "MULTIPLE")
_EDGE_KEYS = {
    "SINGLE": ["src", "dst"],
    "SINGLE_PER_LABEL": ["src", "label", "dst"],
    "MULTIPLE": ["src", "label", "name", "dst"],
}
PROPERTY_COMBINERS = ("merge_old", "merge_new", "overwrite")


def _props_type(df: DataFrame) -> tuple[str, str]:
    """(key_type, value_type) of the ``properties`` map column — forwarded
    into the combiners so non-string maps (map<string,double>, ...)
    ingest without a fold-seed type mismatch."""
    from pyspark.sql.types import MapType

    dt = df.schema["properties"].dataType
    if not isinstance(dt, MapType):
        raise ValueError(
            f"properties column must be a map, got {dt.simpleString()}"
        )
    return dt.keyType.simpleString(), dt.valueType.simpleString()


def _props_agg(combiner: str, ordered: bool, key_type: str, value_type: str):
    if combiner not in PROPERTY_COMBINERS:
        raise ValueError(f"properties combiner must be one of {PROPERTY_COMBINERS}")
    col = "properties"
    if combiner == "overwrite":
        if ordered:
            # OverwritePropertiesCombiner keeps the LAST arrival — with a
            # _seq column that is the max-_seq map, not an arbitrary
            # F.first over an unordered group
            return F.max_by(F.col(col), F.col("_seq"))
        return combiners.overwrite_properties(F.col(col))
    src = F.col(col)
    if ordered:
        # deterministic arrival order: fold property maps by _seq; the
        # comparator looks only at _seq (maps are not orderable)
        src = F.expr(
            "transform(array_sort(collect_list(struct(_seq, properties)), "
            "(l, r) -> CASE WHEN l._seq < r._seq THEN -1 "
            "WHEN l._seq > r._seq THEN 1 ELSE 0 END), x -> x.properties)"
        )
        fold = (
            (lambda acc, m: F.map_concat(
                acc, F.map_filter(m, lambda k, _: ~F.array_contains(F.map_keys(acc), k))
            ))
            if combiner == "merge_old"
            else (lambda acc, m: F.map_concat(
                F.map_filter(acc, lambda k, _: ~F.array_contains(F.map_keys(m), k)), m
            ))
        )
        return F.aggregate(
            src, F.expr(f"cast(map() as map<{key_type},{value_type}>)"), fold
        )
    if combiner == "merge_old":
        return combiners.merge_old_properties(F.col(col), key_type, value_type)
    return combiners.merge_new_properties(F.col(col), key_type, value_type)


def load_vertices(
    vertices: DataFrame,
    properties_combiner: str = "merge_new",
    seq_col: str | None = None,
) -> DataFrame:
    """Dedup vertex rows by id; label = min label (deterministic), the
    property maps merged per the configured combiner
    (``VertexValueCombiner`` binding, ``SortManager.java:185-200``).
    Input columns: (id, label, properties[, seq_col])."""
    df = vertices
    ordered = seq_col is not None
    if ordered:
        df = df.withColumnRenamed(seq_col, "_seq")
    kt, vt = _props_type(df)
    return df.groupBy("id").agg(
        F.min("label").alias("label"),
        _props_agg(properties_combiner, ordered, kt, vt).alias("properties"),
    )


def load_edges(
    edges: DataFrame,
    frequency: str = "SINGLE",
    properties_combiner: str = "merge_new",
    seq_col: str | None = None,
) -> DataFrame:
    """Dedup edge rows under the EdgeFrequency identity key, merging
    properties (``EdgeValueCombiner`` binding). Input columns:
    (src, dst[, label][, name], properties[, seq_col]); key columns
    missing from the identity key for the chosen frequency are ignored,
    key columns missing from the INPUT are an error."""
    if frequency not in _EDGE_KEYS:
        raise ValueError(f"frequency must be one of {EDGE_FREQUENCIES}")
    keys = _EDGE_KEYS[frequency]
    missing = [k for k in keys if k not in edges.columns]
    if missing:
        raise ValueError(f"edge input lacks identity columns {missing} for {frequency}")
    df = edges
    ordered = seq_col is not None
    if ordered:
        df = df.withColumnRenamed(seq_col, "_seq")
    kt, vt = _props_type(df)
    aggs = [_props_agg(properties_combiner, ordered, kt, vt).alias("properties")]
    # keep non-key metadata columns deterministically (min)
    for extra in ("label", "name"):
        if extra in df.columns and extra not in keys:
            aggs.append(F.min(extra).alias(extra))
    return df.groupBy(*keys).agg(*aggs)


class PropertyGraph:
    """Labelled property graph: deduplicated vertices + edges, plus a
    plain :class:`Graph` view (``as_graph``) for the algorithm suite —
    algorithms operate on (id / src,dst[,weight]) exactly as the
    reference's computations see ids and edge property lookups."""

    def __init__(
        self,
        vertices: DataFrame,
        edges: DataFrame,
        frequency: str = "SINGLE",
        properties_combiner: str = "merge_new",
        seq_col: str | None = None,
        num_partitions: int | None = None,
    ):
        self.frequency = frequency
        v_seq = seq_col if seq_col in (vertices.columns if seq_col else []) else None
        e_seq = seq_col if seq_col in (edges.columns if seq_col else []) else None
        if seq_col is not None and v_seq is None and e_seq is None:
            # a typo'd seq_col would otherwise silently demote the merge
            # to nondeterministic partial-agg order
            raise ValueError(
                f"seq_col {seq_col!r} found in neither vertices nor edges"
            )
        self.vertices = load_vertices(vertices, properties_combiner, v_seq)
        self.edges = load_edges(edges, frequency, properties_combiner, e_seq)
        self.num_partitions = num_partitions

    def as_graph(self, weight_property: str | None = None) -> Graph:
        """Plain algorithm view; ``weight_property`` extracts a numeric
        edge property into a ``weight`` column. Edges missing the
        property default to weight 1.0 — the reference's null-weight
        rule (``DegreeCentrality.weightValue``, DegreeCentrality.java:
        78-80) — never NULL, which a downstream sum would silently
        skip."""
        e = self.edges.select("src", "dst")
        if weight_property is not None:
            e = self.edges.select(
                "src",
                "dst",
                F.coalesce(
                    F.element_at(F.col("properties"), weight_property).cast("double"),
                    F.lit(1.0),
                ).alias("weight"),
            )
        return Graph(self.vertices.select("id"), e, self.num_partitions)

    def edge_label_counts(self) -> DataFrame:
        """(label, n_edges) after dedup — the ingest-audit statistic.
        Label-less ingest (legal for frequency='SINGLE') reports one
        NULL-label row instead of failing analysis."""
        if "label" not in self.edges.columns:
            return self.edges.agg(F.count(F.lit(1)).alias("n_edges")).select(
                F.lit(None).cast("string").alias("label"), "n_edges"
            )
        return self.edges.groupBy("label").agg(F.count(F.lit(1)).alias("n_edges"))
