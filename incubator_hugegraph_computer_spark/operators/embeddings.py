"""Node embeddings: node2vec walks -> skip-gram (Spark ML Word2Vec).

Beyond-reference addition (SURVEY.md §2.10): the reference ships the
walk generator (``vermeer/algorithms/random_walk.go``,
``RandomWalk.java`` — p/q biases implemented in operators/
random_walk.py) but stops at emitting walks; node2vec's second half —
training skip-gram over the walk corpus (Grover & Leskovec, KDD'16) —
is the step that turns the link graph into the dense vectors the
embedding suite (emb_* queries, functions/similarity.py) consumes.

Spark-first shape: walks are already an ``array<long>`` column; the
only transformation is long -> string tokens (Word2Vec's vocabulary
is string-keyed), then ``pyspark.ml.feature.Word2Vec`` — JVM-side
hierarchical-softmax skip-gram, distributed over walk partitions — and
a vector -> array<double> projection back onto vertex ids. No Python
in the hot path.

100 TB shape: walk generation is the dominant cost and is the existing
BSP-join path (E-row joins per hop); Word2Vec training is linear in
corpus size and Spark ML distributes it via ``numPartitions`` (model
sync per iteration — the standard parameter-averaging trade). The
model's vocabulary (V × dim floats) must fit on the driver — at 10^9+
vertices cap the vocabulary upstream (walk only the vertex subset of
interest) or shard training per component.

Determinism: seeded walks are deterministic (Efraimidis-Spirakis
draws, operators/random_walk.py); Word2Vec with a fixed seed and
numPartitions=1 is deterministic for a fixed corpus, which is what the
default targets. Training is not SQL-replayable, so the driver gates
this query rows-only (no oracle_sql entry) — documented contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.random_walk import random_walk


def node2vec_embeddings(
    graph: Graph,
    dim: int = 16,
    walk_length: int = 8,
    walks_per_node: int = 2,
    return_factor: float = 1.0,
    inout_factor: float = 2.0,
    window: int = 4,
    max_iter: int = 1,
    seed: int = 42,
    num_partitions: int = 1,
) -> DataFrame:
    """(id: long, embedding: array<double>) — one row per vertex that
    appeared in at least one walk (isolated vertices have no corpus and
    therefore no vector, the Word2Vec convention)."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    walks = random_walk(
        graph,
        walk_length=walk_length,
        walks_per_node=walks_per_node,
        seed=seed,
        return_factor=return_factor,
        inout_factor=inout_factor,
    )
    corpus = walks.select(
        F.transform(F.col("path"), lambda v: v.cast("string")).alias("sentence")
    )
    model = Word2Vec(
        vectorSize=dim,
        windowSize=window,
        minCount=1,
        maxIter=max_iter,
        seed=seed,
        numPartitions=num_partitions,
        inputCol="sentence",
        outputCol="vec",
    ).fit(corpus)
    return model.getVectors().select(
        F.col("word").cast("long").alias("id"),
        vector_to_array(F.col("vector")).alias("embedding"),
    )
