"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship PageRank on the orders-derived graph at
sf0.001. ``queries()`` — one callable per implemented operator from
SURVEY.md §2 (+ the training-data-pipeline operators). ``oracle_sql()``
— the equivalent DuckDB SQL over the same parquet views; iterative
algorithms are oracled as *fixed-iteration unrolled CTEs* (both sides
run the identical recurrence) or recursive CTEs (converged semantics).

Column names and float rounding (6 dp) match exactly on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.sources.tpch_graph import (
    BOTH_SQL,
    DST_MOD,
    EDGES_SQL,
    SYM_SQL,
    VERTICES_SQL,
    orders_graph,
)

SSSP_SOURCE = 1
PPR_SOURCE = 1
# change-impact analysis: deterministic "changed files" batch + hop budget
IMPACT_SEED_MOD = 211
IMPACT_DEPTH = 4
# local-similarity sparsifier: keep top ceil(deg^e) edges per vertex
SPARSIFY_E = 0.5
# threshold cascade: seed set, integer threshold, round budget
CASCADE_MOD = 97
CASCADE_K = 2
CASCADE_ROUNDS = 6
# ACL sweep-cut prefix budget: the conductance curve is reported for the
# top-64 degree-normalized PPR positions (parameter-sized — the sweep
# frame broadcasts and its windows are 64-row)
SWEEP_MAX = 64
PR_ITERS = 5
PPR_ITERS = 5
OPIC_ITERS = 5  # OPIC cash-distribution steps (fixed, oracle-unrolled)
CRAWL_DELAY_MS = 500  # politeness gap between fetches of the same host
# per-host frontier budget — BINDS at gate scale (~23 pages/host at
# sf0.01 under the %64 host rule), so the cap semantics are exercised
CRAWL_BUDGET = 16
LPA_SYNC_ITERS = 3
LPA_ROUNDS = 10
KCORE_K = 3
KCORE_ROUNDS = 12
CLOSENESS_SEED_MAX = 50
TOPK = 10
RINGS_LEN = 4
BETW_SRC_MAX = 30
BETW_DEPTH = 14
# md5-coin pivot sample for the scaled Brandes estimator: first-2-hex
# threshold "0a" ≈ 3.9% of vertices, replayed bit-identically by DuckDB
BETW_SAMPLE_HEX = "0a"
BETW_SAMPLE_SEED = 7
DENSEST_EPS = 0.1
DENSEST_ROUNDS = 8
SMOOTH_ROUNDS = 3
SMOOTH_ALPHA = 0.5
IVF_CENTROIDS = 16
IVF_PROBE = 4
RW_LEN = 5
SSSP_PATH_ITERS = 15
HITS_ITERS = 4
SALSA_ITERS = 4
EGO_RADIUS = 2
DIAM_DEPTH = 60
COPURCHASE_K = 100
# Speculative-coloring round budget: measured 12 rounds to full
# convergence at sf0.01; the budget is declared semantics, replayed by
# the oracle (post-convergence rounds are no-ops on both sides).
COLOR_ROUNDS = 20
# 1-WL color refinement: 3 rounds distinguishes depth-3 rooted trees —
# the standard role-discovery horizon; the oracle unrolls the identical
# md5 recurrence, so any round count is bit-replayable.
WL_ROUNDS = 3
# vertex-cut grid: 4×4 = 16 shards (replication bound R+C-1 = 7)
VCUT_ROWS = 4
VCUT_COLS = 4
# FastRP exact-integer variant: 8 dims, 3 propagation rounds, dyadic
# iteration weights — every intermediate is an exact int64 on both
# engines (see operators/embeddings.py:fastrp_embed)
FASTRP_DIM = 8
FASTRP_ITERS = 3
FASTRP_SEED = 42
FASTRP_WEIGHTS = (1, 4, 16)
# temporal reachability: derived edge timestamp rule (SQL-expressible,
# replayed by the oracle) + hop budget
TREACH_TS_SQL = "(src * 7 + dst * 13) % 100"
TREACH_HOPS = 8
PMI_MIN_PAIR = 5  # PMI collocation graph: minimum co-document count
# batched multi-source PPR: seed set = every vertex with id <= 8 (the
# landmark convention), same damping/iteration contract as graph_ppr
PPRB_SEED_MAX = 8
PIC_ITERS = 6  # power-iteration-clustering embedding steps
# containment dedup: 3-gram shingles, Broder containment >= 0.6, same
# df cap as the jaccard path
CONTAIN_TAU = 0.6
CONTAIN_MAXDF = 1000
# continuous label spreading: same seed rule as seeded LPA
# (id <= SEEDED_MAX, class = id % SEEDED_CLASSES), dyadic alpha
LS_ROUNDS = 5
LS_ALPHA = 0.5
# bit-parallel multi-source BFS: seeds = id <= 32, bit = id % 63
MSBFS_SEED_MAX = 32
MSBFS_HOPS = 8
# HyperBall: 16 portable md5 registers, 4 hop budget (raw HLL estimate,
# no small-range correction — declared estimator semantics)
HLL_REGISTERS = 16
HLL_HOPS = 4
BF_CAP = 256  # butterfly census: shared-target in-degree cap (as BIBC_CAP)
# SlashBurn shatter profile: top-k hub slash per round, GCC recursion
SB_K = 16
SB_ROUNDS = 3
NEWMAN_ITERS = 6  # modularity-matrix power iteration steps
# bond percolation retention coins: first md5 byte < threshold
BP_THRESH = ("40", "80", "c0")  # ≈ 25% / 50% / 75%
CDC_WINDOW = 8  # content-defined chunking: rolling window chars
ZIPF_FMIN = 2  # Zipf MLE tail threshold (term frequency)
# GraphSAGE sampling: seeds id <= 16, per-layer fanouts, md5 draws
SAGE_SEED_MAX = 16
SAGE_FANOUTS = (5, 3)
SAGE_SEED = 42
# Matryoshka staged retrieval: 16-dim prefix scan, 50 candidates
MRL_PREFIX = 16
MRL_CAND = 50
# phash near-dup: 4 bands × 16 bits, Hamming verify threshold
PHASH_BANDS = 4
PHASH_BAND_BITS = 16
PHASH_MAX_HAMMING = 16
# forward-push PPR: threshold eps·outdeg, synchronous push rounds
PUSH_EPS = 1e-4
PUSH_ROUNDS = 8
# R-MAT generator: 20k edges over 2^10 vertices, Graph500 abcd
RMAT_EDGES = 20000
RMAT_LEVELS = 10
RMAT_SEED = 42
RMAT_A, RMAT_B, RMAT_C = 0.57, 0.19, 0.19
# collective influence: wedge-intermediary degree cap (as LP_DEG_CAP —
# non-binding at gate SFs where max sym degree ≈ 25)
CI_DEG_CAP = 64
HARMONIC_SEED_MAX = 60  # harmonic/WF sources (state is O(V·sources))
# Luby-MIS round budget: declared semantics replayed exactly by the
# oracle (expected O(log V); the alive set empties in ~6 at sf0.01)
MIS_ROUNDS = 12
MIS_SEED = 42
# Luby-style maximal matching: same declared-rounds contract as MIS
MATCH_ROUNDS = 12
MATCH_SEED = 42
PARTITION_K = 32  # partition-quality report: modulo-K placement
# DOULION edge-sampling coin: md5 < '29' → p = 41/256 ≈ 0.16
DOULION_HEX = "29"
DOULION_SEED = 42
SEEDED_ROUNDS = 5  # seeded-LPA rounds (oracle unrolls them)
RICH_CLUB_MAX_K = 16
# SCAN (eps, mu): probed at both gate SFs — sf0.001 gives 476 cores /
# 1 cluster / 548 border, sf0.01 gives 779 cores / 18 clusters / 310
# border, so every label class (cluster/hub/outlier) is exercised
SCAN_EPS = 0.15
SCAN_MU = 3
QUOTIENT_MOD = 64  # host-quotient grouping rule: grp = id % 64
TRUST_SEED_MAX = 50  # trusted seed set: every vertex with id <= 50
TRUST_ITERS = 10
POWERLAW_DMIN = 2  # Hill-MLE tail threshold (in-degree >= dmin)
HOSTRANK_ITERS = 10
# snapshot-diff rule: "old crawl" keeps o_orderkey%10 < 8, "new crawl"
# keeps o_orderkey%10 >= 2 — overlapping subsets so both sides of the
# delta are non-empty
SNAP_OLD_MOD_LT = 8
SNAP_NEW_MOD_GE = 2
# crawl-delta PageRank: cold iterations on the old crawl, then the
# delta lands and the warm-started continuation runs on the new edges
PR_DELTA_BASE = 4
PR_DELTA_CONT = 3
# hub caps for the citation projections (a source citing everything /
# a page cited by everyone carries no pairwise signal and quadratic
# cost; declared semantics, replayed by the oracle). Non-binding at
# gate SFs (max out-deg ~25, max in-deg ~15 at sf0.01); bind at sf1+.
COCIT_CAP = 64  # co-citation: cap on the citing source's out-degree
BIBC_CAP = 256  # bibliographic coupling: cap on the cited page's in-degree
# superstep-counter trace budget (WCC converges in ~6 at gate SFs; the
# termination rule ends the trace on both sides, so 10 is slack)
WCC_METRICS_STEPS = 10
PR_TRACE_ITERS = 5  # aggregator-trace budget (fixed iterations, tol=0)
EFFDIAM_Q = 0.9  # effective-diameter quantile over the h<=3 ANF table
# parity-BFS depth cap replayed by the oracle (measured root
# eccentricity is 6 at sf0.001 / 4 at sf0.01 — 60 is declared slack)
BIPARTITE_DEPTH = 60
SEEDED_MAX = 40  # seeds: id <= SEEDED_MAX, label = id % SEEDED_CLASSES
SEEDED_CLASSES = 4
LANDMARK_MAX = 8  # landmark set: id <= LANDMARK_MAX
HIT_TARGET_MAX = 10  # hitting-time targets: id <= HIT_TARGET_MAX
HIT_HORIZON = 8
NF_MAX_H = 3  # exact neighborhood-function horizon
COND_LPA_ROUNDS = 5  # LPA rounds feeding the conductance query
ANOMALY_Z = 2.0
WINNOW_K = 4  # token k-gram size (fixed in the oracle's join chain)
WINNOW_W = 4  # winnowing window: guarantees matches of >= k+w-1 tokens
# 1/32: a binary fraction so every Katz intermediate (alpha^k × integer
# walk count) is an exact dyadic double — both engines compute
# bit-identical values in any summation order. A decimal alpha (0.05)
# puts katz on exact multiples of 6.25e-6, i.e. ON the 6-decimal
# half-way rounding boundary, where 1-ULP noise flips the round.
KATZ_ALPHA = 0.03125
KATZ_ITERS = 4
LP_TOPK = 50
# Wedge-intermediary degree cap: excludes super-hubs (everyone shares
# "google.com" — no signal, quadratic cost). Non-binding at sf0.01
# (max sym degree ≈ 25) so gate semantics are effectively uncapped;
# binds at sf0.1+ where the %1024 buckets exceed it. Oracle replays it.
LP_DEG_CAP = 64
# SimRank decay 0.75 = 3/4, exactly representable in binary — per-term
# products stay clean so only summation-order ULP noise remains under
# the 6-decimal round (same class as pagerank's, never observed to flip).
SIMRANK_C = 0.75
SIMRANK_K = 2
SIMRANK_T = 10  # top partners kept per vertex between/after iterations
N2V_DIM = 16
TOP_TERMS_K = 20
EIG_ITERS = 5
KTRUSS_K = 4
KTRUSS_ROUNDS = 5
# Full truss decomposition caps: measured max trussness is 3 at
# sf0.001 / 4 at sf0.01 and every level's peel hits fixpoint in <= 4
# rounds, so KMAX=6 / 5 rounds are non-binding declared semantics at
# gate scale (the gate checks TRUE trussness, like coreness); at caps-
# binding scale both engines stop at the identical capped state.
TRUSS_KMAX = 6
TRUSS_ROUNDS = 5
# VoteRank elected-seed budget: K sequential elections (each an
# unrolled argmax round in the oracle); scores round to 6 dp BEFORE the
# argmax — declared semantics that make the election order-float-free
VOTERANK_K = 10
# K16/R20 verified converged at sf0.01 (== K16/R30 and K48/R14 runs;
# true max coreness there is 15): the caps are declared semantics but
# non-binding at gate scale, so the gate checks TRUE coreness. Spark
# early-stops each level at its fixpoint; the oracle's surplus rounds
# are no-ops.
CORE_KMAX = 16
CORE_ROUNDS = 20
# Floor for the louvain gate: the orders graph gets denser with SF so
# max modularity falls — measured deterministic louvain Q: sf0.001
# 0.660, sf0.01 0.155, sf0.1 0.122. 0.1 is meaningful (trivial
# partitions score <= 0: singletons Q<0, one-community Q=0) and holds
# at every generated SF.
LOUVAIN_MIN_Q = 0.1
NEARDUP_TAU = 0.4
SESSION_GAP_MIN = 30
# span dedup: RefinedWeb uses 13-gram spans on web text; the synthetic
# docs are 25-80 tokens so n=5 keeps cross-document span collisions
# present at every SF without saturating.
SPAN_N = 5
KMEANS_K = 8
KMEANS_ITERS = 2
# product quantization: EMB_DIM=64 → 4 subspaces of 16 dims, one K=8
# codebook each (m·log2 k = 12 bits/vector vs 2048 — the compressed
# ANN scan path); queries = vec_id < 3, same broadcast-small contract
# as emb_cosine_topk
PQ_M = 4
PQ_QUERY_MAX = 3
# mixture rebalancing: downsample the dominant language, keep a middle
# default; the split bands are the classic 80/10/10.
STRATA_RATES = {"en": 0.5, "zh": 0.2}
STRATA_DEFAULT_RATE = 0.35
SPLIT_WEIGHTS = (0.8, 0.1, 0.1)
DECON_EVAL_RATE = 0.05  # fraction of docs playing the held-out eval set
DSIR_TARGET_LANG = "en"  # DSIR target-domain sample: the en-language docs
PACK_BUDGET = 512  # tokens per packed training sequence
# bigram-LM interpolation weight — dyadic (3/4) so each per-pair
# probability is computed bit-identically by both engines
BIGRAM_LAMBDA = 0.75
BM25_TERMS = ("spark", "join", "filter")  # the fixed topic query
BM25_K1 = 1.2
BM25_B = 0.75
# mixture targets: de is the binding domain (keeps 100%), en/zh are
# downsampled to hold the 2:1:1 ratio, fr/es are dropped (share 0).
DOMAIN_MIX_TARGETS = {"en": 0.5, "zh": 0.25, "de": 0.25}
INCR_NEW_RATE = 0.3  # fraction of docs playing the incoming shard
INCR_TAU = 0.1  # jaccard threshold for "already in the corpus"
EMB_DIM = 64  # testdata embedding width; a real pipeline knows its dim


# ====================================================================
# entry
# ====================================================================
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: converged PageRank over the sf0.001 orders graph."""
    from incubator_hugegraph_computer_spark.operators.pagerank import pagerank_classic

    g = orders_graph(spark, "/root/testdata/sf0.001")
    pr = pagerank_classic(g, max_iterations=30, tol=1e-9)
    return pr.select("id", F.round("rank", 6).alias("rank")).orderBy(F.desc("rank"))


# ====================================================================
# Spark-side queries
# ====================================================================
def _weighted(g, weight_col: str = "weight"):
    """The ONE derived edge-weight rule every weighted query shares —
    (src+dst)%5+1, SQL-expressible and strictly positive. Each oracle
    replays it as CAST((src+dst)%5+1 AS DOUBLE); keeping a single
    definition here keeps all Spark sides in lockstep with it."""
    from incubator_hugegraph_computer_spark.graph import Graph

    return Graph(
        g.vertices,
        g.edges.withColumn(
            weight_col, ((F.col("src") + F.col("dst")) % 5 + 1).cast("double")
        ),
        prepartitioned=True,
    )


def _q_degree(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.degree import degree_centrality

    g = orders_graph(spark, sf_dir)
    return degree_centrality(g, direction="both")


def _q_degree_weighted(spark, sf_dir):
    """Java weighted degree (DegreeCentrality.java:90-110): value =
    Σ edge-weight over out-edges, same shared derived weight rule."""
    from incubator_hugegraph_computer_spark.operators.degree import degree_centrality

    g = _weighted(orders_graph(spark, sf_dir))
    d = degree_centrality(g, direction="out", weight_col="weight")
    return d.select("id", F.round("degree", 6).alias("degree"))


def _q_pagerank(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.pagerank import pagerank_classic

    g = orders_graph(spark, sf_dir)
    pr = pagerank_classic(g, max_iterations=PR_ITERS, tol=0.0, count_messages=False)
    return pr.select("id", F.round("rank", 6).alias("rank"))


def _q_pagerank_weighted(spark, sf_dir):
    """Vermeer's pagerank.edge_weight_property mode (pagerank.go:100-160):
    in-edge contributions scaled by the edge weight, same derived
    (src+dst)%5+1 weight as the weighted-SSSP queries."""
    from incubator_hugegraph_computer_spark.operators.pagerank import pagerank_weighted

    weighted = _weighted(orders_graph(spark, sf_dir))
    pr = pagerank_weighted(
        weighted, weight_col="weight", max_iterations=PR_ITERS, tol=0.0, count_messages=False
    )
    return pr.select("id", F.round("rank", 6).alias("rank"))


def _q_wcc(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.wcc import wcc

    return wcc(orders_graph(spark, sf_dir), count_messages=False)


def _q_lpa(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.lpa import lpa

    return lpa(orders_graph(spark, sf_dir), max_supersteps=LPA_ROUNDS, count_messages=False)


def _q_lpa_sync(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.lpa import lpa_sync

    return lpa_sync(orders_graph(spark, sf_dir), max_supersteps=LPA_SYNC_ITERS, fixed=True, count_messages=False)


def _q_triangles(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.triangle_count import triangle_count

    return triangle_count(orders_graph(spark, sf_dir))


def _q_clustering(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.clustering_coefficient import (
        clustering_coefficient,
    )

    cc = clustering_coefficient(orders_graph(spark, sf_dir))
    return cc.select("id", F.round("coefficient", 6).alias("coefficient"))


def _q_kcore(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.kcore import kcore_vertices

    # same fixed peel budget as the unrolled oracle — running to
    # fixpoint would diverge on any SF needing > KCORE_ROUNDS peels
    return kcore_vertices(orders_graph(spark, sf_dir), k=KCORE_K, max_rounds=KCORE_ROUNDS)


def _q_sssp(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.sssp import sssp

    # fixed 30-hop budget matching the oracle's recursion cap (r.d < 30)
    # — the operator default (100) would diverge on any SF whose graph
    # has vertices 31+ hops from the source
    return sssp(
        orders_graph(spark, sf_dir),
        source=SSSP_SOURCE,
        max_supersteps=30,
        count_messages=False,
    )


def _q_sssp_weighted(spark, sf_dir):
    """Weighted dist-only SSSP (sssp.go / SingleSourceShortestPath.java
    weight handling without the path value) — fixed supersteps on both
    sides, same derived weight as the path variant."""
    from incubator_hugegraph_computer_spark.operators.sssp import sssp

    weighted = _weighted(orders_graph(spark, sf_dir))
    r = sssp(
        weighted,
        source=SSSP_SOURCE,
        weight_col="weight",
        max_supersteps=SSSP_PATH_ITERS,
        count_messages=False,
    )
    return r.select("id", F.round("dist", 6).alias("dist"))


def _q_widest_path(spark, sf_dir):
    """Widest-path (maximin bottleneck) from the SSSP source — the
    max-min semiring swap of weighted SSSP (message = min(cap, w),
    combine = MAX), run on the same derived (src+dst)%5+1 weights.
    Fixed superstep budget on both sides so the level-unrolled oracle
    replays the recurrence exactly."""
    from incubator_hugegraph_computer_spark.operators.sssp import widest_path

    weighted = _weighted(orders_graph(spark, sf_dir))
    r = widest_path(
        weighted,
        source=SSSP_SOURCE,
        weight_col="weight",
        max_supersteps=SSSP_PATH_ITERS,
        count_messages=False,
    )
    return r.select("id", F.round("cap", 6).alias("cap"))


def _q_sssp_weighted_path(spark, sf_dir):
    """Full Java SSSP surface: weighted edges (derived (src+dst)%5+1 —
    SQL-expressible, strictly positive), value carries the path IdList;
    fixed superstep budget on BOTH sides so the unrolled oracle
    recurrence is level-for-level identical. Path emitted as '->' string
    for a representation-stable value hash."""
    from incubator_hugegraph_computer_spark.operators.sssp import sssp_paths

    weighted = _weighted(orders_graph(spark, sf_dir))
    r = sssp_paths(
        weighted,
        source=SSSP_SOURCE,
        targets="*",
        weight_col="weight",
        max_supersteps=SSSP_PATH_ITERS,
        count_messages=False,
    )
    return r.select(
        "id",
        F.round("dist", 6).alias("dist"),
        F.concat_ws("->", F.col("path")).alias("path_str"),
    )


def _q_ppr_sweep(spark, sf_dir):
    """ACL local-clustering sweep: conductance curve over the
    degree-normalized PPR ordering around PPR_SOURCE."""
    from incubator_hugegraph_computer_spark.operators.ppr import ppr_sweep

    return ppr_sweep(
        orders_graph(spark, sf_dir),
        source=PPR_SOURCE,
        max_iterations=PPR_ITERS,
        sweep_max=SWEEP_MAX,
        count_messages=False,
    )


def _q_ppr(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.ppr import ppr

    r = ppr(orders_graph(spark, sf_dir), source=PPR_SOURCE, max_iterations=PPR_ITERS, count_messages=False)
    return r.select("id", F.round("rank", 6).alias("rank"))


def _q_jaccard(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.jaccard import jaccard

    j = jaccard(orders_graph(spark, sf_dir), source=PPR_SOURCE)
    return j.select("id", F.round("jaccard", 6).alias("jaccard"))


def _q_kout(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.bfs import kout

    return kout(orders_graph(spark, sf_dir), source=SSSP_SOURCE, k=2)


def _q_closeness(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.closeness import closeness

    g = orders_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("id") <= CLOSENESS_SEED_MAX).select("id")
    c = closeness(g, sources=seeds)
    return c.select("id", F.round("closeness", 6).alias("closeness"))


def _q_closeness_weighted(spark, sf_dir):
    """Reference ``closeness.weight_property`` surface
    (ClosenessCentrality.java:128-141): message distance = running sum
    of edge weights. Same derived weight rule as every weighted query;
    fixed relaxation budget on both sides (the Spark change-frontier is
    level-for-level identical to the oracle's unrolled Bellman-Ford)."""
    from incubator_hugegraph_computer_spark.operators.closeness import closeness

    g = _weighted(orders_graph(spark, sf_dir))
    seeds = g.vertices.where(F.col("id") <= CLOSENESS_SEED_MAX).select("id")
    c = closeness(g, sources=seeds, weight_col="weight", max_depth=SSSP_PATH_ITERS)
    return c.select("id", F.round("closeness", 6).alias("closeness"))


def _q_top_degree(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.degree import degree_centrality
    from incubator_hugegraph_computer_spark.operators.stats import top_k_by

    g = orders_graph(spark, sf_dir)
    return top_k_by(degree_centrality(g, direction="both"), "degree", k=TOPK)


def _q_modularity(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.stats import modularity
    from incubator_hugegraph_computer_spark.operators.wcc import wcc

    g = orders_graph(spark, sf_dir)
    comp = wcc(g)
    q = modularity(g, comp, label_col="comp")
    return q.select(F.round("modularity", 6).alias("modularity"))


def _q_rings(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.rings import ring_counts

    return ring_counts(orders_graph(spark, sf_dir), max_length=RINGS_LEN)


def _q_scc(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.scc import scc

    return scc(orders_graph(spark, sf_dir))


def _q_depth(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.bfs import bfs_depth

    return bfs_depth(orders_graph(spark, sf_dir), source=SSSP_SOURCE)


def _q_sparsify(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.sparsify import local_sparsify

    return local_sparsify(orders_graph(spark, sf_dir), e=SPARSIFY_E)


def _q_cascade(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.cascade import threshold_cascade

    g = orders_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("id") % CASCADE_MOD == 0).select("id")
    return threshold_cascade(g, seeds, k=CASCADE_K, max_rounds=CASCADE_ROUNDS)


def _q_build_layers(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.code_graph import build_layers

    return build_layers(orders_graph(spark, sf_dir))


def _q_critical_path(spark, sf_dir):
    """Weighted critical-path (PERT) schedule over the SCC condensation:
    est = earliest start, finish = est + component cost; max(finish) is
    the parallel-build wall-clock lower bound. Synthetic (id%7)+1 costs
    keep the schedule SQL-replayable."""
    from incubator_hugegraph_computer_spark.operators.code_graph import critical_path

    return critical_path(orders_graph(spark, sf_dir))


def _q_coupling(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.code_graph import coupling_metrics

    return coupling_metrics(orders_graph(spark, sf_dir))


def _q_impact(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.code_graph import impact_set

    g = orders_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("id") % IMPACT_SEED_MOD == 0).select("id")
    return impact_set(g, seeds, max_depth=IMPACT_DEPTH)


def _q_counts(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.stats import graph_counts

    return graph_counts(orders_graph(spark, sf_dir))


def _q_betweenness(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.betweenness import betweenness

    g = orders_graph(spark, sf_dir)
    srcs = g.vertices.where(F.col("id") <= BETW_SRC_MAX).select("id")
    b = betweenness(g, sources=srcs, max_depth=BETW_DEPTH)
    return b.select("id", F.round("betweenness", 6).alias("betweenness"))


def _q_edge_betweenness(spark, sf_dir):
    """Edge betweenness (Girvan–Newman's cut primitive) from the same
    pinned source set as graph_betweenness — per-DAG-edge shortest-path
    credits instead of the per-vertex dependency sum."""
    from incubator_hugegraph_computer_spark.operators.betweenness import betweenness

    g = orders_graph(spark, sf_dir)
    srcs = g.vertices.where(F.col("id") <= BETW_SRC_MAX).select("id")
    b = betweenness(g, sources=srcs, max_depth=BETW_DEPTH, per_edge=True)
    return b.select("src", "dst", F.round("betweenness", 6).alias("betweenness"))


def _q_random_walk(spark, sf_dir):
    """Walk validity, checkable without replaying the seeded draws: every
    consecutive path pair must be a real edge, and a walk may end short
    of walk_length only at a dangling vertex (RandomWalk.java semantics:
    the walk stops when the current vertex has no out-edge). The oracle
    asserts the expected constants: one walk per vertex, all hops valid,
    all terminations legal."""
    from incubator_hugegraph_computer_spark.operators.random_walk import random_walk

    g = orders_graph(spark, sf_dir)
    w = random_walk(g, walk_length=RW_LEN, walks_per_node=1, seed=42)
    w2 = w.select(
        "walk_id",
        "start",
        "path",
        F.element_at("path", -1).alias("last"),
        F.size("path").alias("plen"),
    )
    hops = w2.where(F.col("plen") > 1).select(
        "walk_id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(path, 1, size(path)-1)").alias("a"),
                F.expr("slice(path, 2, size(path)-1)").alias("b"),
            )
        ).alias("h"),
    ).select("walk_id", F.col("h.a").alias("src"), F.col("h.b").alias("dst"))
    edge_set = g.edges.select("src", "dst").withColumn("_e", F.lit(1))
    hop_ok = (
        hops.join(edge_set, ["src", "dst"], "left")
        .groupBy("walk_id")
        .agg(F.min(F.col("_e").isNotNull().cast("int")).alias("_ok"))
    )
    outdeg = g.edges.groupBy(F.col("src").alias("last")).agg(F.count(F.lit(1)).alias("od"))
    return (
        w2.join(hop_ok, "walk_id", "left")
        .join(outdeg, "last", "left")
        .select(
            "walk_id",
            "start",
            F.coalesce(F.col("_ok") == 1, F.lit(True)).alias("hops_are_edges"),
            ((F.col("plen") == RW_LEN + 1) | F.col("od").isNull()).alias("ended_ok"),
        )
    )


def _louvain_checked(spark, sf_dir, weight_col=None, min_modularity=LOUVAIN_MIN_Q):
    """Louvain is order-dependent (Vermeer's own tests only band-check
    modularity — vermeer/test/functional/), so the gate is on
    SQL-checkable invariants of the returned assignment: every vertex
    gets exactly one community, the community id is the min member id
    (the operator's canonicalization contract), and the partition's
    Newman modularity — recomputed from the assignment — clears a
    pinned floor."""
    from incubator_hugegraph_computer_spark.operators.louvain import louvain
    from incubator_hugegraph_computer_spark.operators.stats import modularity

    g = orders_graph(spark, sf_dir)
    if weight_col is not None:
        g = _weighted(g, weight_col)
    asn = louvain(g, max_levels=3, max_inner=5, weight_col=weight_col).persist()
    n = asn.count()
    n_ids = asn.select("id").distinct().count()
    rep_ok = (
        asn.groupBy("community")
        .agg(F.min("id").alias("mn"))
        .where(F.col("mn") != F.col("community"))
        .isEmpty()
    )
    q = modularity(g, asn, label_col="community").first()["modularity"]
    asn.unpersist()  # all invariants are scalars now; free the cache
    return spark.createDataFrame(
        [(n, n == n_ids, bool(rep_ok), float(q) >= min_modularity)],
        "n_assigned long, one_community_each boolean, rep_is_min_member boolean, modularity_ok boolean",
    )


def _q_louvain(spark, sf_dir):
    return _louvain_checked(spark, sf_dir)


def _q_leiden(spark, sf_dir):
    """Leiden-style refinement — gated on the louvain invariants PLUS
    the guarantee that sets Leiden apart: every community induces a
    connected subgraph, checked by idempotence (re-splitting the final
    assignment into induced connected components changes nothing)."""
    from incubator_hugegraph_computer_spark.operators.leiden import (
        leiden,
        refine_connected,
    )
    from incubator_hugegraph_computer_spark.operators.stats import modularity

    g = orders_graph(spark, sf_dir)
    asn = leiden(g, max_levels=3, max_inner=5, count_messages=False).persist()
    n = asn.count()
    n_ids = asn.select("id").distinct().count()
    rep_ok = (
        asn.groupBy("community")
        .agg(F.min("id").alias("mn"))
        .where(F.col("mn") != F.col("community"))
        .isEmpty()
    )
    q = modularity(g, asn, label_col="community").first()["modularity"]
    recheck = refine_connected(g, asn, count_messages=False)
    connected_ok = (
        asn.join(recheck.withColumnRenamed("community", "c2"), "id")
        .where(F.col("community") != F.col("c2"))
        .isEmpty()
    )
    asn.unpersist()
    return spark.createDataFrame(
        [(n, n == n_ids, bool(rep_ok), float(q) >= LOUVAIN_MIN_Q, bool(connected_ok))],
        "n_assigned long, one_community_each boolean, rep_is_min_member boolean, "
        "modularity_ok boolean, all_connected boolean",
    )


def _q_louvain_weighted(spark, sf_dir):
    return _louvain_checked(spark, sf_dir, weight_col="weight")


def _q_rings_filtered(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.rings import rings

    g = orders_graph(spark, sf_dir)
    r = rings(g, max_length=RINGS_LEN, vertex_filter=F.col("id") % 3 != 0)
    return r.groupBy("start").agg(F.count(F.lit(1)).alias("n_rings"))


# the reference's rings.property_filter JSON verbatim
# (RingsDetectionWithFilter.java:35, FilterDescribe.java): '*' items
# apply everywhere; the $message item is spread-only (compute0's
# first hop keeps only $message-free items, SpreadFilter.java:56-59)
RINGS_DSL_FILTER = {
    "vertex_filter": [{"label": "*", "property_filter": "$element.age < 90"}],
    "edge_filter": [
        {"label": "*", "property_filter": "$element.weight > 1"},
        {"label": "knows",
         "property_filter": "$message.weight <= $element.weight"},
    ],
}


def _q_rings_filter_dsl(spark, sf_dir):
    """Rings driven by the reference's JSON property-filter config,
    compiled from MVEL strings to Columns (functions/filter_dsl.py).
    The orders graph gets deterministic SQL-replayable properties:
    vertex age = id % 97, edge weight = the shared (src+dst)%5+1 rule,
    labels person/item by id parity and 'knows' on every edge. The
    nondecreasing-weight $message constraint exercises the frontier's
    carried walk-edge property."""
    from incubator_hugegraph_computer_spark.graph import Graph
    from incubator_hugegraph_computer_spark.operators.rings import rings_with_filter

    g = orders_graph(spark, sf_dir)
    verts = g.vertices.select(
        "id",
        F.when(F.col("id") % 2 == 0, F.lit("person")).otherwise(F.lit("item")).alias("label"),
        F.create_map(F.lit("age"), (F.col("id") % 97).cast("double")).alias("properties"),
    )
    edges = g.edges.select(
        "src",
        "dst",
        F.lit("knows").alias("label"),
        F.create_map(
            F.lit("weight"), ((F.col("src") + F.col("dst")) % 5 + 1).cast("double")
        ).alias("properties"),
    )
    r = rings_with_filter(Graph(verts, edges, prepartitioned=True), RINGS_DSL_FILTER,
                          max_length=RINGS_LEN)
    return r.groupBy("start").agg(F.count(F.lit(1)).alias("n_rings"))


def _q_depth_sketch(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.bfs import bfs_depth
    from incubator_hugegraph_computer_spark.operators.stats import value_sketch

    return value_sketch(bfs_depth(orders_graph(spark, sf_dir), source=SSSP_SOURCE), "depth")


def _q_hits(spark, sf_dir):
    """Kleinberg hubs/authorities, sum-normalized, fixed iterations —
    the canonical missing member of the reference's centrality family."""
    from incubator_hugegraph_computer_spark.operators.hits import hits

    r = hits(orders_graph(spark, sf_dir), iterations=HITS_ITERS)
    return r.select(
        "id", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )


def _q_katz(spark, sf_dir):
    """Truncated Katz centrality (attenuated walk counts)."""
    from incubator_hugegraph_computer_spark.operators.katz import katz

    r = katz(orders_graph(spark, sf_dir), alpha=KATZ_ALPHA, iterations=KATZ_ITERS)
    return r.select("id", F.round("katz", 6).alias("katz"))


def _q_link_prediction(spark, sf_dir):
    """Adamic-Adar / common-neighbor link prediction, top-k under the
    deterministic integer order (cn DESC, src, dst). The intermediary
    degree cap is part of the declared semantics (oracle replays it)."""
    from incubator_hugegraph_computer_spark.operators.link_prediction import link_prediction

    r = link_prediction(
        orders_graph(spark, sf_dir),
        top_k=LP_TOPK,
        max_intermediary_degree=LP_DEG_CAP,
    )
    return r.select("src", "dst", "cn", F.round("aa", 6).alias("aa"))


def _q_knn_degree(spark, sf_dir):
    """knn(k) degree-correlation curve — the function-valued companion
    to the one-number assortativity coefficient."""
    from incubator_hugegraph_computer_spark.operators.link_prediction import (
        avg_neighbor_degree,
    )

    r = avg_neighbor_degree(orders_graph(spark, sf_dir))
    return r.select("k", F.round("knn", 6).alias("knn"))


def _q_assortativity(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.link_prediction import (
        degree_assortativity,
    )

    r = degree_assortativity(orders_graph(spark, sf_dir))
    return r.select(F.round("assortativity", 6).alias("assortativity"))


def _q_eigenvector(spark, sf_dir):
    """Sum-normalized power iteration — the PageRank-without-teleport
    member of the centrality family."""
    from incubator_hugegraph_computer_spark.operators.eigenvector import eigenvector

    r = eigenvector(orders_graph(spark, sf_dir), iterations=EIG_ITERS)
    return r.select("id", F.round("x", 6).alias("x"))


def _q_ktruss(spark, sf_dir):
    """K-truss edges with in-subgraph support after a fixed peel-round
    budget (extra rounds past the fixpoint are no-ops, so the unrolled
    oracle and an early-stopped run agree)."""
    from incubator_hugegraph_computer_spark.operators.ktruss import ktruss

    return ktruss(orders_graph(spark, sf_dir), k=KTRUSS_K, max_rounds=KTRUSS_ROUNDS)


def _q_trussness(spark, sf_dir):
    """Full truss decomposition (per-edge max trussness) under the
    declared KMAX/rounds caps — the edge-level analogue of coreness."""
    from incubator_hugegraph_computer_spark.operators.ktruss import trussness

    t = trussness(
        orders_graph(spark, sf_dir),
        k_max=TRUSS_KMAX,
        max_rounds_per_level=TRUSS_ROUNDS,
    )
    return t.select("a", "b", F.col("trussness").cast("int").alias("trussness"))


def _q_voterank(spark, sf_dir):
    """VoteRank influence seeds: K sequential elections with
    neighbor-ability suppression (Zhang et al. 2016)."""
    from incubator_hugegraph_computer_spark.operators.voterank import voterank

    return voterank(orders_graph(spark, sf_dir), k=VOTERANK_K)


def _q_coreness(spark, sf_dir):
    """Full core decomposition (per-vertex coreness) under the declared
    capped-peeling budget (k_max, rounds_per_k) — the oracle replays the
    identical nested loop."""
    from incubator_hugegraph_computer_spark.operators.coreness import coreness

    return coreness(
        orders_graph(spark, sf_dir), k_max=CORE_KMAX, rounds_per_k=CORE_ROUNDS
    )


def _q_reciprocity(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.link_prediction import reciprocity

    r = reciprocity(orders_graph(spark, sf_dir))
    return r.select(
        "n_edges", "n_reciprocal", F.round("reciprocity", 6).alias("reciprocity")
    )


def _q_salsa(spark, sf_dir):
    """Degree-normalized HITS (SALSA) — the production link-analysis
    variant; same fixed-iteration sum-normalized contract as graph_hits."""
    from incubator_hugegraph_computer_spark.operators.salsa import salsa

    r = salsa(orders_graph(spark, sf_dir), iterations=SALSA_ITERS)
    return r.select(
        "id", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )


def _q_motifs(spark, sf_dir):
    """Dyad census + directed-triangle motif split (cyclic vs
    transitive) — one-row structural summary of the link graph."""
    from incubator_hugegraph_computer_spark.operators.motifs import motif_census

    return motif_census(orders_graph(spark, sf_dir))


def _q_simrank(spark, sf_dir):
    """Truncated SimRank (k=2, C=0.75, top-T=10 partners kept per
    vertex between and after iterations — the Lizorkin VLDB'08 scale
    path; the pair frame stays bounded by T·V instead of fan-out²) —
    the recursive structural-similarity companion to graph_jaccard;
    only surviving pairs a < b are emitted (diagonal is implicit 1).
    The exact all-pairs mode stays available as
    ``simrank(..., top_per_vertex=None)``."""
    from incubator_hugegraph_computer_spark.operators.simrank import simrank

    r = simrank(
        orders_graph(spark, sf_dir),
        k=SIMRANK_K,
        c=SIMRANK_C,
        top_per_vertex=SIMRANK_T,
    )
    # SimRank scores are small-denominator rationals (C·common/(da·db)),
    # so many land EXACTLY on the 6-decimal half-way boundary where
    # Spark's HALF_UP BigDecimal round and DuckDB's raw-double round
    # disagree (observed: 0.75/2400 → 0.000313 vs 0.000312). The 1e-9
    # nudge moves every boundary value decisively above the half-way
    # point on both engines; float summation noise (~1e-16) cannot cross
    # the nudge. Declared semantics, replayed in the oracle.
    return r.select(
        "a", "b", F.round(F.col("score") + F.lit(1e-9), 6).alias("score")
    )


def _q_node2vec_embed(spark, sf_dir):
    """node2vec end-to-end: seeded p/q walks -> Spark ML Word2Vec
    skip-gram -> per-vertex embedding. Training is not SQL-replayable,
    so the ORACLE gates the pipeline's deterministic shape — every
    vertex with out-degree > 0 starts a walk, enters the vocabulary,
    and gets a dim-sized vector — while the embedding VALUES are gated
    by tests/test_embeddings.py (seeded determinism + coverage)."""
    from incubator_hugegraph_computer_spark.operators.embeddings import (
        node2vec_embeddings,
    )

    g = orders_graph(spark, sf_dir)
    emb = node2vec_embeddings(
        g, dim=N2V_DIM, walk_length=6, walks_per_node=1, inout_factor=2.0, seed=42
    )
    starts = g.edges.select(F.col("src").alias("id")).distinct()
    return emb.join(starts, "id").select(
        "id", F.size("embedding").alias("dim")
    )


def _q_ego2(spark, sf_dir):
    """Per-vertex 2-hop neighborhood size (friend-of-follow count) —
    the all-sources generalization of Vermeer's kout."""
    from incubator_hugegraph_computer_spark.operators.bfs import ego_size

    return ego_size(orders_graph(spark, sf_dir), radius=EGO_RADIUS)


def _q_diameter(spark, sf_dir):
    """Double-sweep diameter lower bound over the undirected view."""
    from incubator_hugegraph_computer_spark.operators.bfs import diameter_2sweep

    return diameter_2sweep(orders_graph(spark, sf_dir), max_depth=DIAM_DEPTH)


def _q_copurchase(spark, sf_dir):
    """Bipartite projection: parts co-occurring in an order, top-k by
    co-occurrence count (weight DESC, src, dst — a total order, so the
    limit boundary is deterministic)."""
    from incubator_hugegraph_computer_spark.operators.projection import project

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = project(
        li.select(
            F.col("l_orderkey").cast("long").alias("g"),
            F.col("l_partkey").cast("long").alias("item"),
        ),
        "g",
        "item",
    )
    return pairs.orderBy(F.desc("weight"), "src", "dst").limit(COPURCHASE_K)


def _q_winnowing(spark, sf_dir):
    """MOSS winnowing fingerprints over the documents table — the
    substring-level contamination detector (any shared run of
    >= WINNOW_K + WINNOW_W - 1 tokens shares a fingerprint)."""
    from incubator_hugegraph_computer_spark.functions.text import winnow_fingerprints

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return winnow_fingerprints(docs, k=WINNOW_K, window=WINNOW_W)


def _q_coloring(spark, sf_dir):
    """Speculative greedy coloring under portable md5 priorities —
    fully deterministic rounds, so the oracle replays them
    bit-for-bit."""
    from incubator_hugegraph_computer_spark.operators.coloring import greedy_coloring

    return greedy_coloring(orders_graph(spark, sf_dir), max_rounds=COLOR_ROUNDS)


def _q_msf(spark, sf_dir):
    """Boruvka minimum spanning forest over the shared weighted rule,
    reported as the per-weight MSF edge histogram. The histogram is
    invariant across ALL minimum spanning forests (Kruskal exchange
    property), so the oracle can verify it from component-count deltas
    of the weight-threshold subgraphs without replaying Boruvka; the
    exact chosen edge set (deterministic under the (w, a, b) order) is
    pinned by unit tests against a Python Kruskal."""
    from incubator_hugegraph_computer_spark.operators.mst import msf

    g = _weighted(orders_graph(spark, sf_dir))
    f = msf(g, weight_col="weight")
    return f.groupBy(F.col("w").alias("weight")).agg(
        F.count(F.lit(1)).alias("n_edges")
    )


def _q_cycle_detection(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.rings import cycle_detection

    g = orders_graph(spark, sf_dir)
    # Vermeer band: stack length excludes the root, so min_length=2 /
    # max_length=3 admits cycles of 3..4 VERTICES (cycle_detection.go
    # records at len(stack) >= minLen, prunes at len(stack) > maxLen)
    return cycle_detection(g, min_length=2, max_length=RINGS_LEN - 1, mode="boolean")


def _q_slpa(spark, sf_dir):
    """One SLPA round is fully deterministic regardless of the seed —
    every speaker's memory holds only its own id, so each listener hears
    exactly its symmetrized neighbors' ids and adopts the most frequent
    (all counts 1 → min neighbor id); with threshold 0.3 both memory
    entries are retained. Exact-oracle-checkable end-to-end exercise of
    the speak/listen/retain machinery; the multi-round path is gated by
    ``graph_slpa_multi``."""
    from incubator_hugegraph_computer_spark.operators.slpa import slpa

    return slpa(orders_graph(spark, sf_dir), rounds=1, threshold=0.3)


def _q_slpa_multi(spark, sf_dir):
    """Multi-round SLPA invariants (the draws are seeded-hash based and
    not replayable in SQL): full vertex coverage, labels drawn from the
    vertex-id domain, memory bounded by rounds+1."""
    from incubator_hugegraph_computer_spark.operators.slpa import slpa

    g = orders_graph(spark, sf_dir)
    out = slpa(g, rounds=5, threshold=0.3).persist()
    covered = out.select("id").distinct().count()
    bad_labels = out.join(
        g.vertices.select(F.col("id").alias("label")), "label", "left_anti"
    ).count()
    max_labels = out.groupBy("id").count().agg(F.max("count")).first()[0]
    out.unpersist()  # invariants reduced to scalars; free the cache
    return spark.createDataFrame(
        [(covered, bad_labels == 0, int(max_labels) <= 6)],
        "n_vertices_covered long, labels_are_vertex_ids boolean, memory_bounded boolean",
    )


def _q_degree_sketch(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.stats import degree_sketch

    return degree_sketch(orders_graph(spark, sf_dir))


def _q_kcore_wcc(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.kcore import kcore

    return kcore(orders_graph(spark, sf_dir), k=KCORE_K, max_rounds=KCORE_ROUNDS)


def _q_property_ingest(spark, sf_dir):
    """EdgeFrequency ingest-dedup audit (EdgeFrequency.java:23-42): the
    same raw labelled edge rows deduplicated under all three identity
    keys, counted per label — (frequency, label, n_edges)."""
    from incubator_hugegraph_computer_spark.sources.property_graph import load_edges

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = orders.select(
        F.col("o_custkey").cast("long").alias("src"),
        (F.col("o_orderkey") % DST_MOD).cast("long").alias("dst"),
        F.concat(F.lit("L"), (F.col("o_orderkey") % 3).cast("string")).alias("label"),
        (F.col("o_orderkey") % 7).cast("string").alias("name"),
        F.create_map(F.lit("p"), (F.col("o_orderkey") % 100).cast("string")).alias(
            "properties"
        ),
    ).where(F.col("src") != F.col("dst"))
    single = (
        load_edges(base, "SINGLE")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .select(F.lit("SINGLE").alias("frequency"), F.lit("all").alias("label"), "n_edges")
    )
    spl = (
        load_edges(base, "SINGLE_PER_LABEL")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .select(F.lit("SINGLE_PER_LABEL").alias("frequency"), "label", "n_edges")
    )
    mult = (
        load_edges(base, "MULTIPLE")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .select(F.lit("MULTIPLE").alias("frequency"), "label", "n_edges")
    )
    return single.unionAll(spl).unionAll(mult)


def _q_wcc_strid(spark, sf_dir):
    """String-id WCC end-to-end through the BytesId order (SURVEY §1.3):
    vertex ids become reversed decimal strings (so byte order differs
    from numeric order), dense longs are minted in the reference's
    length-first-then-bytewise order, WCC runs on the minted ids, and
    the component representative maps back to the string id — the
    returned comp_sid must be the BytesId-minimum member, which the
    oracle recomputes with an explicit (strlen, sid) min."""
    from incubator_hugegraph_computer_spark.graph import Graph
    from incubator_hugegraph_computer_spark.operators.wcc import wcc
    from incubator_hugegraph_computer_spark.sources.extractor import (
        mint_bytesid_ordered_ids,
    )

    g = orders_graph(spark, sf_dir)
    sv = g.vertices.select(
        F.col("id").alias("orig"), F.reverse(F.col("id").cast("string")).alias("sid")
    )
    minted = mint_bytesid_ordered_ids(sv.select("sid"), col="sid").withColumnRenamed(
        "id", "mid"
    )
    mapping = sv.join(minted, "sid").persist()  # (orig, sid, mid)
    msrc = mapping.select(F.col("orig").alias("src"), F.col("mid").alias("msrc"))
    mdst = mapping.select(F.col("orig").alias("dst"), F.col("mid").alias("mdst"))
    medges = (
        g.edges.join(msrc, "src")
        .join(mdst, "dst")
        .select(F.col("msrc").alias("src"), F.col("mdst").alias("dst"))
    )
    mg = Graph(mapping.select(F.col("mid").alias("id")), medges)
    comp = wcc(mg, count_messages=False)
    back = mapping.select(F.col("mid").alias("comp"), F.col("sid").alias("comp_sid"))
    out = (
        comp.join(mapping.select(F.col("mid").alias("id"), "sid"), "id")
        .join(back, "comp")
        .select("sid", "comp_sid")
        .localCheckpoint(eager=True)  # V slim rows; frees mapping's cache
    )
    mapping.unpersist()
    return out


def _uuid_fmt(hexcol):
    """32-char lower hex -> canonical dashed UUID string (8-4-4-4-12)."""
    return F.concat_ws(
        "-",
        F.substring(hexcol, 1, 8),
        F.substring(hexcol, 9, 4),
        F.substring(hexcol, 13, 4),
        F.substring(hexcol, 17, 4),
        F.substring(hexcol, 21, 12),
    )


def _q_wcc_uuid(spark, sf_dir):
    """UUID-id WCC end-to-end through the reference's UUID BytesId order
    (IdType.java:22-27; BytesId.of(UUID) = 16 big-endian bytes =
    dash-stripped canonical hex, BytesId.java:79-92). Vertex ids become
    deterministic UUIDs (md5 of the decimal id, dashed 8-4-4-4-12),
    dense longs are minted in serialized-byte order via
    mint_uuid_ordered_ids, WCC runs on the minted ids, and the component
    representative maps back — comp_uid must be the byte-order-minimum
    member, which (fixed dash positions) equals the lexical minimum of
    the lowercase dashed string, and that's what the oracle recomputes."""
    from incubator_hugegraph_computer_spark.graph import Graph
    from incubator_hugegraph_computer_spark.operators.wcc import wcc
    from incubator_hugegraph_computer_spark.sources.extractor import (
        mint_uuid_ordered_ids,
    )

    g = orders_graph(spark, sf_dir)
    sv = g.vertices.select(
        F.col("id").alias("orig"),
        _uuid_fmt(F.md5(F.col("id").cast("string"))).alias("uid"),
    )
    minted = mint_uuid_ordered_ids(sv.select("uid"), col="uid").withColumnRenamed(
        "id", "mid"
    )
    mapping = sv.join(minted, "uid").persist()  # (orig, uid, mid)
    msrc = mapping.select(F.col("orig").alias("src"), F.col("mid").alias("msrc"))
    mdst = mapping.select(F.col("orig").alias("dst"), F.col("mid").alias("mdst"))
    medges = (
        g.edges.join(msrc, "src")
        .join(mdst, "dst")
        .select(F.col("msrc").alias("src"), F.col("mdst").alias("dst"))
    )
    mg = Graph(mapping.select(F.col("mid").alias("id")), medges)
    comp = wcc(mg, count_messages=False)
    back = mapping.select(F.col("mid").alias("comp"), F.col("uid").alias("comp_uid"))
    out = (
        comp.join(mapping.select(F.col("mid").alias("id"), "uid"), "id")
        .join(back, "comp")
        .select("uid", "comp_uid")
        .localCheckpoint(eager=True)  # V slim rows; frees mapping's cache
    )
    mapping.unpersist()
    return out


def _q_bridges(spark, sf_dir):
    """Bridge edges of the undirected simple orders graph — the
    tag-and-cover spanning-forest formulation (operators/bridges.py).
    Bridges are a graph invariant, so the oracle may build its own
    forest; it mirrors the same deterministic BFS-min forest anyway."""
    from incubator_hugegraph_computer_spark.operators.bridges import bridges

    return bridges(orders_graph(spark, sf_dir))


def _q_2ecc(spark, sf_dir):
    """2-edge-connected component labels (min id per component) —
    connected components after deleting every bridge."""
    from incubator_hugegraph_computer_spark.operators.bridges import (
        two_edge_components,
    )

    return two_edge_components(orders_graph(spark, sf_dir))


def _q_percolation(spark, sf_dir):
    """Overlapping 3-clique percolation communities (Palla et al. 2005)
    — (id, community) membership rows; community = min edge key of the
    triangle-connected component. Labels are SQL-replayable because the
    edge key is the deterministic a*(max_id+1)+b arithmetic code."""
    from incubator_hugegraph_computer_spark.operators.percolation import (
        clique_percolation3,
    )

    return clique_percolation3(orders_graph(spark, sf_dir))


def _q_percolation4(spark, sf_dir):
    """k=4 clique percolation (Palla et al. 2005): communities of
    4-cliques chained by shared TRIANGLES — the stricter overlap model
    the original paper uses. (id, community); community = min triangle
    key ((a·m)+b)·m+c over the id-sorted corner triple."""
    from incubator_hugegraph_computer_spark.operators.percolation import (
        clique_percolation4,
    )

    return clique_percolation4(orders_graph(spark, sf_dir))


def _q_docs_shuffle(spark, sf_dir):
    """Per-shard audit of the deterministic training-data shuffle
    (salted-md5 shard + in-shard order; the writer path is
    repartition(shard) + sortWithinPartitions — no global row numbers)."""
    from incubator_hugegraph_computer_spark.functions.sampling import (
        shuffle_shard_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return shuffle_shard_stats(docs)


def _q_docs_tokens(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.text import (
        document_fingerprint,
        token_count,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        document_fingerprint(F.col("text")).alias("fingerprint"),
    )


def _q_docs_langid(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.text import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", language_id(F.col("text")).alias("lang_pred"))


def _q_docs_quality(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id", F.round(quality_score(F.col("text"), F.col("n_chars")), 6).alias("quality")
    )


def _q_docs_repetition(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.text import repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_stats(docs)


def _q_docs_tfidf(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.text import tfidf_keywords

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_keywords(docs, top_n=3)


def _q_docs_top_terms(spark, sf_dir):
    """Corpus heavy-hitters: the globally heaviest terms with doc
    frequency alongside — the boilerplate/spam surfacing report."""
    from incubator_hugegraph_computer_spark.functions.text import top_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return top_terms(docs, k=TOP_TERMS_K)


def _q_docs_dsir(spark, sf_dir):
    """DSIR importance log-weights (Xie 2023): score every document by
    ln p_target/p_raw under 256-bucket hashed-unigram LMs; target LM
    trains on the en-language docs in the same scan."""
    from incubator_hugegraph_computer_spark.functions.sampling import dsir_logweights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dsir_logweights(docs, F.col("lang") == DSIR_TARGET_LANG)


def _q_docs_unigram_logprob(spark, sf_dir):
    """Corpus-trained unigram-LM mean log-prob per document — the cheap
    perplexity proxy for quality filtering."""
    from incubator_hugegraph_computer_spark.functions.text import unigram_logprob

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = unigram_logprob(docs)
    return r.select("doc_id", "n_tokens", F.round("avg_logprob", 6).alias("avg_logprob"))


def _q_docs_bigram_logprob(spark, sf_dir):
    """Interpolated bigram-LM mean log-prob per document — one rung up
    the perplexity-proxy ladder from the unigram filter (catches
    shuffled word salad that unigram frequencies score as fluent)."""
    from incubator_hugegraph_computer_spark.functions.text import bigram_logprob

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = bigram_logprob(docs, lam=BIGRAM_LAMBDA)
    return r.select("doc_id", "n_bigrams", F.round("avg_logprob", 6).alias("avg_logprob"))


def _q_docs_bm25(spark, sf_dir):
    """Okapi BM25 of a fixed topic query against every document — the
    retrieval-filtered-corpus ranking signal."""
    from incubator_hugegraph_computer_spark.functions.text import bm25_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_scores(docs, list(BM25_TERMS), k1=BM25_K1, b=BM25_B)


def _q_docs_domain_mix(spark, sf_dir):
    """Deterministic mixture-weights downsampling: keep the largest
    corpus in exactly the target language proportions."""
    from incubator_hugegraph_computer_spark.functions.sampling import domain_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return domain_mix(docs, DOMAIN_MIX_TARGETS).select("doc_id", "lang")


def _q_docs_domain_mix_tokens(spark, sf_dir):
    """Token-mass mixture: same targets as docs_domain_mix but the
    proportions are over Σn_chars per language, not document counts."""
    from incubator_hugegraph_computer_spark.functions.sampling import domain_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return domain_mix(docs, DOMAIN_MIX_TARGETS, weight_col="n_chars").select(
        "doc_id", "lang", "n_chars"
    )


def _q_docs_incremental_dedup(spark, sf_dir):
    """Delta-vs-corpus dedup: a deterministic 30% hash slice plays the
    incoming shard, the rest the existing corpus; every shard doc gets
    its best corpus match (or keep=1)."""
    from incubator_hugegraph_computer_spark.functions.dedup import (
        incremental_minhash_dedup,
    )
    from incubator_hugegraph_computer_spark.functions.sampling import (
        hash_uniform,
        hex_threshold,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_new = hash_uniform(F.col("doc_id")) < F.lit(hex_threshold(INCR_NEW_RATE))
    return incremental_minhash_dedup(
        docs.where(is_new), docs.where(~is_new), threshold=INCR_TAU
    )


def _q_docs_redact_pii(spark, sf_dir):
    """PII redaction parity: the corpus carries no PII, so the query
    first derives a deterministic PII-bearing column from doc_id
    (synthetic email + IPv4 + phone prefixed to the text), then redacts
    and fingerprints — the md5 compare verifies regexp semantics match
    across engines on every row."""
    from incubator_hugegraph_computer_spark.functions.text import redact_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.lit("user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ping 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(" call +12 345-67"),
            F.format_string("%02d", (F.col("doc_id") % 100).cast("int")),
            F.lit(" "),
            F.col("text"),
        ).alias("text"),
    )
    out = redact_pii(seeded)
    return out.select(
        "doc_id", "n_emails", "n_ips", "n_phones", F.md5("clean_text").alias("clean_fp")
    )


def _q_docs_length_buckets(spark, sf_dir):
    """CCNet-style per-language quantile banding on document length."""
    from incubator_hugegraph_computer_spark.functions.sampling import quantile_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quantile_buckets(docs, "n_chars", "lang").select("doc_id", "lang", "bucket")


def _q_docs_span_dedup(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.dedup import span_dedup_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return span_dedup_stats(docs, n=SPAN_N)


def _q_emb_pq_topk(spark, sf_dir):
    """Product-quantization ANN: per-subspace codebooks + ADC top-k."""
    from incubator_hugegraph_computer_spark.functions.similarity import pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < PQ_QUERY_MAX)
    return pq_topk(
        emb, queries, m=PQ_M, k=KMEANS_K, iters=KMEANS_ITERS,
        topk=TOPK, dim=EMB_DIM,
    )


def _q_emb_sq_topk(spark, sf_dir):
    """SQ8 scalar-quantization ANN: per-dim [min,max] codes + asymmetric
    L2 against the dequantized corpus — the no-training first rung of
    the quantization ladder (4x scan-rate of float32, near-full recall)."""
    from incubator_hugegraph_computer_spark.functions.similarity import sq8_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < PQ_QUERY_MAX)
    return sq8_topk(emb, queries, topk=TOPK, dim=EMB_DIM)


def _q_emb_ivfpq_topk(spark, sf_dir):
    """IVF-PQ: coarse inverted lists + residual product codes + probed
    ADC scan — the FAISS-style production ANN layout."""
    from incubator_hugegraph_computer_spark.functions.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < PQ_QUERY_MAX)
    return ivfpq_topk(
        emb, queries, n_centroids=IVF_CENTROIDS, probe=IVF_PROBE,
        m=PQ_M, k=KMEANS_K, iters=KMEANS_ITERS, topk=TOPK, dim=EMB_DIM,
    )


def _q_emb_kmeans(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.similarity import kmeans_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans_assign(emb, k=KMEANS_K, iters=KMEANS_ITERS)


def _q_emb_semantic_dedup(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup(emb, k=KMEANS_K, iters=KMEANS_ITERS, threshold=NEARDUP_TAU)


def _q_docs_stratified_sample(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return stratified_sample(
        docs, "lang", STRATA_RATES, default_rate=STRATA_DEFAULT_RATE
    ).select("doc_id", "lang")


def _q_docs_split(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.sampling import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return hash_split(docs, weights=SPLIT_WEIGHTS).select("doc_id", "split")


def _q_docs_decontaminate(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.dedup import decontaminate
    from incubator_hugegraph_computer_spark.functions.sampling import (
        hash_uniform,
        hex_threshold,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # deterministic hash-drawn "benchmark" subset plays the eval set;
    # the complement is the training corpus being screened
    is_eval = hash_uniform(F.col("doc_id")) < F.lit(hex_threshold(DECON_EVAL_RATE))
    out = decontaminate(docs.where(~is_eval), docs.where(is_eval), n=3)
    return out.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.round("contaminated_frac", 6).alias("contaminated_frac"),
    )


def _q_docs_bloom_decontaminate(spark, sf_dir):
    """Bloom-filter decontamination screen — the sketch path of
    docs_decontaminate: eval-set shingles go into a 65536-bit / 4-hash
    Bloom filter (broadcastable at any corpus size; the exact anti-join
    ships the full eval shingle set instead), training shingles probe
    it. One-sided: n_flagged ≥ true contamination count per doc. The
    filter is bit-for-bit oracle-replayed via the portable md5 hash."""
    from incubator_hugegraph_computer_spark.functions.dedup import shingles
    from incubator_hugegraph_computer_spark.functions.sampling import (
        hash_uniform,
        hex_threshold,
    )
    from incubator_hugegraph_computer_spark.functions.sketches import (
        bloom_build,
        bloom_probe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_eval = hash_uniform(F.col("doc_id")) < F.lit(hex_threshold(DECON_EVAL_RATE))
    ev, tr = docs.where(is_eval), docs.where(~is_eval)
    bloom = bloom_build(shingles(ev, n=3), "shingle")
    trsh = shingles(tr, n=3)
    flags = bloom_probe(bloom, trsh, "shingle").withColumnRenamed("key", "shingle")
    per = (
        trsh.join(flags, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.col("maybe_member").cast("long")).alias("n_flagged"),
        )
    )
    return (
        tr.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_flagged", F.lit(0)).alias("n_flagged"),
        )
    )


def _q_docs_curation_funnel(spark, sf_dir):
    """Composed curation pipeline (exact dedup → quality ≥ 0.7 →
    held-out drop → shingle decontamination) as a per-stage survivor
    census — the yield report of the whole corpus build, each stage
    reusing an operator that also ships standalone."""
    from incubator_hugegraph_computer_spark.functions.curation import (
        curation_funnel,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curation_funnel(docs, quality_min=0.7, eval_rate=DECON_EVAL_RATE, n=3)


CHUNK_WINDOW, CHUNK_STRIDE = 64, 32


def _q_docs_chunks(spark, sf_dir):
    """Overlapping token-window chunks (RAG/long-doc splitting)."""
    from incubator_hugegraph_computer_spark.functions.packing import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(docs, window=CHUNK_WINDOW, stride=CHUNK_STRIDE)


def _q_docs_pack(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, budget=PACK_BUDGET)


def _q_docs_pack_stats(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.packing import (
        pack_sequences,
        packing_efficiency,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return packing_efficiency(pack_sequences(docs, budget=PACK_BUDGET), PACK_BUDGET)


def _q_docs_exact_dedup(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashed = docs.select("doc_id", F.md5(F.col("text")).alias("h"))
    groups = hashed.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return hashed.join(groups, "h").select("doc_id", "canonical_id", "group_size")


def _q_docs_ngram_dedup(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_shingle_freq=1000)
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def _q_docs_minhash_dedup(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.dedup import minhash_candidates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_candidates(docs, num_hashes=16, bands=4, n=3, threshold=0.1)
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def _q_docs_lsh_recall(spark, sf_dir):
    """Measured recall of the banded-MinHash candidate generator vs the
    exact n-gram Jaccard truth set — the pre-flight report a 100 TB
    dedup pass runs before committing to an (num_hashes, bands) curve."""
    from incubator_hugegraph_computer_spark.functions.dedup import lsh_recall_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lsh_recall_report(
        docs, num_hashes=16, bands=4, n=3, truth_threshold=0.2,
        max_shingle_freq=1000,
    )


def _q_docs_dedup_clusters(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.dedup import dedup_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup_clusters(docs, num_hashes=16, bands=4, n=3, threshold=0.1)


def _q_docs_simhash(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.dedup import simhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_signatures(docs, bits=32)


def _q_media_byte_stats(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.multimodal import (
        byte_stats,
        media_from_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = byte_stats(media_from_documents(docs)).withColumnRenamed("media_id", "doc_id")
    # boundary rounding with F.round (HALF_UP == DuckDB ROUND); the
    # kernel emits the raw double
    return raw.select("doc_id", "n_bytes", "byte_sum", F.round("byte_mean", 6).alias("byte_mean"))


def _q_media_resize(spark, sf_dir):
    """Decode -> integer mean-pool resize (factor 4) -> re-encode ->
    decode again -> closed-form byte stats. Exercises the full media
    round-trip (two Arrow mapInPandas hops over binary payloads); the
    floor-mean pooling is integer-exact so DuckDB replays it from the
    UTF-8 bytes."""
    from incubator_hugegraph_computer_spark.functions.multimodal import (
        byte_stats,
        media_from_documents,
        resize,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    resized = resize(media_from_documents(docs), factor=4)
    raw = byte_stats(resized).withColumnRenamed("media_id", "doc_id")
    return raw.select(
        "doc_id", "n_bytes", "byte_sum", F.round("byte_mean", 6).alias("byte_mean")
    )


def _q_media_features(spark, sf_dir):
    """Decode -> 8-bucket mean-pooled feature vector (float64 path: the
    pooled means over byte inputs are exact, so DuckDB replays the
    np.array_split chunking — first n%8 chunks get one extra byte — and
    matches bit-for-bit after boundary rounding). Output exploded to
    (doc_id, chunk, fv) so the oracle compares scalar cells."""
    from incubator_hugegraph_computer_spark.functions.multimodal import (
        extract_features,
        media_from_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = media_from_documents(docs).where(F.length("payload") >= 8)
    feats = extract_features(media, feature_dim=8, dtype="float64")
    return feats.select(
        F.col("media_id").alias("doc_id"), F.posexplode("feature").alias("chunk", "fv")
    ).select("doc_id", F.col("chunk").cast("long").alias("chunk"), F.round("fv", 6).alias("fv"))


def _q_media_codec_features(spark, sf_dir):
    """REAL-codec media path: a complete RIFF/WAVE PCM16 container is
    encoded per document (encode_wav; sample t of doc d =
    ((d*7919 + t*104729) % 65536) - 32768), then ``codec="auto"``
    sniffs the container and decodes it with the pure-Python WAV codec
    (`functions/multimodal.py decode_media`) inside the same Arrow
    mapInPandas kernel as the stub path. PCM16 samples are 15-bit
    dyadic rationals, so the float64 pooled means are exact sums —
    the SQL oracle replays them bit-for-bit (rounding is belt and
    braces, not a tolerance). First driver-checkable query through the
    real decoder."""
    from incubator_hugegraph_computer_spark.functions.multimodal import (
        extract_features,
        wav_media_from_ids,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    media = wav_media_from_ids(docs, n_samples=64)
    feats = extract_features(media, feature_dim=8, dtype="float64", codec="auto")
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.col("n_bytes"),
        F.posexplode("feature").alias("chunk", "fv"),
    ).select(
        "doc_id",
        "n_bytes",
        F.col("chunk").cast("long").alias("chunk"),
        F.round("fv", 6).alias("fv"),
    )


def _q_emb_cosine_topk(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    t = cosine_topk(emb, queries, k=TOPK)
    return t.select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank")


def _q_emb_lsh_buckets(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.similarity import lsh_buckets

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_buckets(emb, num_planes=8, dim=EMB_DIM)


def _q_emb_near_dup(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.similarity import (
        embedding_near_duplicates,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nd = embedding_near_duplicates(emb, threshold=NEARDUP_TAU, num_planes=8, dim=EMB_DIM)
    return nd.select("vec_a", "vec_b", F.round("score", 6).alias("score"))


def _q_emb_ann_lsh(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.similarity import ann_lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(F.col("vec_id") < 100)
    t = ann_lsh_topk(emb, k=TOPK, num_planes=8, dim=EMB_DIM)
    return t.select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank")


def _q_emb_ivf_topk(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    t = ivf_topk(emb, queries, k=TOPK, n_centroids=IVF_CENTROIDS, n_probe=IVF_PROBE)
    return t.select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank")


def _q_emb_ivf_recall(spark, sf_dir):
    """Measured recall@k of the IVF probe against the brute-force
    cosine truth set — the pre-flight tuning report an ANN deployment
    reads before fixing n_centroids/n_probe (the emb twin of
    docs_lsh_recall). Both sides reuse the shipped operators."""
    exact = _q_emb_cosine_topk(spark, sf_dir).select("query_id", "vec_id")
    approx = _q_emb_ivf_topk(spark, sf_dir).select("query_id", "vec_id")
    hit = exact.join(approx, ["query_id", "vec_id"])
    per = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    ph = hit.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_found"))
    return per.join(ph, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce("n_found", F.lit(0)).alias("n_found"),
        F.round(
            F.coalesce("n_found", F.lit(0)) / F.col("n_exact"), 6
        ).alias("recall"),
    )


def _q_events_sessions(spark, sf_dir):
    from incubator_hugegraph_computer_spark.streaming.sessions import sessionize_batch

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = sessionize_batch(events, gap_minutes=SESSION_GAP_MIN)
    return s.select(
        "user_id",
        F.round(F.col("session_start").cast("double"), 6).alias("session_start"),
        F.round(F.col("session_end").cast("double"), 6).alias("session_end"),
        "n_events",
        "sum_value",
    )


ASOF_TOLERANCE_S = 3600  # attribution lookback window (1 h)


def _q_events_asof(spark, sf_dir):
    """Attribution as-of join: each purchase carries the most recent
    prior click (inclusive) by the same user within 1 hour — the
    merge_asof / DuckDB-ASOF-JOIN surface, left-outer."""
    from incubator_hugegraph_computer_spark.functions.temporal import asof_join

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    j = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts",
        direction="backward", tolerance_s=ASOF_TOLERANCE_S,
    )
    return j.select(
        "event_id",
        "user_id",
        F.round(F.col("ts").cast("timestamp_ltz").cast("double"), 6).alias("purchase_ts"),
        F.round("value", 6).alias("purchase_value"),
        F.round("click_value_r", 6).alias("click_value"),
        F.round(F.col("ts_r").cast("timestamp_ltz").cast("double"), 6).alias("click_ts"),
    )


def _q_events_gapfill(spark, sf_dir):
    """Gap-filled hourly buckets per event_type (time_bucket_gapfill)."""
    from incubator_hugegraph_computer_spark.functions.temporal import time_bucket_gapfill

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    g = time_bucket_gapfill(events, bucket="hour")
    return g.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def _q_events_interval_join(spark, sf_dir):
    """Clicks inside each purchase's 30-min attribution window —
    point-in-interval join via the bucketized equi-join (no range/
    nested-loop join), zero-match purchases kept by aggregate rejoin."""
    from incubator_hugegraph_computer_spark.functions.temporal import interval_join

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    intervals = purchases.select(
        "event_id",
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("start"),
        F.col("ts").alias("end"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("value").alias("click_value")
    )
    pairs = interval_join(
        clicks, intervals, on=["user_id"],
        point_ts="cts", start_col="start", end_col="end", bucket_s=1800,
    )
    agg = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(F.sum("click_value"), 6).alias("sum_click_value"),
    )
    return (
        purchases.select("event_id", "user_id")
        .join(agg, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_clicks", F.lit(0).cast("long")).alias("n_clicks"),
            "sum_click_value",
        )
    )


SEQ_MAX_LEN = 50  # behavioral-sequence truncation length


def _q_events_transitions(spark, sf_dir):
    """First-order Markov transition counts/probabilities between
    consecutive event types per user (ts, event_id order)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = events.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = t.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    # the per-prev normalizer is |event types| rows — window over a tiny agg
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


def _q_events_heavy_hitters(spark, sf_dir):
    """Top-k event types by count-min-sketch estimate, exact count
    alongside (est ≥ exact is the CMS one-sided contract). The SKETCH
    CELLS are oracle-replayed, not just the summary — the portable
    md5-hex column hash makes Spark and DuckDB agree bit-for-bit."""
    from incubator_hugegraph_computer_spark.functions.sketches import heavy_hitters

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return heavy_hitters(events, "event_type", k=10, depth=4, width=1024)


def _q_events_sequences(spark, sf_dir):
    """Per-user ordered event-type sequence, truncated to SEQ_MAX_LEN —
    the behavioral-sequence extraction shape. The truncation happens
    BEFORE the array is built (row_number <= max over the same user
    partitioning), so per-user aggregation state is bounded by
    SEQ_MAX_LEN, never by a hub user's full history; the per-user total
    rides the same window sort as a frame-free count."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    ranked = events.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n_events"),
    ).where(F.col("rn") <= SEQ_MAX_LEN)
    return ranked.groupBy("user_id", "n_events").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            " ",
        ).alias("seq"),
    ).select("user_id", "n_events", "seq")


def _q_events_rollup(spark, sf_dir):
    """ROLLUP(event_type, day) counts/sums — subtotal + grand-total rows
    (NULL dims mark the rollup levels, standard SQL semantics)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    return events.rollup(F.col("event_type"), day).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def _q_emb_ivf_trained_topk(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_centroids(emb, k=KMEANS_K, iters=KMEANS_ITERS).select(
        F.col("cid").alias("cent_id"), F.col("cv").alias("cvec")
    )
    queries = emb.where(F.col("vec_id") < 5)
    t = ivf_topk(emb, queries, k=TOPK, n_probe=IVF_PROBE, centroids=cents)
    return t.select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank")


def _q_events_props(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.semistructured import props_stats

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return props_stats(events)


def _q_events_funnel(spark, sf_dir):
    """signup → view → purchase ordered funnel, earliest-completion
    semantics: step k counts only strictly after step k-1's time."""
    from incubator_hugegraph_computer_spark.streaming.events import funnel

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel(events)


def _q_events_retention(spark, sf_dir):
    """Cohort retention by first-activity day."""
    from incubator_hugegraph_computer_spark.streaming.events import cohort_retention

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return cohort_retention(events)


def _q_events_hourly(spark, sf_dir):
    from incubator_hugegraph_computer_spark.streaming.events import windowed_event_counts

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = windowed_event_counts(events, "1 hour")
    return w.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def _q_hitting_time(spark, sf_dir):
    """Truncated hitting time to the low-id target set — random-walk
    proximity, K fixed-point sweeps (oracle unrolls them)."""
    from incubator_hugegraph_computer_spark.operators.hitting_time import (
        hitting_time,
    )

    g = orders_graph(spark, sf_dir)
    targets = g.vertices.where(F.col("id") <= HIT_TARGET_MAX).select("id")
    h = hitting_time(g, targets, horizon=HIT_HORIZON)
    return h.select("id", F.round("hitting_time", 6).alias("hitting_time"))


def _q_lpa_seeded(spark, sf_dir):
    """Semi-supervised LPA: fixed seed labels (id % 4 on the low ids)
    fan out over the symmetrized graph for a fixed round budget."""
    from incubator_hugegraph_computer_spark.operators.lpa import lpa_seeded

    g = orders_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("id") <= SEEDED_MAX).select(
        "id", (F.col("id") % SEEDED_CLASSES).alias("label")
    )
    return lpa_seeded(g, seeds, rounds=SEEDED_ROUNDS)


def _q_landmarks(spark, sf_dir):
    """Landmark distance table (long format) — the distance-oracle
    primitive; estimation is a landmark-keyed self-join."""
    from incubator_hugegraph_computer_spark.operators.landmarks import (
        landmark_distances,
    )

    g = orders_graph(spark, sf_dir)
    lm = g.vertices.where(F.col("id") <= LANDMARK_MAX).select("id")
    return landmark_distances(g, lm)


def _q_triangle_sampled(spark, sf_dir):
    """DOULION sampled triangle estimate — the md5 coin replays in SQL,
    so the oracle checks the exact estimate, not just its expectation."""
    from incubator_hugegraph_computer_spark.operators.triangle_count import (
        triangle_count_sampled,
    )

    return triangle_count_sampled(
        orders_graph(spark, sf_dir), threshold_hex=DOULION_HEX, seed=DOULION_SEED
    )


def _q_matching(spark, sf_dir):
    """Luby-style maximal matching — deterministic md5 edge priorities,
    rounds replayed exactly by the unrolled oracle."""
    from incubator_hugegraph_computer_spark.operators.matching import maximal_matching

    return maximal_matching(
        orders_graph(spark, sf_dir), max_rounds=MATCH_ROUNDS, seed=MATCH_SEED
    )


def _q_hem(spark, sf_dir):
    """Heavy-edge matching over the shared derived weight rule —
    METIS's coarsening rule, locally-dominant formulation."""
    from incubator_hugegraph_computer_spark.operators.matching import (
        heavy_edge_matching,
    )

    g = _weighted(orders_graph(spark, sf_dir))
    return heavy_edge_matching(
        g, weight_col="weight", max_rounds=MATCH_ROUNDS, seed=MATCH_SEED
    )


def _q_partition_stats(spark, sf_dir):
    """Edge-cut / balance report under the modulo-K placement — the
    pre-superstep partitioning audit (Σcut/|E| = per-superstep shuffle
    fraction; vertex spread = straggler bound)."""
    from incubator_hugegraph_computer_spark.operators.stats import partition_stats

    return partition_stats(orders_graph(spark, sf_dir), k=PARTITION_K)


def _q_coarsen(spark, sf_dir):
    """One matching-contraction level (multilevel coarsening): matched
    pairs collapse to min-id supervertices, super-edges count
    multiplicity."""
    from incubator_hugegraph_computer_spark.operators.matching import coarsen

    return coarsen(
        orders_graph(spark, sf_dir), max_rounds=MATCH_ROUNDS, seed=MATCH_SEED
    )


def _q_mis(spark, sf_dir):
    """Luby maximal independent set — md5 per-round priorities make the
    whole run SQL-replayable (the oracle unrolls the rounds)."""
    from incubator_hugegraph_computer_spark.operators.mis import (
        maximal_independent_set,
    )

    return maximal_independent_set(
        orders_graph(spark, sf_dir), max_rounds=MIS_ROUNDS, seed=MIS_SEED
    )


def _q_wcc_incremental(spark, sf_dir):
    """Delta-ingest WCC: label half the edge set, then merge the other
    half via component-graph contraction (cost O(|delta|), no rescan of
    old edges). The oracle is the FULL-graph recursive-CTE WCC — the
    incremental result must be indistinguishable from a recompute."""
    from incubator_hugegraph_computer_spark.graph import Graph
    from incubator_hugegraph_computer_spark.operators.wcc import wcc, wcc_incremental

    g = orders_graph(spark, sf_dir)
    parity = (F.col("src") + F.col("dst")) % 2
    old_edges = g.edges.where(parity == 0)
    delta = g.edges.where(parity != 0)
    prev = wcc(Graph.from_edges(old_edges), count_messages=False)
    return wcc_incremental(prev, delta, count_messages=False)


def _q_harmonic(spark, sf_dir):
    """Harmonic centrality + Wasserman–Faust closeness for a seed set
    (the out-direction dual of graph_closeness; same BFS kernel)."""
    from incubator_hugegraph_computer_spark.operators.harmonic import harmonic

    g = orders_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("id") <= HARMONIC_SEED_MAX).select("id")
    h = harmonic(g, sources=seeds)
    return h.select(
        "id",
        F.round("harmonic", 6).alias("harmonic"),
        F.round("wf_closeness", 6).alias("wf_closeness"),
    )


def _q_efficiency(spark, sf_dir):
    """Latora–Marchiori global efficiency over the harmonic seed set:
    mean over sources of Σ 1/d / (n-1); unreachable pairs contribute 0."""
    from incubator_hugegraph_computer_spark.operators.harmonic import (
        global_efficiency,
    )

    g = orders_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("id") <= HARMONIC_SEED_MAX).select("id")
    return global_efficiency(g, sources=seeds)


def _q_tred2(spark, sf_dir):
    """2-path transitive reduction flags on the dependency digraph —
    the build-system "shortcut pruning" pass (an edge implied by a
    single intermediate is redundant for reachability)."""
    from incubator_hugegraph_computer_spark.operators.code_graph import (
        transitive_reduction2,
    )

    return transitive_reduction2(orders_graph(spark, sf_dir))


def _q_attack_sim(spark, sf_dir):
    """Albert–Barabási targeted-attack profile: fragmentation after
    removing the top-k hubs by undirected degree (k = 0 / 10 / 50)."""
    from incubator_hugegraph_computer_spark.operators.structure import (
        attack_tolerance,
    )

    return attack_tolerance(orders_graph(spark, sf_dir), ks=(0, 10, 50))


def _q_random_failure(spark, sf_dir):
    """Random-failure baseline for the attack profile: remove k
    md5-drawn vertices instead of the top hubs — the comparison curve
    that makes the targeted-attack numbers legible."""
    from incubator_hugegraph_computer_spark.operators.structure import (
        attack_tolerance,
    )

    return attack_tolerance(
        orders_graph(spark, sf_dir), ks=(0, 10, 50), rule="random"
    )


def _q_eccentricity(spark, sf_dir):
    """Per-seed out-eccentricity + reach census (radius/diameter
    estimates are min/max over the seed rows; harmonic's BFS kernel)."""
    from incubator_hugegraph_computer_spark.operators.bfs import eccentricity

    g = orders_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("id") <= HARMONIC_SEED_MAX).select("id")
    return eccentricity(g, sources=seeds)


def _q_neighborhood(spark, sf_dir):
    """Exact neighborhood function N(v, h) for h=1..3 over the directed
    graph (ANF primitive; the sketched HyperANF path is the 100 TB
    strategy, pytest-checked against this exact one)."""
    from incubator_hugegraph_computer_spark.operators.neighborhood import (
        neighborhood_function,
    )

    return neighborhood_function(orders_graph(spark, sf_dir), max_h=NF_MAX_H, exact=True)


def _q_conductance(spark, sf_dir):
    """Community-quality sweep: LPA labels → per-community volume /
    cut / conductance over the symmetrized graph."""
    from incubator_hugegraph_computer_spark.operators.conductance import conductance
    from incubator_hugegraph_computer_spark.operators.lpa import lpa

    g = orders_graph(spark, sf_dir)
    labels = lpa(g, max_supersteps=COND_LPA_ROUNDS, count_messages=False)
    c = conductance(g, labels)
    return c.select(
        "label", "size", "volume", "cut",
        F.round("conductance", 6).alias("conductance"),
    )


def _q_docs_diversity(spark, sf_dir):
    from incubator_hugegraph_computer_spark.functions.text import diversity_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return diversity_stats(docs)


def _q_events_anomaly(spark, sf_dir):
    from incubator_hugegraph_computer_spark.streaming.events import hourly_anomaly

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = hourly_anomaly(events, z_threshold=ANOMALY_Z)
    return a.select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "n_events",
        "z",
        "is_anomaly",
    )


def _q_betweenness_sampled(spark, sf_dir):
    """Scaled Brandes pivot estimator (BetweennessCentrality.java:41,
    70-74 samples sources at random and reports the scaled sum): pivots
    drawn by an md5 coin the oracle replays bit-identically, estimate =
    (|V| / |pivots|) · Σ_pivots dependency."""
    from incubator_hugegraph_computer_spark.operators.betweenness import betweenness

    g = orders_graph(spark, sf_dir)
    coin = F.md5(
        F.concat_ws(":", F.col("id").cast("string"), F.lit(str(BETW_SAMPLE_SEED)))
    )
    srcs = g.vertices.where(coin < F.lit(BETW_SAMPLE_HEX)).select("id")
    b = betweenness(g, sources=srcs, max_depth=BETW_DEPTH)
    scale = (
        g.vertices.agg(F.count(F.lit(1)).cast("double").alias("nv"))
        .crossJoin(srcs.agg(F.count(F.lit(1)).alias("np")))  # one-row × one-row
    )
    return b.crossJoin(F.broadcast(scale)).select(
        "id",
        F.round(F.col("betweenness") * F.col("nv") / F.col("np"), 6).alias(
            "betweenness_est"
        ),
    )


def _q_attr_assortativity(spark, sf_dir):
    """Newman categorical homophily over nation labels: custkey
    vertices carry their customer's nation, non-customer vertices a
    deterministic id%25 pseudo-nation."""
    from incubator_hugegraph_computer_spark.operators.link_prediction import (
        attribute_assortativity,
    )

    g = orders_graph(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_nationkey").cast("long").alias("nk"),
    )
    attrs = (
        g.vertices.select("id")
        .join(cust, "id", "left")
        .select("id", F.coalesce("nk", F.col("id") % 25).alias("attr"))
    )
    return attribute_assortativity(g, attrs)


def _q_embeddedness(spark, sf_dir):
    """Per-edge common-neighbor count; 0-rows are the local bridges."""
    from incubator_hugegraph_computer_spark.operators.structure import (
        edge_embeddedness,
    )

    return edge_embeddedness(orders_graph(spark, sf_dir))


def _q_rich_club(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.structure import rich_club

    return rich_club(orders_graph(spark, sf_dir), max_k=RICH_CLUB_MAX_K)


def _q_bowtie(spark, sf_dir):
    """Broder bow-tie map (CORE/IN/OUT/TUBE/TENDRIL_*/DISCONNECTED)."""
    from incubator_hugegraph_computer_spark.operators.structure import bowtie

    return bowtie(orders_graph(spark, sf_dir))


def _q_scan(spark, sf_dir):
    """SCAN structural clustering: cluster id / -1 hub / -2 outlier."""
    from incubator_hugegraph_computer_spark.operators.scan import scan

    return scan(orders_graph(spark, sf_dir), eps=SCAN_EPS, mu=SCAN_MU)


def _q_quotient(spark, sf_dir):
    """Host-graph aggregation: collapse vertices onto id % 64 groups."""
    from incubator_hugegraph_computer_spark.operators.quotient import quotient_graph

    g = orders_graph(spark, sf_dir)
    mapping = g.vertices.select("id", (F.col("id") % QUOTIENT_MOD).alias("grp"))
    return quotient_graph(g, mapping)


def _q_bipartite(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.bipartite import bipartite_check

    return bipartite_check(orders_graph(spark, sf_dir), max_depth=BIPARTITE_DEPTH)


def _q_k4(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.cliques import k4_count

    return k4_count(orders_graph(spark, sf_dir))


def _trust_seeds(g):
    return [r.id for r in g.vertices.where(F.col("id") <= TRUST_SEED_MAX).collect()]


def _q_trustrank(spark, sf_dir):
    """Gyöngyi TrustRank from the id<=50 trusted seed set."""
    from incubator_hugegraph_computer_spark.operators.trustrank import trustrank

    g = orders_graph(spark, sf_dir)
    tr = trustrank(
        g, _trust_seeds(g), max_iterations=TRUST_ITERS, tol=0.0, count_messages=False
    )
    return tr.select("id", F.round("rank", 6).alias("rank"))


def _q_spam_mass(spark, sf_dir):
    """Relative spam mass: PageRank fraction unexplained by trust flow."""
    from incubator_hugegraph_computer_spark.operators.trustrank import spam_mass

    g = orders_graph(spark, sf_dir)
    sm = spam_mass(g, _trust_seeds(g), max_iterations=TRUST_ITERS, count_messages=False)
    return sm.select(
        "id",
        F.round("pagerank", 6).alias("pagerank"),
        F.round("trust", 6).alias("trust"),
        F.round("spam_mass", 6).alias("spam_mass"),
    )


def _q_hostrank(spark, sf_dir):
    """HostRank: weighted PageRank over the id%64 quotient graph."""
    from incubator_hugegraph_computer_spark.operators.quotient import host_rank

    g = orders_graph(spark, sf_dir)
    mapping = g.vertices.select("id", (F.col("id") % QUOTIENT_MOD).alias("grp"))
    hr = host_rank(g, mapping, max_iterations=HOSTRANK_ITERS, count_messages=False)
    return hr.select("grp", F.round("rank", 6).alias("rank"))


def _q_snapshot_diff(spark, sf_dir):
    """Crawl-over-crawl edge delta per host pair (id%64 groups)."""
    from incubator_hugegraph_computer_spark.operators.quotient import snapshot_diff

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def edges_of(flt):
        return (
            orders.where(flt)
            .select(
                F.col("o_custkey").cast("long").alias("src"),
                (F.col("o_orderkey") % DST_MOD).cast("long").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    old = edges_of(F.col("o_orderkey") % 10 < SNAP_OLD_MOD_LT)
    new = edges_of(F.col("o_orderkey") % 10 >= SNAP_NEW_MOD_GE)
    g = orders_graph(spark, sf_dir)
    mapping = g.vertices.select("id", (F.col("id") % QUOTIENT_MOD).alias("grp"))
    return snapshot_diff(old, new, mapping)


def _q_pagerank_delta(spark, sf_dir):
    """Crawl-delta PageRank: PR_DELTA_BASE cold iterations on the old
    crawl's edges, then the delta lands and PR_DELTA_CONT more
    iterations run WARM-STARTED from the old ranks over the new edge
    set (operators/pagerank.py ``initial_ranks``) — the re-rank-after-
    ingest path a web deployment runs instead of cold-starting 10^12
    files per crawl. Vertices the delta introduced start at 1/n_new.
    Both phases are fixed-iteration (tol=0) so the oracle unrolls the
    exact two-phase recurrence."""
    from incubator_hugegraph_computer_spark.operators.pagerank import pagerank_classic

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def edges_of(flt):
        return (
            orders.where(flt)
            .select(
                F.col("o_custkey").cast("long").alias("src"),
                (F.col("o_orderkey") % DST_MOD).cast("long").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    old_g = Graph.from_edges(edges_of(F.col("o_orderkey") % 10 < SNAP_OLD_MOD_LT))
    warm = pagerank_classic(
        old_g, max_iterations=PR_DELTA_BASE, tol=0.0, count_messages=False
    )
    new_g = Graph.from_edges(edges_of(F.col("o_orderkey") % 10 >= SNAP_NEW_MOD_GE))
    pr = pagerank_classic(
        new_g,
        max_iterations=PR_DELTA_CONT,
        tol=0.0,
        count_messages=False,
        initial_ranks=warm,
    )
    return pr.select("id", F.round("rank", 6).alias("rank"))


def _q_superstep_metrics(spark, sf_dir):
    """The per-superstep counters the checkpoint backend persists
    (messages_sent = combined-inbox size, active_vertices — the
    MasterService superstep-stat surface), traced over a WCC run and
    exposed as an oracled query: the counters themselves are checked,
    not just the converged labels."""
    from incubator_hugegraph_computer_spark.operators.wcc import wcc_superstep_metrics

    return wcc_superstep_metrics(
        orders_graph(spark, sf_dir), max_supersteps=WCC_METRICS_STEPS
    )


def _q_pagerank_trace(spark, sf_dir):
    """Per-superstep PageRank AGGREGATOR values (l1 residual, dangling
    mass, cumulative rank — PageRank4Master's registered aggregators,
    the same values the checkpoint writes to aggs.json), value-checked
    against the unrolled recurrence."""
    from incubator_hugegraph_computer_spark.operators.pagerank import (
        pagerank_classic_trace,
    )

    return pagerank_classic_trace(
        orders_graph(spark, sf_dir), iterations=PR_TRACE_ITERS
    )


def _q_opic(spark, sf_dir):
    """OPIC crawl-time importance (Abiteboul et al., WWW'03): the
    cash/history estimate after OPIC_ITERS synchronous distribution
    steps — the importance measure a crawler maintains online, vs
    PageRank's offline fixpoint. Same audited message-pass plan class
    as pagerank (operators/opic.py)."""
    from incubator_hugegraph_computer_spark.operators.opic import opic

    r = opic(orders_graph(spark, sf_dir), iterations=OPIC_ITERS)
    return r.select("id", F.round("opic", 6).alias("opic"))


def _q_crawl_schedule(spark, sf_dir):
    """Politeness-aware crawl schedule: per-host (id%64) fetch slots in
    in-degree-priority order, CRAWL_DELAY_MS apart, capped at
    CRAWL_BUDGET pages per host (operators/crawl.py). One shuffle on
    the host key; windows bounded by per-host page count."""
    from incubator_hugegraph_computer_spark.operators.crawl import crawl_schedule

    r = crawl_schedule(
        orders_graph(spark, sf_dir),
        host_mod=QUOTIENT_MOD,
        delay_ms=CRAWL_DELAY_MS,
        budget=CRAWL_BUDGET,
    )
    return r.select("id", "host", F.col("slot").cast("long").alias("slot"), "fetch_ms")


def _q_cocitation(spark, sf_dir):
    """Co-citation strength (Small 1973): weight(a,b) = number of pages
    citing BOTH a and b (common in-neighbors) — the bipartite projection
    of the edge table grouped by the citing source
    (operators/projection.py). Hub sources above COCIT_CAP out-degree
    are dropped (declared cap, oracle replays it)."""
    from incubator_hugegraph_computer_spark.operators.projection import project

    g = orders_graph(spark, sf_dir)
    return project(g.edges, "src", "dst", max_group_size=COCIT_CAP).select(
        F.col("src").alias("a"), F.col("dst").alias("b"), "weight"
    )


def _q_bibcoupling(spark, sf_dir):
    """Bibliographic coupling (Kessler 1963): weight(a,b) = number of
    pages BOTH a and b cite (common out-neighbors) — the same projection
    grouped by the cited page; pages above BIBC_CAP in-degree dropped."""
    from incubator_hugegraph_computer_spark.operators.projection import project

    g = orders_graph(spark, sf_dir)
    return project(g.edges, "dst", "src", max_group_size=BIBC_CAP).select(
        F.col("src").alias("a"), F.col("dst").alias("b"), "weight"
    )


def _q_comp_sizes(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.stats import (
        component_size_distribution,
    )

    return component_size_distribution(
        orders_graph(spark, sf_dir), count_messages=False
    )


def _q_powerlaw(spark, sf_dir):
    """Clauset-Shalizi-Newman continuous-MLE power-law exponent of the
    in-degree tail."""
    from incubator_hugegraph_computer_spark.operators.stats import powerlaw_alpha

    pa = powerlaw_alpha(orders_graph(spark, sf_dir), dmin=POWERLAW_DMIN, direction="in")
    return pa.select("dmin", "n_tail", F.round("alpha", 6).alias("alpha"))


def _q_eff_diameter(spark, sf_dir):
    """Interpolation-free effective diameter (smallest h whose mean
    ball reaches 90% of the h=3 mean) from the exact ANF table."""
    from incubator_hugegraph_computer_spark.operators.neighborhood import (
        effective_diameter,
        neighborhood_function,
    )

    nf = neighborhood_function(orders_graph(spark, sf_dir), max_h=NF_MAX_H, exact=True)
    ed = effective_diameter(nf, max_h=NF_MAX_H, quantile=EFFDIAM_Q)
    return ed.select(
        F.col("eff_diameter").cast("long").alias("eff_diameter"),
        F.round("avg_reach", 6).alias("avg_reach"),
    )


def _q_densest(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.densest import densest_subgraph

    return densest_subgraph(
        orders_graph(spark, sf_dir), eps=DENSEST_EPS, max_rounds=DENSEST_ROUNDS
    )


def _q_feature_smooth(spark, sf_dir):
    from incubator_hugegraph_computer_spark.operators.smoothing import smooth_feature

    g = orders_graph(spark, sf_dir)
    feats = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            F.col("c_custkey").cast("long").alias("id"),
            F.col("c_acctbal").cast("double").alias("x"),
        )
    )
    s = smooth_feature(g, feats, rounds=SMOOTH_ROUNDS, alpha=SMOOTH_ALPHA)
    return s.select("id", F.round("x", 6).alias("x"))


def _q_wl_refine(spark, sf_dir):
    """1-WL color refinement: md5-hash recurrence over sorted neighbor
    color multisets — fully deterministic, oracle replays every round."""
    from incubator_hugegraph_computer_spark.operators.wl import wl_refine

    return wl_refine(orders_graph(spark, sf_dir), rounds=WL_ROUNDS)


def _q_triad_census(spark, sf_dir):
    """Closed-form undirected triad census (empty/one-edge/path/
    triangle) from degree + triangle aggregates — never enumerates the
    O(V³) triple space."""
    from incubator_hugegraph_computer_spark.operators.motifs import triad_census

    return triad_census(orders_graph(spark, sf_dir))


def _q_vertex_cut(spark, sf_dir):
    """PowerGraph-style 2-D grid edge placement vs 1-D edge hash:
    max shard load + mean vertex replication (×10⁶, exact integer)."""
    from incubator_hugegraph_computer_spark.operators.stats import vertex_cut_stats

    return vertex_cut_stats(orders_graph(spark, sf_dir), rows=VCUT_ROWS, cols=VCUT_COLS)


def _q_fastrp(spark, sf_dir):
    """FastRP structural embeddings, exact-integer variant — every
    value an int64 so the unrolled oracle is float-free."""
    from incubator_hugegraph_computer_spark.operators.embeddings import fastrp_embed

    return fastrp_embed(
        orders_graph(spark, sf_dir),
        dim=FASTRP_DIM,
        iters=FASTRP_ITERS,
        seed=FASTRP_SEED,
        weights=FASTRP_WEIGHTS,
    )


def _q_temporal_reach(spark, sf_dir):
    """Earliest-arrival time-respecting reachability from the SSSP
    source under the declared edge-timestamp rule."""
    from incubator_hugegraph_computer_spark.operators.bfs import temporal_reachability

    g = orders_graph(spark, sf_dir)
    from incubator_hugegraph_computer_spark.graph import Graph

    tg = Graph(
        g.vertices,
        g.edges.withColumn(
            "ts", ((F.col("src") * 7 + F.col("dst") * 13) % 100).cast("long")
        ),
        prepartitioned=True,
    )
    return temporal_reachability(tg, source=SSSP_SOURCE, max_hops=TREACH_HOPS)


def _q_docs_pmi_graph(spark, sf_dir):
    """PMI token-collocation edge table over the documents corpus."""
    from incubator_hugegraph_computer_spark.functions.text import pmi_cooccurrence

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pmi_cooccurrence(docs, min_pair=PMI_MIN_PAIR)


def _q_ppr_batch(spark, sf_dir):
    """Batched landmark PPR: all seeds advance in ONE superstep
    sequence (sparse (seed, id) state) — |S| sequential barrier
    chains collapsed into one."""
    from incubator_hugegraph_computer_spark.operators.ppr import ppr_batch

    g = orders_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("id") <= PPRB_SEED_MAX).select(
        F.col("id").alias("seed")
    )
    out = ppr_batch(g, seeds, iterations=PPR_ITERS)
    return out.select("seed", "id", F.round("rank", 6).alias("rank"))


def _q_pic(spark, sf_dir):
    """Power-iteration-clustering embedding (Lin & Cohen): truncated
    power iteration on D⁻¹A with L1 renormalization."""
    from incubator_hugegraph_computer_spark.operators.pic import pic_scores

    return pic_scores(orders_graph(spark, sf_dir), iterations=PIC_ITERS)


def _q_docs_containment(spark, sf_dir):
    """Broder containment pairs — the asymmetric dedup filter that
    catches sub-document inclusion Jaccard misses."""
    from incubator_hugegraph_computer_spark.functions.dedup import containment_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return containment_pairs(
        docs, n=3, threshold=CONTAIN_TAU, max_shingle_freq=CONTAIN_MAXDF
    )


def _q_label_spread(spark, sf_dir):
    """Continuous (Zhu-Ghahramani) label spreading under the seeded-LPA
    seed rule; long-format class scores, no argmax (ULP-safe)."""
    from incubator_hugegraph_computer_spark.operators.smoothing import label_spread

    g = orders_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("id") <= SEEDED_MAX).select(
        "id", (F.col("id") % SEEDED_CLASSES).cast("long").alias("c")
    )
    out = label_spread(g, seeds, rounds=LS_ROUNDS, alpha=LS_ALPHA)
    return out.select("id", "c", F.round("f", 6).alias("f"))


def _q_msbfs(spark, sf_dir):
    """Bit-parallel multi-source BFS: 32 seeds in one wavefront via
    int64 masks + bit_or combiner — exact integers end-to-end."""
    from incubator_hugegraph_computer_spark.operators.bfs import msbfs_reach

    return msbfs_reach(
        orders_graph(spark, sf_dir), seed_max=MSBFS_SEED_MAX, max_hops=MSBFS_HOPS
    )


def _q_anf_hll(spark, sf_dir):
    """HyperBall with portable md5 registers — the oracle replays the
    REGISTERS bit-for-bit (cell-exact, like the count-min sketch)."""
    from incubator_hugegraph_computer_spark.operators.neighborhood import (
        hyperball_reach,
    )

    return hyperball_reach(
        orders_graph(spark, sf_dir), hops=HLL_HOPS, registers=HLL_REGISTERS
    )


def _q_emb_mips_topk(spark, sf_dir):
    """Exact top-k by inner product (MIPS) — magnitude-aware retrieval."""
    from incubator_hugegraph_computer_spark.functions.similarity import mips_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.where(F.col("vec_id") < 5)
    t = mips_topk(emb, queries_df, k=TOPK)
    return t.select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank")


def _q_butterflies(spark, sf_dir):
    """Bipartite 4-cycle census over the directed incidence — the
    co-citation density signal (spam blocks, copy farms)."""
    from incubator_hugegraph_computer_spark.operators.projection import (
        butterfly_count,
    )

    return butterfly_count(orders_graph(spark, sf_dir), max_hub=BF_CAP)


def _q_ari(spark, sf_dir):
    """ARI + NMI agreement between the two LPA variants (sync-Vermeer
    vs directed-Java) — pair-counting from the contingency table only.
    Both labelings are multi-class at every SF, so the entropies and
    the adjusted index are well-defined."""
    from incubator_hugegraph_computer_spark.operators.lpa import lpa, lpa_sync
    from incubator_hugegraph_computer_spark.operators.stats import (
        clustering_agreement,
    )

    g = orders_graph(spark, sf_dir)
    a = lpa_sync(
        g, max_supersteps=LPA_SYNC_ITERS, fixed=True, count_messages=False
    ).select("id", F.col("label").alias("la"))
    b = lpa(g, max_supersteps=LPA_ROUNDS, count_messages=False).select(
        "id", F.col("label").alias("lb")
    )
    return clustering_agreement(a, b)


def _q_collective_influence(spark, sf_dir):
    """Morone-Makse collective influence at ℓ=2 — optimal-percolation
    seed scores, exact int64."""
    from incubator_hugegraph_computer_spark.operators.structure import (
        collective_influence,
    )

    return collective_influence(orders_graph(spark, sf_dir), hub_cap=CI_DEG_CAP)


def _q_slashburn(spark, sf_dir):
    """SlashBurn hub-removal shatter profile — deterministic hub and
    GCC selection, replayed per round by the oracle."""
    from incubator_hugegraph_computer_spark.operators.structure import slashburn

    return slashburn(orders_graph(spark, sf_dir), k=SB_K, rounds=SB_ROUNDS)


def _q_newman_vector(spark, sf_dir):
    """Matrix-free power iteration on Newman's modularity matrix —
    the spectral 2-way community signal, B never materialized."""
    from incubator_hugegraph_computer_spark.operators.eigenvector import (
        newman_leading_vector,
    )

    return newman_leading_vector(orders_graph(spark, sf_dir), iterations=NEWMAN_ITERS)


def _q_events_users_hll(spark, sf_dir):
    """Hourly distinct users via portable md5 HLL registers, exact
    count alongside (the CMS est-vs-exact reporting pattern)."""
    from incubator_hugegraph_computer_spark.functions.sketches import hll_distinct

    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
    )
    est = hll_distinct(events, "user_id", ["hour"], registers=HLL_REGISTERS)
    exact = events.groupBy("hour").agg(
        F.count_distinct("user_id").cast("long").alias("n_users")
    )
    return est.join(exact, "hour").select(
        "hour", F.col("est_distinct").alias("est_users"), "n_users"
    )


def _q_harmonic_hll(spark, sf_dir):
    """HyperBall harmonic centrality — all vertices at once from the
    portable HLL registers (the 100 TB closeness path)."""
    from incubator_hugegraph_computer_spark.operators.neighborhood import (
        hyperball_harmonic,
    )

    return hyperball_harmonic(
        orders_graph(spark, sf_dir), hops=HLL_HOPS, registers=HLL_REGISTERS
    )


def _q_bond_percolation(spark, sf_dir):
    """Edge-retention resilience curve — deterministic md5 coins, one
    WCC per retention level."""
    from incubator_hugegraph_computer_spark.operators.structure import (
        bond_percolation,
    )

    return bond_percolation(orders_graph(spark, sf_dir), thresholds=BP_THRESH)


def _q_media_phash(spark, sf_dir):
    """aHash perceptual fingerprints through the Arrow decode kernel —
    the multimodal near-dup bucket step; oracle replays the bits."""
    from incubator_hugegraph_computer_spark.functions.multimodal import (
        media_from_documents,
        perceptual_hash,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return perceptual_hash(media_from_documents(docs)).withColumnRenamed(
        "media_id", "doc_id"
    )


def _q_docs_cdc_chunks(spark, sf_dir):
    """Content-defined chunking — md5-gated boundaries, per-document
    windows only (no global window)."""
    from incubator_hugegraph_computer_spark.functions.text import cdc_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return cdc_chunks(docs, window=CDC_WINDOW)


def _q_docs_zipf(spark, sf_dir):
    """Hill/MLE Zipf exponent of the corpus term-frequency tail."""
    from incubator_hugegraph_computer_spark.functions.text import zipf_alpha

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return zipf_alpha(docs, fmin=ZIPF_FMIN)


def _q_sage_sample(spark, sf_dir):
    """Deterministic GraphSAGE neighbor sampling — bounded-fanout
    minibatch subgraphs, md5 draws replayed by the oracle."""
    from incubator_hugegraph_computer_spark.operators.embeddings import sage_sample

    g = orders_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("id") <= SAGE_SEED_MAX).select("id")
    return sage_sample(g, seeds, fanouts=SAGE_FANOUTS, seed=SAGE_SEED)


def _q_emb_mrl_topk(spark, sf_dir):
    """Matryoshka staged retrieval: prefix-dim scan, full-dim re-rank."""
    from incubator_hugegraph_computer_spark.functions.similarity import mrl_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.where(F.col("vec_id") < 5)
    t = mrl_topk(
        emb, queries_df, k=TOPK, prefix_dim=MRL_PREFIX, candidates=MRL_CAND
    )
    return t.select("query_id", "vec_id", F.round("score", 6).alias("score"), "rank")


def _q_media_phash_pairs(spark, sf_dir):
    """Banded-LSH over perceptual hashes + Hamming verify — the
    multimodal near-dup pair pass."""
    from incubator_hugegraph_computer_spark.functions.multimodal import (
        media_from_documents,
        phash_near_duplicates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return phash_near_duplicates(
        media_from_documents(docs),
        bands=PHASH_BANDS,
        band_bits=PHASH_BAND_BITS,
        max_hamming=PHASH_MAX_HAMMING,
    )


def _q_jdm(spark, sf_dir):
    """Joint degree matrix over log2 buckets — degree-mixing
    fingerprint, O(log² max_degree) rows at any scale."""
    from incubator_hugegraph_computer_spark.operators.stats import (
        joint_degree_matrix,
    )

    return joint_degree_matrix(orders_graph(spark, sf_dir))


def _q_media_phash_recall(spark, sf_dir):
    """Measured recall of the banded phash candidate generator vs the
    all-pairs Hamming truth — the multimodal pre-flight tuning report."""
    from incubator_hugegraph_computer_spark.functions.multimodal import (
        media_from_documents,
        phash_recall_report,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return phash_recall_report(
        media_from_documents(docs),
        bands=PHASH_BANDS,
        band_bits=PHASH_BAND_BITS,
        max_hamming=PHASH_MAX_HAMMING,
    )


def _q_docs_cdc_shared(spark, sf_dir):
    """Cross-document shared spans from content-defined chunks —
    the payoff query of cdc_chunks (offset-independent shared content)."""
    from incubator_hugegraph_computer_spark.functions.text import cdc_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ch = cdc_chunks(docs, window=CDC_WINDOW)
    return (
        ch.groupBy("chunk_md5")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max("chunk_len").alias("chunk_len"),
        )
        .where(F.col("n_docs") >= 2)
    )


def _q_motif_null(spark, sf_dir):
    """Observed triangles vs configuration-model expectation — the
    excess-clustering factor."""
    from incubator_hugegraph_computer_spark.operators.motifs import (
        triangle_null_model,
    )

    return triangle_null_model(orders_graph(spark, sf_dir))


def _q_ppr_push(spark, sf_dir):
    """ACL forward-push PPR: estimate + residual, touched state
    proportional to the answer's support — the local-computation
    primitive power iteration can't give."""
    from incubator_hugegraph_computer_spark.operators.ppr import ppr_push

    return ppr_push(
        orders_graph(spark, sf_dir),
        source=PPR_SOURCE,
        eps=PUSH_EPS,
        rounds=PUSH_ROUNDS,
    )


def _q_rmat_profile(spark, sf_dir):
    """Deterministic R-MAT generation: the out-degree histogram proves
    every generated edge bit-for-bit (integer-threshold draws, no
    floats) — the engine's own 100 TB test-graph factory."""
    from incubator_hugegraph_computer_spark.sources.generators import (
        rmat_degree_profile,
    )

    return rmat_degree_profile(
        spark, RMAT_EDGES, levels=RMAT_LEVELS, seed=RMAT_SEED
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- driver CORRECTNESS window: first 50 keys. Slots 1-30 are the
        # pinned Sec-2-core regression canary; slots 31-50 rotate
        # never-driver-checked keys into the window each round (r5:
        # events_retention/gapfill/interval_join/sequences, emb_pq/ivfpq/
        # semantic_dedup, docs_pack/chunks/bm25/shuffle_shards,
        # media_resize/phash_pairs, graph_bowtie/scan/host_quotient/
        # anf_hll/msbfs/wl_refine/mis). ---
        "graph_degree": _q_degree,
        "graph_degree_weighted": _q_degree_weighted,
        "graph_pagerank": _q_pagerank,
        "graph_pagerank_weighted": _q_pagerank_weighted,
        "graph_wcc": _q_wcc,
        "graph_lpa": _q_lpa,
        "graph_lpa_sync": _q_lpa_sync,
        "graph_triangle_count": _q_triangles,
        "graph_clustering_coefficient": _q_clustering,
        "graph_kcore": _q_kcore,
        "graph_sssp": _q_sssp,
        "graph_sssp_weighted": _q_sssp_weighted,
        "graph_widest_path": _q_widest_path,
        "graph_ppr": _q_ppr,
        "graph_jaccard": _q_jaccard,
        "graph_kout": _q_kout,
        "graph_closeness": _q_closeness,
        "graph_top_degree": _q_top_degree,
        "graph_modularity": _q_modularity,
        "graph_rings": _q_rings,
        "graph_rings_filter_dsl": _q_rings_filter_dsl,
        "graph_scc": _q_scc,
        "graph_depth": _q_depth,
        "graph_counts": _q_counts,
        "graph_cycle_detection": _q_cycle_detection,
        "graph_slpa": _q_slpa,
        "graph_betweenness": _q_betweenness,
        "graph_random_walk": _q_random_walk,
        "graph_louvain": _q_louvain,
        "graph_property_ingest": _q_property_ingest,
        # --- rotation slots (31-50): first-ever driver rows this round ---
        "events_retention": _q_events_retention,
        "events_gapfill": _q_events_gapfill,
        "events_interval_join": _q_events_interval_join,
        "events_sequences": _q_events_sequences,
        "emb_pq_topk": _q_emb_pq_topk,
        "emb_ivfpq_topk": _q_emb_ivfpq_topk,
        "emb_semantic_dedup": _q_emb_semantic_dedup,
        "docs_pack": _q_docs_pack,
        "docs_chunks": _q_docs_chunks,
        "docs_bm25": _q_docs_bm25,
        "media_codec_features": _q_media_codec_features,
        "media_resize": _q_media_resize,
        "media_phash_pairs": _q_media_phash_pairs,
        "graph_bowtie": _q_bowtie,
        "graph_scan": _q_scan,
        "graph_host_quotient": _q_quotient,
        "graph_anf_hll": _q_anf_hll,
        "graph_msbfs": _q_msbfs,
        "graph_wl_refine": _q_wl_refine,
        "graph_mis": _q_mis,
        # --- beyond the driver window (gate-checked via tools/check_correctness.py;
        # r4 rotation keys graduated here with green rows) ---
        "docs_shuffle_shards": _q_docs_shuffle,
        "graph_wcc_strid": _q_wcc_strid,
        "graph_wcc_uuid": _q_wcc_uuid,
        "graph_voterank": _q_voterank,
        "graph_simrank": _q_simrank,
        "graph_harmonic": _q_harmonic,
        "graph_bridges": _q_bridges,
        "graph_fastrp": _q_fastrp,
        "docs_tfidf": _q_docs_tfidf,
        "docs_winnowing": _q_winnowing,
        "docs_incremental_dedup": _q_docs_incremental_dedup,
        "docs_decontaminate": _q_docs_decontaminate,
        "emb_kmeans": _q_emb_kmeans,
        "emb_ivf_recall": _q_emb_ivf_recall,
        "emb_mips_topk": _q_emb_mips_topk,
        "events_asof": _q_events_asof,
        "events_funnel": _q_events_funnel,
        "events_heavy_hitters": _q_events_heavy_hitters,
        "events_users_hll": _q_events_users_hll,
        "media_phash": _q_media_phash,
        "media_features": _q_media_features,
        "graph_sssp_weighted_path": _q_sssp_weighted_path,
        "graph_ppr_sweep": _q_ppr_sweep,
        "graph_closeness_weighted": _q_closeness_weighted,
        "graph_build_layers": _q_build_layers,
        "graph_critical_path": _q_critical_path,
        "graph_coupling": _q_coupling,
        "graph_impact": _q_impact,
        "graph_sparsify": _q_sparsify,
        "graph_cascade": _q_cascade,
        "graph_rings_filtered": _q_rings_filtered,
        "graph_depth_sketch": _q_depth_sketch,
        "graph_slpa_multi": _q_slpa_multi,
        "graph_kcore_wcc": _q_kcore_wcc,
        "graph_degree_sketch": _q_degree_sketch,
        "graph_edge_betweenness": _q_edge_betweenness,
        "graph_leiden": _q_leiden,
        "graph_louvain_weighted": _q_louvain_weighted,
        "graph_hits": _q_hits,
        "graph_katz": _q_katz,
        "graph_link_prediction": _q_link_prediction,
        "graph_assortativity": _q_assortativity,
        "graph_knn_degree": _q_knn_degree,
        "graph_eigenvector": _q_eigenvector,
        "graph_ktruss": _q_ktruss,
        "graph_trussness": _q_trussness,
        "graph_reciprocity": _q_reciprocity,
        "graph_salsa": _q_salsa,
        "graph_node2vec_embed": _q_node2vec_embed,
        "graph_betweenness_sampled": _q_betweenness_sampled,
        "graph_densest": _q_densest,
        "graph_feature_smooth": _q_feature_smooth,
        "graph_attr_assortativity": _q_attr_assortativity,
        "graph_embeddedness": _q_embeddedness,
        "graph_rich_club": _q_rich_club,
        "graph_bipartite": _q_bipartite,
        "graph_k4": _q_k4,
        "graph_trustrank": _q_trustrank,
        "graph_spam_mass": _q_spam_mass,
        "graph_powerlaw": _q_powerlaw,
        "graph_eff_diameter": _q_eff_diameter,
        "graph_hostrank": _q_hostrank,
        "graph_snapshot_diff": _q_snapshot_diff,
        "graph_pagerank_delta": _q_pagerank_delta,
        "graph_opic": _q_opic,
        "graph_crawl_schedule": _q_crawl_schedule,
        "graph_superstep_metrics": _q_superstep_metrics,
        "graph_cocitation": _q_cocitation,
        "graph_bibcoupling": _q_bibcoupling,
        "graph_pagerank_trace": _q_pagerank_trace,
        "graph_comp_sizes": _q_comp_sizes,
        "graph_motifs": _q_motifs,
        "graph_ego2": _q_ego2,
        "graph_diameter": _q_diameter,
        "graph_hitting_time": _q_hitting_time,
        "graph_lpa_seeded": _q_lpa_seeded,
        "graph_landmarks": _q_landmarks,
        "graph_triangle_sampled": _q_triangle_sampled,
        "graph_matching": _q_matching,
        "graph_coarsen": _q_coarsen,
        "graph_partition_stats": _q_partition_stats,
        "graph_heavy_matching": _q_hem,
        "graph_wcc_incremental": _q_wcc_incremental,
        "graph_neighborhood": _q_neighborhood,
        "graph_conductance": _q_conductance,
        "docs_diversity": _q_docs_diversity,
        "events_anomaly": _q_events_anomaly,
        "graph_copurchase": _q_copurchase,
        "graph_msf": _q_msf,
        "graph_coloring": _q_coloring,
        "graph_coreness": _q_coreness,
        "graph_2ecc": _q_2ecc,
        "graph_percolation": _q_percolation,
        "graph_percolation4": _q_percolation4,
        "graph_efficiency": _q_efficiency,
        "docs_token_stats": _q_docs_tokens,
        "docs_language_id": _q_docs_langid,
        "docs_quality": _q_docs_quality,
        "docs_repetition": _q_docs_repetition,
        "docs_top_terms": _q_docs_top_terms,
        "docs_unigram_logprob": _q_docs_unigram_logprob,
        "docs_bigram_logprob": _q_docs_bigram_logprob,
        "docs_dsir": _q_docs_dsir,
        "docs_domain_mix": _q_docs_domain_mix,
        "docs_redact_pii": _q_docs_redact_pii,
        "docs_length_buckets": _q_docs_length_buckets,
        "docs_domain_mix_tokens": _q_docs_domain_mix_tokens,
        "docs_span_dedup": _q_docs_span_dedup,
        "emb_sq_topk": _q_emb_sq_topk,
        "docs_stratified_sample": _q_docs_stratified_sample,
        "docs_split": _q_docs_split,
        "docs_bloom_decontaminate": _q_docs_bloom_decontaminate,
        "docs_curation_funnel": _q_docs_curation_funnel,
        "graph_eccentricity": _q_eccentricity,
        "graph_tred2": _q_tred2,
        "graph_attack_sim": _q_attack_sim,
        "graph_random_failure": _q_random_failure,
        "docs_pack_stats": _q_docs_pack_stats,
        "docs_exact_dedup": _q_docs_exact_dedup,
        "docs_ngram_dedup": _q_docs_ngram_dedup,
        "docs_minhash_dedup": _q_docs_minhash_dedup,
        "docs_lsh_recall": _q_docs_lsh_recall,
        "docs_dedup_clusters": _q_docs_dedup_clusters,
        "docs_simhash": _q_docs_simhash,
        "media_byte_stats": _q_media_byte_stats,
        "emb_cosine_topk": _q_emb_cosine_topk,
        "emb_lsh_buckets": _q_emb_lsh_buckets,
        "emb_near_dup": _q_emb_near_dup,
        "emb_ann_lsh": _q_emb_ann_lsh,
        "emb_ivf_topk": _q_emb_ivf_topk,
        "emb_ivf_trained_topk": _q_emb_ivf_trained_topk,
        "events_props": _q_events_props,
        "events_hourly": _q_events_hourly,
        "events_sessions": _q_events_sessions,
        "events_rollup": _q_events_rollup,
        "events_transitions": _q_events_transitions,
        "graph_triad_census": _q_triad_census,
        "graph_vertex_cut": _q_vertex_cut,
        "graph_temporal_reach": _q_temporal_reach,
        "docs_pmi_graph": _q_docs_pmi_graph,
        "graph_ppr_batch": _q_ppr_batch,
        "graph_pic": _q_pic,
        "docs_containment": _q_docs_containment,
        "graph_label_spread": _q_label_spread,
        "graph_butterflies": _q_butterflies,
        "graph_ari": _q_ari,
        "graph_collective_influence": _q_collective_influence,
        "graph_slashburn": _q_slashburn,
        "graph_newman_vector": _q_newman_vector,
        "graph_harmonic_hll": _q_harmonic_hll,
        "graph_bond_percolation": _q_bond_percolation,
        "docs_cdc_chunks": _q_docs_cdc_chunks,
        "docs_zipf": _q_docs_zipf,
        "graph_sage_sample": _q_sage_sample,
        "emb_mrl_topk": _q_emb_mrl_topk,
        "graph_jdm": _q_jdm,
        "media_phash_recall": _q_media_phash_recall,
        "docs_cdc_shared": _q_docs_cdc_shared,
        "graph_motif_null": _q_motif_null,
        "graph_ppr_push": _q_ppr_push,
        "graph_rmat_profile": _q_rmat_profile,
    }


# ====================================================================
# DuckDB oracles
# ====================================================================
_G = (
    f"e AS MATERIALIZED ({EDGES_SQL}), v AS MATERIALIZED ({VERTICES_SQL}), "
    f"sym AS MATERIALIZED ({SYM_SQL}), both_e AS MATERIALIZED ({BOTH_SQL})"
)

_TOKS = (
    "toks AS MATERIALIZED (SELECT doc_id, list_filter("
    "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l FROM documents)"
)
_TOKPOS = (
    "tokpos AS MATERIALIZED (SELECT doc_id, unnest(l) AS tok, "
    "unnest(generate_series(1, len(l))) AS pos FROM toks)"
)
_SHINGLES = (
    "sh AS MATERIALIZED (SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle "
    "FROM tokpos a JOIN tokpos b ON b.doc_id=a.doc_id AND b.pos=a.pos+1 "
    "JOIN tokpos c ON c.doc_id=a.doc_id AND c.pos=a.pos+2)"
)


def _cascade_sql(mod: int, k: int, rounds: int) -> str:
    """Unrolled threshold-cascade rounds: a{i} = cumulative active set
    after round i (a0 = seeds); a vertex joins a{i+1} when >= k distinct
    in-neighbors are in a{i}. Monotone, so truncating at the same round
    budget as the Spark loop yields the identical set; first-activation
    round = MIN over the per-round membership union."""
    parts = [
        "WITH " + _G + ",",
        f"a0 AS (SELECT id FROM v WHERE id % {mod} = 0),",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"a{i} AS (SELECT id FROM a{i - 1} UNION SELECT dst AS id FROM ("
            f"SELECT e.dst, COUNT(DISTINCT e.src) AS c FROM e "
            f"JOIN a{i - 1} p ON p.id = e.src GROUP BY e.dst) WHERE c >= {k}),"
        )
    members = " UNION ALL ".join(
        f"SELECT id, {i} AS r FROM a{i}" for i in range(rounds + 1)
    )
    parts.append(
        f"m AS ({members}) "
        "SELECT id, CAST(MIN(r) AS BIGINT) AS round FROM m GROUP BY id"
    )
    return "\n".join(parts)


def _kmeans_ctes(k: int, iters: int) -> str:
    """Unrolled Lloyd iterations matching kmeans_assign: c0 = the k
    lowest-id vectors; per iteration assign (argmin squared-L2, ties →
    lowest cid) then recompute centroid means; final assignment against
    the last centroids lands in CTE ``af``. Distances use the same
    left-to-right list_sum fold as the Spark-side F.aggregate."""
    parts = [
        "WITH emb AS MATERIALIZED (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),",
        "pe AS MATERIALIZED (SELECT vec_id, unnest(v) AS x, "
        "unnest(generate_series(1, len(v))) AS pos FROM emb),",
        f"c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, "
        f"v AS cv FROM (SELECT * FROM emb ORDER BY vec_id LIMIT {k})),",
    ]
    dist = (
        "d{i} AS (SELECT e.vec_id, c.cid, list_sum(list_transform("
        "list_zip(e.v, c.cv), p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2 "
        "FROM emb e CROSS JOIN c{j} c),"
    )
    for it in range(1, iters + 1):
        parts.append(dist.format(i=it, j=it - 1))
        parts.append(
            f"a{it} AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
            f"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn "
            f"FROM d{it}) WHERE rn = 1),"
        )
        parts.append(
            f"c{it} AS (SELECT cid, list(mx ORDER BY pos) AS cv FROM "
            f"(SELECT a.cid, pe.pos, AVG(pe.x) AS mx FROM a{it} a "
            f"JOIN pe USING(vec_id) GROUP BY 1, 2) GROUP BY cid),"
        )
    fin = iters + 1
    parts.append(dist.format(i=fin, j=iters))
    parts.append(
        f"af AS (SELECT vec_id, cid, d2 FROM "
        f"(SELECT vec_id, cid, d2, ROW_NUMBER() OVER (PARTITION BY vec_id "
        f"ORDER BY d2, cid) AS rn FROM d{fin}) WHERE rn = 1)"
    )
    return "\n".join(parts)


def _kmeans_sql(k: int, iters: int) -> str:
    return _kmeans_ctes(k, iters) + "\nSELECT vec_id, cid AS cluster, ROUND(d2, 6) AS d2 FROM af"


def _ivfpq_sql(
    n_centroids: int, probe: int, m: int, d: int, k: int, iters: int,
    qmax: int, topk: int,
) -> str:
    """IVF-PQ oracle: the coarse stage reuses ``_kmeans_ctes``
    verbatim (c{iters} = coarse centroids, af = inverted-list
    assignment), then residuals, per-subspace PQ codebooks over the
    residuals, probe of the `probe` nearest cells, per-(query, cell)
    residual LUT, and ADC restricted to probed lists by the bucket key."""
    parts = [_kmeans_ctes(n_centroids, iters) + ","]
    parts.append(
        f"resid AS MATERIALIZED (SELECT e.vec_id, a.cid AS bucket, "
        f"list_transform(list_zip(e.v, c.cv), pr -> pr[1]-pr[2]) AS rv "
        f"FROM emb e JOIN af a USING (vec_id) JOIN c{iters} c ON c.cid = a.cid),"
    )
    rdist = (
        "rd{i}_{s} AS (SELECT e.vec_id, c.cid, list_sum(list_transform("
        "list_zip(e.v, c.cv), pr -> (pr[1]-pr[2])*(pr[1]-pr[2]))) AS d2 "
        "FROM rsub{s} e CROSS JOIN rc{j}_{s} c),"
    )
    for s in range(m):
        lo, hi = s * d + 1, (s + 1) * d
        parts.append(
            f"rsub{s} AS MATERIALIZED (SELECT vec_id, rv[{lo}:{hi}] AS v FROM resid),"
        )
        parts.append(
            f"rpe{s} AS MATERIALIZED (SELECT vec_id, unnest(v) AS x, "
            f"unnest(generate_series(1, len(v))) AS pos FROM rsub{s}),"
        )
        parts.append(
            f"rc0_{s} AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, "
            f"v AS cv FROM (SELECT * FROM rsub{s} ORDER BY vec_id LIMIT {k})),"
        )
        for it in range(1, iters + 1):
            parts.append(rdist.format(i=it, j=it - 1, s=s))
            parts.append(
                f"ra{it}_{s} AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
                f"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn "
                f"FROM rd{it}_{s}) WHERE rn = 1),"
            )
            parts.append(
                f"rc{it}_{s} AS (SELECT cid, list(mx ORDER BY pos) AS cv FROM "
                f"(SELECT a.cid, pe.pos, AVG(pe.x) AS mx FROM ra{it}_{s} a "
                f"JOIN rpe{s} pe USING(vec_id) GROUP BY 1, 2) GROUP BY cid),"
            )
        fin = iters + 1
        parts.append(rdist.format(i=fin, j=iters, s=s))
        parts.append(
            f"raf{s} AS (SELECT vec_id, cid FROM "
            f"(SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"ORDER BY d2, cid) AS rn FROM rd{fin}_{s}) WHERE rn = 1),"
        )
    parts.append(
        "codes AS MATERIALIZED (SELECT r.vec_id, r.bucket, u.s, u.cid FROM ("
        + " UNION ALL ".join(
            f"SELECT vec_id, {s} AS s, cid FROM raf{s}" for s in range(m)
        )
        + ") u JOIN resid r USING (vec_id)),"
    )
    parts.append(
        f"qs AS (SELECT vec_id AS query_id, v FROM emb WHERE vec_id < {qmax}),"
    )
    parts.append(
        f"qcd AS (SELECT q.query_id, c.cid AS bucket, list_sum(list_transform("
        f"list_zip(q.v, c.cv), pr -> (pr[1]-pr[2])*(pr[1]-pr[2]))) AS d2 "
        f"FROM qs q CROSS JOIN c{iters} c),"
    )
    parts.append(
        f"probed AS (SELECT query_id, bucket FROM (SELECT query_id, bucket, "
        f"ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, bucket) AS rn "
        f"FROM qcd) WHERE rn <= {probe}),"
    )
    parts.append(
        f"qres AS MATERIALIZED (SELECT p.query_id, p.bucket, "
        f"list_transform(list_zip(q.v, c.cv), pr -> pr[1]-pr[2]) AS rv "
        f"FROM probed p JOIN qs q USING (query_id) JOIN c{iters} c ON c.cid = p.bucket),"
    )
    luts = []
    for s in range(m):
        lo, hi = s * d + 1, (s + 1) * d
        luts.append(
            f"SELECT r.query_id, r.bucket, {s} AS s, c.cid, "
            f"list_sum(list_transform(list_zip(r.rv[{lo}:{hi}], c.cv), "
            f"pr -> (pr[1]-pr[2])*(pr[1]-pr[2]))) AS qd2 "
            f"FROM qres r CROSS JOIN rc{iters}_{s} c"
        )
    parts.append("lut AS MATERIALIZED (" + " UNION ALL ".join(luts) + "),")
    parts.append(
        "adc AS (SELECT l.query_id, cd.vec_id, "
        "list_sum(list(l.qd2 ORDER BY l.s)) AS adc "
        "FROM codes cd JOIN lut l ON l.bucket = cd.bucket AND l.s = cd.s "
        "AND l.cid = cd.cid GROUP BY 1, 2)"
    )
    return "\n".join(parts) + (
        f"\nSELECT query_id, vec_id, ROUND(adc, 6) AS adc, CAST(rn AS INT) AS rank "
        f"FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        f"ORDER BY adc, vec_id) AS rn FROM adc WHERE vec_id <> query_id) "
        f"WHERE rn <= {topk}"
    )


def _pq_sql(m: int, d: int, k: int, iters: int, qmax: int, topk: int) -> str:
    """Product-quantization oracle: per-subspace unrolled Lloyd (same
    recurrence as ``_kmeans_ctes`` on sliced vectors), codes = final
    argmin per subspace, ADC = per-query centroid distances summed in
    subspace order (list(qd2 ORDER BY s) → list_sum matches the Spark
    side's subspace-ordered fold bit for bit)."""
    parts = [
        "WITH emb AS MATERIALIZED (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),",
    ]
    dist = (
        "d{i}_{s} AS (SELECT e.vec_id, c.cid, list_sum(list_transform("
        "list_zip(e.v, c.cv), p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2 "
        "FROM sub{s} e CROSS JOIN c{j}_{s} c),"
    )
    for s in range(m):
        lo, hi = s * d + 1, (s + 1) * d
        parts.append(
            f"sub{s} AS MATERIALIZED (SELECT vec_id, v[{lo}:{hi}] AS v FROM emb),"
        )
        parts.append(
            f"pe{s} AS MATERIALIZED (SELECT vec_id, unnest(v) AS x, "
            f"unnest(generate_series(1, len(v))) AS pos FROM sub{s}),"
        )
        parts.append(
            f"c0_{s} AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, "
            f"v AS cv FROM (SELECT * FROM sub{s} ORDER BY vec_id LIMIT {k})),"
        )
        for it in range(1, iters + 1):
            parts.append(dist.format(i=it, j=it - 1, s=s))
            parts.append(
                f"a{it}_{s} AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
                f"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn "
                f"FROM d{it}_{s}) WHERE rn = 1),"
            )
            parts.append(
                f"c{it}_{s} AS (SELECT cid, list(mx ORDER BY pos) AS cv FROM "
                f"(SELECT a.cid, pe.pos, AVG(pe.x) AS mx FROM a{it}_{s} a "
                f"JOIN pe{s} pe USING(vec_id) GROUP BY 1, 2) GROUP BY cid),"
            )
        fin = iters + 1
        parts.append(dist.format(i=fin, j=iters, s=s))
        parts.append(
            f"af{s} AS (SELECT vec_id, cid FROM "
            f"(SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"ORDER BY d2, cid) AS rn FROM d{fin}_{s}) WHERE rn = 1),"
        )
    parts.append(
        "codes AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT vec_id, {s} AS s, cid FROM af{s}" for s in range(m)
        )
        + "),"
    )
    parts.append(
        f"qs AS (SELECT vec_id AS query_id, v FROM emb WHERE vec_id < {qmax}),"
    )
    luts = []
    for s in range(m):
        lo, hi = s * d + 1, (s + 1) * d
        luts.append(
            f"SELECT q.query_id, {s} AS s, c.cid, list_sum(list_transform("
            f"list_zip(q.v[{lo}:{hi}], c.cv), p -> (p[1]-p[2])*(p[1]-p[2]))) AS qd2 "
            f"FROM qs q CROSS JOIN c{iters}_{s} c"
        )
    parts.append("lut AS MATERIALIZED (" + " UNION ALL ".join(luts) + "),")
    parts.append(
        "adc AS (SELECT l.query_id, cd.vec_id, "
        "list_sum(list(l.qd2 ORDER BY l.s)) AS adc "
        "FROM codes cd JOIN lut l ON l.s = cd.s AND l.cid = cd.cid "
        "GROUP BY 1, 2)"
    )
    return "\n".join(parts) + (
        f"\nSELECT query_id, vec_id, ROUND(adc, 6) AS adc, CAST(rn AS INT) AS rank "
        f"FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        f"ORDER BY adc, vec_id) AS rn FROM adc WHERE vec_id <> query_id) "
        f"WHERE rn <= {topk}"
    )


def _semantic_dedup_sql(k: int, iters: int, tau: float) -> str:
    """SemDeDup oracle: k-means CTEs (shared with emb_kmeans) + a
    within-cluster lower-id cosine check, mirroring semantic_dedup."""
    return (
        _kmeans_ctes(k, iters)
        + f""",
e2 AS (SELECT af.vec_id, af.cid, emb.v FROM af JOIN emb USING(vec_id)),
p AS (SELECT hi.vec_id, COUNT(*) AS n FROM e2 hi JOIN e2 lo
        ON lo.cid = hi.cid AND lo.vec_id < hi.vec_id
      WHERE list_cosine_similarity(hi.v, lo.v) >= {tau} GROUP BY 1)
SELECT e2.vec_id, e2.cid AS cluster,
       CASE WHEN p.vec_id IS NULL THEN 1 ELSE 0 END AS keep,
       COALESCE(p.n, 0) AS n_lower_dups
FROM e2 LEFT JOIN p USING(vec_id)"""
    )


def _pagerank_sql(iters: int, damping: float = 0.85, weighted: bool = False) -> str:
    """One unrolled PageRank recurrence for both modes. ``weighted``
    switches to the Vermeer weighted shape (pagerank.go:144-158):
    contribution = rank/outdeg · w per in-edge; outdeg stays a COUNT,
    dangling term unweighted — the exact reference shape."""
    parts = [f"WITH {_G},"]
    if weighted:
        parts.append(
            "we AS MATERIALIZED (SELECT src, dst, "
            "CAST((src + dst) % 5 + 1 AS DOUBLE) AS w FROM e),"
        )
    edge_tbl, contrib = ("we", "p.rank/d.outdeg*we.w") if weighted else ("e", "p.rank/d.outdeg")
    parts += [
        "deg AS (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY 1),",
        "nn AS (SELECT COUNT(*)::DOUBLE AS n FROM v),",
        "pr0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM v),",
    ]
    for k in range(1, iters + 1):
        p = f"pr{k-1}"
        parts.append(
            f"m{k} AS MATERIALIZED (SELECT {edge_tbl}.dst AS id, SUM({contrib}) AS s FROM {p} p "
            f"JOIN deg d ON d.id=p.id JOIN {edge_tbl} ON {edge_tbl}.src=p.id GROUP BY 1),"
        )
        parts.append(
            f"dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.rank),0) AS dm FROM {p} p "
            f"LEFT JOIN deg d ON d.id=p.id WHERE d.id IS NULL),"
        )
        parts.append(
            f"pr{k} AS MATERIALIZED (SELECT v.id, (1.0-{damping})/(SELECT n FROM nn) + "
            f"{damping}*(COALESCE(m.s,0.0) + (SELECT dm FROM dang{k})/(SELECT n FROM nn)) AS rank "
            f"FROM v LEFT JOIN m{k} m ON m.id=v.id),"
        )
    parts.append(f"fin AS (SELECT id, ROUND(rank,6) AS rank FROM pr{iters})")
    return "\n".join(parts) + "\nSELECT id, rank FROM fin"


def _pagerank_weighted_sql(iters: int, damping: float = 0.85) -> str:
    return _pagerank_sql(iters, damping, weighted=True)


def _opic_sql(iters: int) -> str:
    """Unrolled OPIC cash/history recurrence (operators/opic.py):
    H_k = H_{k-1} + C_{k-1}; C_k = Σ_in C_{k-1}/outdeg + dangling/n;
    importance = (H_T + C_T)/(T+1)."""
    parts = [
        f"WITH {_G},",
        "deg AS (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY 1),",
        "nn AS (SELECT COUNT(*)::DOUBLE AS n FROM v),",
        "s0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nn) AS cash, 0.0 AS hist FROM v),",
    ]
    for k in range(1, iters + 1):
        p = f"s{k-1}"
        parts.append(
            f"m{k} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.cash/d.outdeg) AS s FROM {p} p "
            f"JOIN deg d ON d.id=p.id JOIN e ON e.src=p.id GROUP BY 1),"
        )
        parts.append(
            f"dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.cash),0) AS dm FROM {p} p "
            f"LEFT JOIN deg d ON d.id=p.id WHERE d.id IS NULL),"
        )
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT v.id, "
            f"COALESCE(m.s,0.0) + (SELECT dm FROM dang{k})/(SELECT n FROM nn) AS cash, "
            f"p.hist + p.cash AS hist "
            f"FROM v LEFT JOIN m{k} m ON m.id=v.id JOIN {p} p ON p.id=v.id),"
        )
    parts.append(
        f"fin AS (SELECT id, ROUND((hist+cash)/{float(iters + 1)}, 6) AS opic FROM s{iters})"
    )
    return "\n".join(parts) + "\nSELECT id, opic FROM fin"


def _pagerank_delta_sql(base_iters: int, cont_iters: int, damping: float = 0.85) -> str:
    """Two-phase unrolled classic-PR recurrence: ``base_iters`` cold
    iterations over the old-crawl edge set, then ``cont_iters`` more
    over the new edge set warm-started from the old ranks (delta-new
    vertices seeded at 1/n_new) — exactly what _q_pagerank_delta runs."""
    old_e = (
        f"SELECT DISTINCT o_custkey AS src, o_orderkey % {DST_MOD} AS dst FROM orders "
        f"WHERE o_custkey <> o_orderkey % {DST_MOD} AND o_orderkey % 10 < {SNAP_OLD_MOD_LT}"
    )
    new_e = (
        f"SELECT DISTINCT o_custkey AS src, o_orderkey % {DST_MOD} AS dst FROM orders "
        f"WHERE o_custkey <> o_orderkey % {DST_MOD} AND o_orderkey % 10 >= {SNAP_NEW_MOD_GE}"
    )
    parts = [
        f"WITH oe AS MATERIALIZED ({old_e}),",
        f"ne AS MATERIALIZED ({new_e}),",
        "ov AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM oe UNION ALL SELECT dst FROM oe)),",
        "nv AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM ne UNION ALL SELECT dst FROM ne)),",
        "odeg AS (SELECT src AS id, COUNT(*) AS outdeg FROM oe GROUP BY 1),",
        "ndeg AS (SELECT src AS id, COUNT(*) AS outdeg FROM ne GROUP BY 1),",
        "onn AS (SELECT COUNT(*)::DOUBLE AS n FROM ov),",
        "nnn AS (SELECT COUNT(*)::DOUBLE AS n FROM nv),",
        "a0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM onn) AS rank FROM ov),",
    ]
    for k in range(1, base_iters + 1):
        p = f"a{k-1}"
        parts += [
            f"am{k} AS MATERIALIZED (SELECT oe.dst AS id, SUM(p.rank/d.outdeg) AS s "
            f"FROM {p} p JOIN odeg d ON d.id=p.id JOIN oe ON oe.src=p.id GROUP BY 1),",
            f"ad{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.rank),0) AS dm FROM {p} p "
            f"LEFT JOIN odeg d ON d.id=p.id WHERE d.id IS NULL),",
            f"a{k} AS MATERIALIZED (SELECT ov.id, (1.0-{damping})/(SELECT n FROM onn) + "
            f"{damping}*(COALESCE(m.s,0.0) + (SELECT dm FROM ad{k})/(SELECT n FROM onn)) AS rank "
            f"FROM ov LEFT JOIN am{k} m ON m.id=ov.id),",
        ]
    parts.append(
        f"b0 AS MATERIALIZED (SELECT nv.id, COALESCE(a.rank, 1.0/(SELECT n FROM nnn)) AS rank "
        f"FROM nv LEFT JOIN a{base_iters} a ON a.id=nv.id),"
    )
    for k in range(1, cont_iters + 1):
        p = f"b{k-1}"
        parts += [
            f"bm{k} AS MATERIALIZED (SELECT ne.dst AS id, SUM(p.rank/d.outdeg) AS s "
            f"FROM {p} p JOIN ndeg d ON d.id=p.id JOIN ne ON ne.src=p.id GROUP BY 1),",
            f"bd{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.rank),0) AS dm FROM {p} p "
            f"LEFT JOIN ndeg d ON d.id=p.id WHERE d.id IS NULL),",
            f"b{k} AS MATERIALIZED (SELECT nv.id, (1.0-{damping})/(SELECT n FROM nnn) + "
            f"{damping}*(COALESCE(m.s,0.0) + (SELECT dm FROM bd{k})/(SELECT n FROM nnn)) AS rank "
            f"FROM nv LEFT JOIN bm{k} m ON m.id=nv.id),",
        ]
    parts.append(f"fin AS (SELECT id, ROUND(rank,6) AS rank FROM b{cont_iters})")
    return "\n".join(parts) + "\nSELECT id, rank FROM fin"


def _pagerank_trace_sql(iters: int, damping: float = 0.85) -> str:
    """Per-iteration aggregator values of the same unrolled classic-PR
    recurrence _pagerank_sql builds: l1 = Σ|pr_k − pr_{k−1}|, dangling
    mass, cumulative rank — computed on the post-update state, exactly
    what BspEngine's aggregator pass reads."""
    parts = [
        f"WITH {_G},",
        "deg AS (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY 1),",
        "nn AS (SELECT COUNT(*)::DOUBLE AS n FROM v),",
        "pr0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM v),",
    ]
    for k in range(1, iters + 1):
        p = f"pr{k-1}"
        parts += [
            f"m{k} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.rank/d.outdeg) AS s FROM {p} p "
            f"JOIN deg d ON d.id=p.id JOIN e ON e.src=p.id GROUP BY 1),",
            f"dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.rank),0) AS dm FROM {p} p "
            f"LEFT JOIN deg d ON d.id=p.id WHERE d.id IS NULL),",
            f"pr{k} AS MATERIALIZED (SELECT v.id, (1.0-{damping})/(SELECT n FROM nn) + "
            f"{damping}*(COALESCE(m.s,0.0) + (SELECT dm FROM dang{k})/(SELECT n FROM nn)) AS rank "
            f"FROM v LEFT JOIN m{k} m ON m.id=v.id),",
        ]
    step_rows = " UNION ALL ".join(
        f"SELECT {k} AS superstep, "
        f"(SELECT SUM(ABS(a.rank - b.rank)) FROM pr{k} a JOIN pr{k-1} b USING(id)) AS l1, "
        f"(SELECT COALESCE(SUM(a.rank),0) FROM pr{k} a LEFT JOIN deg d ON d.id=a.id "
        f"WHERE d.id IS NULL) AS dangling, "
        f"(SELECT SUM(rank) FROM pr{k}) AS cum"
        for k in range(1, iters + 1)
    )
    parts.append(f"steps AS ({step_rows})")
    return "\n".join(parts) + (
        "\nSELECT CAST(superstep AS INTEGER) AS superstep, ROUND(l1,6) AS l1, "
        "ROUND(dangling,6) AS dangling, ROUND(cum,6) AS cum FROM steps"
    )


def _superstep_metrics_sql(steps: int) -> str:
    """Unrolled WCC counter trace: per step k, messages_sent = distinct
    destinations messaged by the active frontier (the post-combine inbox
    size BspEngine counts) and active_vertices = labels that shrank;
    rows stop at the reference termination rule (first step with no
    messages AND no active vertices is the last row — the NOT EXISTS
    replays the engine's break-after-append)."""
    parts = [
        f"WITH {_G},",
        "c0 AS MATERIALIZED (SELECT id, id AS comp, TRUE AS act FROM v),",
    ]
    for k in range(1, steps + 1):
        p = f"c{k-1}"
        parts += [
            f"mm{k} AS MATERIALIZED (SELECT s.dst AS id, MIN(p.comp) AS msg FROM {p} p "
            f"JOIN sym s ON s.src = p.id WHERE p.act GROUP BY 1),",
            f"c{k} AS MATERIALIZED (SELECT p.id, "
            f"LEAST(p.comp, COALESCE(m.msg, p.comp)) AS comp, "
            f"LEAST(p.comp, COALESCE(m.msg, p.comp)) < p.comp AS act "
            f"FROM {p} p LEFT JOIN mm{k} m ON m.id = p.id),",
        ]
    step_rows = " UNION ALL ".join(
        f"SELECT {k} AS superstep, (SELECT COUNT(*) FROM mm{k}) AS messages_sent, "
        f"(SELECT COUNT(*) FROM c{k} WHERE act) AS active_vertices"
        for k in range(1, steps + 1)
    )
    parts.append(f"steps AS ({step_rows})")
    return "\n".join(parts) + (
        "\nSELECT CAST(s.superstep AS INTEGER) AS superstep, s.messages_sent, "
        "s.active_vertices FROM steps s WHERE NOT EXISTS "
        "(SELECT 1 FROM steps t WHERE t.superstep < s.superstep "
        "AND t.active_vertices = 0 AND t.messages_sent = 0)"
    )


def _ppr_ctes(iters: int, source: int, damping: float = 0.85) -> list[str]:
    """The unrolled-PPR CTE chain ending at ``p{iters}`` (id, rank) —
    shared by the plain PPR oracle and the sweep-cut oracle."""
    parts = [
        f"WITH {_G},",
        "deg AS (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY 1),",
        f"p0 AS MATERIALIZED (SELECT id, CASE WHEN id={source} THEN 1.0 ELSE 0.0 END AS rank FROM v),",
    ]
    for k in range(1, iters + 1):
        p = f"p{k-1}"
        parts.append(
            f"m{k} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.rank/d.outdeg) AS s FROM {p} p "
            f"JOIN deg d ON d.id=p.id JOIN e ON e.src=p.id GROUP BY 1),"
        )
        parts.append(
            f"dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.rank),0) AS dm FROM {p} p "
            f"LEFT JOIN deg d ON d.id=p.id WHERE d.id IS NULL),"
        )
        parts.append(
            f"p{k} AS MATERIALIZED (SELECT v.id, (1.0-{damping})*(CASE WHEN v.id={source} THEN 1.0 ELSE 0.0 END) + "
            f"{damping}*(COALESCE(m.s,0.0) + (SELECT dm FROM dang{k})*"
            f"(CASE WHEN v.id={source} THEN 1.0 ELSE 0.0 END)) AS rank "
            f"FROM v LEFT JOIN m{k} m ON m.id=v.id),"
        )
    return parts


def _ppr_sql(iters: int, source: int, damping: float = 0.85) -> str:
    parts = _ppr_ctes(iters, source, damping)
    parts.append(f"fin AS (SELECT id, ROUND(rank,6) AS rank FROM p{iters})")
    return "\n".join(parts) + "\nSELECT id, rank FROM fin"


def _ppr_sweep_sql(
    iters: int, source: int, sweep_max: int, damping: float = 0.85
) -> str:
    """ACL sweep-cut oracle: unrolled PPR, degree-normalized sweep
    ordering (ROUND(rank,6)/deg DESC, id), incremental cut/vol windows.
    cut and vol are integers so phi is one identical double division."""
    parts = _ppr_ctes(iters, source, damping)
    parts.append("sdeg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY 1),")
    parts.append("tot AS (SELECT COUNT(*) AS vt FROM sym),")
    parts.append(
        f"cand AS (SELECT p.id, ROUND(p.rank,6)/d.deg AS score, d.deg "
        f"FROM p{iters} p JOIN sdeg d ON d.id=p.id WHERE p.rank > 0),"
    )
    parts.append(
        f"sweep AS (SELECT id, deg, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS pos "
        f"FROM (SELECT * FROM cand ORDER BY score DESC, id LIMIT {sweep_max})),"
    )
    parts.append(
        "intr AS (SELECT s1.pos AS pos, COUNT(*) AS internal FROM sym e "
        "JOIN sweep s1 ON e.src=s1.id JOIN sweep s2 ON e.dst=s2.id "
        "WHERE s2.pos < s1.pos GROUP BY 1),"
    )
    parts.append(
        "curve AS (SELECT s.pos, s.id, SUM(s.deg) OVER (ORDER BY s.pos) AS vol, "
        "SUM(s.deg - 2*COALESCE(i.internal, 0)) OVER (ORDER BY s.pos) AS cut "
        "FROM sweep s LEFT JOIN intr i ON i.pos = s.pos)"
    )
    return "\n".join(parts) + (
        "\nSELECT pos, id, ROUND(CASE WHEN LEAST(vol, (SELECT vt FROM tot) - vol) > 0 "
        "THEN CAST(cut AS DOUBLE) / CAST(LEAST(vol, (SELECT vt FROM tot) - vol) AS DOUBLE) "
        "END, 6) AS phi FROM curve"
    )


def _hits_sql(iters: int) -> str:
    """Unrolled sum-normalized HITS matching operators/hits.py: per
    iteration auth = in-sum of prev hub then sum-normalize, hub =
    out-sum of the NEW auth then sum-normalize (zero-total guard)."""
    parts = [
        f"WITH {_G},",
        "h0 AS MATERIALIZED (SELECT id, 1.0 AS hub FROM v),",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"ar{k} AS MATERIALIZED (SELECT v.id, COALESCE(s.s, 0.0) AS r FROM v "
            f"LEFT JOIN (SELECT e.dst AS id, SUM(h.hub) AS s FROM h{k-1} h "
            f"JOIN e ON e.src = h.id GROUP BY 1) s ON s.id = v.id),"
        )
        parts.append(
            f"at{k} AS (SELECT CASE WHEN SUM(r) = 0 THEN 1.0 ELSE SUM(r) END AS t FROM ar{k}),"
        )
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT id, r / (SELECT t FROM at{k}) AS auth FROM ar{k}),"
        )
        parts.append(
            f"hr{k} AS MATERIALIZED (SELECT v.id, COALESCE(s.s, 0.0) AS r FROM v "
            f"LEFT JOIN (SELECT e.src AS id, SUM(a.auth) AS s FROM a{k} a "
            f"JOIN e ON e.dst = a.id GROUP BY 1) s ON s.id = v.id),"
        )
        parts.append(
            f"ht{k} AS (SELECT CASE WHEN SUM(r) = 0 THEN 1.0 ELSE SUM(r) END AS t FROM hr{k}),"
        )
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT id, r / (SELECT t FROM ht{k}) AS hub FROM hr{k}),"
        )
    parts.append(
        f"fin AS (SELECT a.id, ROUND(a.auth, 6) AS auth, ROUND(h.hub, 6) AS hub "
        f"FROM a{iters} a JOIN h{iters} h ON h.id = a.id)"
    )
    return "\n".join(parts) + "\nSELECT id, auth, hub FROM fin"


def _salsa_sql(iters: int) -> str:
    """Unrolled sum-normalized SALSA matching operators/salsa.py: the
    HITS recurrence with each contribution divided by the sender's
    out-degree (auth pass) / the receiver-side in-degree (hub pass)."""
    parts = [
        f"WITH {_G},",
        "od AS MATERIALIZED (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY 1),",
        "idg AS MATERIALIZED (SELECT dst AS id, COUNT(*) AS d FROM e GROUP BY 1),",
        "h0 AS MATERIALIZED (SELECT id, 1.0 AS hub FROM v),",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"ar{k} AS MATERIALIZED (SELECT v.id, COALESCE(s.s, 0.0) AS r FROM v "
            f"LEFT JOIN (SELECT e.dst AS id, SUM(h.hub / od.d) AS s FROM h{k-1} h "
            f"JOIN e ON e.src = h.id JOIN od ON od.id = e.src GROUP BY 1) s "
            f"ON s.id = v.id),"
        )
        parts.append(
            f"at{k} AS (SELECT CASE WHEN SUM(r) = 0 THEN 1.0 ELSE SUM(r) END AS t FROM ar{k}),"
        )
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT id, r / (SELECT t FROM at{k}) AS auth FROM ar{k}),"
        )
        parts.append(
            f"hr{k} AS MATERIALIZED (SELECT v.id, COALESCE(s.s, 0.0) AS r FROM v "
            f"LEFT JOIN (SELECT e.src AS id, SUM(a.auth / idg.d) AS s FROM a{k} a "
            f"JOIN e ON e.dst = a.id JOIN idg ON idg.id = e.dst GROUP BY 1) s "
            f"ON s.id = v.id),"
        )
        parts.append(
            f"ht{k} AS (SELECT CASE WHEN SUM(r) = 0 THEN 1.0 ELSE SUM(r) END AS t FROM hr{k}),"
        )
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT id, r / (SELECT t FROM ht{k}) AS hub FROM hr{k}),"
        )
    parts.append(
        f"fin AS (SELECT a.id, ROUND(a.auth, 6) AS auth, ROUND(h.hub, 6) AS hub "
        f"FROM a{iters} a JOIN h{iters} h ON h.id = a.id)"
    )
    return "\n".join(parts) + "\nSELECT id, auth, hub FROM fin"


def _wl_sql(rounds: int) -> str:
    """Unrolled 1-WL refinement matching operators/wl.py: c0 =
    md5(degree), c_{t+1} = md5(c_t || '|' || sorted neighbor colors
    joined by ',') — string-exact on both engines (md5 hex is
    lowercase everywhere; hex strings sort identically under binary
    collation)."""
    parts = [
        f"WITH {_G},",
        "wdeg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY src),",
        "wc0 AS MATERIALIZED (SELECT v.id, md5(COALESCE(wdeg.d, 0)::VARCHAR) AS c "
        "FROM v LEFT JOIN wdeg USING(id)),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"wn{r} AS (SELECT e.src AS id, string_agg(p.c, ',' ORDER BY p.c) AS ns "
            f"FROM sym e JOIN wc{r-1} p ON p.id = e.dst GROUP BY e.src),"
        )
        parts.append(
            f"wc{r} AS MATERIALIZED (SELECT c.id, "
            f"md5(c.c || '|' || COALESCE(n.ns, '')) AS c "
            f"FROM wc{r-1} c LEFT JOIN wn{r} n USING(id)),"
        )
    parts.append(f"fin AS (SELECT id, c AS wl_color FROM wc{rounds})")
    return "\n".join(parts) + "\nSELECT id, wl_color FROM fin"


def _fastrp_sql(dim: int, iters: int, seed: int, weights: tuple) -> str:
    """Unrolled exact-integer FastRP matching
    operators/embeddings.py:fastrp_embed — md5-seeded sparse signs,
    SUM-aggregated propagation, integer iteration weights; every value
    is an int64 on both engines."""
    parts = [
        f"WITH {_G},",
        f"dims AS (SELECT unnest(generate_series(0, {dim - 1})) AS d),",
        f"f0 AS MATERIALIZED (SELECT v.id, dims.d, CAST(CASE "
        f"(('0x' || substr(md5(v.id::VARCHAR || ':' || dims.d::VARCHAR || "
        f"':{seed}'), 1, 8))::BIGINT % 6) "
        f"WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS BIGINT) AS x "
        f"FROM v, dims),",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"f{t} AS MATERIALIZED (SELECT b.id, b.d, "
            f"CAST(COALESCE(a.sx, 0) AS BIGINT) AS x FROM "
            f"(SELECT id, d FROM f0) b LEFT JOIN "
            f"(SELECT e.src AS id, s.d, SUM(s.x) AS sx FROM sym e "
            f"JOIN f{t-1} s ON s.id = e.dst GROUP BY e.src, s.d) a "
            f"USING (id, d)),"
        )
    terms = " + ".join(
        f"f{t}.x * {int(weights[t - 1])}" for t in range(1, iters + 1)
    )
    joins = " ".join(f"JOIN f{t} USING (id, d)" for t in range(2, iters + 1))
    parts.append(
        f"fin AS (SELECT f1.id, f1.d, CAST({terms} AS BIGINT) AS f "
        f"FROM f1 {joins})"
    )
    return "\n".join(parts) + "\nSELECT id, d, f FROM fin"


def _rmat_sql(
    n_edges: int, levels: int, seed: int, a: float, b: float, c: float
) -> str:
    """Unrolled R-MAT matching sources/generators.py:rmat_edges —
    integer-threshold quadrant draws, zero floats."""
    ta, tb, tc = int(a * 2**32), int((a + b) * 2**32), int((a + b + c) * 2**32)

    def u(lvl):
        return (
            f"('0x' || substr(md5(edge_id::VARCHAR || ':{lvl}:{seed}'), 1, 8))"
            f"::BIGINT"
        )

    sbits = ", ".join(
        f"CASE WHEN {u(k)} < {tb} THEN 0 ELSE 1 END AS s{k}"
        for k in range(levels)
    )
    dbits = ", ".join(
        f"CASE WHEN {u(k)} < {ta} THEN 0 WHEN {u(k)} < {tb} THEN 1 "
        f"WHEN {u(k)} < {tc} THEN 0 ELSE 1 END AS d{k}"
        for k in range(levels)
    )
    src = " + ".join(f"s{k} * {2 ** (levels - 1 - k)}" for k in range(levels))
    return f"""
WITH rg AS (SELECT unnest(generate_series(0, {n_edges - 1})) AS edge_id),
rb AS MATERIALIZED (SELECT edge_id, {sbits}, {dbits} FROM rg),
re AS (SELECT edge_id, CAST({src} AS BIGINT) AS src FROM rb),
rdeg AS (SELECT src, COUNT(*) AS out_degree FROM re GROUP BY 1)
SELECT CAST(out_degree AS BIGINT) AS out_degree,
       CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM rdeg GROUP BY 1
"""


def _ppr_push_sql(
    source: int, eps: float, rounds: int, alpha: float = 0.15
) -> str:
    """Unrolled synchronous forward-push PPR matching
    operators/ppr.py:ppr_push — round-9 threshold, dangling mass to
    source; alpha/beta literals embedded via repr() so both engines
    parse the identical doubles."""
    a, b, ep = repr(alpha), repr(1.0 - alpha), repr(eps)
    parts = [
        f"WITH {_G},",
        "ppdeg AS (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY 1),",
        f"pq0 AS (SELECT CAST({source} AS BIGINT) AS id, 0.0 AS p, 1.0 AS r),",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"pst{k} AS MATERIALIZED (SELECT s.id, s.p, s.r, d.outdeg "
            f"FROM pq{k-1} s LEFT JOIN ppdeg d USING (id)),"
        )
        parts.append(
            f"ph{k} AS MATERIALIZED (SELECT * FROM pst{k} "
            f"WHERE ROUND(r, 9) > {ep} * COALESCE(outdeg, 1)),"
        )
        parts.append(
            f"pk{k} AS (SELECT id, p, r FROM pst{k} "
            f"WHERE NOT (ROUND(r, 9) > {ep} * COALESCE(outdeg, 1))),"
        )
        parts.append(f"pu{k} AS (SELECT id, p + {a} * r AS p2 FROM ph{k}),")
        parts.append(
            f"pf{k} AS (SELECT e.dst AS id, SUM({b} * h.r / h.outdeg) AS dr "
            f"FROM ph{k} h JOIN e ON e.src = h.id "
            f"WHERE h.outdeg IS NOT NULL GROUP BY 1),"
        )
        parts.append(
            f"pd{k} AS (SELECT COALESCE(SUM({b} * r), 0.0) AS ddr "
            f"FROM ph{k} WHERE outdeg IS NULL),"
        )
        parts.append(
            f"psup{k} AS (SELECT id FROM pk{k} UNION SELECT id FROM pu{k} "
            f"UNION SELECT id FROM pf{k} "
            f"UNION SELECT CAST({source} AS BIGINT)),"
        )
        parts.append(
            f"pq{k} AS MATERIALIZED (SELECT u.id, "
            f"COALESCE(k.p, 0.0) + COALESCE(q.p2, 0.0) AS p, "
            f"COALESCE(k.r, 0.0) + COALESCE(f.dr, 0.0) + "
            f"CASE WHEN u.id = {source} THEN (SELECT ddr FROM pd{k}) "
            f"ELSE 0.0 END AS r "
            f"FROM psup{k} u LEFT JOIN pk{k} k USING (id) "
            f"LEFT JOIN pu{k} q USING (id) LEFT JOIN pf{k} f USING (id)),"
        )
    parts.append(
        f"fin AS (SELECT id, ROUND(p, 6) AS p, ROUND(r, 6) AS r "
        f"FROM pq{rounds}) "
    )
    return (
        "\n".join(parts)
        + "\nSELECT id, p, r FROM fin WHERE p > 0 OR r > 0"
    )


def _ppr_batch_sql(iters: int, seed_max: int, damping: float = 0.85) -> str:
    """Unrolled batched multi-source PPR matching operators/ppr.py:
    ppr_batch — sparse (seed, id) state, per-seed dangling return,
    identical recurrence to _ppr_ctes per seed."""
    parts = [
        f"WITH {_G},",
        f"seeds AS MATERIALIZED (SELECT id AS seed FROM v WHERE id <= {seed_max}),",
        "deg AS (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY 1),",
        "q0 AS MATERIALIZED (SELECT seed, seed AS id, 1.0 AS rank FROM seeds),",
    ]
    for k in range(1, iters + 1):
        p = f"q{k-1}"
        parts.append(
            f"bm{k} AS MATERIALIZED (SELECT p.seed, e.dst AS id, "
            f"SUM(p.rank/d.outdeg) AS s FROM {p} p "
            f"JOIN deg d ON d.id=p.id JOIN e ON e.src=p.id GROUP BY 1, 2),"
        )
        parts.append(
            f"bd{k} AS (SELECT s.seed, COALESCE(x.dm, 0) AS dm FROM seeds s "
            f"LEFT JOIN (SELECT p.seed, SUM(p.rank) AS dm FROM {p} p "
            f"LEFT JOIN deg d ON d.id=p.id WHERE d.id IS NULL GROUP BY 1) x "
            f"USING (seed)),"
        )
        parts.append(
            f"sup{k} AS (SELECT seed, id FROM bm{k} "
            f"UNION SELECT seed, seed FROM seeds),"
        )
        parts.append(
            f"q{k} AS MATERIALIZED (SELECT u.seed, u.id, "
            f"(1.0-{damping})*(CASE WHEN u.id=u.seed THEN 1.0 ELSE 0.0 END) + "
            f"{damping}*(COALESCE(m.s, 0.0) + d.dm*"
            f"(CASE WHEN u.id=u.seed THEN 1.0 ELSE 0.0 END)) AS rank "
            f"FROM sup{k} u LEFT JOIN bm{k} m ON m.seed=u.seed AND m.id=u.id "
            f"JOIN bd{k} d ON d.seed=u.seed),"
        )
    parts.append(
        f"fin AS (SELECT seed, id, ROUND(rank, 6) AS rank FROM q{iters} "
        f"WHERE rank > 0)"
    )
    return "\n".join(parts) + "\nSELECT seed, id, rank FROM fin"


def _pic_sql(iters: int) -> str:
    """Unrolled PIC matching operators/pic.py: v0 = deg/vol, one
    D⁻¹A message pass + L1 renormalization per step."""
    parts = [
        f"WITH {_G},",
        "pdeg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY 1),",
        "pvol AS (SELECT CAST(SUM(d) AS DOUBLE) AS vol FROM pdeg),",
        "pv0 AS MATERIALIZED (SELECT id, d, d / (SELECT vol FROM pvol) AS x "
        "FROM pdeg),",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"pw{t} AS (SELECT e.src AS id, SUM(p.x) AS s FROM sym e "
            f"JOIN pv{t-1} p ON p.id = e.dst GROUP BY 1),"
        )
        parts.append(
            f"px{t} AS MATERIALIZED (SELECT v.id, v.d, w.s / v.d AS x "
            f"FROM pv{t-1} v JOIN pw{t} w USING (id)),"
        )
        parts.append(f"pn{t} AS (SELECT SUM(x) AS n1 FROM px{t}),")
        parts.append(
            f"pv{t} AS MATERIALIZED (SELECT id, d, "
            f"x / (SELECT n1 FROM pn{t}) AS x FROM px{t}),"
        )
    parts.append(f"fin AS (SELECT id, ROUND(x, 6) AS pic FROM pv{iters})")
    return "\n".join(parts) + "\nSELECT id, pic FROM fin"


def _label_spread_sql(
    rounds: int, seed_max: int, classes: int, alpha: float
) -> str:
    """Unrolled continuous label spreading matching
    operators/smoothing.py:label_spread (clamped seeds, sym adjacency,
    per-class degree-normalized sums)."""
    parts = [
        f"WITH {_G},",
        "ldeg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY 1),",
        f"lseeds AS MATERIALIZED (SELECT id, CAST(id % {classes} AS BIGINT) AS c, "
        f"1.0 AS y FROM v WHERE id <= {seed_max}),",
        "l0 AS MATERIALIZED (SELECT id, c, y AS f FROM lseeds),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"lm{r} AS MATERIALIZED (SELECT e.dst AS id, p.c, "
            f"SUM(p.f / d.deg) AS s FROM l{r-1} p "
            f"JOIN ldeg d ON d.id = p.id JOIN sym e ON e.src = p.id "
            f"GROUP BY 1, 2),"
        )
        parts.append(
            f"lsup{r} AS (SELECT id, c FROM lm{r} "
            f"UNION SELECT id, c FROM lseeds),"
        )
        parts.append(
            f"l{r} AS MATERIALIZED (SELECT u.id, u.c, "
            f"{alpha}*COALESCE(m.s, 0.0) + {1.0 - alpha}*COALESCE(y.y, 0.0) AS f "
            f"FROM lsup{r} u LEFT JOIN lm{r} m ON m.id = u.id AND m.c = u.c "
            f"LEFT JOIN lseeds y ON y.id = u.id AND y.c = u.c),"
        )
    parts.append(
        f"fin AS (SELECT id, c, ROUND(f, 6) AS f FROM l{rounds} WHERE f > 0)"
    )
    return "\n".join(parts) + "\nSELECT id, c, f FROM fin"


def _msbfs_sql(hops: int, seed_max: int) -> str:
    """Unrolled bit-parallel multi-source BFS matching
    operators/bfs.py:msbfs_reach — int64 masks, bit_or combiner."""
    parts = [
        f"WITH {_G},",
        f"r0 AS MATERIALIZED (SELECT id, "
        f"(1::BIGINT << CAST(id % 63 AS INT)) AS mask "
        f"FROM v WHERE id <= {seed_max}),",
    ]
    for k in range(1, hops + 1):
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT id, CAST(bit_or(mask) AS BIGINT) "
            f"AS mask FROM (SELECT id, mask FROM r{k-1} UNION ALL "
            f"SELECT e.dst, p.mask FROM e JOIN r{k-1} p ON p.id = e.src) "
            f"GROUP BY id),"
        )
    parts.append(
        f"fin AS (SELECT id, mask AS reach_mask, "
        f"CAST(bit_count(mask) AS BIGINT) AS n_src FROM r{hops})"
    )
    return "\n".join(parts) + "\nSELECT id, reach_mask, n_src FROM fin"


def _slashburn_sql(k: int, rounds: int) -> str:
    """Unrolled SlashBurn matching operators/structure.py:slashburn —
    per round: top-k hub slash (degree DESC, id ASC), recursive-CTE
    components of the remainder, GCC by (size DESC, comp ASC)."""
    parts = [
        f"WITH RECURSIVE {_G},",
        "sv1 AS (SELECT id FROM v), se1 AS (SELECT src, dst FROM e),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"ssm{r} AS (SELECT DISTINCT src, dst FROM ("
            f"SELECT src, dst FROM se{r} UNION ALL "
            f"SELECT dst, src FROM se{r}) WHERE src <> dst),"
        )
        parts.append(
            f"sdg{r} AS (SELECT sv.id, COALESCE(d.d, 0) AS d FROM sv{r} sv "
            f"LEFT JOIN (SELECT src AS id, COUNT(*) AS d FROM ssm{r} "
            f"GROUP BY 1) d USING (id)),"
        )
        parts.append(
            f"shb{r} AS MATERIALIZED (SELECT id FROM sdg{r} "
            f"ORDER BY d DESC, id ASC LIMIT {k}),"
        )
        parts.append(
            f"srv{r} AS MATERIALIZED (SELECT id FROM sv{r} "
            f"WHERE id NOT IN (SELECT id FROM shb{r})),"
        )
        parts.append(
            f"sre{r} AS MATERIALIZED (SELECT src, dst FROM se{r} "
            f"WHERE src IN (SELECT id FROM srv{r}) "
            f"AND dst IN (SELECT id FROM srv{r})),"
        )
        parts.append(
            f"ssr{r} AS (SELECT DISTINCT src, dst FROM ("
            f"SELECT src, dst FROM sre{r} UNION ALL "
            f"SELECT dst, src FROM sre{r}) WHERE src <> dst),"
        )
        parts.append(
            f"scc{r}(id, anc) AS (SELECT id, id FROM srv{r} UNION "
            f"SELECT s.dst, scc{r}.anc FROM scc{r} "
            f"JOIN ssr{r} s ON s.src = scc{r}.id),"
        )
        parts.append(
            f"scp{r} AS MATERIALIZED (SELECT id, MIN(anc) AS comp "
            f"FROM scc{r} GROUP BY id),"
        )
        parts.append(
            f"ssz{r} AS (SELECT comp, COUNT(*) AS n FROM scp{r} GROUP BY 1),"
        )
        parts.append(
            f"spk{r} AS MATERIALIZED (SELECT comp, n FROM ssz{r} "
            f"ORDER BY n DESC, comp ASC LIMIT 1),"
        )
        parts.append(
            f"row{r} AS (SELECT CAST({r} AS BIGINT) AS \"round\", "
            f"CAST((SELECT COUNT(*) FROM shb{r}) AS BIGINT) AS hubs_removed, "
            f"CAST((SELECT COUNT(*) FROM srv{r}) - "
            f"COALESCE((SELECT n FROM spk{r}), 0) AS BIGINT) AS spokes_removed, "
            f"CAST(COALESCE((SELECT n FROM spk{r}), 0) AS BIGINT) AS gcc_size),"
        )
        parts.append(
            f"sv{r+1} AS MATERIALIZED (SELECT id FROM scp{r} "
            f"WHERE comp = (SELECT comp FROM spk{r})),"
        )
        parts.append(
            f"se{r+1} AS MATERIALIZED (SELECT src, dst FROM sre{r} "
            f"WHERE src IN (SELECT id FROM sv{r+1}) "
            f"AND dst IN (SELECT id FROM sv{r+1})),"
        )
    union = " UNION ALL ".join(
        f'SELECT "round", hubs_removed, spokes_removed, gcc_size FROM row{r}'
        for r in range(1, rounds + 1)
    )
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts) + "\n" + union


def _hyperball_ctes(hops: int, registers: int, seed: str = "anf") -> list[str]:
    """The shared register-evolution CTE chain hb0..hb{hops}."""
    parts = [
        f"hbh AS (SELECT id, md5(id::VARCHAR || ':{seed}') AS hx FROM v),",
        f"hbown AS (SELECT id, ('0x' || substr(hx, 1, 2))::BIGINT % {registers} AS j, "
        f"CASE WHEN ('0x' || substr(hx, 3, 8))::BIGINT = 0 THEN 33 "
        f"ELSE 33 - length(bin(('0x' || substr(hx, 3, 8))::BIGINT)) END AS m "
        f"FROM hbh),",
        f"hbr AS (SELECT unnest(generate_series(0, {registers - 1})) AS j),",
        "hb0 AS MATERIALIZED (SELECT v.id, hbr.j, "
        "CAST(COALESCE(o.m, 0) AS BIGINT) AS m FROM v CROSS JOIN hbr "
        "LEFT JOIN hbown o ON o.id = v.id AND o.j = hbr.j),",
    ]
    for k in range(1, hops + 1):
        parts.append(
            f"hb{k} AS MATERIALIZED (SELECT id, j, CAST(MAX(m) AS BIGINT) AS m "
            f"FROM (SELECT id, j, m FROM hb{k-1} UNION ALL "
            f"SELECT e.src, p.j, p.m FROM e JOIN hb{k-1} p ON p.id = e.dst) "
            f"GROUP BY id, j),"
        )
    return parts


def _hyperball_harmonic_sql(hops: int, registers: int, seed: str = "anf") -> str:
    """Unrolled HyperBall harmonic centrality matching
    operators/neighborhood.py:hyperball_harmonic — per-hop ball-size
    deltas over the shared register chain, left-associative sum."""
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        registers, 0.7213 / (1 + 1.079 / registers)
    )
    parts = [f"WITH {_G},"] + _hyperball_ctes(hops, registers, seed)
    for k in range(0, hops + 1):
        parts.append(
            f"hbe{k} AS (SELECT id, {alpha} * {float(registers * registers)} / "
            f"SUM(POWER(2.0, -m)) AS est FROM hb{k} GROUP BY id),"
        )
    terms = " + ".join(
        f"(e{k}.est - e{k-1}.est) / {float(k)}" for k in range(1, hops + 1)
    )
    joins = " ".join(f"JOIN hbe{k} e{k} USING (id)" for k in range(1, hops + 1))
    parts.append(
        f"fin AS (SELECT e0.id, ROUND({terms}, 6) AS harmonic_est "
        f"FROM hbe0 e0 {joins})"
    )
    return "\n".join(parts) + "\nSELECT id, harmonic_est FROM fin"


def _bond_percolation_sql(thresholds: tuple, seed: str = "bp") -> str:
    """Unrolled bond percolation matching
    operators/structure.py:bond_percolation — md5 edge coins + one
    recursive-CTE component pass per retention level."""
    parts = [
        f"WITH RECURSIVE {_G},",
        "bund AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM e WHERE src <> dst),",
    ]
    for i, thr in enumerate(thresholds):
        parts.append(
            f"bk{i} AS MATERIALIZED (SELECT a, b FROM bund WHERE "
            f"substr(md5(a::VARCHAR || '-' || b::VARCHAR || ':{seed}'), 1, 2) "
            f"< '{thr}'),"
        )
        parts.append(
            f"bs{i} AS (SELECT a AS src, b AS dst FROM bk{i} "
            f"UNION ALL SELECT b, a FROM bk{i}),"
        )
        parts.append(
            f"bc{i}(id, anc) AS (SELECT id, id FROM v UNION "
            f"SELECT s.dst, bc{i}.anc FROM bc{i} "
            f"JOIN bs{i} s ON s.src = bc{i}.id),"
        )
        parts.append(
            f"bcp{i} AS (SELECT id, MIN(anc) AS comp FROM bc{i} GROUP BY id),"
        )
        parts.append(
            f"bsz{i} AS MATERIALIZED (SELECT comp, COUNT(*) AS n FROM bcp{i} "
            f"GROUP BY 1),"
        )
        parts.append(
            f"brow{i} AS (SELECT '{thr}' AS retain_hex, "
            f"CAST((SELECT COUNT(*) FROM bk{i}) AS BIGINT) AS kept_edges, "
            f"CAST((SELECT COUNT(*) FROM bsz{i}) AS BIGINT) AS n_components, "
            f"CAST(COALESCE((SELECT MAX(n) FROM bsz{i}), 0) AS BIGINT) "
            f"AS gcc_size),"
        )
    parts[-1] = parts[-1].rstrip(",")
    union = " UNION ALL ".join(
        f"SELECT retain_hex, kept_edges, n_components, gcc_size FROM brow{i}"
        for i in range(len(thresholds))
    )
    return "\n".join(parts) + "\n" + union


def _sage_sql(seed_max: int, fanouts: tuple, seed: int) -> str:
    """Unrolled GraphSAGE sampling matching
    operators/embeddings.py:sage_sample — per-layer md5-ranked
    windows, frontier = previous layer's distinct targets."""
    parts = [
        f"WITH {_G},",
        f"sgf0 AS (SELECT id FROM v WHERE id <= {seed_max}),",
    ]
    for layer, fanout in enumerate(fanouts, start=1):
        parts.append(
            f"sgc{layer} AS (SELECT e.src, e.dst, "
            f"md5(e.src::VARCHAR || ':' || e.dst::VARCHAR || "
            f"':{layer}:{seed}') AS r "
            f"FROM e JOIN sgf{layer-1} f ON f.id = e.src),"
        )
        parts.append(
            f"sgs{layer} AS MATERIALIZED (SELECT CAST({layer} AS BIGINT) "
            f"AS layer, src, dst FROM "
            f"(SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src "
            f"ORDER BY r ASC, dst ASC) AS rn FROM sgc{layer}) "
            f"WHERE rn <= {fanout}),"
        )
        parts.append(
            f"sgf{layer} AS (SELECT DISTINCT dst AS id FROM sgs{layer}),"
        )
    parts[-1] = parts[-1].rstrip(",")
    union = " UNION ALL ".join(
        f"SELECT layer, src, dst FROM sgs{layer}"
        for layer in range(1, len(fanouts) + 1)
    )
    return "\n".join(parts) + "\n" + union


def _newman_sql(iters: int) -> str:
    """Unrolled modularity-matrix power iteration matching
    operators/eigenvector.py:newman_leading_vector."""
    parts = [
        f"WITH {_G},",
        "ndeg AS (SELECT src AS id, COUNT(*) AS k FROM sym GROUP BY 1),",
        "nm2 AS (SELECT CAST(SUM(k) AS DOUBLE) AS m2 FROM ndeg),",
        "nv0 AS MATERIALIZED (SELECT id, k, CASE WHEN "
        "('0x' || substr(md5(id::VARCHAR || ':nv'), 1, 8))::BIGINT % 2 = 0 "
        "THEN 1.0 ELSE -1.0 END AS x FROM ndeg),",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"nav{t} AS (SELECT e.src AS id, SUM(p.x) AS av FROM sym e "
            f"JOIN nv{t-1} p ON p.id = e.dst GROUP BY 1),"
        )
        parts.append(f"nkv{t} AS (SELECT SUM(k * x) AS kv FROM nv{t-1}),")
        parts.append(
            f"nbv{t} AS MATERIALIZED (SELECT v.id, v.k, "
            f"COALESCE(a.av, 0.0) - v.k * (SELECT kv FROM nkv{t}) / "
            f"(SELECT m2 FROM nm2) AS bx "
            f"FROM nv{t-1} v LEFT JOIN nav{t} a USING (id)),"
        )
        parts.append(f"nnm{t} AS (SELECT SUM(ABS(bx)) AS n1 FROM nbv{t}),")
        parts.append(
            f"nv{t} AS MATERIALIZED (SELECT id, k, "
            f"bx / (SELECT n1 FROM nnm{t}) AS x FROM nbv{t}),"
        )
    parts.append(f"fin AS (SELECT id, ROUND(x, 6) AS bscore FROM nv{iters})")
    return "\n".join(parts) + "\nSELECT id, bscore FROM fin"


def _hyperball_sql(hops: int, registers: int, seed: str = "anf") -> str:
    """Unrolled HyperBall matching operators/neighborhood.py:
    hyperball_reach — identical md5 register derivation, MAX combiner,
    raw HLL estimate."""
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        registers, 0.7213 / (1 + 1.079 / registers)
    )
    parts = [
        f"WITH {_G},",
        f"hbh AS (SELECT id, md5(id::VARCHAR || ':{seed}') AS hx FROM v),",
        f"hbown AS (SELECT id, ('0x' || substr(hx, 1, 2))::BIGINT % {registers} AS j, "
        f"CASE WHEN ('0x' || substr(hx, 3, 8))::BIGINT = 0 THEN 33 "
        f"ELSE 33 - length(bin(('0x' || substr(hx, 3, 8))::BIGINT)) END AS m "
        f"FROM hbh),",
        f"hbr AS (SELECT unnest(generate_series(0, {registers - 1})) AS j),",
        "hb0 AS MATERIALIZED (SELECT v.id, hbr.j, "
        "CAST(COALESCE(o.m, 0) AS BIGINT) AS m FROM v CROSS JOIN hbr "
        "LEFT JOIN hbown o ON o.id = v.id AND o.j = hbr.j),",
    ]
    for k in range(1, hops + 1):
        parts.append(
            f"hb{k} AS MATERIALIZED (SELECT id, j, CAST(MAX(m) AS BIGINT) AS m "
            f"FROM (SELECT id, j, m FROM hb{k-1} UNION ALL "
            f"SELECT e.src, p.j, p.m FROM e JOIN hb{k-1} p ON p.id = e.dst) "
            f"GROUP BY id, j),"
        )
    parts.append(
        f"fin AS (SELECT id, ROUND({alpha} * {float(registers * registers)} / "
        f"SUM(POWER(2.0, -m)), 6) AS reach_est FROM hb{hops} GROUP BY id)"
    )
    return "\n".join(parts) + "\nSELECT id, reach_est FROM fin"


def _treach_sql(hops: int) -> str:
    """Unrolled earliest-arrival temporal reachability matching
    operators/bfs.py:temporal_reachability under the declared
    timestamp rule (src*7 + dst*13) % 100."""
    parts = [
        f"WITH {_G},",
        f"te AS MATERIALIZED (SELECT src, dst, "
        f"CAST({TREACH_TS_SQL} AS BIGINT) AS ts FROM e),",
        f"a0 AS (SELECT CAST({SSSP_SOURCE} AS BIGINT) AS id, "
        f"CAST(-1 AS BIGINT) AS arrival),",
    ]
    for r in range(1, hops + 1):
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT id, CAST(MIN(arrival) AS BIGINT) "
            f"AS arrival FROM ("
            f"SELECT id, arrival FROM a{r-1} UNION ALL "
            f"SELECT t.dst, t.ts FROM te t JOIN a{r-1} p "
            f"ON p.id = t.src AND t.ts >= p.arrival) GROUP BY id),"
        )
    parts.append(f"fin AS (SELECT id, arrival FROM a{hops})")
    return "\n".join(parts) + "\nSELECT id, arrival FROM fin"


def _coloring_sql(rounds: int) -> str:
    """Unrolled speculative coloring matching operators/coloring.py:
    per round every uncolored vertex proposes the mex of its colored
    neighbors' colors; adjacent equal proposals lose to the higher
    (p, id) endpoint; winners take their proposal."""
    parts = [
        f"WITH {_G},",
        "pri AS MATERIALIZED (SELECT id, "
        "('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT AS p FROM v),",
        "s0 AS MATERIALIZED (SELECT id, CAST(NULL AS INT) AS color FROM v),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"unc{r} AS MATERIALIZED (SELECT s.id, pri.p FROM s{r-1} s "
            f"JOIN pri USING(id) WHERE s.color IS NULL),"
        )
        parts.append(
            f"usd{r} AS (SELECT u.id, list_distinct(list(s.color)) AS used "
            f"FROM unc{r} u JOIN sym e ON e.src = u.id "
            f"JOIN s{r-1} s ON s.id = e.dst AND s.color IS NOT NULL GROUP BY u.id),"
        )
        parts.append(
            f"cnd{r} AS MATERIALIZED (SELECT u.id, u.p, CAST(COALESCE(list_min("
            f"list_filter(generate_series(0, len(w.used)), "
            f"x -> NOT list_contains(w.used, x))), 0) AS INT) AS cand "
            f"FROM unc{r} u LEFT JOIN usd{r} w USING(id)),"
        )
        parts.append(
            f"lsr{r} AS (SELECT DISTINCT a.id FROM cnd{r} a "
            f"JOIN sym e ON e.src = a.id JOIN cnd{r} b ON b.id = e.dst "
            f"WHERE a.cand = b.cand AND "
            f"((b.p > a.p) OR (b.p = a.p AND b.id > a.id))),"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT s.id, COALESCE(s.color, "
            f"CASE WHEN l.id IS NULL THEN c.cand END) AS color "
            f"FROM s{r-1} s LEFT JOIN cnd{r} c USING(id) "
            f"LEFT JOIN lsr{r} l USING(id)),"
        )
    parts.append(f"fin AS (SELECT id, color FROM s{rounds})")
    return "\n".join(parts) + "\nSELECT id, color FROM fin"


def _eigenvector_sql(iters: int) -> str:
    """Unrolled sum-normalized power iteration matching
    operators/eigenvector.py (zero-total guard mirrored)."""
    parts = [
        f"WITH {_G},",
        "x0 AS MATERIALIZED (SELECT id, 1.0 AS x FROM v),",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT v.id, COALESCE(s.s, 0.0) AS r FROM v "
            f"LEFT JOIN (SELECT e.dst AS id, SUM(p.x) AS s FROM x{k-1} p "
            f"JOIN e ON e.src = p.id GROUP BY 1) s ON s.id = v.id),"
        )
        parts.append(
            f"t{k} AS (SELECT CASE WHEN SUM(r) = 0 THEN 1.0 ELSE SUM(r) END AS t FROM r{k}),"
        )
        parts.append(
            f"x{k} AS MATERIALIZED (SELECT id, r / (SELECT t FROM t{k}) AS x FROM r{k}),"
        )
    parts.append(f"fin AS (SELECT id, ROUND(x, 6) AS x FROM x{iters})")
    return "\n".join(parts) + "\nSELECT id, x FROM fin"


def _coreness_sql(k_max: int, rounds: int) -> str:
    """Unrolled nested peel matching operators/coreness.py: for each
    level k, ``rounds`` degree-filter rounds continuing from the
    previous level's final edge set; survivors of level k carry
    coreness >= k; final coreness = max surviving level (0 if none)."""
    parts = [f"WITH {_G},", "p1_0 AS MATERIALIZED (SELECT src, dst FROM sym),"]
    surv = []
    for k in range(1, k_max + 1):
        for r in range(rounds):
            parts.append(
                f"kp{k}_{r} AS (SELECT src AS id FROM p{k}_{r} "
                f"GROUP BY 1 HAVING COUNT(*) >= {k}),"
            )
            parts.append(
                f"p{k}_{r+1} AS MATERIALIZED (SELECT e.src, e.dst FROM p{k}_{r} e "
                f"JOIN kp{k}_{r} a ON a.id = e.src "
                f"JOIN kp{k}_{r} b ON b.id = e.dst),"
            )
        parts.append(
            f"s{k} AS (SELECT src AS id, {k} AS k FROM p{k}_{rounds} "
            f"GROUP BY 1 HAVING COUNT(*) >= {k}),"
        )
        surv.append(f"SELECT id, k FROM s{k}")
        if k < k_max:
            parts.append(f"p{k+1}_0 AS (SELECT src, dst FROM p{k}_{rounds}),")
    parts.append(
        "core AS (SELECT id, MAX(k) AS coreness FROM ("
        + " UNION ALL ".join(surv)
        + ") GROUP BY id)"
    )
    return "\n".join(parts) + (
        "\nSELECT v.id, COALESCE(core.coreness, 0) AS coreness "
        "FROM v LEFT JOIN core USING(id)"
    )


def _ktruss_sql(k: int, rounds: int) -> str:
    """Unrolled k-truss peel matching operators/ktruss.py: per round,
    per-edge triangle support over the current canonical edge set, drop
    support < k-2; final support measured on the surviving subgraph."""
    thresh = k - 2
    sup_tpl = (
        "tr{i} AS MATERIALIZED (SELECT t1.a AS x, t1.b AS y, t2.b AS z "
        "FROM eu{i} t1 JOIN eu{i} t2 ON t2.a = t1.a AND t2.b > t1.b "
        "JOIN eu{i} t3 ON t3.a = t1.b AND t3.b = t2.b),\n"
        "sup{i} AS MATERIALIZED (SELECT a, b, COUNT(*) AS sup FROM ("
        "SELECT x AS a, y AS b FROM tr{i} UNION ALL "
        "SELECT x, z FROM tr{i} UNION ALL "
        "SELECT y, z FROM tr{i}) GROUP BY 1, 2),"
    )
    parts = [
        f"WITH {_G},",
        "eu0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM e WHERE src <> dst),",
    ]
    for i in range(rounds):
        parts.append(sup_tpl.format(i=i))
        parts.append(
            f"eu{i+1} AS MATERIALIZED (SELECT eu.a, eu.b FROM eu{i} eu "
            f"LEFT JOIN sup{i} s ON s.a = eu.a AND s.b = eu.b "
            f"WHERE COALESCE(s.sup, 0) >= {thresh}),"
        )
    parts.append(sup_tpl.format(i=rounds))
    parts.append(
        f"fin AS (SELECT eu.a, eu.b, COALESCE(s.sup, 0) AS sup FROM eu{rounds} eu "
        f"LEFT JOIN sup{rounds} s ON s.a = eu.a AND s.b = eu.b)"
    )
    return "\n".join(parts) + "\nSELECT a, b, sup FROM fin"


def _voterank_sql(k: int) -> str:
    """Unrolled VoteRank elections matching operators/voterank.py:
    per round, vote totals over sym neighbors, argmax of the 6-dp
    ROUNDED score (ties → lowest id) among unelected vertices, then
    winner ability → 0 and each winner-neighbor ability −δ floored at
    0, with δ = |V| / |sym| (one exact double division both engines)."""
    parts = [
        f"WITH {_G},",
        "dlt AS (SELECT CAST((SELECT COUNT(*) FROM v) AS DOUBLE) / "
        "(SELECT COUNT(*) FROM sym) AS d),",
        "ab0 AS MATERIALIZED (SELECT id, 1.0 AS a, FALSE AS el FROM v),",
    ]
    for t in range(1, k + 1):
        parts.append(
            f"sc{t} AS (SELECT n.src AS id, SUM(a.a) AS s FROM sym n "
            f"JOIN ab{t-1} a ON a.id = n.dst GROUP BY 1),"
        )
        parts.append(
            f"pk{t} AS MATERIALIZED (SELECT b.id, ROUND(COALESCE(s.s, 0.0), 6) AS sc "
            f"FROM ab{t-1} b LEFT JOIN sc{t} s ON s.id = b.id "
            f"WHERE NOT b.el ORDER BY sc DESC, b.id LIMIT 1),"
        )
        parts.append(
            f"ab{t} AS MATERIALIZED (SELECT b.id, "
            f"CASE WHEN b.id = (SELECT id FROM pk{t}) THEN 0.0 "
            f"WHEN EXISTS (SELECT 1 FROM sym e WHERE e.src = (SELECT id FROM pk{t}) "
            f"AND e.dst = b.id) THEN GREATEST(0.0, b.a - (SELECT d FROM dlt)) "
            f"ELSE b.a END AS a, "
            f"b.el OR (b.id = (SELECT id FROM pk{t})) AS el FROM ab{t-1} b),"
        )
    unions = " UNION ALL ".join(
        f"SELECT {t} AS r, id, sc FROM pk{t}" for t in range(1, k + 1)
    )
    parts.append(f"fin AS ({unions})")
    return "\n".join(parts) + (
        "\nSELECT CAST(r AS INT) AS sel_rank, id, sc AS score FROM fin"
    )


def _trussness_sql(k_max: int, rounds: int) -> str:
    """Unrolled full truss decomposition matching
    operators/ktruss.py:trussness — for k = 3..k_max peel the previous
    level's survivors ``rounds`` times (surplus rounds past a fixpoint
    are no-ops); edges dropped at level k report trussness k-1,
    survivors of the last level report k_max."""
    sup_tpl = (
        "tr_{k}_{r} AS MATERIALIZED (SELECT t1.a AS x, t1.b AS y, t2.b AS z "
        "FROM {cur} t1 JOIN {cur} t2 ON t2.a = t1.a AND t2.b > t1.b "
        "JOIN {cur} t3 ON t3.a = t1.b AND t3.b = t2.b),\n"
        "sup_{k}_{r} AS MATERIALIZED (SELECT a, b, COUNT(*) AS sup FROM ("
        "SELECT x AS a, y AS b FROM tr_{k}_{r} UNION ALL "
        "SELECT x, z FROM tr_{k}_{r} UNION ALL "
        "SELECT y, z FROM tr_{k}_{r}) GROUP BY 1, 2),"
    )
    parts = [
        f"WITH {_G},",
        "lv2 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM e WHERE src <> dst),",
    ]
    for k in range(3, k_max + 1):
        cur = f"lv{k-1}"
        for r in range(rounds):
            parts.append(sup_tpl.format(k=k, r=r, cur=cur))
            nxt = f"lv{k}" if r == rounds - 1 else f"t_{k}_{r+1}"
            parts.append(
                f"{nxt} AS MATERIALIZED (SELECT eu.a, eu.b FROM {cur} eu "
                f"LEFT JOIN sup_{k}_{r} s ON s.a = eu.a AND s.b = eu.b "
                f"WHERE COALESCE(s.sup, 0) >= {k - 2}),"
            )
            cur = nxt
        parts.append(
            f"rem{k} AS (SELECT eu.a, eu.b, {k-1} AS trussness FROM lv{k-1} eu "
            f"LEFT JOIN lv{k} s ON s.a = eu.a AND s.b = eu.b WHERE s.a IS NULL),"
        )
    unions = " UNION ALL ".join(
        [f"SELECT a, b, trussness FROM rem{k}" for k in range(3, k_max + 1)]
        + [f"SELECT a, b, {k_max} AS trussness FROM lv{k_max}"]
    )
    parts.append(f"fin AS ({unions})")
    return "\n".join(parts) + "\nSELECT a, b, CAST(trussness AS INT) AS trussness FROM fin"


def _katz_sql(alpha: float, iters: int) -> str:
    """Unrolled truncated Katz matching operators/katz.py: y0 = 1,
    y_k = alpha * in-sum of y_{k-1}, katz accumulates the y_k."""
    parts = [
        f"WITH {_G},",
        "k0 AS MATERIALIZED (SELECT id, 1.0 AS y, 0.0 AS katz FROM v),",
    ]
    for k in range(1, iters + 1):
        parts.append(
            # CAST the attenuation literal to DOUBLE: DuckDB otherwise
            # types 0.05 as DECIMAL and runs the recurrence in exact
            # decimal arithmetic, rounding x.xxxxx75 differently than
            # Spark's binary doubles at the 6-decimal boundary.
            f"k{k} AS MATERIALIZED (SELECT v.id, "
            f"CAST({alpha!r} AS DOUBLE) * COALESCE(s.s, 0.0) AS y, "
            f"kp.katz + CAST({alpha!r} AS DOUBLE) * COALESCE(s.s, 0.0) AS katz "
            f"FROM v JOIN k{k-1} kp ON kp.id = v.id "
            f"LEFT JOIN (SELECT e.dst AS id, SUM(p.y) AS s FROM k{k-1} p "
            f"JOIN e ON e.src = p.id GROUP BY 1) s ON s.id = v.id),"
        )
    parts.append(f"fin AS (SELECT id, ROUND(katz, 6) AS katz FROM k{iters})")
    return "\n".join(parts) + "\nSELECT id, katz FROM fin"


def _lpa_sync_sql(iters: int) -> str:
    parts = [f"WITH {_G},", "l0 AS MATERIALIZED (SELECT id, id AS label FROM v),"]
    for k in range(1, iters + 1):
        p = f"l{k-1}"
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT b.dst AS id, l.label, COUNT(*) AS c FROM {p} l "
            f"JOIN both_e b ON b.src=l.id GROUP BY 1,2),"
        )
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT id, label FROM (SELECT id, label, ROW_NUMBER() OVER "
            f"(PARTITION BY id ORDER BY c DESC, label ASC) AS rn FROM c{k}) WHERE rn=1),"
        )
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT l.id, COALESCE(w.label, l.label) AS label FROM {p} l "
            f"LEFT JOIN w{k} w USING(id)),"
        )
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts) + f"\nSELECT id, label FROM l{iters}"


def _lpa_directed_sql(rounds: int) -> str:
    """Java-semantics LPA: only changed vertices rebroadcast (directed)."""
    parts = _lpa_directed_ctes(rounds)
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts) + f"\nSELECT id, label FROM l{rounds}"


def _lpa_directed_ctes(rounds: int) -> list[str]:
    """The CTE chain behind the LPA oracle (l{rounds} = final labels),
    reusable by downstream oracles (conductance) — every part ends
    with a trailing comma."""
    parts = [
        f"WITH {_G},",
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM v),",
        "chg0 AS MATERIALIZED (SELECT id FROM v),",
    ]
    for k in range(1, rounds + 1):
        p, c = f"l{k-1}", f"chg{k-1}"
        parts.append(
            f"msg{k} AS MATERIALIZED (SELECT e.dst AS id, l.label FROM {c} s JOIN {p} l ON l.id=s.id "
            f"JOIN e ON e.src=s.id),"
        )
        parts.append(
            f"cnt{k} AS MATERIALIZED (SELECT id, label, COUNT(*) AS c FROM msg{k} GROUP BY 1,2),"
        )
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT id, label FROM (SELECT id, label, ROW_NUMBER() OVER "
            f"(PARTITION BY id ORDER BY c DESC, label ASC) AS rn FROM cnt{k}) WHERE rn=1),"
        )
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT l.id, COALESCE(w.label, l.label) AS label FROM {p} l "
            f"LEFT JOIN w{k} w USING(id)),"
        )
        parts.append(
            f"chg{k} AS MATERIALIZED (SELECT a.id FROM l{k} a JOIN {p} b USING(id) WHERE a.label <> b.label),"
        )
    return parts


def _hitting_time_sql(target_max: int, horizon: int) -> str:
    """Unrolled truncated-hitting-time sweeps — identical recurrence to
    operators/hitting_time.py (targets 0, danglings K, else
    min(K, 1 + Σ h(out-neighbors)/outdeg))."""
    k = float(horizon)
    parts = [
        f"WITH {_G},",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY 1),",
        f"h0 AS MATERIALIZED (SELECT v.id, CASE WHEN v.id <= {target_max} "
        f"THEN 0.0 ELSE {k!r} END AS h FROM v),",
    ]
    for r in range(1, horizon + 1):
        p = r - 1
        parts += [
            f"s{r} AS (SELECT e.src AS id, SUM(p.h) AS s FROM e "
            f"JOIN h{p} p ON p.id = e.dst GROUP BY 1),",
            f"h{r} AS MATERIALIZED (SELECT b.id, CASE WHEN b.id <= {target_max} THEN 0.0 "
            f"WHEN deg.d IS NULL THEN {k!r} "
            f"ELSE LEAST({k!r}, 1.0 + s{r}.s / deg.d) END AS h "
            f"FROM h{p} b LEFT JOIN deg USING(id) LEFT JOIN s{r} USING(id)),",
        ]
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts) + (
        f"\nSELECT id, ROUND(h, 6) AS hitting_time FROM h{horizon}"
    )


def _lpa_seeded_sql(rounds: int, seed_max: int, classes: int) -> str:
    """Unrolled seeded-LPA rounds: seeds keep their label, everyone else
    adopts the (max count, min label) winner among labeled symmetrized
    neighbors — identical rule to operators/lpa.py lpa_seeded."""
    parts = [
        f"WITH {_G},",
        f"l0 AS MATERIALIZED (SELECT v.id, CASE WHEN v.id <= {seed_max} "
        f"THEN v.id % {classes} END AS label, v.id <= {seed_max} AS seed FROM v),",
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts += [
            f"msg{k} AS (SELECT e.dst AS id, l.label FROM sym e "
            f"JOIN l{p} l ON l.id = e.src WHERE l.label IS NOT NULL),",
            f"cnt{k} AS (SELECT id, label, COUNT(*) AS c FROM msg{k} GROUP BY 1, 2),",
            f"w{k} AS (SELECT id, label FROM (SELECT id, label, ROW_NUMBER() OVER "
            f"(PARTITION BY id ORDER BY c DESC, label ASC) AS rn FROM cnt{k}) WHERE rn = 1),",
            f"l{k} AS MATERIALIZED (SELECT l.id, CASE WHEN l.seed THEN l.label "
            f"ELSE COALESCE(w.label, l.label) END AS label, l.seed "
            f"FROM l{p} l LEFT JOIN w{k} w USING(id)),",
        ]
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts) + f"\nSELECT id, label FROM l{rounds}"


def _mis_sql(rounds: int, seed: int) -> str:
    """Unrolled Luby rounds: per round the alive set draws md5
    priorities, local minima win, winners + neighbors leave. Identical
    construction to operators/mis.py — md5 is bit-identical across
    engines, so the whole run replays."""
    parts = [
        f"WITH {_G},",
        "a0 AS MATERIALIZED (SELECT id FROM v),",
        "e0 AS MATERIALIZED (SELECT src, dst FROM sym),",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts += [
            f"p{r} AS MATERIALIZED (SELECT id, "
            f"md5(CAST(id AS VARCHAR) || ':{seed}:{r}') AS p FROM a{p}),",
            f"n{r} AS (SELECT e.src AS id, MIN(pd.p) AS mnp FROM e{p} e "
            f"JOIN p{r} pd ON pd.id = e.dst GROUP BY 1),",
            f"w{r} AS MATERIALIZED (SELECT p{r}.id FROM p{r} LEFT JOIN n{r} USING(id) "
            f"WHERE n{r}.mnp IS NULL OR p{r}.p < n{r}.mnp),",
            f"rm{r} AS (SELECT id FROM w{r} UNION "
            f"SELECT e.dst AS id FROM e{p} e JOIN w{r} w ON w.id = e.src),",
            f"a{r} AS MATERIALIZED (SELECT a.id FROM a{p} a "
            f"ANTI JOIN rm{r} r ON r.id = a.id),",
            f"e{r} AS MATERIALIZED (SELECT e.src, e.dst FROM e{p} e "
            f"SEMI JOIN a{r} s ON s.id = e.src SEMI JOIN a{r} d ON d.id = e.dst),",
        ]
    union = " UNION ALL ".join(f"SELECT id FROM w{r}" for r in range(1, rounds + 1))
    parts.append(f"mis AS ({union})")
    return "\n".join(parts) + """
SELECT v.id, (m.id IS NOT NULL) AS in_mis FROM v LEFT JOIN mis m USING(id)
"""


def _matching_sql(rounds: int, seed: int) -> str:
    """Unrolled Luby-style maximal matching matching
    operators/matching.py: per round alive canonical edges draw md5
    priorities; an edge wins iff its priority is the endpoint-min at
    BOTH endpoints; matched endpoints' incident edges leave."""
    parts = [
        f"WITH {_G},",
        "eu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM e WHERE src <> dst),",
        "al0 AS MATERIALIZED (SELECT a, b FROM eu),",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts += [
            f"pr{r} AS MATERIALIZED (SELECT a, b, md5(CAST(a AS VARCHAR) || '-' || "
            f"CAST(b AS VARCHAR) || ':{seed}:{r}') AS p FROM al{p}),",
            f"vm{r} AS (SELECT v, MIN(p) AS mp FROM ("
            f"SELECT a AS v, p FROM pr{r} UNION ALL SELECT b AS v, p FROM pr{r}) "
            f"GROUP BY 1),",
            f"wn{r} AS MATERIALIZED (SELECT pr.a, pr.b FROM pr{r} pr "
            f"JOIN vm{r} x ON x.v = pr.a JOIN vm{r} y ON y.v = pr.b "
            f"WHERE pr.p = x.mp AND pr.p = y.mp),",
            f"mv{r} AS (SELECT DISTINCT v FROM ("
            f"SELECT a AS v FROM wn{r} UNION ALL SELECT b AS v FROM wn{r})),",
            f"al{r} AS MATERIALIZED (SELECT t.a, t.b FROM al{p} t "
            f"ANTI JOIN mv{r} x ON x.v = t.a "
            f"WHERE NOT EXISTS (SELECT 1 FROM mv{r} y WHERE y.v = t.b)),",
        ]
    union = " UNION ALL ".join(f"SELECT a, b FROM wn{r}" for r in range(1, rounds + 1))
    parts.append(f"mm AS ({union})")
    return "\n".join(parts) + """
SELECT eu.a, eu.b, (m.a IS NOT NULL) AS matched
FROM eu LEFT JOIN mm m ON m.a = eu.a AND m.b = eu.b
"""


def _hem_sql(rounds: int, seed: int) -> str:
    """Unrolled locally-dominant heavy-edge matching matching
    operators/matching.py:heavy_edge_matching over the shared derived
    weight rule: per round each alive vertex picks its best incident
    edge by (w DESC, md5); an edge wins iff both endpoints picked it."""
    parts = [
        f"WITH {_G},",
        "eu AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, "
        "MAX(CAST((src + dst) % 5 + 1 AS DOUBLE)) AS w "
        "FROM e WHERE src <> dst GROUP BY 1, 2),",
        "al0 AS MATERIALIZED (SELECT a, b, w FROM eu),",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts += [
            f"pr{r} AS MATERIALIZED (SELECT a, b, w, md5(CAST(a AS VARCHAR) || '-' || "
            f"CAST(b AS VARCHAR) || ':{seed}:{r}') AS p FROM al{p}),",
            f"bs{r} AS (SELECT v, a, b FROM (SELECT v, a, b, "
            f"ROW_NUMBER() OVER (PARTITION BY v ORDER BY w DESC, p) AS rn FROM ("
            f"SELECT a AS v, w, p, a, b FROM pr{r} UNION ALL "
            f"SELECT b AS v, w, p, a, b FROM pr{r})) WHERE rn = 1),",
            f"wn{r} AS MATERIALIZED (SELECT a, b FROM bs{r} GROUP BY 1, 2 "
            f"HAVING COUNT(*) = 2),",
            f"mv{r} AS (SELECT DISTINCT v FROM ("
            f"SELECT a AS v FROM wn{r} UNION ALL SELECT b AS v FROM wn{r})),",
            f"al{r} AS MATERIALIZED (SELECT t.a, t.b, t.w FROM al{p} t "
            f"ANTI JOIN mv{r} x ON x.v = t.a "
            f"WHERE NOT EXISTS (SELECT 1 FROM mv{r} y WHERE y.v = t.b)),",
        ]
    union = " UNION ALL ".join(f"SELECT a, b FROM wn{r}" for r in range(1, rounds + 1))
    parts.append(f"mm AS ({union})")
    return "\n".join(parts) + """
SELECT eu.a, eu.b, ROUND(eu.w, 6) AS w, (m.a IS NOT NULL) AS matched
FROM eu LEFT JOIN mm m ON m.a = eu.a AND m.b = eu.b
"""


def _coarsen_sql(rounds: int, seed: int) -> str:
    """Matching contraction on top of the _matching_sql round chain:
    matched pairs relabel to their min id, internal edges drop,
    surviving canonical super-edges count multiplicity."""
    base = _matching_sql(rounds, seed)
    chain = base.split("\nSELECT eu.a")[0]  # the WITH ... mm chain
    return chain + """,
rl AS (SELECT a AS id, a AS super FROM mm UNION ALL SELECT b, a FROM mm),
fm AS (SELECT v.id, COALESCE(r.super, v.id) AS super FROM v LEFT JOIN rl r USING(id))
SELECT LEAST(x.super, y.super) AS i, GREATEST(x.super, y.super) AS j, COUNT(*) AS w
FROM eu t JOIN fm x ON x.id = t.a JOIN fm y ON y.id = t.b
WHERE x.super <> y.super GROUP BY 1, 2
"""


def _conductance_sql(rounds: int) -> str:
    """LPA labels (shared CTE chain) → per-label volume / cut /
    conductance over the symmetrized edge multiset ``sym``."""
    parts = _lpa_directed_ctes(rounds)
    parts += [
        f"lab AS MATERIALIZED (SELECT id, label FROM l{rounds}),",
        "tag AS (SELECT a.label AS sl, b.label AS dl FROM sym s "
        "JOIN lab a ON a.id = s.src JOIN lab b ON b.id = s.dst),",
        "pl AS (SELECT sl AS label, COUNT(*) AS volume, "
        "SUM(CASE WHEN sl <> dl THEN 1 ELSE 0 END) AS cut FROM tag GROUP BY 1),",
        "sz AS (SELECT label, COUNT(*) AS size FROM lab GROUP BY 1),",
        "tot AS (SELECT COUNT(*) AS t FROM sym)",
    ]
    return "\n".join(parts) + """
SELECT sz.label, sz.size,
       COALESCE(pl.volume, 0) AS volume,
       CAST(COALESCE(pl.cut, 0) AS BIGINT) AS cut,
       ROUND(CASE WHEN LEAST(COALESCE(pl.volume, 0), t - COALESCE(pl.volume, 0)) > 0
             THEN COALESCE(pl.cut, 0) * 1.0 / LEAST(pl.volume, t - pl.volume)
             ELSE 0 END, 6) AS conductance
FROM sz LEFT JOIN pl USING(label) CROSS JOIN tot
"""


def _kcore_peel_ctes(k: int, rounds: int) -> list[str]:
    parts = ["e0 AS MATERIALIZED (SELECT src, dst FROM sym),"]
    for r in range(1, rounds + 1):
        p = f"e{r-1}"
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT src AS id FROM {p} GROUP BY 1 HAVING COUNT(*) >= {k}),"
        )
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT p.src, p.dst FROM {p} p JOIN s{r} a ON a.id=p.src "
            f"JOIN s{r} b ON b.id=p.dst),"
        )
    return parts


def _kcore_sql(k: int, rounds: int) -> str:
    parts = [f"WITH {_G},", *_kcore_peel_ctes(k, rounds)]
    parts[-1] = parts[-1].rstrip(",")
    return (
        "\n".join(parts)
        + f"\nSELECT src AS id, COUNT(*) AS degree FROM e{rounds} GROUP BY 1 HAVING COUNT(*) >= {k}"
    )


def _closeness_weighted_sql(seed_max: int, iters: int) -> str:
    """Level-unrolled multi-source weighted Bellman-Ford → Σ 1/d."""
    parts = [
        f"WITH {_G},",
        "we AS MATERIALIZED (SELECT src, dst, CAST((src + dst) % 5 + 1 AS DOUBLE) AS w FROM e),",
        f"l0 AS MATERIALIZED (SELECT id AS source, id, 0.0 AS d FROM v WHERE id <= {seed_max}),",
    ]
    for k in range(1, iters + 1):
        p = f"l{k-1}"
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT source, id, MIN(d) AS d FROM ("
            f"SELECT source, id, d FROM {p} UNION ALL "
            f"SELECT p.source, we.dst AS id, p.d + we.w AS d FROM {p} p JOIN we ON we.src = p.id"
            f") GROUP BY source, id),"
        )
    parts[-1] = parts[-1].rstrip(",")
    return (
        "\n".join(parts)
        + f"\nSELECT id, ROUND(SUM(1.0 / d), 6) AS closeness FROM l{iters} WHERE d > 0 GROUP BY 1"
    )


def _sssp_dist_sql(source: int, iters: int) -> str:
    """Level-unrolled weighted Bellman-Ford, dist only."""
    parts = [
        f"WITH {_G},",
        "we AS MATERIALIZED (SELECT src, dst, CAST((src + dst) % 5 + 1 AS DOUBLE) AS w FROM e),",
        f"l0 AS MATERIALIZED (SELECT CAST({source} AS BIGINT) AS id, 0.0 AS d),",
    ]
    for k in range(1, iters + 1):
        p = f"l{k-1}"
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT id, MIN(d) AS d FROM ("
            f"SELECT id, d FROM {p} UNION ALL "
            f"SELECT we.dst AS id, p.d + we.w AS d FROM {p} p JOIN we ON we.src = p.id"
            f") GROUP BY id),"
        )
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts) + f"\nSELECT id, ROUND(d, 6) AS dist FROM l{iters}"


def _widest_path_sql(source: int, iters: int) -> str:
    """Level-unrolled max-min (bottleneck) recurrence: candidate caps =
    previous state ∪ min(cap, w) relaxations, winner = MAX per vertex —
    the semiring mirror of ``_sssp_dist_sql``. Source cap = 'infinity'
    so its first hop carries the pure edge weight; the source row is
    excluded from output on both sides."""
    parts = [
        f"WITH {_G},",
        "we AS MATERIALIZED (SELECT src, dst, CAST((src + dst) % 5 + 1 AS DOUBLE) AS w FROM e),",
        f"l0 AS MATERIALIZED (SELECT CAST({source} AS BIGINT) AS id, CAST('infinity' AS DOUBLE) AS c),",
    ]
    for k in range(1, iters + 1):
        p = f"l{k-1}"
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT id, MAX(c) AS c FROM ("
            f"SELECT id, c FROM {p} UNION ALL "
            f"SELECT we.dst AS id, LEAST(p.c, we.w) AS c FROM {p} p JOIN we ON we.src = p.id"
            f") GROUP BY id),"
        )
    parts[-1] = parts[-1].rstrip(",")
    return (
        "\n".join(parts)
        + f"\nSELECT id, ROUND(c, 6) AS cap FROM l{iters} WHERE id <> {source}"
    )


def _sssp_path_sql(source: int, iters: int) -> str:
    """Level-unrolled Bellman-Ford with path tracking, mirroring the
    BSP recurrence exactly: level k candidates = level k-1 state rows ∪
    relaxations; winner per vertex by (d, keep-prev-on-tie, path) — a
    vertex never replaces an equal-weight path it already holds, and
    same-level ties resolve to the lexicographically smallest path,
    matching the Spark combiner's min(struct(w, path))."""
    parts = [
        f"WITH {_G},",
        "we AS MATERIALIZED (SELECT src, dst, CAST((src + dst) % 5 + 1 AS DOUBLE) AS w FROM e),",
        f"l0 AS MATERIALIZED (SELECT CAST({source} AS BIGINT) AS id, 0.0 AS d, "
        f"CAST([] AS BIGINT[]) AS path),",
    ]
    for k in range(1, iters + 1):
        p = f"l{k-1}"
        parts.append(
            f"c{k} AS MATERIALIZED ("
            f"SELECT id, d, path, 1 AS keep_prev FROM {p} "
            f"UNION ALL "
            f"SELECT we.dst AS id, p.d + we.w AS d, "
            f"list_append(CASE WHEN p.id = {source} THEN [CAST({source} AS BIGINT)] "
            f"ELSE p.path END, we.dst) AS path, 0 AS keep_prev "
            f"FROM {p} p JOIN we ON we.src = p.id),"
        )
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT id, d, path FROM ("
            f"SELECT id, d, path, ROW_NUMBER() OVER (PARTITION BY id "
            f"ORDER BY d ASC, keep_prev DESC, path ASC) AS rn FROM c{k}) WHERE rn = 1),"
        )
    parts[-1] = parts[-1].rstrip(",")
    return (
        "\n".join(parts)
        + f"\nSELECT id, ROUND(d, 6) AS dist, "
        f"COALESCE(array_to_string(path, '->'), '') AS path_str FROM l{iters}"
    )


def _kcore_wcc_sql(k: int, rounds: int) -> str:
    """Kcore.java phase 2: WCC (min-id propagation) over the surviving
    k-core subgraph — peel CTEs + a recursive component closure."""
    parts = [f"WITH RECURSIVE {_G},", *_kcore_peel_ctes(k, rounds)]
    parts.append(
        f"core AS MATERIALIZED (SELECT src AS id FROM e{rounds} GROUP BY 1 HAVING COUNT(*) >= {k}),"
    )
    parts.append(
        f"ce AS MATERIALIZED (SELECT p.src, p.dst FROM e{rounds} p "
        f"JOIN core a ON a.id = p.src JOIN core b ON b.id = p.dst),"
    )
    parts.append(
        "cc(id, anc) AS (SELECT id, id FROM core "
        "UNION SELECT s.dst, cc.anc FROM cc JOIN ce s ON s.src = cc.id)"
    )
    return "\n".join(parts) + "\nSELECT id, MIN(anc) AS core_comp FROM cc GROUP BY id"


def _simhash_sql(bits: int = 32) -> str:
    bit_sum = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {2**j} ELSE 0 END" for j in range(bits)
    )
    bit_aggs = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN cnt ELSE -cnt END) AS b{j}"
        for j in range(bits)
    )
    return f"""
WITH {_TOKS},
tok AS (SELECT doc_id, unnest(l) AS tok FROM toks),
tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1,2),
th AS (SELECT doc_id, cnt, ('0x' || substr(md5(tok),1,8))::BIGINT AS h FROM tc),
bitsum AS (SELECT doc_id,
    {bit_aggs}
  FROM th GROUP BY doc_id)
SELECT doc_id, CAST({bit_sum} AS BIGINT) AS simhash FROM bitsum
"""


def _betweenness_sql(
    src_max: int,
    depth: int,
    pred: str | None = None,
    scaled: bool = False,
    per_edge: bool = False,
) -> str:
    """Exact Brandes (directed, endpoints excluded) from sources
    id<=src_max (or ``pred``), unrolled to ``depth`` BFS layers — same
    truncation rule as the Spark operator's max_depth. ``scaled``
    emits the pivot estimator (|V|/|pivots|)·Σ delta as
    ``betweenness_est``. ``per_edge`` emits EDGE betweenness instead:
    the un-grouped per-level credits cr{lvl} (each DAG edge's
    σ_v/σ_w·(1+δ_w)) are summed by (v, w) rather than by v."""
    src_pred = pred if pred is not None else f"id <= {src_max}"
    parts = [
        f"WITH {_G},",
        "e2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM e WHERE src <> dst),",
        f"l0 AS MATERIALIZED (SELECT id AS source, id AS v, 1.0 AS sigma "
        f"FROM v WHERE {src_pred}),",
        "vis0 AS MATERIALIZED (SELECT source, v FROM l0),",
    ]
    for k in range(1, depth + 1):
        parts.append(
            f"l{k} AS MATERIALIZED (SELECT p.source, t.dst AS v, SUM(p.sigma) AS sigma "
            f"FROM l{k-1} p JOIN e2 t ON t.src = p.v "
            f"WHERE NOT EXISTS (SELECT 1 FROM vis{k-1} x WHERE x.source = p.source AND x.v = t.dst) "
            f"GROUP BY 1, 2),"
        )
        parts.append(
            f"vis{k} AS MATERIALIZED (SELECT * FROM vis{k-1} "
            f"UNION ALL SELECT source, v FROM l{k}),"
        )
    parts.append(f"d{depth} AS MATERIALIZED (SELECT source, v, 0.0 AS delta FROM l{depth}),")
    for lvl in range(depth - 1, -1, -1):
        parts.append(
            f"cr{lvl} AS MATERIALIZED (SELECT cur.source, cur.v, t.dst AS w, "
            f"cur.sigma / b.sigma * (1.0 + COALESCE(dw.delta, 0.0)) AS credit "
            f"FROM l{lvl} cur JOIN e2 t ON t.src = cur.v "
            f"JOIN l{lvl+1} b ON b.source = cur.source AND b.v = t.dst "
            f"LEFT JOIN d{lvl+1} dw ON dw.source = cur.source AND dw.v = t.dst),"
        )
        parts.append(
            f"c{lvl} AS MATERIALIZED (SELECT source, v, SUM(credit) AS delta "
            f"FROM cr{lvl} GROUP BY 1, 2),"
        )
        parts.append(
            f"d{lvl} AS MATERIALIZED (SELECT cur.source, cur.v, "
            f"COALESCE(c.delta, 0.0) AS delta FROM l{lvl} cur "
            f"LEFT JOIN c{lvl} c ON c.source = cur.source AND c.v = cur.v),"
        )
    if per_edge:
        eunions = " UNION ALL ".join(
            f"SELECT v, w, credit FROM cr{lvl}" for lvl in range(0, depth)
        )
        parts.append(f"alle AS ({eunions}),")
        parts.append("ebc AS (SELECT v, w, SUM(credit) AS b FROM alle GROUP BY 1, 2)")
        return (
            "\n".join(parts)
            + "\nSELECT e2.src, e2.dst, ROUND(COALESCE(ebc.b, 0.0), 6) AS betweenness "
            "FROM e2 LEFT JOIN ebc ON ebc.v = e2.src AND ebc.w = e2.dst"
        )
    unions = " UNION ALL ".join(
        f"SELECT v, delta FROM d{lvl} WHERE source <> v" for lvl in range(0, depth)
    )
    parts.append(f"alld AS ({unions}),")
    parts.append("bc AS (SELECT v AS id, SUM(delta) AS b FROM alld GROUP BY 1)")
    if scaled:
        # same IEEE op order as the Spark query: (b * nv) / np
        return (
            "\n".join(parts)
            + "\nSELECT v.id, ROUND(COALESCE(bc.b, 0.0)"
            " * (SELECT CAST(COUNT(*) AS DOUBLE) FROM v)"
            " / (SELECT COUNT(*) FROM l0), 6) AS betweenness_est "
            "FROM v LEFT JOIN bc USING(id)"
        )
    return (
        "\n".join(parts)
        + "\nSELECT v.id, ROUND(COALESCE(bc.b, 0.0), 6) AS betweenness "
        "FROM v LEFT JOIN bc USING(id)"
    )


# Shared LSH-bucket CTE chain over a corpus CTE named ``corpus0``
# (vec_id, embedding) — mirrors functions/similarity.lsh_buckets.
_LSH_CTES = """planes AS (SELECT unnest(generate_series(0, 7)) AS plane),
dims AS (SELECT unnest(generate_series(0, 63)) AS pos),
w AS (SELECT plane, pos,
             CASE WHEN substr(md5(plane::VARCHAR || '_' || pos::VARCHAR), 1, 1) >= '8'
                  THEN 1.0 ELSE -1.0 END AS w
      FROM planes CROSS JOIN dims),
flat AS (SELECT vec_id, unnest(embedding) AS x,
                unnest(generate_series(0, len(embedding) - 1)) AS pos
         FROM corpus0),
proj AS (SELECT f.vec_id, w.plane, SUM(CAST(f.x AS DOUBLE) * w.w) AS p
         FROM flat f JOIN w USING(pos) GROUP BY 1, 2),
bk AS (SELECT vec_id,
       CAST(SUM(CASE WHEN p > 0 THEN CAST(1 AS BIGINT) << plane ELSE 0 END) AS BIGINT) AS bucket
       FROM proj GROUP BY vec_id)"""


def _densest_sql(eps: float, rounds: int) -> str:
    """Bahmani greedy peel unrolled to ``rounds`` density evaluations
    (sets s0..s{rounds-1}); emits the best-density prefix, earliest
    round on ties — operators/densest.py's exact rule, same IEEE op
    order ((m2/2.0)/n; deg > 2.0*(1.0+eps)*density)."""
    parts = [
        f"WITH {_G},",
        "s0 AS MATERIALIZED (SELECT id FROM v),",
        "pe0 AS MATERIALIZED (SELECT src, dst FROM sym),",
    ]
    for r in range(rounds):
        parts.append(
            f"rho{r} AS (SELECT CASE WHEN n > 0 THEN (m2 / 2.0) / n ELSE 0.0 END"
            f" AS density FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM s{r})"
            f" CROSS JOIN (SELECT CAST(COUNT(*) AS DOUBLE) AS m2 FROM pe{r})),"
        )
        if r == rounds - 1:
            break
        parts.append(
            f"dg{r} AS (SELECT src AS id, COUNT(*) AS dg FROM pe{r} GROUP BY 1),"
        )
        parts.append(
            f"s{r+1} AS MATERIALIZED (SELECT s.id FROM s{r} s"
            f" LEFT JOIN dg{r} d USING(id) CROSS JOIN rho{r} r"
            f" WHERE COALESCE(d.dg, 0) > 2.0 * (1.0 + {eps!r}) * r.density),"
        )
        parts.append(
            f"pe{r+1} AS MATERIALIZED (SELECT p.src, p.dst FROM pe{r} p"
            f" JOIN s{r+1} a ON a.id = p.src JOIN s{r+1} b ON b.id = p.dst),"
        )
    dens_union = " UNION ALL ".join(
        f"SELECT {r} AS rnd, density FROM rho{r}" for r in range(rounds)
    )
    sets_union = " UNION ALL ".join(
        f"SELECT {r} AS rnd, id FROM s{r}" for r in range(rounds)
    )
    parts.append(f"dens AS ({dens_union}),")
    parts.append(
        "best AS (SELECT rnd, density FROM dens ORDER BY density DESC, rnd ASC LIMIT 1),"
    )
    parts.append(f"alls AS ({sets_union})")
    return (
        "\n".join(parts)
        + "\nSELECT a.id, ROUND(b.density, 6) AS density FROM alls a JOIN best b USING(rnd)"
    )


def _smooth_sql(rounds: int, alpha: float) -> str:
    """Unrolled neighbor-mean smoothing over sym — operators/
    smoothing.py's x_{r+1} = (1-α)x_r + α·mean(neighbors), isolated
    vertices keep their value; feature = customer.c_acctbal (0.0 where
    the vertex is not a custkey)."""
    parts = [
        f"WITH {_G},",
        "feat AS (SELECT c_custkey AS id, CAST(c_acctbal AS DOUBLE) AS x0 FROM customer),",
        "x0 AS MATERIALIZED (SELECT v.id, COALESCE(f.x0, 0.0) AS x"
        " FROM v LEFT JOIN feat f USING(id)),",
    ]
    for r in range(rounds):
        parts.append(
            f"n{r+1} AS (SELECT s.dst AS id, AVG(x.x) AS nm FROM sym s"
            f" JOIN x{r} x ON x.id = s.src GROUP BY 1),"
        )
        parts.append(
            f"x{r+1} AS MATERIALIZED (SELECT p.id, CASE WHEN n.nm IS NULL THEN p.x"
            f" ELSE {1.0 - alpha!r} * p.x + {alpha!r} * n.nm END AS x"
            f" FROM x{r} p LEFT JOIN n{r+1} n USING(id)),"
        )
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts) + f"\nSELECT id, ROUND(x, 6) AS x FROM x{rounds}"


def _trustrank_ctes(iters: int, seed_max: int, damping: float = 0.85,
                    prefix: str = "t") -> list[str]:
    """Unrolled TrustRank recurrence (seed-set PPR): teleport + dangling
    mass return uniformly to the id<=seed_max seed set. CTE names are
    ``prefix``-scoped so the unroll composes with a PageRank unroll in
    one statement (spam mass)."""
    parts = [
        f"{prefix}ns AS (SELECT COUNT(*) AS n FROM v WHERE id <= {seed_max}),",
        f"{prefix}sv AS MATERIALIZED (SELECT id, CASE WHEN id <= {seed_max} "
        f"THEN 1.0/(SELECT n FROM {prefix}ns) ELSE 0.0 END AS s FROM v),",
        f"{prefix}deg AS (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY 1),",
        f"{prefix}p0 AS MATERIALIZED (SELECT id, s AS rank FROM {prefix}sv),",
    ]
    for k in range(1, iters + 1):
        p = f"{prefix}p{k-1}"
        parts.append(
            f"{prefix}m{k} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.rank/d.outdeg) AS s "
            f"FROM {p} p JOIN {prefix}deg d ON d.id=p.id JOIN e ON e.src=p.id GROUP BY 1),"
        )
        parts.append(
            f"{prefix}dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.rank),0) AS dm "
            f"FROM {p} p LEFT JOIN {prefix}deg d ON d.id=p.id WHERE d.id IS NULL),"
        )
        parts.append(
            f"{prefix}p{k} AS MATERIALIZED (SELECT v.id, "
            f"(1.0-{damping})*sv.s + {damping}*(COALESCE(m.s,0.0) + "
            f"(SELECT dm FROM {prefix}dang{k})*sv.s) AS rank "
            f"FROM v JOIN {prefix}sv sv ON sv.id=v.id "
            f"LEFT JOIN {prefix}m{k} m ON m.id=v.id),"
        )
    return parts


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["graph_degree"] = f"""
WITH {_G},
ids AS (SELECT src AS id FROM e UNION ALL SELECT dst FROM e),
d AS (SELECT id, COUNT(*) AS degree FROM ids GROUP BY 1)
SELECT v.id, COALESCE(d.degree, 0) AS degree FROM v LEFT JOIN d USING(id)
"""

    o["graph_degree_weighted"] = f"""
WITH {_G},
d AS (SELECT src AS id, SUM(CAST((src + dst) % 5 + 1 AS DOUBLE)) AS degree
      FROM e GROUP BY 1)
SELECT v.id, ROUND(COALESCE(d.degree, 0.0), 6) AS degree
FROM v LEFT JOIN d USING(id)
"""

    o["graph_pagerank"] = _pagerank_sql(PR_ITERS)
    o["graph_pagerank_weighted"] = _pagerank_weighted_sql(PR_ITERS)
    o["graph_ppr"] = _ppr_sql(PPR_ITERS, PPR_SOURCE)
    o["graph_ppr_sweep"] = _ppr_sweep_sql(PPR_ITERS, PPR_SOURCE, SWEEP_MAX)
    o["graph_lpa_sync"] = _lpa_sync_sql(LPA_SYNC_ITERS)
    o["graph_lpa"] = _lpa_directed_sql(LPA_ROUNDS)
    o["graph_kcore"] = _kcore_sql(KCORE_K, KCORE_ROUNDS)
    o["graph_kcore_wcc"] = _kcore_wcc_sql(KCORE_K, KCORE_ROUNDS)
    o["graph_sssp_weighted"] = _sssp_dist_sql(SSSP_SOURCE, SSSP_PATH_ITERS)
    o["graph_widest_path"] = _widest_path_sql(SSSP_SOURCE, SSSP_PATH_ITERS)
    o["graph_sssp_weighted_path"] = _sssp_path_sql(SSSP_SOURCE, SSSP_PATH_ITERS)
    o["docs_simhash"] = _simhash_sql(32)

    # degree distribution summary — exact interpolated percentiles
    # (Spark F.percentile == DuckDB quantile_cont, both (1-g)*lo + g*hi
    # at pos = p*(n-1))
    o["graph_degree_sketch"] = f"""
WITH {_G},
ids AS (SELECT src AS id FROM e UNION ALL SELECT dst FROM e),
d AS (SELECT id, COUNT(*) AS degree FROM ids GROUP BY 1),
alldeg AS (SELECT v.id, CAST(COALESCE(d.degree, 0) AS DOUBLE) AS degree
           FROM v LEFT JOIN d USING(id))
SELECT COUNT(DISTINCT id) AS n_vertices,
       (SELECT COUNT(*) FROM e) AS n_edges,
       ROUND(AVG(degree), 6) AS avg_degree,
       ROUND(quantile_cont(degree, 0.5), 6) AS p50,
       ROUND(quantile_cont(degree, 0.9), 6) AS p90,
       ROUND(quantile_cont(degree, 0.99), 6) AS p99,
       CAST(MAX(degree) AS BIGINT) AS max_degree
FROM alldeg
"""

    # walk contract: one walk per vertex, every hop a real edge, early
    # termination only at dangling vertices (the draws themselves are
    # seeded-hash and not replayable in SQL — validity IS the contract)
    o["graph_random_walk"] = f"""
WITH {_G}
SELECT CAST(id AS VARCHAR) || '_0' AS walk_id, id AS start,
       true AS hops_are_edges, true AS ended_ok
FROM v
"""

    # louvain gates: invariant booleans recomputed Spark-side from the
    # returned assignment must all come out true, coverage must be |V|
    _louvain_oracle = f"""
WITH {_G}
SELECT (SELECT COUNT(*) FROM v) AS n_assigned,
       true AS one_community_each, true AS rep_is_min_member, true AS modularity_ok
"""
    o["graph_louvain"] = _louvain_oracle
    o["graph_louvain_weighted"] = _louvain_oracle
    o["graph_leiden"] = f"""
WITH {_G}
SELECT (SELECT COUNT(*) FROM v) AS n_assigned,
       true AS one_community_each, true AS rep_is_min_member,
       true AS modularity_ok, true AS all_connected
"""

    # one SLPA round is deterministic: listener v adopts min symmetrized
    # neighbor id (all heard counts are 1); with threshold 0.3 both
    # memory entries are retained → rows {(v,v)} ∪ {(v, min neighbor)}
    o["graph_slpa"] = f"""
WITH {_G},
nb AS (SELECT src AS id, MIN(dst) AS adopt FROM sym GROUP BY 1)
SELECT id, label FROM (
  SELECT id, id AS label FROM v
  UNION
  SELECT id, adopt AS label FROM nb
)
"""

    o["graph_slpa_multi"] = f"""
WITH {_G}
SELECT (SELECT COUNT(*) FROM v) AS n_vertices_covered,
       true AS labels_are_vertex_ids, true AS memory_bounded
"""

    o["graph_property_ingest"] = f"""
WITH base AS (SELECT o_custkey AS src, o_orderkey % {DST_MOD} AS dst,
                     'L' || CAST(o_orderkey % 3 AS VARCHAR) AS label,
                     CAST(o_orderkey % 7 AS VARCHAR) AS name
              FROM orders WHERE o_custkey <> o_orderkey % {DST_MOD})
SELECT 'SINGLE' AS frequency, 'all' AS label, COUNT(*) AS n_edges
FROM (SELECT DISTINCT src, dst FROM base)
UNION ALL
SELECT 'SINGLE_PER_LABEL', label, COUNT(*)
FROM (SELECT DISTINCT src, label, dst FROM base) GROUP BY label
UNION ALL
SELECT 'MULTIPLE', label, COUNT(*)
FROM (SELECT DISTINCT src, label, name, dst FROM base) GROUP BY label
"""

    # comp_sid must be the BytesId-minimum member: length-first, then
    # bytewise (BytesUtil.compare) — encoded as min over a
    # zero-padded-length prefix + the string
    o["graph_wcc_strid"] = f"""
WITH RECURSIVE {_G},
sv AS (SELECT id, reverse(CAST(id AS VARCHAR)) AS sid FROM v),
cc(id, anc) AS (
    SELECT id, id FROM v
    UNION
    SELECT s.dst, cc.anc FROM cc JOIN sym s ON s.src = cc.id
),
comp AS (
    SELECT cc.id,
           MIN(printf('%03d', strlen(a.sid)) || a.sid) AS k
    FROM cc JOIN sv a ON a.id = cc.anc
    GROUP BY cc.id
)
SELECT sv.sid, substr(comp.k, 4) AS comp_sid
FROM comp JOIN sv ON sv.id = comp.id
"""

    # comp_uid must be the UUID-serialization-minimum member: all UUIDs
    # serialize to 16 bytes (BytesId.java:79-92) so BytesUtil.compare's
    # length rule never fires and byte order == lexical order of the
    # lowercase dashed string (dash positions are fixed) — plain MIN
    o["graph_wcc_uuid"] = f"""
WITH RECURSIVE {_G},
sv AS (SELECT id,
              substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' ||
              substr(h, 13, 4) || '-' || substr(h, 17, 4) || '-' ||
              substr(h, 21, 12) AS uid
       FROM (SELECT id, md5(CAST(id AS VARCHAR)) AS h FROM v)),
cc(id, anc) AS (
    SELECT id, id FROM v
    UNION
    SELECT s.dst, cc.anc FROM cc JOIN sym s ON s.src = cc.id
),
comp AS (
    SELECT cc.id, MIN(a.uid) AS comp_uid
    FROM cc JOIN sv a ON a.id = cc.anc
    GROUP BY cc.id
)
SELECT sv.uid, comp.comp_uid
FROM comp JOIN sv ON sv.id = comp.id
"""

    # Bridges via the same tag-and-cover construction as
    # operators/bridges.py: deterministic BFS-min spanning forest
    # (root = component min id, parent = min neighbor one level up),
    # then every non-tree edge walks its tree path toward the LCA —
    # always moving the deeper endpoint, tie → the larger id — marking
    # traversed tree edges covered; bridges = uncovered tree edges.
    # (The result is forest-independent; mirroring the forest just
    # keeps both sides' intermediate sizes comparable.)
    _BRIDGE_PRE = f"""{_G},
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                     FROM e WHERE src <> dst),
adj AS MATERIALIZED (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
cc(id, anc) AS (
    SELECT id, id FROM v
    UNION
    SELECT adj.v, cc.anc FROM cc JOIN adj ON adj.u = cc.id
),
roots AS (SELECT DISTINCT MIN(anc) AS id FROM cc GROUP BY id),
dr(id, dep) AS (
    SELECT DISTINCT id, 0 FROM roots
    UNION
    SELECT adj.v, dr.dep + 1 FROM dr JOIN adj ON adj.u = dr.id WHERE dr.dep < 64
),
dep AS MATERIALIZED (SELECT id, MIN(dep) AS dep FROM dr GROUP BY 1),
par AS MATERIALIZED (
    SELECT dv.id AS id, MIN(adj.u) AS p
    FROM dep dv JOIN adj ON adj.v = dv.id
    JOIN dep du ON du.id = adj.u AND du.dep = dv.dep - 1
    WHERE dv.dep > 0 GROUP BY 1),
tree AS MATERIALIZED (SELECT LEAST(id, p) AS a, GREATEST(id, p) AS b FROM par),
nt AS (SELECT u.a, u.b FROM und u
       WHERE NOT EXISTS (SELECT 1 FROM tree t WHERE t.a = u.a AND t.b = u.b)),
w(x, y) AS (
    SELECT a, b FROM nt WHERE a <> b
    UNION
    SELECT LEAST(CASE WHEN dx.dep > dy.dep THEN px.p ELSE w.x END,
                 CASE WHEN dx.dep > dy.dep THEN w.y ELSE py.p END) AS x,
           GREATEST(CASE WHEN dx.dep > dy.dep THEN px.p ELSE w.x END,
                    CASE WHEN dx.dep > dy.dep THEN w.y ELSE py.p END) AS y
    FROM w
    JOIN dep dx ON dx.id = w.x
    JOIN dep dy ON dy.id = w.y
    LEFT JOIN par px ON px.id = w.x
    LEFT JOIN par py ON py.id = w.y
    WHERE w.x <> w.y
),
cov AS (
    SELECT DISTINCT LEAST(mv, p) AS a, GREATEST(mv, p) AS b FROM (
        SELECT CASE WHEN dx.dep > dy.dep THEN w.x ELSE w.y END AS mv,
               CASE WHEN dx.dep > dy.dep THEN px.p ELSE py.p END AS p
        FROM w
        JOIN dep dx ON dx.id = w.x
        JOIN dep dy ON dy.id = w.y
        LEFT JOIN par px ON px.id = w.x
        LEFT JOIN par py ON py.id = w.y
        WHERE w.x <> w.y)),
brid AS (SELECT t.a, t.b FROM tree t
         WHERE NOT EXISTS (SELECT 1 FROM cov c WHERE c.a = t.a AND c.b = t.b))"""

    o["graph_bridges"] = f"""
WITH RECURSIVE {_BRIDGE_PRE}
SELECT a, b FROM brid
"""

    o["graph_2ecc"] = f"""
WITH RECURSIVE {_BRIDGE_PRE},
kept AS (SELECT u.a, u.b FROM und u
         WHERE NOT EXISTS (SELECT 1 FROM brid bb WHERE bb.a = u.a AND bb.b = u.b)),
adj2 AS MATERIALIZED (SELECT a AS u, b AS v FROM kept UNION ALL SELECT b, a FROM kept),
cc2(id, anc) AS (
    SELECT id, id FROM v
    UNION
    SELECT adj2.v, cc2.anc FROM cc2 JOIN adj2 ON adj2.u = cc2.id
)
SELECT id, MIN(anc) AS comp2 FROM cc2 GROUP BY id
"""

    # 3-clique percolation: triangle enumeration is the same oriented
    # a<b chain as the triangle oracle (so v1<v2<v3 is free), edge keys
    # use the deterministic a*(max_id+1)+b code, adjacency = chained
    # edge pairs per triangle, components by min-label recursion.
    o["graph_percolation"] = f"""
WITH RECURSIVE {_G},
u AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                   FROM e WHERE src <> dst),
m AS (SELECT MAX(id) + 1 AS m FROM v),
tri AS MATERIALIZED (SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
      FROM u e1 JOIN u e2 ON e2.a = e1.b
      JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
keys AS MATERIALIZED (SELECT v1 * m.m + v2 AS k12, v1 * m.m + v3 AS k13,
                             v2 * m.m + v3 AS k23 FROM tri CROSS JOIN m),
links AS MATERIALIZED (
    SELECT k12 AS s, k23 AS d FROM keys UNION ALL SELECT k13, k23 FROM keys
    UNION ALL SELECT k23, k12 FROM keys UNION ALL SELECT k23, k13 FROM keys),
nodes AS (SELECT DISTINCT s AS k FROM links),
cc(k, anc) AS (
    SELECT k, k FROM nodes
    UNION
    SELECT links.d, cc.anc FROM cc JOIN links ON links.s = cc.k
),
comm AS (SELECT k, MIN(anc) AS community FROM cc GROUP BY k),
mem AS (SELECT k // m.m AS id, community FROM comm CROSS JOIN m
        UNION ALL SELECT k % m.m AS id, community FROM comm CROSS JOIN m)
SELECT DISTINCT id, community FROM mem
"""

    # k=4 clique percolation: extend each oriented triangle by a fourth
    # vertex above v3 closing both remaining edges (so v1<v2<v3<v4 is
    # free), triangle keys use the ((a·m)+b)·m+c code, adjacency =
    # chained triangles per 4-clique, components by min-label recursion.
    o["graph_percolation4"] = f"""
WITH RECURSIVE {_G},
u AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                   FROM e WHERE src <> dst),
m AS (SELECT MAX(id) + 1 AS m FROM v),
tri AS MATERIALIZED (SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
      FROM u e1 JOIN u e2 ON e2.a = e1.b
      JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
quad AS MATERIALIZED (
    SELECT t.v1, t.v2, t.v3, e4.b AS v4
    FROM tri t JOIN u e4 ON e4.a = t.v3
    WHERE EXISTS (SELECT 1 FROM u x WHERE x.a = t.v1 AND x.b = e4.b)
      AND EXISTS (SELECT 1 FROM u y WHERE y.a = t.v2 AND y.b = e4.b)),
keys AS MATERIALIZED (SELECT
    CAST((v1 * m.m + v2) * m.m + v3 AS BIGINT) AS t123,
    CAST((v1 * m.m + v2) * m.m + v4 AS BIGINT) AS t124,
    CAST((v1 * m.m + v3) * m.m + v4 AS BIGINT) AS t134,
    CAST((v2 * m.m + v3) * m.m + v4 AS BIGINT) AS t234
    FROM quad CROSS JOIN m),
links AS MATERIALIZED (
    SELECT t123 AS s, t124 AS d FROM keys UNION ALL SELECT t124, t134 FROM keys
    UNION ALL SELECT t134, t234 FROM keys
    UNION ALL SELECT t124, t123 FROM keys UNION ALL SELECT t134, t124 FROM keys
    UNION ALL SELECT t234, t134 FROM keys),
nodes AS (SELECT DISTINCT s AS k FROM links),
cc(k, anc) AS (
    SELECT k, k FROM nodes
    UNION
    SELECT links.d, cc.anc FROM cc JOIN links ON links.s = cc.k
),
comm AS (SELECT k, MIN(anc) AS community FROM cc GROUP BY k),
mem AS (SELECT CAST(k // (m.m * m.m) AS BIGINT) AS id, community FROM comm CROSS JOIN m
        UNION ALL SELECT CAST((k // m.m) % m.m AS BIGINT), community FROM comm CROSS JOIN m
        UNION ALL SELECT CAST(k % m.m AS BIGINT), community FROM comm CROSS JOIN m)
SELECT DISTINCT id, community FROM mem
"""

    # documents are printable ASCII (checked at generation), so UTF-8
    # byte values == ascii() of each character
    o["media_byte_stats"] = """
WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
SELECT d.doc_id,
       strlen(d.text) AS n_bytes,
       CAST(COALESCE(s.byte_sum, 0) AS BIGINT) AS byte_sum,
       COALESCE(s.byte_mean, 0.0) AS byte_mean
FROM documents d
LEFT JOIN (SELECT doc_id, SUM(ascii(c)) AS byte_sum,
                  ROUND(AVG(ascii(c)), 6) AS byte_mean
           FROM ch GROUP BY doc_id) s USING (doc_id)
"""

    o["media_resize"] = """
WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c,
                   unnest(generate_series(1, strlen(text))) AS pos
            FROM documents WHERE strlen(text) > 0),
blk AS (SELECT doc_id, CAST(floor((pos - 1) / 4) AS BIGINT) AS blk,
               SUM(ascii(c)) // COUNT(*) AS v
        FROM ch GROUP BY doc_id, floor((pos - 1) / 4)),
st AS (SELECT doc_id, COUNT(*) AS n_bytes, SUM(v) AS byte_sum,
              ROUND(AVG(v), 6) AS byte_mean
       FROM blk GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(st.n_bytes, 0) AS n_bytes,
       CAST(COALESCE(st.byte_sum, 0) AS BIGINT) AS byte_sum,
       COALESCE(st.byte_mean, 0.0) AS byte_mean
FROM documents d LEFT JOIN st USING (doc_id)
"""

    o["media_features"] = """
WITH d8 AS (SELECT doc_id, text, strlen(text) AS n FROM documents
            WHERE strlen(text) >= 8),
ch AS (SELECT doc_id, n, ascii(c) AS b, pos - 1 AS p
       FROM (SELECT doc_id, n, unnest(string_split(text, '')) AS c,
                    unnest(generate_series(1, n)) AS pos
             FROM d8)),
asg AS (SELECT doc_id,
               CASE WHEN p < (n % 8) * (n // 8 + 1)
                    THEN p // (n // 8 + 1)
                    ELSE (n % 8) + (p - (n % 8) * (n // 8 + 1)) // (n // 8)
               END AS chunk,
               b
        FROM ch)
SELECT doc_id, chunk, ROUND(AVG(b), 6) AS fv
FROM asg GROUP BY doc_id, chunk
"""

    # WAV PCM16 payload: 44-byte RIFF/fmt/data header + 64 samples * 2B.
    # Decoded sample t of doc d = ((d*7919 + t*104729) % 65536 - 32768)
    # / 32768.0 — a 15-bit dyadic rational, so the float64 chunk means
    # (64 samples / 8 chunks = 8 each) are EXACT in both engines.
    o["media_codec_features"] = """
WITH t AS (SELECT unnest(generate_series(0, 63)) AS t),
s AS (SELECT d.doc_id,
             t.t // 8 AS chunk,
             (((d.doc_id * 7919 + t.t * 104729) % 65536) - 32768) / 32768.0 AS x
      FROM documents d CROSS JOIN t)
SELECT doc_id,
       CAST(44 + 128 AS BIGINT) AS n_bytes,
       CAST(chunk AS BIGINT) AS chunk,
       ROUND(SUM(x) / 8, 6) AS fv
FROM s GROUP BY doc_id, chunk
"""

    o["graph_wcc"] = f"""
WITH RECURSIVE {_G},
cc(id, anc) AS (
    SELECT id, id FROM v
    UNION
    SELECT s.dst, cc.anc FROM cc JOIN sym s ON s.src = cc.id
)
SELECT id, MIN(anc) AS comp FROM cc GROUP BY id
"""

    o["graph_triangle_count"] = f"""
WITH {_G},
u AS (SELECT DISTINCT LEAST(src,dst) AS a, GREATEST(src,dst) AS b FROM e WHERE src <> dst),
t AS (SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
      FROM u e1 JOIN u e2 ON e2.a = e1.b
      JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (SELECT v1 AS id FROM t UNION ALL SELECT v2 FROM t UNION ALL SELECT v3 FROM t),
cnt AS (SELECT id, COUNT(*) AS triangles FROM corners GROUP BY 1)
SELECT v.id, COALESCE(cnt.triangles, 0) AS triangles FROM v LEFT JOIN cnt USING(id)
"""

    o["graph_clustering_coefficient"] = f"""
WITH {_G},
u AS (SELECT DISTINCT LEAST(src,dst) AS a, GREATEST(src,dst) AS b FROM e WHERE src <> dst),
t AS (SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
      FROM u e1 JOIN u e2 ON e2.a = e1.b
      JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (SELECT v1 AS id FROM t UNION ALL SELECT v2 FROM t UNION ALL SELECT v3 FROM t),
cnt AS (SELECT id, COUNT(*) AS triangles FROM corners GROUP BY 1),
ids AS (SELECT a AS id FROM u UNION ALL SELECT b FROM u),
dg AS (SELECT id, COUNT(*) AS deg FROM ids GROUP BY 1)
SELECT v.id,
       ROUND(CASE WHEN COALESCE(dg.deg,0) >= 2
             THEN 2.0 * COALESCE(cnt.triangles,0) / (dg.deg * (dg.deg - 1))
             ELSE 0.0 END, 6) AS coefficient
FROM v LEFT JOIN cnt USING(id) LEFT JOIN dg USING(id)
"""

    o["graph_sssp"] = f"""
WITH RECURSIVE {_G},
r(id, d) AS (
    SELECT CAST({SSSP_SOURCE} AS BIGINT), 0
    UNION
    SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id WHERE r.d < 30
)
SELECT id, CAST(MIN(d) AS DOUBLE) AS dist FROM r GROUP BY id
"""

    o["graph_jaccard"] = f"""
WITH {_G},
dg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY 1),
sn AS (SELECT dst AS n FROM sym WHERE src = {PPR_SOURCE}),
sd AS (SELECT COUNT(*) AS deg FROM sn),
inter AS (SELECT s.src AS id, COUNT(*) AS i FROM sym s JOIN sn ON sn.n = s.dst GROUP BY 1)
SELECT d.id,
       ROUND(CAST(COALESCE(i.i,0) AS DOUBLE) /
             (d.deg + (SELECT deg FROM sd) - COALESCE(i.i,0)), 6) AS jaccard
FROM dg d LEFT JOIN inter i USING(id) WHERE d.id <> {PPR_SOURCE}
"""

    o["graph_kout"] = f"""
WITH RECURSIVE {_G},
r(id, d) AS (
    SELECT CAST({SSSP_SOURCE} AS BIGINT), 0
    UNION
    SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id WHERE r.d < 2
),
m AS (SELECT id, MIN(d) AS d FROM r GROUP BY id)
SELECT CAST({SSSP_SOURCE} AS BIGINT) AS source, COUNT(*) AS kout_size
FROM m WHERE d BETWEEN 1 AND 2
"""

    o["graph_closeness"] = f"""
WITH RECURSIVE {_G},
seeds AS (SELECT id FROM v WHERE id <= {CLOSENESS_SEED_MAX}),
r(src, tgt, d) AS (
    SELECT id, id, 0 FROM seeds
    UNION
    SELECT r.src, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.tgt WHERE r.d < 30
),
m AS (SELECT src, tgt, MIN(d) AS d FROM r GROUP BY 1, 2)
SELECT tgt AS id, ROUND(SUM(1.0 / d), 6) AS closeness FROM m WHERE d > 0 GROUP BY 1
"""

    o["graph_closeness_weighted"] = _closeness_weighted_sql(
        CLOSENESS_SEED_MAX, SSSP_PATH_ITERS
    )

    o["graph_top_degree"] = f"""
WITH {_G},
ids AS (SELECT src AS id FROM e UNION ALL SELECT dst FROM e),
d AS (SELECT id, COUNT(*) AS degree FROM ids GROUP BY 1),
alldeg AS (SELECT v.id, COALESCE(d.degree, 0) AS degree FROM v LEFT JOIN d USING(id)),
ranked AS (SELECT id, degree,
           CAST(ROW_NUMBER() OVER (ORDER BY degree DESC, id ASC) AS INT) AS rnk
           FROM alldeg)
SELECT id, degree, rnk FROM ranked WHERE rnk <= {TOPK}
"""

    o["graph_modularity"] = f"""
WITH RECURSIVE {_G},
cc(id, anc) AS (
    SELECT id, id FROM v
    UNION
    SELECT s.dst, cc.anc FROM cc JOIN sym s ON s.src = cc.id
),
asn AS (SELECT id, MIN(anc) AS comp FROM cc GROUP BY id),
u AS (SELECT DISTINCT LEAST(src,dst) AS a, GREATEST(src,dst) AS b FROM e WHERE src <> dst),
m AS (SELECT COUNT(*)::DOUBLE AS m FROM u),
lab AS (SELECT u.a, u.b, la.comp AS ca, lb.comp AS cb
        FROM u JOIN asn la ON la.id=u.a JOIN asn lb ON lb.id=u.b),
internal AS (SELECT ca AS c, COUNT(*) AS m_c FROM lab WHERE ca = cb GROUP BY 1),
ids AS (SELECT a AS id FROM u UNION ALL SELECT b FROM u),
dg AS (SELECT id, COUNT(*) AS deg FROM ids GROUP BY 1),
dc AS (SELECT asn.comp AS c, SUM(COALESCE(dg.deg,0)) AS d_c
       FROM asn LEFT JOIN dg USING(id) GROUP BY 1),
per_c AS (SELECT COALESCE(i.m_c,0)::DOUBLE / (SELECT m FROM m)
                 - POW(dc.d_c::DOUBLE / (2.0 * (SELECT m FROM m)), 2) AS q_c
          FROM dc LEFT JOIN internal i ON i.c = dc.c)
SELECT ROUND(SUM(q_c), 6) AS modularity FROM per_c
"""

    o["graph_rings"] = f"""
WITH RECURSIVE {_G},
p(start, cur, path) AS (
    SELECT id, id, [id] FROM v
    UNION ALL
    SELECT p.start, e.dst, list_append(p.path, e.dst)
    FROM p JOIN e ON e.src = p.cur
    WHERE e.dst > p.start AND NOT list_contains(p.path, e.dst)
      AND len(p.path) < {RINGS_LEN}
)
SELECT p.start, COUNT(*) AS n_rings
FROM p JOIN e ON e.src = p.cur AND e.dst = p.start
GROUP BY p.start
"""

    o["graph_depth_sketch"] = f"""
WITH RECURSIVE {_G},
r(id, d) AS (
    SELECT CAST({SSSP_SOURCE} AS BIGINT), 0
    UNION
    SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id WHERE r.d < 100
),
depths AS (SELECT id, MIN(d) AS depth FROM r GROUP BY id)
SELECT COUNT(*) AS n, COUNT(DISTINCT depth) AS n_distinct,
       ROUND(AVG(depth), 6) AS avg, ROUND(VAR_POP(depth), 6) AS dispersion,
       CAST(MIN(depth) AS BIGINT) AS min, CAST(MAX(depth) AS BIGINT) AS max
FROM depths
"""

    o["graph_cycle_detection"] = f"""
WITH RECURSIVE {_G},
p(start, cur, path) AS (
    SELECT id, id, [id] FROM v
    UNION ALL
    SELECT p.start, e.dst, list_append(p.path, e.dst)
    FROM p JOIN e ON e.src = p.cur
    WHERE e.dst > p.start AND NOT list_contains(p.path, e.dst)
      AND len(p.path) < {RINGS_LEN}
),
cyc AS (SELECT p.path FROM p JOIN e ON e.src = p.cur AND e.dst = p.start
        WHERE len(p.path) >= 3 AND len(p.path) <= {RINGS_LEN}),
members AS (SELECT DISTINCT unnest(path) AS id FROM cyc)
SELECT v.id, CASE WHEN m.id IS NOT NULL THEN 1 ELSE 0 END AS in_cycle
FROM v LEFT JOIN members m USING(id)
"""

    o["graph_scc"] = f"""
WITH RECURSIVE {_G},
r(a, b) AS (
    SELECT id, id FROM v
    UNION
    SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b
)
SELECT x.a AS id, MIN(x.b) AS scc
FROM r x JOIN r y ON y.a = x.b AND y.b = x.a
GROUP BY x.a
"""

    # SCC condensation + longest-path layer: seeding all components at
    # depth 0 equals seeding sources only (any maximal DAG path extends
    # backwards to an in-degree-0 component)
    o["graph_build_layers"] = f"""
WITH RECURSIVE {_G},
r(a, b) AS (
    SELECT id, id FROM v
    UNION
    SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b
),
sccm AS (
    SELECT x.a AS id, MIN(x.b) AS scc
    FROM r x JOIN r y ON y.a = x.b AND y.b = x.a
    GROUP BY x.a
),
ce AS (
    SELECT DISTINCT sa.scc AS src, sb.scc AS dst
    FROM e JOIN sccm sa ON sa.id = e.src JOIN sccm sb ON sb.id = e.dst
    WHERE sa.scc <> sb.scc
),
cl(node, d) AS (
    SELECT DISTINCT scc, 0 FROM sccm
    UNION
    SELECT ce.dst, cl.d + 1 FROM cl JOIN ce ON ce.src = cl.node WHERE cl.d < 200
)
SELECT s.id, s.scc, CAST(MAX(cl.d) AS BIGINT) AS layer
FROM sccm s JOIN cl ON cl.node = s.scc
GROUP BY s.id, s.scc
"""

    # critical path: same SCC/condensation CTEs as build_layers, with
    # the max-plus recursion carrying summed component costs instead of
    # +1 hops; integer arithmetic end to end (SUM cast to BIGINT — the
    # HUGEINT-vs-bigint oracle-type lesson from round 2)
    o["graph_critical_path"] = f"""
WITH RECURSIVE {_G},
r(a, b) AS (
    SELECT id, id FROM v
    UNION
    SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b
),
sccm AS (
    SELECT x.a AS id, MIN(x.b) AS scc
    FROM r x JOIN r y ON y.a = x.b AND y.b = x.a
    GROUP BY x.a
),
csum AS (SELECT scc, CAST(SUM(id % 7 + 1) AS BIGINT) AS w FROM sccm GROUP BY scc),
ce AS (
    SELECT DISTINCT sa.scc AS src, sb.scc AS dst
    FROM e JOIN sccm sa ON sa.id = e.src JOIN sccm sb ON sb.id = e.dst
    WHERE sa.scc <> sb.scc
),
cp(node, f, d) AS (
    SELECT scc, w, 0 FROM csum
    UNION
    SELECT ce.dst, cp.f + c.w, cp.d + 1
    FROM cp JOIN ce ON ce.src = cp.node JOIN csum c ON c.scc = ce.dst
    WHERE cp.d < 200
),
fin AS (SELECT node, MAX(f) AS finish FROM cp GROUP BY node)
SELECT s.id, s.scc, CAST(fin.finish - c.w AS BIGINT) AS est,
       CAST(fin.finish AS BIGINT) AS finish
FROM sccm s JOIN fin ON fin.node = s.scc JOIN csum c ON c.scc = s.scc
"""

    o["graph_coupling"] = f"""
WITH {_G},
ca AS (SELECT dst AS id, COUNT(DISTINCT src) AS ca FROM e GROUP BY dst),
ce AS (SELECT src AS id, COUNT(DISTINCT dst) AS ce FROM e GROUP BY src)
SELECT v.id,
       CAST(COALESCE(ca.ca, 0) AS BIGINT) AS ca,
       CAST(COALESCE(ce.ce, 0) AS BIGINT) AS ce,
       ROUND(CAST(COALESCE(ce.ce, 0) AS DOUBLE)
             / (COALESCE(ca.ca, 0) + COALESCE(ce.ce, 0)), 6) AS instability
FROM v LEFT JOIN ca ON ca.id = v.id LEFT JOIN ce ON ce.id = v.id
"""

    o["graph_impact"] = f"""
WITH RECURSIVE {_G},
seeds AS (SELECT id FROM v WHERE id % {IMPACT_SEED_MOD} = 0),
ir(seed, node, d) AS (
    SELECT id, id, 0 FROM seeds
    UNION
    SELECT ir.seed, e.src, ir.d + 1
    FROM ir JOIN e ON e.dst = ir.node WHERE ir.d < {IMPACT_DEPTH}
)
SELECT seed, CAST(COUNT(DISTINCT node) - 1 AS BIGINT) AS impacted
FROM ir GROUP BY seed
"""

    # Satuluri local sparsifier: rank on the EXACT double similarity
    # (identical int inputs -> identical IEEE division in both engines),
    # round only for display
    o["graph_sparsify"] = f"""
WITH {_G},
deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
und AS (SELECT src AS a, dst AS b FROM sym WHERE src < dst),
cn AS (
    SELECT und.a, und.b, COUNT(*) AS c
    FROM und
    JOIN sym s1 ON s1.src = und.a
    JOIN sym s2 ON s2.src = und.b AND s2.dst = s1.dst
    GROUP BY und.a, und.b
),
sim AS (
    SELECT und.a, und.b,
           CAST(COALESCE(cn.c, 0) AS DOUBLE)
           / (da.deg + db.deg - COALESCE(cn.c, 0)) AS sim
    FROM und
    LEFT JOIN cn ON cn.a = und.a AND cn.b = und.b
    JOIN deg da ON da.id = und.a
    JOIN deg db ON db.id = und.b
),
dirv AS (
    SELECT a AS u, b AS v, sim FROM sim
    UNION ALL SELECT b AS u, a AS v, sim FROM sim
),
rk AS (
    SELECT u, v,
           ROW_NUMBER() OVER (PARTITION BY u ORDER BY sim DESC, v ASC) AS rn
    FROM dirv
),
kept AS (
    SELECT DISTINCT LEAST(rk.u, rk.v) AS a, GREATEST(rk.u, rk.v) AS b
    FROM rk JOIN deg ON deg.id = rk.u
    WHERE rk.rn <= CEIL(POWER(deg.deg, {SPARSIFY_E}))
)
SELECT kept.a, kept.b, ROUND(sim.sim, 6) AS jaccard
FROM kept JOIN sim ON sim.a = kept.a AND sim.b = kept.b
"""

    o["graph_cascade"] = _cascade_sql(CASCADE_MOD, CASCADE_K, CASCADE_ROUNDS)

    o["graph_rings_filtered"] = f"""
WITH RECURSIVE {_G},
vf AS (SELECT id FROM v WHERE id % 3 <> 0),
ef AS (SELECT e.src, e.dst FROM e JOIN vf a ON a.id = e.src JOIN vf b ON b.id = e.dst
       WHERE e.src <> e.dst),
p(start, cur, path) AS (
    SELECT id, id, [id] FROM vf
    UNION ALL
    SELECT p.start, ef.dst, list_append(p.path, ef.dst)
    FROM p JOIN ef ON ef.src = p.cur
    WHERE ef.dst > p.start AND NOT list_contains(p.path, ef.dst)
      AND len(p.path) < {RINGS_LEN}
)
SELECT p.start, COUNT(*) AS n_rings
FROM p JOIN ef ON ef.src = p.cur AND ef.dst = p.start
GROUP BY p.start
"""

    # DSL-config variant: vertex filter age(id%97)<90 gates every path
    # vertex; first hop passes only the $message-free '*' item (w > 1);
    # later hops AND the closing edge add the nondecreasing-weight
    # spread constraint, with $message = the previous edge's weight
    o["graph_rings_filter_dsl"] = f"""
WITH RECURSIVE {_G},
vf AS (SELECT id FROM v WHERE (id % 97) < 90),
ew AS (SELECT e.src, e.dst, CAST((e.src + e.dst) % 5 + 1 AS DOUBLE) AS w
       FROM e JOIN vf a ON a.id = e.src JOIN vf b ON b.id = e.dst
       WHERE e.src <> e.dst),
p(start, cur, path, pw) AS (
    SELECT src, dst, [src, dst], w FROM ew WHERE dst > src AND w > 1
    UNION ALL
    SELECT p.start, ew.dst, list_append(p.path, ew.dst), ew.w
    FROM p JOIN ew ON ew.src = p.cur
    WHERE ew.dst > p.start AND NOT list_contains(p.path, ew.dst)
      AND len(p.path) < {RINGS_LEN} AND ew.w > 1 AND p.pw <= ew.w
)
SELECT p.start, COUNT(*) AS n_rings
FROM p JOIN ew ON ew.src = p.cur AND ew.dst = p.start
WHERE ew.w > 1 AND p.pw <= ew.w
GROUP BY p.start
"""

    o["graph_depth"] = f"""
WITH RECURSIVE {_G},
r(id, d) AS (
    SELECT CAST({SSSP_SOURCE} AS BIGINT), 0
    UNION
    SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id WHERE r.d < 100
)
SELECT id, CAST(MIN(d) AS BIGINT) AS depth FROM r GROUP BY id
"""

    o["graph_counts"] = f"""
WITH {_G}
SELECT (SELECT COUNT(*) FROM v) AS n_vertices, (SELECT COUNT(*) FROM e) AS n_edges
"""

    o["graph_betweenness"] = _betweenness_sql(BETW_SRC_MAX, BETW_DEPTH)
    o["graph_edge_betweenness"] = _betweenness_sql(
        BETW_SRC_MAX, BETW_DEPTH, per_edge=True
    )

    o["graph_betweenness_sampled"] = _betweenness_sql(
        0,
        BETW_DEPTH,
        pred=(
            f"md5(CAST(id AS VARCHAR) || ':' || '{BETW_SAMPLE_SEED}')"
            f" < '{BETW_SAMPLE_HEX}'"
        ),
        scaled=True,
    )

    o["graph_densest"] = _densest_sql(DENSEST_EPS, DENSEST_ROUNDS)

    # same IEEE op order as attribute_assortativity:
    # (diag/m - sab/m²) / (1 - sab/m²)
    o["graph_attr_assortativity"] = f"""
WITH {_G},
attrs AS (SELECT v.id, COALESCE(c.c_nationkey, v.id % 25) AS attr
          FROM v LEFT JOIN customer c ON c.c_custkey = v.id),
tagged AS MATERIALIZED (
  SELECT sa.attr AS asrc, da.attr AS adst
  FROM sym JOIN attrs sa ON sa.id = sym.src JOIN attrs da ON da.id = sym.dst),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m,
               SUM(CASE WHEN asrc = adst THEN 1 ELSE 0 END) AS diag_cnt
        FROM tagged),
cs AS (SELECT asrc AS attr, COUNT(*) AS cs FROM tagged GROUP BY 1),
cd AS (SELECT adst AS attr, COUNT(*) AS cd FROM tagged GROUP BY 1),
sab AS (SELECT SUM(cs.cs * cd.cd) AS sabn FROM cs JOIN cd USING(attr))
SELECT ROUND(((diag_cnt / m) - (sabn / (m * m)))
             / (1.0 - (sabn / (m * m))), 6) AS attr_assortativity
FROM tot CROSS JOIN sab
"""

    # common-neighbor count per canonical undirected edge (= triangles
    # through the edge); 0-rows are the local bridges
    o["graph_embeddedness"] = f"""
WITH {_G},
u AS MATERIALIZED (SELECT src AS a, dst AS b FROM sym WHERE src < dst),
cn AS (SELECT u.a, u.b, COUNT(*) AS c
       FROM u JOIN sym s1 ON s1.src = u.a
       JOIN sym s2 ON s2.src = u.b AND s2.dst = s1.dst
       GROUP BY 1, 2)
SELECT u.a, u.b, CAST(COALESCE(cn.c, 0) AS BIGINT) AS embeddedness
FROM u LEFT JOIN cn USING(a, b)
"""

    # rich-club profile phi(k) = 2 E_k / (N_k (N_k - 1)) over deg > k
    o["graph_rich_club"] = f"""
WITH {_G},
u AS MATERIALIZED (SELECT src AS a, dst AS b FROM sym WHERE src < dst),
ids AS (SELECT a AS id FROM u UNION ALL SELECT b FROM u),
deg AS (SELECT id, COUNT(*) AS d FROM ids GROUP BY 1),
ks AS (SELECT unnest(generate_series(1, {RICH_CLUB_MAX_K})) AS k),
nk AS (SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n_nodes
       FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1),
ek AS (SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n_edges
       FROM ks JOIN (SELECT LEAST(da.d, db.d) AS mdeg
                     FROM u JOIN deg da ON da.id = u.a
                     JOIN deg db ON db.id = u.b) m
       ON m.mdeg > ks.k GROUP BY 1)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(COALESCE(nk.n_nodes, 0) AS BIGINT) AS n_nodes,
       CAST(COALESCE(ek.n_edges, 0) AS BIGINT) AS n_edges,
       CASE WHEN COALESCE(nk.n_nodes, 0) >= 2
            THEN ROUND(2.0 * COALESCE(ek.n_edges, 0)
                       / (nk.n_nodes * (nk.n_nodes - 1)), 6) END AS phi
FROM ks LEFT JOIN nk ON nk.k = ks.k LEFT JOIN ek ON ek.k = ks.k
"""

    # Broder bow-tie over the full reachability closure: CORE = largest
    # SCC (tie → min scc id); IN reaches it, OUT is reached from it;
    # the residue splits by reachability from IN / to OUT (a residue
    # path cannot pass through CORE, or the vertex would be IN/OUT)
    o["graph_bowtie"] = f"""
WITH RECURSIVE {_G},
r(a, b) AS (
    SELECT id, id FROM v
    UNION
    SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b
),
comp AS (SELECT x.a AS id, MIN(x.b) AS scc
         FROM r x JOIN r y ON y.a = x.b AND y.b = x.a GROUP BY x.a),
corep AS (SELECT scc FROM comp GROUP BY scc ORDER BY COUNT(*) DESC, scc ASC LIMIT 1),
core AS MATERIALIZED (SELECT id FROM comp WHERE scc = (SELECT scc FROM corep)),
fwd AS (SELECT DISTINCT r.b AS id FROM r JOIN core c ON c.id = r.a),
bwd AS (SELECT DISTINCT r.a AS id FROM r JOIN core c ON c.id = r.b),
inn AS MATERIALIZED (SELECT b.id FROM bwd b
     WHERE NOT EXISTS (SELECT 1 FROM core c WHERE c.id = b.id)),
outt AS MATERIALIZED (SELECT f.id FROM fwd f
      WHERE NOT EXISTS (SELECT 1 FROM core c WHERE c.id = f.id)),
fromin AS (SELECT DISTINCT r.b AS id FROM r JOIN inn i ON i.id = r.a),
toout AS (SELECT DISTINCT r.a AS id FROM r JOIN outt o ON o.id = r.b)
SELECT v.id,
  CASE WHEN EXISTS(SELECT 1 FROM core c WHERE c.id = v.id) THEN 'CORE'
       WHEN EXISTS(SELECT 1 FROM inn c WHERE c.id = v.id) THEN 'IN'
       WHEN EXISTS(SELECT 1 FROM outt c WHERE c.id = v.id) THEN 'OUT'
       WHEN EXISTS(SELECT 1 FROM fromin c WHERE c.id = v.id)
            AND EXISTS(SELECT 1 FROM toout c WHERE c.id = v.id) THEN 'TUBE'
       WHEN EXISTS(SELECT 1 FROM fromin c WHERE c.id = v.id) THEN 'TENDRIL_IN'
       WHEN EXISTS(SELECT 1 FROM toout c WHERE c.id = v.id) THEN 'TENDRIL_OUT'
       ELSE 'DISCONNECTED' END AS region
FROM v
"""

    # SCAN: closed-neighborhood cosine sigma = (cn+2)/sqrt((da+1)(db+1))
    # — same IEEE op order as operators/scan.py; clusters = min-core-id
    # components of the core eps-subgraph; border joins min cluster;
    # hubs (-1) see >= 2 clusters among plain neighbors, else outlier (-2)
    o["graph_scan"] = f"""
WITH RECURSIVE {_G},
u AS MATERIALIZED (SELECT src AS a, dst AS b FROM sym WHERE src < dst),
deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY 1),
cn AS (SELECT u.a, u.b, COUNT(*) AS c
       FROM u JOIN sym s1 ON s1.src = u.a
       JOIN sym s2 ON s2.src = u.b AND s2.dst = s1.dst
       GROUP BY 1, 2),
sig AS (SELECT u.a, u.b,
               (COALESCE(cn.c, 0) + 2) / sqrt((da.d + 1.0) * (db.d + 1.0)) AS s
        FROM u LEFT JOIN cn USING(a, b)
        JOIN deg da ON da.id = u.a JOIN deg db ON db.id = u.b),
epse AS MATERIALIZED (SELECT a, b FROM sig WHERE s >= {SCAN_EPS}),
epssym AS (SELECT a AS src, b AS dst FROM epse UNION ALL SELECT b, a FROM epse),
ecnt AS (SELECT src AS id, COUNT(*) + 1 AS n FROM epssym GROUP BY 1),
cores AS MATERIALIZED (SELECT id FROM ecnt WHERE n >= {SCAN_MU}),
ce AS (SELECT s.src, s.dst FROM epssym s
       JOIN cores c1 ON c1.id = s.src JOIN cores c2 ON c2.id = s.dst),
cc(id, anc) AS (
    SELECT id, id FROM cores
    UNION
    SELECT ce.dst, cc.anc FROM cc JOIN ce ON ce.src = cc.id
),
clus AS MATERIALIZED (SELECT id, MIN(anc) AS label FROM cc GROUP BY id),
border AS (SELECT s.dst AS id, MIN(cl.label) AS label
           FROM epssym s JOIN cores c ON c.id = s.src JOIN clus cl ON cl.id = s.src
           WHERE NOT EXISTS (SELECT 1 FROM cores k WHERE k.id = s.dst)
           GROUP BY 1),
members AS MATERIALIZED (SELECT * FROM clus UNION ALL SELECT * FROM border),
rest AS (SELECT v.id FROM v
         WHERE NOT EXISTS (SELECT 1 FROM members m WHERE m.id = v.id)),
restl AS (SELECT s.src AS id, COUNT(DISTINCT m.label) AS nc
          FROM sym s JOIN members m ON m.id = s.dst
          WHERE NOT EXISTS (SELECT 1 FROM members mm WHERE mm.id = s.src)
          GROUP BY 1)
SELECT id, CAST(label AS BIGINT) AS label FROM members
UNION ALL
SELECT r.id, CAST(CASE WHEN COALESCE(rl.nc, 0) >= 2 THEN -1 ELSE -2 END AS BIGINT) AS label
FROM rest r LEFT JOIN restl rl ON rl.id = r.id
"""

    # TrustRank: unrolled seed-set PPR (same recurrence the Spark side
    # iterates; teleport/dangling mass to the id<=TRUST_SEED_MAX seeds)
    _tr_parts = [f"WITH {_G},", *_trustrank_ctes(TRUST_ITERS, TRUST_SEED_MAX)]
    _tr_parts[-1] = _tr_parts[-1].rstrip(",")
    o["graph_trustrank"] = (
        "\n".join(_tr_parts)
        + f"\nSELECT id, ROUND(rank, 6) AS rank FROM tp{TRUST_ITERS}"
    )

    # spam mass: classic-PageRank unroll + TrustRank unroll composed in
    # one statement (t-prefixed CTEs), normalized on matched scales
    _sm_parts = [
        f"WITH {_G},",
        "deg AS (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY 1),",
        "nn AS (SELECT COUNT(*)::DOUBLE AS n FROM v),",
        "pr0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM v),",
    ]
    for _k in range(1, TRUST_ITERS + 1):
        _p = f"pr{_k-1}"
        _sm_parts.append(
            f"m{_k} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.rank/d.outdeg) AS s "
            f"FROM {_p} p JOIN deg d ON d.id=p.id JOIN e ON e.src=p.id GROUP BY 1),"
        )
        _sm_parts.append(
            f"dang{_k} AS MATERIALIZED (SELECT COALESCE(SUM(p.rank),0) AS dm "
            f"FROM {_p} p LEFT JOIN deg d ON d.id=p.id WHERE d.id IS NULL),"
        )
        _sm_parts.append(
            f"pr{_k} AS MATERIALIZED (SELECT v.id, (1.0-0.85)/(SELECT n FROM nn) + "
            f"0.85*(COALESCE(m.s,0.0) + (SELECT dm FROM dang{_k})/(SELECT n FROM nn)) AS rank "
            f"FROM v LEFT JOIN m{_k} m ON m.id=v.id),"
        )
    _sm_parts += _trustrank_ctes(TRUST_ITERS, TRUST_SEED_MAX)
    _sm_parts.append(
        f"sums AS (SELECT SUM(p.rank) AS sp, SUM(t.rank) AS st "
        f"FROM pr{TRUST_ITERS} p JOIN tp{TRUST_ITERS} t ON t.id = p.id)"
    )
    o["graph_spam_mass"] = "\n".join(_sm_parts) + f"""
SELECT p.id, ROUND(p.rank, 6) AS pagerank, ROUND(t.rank, 6) AS trust,
       ROUND(CASE WHEN p.rank > 0 THEN
             (p.rank/(SELECT sp FROM sums) - t.rank/(SELECT st FROM sums))
             / (p.rank/(SELECT sp FROM sums)) END, 6) AS spam_mass
FROM pr{TRUST_ITERS} p JOIN tp{TRUST_ITERS} t ON t.id = p.id
"""

    # HostRank: the vermeer weighted-PageRank recurrence unrolled over
    # the id%QUOTIENT_MOD quotient multigraph (contribution =
    # rank/outdeg·w with outdeg a COUNT; dangling term unweighted)
    _hr_parts = [
        f"WITH {_G},",
        f"hm AS (SELECT id, id % {QUOTIENT_MOD} AS grp FROM v),",
        "qe AS MATERIALIZED (SELECT ms.grp AS src, md.grp AS dst, "
        "CAST(COUNT(*) AS DOUBLE) AS w FROM e "
        "JOIN hm ms ON ms.id = e.src JOIN hm md ON md.id = e.dst "
        "WHERE ms.grp <> md.grp GROUP BY 1, 2),",
        "hv AS (SELECT DISTINCT id FROM (SELECT src AS id FROM qe "
        "UNION ALL SELECT dst FROM qe)),",
        "hdeg AS (SELECT src AS id, COUNT(*) AS outdeg FROM qe GROUP BY 1),",
        "hnn AS (SELECT COUNT(*)::DOUBLE AS n FROM hv),",
        "hp0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM hnn) AS rank FROM hv),",
    ]
    for _k in range(1, HOSTRANK_ITERS + 1):
        _p = f"hp{_k-1}"
        _hr_parts.append(
            f"hmsg{_k} AS MATERIALIZED (SELECT qe.dst AS id, "
            f"SUM(p.rank/d.outdeg*qe.w) AS s FROM {_p} p "
            f"JOIN hdeg d ON d.id=p.id JOIN qe ON qe.src=p.id GROUP BY 1),"
        )
        _hr_parts.append(
            f"hdang{_k} AS MATERIALIZED (SELECT COALESCE(SUM(p.rank),0) AS dm "
            f"FROM {_p} p LEFT JOIN hdeg d ON d.id=p.id WHERE d.id IS NULL),"
        )
        _hr_parts.append(
            f"hp{_k} AS MATERIALIZED (SELECT hv.id, (1.0-0.85)/(SELECT n FROM hnn) + "
            f"0.85*(COALESCE(m.s,0.0) + (SELECT dm FROM hdang{_k})/(SELECT n FROM hnn)) AS rank "
            f"FROM hv LEFT JOIN hmsg{_k} m ON m.id=hv.id),"
        )
    _hr_parts[-1] = _hr_parts[-1].rstrip(",")
    o["graph_hostrank"] = (
        "\n".join(_hr_parts)
        + f"\nSELECT id AS grp, ROUND(rank, 6) AS rank FROM hp{HOSTRANK_ITERS}"
    )

    # crawl-over-crawl edge delta aggregated to id%64 host pairs;
    # mapping covers only the FULL graph's vertices (inner joins drop
    # endpoints outside it — none exist, both snapshots are subsets)
    o["graph_snapshot_diff"] = f"""
WITH {_G},
olde AS MATERIALIZED (SELECT DISTINCT o_custkey AS src, o_orderkey % {DST_MOD} AS dst
      FROM orders WHERE o_custkey <> o_orderkey % {DST_MOD}
        AND o_orderkey % 10 < {SNAP_OLD_MOD_LT}),
newe AS MATERIALIZED (SELECT DISTINCT o_custkey AS src, o_orderkey % {DST_MOD} AS dst
      FROM orders WHERE o_custkey <> o_orderkey % {DST_MOD}
        AND o_orderkey % 10 >= {SNAP_NEW_MOD_GE}),
m AS (SELECT id, id % {QUOTIENT_MOD} AS grp FROM v),
added AS (SELECT n.src, n.dst FROM newe n
          WHERE NOT EXISTS (SELECT 1 FROM olde o WHERE o.src=n.src AND o.dst=n.dst)),
removed AS (SELECT o.src, o.dst FROM olde o
            WHERE NOT EXISTS (SELECT 1 FROM newe n WHERE n.src=o.src AND n.dst=o.dst)),
ga AS (SELECT ms.grp AS gsrc, md.grp AS gdst, CAST(COUNT(*) AS BIGINT) AS n_added
       FROM added a JOIN m ms ON ms.id=a.src JOIN m md ON md.id=a.dst GROUP BY 1,2),
gr AS (SELECT ms.grp AS gsrc, md.grp AS gdst, CAST(COUNT(*) AS BIGINT) AS n_removed
       FROM removed r JOIN m ms ON ms.id=r.src JOIN m md ON md.id=r.dst GROUP BY 1,2)
SELECT COALESCE(ga.gsrc, gr.gsrc) AS gsrc, COALESCE(ga.gdst, gr.gdst) AS gdst,
       CAST(COALESCE(ga.n_added, 0) AS BIGINT) AS n_added,
       CAST(COALESCE(gr.n_removed, 0) AS BIGINT) AS n_removed
FROM ga FULL JOIN gr ON gr.gsrc = ga.gsrc AND gr.gdst = ga.gdst
"""

    # crawl-delta PageRank: cold phase on the old crawl, warm-started
    # continuation on the new edge set (two-phase unrolled recurrence)
    o["graph_pagerank_delta"] = _pagerank_delta_sql(PR_DELTA_BASE, PR_DELTA_CONT)
    o["graph_opic"] = _opic_sql(OPIC_ITERS)
    # politeness schedule: per-host (id%QUOTIENT_MOD) in-degree-priority
    # slots, delay_ms apart, capped at CRAWL_BUDGET (operators/crawl.py)
    o["graph_crawl_schedule"] = f"""
WITH {_G},
ind AS (SELECT dst AS id, COUNT(*)::DOUBLE AS pr FROM e GROUP BY 1),
r AS (SELECT v.id, v.id % {QUOTIENT_MOD} AS host, COALESCE(ind.pr, 0.0) AS pr
      FROM v LEFT JOIN ind ON ind.id = v.id),
s AS (SELECT id, host,
             ROW_NUMBER() OVER (PARTITION BY host ORDER BY pr DESC, id ASC) - 1 AS slot
      FROM r)
SELECT id, host, slot, CAST(slot * {CRAWL_DELAY_MS} AS BIGINT) AS fetch_ms
FROM s WHERE slot < {CRAWL_BUDGET}
"""

    # per-superstep BSP counters of a WCC run, terminated by the exact
    # no-messages-and-no-active rule
    o["graph_superstep_metrics"] = _superstep_metrics_sql(WCC_METRICS_STEPS)

    # per-superstep PageRank aggregators (l1 / dangling mass / cum rank)
    o["graph_pagerank_trace"] = _pagerank_trace_sql(PR_TRACE_ITERS)

    # co-citation / bibliographic coupling: bipartite projections of
    # the edge table (common in- / out-neighbor counts, hub-capped)
    o["graph_cocitation"] = f"""
WITH {_G},
gi AS (SELECT DISTINCT src AS g, dst AS item FROM e),
ok AS (SELECT g FROM gi GROUP BY g HAVING COUNT(*) <= {COCIT_CAP}),
gik AS (SELECT gi.g, gi.item FROM gi JOIN ok USING(g))
SELECT x.item AS a, y.item AS b, CAST(COUNT(*) AS BIGINT) AS weight
FROM gik x JOIN gik y ON x.g = y.g AND x.item < y.item
GROUP BY 1, 2
"""

    o["graph_bibcoupling"] = f"""
WITH {_G},
gi AS (SELECT DISTINCT dst AS g, src AS item FROM e),
ok AS (SELECT g FROM gi GROUP BY g HAVING COUNT(*) <= {BIBC_CAP}),
gik AS (SELECT gi.g, gi.item FROM gi JOIN ok USING(g))
SELECT x.item AS a, y.item AS b, CAST(COUNT(*) AS BIGINT) AS weight
FROM gik x JOIN gik y ON x.g = y.g AND x.item < y.item
GROUP BY 1, 2
"""

    # component-size histogram (giant-component census)
    o["graph_comp_sizes"] = f"""
WITH RECURSIVE {_G},
cc(id, anc) AS (
    SELECT id, id FROM v
    UNION
    SELECT s.dst, cc.anc FROM cc JOIN sym s ON s.src = cc.id
),
comp AS (SELECT id, MIN(anc) AS comp FROM cc GROUP BY id),
sz AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS size FROM comp GROUP BY 1)
SELECT size, CAST(COUNT(*) AS BIGINT) AS n_components FROM sz GROUP BY 1
"""

    # Hill/MLE power-law exponent of the in-degree tail (CSN 2009)
    o["graph_powerlaw"] = f"""
WITH {_G},
deg AS (SELECT dst AS id, COUNT(*) AS deg FROM e GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
             SUM(ln(deg / {POWERLAW_DMIN - 0.5})) AS s
      FROM deg WHERE deg >= {POWERLAW_DMIN})
SELECT CAST({POWERLAW_DMIN} AS BIGINT) AS dmin, n_tail,
       ROUND(1.0 + n_tail / s, 6) AS alpha
FROM t
"""

    # effective diameter from the exact h<=3 ANF table (same ball
    # construction as graph_neighborhood; integer-h 90% estimator)
    o["graph_eff_diameter"] = f"""
WITH {_G},
r1 AS MATERIALIZED (SELECT DISTINCT src AS root, dst AS t FROM e),
r2 AS MATERIALIZED (SELECT DISTINCT root, t FROM (
    SELECT root, t FROM r1
    UNION ALL SELECT r1.root, e.dst FROM r1 JOIN e ON e.src = r1.t)),
r3 AS MATERIALIZED (SELECT DISTINCT root, t FROM (
    SELECT root, t FROM r2
    UNION ALL SELECT r2.root, e.dst FROM r2 JOIN e ON e.src = r2.t)),
c1 AS (SELECT root, COUNT(*) AS n FROM r1 WHERE root <> t GROUP BY 1),
c2 AS (SELECT root, COUNT(*) AS n FROM r2 WHERE root <> t GROUP BY 1),
c3 AS (SELECT root, COUNT(*) AS n FROM r3 WHERE root <> t GROUP BY 1),
nf AS (SELECT v.id, COALESCE(c1.n, 0) AS n1, COALESCE(c2.n, 0) AS n2,
              COALESCE(c3.n, 0) AS n3
       FROM v LEFT JOIN c1 ON c1.root = v.id
              LEFT JOIN c2 ON c2.root = v.id
              LEFT JOIN c3 ON c3.root = v.id),
m AS (SELECT AVG(n1) AS m1, AVG(n2) AS m2, AVG(n3) AS m3 FROM nf)
SELECT CAST(CASE WHEN m1 >= m3 * {EFFDIAM_Q} THEN 1
                 WHEN m2 >= m3 * {EFFDIAM_Q} THEN 2
                 ELSE 3 END AS BIGINT) AS eff_diameter,
       ROUND(m3, 6) AS avg_reach
FROM m
"""

    # host-quotient multigraph: ordered group pairs with edge
    # multiplicity and distinct-source counts
    o["graph_host_quotient"] = f"""
WITH {_G},
m AS (SELECT id, id % {QUOTIENT_MOD} AS grp FROM v)
SELECT ms.grp AS gsrc, md.grp AS gdst,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COUNT(DISTINCT e.src) AS BIGINT) AS n_src_vertices
FROM e JOIN m ms ON ms.id = e.src JOIN m md ON md.id = e.dst
GROUP BY 1, 2
"""

    # per-component two-colorability: BFS parity from each component's
    # min-id root; a monochromatic symmetric edge = odd cycle. The
    # multi-source recursion cannot leak across components (they are
    # disconnected by definition)
    o["graph_bipartite"] = f"""
WITH RECURSIVE {_G},
cc(id, anc) AS (
    SELECT id, id FROM v
    UNION
    SELECT s.dst, cc.anc FROM cc JOIN sym s ON s.src = cc.id
),
comp AS MATERIALIZED (SELECT id, MIN(anc) AS comp FROM cc GROUP BY id),
roots AS (SELECT DISTINCT comp AS id FROM comp),
r(id, d) AS (
    SELECT id, 0 FROM roots
    UNION
    SELECT s.dst, r.d + 1 FROM r JOIN sym s ON s.src = r.id
    WHERE r.d < {BIPARTITE_DEPTH}
),
dist AS MATERIALIZED (SELECT id, MIN(d) AS d FROM r GROUP BY id),
odd AS (SELECT DISTINCT c.comp
        FROM sym s JOIN dist p ON p.id = s.src JOIN dist q ON q.id = s.dst
        JOIN comp c ON c.id = s.src
        WHERE (p.d % 2) = (q.d % 2))
SELECT c.comp, CAST(COUNT(*) AS BIGINT) AS n_vertices,
       NOT EXISTS (SELECT 1 FROM odd o WHERE o.comp = c.comp) AS is_bipartite
FROM comp c GROUP BY c.comp
"""

    # per-vertex 4-clique membership: enumerate a<b<c<d with all six
    # canonical edges present (each K4 exactly once), census the corners
    o["graph_k4"] = f"""
WITH {_G},
u AS MATERIALIZED (SELECT src AS a, dst AS b FROM sym WHERE src < dst),
q AS (SELECT ab.a AS w, ab.b AS x, ac.b AS y, ad.b AS z
      FROM u ab
      JOIN u ac ON ac.a = ab.a AND ac.b > ab.b
      JOIN u ad ON ad.a = ab.a AND ad.b > ac.b
      JOIN u bc ON bc.a = ab.b AND bc.b = ac.b
      JOIN u bd ON bd.a = ab.b AND bd.b = ad.b
      JOIN u cd ON cd.a = ac.b AND cd.b = ad.b),
corners AS (SELECT w AS id FROM q UNION ALL SELECT x FROM q
            UNION ALL SELECT y FROM q UNION ALL SELECT z FROM q),
cnt AS (SELECT id, COUNT(*) AS k4 FROM corners GROUP BY 1)
SELECT v.id, CAST(COALESCE(cnt.k4, 0) AS BIGINT) AS k4
FROM v LEFT JOIN cnt USING(id)
"""

    o["graph_feature_smooth"] = _smooth_sql(SMOOTH_ROUNDS, SMOOTH_ALPHA)

    # Truncated SimRank, k=2 unrolled with the top-T sparsification
    # replayed: s1 from the identity base case is
    # C*|I(a)∩I(b)|/(|I(a)||I(b)|); both truncation points rank on the
    # 6-dp-rounded (nudged) score per endpoint with partner-asc ties
    # (operators/simrank.py _truncate declared semantics); s2 adds the
    # off-diagonal propagation over the TRUNCATED s1 while the diagonal
    # term (identity part, never decays) uses the full common counts.
    o["graph_simrank"] = f"""
WITH {_G},
ie AS MATERIALIZED (SELECT DISTINCT dst AS vv, src AS n FROM e),
ideg AS (SELECT vv, COUNT(*) AS d FROM ie GROUP BY 1),
s1 AS MATERIALIZED (
  SELECT l.vv AS a, r.vv AS b, COUNT(*) AS common
  FROM ie l JOIN ie r ON l.n = r.n AND l.vv < r.vv
  GROUP BY 1, 2
),
s1s AS (
  SELECT s1.a, s1.b, {SIMRANK_C} * s1.common / (da.d * db.d) AS score
  FROM s1 JOIN ideg da ON da.vv = s1.a JOIN ideg db ON db.vv = s1.b
),
b1 AS (SELECT a, b, score FROM s1s
       UNION ALL SELECT b AS a, a AS b, score FROM s1s),
r1 AS (SELECT a, b, score, ROW_NUMBER() OVER (
         PARTITION BY a ORDER BY ROUND(score + 1e-9, 6) DESC, b ASC) AS rn
       FROM b1),
s1t AS MATERIALIZED (
  SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b, MAX(score) AS score
  FROM r1 WHERE rn <= {SIMRANK_T} GROUP BY 1, 2
),
crossc AS (
  SELECT LEAST(ea.dst, eb.dst) AS a, GREATEST(ea.dst, eb.dst) AS b,
         SUM(s.score) AS contrib
  FROM s1t s JOIN e ea ON ea.src = s.a JOIN e eb ON eb.src = s.b
  WHERE ea.dst <> eb.dst
  GROUP BY 1, 2
),
s2 AS (
  SELECT COALESCE(c.a, d.a) AS a, COALESCE(c.b, d.b) AS b,
         {SIMRANK_C} * (COALESCE(c.contrib, 0) + COALESCE(d.common, 0))
               / (da.d * db.d) AS score
  FROM crossc c FULL JOIN s1 d ON c.a = d.a AND c.b = d.b
  JOIN ideg da ON da.vv = COALESCE(c.a, d.a)
  JOIN ideg db ON db.vv = COALESCE(c.b, d.b)
),
b2 AS (SELECT a, b, score FROM s2
       UNION ALL SELECT b AS a, a AS b, score FROM s2),
r2 AS (SELECT a, b, score, ROW_NUMBER() OVER (
         PARTITION BY a ORDER BY ROUND(score + 1e-9, 6) DESC, b ASC) AS rn
       FROM b2)
SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b,
       ROUND(MAX(score) + 1e-9, 6) AS score
FROM r2 WHERE rn <= {SIMRANK_T} GROUP BY 1, 2
"""

    # node2vec+Word2Vec: the oracle replays the deterministic SHAPE of
    # the pipeline (every walking vertex gets one dim-sized vector);
    # trained values are pytest-gated (_q_node2vec_embed docstring).
    o["graph_node2vec_embed"] = f"""
WITH {_G}
SELECT DISTINCT src AS id, CAST({N2V_DIM} AS INT) AS dim FROM e
"""

    o["graph_hits"] = _hits_sql(HITS_ITERS)
    o["graph_katz"] = _katz_sql(KATZ_ALPHA, KATZ_ITERS)
    o["graph_eigenvector"] = _eigenvector_sql(EIG_ITERS)
    o["graph_ktruss"] = _ktruss_sql(KTRUSS_K, KTRUSS_ROUNDS)
    o["graph_trussness"] = _trussness_sql(TRUSS_KMAX, TRUSS_ROUNDS)
    o["graph_voterank"] = _voterank_sql(VOTERANK_K)
    o["graph_coreness"] = _coreness_sql(CORE_KMAX, CORE_ROUNDS)

    o["graph_reciprocity"] = f"""
WITH {_G},
ne AS (SELECT COUNT(*) AS n_edges FROM e),
nr AS (SELECT COUNT(*) AS n_reciprocal FROM e
       WHERE EXISTS (SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src))
SELECT ne.n_edges, nr.n_reciprocal,
       ROUND(CAST(nr.n_reciprocal AS DOUBLE) / ne.n_edges, 6) AS reciprocity
FROM ne, nr
"""

    o["graph_salsa"] = _salsa_sql(SALSA_ITERS)
    o["graph_coloring"] = _coloring_sql(COLOR_ROUNDS)
    o["graph_wl_refine"] = _wl_sql(WL_ROUNDS)
    o["graph_fastrp"] = _fastrp_sql(
        FASTRP_DIM, FASTRP_ITERS, FASTRP_SEED, FASTRP_WEIGHTS
    )
    o["graph_temporal_reach"] = _treach_sql(TREACH_HOPS)
    o["graph_ppr_batch"] = _ppr_batch_sql(PPR_ITERS, PPRB_SEED_MAX)
    o["graph_ppr_push"] = _ppr_push_sql(PPR_SOURCE, PUSH_EPS, PUSH_ROUNDS)
    o["graph_rmat_profile"] = _rmat_sql(
        RMAT_EDGES, RMAT_LEVELS, RMAT_SEED, RMAT_A, RMAT_B, RMAT_C
    )
    o["graph_pic"] = _pic_sql(PIC_ITERS)
    o["graph_label_spread"] = _label_spread_sql(
        LS_ROUNDS, SEEDED_MAX, SEEDED_CLASSES, LS_ALPHA
    )
    o["graph_msbfs"] = _msbfs_sql(MSBFS_HOPS, MSBFS_SEED_MAX)
    o["graph_anf_hll"] = _hyperball_sql(HLL_HOPS, HLL_REGISTERS)
    o["graph_slashburn"] = _slashburn_sql(SB_K, SB_ROUNDS)
    o["graph_newman_vector"] = _newman_sql(NEWMAN_ITERS)
    o["graph_harmonic_hll"] = _hyperball_harmonic_sql(HLL_HOPS, HLL_REGISTERS)
    o["graph_bond_percolation"] = _bond_percolation_sql(BP_THRESH)

    o["media_phash"] = """
WITH pp AS MATERIALIZED (SELECT doc_id,
     unnest(string_split(text, '')) AS c,
     unnest(generate_series(1, strlen(text))) AS p,
     strlen(text) AS n FROM documents),
pv AS (SELECT doc_id, ascii(c) AS bval, ((p - 1) * 63) // n AS bkt, n FROM pp),
pg AS (SELECT doc_id, CAST(SUM(bval) AS DOUBLE) / MAX(n) AS gmean
       FROM pv GROUP BY 1),
pb AS (SELECT doc_id, bkt, CAST(SUM(bval) AS DOUBLE) / COUNT(*) AS bmean
       FROM pv GROUP BY 1, 2),
psh AS (SELECT pb.doc_id,
        CAST(COALESCE(SUM(CASE WHEN pb.bmean > pg.gmean
             THEN 1::BIGINT << CAST(pb.bkt AS INT) ELSE 0 END), 0) AS BIGINT)
        AS phash
        FROM pb JOIN pg USING (doc_id) GROUP BY 1)
SELECT d.doc_id, CAST(strlen(d.text) AS BIGINT) AS n_bytes,
       COALESCE(psh.phash, 0) AS phash
FROM documents d LEFT JOIN psh USING (doc_id)
"""

    o["docs_cdc_chunks"] = f"""
WITH cpos AS MATERIALIZED (SELECT doc_id, text,
     unnest(generate_series(1, strlen(text))) AS p FROM documents),
cind AS (SELECT doc_id, text, p,
         CASE WHEN p >= 2 AND p <= strlen(text) - {CDC_WINDOW - 1}
              AND substr(md5(substr(text, p, {CDC_WINDOW})), 1, 1) = '0'
         THEN 1 ELSE 0 END AS ib FROM cpos),
ctag AS (SELECT doc_id, text, p,
         SUM(ib) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS UNBOUNDED PRECEDING) AS chunk_id FROM cind)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(MAX(p) - MIN(p) + 1 AS BIGINT) AS chunk_len,
       md5(substr(ANY_VALUE(text), CAST(MIN(p) AS INT),
           CAST(MAX(p) - MIN(p) + 1 AS INT))) AS chunk_md5
FROM ctag GROUP BY doc_id, chunk_id
"""

    o["graph_sage_sample"] = _sage_sql(SAGE_SEED_MAX, SAGE_FANOUTS, SAGE_SEED)

    o["emb_mrl_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
           (embedding::DOUBLE[])[1:{MRL_PREFIX}] AS qp
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, embedding::DOUBLE[] AS vv,
      (embedding::DOUBLE[])[1:{MRL_PREFIX}] AS vp FROM embeddings),
s1 AS (SELECT q.query_id, c.vec_id, c.vv, q.qv,
       list_cosine_similarity(c.vp, q.qp) AS cs
       FROM c CROSS JOIN q WHERE c.vec_id <> q.query_id),
cand AS (SELECT query_id, vec_id, vv, qv FROM
         (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cs DESC, vec_id ASC) AS crn FROM s1)
         WHERE crn <= {MRL_CAND}),
s2 AS (SELECT query_id, vec_id,
       list_cosine_similarity(vv, qv) AS score FROM cand),
r AS (SELECT query_id, vec_id, score,
      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY score DESC, vec_id ASC) AS INT) AS rank FROM s2)
SELECT query_id, vec_id, ROUND(score, 6) AS score, rank
FROM r WHERE rank <= {TOPK}
"""

    o["media_phash_pairs"] = f"""
WITH ph AS MATERIALIZED (SELECT doc_id AS media_id, phash FROM
     ({{PHASH_INNER}})),
pbd AS (SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS band),
pbn AS (SELECT media_id, phash, band,
        (phash >> CAST(band * {PHASH_BAND_BITS} AS INT))
          & {(1 << PHASH_BAND_BITS) - 1} AS bval
        FROM ph CROSS JOIN pbd),
pcd AS (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
        a.phash AS ha, b.phash AS hb
        FROM pbn a JOIN pbn b
        ON a.band = b.band AND a.bval = b.bval
        AND a.media_id < b.media_id)
SELECT media_a, media_b,
       CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM pcd WHERE bit_count(xor(ha, hb)) <= {PHASH_MAX_HAMMING}
"""
    o["media_phash_pairs"] = o["media_phash_pairs"].replace(
        "{PHASH_INNER}", o["media_phash"]
    )

    o["media_phash_recall"] = f"""
WITH ph AS MATERIALIZED (SELECT doc_id AS media_id, phash FROM
     ({{PHASH_INNER}})),
rt AS MATERIALIZED (SELECT a.media_id AS media_a, b.media_id AS media_b
     FROM ph a JOIN ph b ON a.media_id < b.media_id
     WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAMMING}),
rbd AS (SELECT unnest(generate_series(0, {PHASH_BANDS - 1})) AS band),
rbn AS (SELECT media_id, phash, band,
        (phash >> CAST(band * {PHASH_BAND_BITS} AS INT))
          & {(1 << PHASH_BAND_BITS) - 1} AS bval
        FROM ph CROSS JOIN rbd),
rcd AS (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
        FROM rbn a JOIN rbn b
        ON a.band = b.band AND a.bval = b.bval AND a.media_id < b.media_id),
rcf AS (SELECT c.media_a, c.media_b FROM rcd c
        JOIN ph x ON x.media_id = c.media_a
        JOIN ph y ON y.media_id = c.media_b
        WHERE bit_count(xor(x.phash, y.phash)) <= {PHASH_MAX_HAMMING}),
rh AS (SELECT t.media_a, t.media_b FROM rt t
       JOIN rcf USING (media_a, media_b))
SELECT CAST((SELECT COUNT(*) FROM rt) AS BIGINT) AS n_true,
       CAST((SELECT COUNT(*) FROM rcf) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM rh) AS BIGINT) AS n_hits,
       CASE WHEN (SELECT COUNT(*) FROM rt) > 0 THEN
         ROUND((SELECT COUNT(*) FROM rh) * 1.0 /
               (SELECT COUNT(*) FROM rt), 6) END AS recall
"""
    o["media_phash_recall"] = o["media_phash_recall"].replace(
        "{PHASH_INNER}", o["media_phash"]
    )

    o["docs_cdc_shared"] = f"""
WITH cdc AS MATERIALIZED ({{CDC_INNER}})
SELECT chunk_md5,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MAX(chunk_len) AS BIGINT) AS chunk_len
FROM cdc GROUP BY chunk_md5 HAVING COUNT(DISTINCT doc_id) >= 2
"""
    o["docs_cdc_shared"] = o["docs_cdc_shared"].replace(
        "{CDC_INNER}", o["docs_cdc_chunks"]
    )

    o["graph_motif_null"] = f"""
WITH {_G},
mu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
     GREATEST(src, dst) AS b FROM e WHERE src <> dst),
md AS (SELECT id, COUNT(*) AS d FROM
       (SELECT a AS id FROM mu UNION ALL SELECT b FROM mu) GROUP BY 1),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(SUM(d) AS BIGINT) AS m2,
       CAST(SUM(d * (d - 1)) AS BIGINT) AS s2 FROM md),
mt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_obs FROM
       (SELECT 1 FROM mu e1 JOIN mu e2 ON e2.a = e1.b
        JOIN mu e3 ON e3.a = e1.a AND e3.b = e2.b))
SELECT mm.n_vertices, CAST(mm.m2 // 2 AS BIGINT) AS n_edges,
       mt.t_obs AS triangles_obs,
       ROUND((CAST(mm.s2 AS DOUBLE) * mm.s2 * mm.s2)
             / (6.0 * CAST(mm.m2 AS DOUBLE) * mm.m2 * mm.m2), 6)
         AS triangles_cfg_exp,
       ROUND(mt.t_obs / ((CAST(mm.s2 AS DOUBLE) * mm.s2 * mm.s2)
             / (6.0 * CAST(mm.m2 AS DOUBLE) * mm.m2 * mm.m2)), 6)
         AS clustering_excess
FROM mm, mt
"""

    o["graph_jdm"] = f"""
WITH {_G},
ju AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
     GREATEST(src, dst) AS b FROM e WHERE src <> dst),
jd AS (SELECT id, COUNT(*) AS d FROM
       (SELECT a AS id FROM ju UNION ALL SELECT b FROM ju) GROUP BY 1),
jb AS (SELECT id, CAST(length(bin(d)) - 1 AS BIGINT) AS bk FROM jd)
SELECT LEAST(x.bk, y.bk) AS dlo, GREATEST(x.bk, y.bk) AS dhi,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM ju JOIN jb x ON x.id = ju.a JOIN jb y ON y.id = ju.b
GROUP BY 1, 2
"""

    o["docs_zipf"] = f"""
WITH {_TOKS},
ztf AS (SELECT tok, COUNT(*) AS f FROM
        (SELECT unnest(l) AS tok FROM toks) GROUP BY 1)
SELECT CAST({ZIPF_FMIN} AS BIGINT) AS fmin,
       CAST(COUNT(*) AS BIGINT) AS n_tail,
       ROUND(1.0 + COUNT(*) / SUM(LN(f / {ZIPF_FMIN - 0.5})), 6) AS alpha
FROM ztf WHERE f >= {ZIPF_FMIN}
"""

    o["events_users_hll"] = f"""
WITH ev AS MATERIALIZED (SELECT
     strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
     user_id,
     md5(user_id::VARCHAR || ':hll') AS hx FROM events),
hper AS (SELECT hour,
         ('0x' || substr(hx, 1, 2))::BIGINT % {HLL_REGISTERS} AS j,
         MAX(CASE WHEN ('0x' || substr(hx, 3, 8))::BIGINT = 0 THEN 33
             ELSE 33 - length(bin(('0x' || substr(hx, 3, 8))::BIGINT)) END) AS mv
         FROM ev GROUP BY 1, 2),
hreg AS (SELECT unnest(generate_series(0, {HLL_REGISTERS - 1})) AS j),
hdense AS (SELECT h.hour, hreg.j, COALESCE(p.mv, 0) AS mv
           FROM (SELECT DISTINCT hour FROM ev) h CROSS JOIN hreg
           LEFT JOIN hper p ON p.hour = h.hour AND p.j = hreg.j),
hest AS (SELECT hour, ROUND(0.673 * {float(HLL_REGISTERS**2)} /
         SUM(POWER(2.0, -mv)), 6) AS est_users FROM hdense GROUP BY 1),
hexa AS (SELECT hour, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM ev GROUP BY 1)
SELECT hest.hour, hest.est_users, hexa.n_users
FROM hest JOIN hexa USING (hour)
"""

    o["graph_butterflies"] = f"""
WITH {_G},
bgi AS MATERIALIZED (SELECT DISTINCT dst AS g, src AS item FROM e),
bsz AS (SELECT g FROM (SELECT g, COUNT(*) AS c FROM bgi GROUP BY 1)
        WHERE c <= {BF_CAP}),
bf AS (SELECT a.item AS s1, b.item AS s2, COUNT(*) AS w
       FROM bgi a JOIN bsz ON bsz.g = a.g
       JOIN bgi b ON b.g = a.g AND a.item < b.item
       GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS wedge_pairs,
       CAST(COALESCE(SUM((w * (w - 1)) // 2), 0) AS BIGINT) AS butterflies
FROM bf
"""

    o["graph_ari"] = f"""
WITH
ala AS MATERIALIZED (SELECT id, label AS la FROM ({_lpa_sync_sql(LPA_SYNC_ITERS)})),
alb AS MATERIALIZED (SELECT id, label AS lb FROM ({_lpa_directed_sql(LPA_ROUNDS)})),
aj AS MATERIALIZED (SELECT ala.la, alb.lb FROM ala JOIN alb USING (id)),
cont AS (SELECT la, lb, COUNT(*) AS nij FROM aj GROUP BY 1, 2),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM aj),
sij AS (SELECT CAST(SUM((nij * (nij - 1)) // 2) AS BIGINT) AS sij FROM cont),
mai AS (SELECT la, CAST(SUM(nij) AS BIGINT) AS ai FROM cont GROUP BY 1),
mbj AS (SELECT lb, CAST(SUM(nij) AS BIGINT) AS bj FROM cont GROUP BY 1),
sa AS (SELECT CAST(SUM((ai * (ai - 1)) // 2) AS BIGINT) AS sa FROM mai),
sb AS (SELECT CAST(SUM((bj * (bj - 1)) // 2) AS BIGINT) AS sb FROM mbj),
mi AS (SELECT SUM((c.nij / nn.n) * LN(nn.n * c.nij / (a.ai * b.bj))) AS mi
       FROM cont c JOIN mai a USING (la) JOIN mbj b USING (lb), nn),
eha AS (SELECT SUM(-(ai / nn.n) * LN(ai / nn.n)) AS ha FROM mai, nn),
ehb AS (SELECT SUM(-(bj / nn.n) * LN(bj / nn.n)) AS hb FROM mbj, nn)
SELECT nn.n,
       ROUND((sij.sij - (CAST(sa.sa AS DOUBLE) * sb.sb
                         / ((nn.n * (nn.n - 1)) // 2)))
             / ((sa.sa + sb.sb) / 2.0
                - (CAST(sa.sa AS DOUBLE) * sb.sb
                   / ((nn.n * (nn.n - 1)) // 2))), 6) AS ari,
       ROUND(mi.mi / SQRT(eha.ha * ehb.hb), 6) AS nmi
FROM nn, sij, sa, sb, mi, eha, ehb
"""

    o["graph_collective_influence"] = f"""
WITH {_G},
cdeg AS (SELECT src AS id, COUNT(*) AS k FROM sym GROUP BY 1),
cmid AS (SELECT id AS x FROM cdeg WHERE k <= {CI_DEG_CAP}),
ctwo AS (SELECT DISTINCT s1.src AS v, s2.dst AS u
         FROM sym s1 JOIN cmid ON cmid.x = s1.dst
         JOIN sym s2 ON s2.src = s1.dst
         WHERE s1.src <> s2.dst),
cexa AS (SELECT t.v, t.u FROM ctwo t
         LEFT JOIN sym d ON d.src = t.v AND d.dst = t.u
         WHERE d.src IS NULL),
cbnd AS (SELECT t.v AS id, CAST(SUM(d.k - 1) AS BIGINT) AS bsum
         FROM cexa t JOIN cdeg d ON d.id = t.u GROUP BY 1)
SELECT v.id,
       CAST((COALESCE(d.k, 0) - 1) * COALESCE(b.bsum, 0) AS BIGINT) AS ci
FROM v LEFT JOIN cdeg d USING (id) LEFT JOIN cbnd b USING (id)
"""

    o["emb_mips_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT q.query_id, c.vec_id, list_dot_product(c.v, q.qv) AS score
      FROM c CROSS JOIN q WHERE c.vec_id <> q.query_id),
r AS (SELECT query_id, vec_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank FROM s)
SELECT query_id, vec_id, ROUND(score, 6) AS score, rank FROM r WHERE rank <= {TOPK}
"""

    o["docs_containment"] = f"""
WITH {_TOKS},
{_TOKPOS},
{_SHINGLES},
okdf AS (SELECT shingle FROM
         (SELECT shingle, COUNT(*) AS c FROM sh GROUP BY 1)
         WHERE c <= {CONTAIN_MAXDF}),
shf AS MATERIALIZED (SELECT sh.doc_id, sh.shingle FROM sh
                     JOIN okdf USING (shingle)),
sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM shf GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM shf a JOIN shf b
          ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b,
       ROUND(CAST(i AS DOUBLE) / sa.n_sh, 6) AS containment
FROM inter JOIN sz sa ON sa.doc_id = doc_a
WHERE CAST(i AS DOUBLE) / sa.n_sh >= {CONTAIN_TAU}
"""

    o["docs_pmi_graph"] = f"""
WITH {_TOKS},
toksd AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(l) AS tok FROM toks),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
tdf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM toksd GROUP BY tok),
pairs AS (SELECT a.tok AS tok_a, b.tok AS tok_b,
          CAST(COUNT(*) AS BIGINT) AS n_pair
          FROM toksd a JOIN toksd b ON b.doc_id = a.doc_id AND a.tok < b.tok
          GROUP BY 1, 2 HAVING COUNT(*) >= {PMI_MIN_PAIR})
SELECT p.tok_a, p.tok_b, p.n_pair,
       ROUND(LN(p.n_pair * nd.n / (da.df * db.df)), 6) AS pmi
FROM pairs p
JOIN tdf da ON da.tok = p.tok_a
JOIN tdf db ON db.tok = p.tok_b, nd
"""

    o["graph_triad_census"] = f"""
WITH {_G},
u AS MATERIALIZED (SELECT DISTINCT LEAST(src,dst) AS a, GREATEST(src,dst) AS b
     FROM e WHERE src <> dst),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS t3 FROM
      (SELECT 1 FROM u e1 JOIN u e2 ON e2.a = e1.b
       JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b)),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM u),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices FROM v),
deg AS (SELECT id, COUNT(*) AS d FROM
        (SELECT a AS id FROM u UNION ALL SELECT b FROM u) GROUP BY id),
w AS (SELECT CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS w FROM deg),
agg AS (SELECT n.n_vertices, m.n_edges, w.w, t.t3,
        CAST(w.w - 3 * t.t3 AS BIGINT) AS path,
        CAST(m.n_edges * (n.n_vertices - 2)
             - 2 * (w.w - 3 * t.t3) - 3 * t.t3 AS BIGINT) AS one
        FROM n, m, w, t)
SELECT n_vertices, n_edges,
       CAST(n_vertices * (n_vertices - 1) * (n_vertices - 2) // 6
            - one - path - t3 AS BIGINT) AS triads_empty,
       one AS triads_one_edge, path AS triads_path,
       t3 AS triads_triangle
FROM agg
"""

    o["graph_vertex_cut"] = f"""
WITH {_G},
grid AS MATERIALIZED (SELECT src, dst,
     (('0x' || substr(md5(src::VARCHAR || ':r'), 1, 8))::BIGINT % {VCUT_ROWS})
       * {VCUT_COLS}
     + (('0x' || substr(md5(dst::VARCHAR || ':c'), 1, 8))::BIGINT % {VCUT_COLS})
     AS shard FROM e),
oned AS MATERIALIZED (SELECT src, dst,
     ('0x' || substr(md5(src::VARCHAR || '-' || dst::VARCHAR || ':e'), 1, 8))::BIGINT
       % {VCUT_ROWS * VCUT_COLS} AS shard FROM e),
nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM v),
g_mx AS (SELECT CAST(MAX(m) AS BIGINT) AS max_shard_edges FROM
         (SELECT shard, COUNT(*) AS m FROM grid GROUP BY shard)),
g_cp AS (SELECT CAST(COUNT(*) AS BIGINT) AS copies FROM
         (SELECT DISTINCT id, shard FROM
          (SELECT src AS id, shard FROM grid
           UNION ALL SELECT dst, shard FROM grid))),
o_mx AS (SELECT CAST(MAX(m) AS BIGINT) AS max_shard_edges FROM
         (SELECT shard, COUNT(*) AS m FROM oned GROUP BY shard)),
o_cp AS (SELECT CAST(COUNT(*) AS BIGINT) AS copies FROM
         (SELECT DISTINCT id, shard FROM
          (SELECT src AS id, shard FROM oned
           UNION ALL SELECT dst, shard FROM oned)))
SELECT 'grid2d' AS strategy, CAST({VCUT_ROWS * VCUT_COLS} AS BIGINT) AS n_shards,
       g_mx.max_shard_edges,
       CAST(g_cp.copies * 1000000 // nv.nv AS BIGINT) AS replication_x1m
FROM g_mx, g_cp, nv
UNION ALL
SELECT 'edge_hash_1d', CAST({VCUT_ROWS * VCUT_COLS} AS BIGINT),
       o_mx.max_shard_edges,
       CAST(o_cp.copies * 1000000 // nv.nv AS BIGINT)
FROM o_mx, o_cp, nv
"""

    o["graph_motifs"] = f"""
WITH {_G},
pr AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
      COUNT(*) AS n_dir FROM e GROUP BY 1, 2),
dy AS (SELECT COALESCE(SUM(CASE WHEN n_dir = 2 THEN 1 ELSE 0 END), 0) AS mu,
              COALESCE(SUM(CASE WHEN n_dir = 1 THEN 1 ELSE 0 END), 0) AS asym
       FROM pr),
nv AS (SELECT COUNT(*) AS n FROM v),
cy AS (SELECT COUNT(*) AS c FROM e e1
       JOIN e e2 ON e2.src = e1.dst
       JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src
       WHERE e1.src < e1.dst AND e1.src < e2.dst),
tr AS (SELECT COUNT(*) AS c FROM e e1
       JOIN e e2 ON e2.src = e1.dst
       JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
       WHERE e1.src <> e2.dst)
SELECT nv.n AS n_vertices, CAST(dy.mu AS BIGINT) AS mutual_dyads,
       CAST(dy.asym AS BIGINT) AS asym_dyads,
       CAST(nv.n * (nv.n - 1) / 2 - dy.mu - dy.asym AS BIGINT) AS null_dyads,
       cy.c AS cyclic_triangles, tr.c AS transitive_triangles
FROM nv, dy, cy, tr
"""

    o["graph_ego2"] = f"""
WITH {_G},
r1 AS MATERIALIZED (SELECT src AS root, dst AS v FROM e),
r2 AS (SELECT DISTINCT r1.root, e.dst AS v FROM r1 JOIN e ON e.src = r1.v),
reach AS (SELECT DISTINCT root, v FROM
          (SELECT root, v FROM r1 UNION ALL SELECT root, v FROM r2)
          WHERE root <> v),
c AS (SELECT root AS id, COUNT(*) AS ego_size FROM reach GROUP BY 1)
SELECT v.id, COALESCE(c.ego_size, 0) AS ego_size FROM v LEFT JOIN c USING(id)
"""

    o["graph_diameter"] = f"""
WITH RECURSIVE {_G},
s0 AS (SELECT MIN(id) AS id FROM v),
r1(id, d) AS (
    SELECT id, 0 FROM s0
    UNION
    SELECT s.dst, r1.d + 1 FROM r1 JOIN sym s ON s.src = r1.id
    WHERE r1.d < {DIAM_DEPTH}
),
d1 AS (SELECT id, MIN(d) AS d FROM r1 GROUP BY id),
far AS (SELECT id FROM d1 ORDER BY d DESC, id ASC LIMIT 1),
r2(id, d) AS (
    SELECT id, 0 FROM far
    UNION
    SELECT s.dst, r2.d + 1 FROM r2 JOIN sym s ON s.src = r2.id
    WHERE r2.d < {DIAM_DEPTH}
),
d2 AS (SELECT id, MIN(d) AS d FROM r2 GROUP BY id)
SELECT (SELECT id FROM s0) AS start,
       (SELECT CAST(MAX(d) AS BIGINT) FROM d1) AS ecc_start,
       (SELECT id FROM far) AS far_vertex,
       (SELECT CAST(MAX(d) AS BIGINT) FROM d2) AS diameter_lb
"""

    # MSF per-weight histogram from the Kruskal threshold curve: edges
    # of weight t in ANY minimum spanning forest number C(<t) - C(<=t),
    # where C(x) = component count of the subgraph with edges <= x
    # (computed per threshold by recursive-CTE reachability). The
    # derived weight rule has exactly 5 values, so 5 closures suffice.
    _msf_parts = [
        f"WITH RECURSIVE {_G},",
        "uw AS MATERIALIZED (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, "
        "MIN(CAST((src + dst) % 5 + 1 AS DOUBLE)) AS w "
        "FROM e WHERE src <> dst GROUP BY 1, 2),",
        "c0 AS (SELECT COUNT(*) AS n FROM v),",
    ]
    for _t in range(1, 6):
        _msf_parts.append(
            f"sw{_t} AS MATERIALIZED (SELECT a AS src, b AS dst FROM uw WHERE w <= {_t} "
            f"UNION ALL SELECT b, a FROM uw WHERE w <= {_t}),"
        )
        _msf_parts.append(
            f"cc{_t}(id, anc) AS (SELECT id, id FROM v "
            f"UNION SELECT s.dst, cc.anc FROM cc{_t} cc JOIN sw{_t} s ON s.src = cc.id),"
        )
        _msf_parts.append(
            f"c{_t} AS (SELECT COUNT(DISTINCT m) AS n FROM "
            f"(SELECT id, MIN(anc) AS m FROM cc{_t} GROUP BY id)),"
        )
    _msf_parts.append(
        "hist AS ("
        + " UNION ALL ".join(
            f"SELECT CAST({_t} AS DOUBLE) AS weight, "
            f"(SELECT n FROM c{_t - 1}) - (SELECT n FROM c{_t}) AS n_edges"
            for _t in range(1, 6)
        )
        + ")"
    )
    o["graph_msf"] = (
        "\n".join(_msf_parts) + "\nSELECT weight, n_edges FROM hist WHERE n_edges > 0"
    )

    o["graph_copurchase"] = f"""
WITH gi AS MATERIALIZED (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
                         FROM lineitem),
pairs AS (SELECT a.item AS src, b.item AS dst, COUNT(*) AS weight
          FROM gi a JOIN gi b ON b.g = a.g AND a.item < b.item
          GROUP BY 1, 2)
SELECT src, dst, weight FROM pairs
ORDER BY weight DESC, src, dst LIMIT {COPURCHASE_K}
"""

    o["docs_winnowing"] = f"""
WITH {_TOKS}, {_TOKPOS},
kg AS MATERIALIZED (
  SELECT a.doc_id, a.pos,
         ('0x' || substr(md5(a.tok || ' ' || b.tok || ' ' || c.tok || ' ' || d.tok),
          1, 8))::BIGINT AS h
  FROM tokpos a
  JOIN tokpos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN tokpos c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  JOIN tokpos d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3),
mem AS (SELECT doc_id, pos, h, unnest(generate_series(pos - {WINNOW_W - 1}, pos)) AS s
        FROM kg),
rn AS (SELECT doc_id, s, pos, h,
              ROW_NUMBER() OVER (PARTITION BY doc_id, s ORDER BY h ASC, pos DESC) AS rn,
              COUNT(*) OVER (PARTITION BY doc_id, s) AS n
       FROM mem WHERE s >= 1)
SELECT DISTINCT doc_id, pos, h AS fp FROM rn WHERE rn = 1 AND n = {WINNOW_W}
"""

    # wedge enumeration through capped-degree intermediaries, the exact
    # shape operators/link_prediction.py declares (cap replayed here)
    o["graph_link_prediction"] = f"""
WITH {_G},
deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY 1),
nb AS (SELECT s.src AS z, s.dst AS nbr, deg.d AS dz
       FROM sym s JOIN deg ON deg.id = s.src
       WHERE deg.d <= {LP_DEG_CAP}),
pairs AS (SELECT a.nbr AS src, b.nbr AS dst, COUNT(*) AS cn,
                 SUM(1.0 / ln(CAST(a.dz AS DOUBLE))) AS aa
          FROM nb a JOIN nb b ON b.z = a.z AND a.nbr < b.nbr
          GROUP BY 1, 2),
cand AS (SELECT p.src, p.dst, p.cn, p.aa FROM pairs p
         LEFT JOIN sym s ON s.src = p.src AND s.dst = p.dst
         WHERE s.src IS NULL)
SELECT src, dst, cn, ROUND(aa, 6) AS aa FROM cand
ORDER BY cn DESC, src, dst LIMIT {LP_TOPK}
"""

    o["graph_assortativity"] = f"""
WITH {_G},
deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY 1)
SELECT ROUND(corr(CAST(ds.d AS DOUBLE), CAST(dd.d AS DOUBLE)), 6) AS assortativity
FROM sym JOIN deg ds ON ds.id = sym.src JOIN deg dd ON dd.id = sym.dst
"""

    # knn(k) degree-correlation curve (operators/link_prediction.py
    # avg_neighbor_degree): avg over degree-k nodes of mean neighbor degree
    o["graph_knn_degree"] = f"""
WITH {_G},
deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY 1),
pn AS (SELECT sym.src AS id, AVG(CAST(dd.d AS DOUBLE)) AS annd
       FROM sym JOIN deg dd ON dd.id = sym.dst GROUP BY 1)
SELECT deg.d AS k, ROUND(AVG(pn.annd), 6) AS knn
FROM pn JOIN deg ON deg.id = pn.id GROUP BY 1
"""

    o["docs_top_terms"] = f"""
WITH {_TOKS},
t AS (SELECT doc_id, unnest(l) AS term FROM toks)
SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM t GROUP BY term ORDER BY tf DESC, term LIMIT {TOP_TERMS_K}
"""

    o["docs_unigram_logprob"] = f"""
WITH {_TOKS},
t AS MATERIALIZED (SELECT doc_id, unnest(l) AS term FROM toks),
dt AS (SELECT doc_id, term, COUNT(*) AS c FROM t GROUP BY 1, 2),
vocab AS MATERIALIZED (SELECT term, COUNT(*) AS tf FROM t GROUP BY 1),
tot AS (SELECT SUM(tf)::DOUBLE AS total FROM vocab),
sc AS (SELECT dt.doc_id, SUM(dt.c) AS n_tokens,
              SUM(dt.c * ln(vocab.tf / (SELECT total FROM tot))) / SUM(dt.c)
              AS avg_logprob
       FROM dt JOIN vocab USING(term) GROUP BY 1)
SELECT d.doc_id, CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
       ROUND(sc.avg_logprob, 6) AS avg_logprob
FROM documents d LEFT JOIN sc USING(doc_id)
"""

    # interpolated bigram LM (functions/text.py bigram_logprob):
    # p(w2|w1) = λ·c(w1,w2)/c(w1·) + (1−λ)·tf(w2)/total, λ dyadic
    o["docs_bigram_logprob"] = f"""
WITH {_TOKS}, {_TOKPOS},
big AS MATERIALIZED (
  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
  FROM tokpos a JOIN tokpos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
cb AS MATERIALIZED (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
cw AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cw FROM cb GROUP BY 1),
t AS MATERIALIZED (SELECT doc_id, unnest(l) AS term FROM toks),
uni AS (SELECT term, COUNT(*) AS tf FROM t GROUP BY 1),
tot AS (SELECT COUNT(*)::DOUBLE AS total FROM t),
sc AS (SELECT big.doc_id, COUNT(*) AS n_bigrams,
              SUM(LN({BIGRAM_LAMBDA} * (cb.cb::DOUBLE / cw.cw::DOUBLE)
                     + {1.0 - BIGRAM_LAMBDA} * (uni.tf::DOUBLE / (SELECT total FROM tot))))
              / COUNT(*) AS avg_logprob
       FROM big JOIN cb ON cb.w1 = big.w1 AND cb.w2 = big.w2
                JOIN cw ON cw.w1 = big.w1
                JOIN uni ON uni.term = big.w2
       GROUP BY 1)
SELECT d.doc_id, CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       ROUND(sc.avg_logprob, 6) AS avg_logprob
FROM documents d LEFT JOIN sc USING(doc_id)
"""

    # DSIR hashed-unigram importance log-weights (target LM = en docs,
    # raw LM = whole corpus; 256 md5-prefix buckets, add-one smoothing)
    o["docs_dsir"] = f"""
WITH {_TOKS},
t AS MATERIALIZED (SELECT doc_id, unnest(l) AS term FROM toks),
tk AS MATERIALIZED (SELECT t.doc_id, substr(md5(t.term),1,2) AS bk,
                           CASE WHEN d.lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END AS tg
                    FROM t JOIN documents d USING(doc_id)),
bs AS (SELECT bk, COUNT(*) AS cr, SUM(tg) AS ct FROM tk GROUP BY 1),
tot AS (SELECT SUM(cr)::DOUBLE AS r, SUM(ct)::DOUBLE AS t FROM bs),
lr AS (SELECT bk, ln((ct + 1.0)/((SELECT t FROM tot) + 256.0))
                 - ln((cr + 1.0)/((SELECT r FROM tot) + 256.0)) AS lw FROM bs),
dw AS (SELECT tk.doc_id, COUNT(*) AS n_tokens, SUM(lr.lw) AS w
       FROM tk JOIN lr USING(bk) GROUP BY 1)
SELECT d.doc_id, CAST(COALESCE(dw.n_tokens, 0) AS BIGINT) AS n_tokens,
       ROUND(COALESCE(dw.w, 0.0), 6) AS dsir_logweight
FROM documents d LEFT JOIN dw USING(doc_id)
"""

    o["emb_near_dup"] = f"""
WITH corpus0 AS (SELECT vec_id, embedding FROM embeddings),
{_LSH_CTES},
e2 AS (SELECT c.vec_id, c.embedding::DOUBLE[] AS vec, bk.bucket
       FROM corpus0 c JOIN bk USING(vec_id)),
pairs AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 list_cosine_similarity(a.vec, b.vec) AS score
          FROM e2 a JOIN e2 b ON b.bucket = a.bucket AND a.vec_id < b.vec_id)
SELECT DISTINCT vec_a, vec_b, ROUND(score, 6) AS score
FROM pairs WHERE score >= {NEARDUP_TAU}
"""

    o["emb_ann_lsh"] = f"""
WITH corpus0 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
{_LSH_CTES},
e2 AS (SELECT c.vec_id, c.embedding::DOUBLE[] AS vec, bk.bucket
       FROM corpus0 c JOIN bk USING(vec_id)),
s AS (SELECT q.vec_id AS query_id, c.vec_id,
             list_cosine_similarity(c.vec, q.vec) AS score
      FROM e2 c JOIN e2 q ON q.bucket = c.bucket AND c.vec_id <> q.vec_id),
r AS (SELECT query_id, vec_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank FROM s)
SELECT query_id, vec_id, ROUND(score, 6) AS score, rank FROM r WHERE rank <= {TOPK}
"""

    o["emb_ivf_topk"] = f"""
WITH cents AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cvec
               FROM embeddings ORDER BY vec_id LIMIT {IVF_CENTROIDS}),
corpus AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
asg AS (SELECT vec_id, vec, cell FROM (
          SELECT c.vec_id, c.vec, ct.cent_id AS cell,
                 ROW_NUMBER() OVER (PARTITION BY c.vec_id
                     ORDER BY list_cosine_similarity(c.vec, ct.cvec) DESC,
                              ct.cent_id ASC) AS rn
          FROM corpus c CROSS JOIN cents ct) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, vec AS qvec FROM corpus WHERE vec_id < 5),
probes AS (SELECT query_id, qvec, cell FROM (
             SELECT q.query_id, q.qvec, ct.cent_id AS cell,
                    ROW_NUMBER() OVER (PARTITION BY q.query_id
                        ORDER BY list_cosine_similarity(q.qvec, ct.cvec) DESC,
                                 ct.cent_id ASC) AS rn
             FROM q CROSS JOIN cents ct) WHERE rn <= {IVF_PROBE}),
s AS (SELECT p.query_id, a.vec_id, list_cosine_similarity(a.vec, p.qvec) AS score
      FROM asg a JOIN probes p ON p.cell = a.cell WHERE a.vec_id <> p.query_id),
r AS (SELECT query_id, vec_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank FROM s)
SELECT query_id, vec_id, ROUND(score, 6) AS score, rank FROM r WHERE rank <= {TOPK}
"""

    o["emb_ivf_trained_topk"] = _kmeans_ctes(KMEANS_K, KMEANS_ITERS) + f""",
cents AS (SELECT cid AS cent_id, cv AS cvec FROM c{KMEANS_ITERS}),
corpus AS (SELECT vec_id, v AS vec FROM emb),
asg AS (SELECT vec_id, vec, cell FROM (
          SELECT c.vec_id, c.vec, ct.cent_id AS cell,
                 ROW_NUMBER() OVER (PARTITION BY c.vec_id
                     ORDER BY list_cosine_similarity(c.vec, ct.cvec) DESC,
                              ct.cent_id ASC) AS rn
          FROM corpus c CROSS JOIN cents ct) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, vec AS qvec FROM corpus WHERE vec_id < 5),
probes AS (SELECT query_id, qvec, cell FROM (
             SELECT q.query_id, q.qvec, ct.cent_id AS cell,
                    ROW_NUMBER() OVER (PARTITION BY q.query_id
                        ORDER BY list_cosine_similarity(q.qvec, ct.cvec) DESC,
                                 ct.cent_id ASC) AS rn
             FROM q CROSS JOIN cents ct) WHERE rn <= {IVF_PROBE}),
s AS (SELECT p.query_id, a.vec_id, list_cosine_similarity(a.vec, p.qvec) AS score
      FROM asg a JOIN probes p ON p.cell = a.cell WHERE a.vec_id <> p.query_id),
r AS (SELECT query_id, vec_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank FROM s)
SELECT query_id, vec_id, ROUND(score, 6) AS score, rank FROM r WHERE rank <= {TOPK}
"""

    o["events_sessions"] = f"""
WITH o AS (SELECT user_id, ts, value,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY ts) <= {SESSION_GAP_MIN * 60 * 1000000}
         THEN 0 ELSE 1 END AS new_sess
    FROM events),
x AS (SELECT user_id, ts, value,
      SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
          ROWS UNBOUNDED PRECEDING) AS sess_no FROM o)
SELECT user_id,
       ROUND(epoch_us(MIN(ts)) / 1000000.0, 6) AS session_start,
       ROUND(epoch_us(MAX(ts)) / 1000000.0, 6) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM x GROUP BY user_id, sess_no
"""

    o["docs_token_stats"] = f"""
WITH {_TOKS}
SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
       md5(array_to_string(l, ' ')) AS fingerprint
FROM toks
"""

    lang_scores = ", ".join(
        f"len(regexp_extract_all(lower(text), '\\b({'|'.join(w)})\\b')) AS s_{lang}"
        for lang, w in [
            ("en", ["the", "and", "of", "to", "a"]),
            ("de", ["der", "die", "und", "das", "ist"]),
            ("fr", ["le", "la", "les", "et", "des"]),
            ("es", ["el", "los", "las", "que", "una"]),
        ]
    )
    o["docs_language_id"] = f"""
WITH s AS (SELECT doc_id, {lang_scores} FROM documents)
SELECT doc_id,
  CASE WHEN s_en=0 AND s_de=0 AND s_fr=0 AND s_es=0 THEN 'und'
       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       WHEN s_fr >= s_es THEN 'fr'
       ELSE 'es' END AS lang_pred
FROM s
"""

    stop_pat = r"\b(the|a|and|of|to|in|is|on|for|with)\b"
    o["docs_quality"] = f"""
WITH {_TOKS},
base AS (
  SELECT d.doc_id,
         CAST(len(t.l) AS DOUBLE) AS n_tok,
         CAST(len(regexp_extract_all(d.text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS punct,
         CAST(len(regexp_extract_all(lower(d.text), '{stop_pat}')) AS DOUBLE) AS stop_hits,
         CAST(d.n_chars AS DOUBLE) AS n_chars
  FROM documents d JOIN toks t USING(doc_id))
SELECT doc_id, ROUND(CAST(
    (CASE WHEN n_tok >= 10 THEN 1.0 ELSE 0.0 END) * 0.4
  + (CASE WHEN punct / GREATEST(n_chars, 1.0) < 0.2 THEN 1.0 ELSE 0.0 END) * 0.3
  + (CASE WHEN stop_hits / GREATEST(n_tok, 1.0) > 0.01
           AND stop_hits / GREATEST(n_tok, 1.0) < 0.6 THEN 1.0 ELSE 0.0 END) * 0.3
 AS DOUBLE), 6) AS quality FROM base
"""

    # funnel: same quality expression (UNROUNDED, as the Spark filter
    # compares the raw score), same md5 eval draw, same 3-shingles
    from incubator_hugegraph_computer_spark.functions.sampling import (
        hex_threshold,
    )

    o["docs_curation_funnel"] = f"""
WITH {_TOKS}, {_TOKPOS}, {_SHINGLES},
base AS (
  SELECT d.doc_id, md5(d.text) AS h, CAST(len(t.l) AS BIGINT) AS ntok,
         (CASE WHEN CAST(len(t.l) AS DOUBLE) >= 10 THEN 1.0 ELSE 0.0 END) * 0.4
       + (CASE WHEN CAST(len(regexp_extract_all(d.text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                    / GREATEST(CAST(d.n_chars AS DOUBLE), 1.0) < 0.2 THEN 1.0 ELSE 0.0 END) * 0.3
       + (CASE WHEN CAST(len(regexp_extract_all(lower(d.text), '{stop_pat}')) AS DOUBLE)
                    / GREATEST(CAST(len(t.l) AS DOUBLE), 1.0) > 0.01
                AND CAST(len(regexp_extract_all(lower(d.text), '{stop_pat}')) AS DOUBLE)
                    / GREATEST(CAST(len(t.l) AS DOUBLE), 1.0) < 0.6 THEN 1.0 ELSE 0.0 END) * 0.3
         AS q,
         substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < '{hex_threshold(DECON_EVAL_RATE)}' AS ev
  FROM documents d JOIN toks t USING(doc_id)),
s1 AS (SELECT b.* FROM base b
       JOIN (SELECT h, MIN(doc_id) AS doc_id FROM base GROUP BY h) c
       ON c.h = b.h AND c.doc_id = b.doc_id),
s2 AS (SELECT * FROM s1 WHERE q >= 0.7),
s3 AS (SELECT * FROM s2 WHERE NOT ev),
evsh AS (SELECT DISTINCT sh.shingle FROM sh JOIN base ON base.doc_id = sh.doc_id AND base.ev),
bad AS (SELECT DISTINCT sh.doc_id FROM sh JOIN s3 USING(doc_id) JOIN evsh USING(shingle)),
s4 AS (SELECT s3.* FROM s3 ANTI JOIN bad USING(doc_id))
SELECT 0 AS stage_idx, 'raw' AS stage, COUNT(*) AS n_docs,
       CAST(COALESCE(SUM(ntok), 0) AS BIGINT) AS n_tokens FROM base
UNION ALL SELECT 1, 'exact_dedup', COUNT(*), CAST(COALESCE(SUM(ntok), 0) AS BIGINT) FROM s1
UNION ALL SELECT 2, 'quality', COUNT(*), CAST(COALESCE(SUM(ntok), 0) AS BIGINT) FROM s2
UNION ALL SELECT 3, 'holdout', COUNT(*), CAST(COALESCE(SUM(ntok), 0) AS BIGINT) FROM s3
UNION ALL SELECT 4, 'decontaminated', COUNT(*), CAST(COALESCE(SUM(ntok), 0) AS BIGINT) FROM s4
"""

    o["docs_repetition"] = f"""
WITH {_TOKS},
base AS (
  SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n_tokens,
         len(list_distinct(l)) AS n_distinct,
         GREATEST(len(l) - 1, 0) AS n_bigrams,
         CASE WHEN len(l) < 2 THEN 0
              ELSE len(list_distinct(list_transform(
                     list_zip(l[:len(l)-1], l[2:]),
                     x -> x[1] || '_' || x[2]))) END AS n_bi_dist
  FROM toks),
tokcnt AS (
  SELECT b.doc_id, u.tok, COUNT(*) AS c
  FROM base b, UNNEST(b.l) AS u(tok) GROUP BY 1, 2),
top AS (SELECT doc_id, MAX(c) AS top_cnt FROM tokcnt GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens,
  ROUND(CASE WHEN b.n_tokens = 0 THEN 0.0
        ELSE 1.0 - b.n_distinct / CAST(b.n_tokens AS DOUBLE) END, 6) AS dup_word_frac,
  ROUND(COALESCE(t.top_cnt / CAST(NULLIF(b.n_tokens, 0) AS DOUBLE), 0.0), 6)
    AS top_word_share,
  ROUND(CASE WHEN b.n_bigrams = 0 THEN 0.0
        ELSE 1.0 - b.n_bi_dist / CAST(b.n_bigrams AS DOUBLE) END, 6) AS dup_bigram_frac
FROM base b LEFT JOIN top t USING(doc_id)
"""

    o["docs_exact_dedup"] = """
WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
g AS (SELECT h, MIN(doc_id) AS canonical_id, COUNT(*) AS group_size FROM h GROUP BY h)
SELECT h.doc_id, g.canonical_id, g.group_size FROM h JOIN g USING(h)
"""

    o["docs_tfidf"] = f"""
WITH {_TOKS},
tok AS (SELECT doc_id, unnest(l) AS keyword FROM toks),
tf AS (SELECT doc_id, keyword, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT keyword, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.keyword, tf.tf,
        CAST(tf.tf AS DOUBLE) * (ln(((SELECT n FROM n) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) + 1.0) AS score
      FROM tf JOIN dfq USING(keyword)),
r AS (SELECT doc_id, keyword, tf, score,
        CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, keyword ASC) AS INT) AS rank
      FROM s)
SELECT doc_id, rank, keyword, tf, ROUND(score, 6) AS score FROM r WHERE rank <= 3
"""

    o["docs_span_dedup"] = f"""
WITH {_TOKS},
sp AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(l) - {SPAN_N - 1}),
                               i -> array_to_string(l[i:i+{SPAN_N - 1}], ' '))) AS span
  FROM toks WHERE len(l) >= {SPAN_N}),
shared AS (SELECT span FROM (SELECT DISTINCT doc_id, span FROM sp) GROUP BY span HAVING COUNT(*) >= 2),
tot AS (SELECT doc_id, COUNT(*) AS n_spans FROM sp GROUP BY 1),
dup AS (SELECT sp.doc_id, COUNT(*) AS d FROM sp JOIN shared USING(span) GROUP BY 1)
SELECT docs.doc_id, COALESCE(t.n_spans, 0) AS n_spans,
       ROUND(COALESCE(CAST(dup.d AS DOUBLE) / CAST(t.n_spans AS DOUBLE), 0.0), 6) AS dup_span_frac
FROM documents docs LEFT JOIN tot t USING(doc_id) LEFT JOIN dup USING(doc_id)
"""

    o["emb_kmeans"] = _kmeans_sql(KMEANS_K, KMEANS_ITERS)
    o["emb_pq_topk"] = _pq_sql(
        PQ_M, EMB_DIM // PQ_M, KMEANS_K, KMEANS_ITERS, PQ_QUERY_MAX, TOPK
    )
    o["emb_ivfpq_topk"] = _ivfpq_sql(
        IVF_CENTROIDS, IVF_PROBE, PQ_M, EMB_DIM // PQ_M, KMEANS_K,
        KMEANS_ITERS, PQ_QUERY_MAX, TOPK,
    )

    # SQ8 scalar quantization: per-dim [min,max] stats, 8-bit codes,
    # asymmetric L2 vs the dequantized corpus; the (q_j - recon_j)²
    # terms fold in dimension order on both engines (list_sum over
    # list_zip == the Spark side's F.aggregate over zip_with).
    o["emb_sq_topk"] = f"""
WITH emb AS MATERIALIZED (SELECT vec_id,
       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
pe AS (SELECT vec_id, unnest(v) AS x,
       unnest(generate_series(1, len(v))) AS j FROM emb),
st AS (SELECT j, MIN(x) AS mn, MAX(x) AS mx FROM pe GROUP BY j),
sv AS (SELECT list(mn ORDER BY j) AS mns,
              list(CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END
                   ORDER BY j) AS scs FROM st),
enc AS MATERIALIZED (SELECT e.vec_id,
       list_transform(list_zip(e.v, sv.mns, sv.scs),
         p -> p[2] + LEAST(255.0, GREATEST(0.0, ROUND((p[1] - p[2]) / p[3]))) * p[3]
       ) AS recon
       FROM emb e CROSS JOIN sv),
qs AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < {PQ_QUERY_MAX}),
scored AS (SELECT q.query_id, e.vec_id,
       list_sum(list_transform(list_zip(q.qv, e.recon),
                p -> (p[1] - p[2]) * (p[1] - p[2]))) AS adc
       FROM qs q CROSS JOIN enc e WHERE e.vec_id <> q.query_id)
SELECT query_id, vec_id, ROUND(adc, 6) AS adc, rank FROM (
    SELECT query_id, vec_id, adc,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc, vec_id)
                AS INT) AS rank
    FROM scored) WHERE rank <= {TOPK}
"""

    o["emb_semantic_dedup"] = _semantic_dedup_sql(KMEANS_K, KMEANS_ITERS, NEARDUP_TAU)

    from incubator_hugegraph_computer_spark.functions.sampling import hex_threshold

    _strata_case = " ".join(
        f"WHEN '{s}' THEN '{hex_threshold(r)}'" for s, r in sorted(STRATA_RATES.items())
    )
    _bm25_in = ", ".join(f"'{t}'" for t in sorted(set(BM25_TERMS)))
    o["docs_bm25"] = f"""
WITH {_TOKS},
tok AS (SELECT doc_id, unnest(l) AS term FROM toks),
lens AS (SELECT d.doc_id, COALESCE(len(t.l), 0) AS dl
         FROM documents d LEFT JOIN toks t USING(doc_id)),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
       WHERE term IN ({_bm25_in}) GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
gstats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM lens),
per AS (SELECT tf.doc_id,
          ln(1.0 + ((SELECT n FROM gstats) - df + 0.5) / (df + 0.5))
          * (CAST(tf AS DOUBLE) * ({BM25_K1} + 1.0)
             / (CAST(tf AS DOUBLE) + {BM25_K1} * ((1.0 - {BM25_B}) + {BM25_B} * dl / (SELECT avgdl FROM gstats)))) AS s
        FROM tf JOIN dfq USING(term) JOIN lens USING(doc_id)),
sc AS (SELECT doc_id, COUNT(*) AS n_hits, SUM(s) AS score FROM per GROUP BY 1)
SELECT d.doc_id, COALESCE(sc.n_hits, 0) AS n_hits,
       ROUND(COALESCE(sc.score, 0.0), 6) AS score
FROM documents d LEFT JOIN sc USING(doc_id)
"""

    _mix_share = " ".join(
        f"WHEN '{d}' THEN {float(s)!r}" for d, s in sorted(DOMAIN_MIX_TARGETS.items())
    )
    o["docs_domain_mix"] = f"""
WITH shares AS (SELECT doc_id, lang, CASE lang {_mix_share} ELSE 0.0 END AS share
                FROM documents),
cnt AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS c,
               CASE lang {_mix_share} ELSE 0.0 END AS share
        FROM shares WHERE share > 0 GROUP BY lang),
budget AS (SELECT MIN(c / share) AS t FROM cnt),
rated AS (SELECT s.doc_id, s.lang, c.share * (SELECT t FROM budget) / c.c AS rate
          FROM shares s JOIN cnt c USING(lang) WHERE s.share > 0)
SELECT doc_id, lang FROM rated
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE WHEN rate >= 1.0 THEN 'g'
           ELSE printf('%08x', CAST(floor(rate * 4294967296.0) AS BIGINT)) END
"""

    from incubator_hugegraph_computer_spark.functions.text import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
    )

    o["docs_redact_pii"] = f"""
WITH seeded AS (
  SELECT doc_id,
         concat('user', CAST(doc_id AS VARCHAR), '@example.com ping 10.0.0.',
                CAST(doc_id % 256 AS VARCHAR), ' call +12 345-67',
                printf('%02d', doc_id % 100), ' ', text) AS t
  FROM documents),
s1 AS (SELECT doc_id,
         len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS n_emails,
         regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t
       FROM seeded),
s2 AS (SELECT doc_id, n_emails,
         len(regexp_extract_all(t, '{PII_IP_RE}')) AS n_ips,
         regexp_replace(t, '{PII_IP_RE}', '<IP>', 'g') AS t
       FROM s1),
s3 AS (SELECT doc_id, n_emails, n_ips,
         len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS n_phones,
         regexp_replace(t, '{PII_PHONE_RE}', '<PHONE>', 'g') AS t
       FROM s2)
SELECT doc_id, n_emails, n_ips, n_phones, md5(t) AS clean_fp FROM s3
"""

    o["docs_length_buckets"] = """
WITH th AS (SELECT lang,
              quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS q_lo,
              quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS q_hi
            FROM documents GROUP BY 1)
SELECT d.doc_id, d.lang,
       CASE WHEN CAST(d.n_chars AS DOUBLE) <= th.q_lo THEN 'tail'
            WHEN CAST(d.n_chars AS DOUBLE) <= th.q_hi THEN 'middle'
            ELSE 'head' END AS bucket
FROM documents d JOIN th ON d.lang IS NOT DISTINCT FROM th.lang
"""

    # token-mass variant: identical shape, Σn_chars instead of COUNT(*).
    # Integer-valued double sums are exact (≪ 2^53), so the data-
    # dependent rates are bit-identical across engines.
    o["docs_domain_mix_tokens"] = f"""
WITH shares AS (SELECT doc_id, lang, n_chars, CASE lang {_mix_share} ELSE 0.0 END AS share
                FROM documents),
cnt AS (SELECT lang, SUM(CAST(n_chars AS DOUBLE)) AS c,
               CASE lang {_mix_share} ELSE 0.0 END AS share
        FROM shares WHERE share > 0 GROUP BY lang),
budget AS (SELECT MIN(c / share) AS t FROM cnt),
rated AS (SELECT s.doc_id, s.lang, s.n_chars, c.share * (SELECT t FROM budget) / c.c AS rate
          FROM shares s JOIN cnt c USING(lang) WHERE s.share > 0)
SELECT doc_id, lang, n_chars FROM rated
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE WHEN rate >= 1.0 THEN 'g'
           ELSE printf('%08x', CAST(floor(rate * 4294967296.0) AS BIGINT)) END
"""

    o["docs_stratified_sample"] = f"""
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE lang {_strata_case} ELSE '{hex_threshold(STRATA_DEFAULT_RATE)}' END
"""

    # n_tokens: DuckDB SUM(BIGINT) is HUGEINT — cast back (the r01/r02
    # hash-failure class; the type gate enforces this now)
    o["docs_shuffle_shards"] = """
WITH t AS (SELECT doc_id,
                  md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)) AS k,
                  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> x <> '') AS l
           FROM documents)
SELECT substr(k, 1, 1) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(len(l)) AS BIGINT) AS n_tokens,
       MIN(k) AS first_key,
       MAX(k) AS last_key
FROM t GROUP BY 1
"""

    o["docs_split"] = f"""
SELECT doc_id,
       CASE WHEN h < '{hex_threshold(SPLIT_WEIGHTS[0])}' THEN 'train'
            WHEN h < '{hex_threshold(SPLIT_WEIGHTS[0] + SPLIT_WEIGHTS[1])}' THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h FROM documents)
"""

    _decon_thr = hex_threshold(DECON_EVAL_RATE)
    # Bloom screen: bit-for-bit replay of the 65536-bit / 4-hash filter
    # (portable md5-hex hashing); counts cast from HUGEINT
    o["docs_bloom_decontaminate"] = f"""
WITH {_TOKS}, {_TOKPOS}, {_SHINGLES},
ev AS (SELECT doc_id FROM documents
       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{hex_threshold(DECON_EVAL_RATE)}'),
hr AS (SELECT unnest(range(4)) AS r),
evsh AS (SELECT DISTINCT sh.shingle FROM sh JOIN ev USING(doc_id)),
bits AS (SELECT DISTINCT
           CAST(concat('0x', substr(md5(CAST(hr.r AS VARCHAR) || ':' || shingle), 1, 8)) AS BIGINT) % 65536 AS bit
         FROM evsh CROSS JOIN hr),
trsh AS (SELECT sh.doc_id, sh.shingle FROM sh ANTI JOIN ev USING(doc_id)),
trkeys AS (SELECT DISTINCT shingle FROM trsh),
probes AS (SELECT shingle, hr.r,
             CAST(concat('0x', substr(md5(CAST(hr.r AS VARCHAR) || ':' || shingle), 1, 8)) AS BIGINT) % 65536 AS bit
           FROM trkeys CROSS JOIN hr),
flags AS (SELECT shingle,
            (COUNT(*) FILTER (WHERE bits.bit IS NOT NULL) = 4) AS maybe
          FROM probes LEFT JOIN bits USING(bit) GROUP BY 1),
per AS (SELECT trsh.doc_id, COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN flags.maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        FROM trsh JOIN flags USING(shingle) GROUP BY 1),
trdocs AS (SELECT d.doc_id FROM documents d ANTI JOIN ev USING(doc_id))
SELECT trdocs.doc_id,
       COALESCE(per.n_shingles, 0) AS n_shingles,
       COALESCE(per.n_flagged, 0) AS n_flagged
FROM trdocs LEFT JOIN per USING(doc_id)
"""

    o["docs_decontaminate"] = f"""
WITH {_TOKS}, {_TOKPOS}, {_SHINGLES},
ev AS (SELECT doc_id FROM documents
       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_decon_thr}'),
tr AS (SELECT d.doc_id FROM documents d ANTI JOIN ev USING(doc_id)),
evsh AS (SELECT DISTINCT sh.shingle FROM sh JOIN ev USING(doc_id)),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
hits AS (SELECT sh.doc_id, COUNT(*) AS n_contaminated
         FROM sh SEMI JOIN evsh USING(shingle) GROUP BY 1)
SELECT t.doc_id,
       COALESCE(s.n_shingles, 0) AS n_shingles,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       ROUND(COALESCE(CAST(h.n_contaminated AS DOUBLE) / CAST(s.n_shingles AS DOUBLE),
                      0.0), 6) AS contaminated_frac
FROM tr t LEFT JOIN sizes s ON s.doc_id = t.doc_id
LEFT JOIN hits h ON h.doc_id = t.doc_id
"""

    _pack_ctes = f"""{_TOKS},
tc AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens FROM toks),
pl AS (SELECT doc_id, n_tokens,
        COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
       FROM tc),
pk AS (SELECT doc_id, n_tokens, start_offset,
        CAST(start_offset // {PACK_BUDGET} AS BIGINT) AS seq_first,
        CAST(CASE WHEN n_tokens > 0
             THEN (start_offset + n_tokens - 1) // {PACK_BUDGET}
             ELSE start_offset // {PACK_BUDGET} END AS BIGINT) AS seq_last
       FROM pl)"""
    o["docs_chunks"] = f"""
WITH {_TOKS},
g AS (SELECT doc_id, l, generate_series(1, len(l), {CHUNK_STRIDE}) AS gs
      FROM toks WHERE len(l) >= 1),
s AS (SELECT doc_id, l,
             unnest(gs) AS start,
             unnest(generate_series(1, len(gs))) - 1 AS chunk_id
      FROM g)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(list_slice(l, start, start + {CHUNK_WINDOW} - 1)) AS INT) AS n_chunk_tokens,
       array_to_string(list_slice(l, start, start + {CHUNK_WINDOW} - 1), ' ') AS chunk_text
FROM s
"""

    o["docs_pack"] = f"""
WITH {_pack_ctes}
SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
       seq_first, seq_last,
       CAST(CASE WHEN n_tokens > 0 THEN seq_last - seq_first + 1 ELSE 0 END
            AS BIGINT) AS n_seqs
FROM pk
"""

    o["docs_pack_stats"] = f"""
WITH {_pack_ctes}
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST((MAX(start_offset + n_tokens) + {PACK_BUDGET} - 1) // {PACK_BUDGET}
            AS BIGINT) AS n_sequences,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) /
             (((MAX(start_offset + n_tokens) + {PACK_BUDGET} - 1) // {PACK_BUDGET})
              * {PACK_BUDGET}), 6) AS fill_ratio,
       CAST(SUM(CASE WHEN n_tokens > 0 AND seq_last > seq_first THEN 1 ELSE 0 END)
            AS BIGINT) AS n_straddlers
FROM pk
"""

    o["docs_ngram_dedup"] = f"""
WITH {_TOKS}, {_TOKPOS}, {_SHINGLES},
freq_ok AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN freq_ok USING(shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shf GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM shf a JOIN shf b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
j AS (SELECT i.doc_a, i.doc_b,
             CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) AS jaccard
      FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b)
SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard FROM j WHERE jaccard >= 0.2
"""

    # shared CTE chain computing verified minhash near-dup pairs `j`
    minhash_pair_ctes = f"""{_TOKS}, {_TOKPOS}, {_SHINGLES},
seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
mh AS (SELECT sh.doc_id, s.seed,
              MIN(md5(s.seed::VARCHAR || '|' || sh.shingle)) AS minhash
       FROM sh CROSS JOIN seeds s GROUP BY 1, 2),
bk AS (SELECT doc_id, CAST(seed // 4 AS INT) AS band,
              md5(array_to_string(list_sort(list(minhash)), ',')) AS bucket
       FROM mh GROUP BY doc_id, CAST(seed // 4 AS INT)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bk a JOIN bk b ON b.band = a.band AND b.bucket = a.bucket
         AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS i
          FROM cand c JOIN sh a ON a.doc_id = c.doc_a
          JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
          GROUP BY 1, 2),
j AS (SELECT i.doc_a, i.doc_b,
             CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) AS jaccard
      FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b)"""

    o["docs_minhash_dedup"] = (
        f"WITH {minhash_pair_ctes}\n"
        "SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard FROM j WHERE jaccard >= 0.1"
    )

    # recall report: exact-truth pairs (capped-shingle n-gram Jaccard
    # >= 0.2) vs the raw banded-LSH candidate set; counts + recall.
    o["docs_lsh_recall"] = f"""
WITH {_TOKS}, {_TOKPOS}, {_SHINGLES},
freq_ok AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN freq_ok USING(shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shf GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM shf a JOIN shf b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
truth AS (SELECT i.doc_a, i.doc_b
          FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
          JOIN sizes sb ON sb.doc_id = i.doc_b
          WHERE CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) >= 0.2),
seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
mh AS (SELECT sh.doc_id, s.seed,
              MIN(md5(s.seed::VARCHAR || '|' || sh.shingle)) AS minhash
       FROM sh CROSS JOIN seeds s GROUP BY 1, 2),
bk AS (SELECT doc_id, CAST(seed // 4 AS INT) AS band,
              md5(array_to_string(list_sort(list(minhash)), ',')) AS bucket
       FROM mh GROUP BY doc_id, CAST(seed // 4 AS INT)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bk a JOIN bk b ON b.band = a.band AND b.bucket = a.bucket
         AND a.doc_id < b.doc_id),
hits AS (SELECT t.doc_a, t.doc_b FROM truth t
         SEMI JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b)
SELECT (SELECT COUNT(*) FROM truth) AS n_true,
       (SELECT COUNT(*) FROM cand) AS n_candidates,
       (SELECT COUNT(*) FROM hits) AS n_hits,
       ROUND(CASE WHEN (SELECT COUNT(*) FROM truth) > 0
             THEN CAST((SELECT COUNT(*) FROM hits) AS DOUBLE) /
                  CAST((SELECT COUNT(*) FROM truth) AS DOUBLE) END, 6) AS recall
"""

    # delta-vs-corpus: reuse the shingle/minhash/band CTEs, but pair
    # NEW docs (30% hash slice) against CORPUS docs only, keep the best
    # match (max jaccard, ties → lowest corpus id) per new doc.
    _incr_thr = hex_threshold(INCR_NEW_RATE)
    o["docs_incremental_dedup"] = f"""
WITH {_TOKS}, {_TOKPOS}, {_SHINGLES},
seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
mh AS (SELECT sh.doc_id, s.seed,
              MIN(md5(s.seed::VARCHAR || '|' || sh.shingle)) AS minhash
       FROM sh CROSS JOIN seeds s GROUP BY 1, 2),
bk AS (SELECT doc_id, CAST(seed // 4 AS INT) AS band,
              md5(array_to_string(list_sort(list(minhash)), ',')) AS bucket
       FROM mh GROUP BY doc_id, CAST(seed // 4 AS INT)),
nw AS (SELECT doc_id FROM documents
       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_incr_thr}'),
corp AS (SELECT d.doc_id FROM documents d ANTI JOIN nw USING(doc_id)),
cand AS (SELECT DISTINCT a.doc_id, b.doc_id AS corpus_id
         FROM bk a JOIN nw ON nw.doc_id = a.doc_id
         JOIN bk b ON b.band = a.band AND b.bucket = a.bucket
         JOIN corp c ON c.doc_id = b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (SELECT c.doc_id, c.corpus_id, COUNT(*) AS i
          FROM cand c JOIN sh a ON a.doc_id = c.doc_id
          JOIN sh b ON b.doc_id = c.corpus_id AND b.shingle = a.shingle
          GROUP BY 1, 2),
j AS (SELECT i.doc_id, i.corpus_id,
             CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) AS jaccard
      FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_id
      JOIN sizes sb ON sb.doc_id = i.corpus_id
      WHERE CAST(i.i AS DOUBLE) / (sa.n_sh + sb.n_sh - i.i) >= {INCR_TAU}),
best AS (SELECT doc_id, corpus_id, jaccard FROM
         (SELECT doc_id, corpus_id, jaccard, ROW_NUMBER() OVER
            (PARTITION BY doc_id ORDER BY jaccard DESC, corpus_id ASC) AS rn FROM j)
         WHERE rn = 1)
SELECT n.doc_id, best.corpus_id AS dup_of, ROUND(best.jaccard, 6) AS jaccard,
       CASE WHEN best.doc_id IS NULL THEN 1 ELSE 0 END AS keep
FROM nw n LEFT JOIN best ON best.doc_id = n.doc_id
"""

    # transitive near-dup closure: pairs -> undirected graph -> components,
    # canonical = min member (the WCC engine on the Spark side)
    o["docs_dedup_clusters"] = (
        f"WITH RECURSIVE {minhash_pair_ctes},\n"
        "p AS MATERIALIZED (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.1),\n"
        "sp AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM p "
        "UNION SELECT doc_b, doc_a FROM p),\n"
        "cc(id, anc) AS (SELECT doc_id, doc_id FROM documents "
        "UNION SELECT s.b, cc.anc FROM cc JOIN sp s ON s.a = cc.id)\n"
        "SELECT id AS doc_id, MIN(anc) AS canonical_id FROM cc GROUP BY id"
    )

    o["emb_cosine_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT q.query_id, c.vec_id, list_cosine_similarity(c.v, q.qv) AS score
      FROM c CROSS JOIN q WHERE c.vec_id <> q.query_id),
r AS (SELECT query_id, vec_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS INT) AS rank FROM s)
SELECT query_id, vec_id, ROUND(score, 6) AS score, rank FROM r WHERE rank <= {TOPK}
"""

    # Recall@k of the IVF probe vs the brute-force truth — composed
    # from the two oracles above verbatim (nested WITHs are legal as
    # subqueries), so the recall report can never drift from the
    # operators it measures.
    o["emb_ivf_recall"] = f"""
WITH exact AS ({o["emb_cosine_topk"]}),
approx AS ({o["emb_ivf_topk"]}),
hit AS (SELECT e.query_id FROM exact e
        JOIN approx a ON a.query_id = e.query_id AND a.vec_id = e.vec_id),
per AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY 1),
ph AS (SELECT query_id, COUNT(*) AS n_found FROM hit GROUP BY 1)
SELECT per.query_id, per.n_exact, COALESCE(ph.n_found, 0) AS n_found,
       ROUND(COALESCE(ph.n_found, 0) * 1.0 / per.n_exact, 6) AS recall
FROM per LEFT JOIN ph USING(query_id)
"""

    # reuses the shared _LSH_CTES chain (one definition to keep in sync);
    # NULL/empty embeddings surface as the sentinel bucket -1, exactly
    # like functions/similarity.lsh_buckets
    o["emb_lsh_buckets"] = f"""
WITH corpus0 AS (SELECT vec_id, embedding FROM embeddings
                 WHERE embedding IS NOT NULL AND len(embedding) > 0),
{_LSH_CTES}
SELECT vec_id, bucket FROM bk
UNION ALL
SELECT vec_id, CAST(-1 AS BIGINT) AS bucket FROM embeddings
WHERE embedding IS NULL OR len(embedding) = 0
"""

    o["events_funnel"] = """
WITH u AS (SELECT DISTINCT user_id FROM events),
s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 ON s1.user_id = e.user_id
       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 ON s2.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
SELECT u.user_id,
       (CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS step,
       t1 AS t_signup, t2 AS t_view, t3 AS t_purchase
FROM u LEFT JOIN s1 USING(user_id) LEFT JOIN s2 USING(user_id) LEFT JOIN s3 USING(user_id)
"""

    o["events_retention"] = """
WITH acts AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (SELECT user_id, MIN(day) AS cohort_day FROM acts GROUP BY 1),
joined AS (SELECT a.user_id, f.cohort_day,
                  datediff('day', f.cohort_day, a.day) AS day_offset
           FROM acts a JOIN first f USING(user_id)),
cell AS (SELECT cohort_day, day_offset, COUNT(DISTINCT user_id) AS n_users
         FROM joined GROUP BY 1, 2),
sz AS (SELECT cohort_day, n_users AS s FROM cell WHERE day_offset = 0)
SELECT c.cohort_day, c.day_offset, c.n_users,
       ROUND(CAST(c.n_users AS DOUBLE) / sz.s, 6) AS retention
FROM cell c JOIN sz USING(cohort_day)
"""

    o["events_props"] = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
       ROUND(AVG(value), 6) AS avg_value
FROM events GROUP BY 1
"""

    o["events_hourly"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""

    tol_us = ASOF_TOLERANCE_S * 1_000_000
    o["events_asof"] = f"""
WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY 1, 2),
j AS (SELECT p.event_id, p.user_id, p.ts, p.value, c.click_value, c.ts AS cts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts)
SELECT event_id, user_id,
       ROUND(epoch_us(ts) / 1000000.0, 6) AS purchase_ts,
       ROUND(value, 6) AS purchase_value,
       CASE WHEN cts IS NOT NULL AND epoch_us(ts) - epoch_us(cts) <= {tol_us}
            THEN ROUND(click_value, 6) END AS click_value,
       CASE WHEN cts IS NOT NULL AND epoch_us(ts) - epoch_us(cts) <= {tol_us}
            THEN ROUND(epoch_us(cts) / 1000000.0, 6) END AS click_ts
FROM j
"""

    o["events_gapfill"] = """
WITH agg AS (SELECT event_type AS g, date_trunc('hour', ts) AS b,
                    COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
             FROM events GROUP BY 1, 2),
bounds AS (SELECT MIN(date_trunc('hour', ts)) AS lo, MAX(date_trunc('hour', ts)) AS hi FROM events),
spine AS (SELECT g.g, t.b
          FROM (SELECT DISTINCT event_type AS g FROM events) g
          CROSS JOIN (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b FROM bounds) t)
SELECT strftime(spine.b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       spine.g AS event_type,
       COALESCE(agg.n_events, 0) AS n_events,
       agg.sum_value AS sum_value
FROM spine LEFT JOIN agg ON spine.g = agg.g AND spine.b = agg.b
"""

    o["events_interval_join"] = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id,
       COUNT(c.ts) AS n_clicks,
       ROUND(SUM(c.value), 6) AS sum_click_value
FROM p LEFT JOIN c
  ON c.user_id = p.user_id AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
GROUP BY 1, 2
"""

    o["events_transitions"] = """
WITH o AS (SELECT event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                      ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS prev
           FROM events),
c AS (SELECT prev AS prev_type, event_type AS next_type, COUNT(*) AS n
      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, n,
       ROUND(n / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
FROM c
"""

    o["events_heavy_hitters"] = """
WITH hr AS (SELECT unnest(range(4)) AS r),
cells AS (SELECT r,
                 CAST(concat('0x', substr(md5(CAST(r AS VARCHAR) || ':' || event_type), 1, 8)) AS BIGINT) % 1024 AS col,
                 COUNT(*) AS cnt
          FROM events CROSS JOIN hr GROUP BY 1, 2),
probes AS (SELECT DISTINCT event_type AS key FROM events),
pr AS (SELECT key, hr.r AS r,
              CAST(concat('0x', substr(md5(CAST(hr.r AS VARCHAR) || ':' || key), 1, 8)) AS BIGINT) % 1024 AS col
       FROM probes CROSS JOIN hr),
est AS (SELECT key, MIN(COALESCE(c.cnt, 0)) AS est
        FROM pr LEFT JOIN cells c USING(r, col) GROUP BY 1),
ex AS (SELECT event_type AS key, COUNT(*) AS exact FROM events GROUP BY 1)
SELECT est.key, est.est, ex.exact FROM est JOIN ex USING(key)
ORDER BY est DESC, key ASC LIMIT 10
"""

    o["events_sequences"] = f"""
SELECT user_id, COUNT(*) AS n_events,
       array_to_string(list_slice(
           list(event_type ORDER BY ts NULLS FIRST, event_id NULLS FIRST),
           1, {SEQ_MAX_LEN}), ' ') AS seq
FROM events GROUP BY user_id
"""

    o["events_rollup"] = """
SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY ROLLUP(event_type, day)
"""

    # incremental WCC must equal a full recompute — same oracle as graph_wcc
    o["graph_wcc_incremental"] = o["graph_wcc"]

    o["graph_mis"] = _mis_sql(MIS_ROUNDS, MIS_SEED)
    o["graph_matching"] = _matching_sql(MATCH_ROUNDS, MATCH_SEED)
    o["graph_coarsen"] = _coarsen_sql(MATCH_ROUNDS, MATCH_SEED)
    o["graph_heavy_matching"] = _hem_sql(MATCH_ROUNDS, MATCH_SEED)
    o["graph_partition_stats"] = f"""
WITH {_G},
asg AS (SELECT id, id % {PARTITION_K} AS pid FROM v),
tag AS (SELECT a.pid AS p_src, b.pid AS p_dst FROM e
        JOIN asg a ON a.id = e.src JOIN asg b ON b.id = e.dst),
es AS (SELECT p_src AS pid,
              CAST(SUM(CASE WHEN p_src = p_dst THEN 1 ELSE 0 END) AS BIGINT) AS internal_edges,
              CAST(SUM(CASE WHEN p_src <> p_dst THEN 1 ELSE 0 END) AS BIGINT) AS cut_edges
       FROM tag GROUP BY 1),
vs AS (SELECT pid, COUNT(*) AS n_vertices FROM asg GROUP BY 1)
SELECT vs.pid, vs.n_vertices,
       COALESCE(es.internal_edges, 0) AS internal_edges,
       COALESCE(es.cut_edges, 0) AS cut_edges
FROM vs LEFT JOIN es ON es.pid = vs.pid
"""

    o["graph_lpa_seeded"] = _lpa_seeded_sql(SEEDED_ROUNDS, SEEDED_MAX, SEEDED_CLASSES)

    o["graph_hitting_time"] = _hitting_time_sql(HIT_TARGET_MAX, HIT_HORIZON)

    o["graph_landmarks"] = f"""
WITH RECURSIVE {_G},
lm AS (SELECT id FROM v WHERE id <= {LANDMARK_MAX}),
r(landmark, id, d) AS (
    SELECT id, id, 0 FROM lm
    UNION
    SELECT r.landmark, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id WHERE r.d < 30
)
SELECT id, landmark, MIN(d) AS dist FROM r GROUP BY 1, 2
"""

    _doulion_p = int(DOULION_HEX, 16) / float(16 ** len(DOULION_HEX))
    _doulion_scale = (1.0 / _doulion_p) ** 3
    o["graph_triangle_sampled"] = f"""
WITH {_G},
u AS (SELECT DISTINCT LEAST(src,dst) AS a, GREATEST(src,dst) AS b FROM e WHERE src <> dst),
s AS MATERIALIZED (SELECT a, b FROM u WHERE
    md5(CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR) || ':{DOULION_SEED}') < '{DOULION_HEX}'),
t AS (SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
      FROM s e1 JOIN s e2 ON e2.a = e1.b
      JOIN s e3 ON e3.a = e1.a AND e3.b = e2.b),
m AS (SELECT COUNT(*) AS sampled_triangles FROM t),
n AS (SELECT COUNT(*) AS sampled_edges FROM s)
SELECT sampled_edges, sampled_triangles,
       ROUND(sampled_triangles * CAST({_doulion_scale!r} AS DOUBLE), 6) AS est_triangles
FROM n CROSS JOIN m
"""

    o["graph_harmonic"] = f"""
WITH RECURSIVE {_G},
seeds AS (SELECT id FROM v WHERE id <= {HARMONIC_SEED_MAX}),
r(src, tgt, d) AS (
    SELECT id, id, 0 FROM seeds
    UNION
    SELECT r.src, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.tgt WHERE r.d < 30
),
m AS (SELECT src, tgt, MIN(d) AS d FROM r GROUP BY 1, 2),
agg AS (SELECT src, SUM(1.0 / d) AS h, SUM(d) AS sumd, COUNT(*) AS r1
        FROM m WHERE d > 0 GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM v)
SELECT seeds.id,
       ROUND(COALESCE(agg.h, 0), 6) AS harmonic,
       ROUND(CASE WHEN agg.r1 > 0 AND n.n > 1
             THEN (agg.r1 * 1.0 / agg.sumd) * (agg.r1 * 1.0 / (n.n - 1))
             ELSE 0 END, 6) AS wf_closeness
FROM seeds LEFT JOIN agg ON agg.src = seeds.id CROSS JOIN n
"""

    o["graph_tred2"] = f"""
WITH {_G},
ee AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
two AS (SELECT DISTINCT a.src, b.dst
        FROM ee a JOIN ee b ON b.src = a.dst WHERE a.src <> b.dst)
SELECT ee.src, ee.dst, (two.src IS NOT NULL) AS redundant
FROM ee LEFT JOIN two USING(src, dst)
"""

    _attack_stage = """
rem{k} AS (SELECT id FROM adeg ORDER BY deg DESC, id LIMIT {k}),
v{k} AS (SELECT v.id FROM v ANTI JOIN rem{k} USING(id)),
e{k} AS (SELECT s.src, s.dst FROM sym s
         ANTI JOIN rem{k} r1 ON s.src = r1.id
         ANTI JOIN rem{k} r2 ON s.dst = r2.id),
cc{k}(id, anc) AS (
    SELECT id, id FROM v{k}
    UNION
    SELECT e{k}.dst, cc{k}.anc FROM cc{k} JOIN e{k} ON e{k}.src = cc{k}.id
),
comp{k} AS (SELECT id, MIN(anc) AS c FROM cc{k} GROUP BY 1),
stat{k} AS (SELECT {k} AS k, COUNT(*) AS n_components, MAX(cnt) AS giant_size
            FROM (SELECT c, COUNT(*) AS cnt FROM comp{k} GROUP BY c))"""

    o["graph_attack_sim"] = (
        f"""
WITH RECURSIVE {_G},
adeg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY 1),"""
        + ",".join(_attack_stage.format(k=k) for k in (0, 10, 50))
        + """
SELECT * FROM stat0 UNION ALL SELECT * FROM stat10 UNION ALL SELECT * FROM stat50
"""
    )

    # same stage template, removal rule = deterministic md5 draw
    _fail_stage = _attack_stage.replace(
        "ORDER BY deg DESC, id", "ORDER BY md5(CAST(id AS VARCHAR) || ':fail')"
    )
    o["graph_random_failure"] = (
        f"""
WITH RECURSIVE {_G},
adeg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY 1),"""
        + ",".join(_fail_stage.format(k=k) for k in (0, 10, 50))
        + """
SELECT * FROM stat0 UNION ALL SELECT * FROM stat10 UNION ALL SELECT * FROM stat50
"""
    )

    o["graph_eccentricity"] = f"""
WITH RECURSIVE {_G},
seeds AS (SELECT id FROM v WHERE id <= {HARMONIC_SEED_MAX}),
r(src, tgt, d) AS (
    SELECT id, id, 0 FROM seeds
    UNION
    SELECT r.src, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.tgt WHERE r.d < 30
),
m AS (SELECT src, tgt, MIN(d) AS d FROM r GROUP BY 1, 2),
agg AS (SELECT src, MAX(d) AS ecc, COUNT(*) AS n_reached
        FROM m WHERE d > 0 GROUP BY 1)
SELECT seeds.id,
       CAST(COALESCE(agg.ecc, 0) AS BIGINT) AS ecc,
       COALESCE(agg.n_reached, 0) AS n_reached
FROM seeds LEFT JOIN agg ON agg.src = seeds.id
"""

    o["graph_efficiency"] = f"""
WITH RECURSIVE {_G},
seeds AS (SELECT id FROM v WHERE id <= {HARMONIC_SEED_MAX}),
r(src, tgt, d) AS (
    SELECT id, id, 0 FROM seeds
    UNION
    SELECT r.src, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.tgt WHERE r.d < 30
),
m AS (SELECT src, tgt, MIN(d) AS d FROM r GROUP BY 1, 2),
agg AS (SELECT src, SUM(1.0 / d) AS h FROM m WHERE d > 0 GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM v),
s AS (SELECT COUNT(*) AS n_sources,
             SUM(COALESCE(agg.h, 0)) AS sumh
      FROM seeds LEFT JOIN agg ON agg.src = seeds.id)
SELECT s.n_sources, n.n AS n_vertices,
       ROUND(CASE WHEN n.n > 1 AND s.n_sources > 0
             THEN s.sumh / (s.n_sources * (n.n - 1)) ELSE 0 END, 6) AS efficiency
FROM s CROSS JOIN n
"""

    o["graph_neighborhood"] = f"""
WITH {_G},
r1 AS MATERIALIZED (SELECT DISTINCT src AS root, dst AS t FROM e),
r2 AS MATERIALIZED (SELECT DISTINCT root, t FROM (
    SELECT root, t FROM r1
    UNION ALL SELECT r1.root, e.dst FROM r1 JOIN e ON e.src = r1.t)),
r3 AS MATERIALIZED (SELECT DISTINCT root, t FROM (
    SELECT root, t FROM r2
    UNION ALL SELECT r2.root, e.dst FROM r2 JOIN e ON e.src = r2.t)),
c1 AS (SELECT root, COUNT(*) AS n FROM r1 WHERE root <> t GROUP BY 1),
c2 AS (SELECT root, COUNT(*) AS n FROM r2 WHERE root <> t GROUP BY 1),
c3 AS (SELECT root, COUNT(*) AS n FROM r3 WHERE root <> t GROUP BY 1)
SELECT v.id, COALESCE(c1.n, 0) AS n1, COALESCE(c2.n, 0) AS n2, COALESCE(c3.n, 0) AS n3
FROM v LEFT JOIN c1 ON c1.root = v.id
       LEFT JOIN c2 ON c2.root = v.id
       LEFT JOIN c3 ON c3.root = v.id
"""

    o["graph_conductance"] = _conductance_sql(COND_LPA_ROUNDS)

    o["docs_diversity"] = f"""
WITH {_TOKS},
st AS (SELECT doc_id, len(l) AS n, len(list_distinct(l)) AS nd FROM toks),
cnt AS (SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(l) AS tok FROM toks) GROUP BY 1, 2),
ent AS (SELECT doc_id, SUM(c * ln(c)) AS sclc FROM cnt GROUP BY 1)
SELECT st.doc_id, st.n AS n_tokens,
       ROUND(CASE WHEN st.n > 0 THEN nd * 1.0 / st.n ELSE 0 END, 6) AS ttr,
       ROUND(CASE WHEN st.n > 0 THEN ln(st.n) - COALESCE(sclc, 0) / st.n
             ELSE 0 END, 6) AS word_entropy
FROM st LEFT JOIN ent USING(doc_id)
"""

    o["events_anomaly"] = f"""
WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events
           FROM events GROUP BY 1, 2),
s AS (SELECT event_type, AVG(n_events) AS mu, stddev_pop(n_events) AS sd
      FROM h GROUP BY 1)
SELECT h.event_type, strftime(h.hour, '%Y-%m-%d %H:%M:%S') AS hour, h.n_events,
       ROUND(CASE WHEN sd > 0 THEN (n_events - mu) / sd ELSE 0 END, 6) AS z,
       (CASE WHEN sd > 0 THEN abs((n_events - mu) / sd) ELSE 0 END) >= {ANOMALY_Z} AS is_anomaly
FROM h JOIN s USING(event_type)
"""

    return o
