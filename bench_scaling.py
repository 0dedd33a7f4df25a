"""Scaling-efficiency evidence (BASELINE.md criterion: >= 0.8 from N to
4N executors, sandboxed as local[8] vs local[32] on identical input).

Runs the PageRank+WCC pipeline in two fresh JVMs (subprocesses, so each
gets its own local master) and reports throughput at both plus
efficiency = (T_N / T_4N) / 4 ... expressed as speedup/4.

Writes one JSON line; append results to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath("__file__")))
from incubator_hugegraph_computer_spark.session import get_spark
from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.pagerank import pagerank
from incubator_hugegraph_computer_spark.operators.wcc import wcc
from incubator_hugegraph_computer_spark.sources.extractor import extract_edges
from incubator_hugegraph_computer_spark.sources.repo_files import generate_repo_files

cpus = int(sys.argv[1]); n_files = int(sys.argv[2])
spark = get_spark(app_name=f"scale-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 8),
                  extra_confs={"spark.driver.memory": "40g"})
files = generate_repo_files(spark, n_files, num_repos=100, seed=42).persist()
files.count()
vertices, edges = extract_edges(files, verify=True)
g = Graph(vertices.select("id"), edges).cache()
n_edges = g.num_edges()
t0 = time.monotonic()
pagerank(g, max_supersteps=10, l1_threshold=0.0).count()
t_pr = time.monotonic() - t0
t0 = time.monotonic()
wcc(g, max_supersteps=30).count()
t_wcc = time.monotonic() - t0
print(json.dumps({"cpus": cpus, "edges": n_edges, "pagerank_sec": round(t_pr,3),
                  "wcc_sec": round(t_wcc,3),
                  "pr_edges_per_sec": round(n_edges*10/t_pr,1)}))
"""


def run(cpus: int, n_files: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_files)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=1800,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_files = int(os.environ.get("BENCH_FILES", "200000"))
    n_small = int(os.environ.get("SCALE_N", "8"))
    n_big = int(os.environ.get("SCALE_4N", "32"))
    r1 = run(n_small, n_files)
    r2 = run(n_big, n_files)
    factor = n_big / n_small
    eff_pr = (r1["pagerank_sec"] / r2["pagerank_sec"]) / factor
    eff_wcc = (r1["wcc_sec"] / r2["wcc_sec"]) / factor
    print(
        json.dumps(
            {
                "n_files": n_files,
                "edges": r1["edges"],
                f"local[{n_small}]": r1,
                f"local[{n_big}]": r2,
                "scaling_efficiency_pagerank": round(eff_pr, 3),
                "scaling_efficiency_wcc": round(eff_wcc, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
