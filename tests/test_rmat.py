"""R-MAT generator determinism and skew."""

import hashlib

from incubator_hugegraph_computer_spark.sources.generators import (
    rmat_degree_profile,
    rmat_edges,
)


def _rmat_py(n_edges, levels, seed, a=0.57, b=0.19, c=0.19):
    ta, tb, tc = int(a * 2**32), int((a + b) * 2**32), int((a + b + c) * 2**32)
    out = []
    for i in range(n_edges):
        src = dst = 0
        for k in range(levels):
            u = int(
                hashlib.md5(f"{i}:{k}:{seed}".encode()).hexdigest()[:8], 16
            )
            sbit = 0 if u < tb else 1
            dbit = 0 if u < ta else (1 if u < tb else (0 if u < tc else 1))
            src = src * 2 + sbit
            dst = dst * 2 + dbit
        out.append((i, src, dst))
    return out


def test_rmat_edges_match_python(spark):
    got = sorted(
        (r["edge_id"], r["src"], r["dst"])
        for r in rmat_edges(spark, 300, levels=6, seed=9).collect()
    )
    assert got == _rmat_py(300, 6, 9)


def test_rmat_profile_is_skewed(spark):
    rows = {r["out_degree"]: r["n_vertices"]
            for r in rmat_degree_profile(spark, 5000, levels=8).collect()}
    # total edges conserved
    assert sum(d * n for d, n in rows.items()) == 5000
    # power-law-ish: some vertex far above the 5000/256 mean degree
    assert max(rows) > 3 * (5000 // 256)


def test_rmat_rejects_graph_store_combination():
    """ADVICE r4: --generate-rmat + --graph-store must refuse to run (the
    store would shadow the generated graph) — pinned at the CLI surface."""
    import os
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable,
            "incubator_hugegraph_computer_spark/job.py",
            "--algorithm", "pagerank",
            "--generate-rmat", "1000",
            "--graph-store", "/tmp/some_store",
            "--output", "/tmp/rmat_reject_out",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env={**os.environ, "PYTHONPATH": "/root/repo"},
        timeout=300,
    )
    assert out.returncode != 0
    assert "cannot be combined with --graph-store" in (out.stderr + out.stdout)
