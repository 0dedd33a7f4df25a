"""Streaming triangle maintenance, HyperBall registers, MIPS top-k."""

import os
import time

from pyspark.sql import functions as F

from conftest import make_graph

from incubator_hugegraph_computer_spark.functions.similarity import (
    cosine_topk,
    mips_topk,
)
from incubator_hugegraph_computer_spark.operators.neighborhood import (
    hyperball_reach,
)
from incubator_hugegraph_computer_spark.operators.triangle_count import triangles


def _write_chunks(spark, src, chunks, schema):
    src.mkdir()
    for i, part in enumerate(chunks):
        df = spark.createDataFrame(part, schema).coalesce(1)
        tmp = str(src / f"c{i}.tmp")
        df.write.mode("overwrite").parquet(tmp)
        fname = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dest = str(src / f"part-{i:05d}.parquet")
        os.rename(os.path.join(tmp, fname), dest)
        ts = time.time() + i
        os.utime(dest, (ts, ts))


def test_triangle_stream_matches_batch(spark, tmp_path):
    from incubator_hugegraph_computer_spark.streaming.triangles import (
        read_triangle_total,
        run_triangle_stream,
    )

    # three batches that progressively close triangles across batches:
    # final graph holds K4 on {1,2,3,4} (4 triangles) + triangle {5,6,7}
    chunks = [
        [(1, 2), (2, 3), (5, 6)],
        [(3, 1), (1, 4), (6, 7)],          # closes {1,2,3}
        [(2, 4), (3, 4), (7, 5), (2, 1)],  # closes the rest + dup edge
    ]
    src = tmp_path / "edges"
    _write_chunks(spark, src, chunks, "src long, dst long")
    run_triangle_stream(
        spark, str(src), str(tmp_path / "ck"), str(tmp_path / "tri")
    )
    total = read_triangle_total(spark, str(tmp_path / "tri"))
    allrows = [e for c in chunks for e in c]
    batch = triangles(
        spark.createDataFrame(allrows, "src long, dst long")
    ).count()
    assert total == batch == 5


def test_hyperball_matches_python_replay(spark):
    import hashlib

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 6), (6, 1)]
    hops, m = 3, 16
    g = make_graph(spark, edges)
    got = {r["id"]: r["reach_est"] for r in
           hyperball_reach(g, hops=hops, registers=m).collect()}

    # python replay: same md5 register rule, max-propagation, raw HLL
    verts = sorted({v for e in edges for v in e})
    regs = {}
    for v in verts:
        hx = hashlib.md5(f"{v}:anf".encode()).hexdigest()
        j = int(hx[:2], 16) % m
        x = int(hx[2:10], 16)
        rho = 33 if x == 0 else 33 - len(bin(x)[2:])
        r = [0] * m
        r[j] = rho
        regs[v] = r
    succ = {}
    for s, d in edges:
        succ.setdefault(s, []).append(d)
    for _ in range(hops):
        regs = {
            v: [
                max([regs[v][j]] + [regs[u][j] for u in succ.get(v, [])])
                for j in range(m)
            ]
            for v in verts
        }
    for v in verts:
        z = sum(2.0 ** -mv for mv in regs[v])
        exp = round(0.673 * m * m / z, 6)
        assert abs(got[v] - exp) < 2e-6, (v, got[v], exp)


def test_mips_differs_from_cosine_on_magnitude(spark):
    rows = [
        (0, [1.0, 0.0]),       # query
        (1, [10.0, 6.0]),      # big magnitude, clearly off-axis
        (2, [0.99, 0.141]),    # unit-ish, nearly aligned
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") == 0)
    mips = {r["vec_id"]: r["rank"] for r in mips_topk(emb, q, k=2).collect()}
    cos = {r["vec_id"]: r["rank"] for r in cosine_topk(emb, q, k=2).collect()}
    assert mips[1] == 1  # magnitude wins inner product
    assert cos[2] == 1   # alignment wins cosine
