"""Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005) over a key
column — the mergeable frequency sketch a crawl/event pipeline keeps
when exact per-key counts are too hot to maintain.

The sketch is a depth×width counter matrix stored relationally as
(r, col, cnt) rows — at most depth·width cells regardless of input
size, so it is ALWAYS broadcastable, additive across partitions,
micro-batches and days (see ``streaming/heavy_hitters.py``), and its
estimate is a one-sided overcount: est(k) ≥ true(k), with
P[est - true > 2m/width] ≤ (1/2)^depth.

Hashing is the repo's portable scheme: row r hashes key k to column
``int(first-8-hex(md5(f"{r}:{k}")), 16) % width`` — Spark's
``conv(substr(md5(..)))`` and DuckDB's ``CAST('0x'||substr(md5(..)))``
agree bit-for-bit, which is what makes the sketch itself (not just a
summary of it) oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _cms_col(r: Column, key: Column, width: int) -> Column:
    """Column index of key under hash row r (portable md5 scheme)."""
    h = F.substring(F.md5(F.concat_ws(":", r.cast("string"), key.cast("string"))), 1, 8)
    return F.pmod(F.conv(h, 16, 10).cast("long"), F.lit(width))


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """(r, col, cnt) — count-min sketch of the key column's frequency
    distribution. One groupBy over depth× the input rows; map-side
    partial aggregation collapses to ≤ depth·width cells per task."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    keyed = df.select(F.col(key_col).alias("k")).select("k", rows)
    return (
        keyed.select("r", _cms_col(F.col("r"), F.col("k"), width).alias("col"))
        .groupBy("r", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """(key, est) — CMS point estimate per candidate key: min over hash
    rows of the addressed counter (absent counter = 0). The sketch side
    is broadcast — it is ≤ depth·width rows BY CONSTRUCTION."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    probes = (
        keys.select(F.col(key_col).alias("key"))
        .distinct()
        .select("key", rows)
        .select("key", "r", _cms_col(F.col("r"), F.col("key"), width).alias("col"))
    )
    return (
        probes.join(F.broadcast(cms), ["r", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(key, est, exact) — top-k keys by CMS estimate (ties → key asc),
    with the exact count alongside (est ≥ exact always; equality when
    no collision). At sketch scale the exact column is what you DROP —
    it is here so the one-sided-error contract stays oracle-checked."""
    cms = cms_build(df, key_col, depth=depth, width=width)
    est = cms_estimate(cms, df, key_col, depth=depth, width=width)
    exact = (
        df.select(F.col(key_col).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    out = est.join(exact, "key")
    return (
        out.orderBy(F.col("est").desc(), F.col("key").asc())
        .limit(k)
        .select("key", "est", "exact")
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 65536, k_hashes: int = 4
) -> DataFrame:
    """(bit,) — the SET bit positions of a Bloom filter over the key
    column (same portable md5 hashing as the CMS, so the filter is
    bit-for-bit oracle-replayable). Stored sparsely: ≤ min(m_bits,
    k·distinct-keys) rows, broadcastable by construction once m_bits
    is chosen for the candidate set."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias("r")
    keyed = df.select(F.col(key_col).alias("k")).distinct().select("k", rows)
    return keyed.select(
        _cms_col(F.col("r"), F.col("k"), m_bits).alias("bit")
    ).distinct()


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 65536,
    k_hashes: int = 4,
) -> DataFrame:
    """(key, maybe_member) — Bloom membership per DISTINCT candidate
    key: true iff all k addressed bits are set (one-sided: never a
    false negative, false-positive rate ≈ (1-e^{-kn/m})^k). The filter
    side is broadcast; callers join the flags back onto their rows."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias("r")
    probes = (
        keys.select(F.col(key_col).alias("key"))
        .distinct()
        .select("key", rows)
        .select("key", _cms_col(F.col("r"), F.col("key"), m_bits).alias("bit"))
    )
    hit = F.broadcast(bloom.withColumn("_set", F.lit(1)))
    return (
        probes.join(hit, "bit", "left")
        .groupBy("key")
        .agg((F.sum(F.coalesce(F.col("_set"), F.lit(0))) == k_hashes).alias("maybe_member"))
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    registers: int = 16,
    seed: str = "hll",
) -> DataFrame:
    """(group_cols..., est_distinct) — grouped approximate distinct
    count via PORTABLE md5-derived HyperLogLog registers (idx = first
    hex byte mod m, ρ = leading-zeros+1 of the next 32 hash bits; raw
    HLL estimate, no small-range correction — declared estimator
    semantics, same register contract as ``hyperball_reach``).

    Spark's ``approx_count_distinct`` is the production path; THIS one
    exists because its registers are engine-portable — the oracle (or
    any other system sharing the md5 rule) reproduces them bit-for-bit
    and the sketch rows are addition-free and mergeable by per-register
    MAX, so a streaming job can maintain them per micro-batch exactly
    like the count-min sketch.

    Scale: one map-only projection + one (groups × m)-row MAX groupBy
    — map-side combined, no joins until the dense-register fill.
    """
    m = registers
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    hexcol = F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(seed)))
    x = F.conv(F.substring(hexcol, 3, 8), 16, 10).cast("long")
    per = (
        df.select(
            *group_cols,
            (F.conv(F.substring(hexcol, 1, 2), 16, 10).cast("long") % m).alias("j"),
            F.when(x == 0, F.lit(33))
            .otherwise(F.lit(33) - F.length(F.bin(x)))
            .cast("long")
            .alias("mv"),
        )
        .groupBy(*group_cols, "j")
        .agg(F.max("mv").alias("mv"))
    )
    regs = F.array(*[F.lit(j).cast("long") for j in range(m)])
    dense = (
        df.select(*group_cols)
        .distinct()
        .select(*group_cols, F.explode(regs).alias("j"))
        .join(per, [*group_cols, "j"], "left")
        .select(*group_cols, "j", F.coalesce("mv", F.lit(0)).alias("mv"))
    )
    return (
        dense.groupBy(*group_cols)
        .agg(F.sum(F.pow(F.lit(2.0), -F.col("mv"))).alias("z"))
        .select(
            *group_cols,
            F.round(F.lit(alpha) * F.lit(float(m * m)) / F.col("z"), 6).alias(
                "est_distinct"
            ),
        )
    )
