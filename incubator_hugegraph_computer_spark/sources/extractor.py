"""Edge extraction from source text — the engine's ingest path.

Per BASELINE.json north_star: edges are built from import/dependency
references extracted per file with **Arrow-vectorized pandas UDFs**
(pandas ``.str`` ops over Arrow record batches — no per-row Python in
the hot path), content integrity is verified by sha256 per row
(JVM-side ``F.sha2``, i.e. whole-stage-codegen, not Python at all), and
references resolve against the file catalog to file-level edges
``(src: long, dst: long)``.

Reference analogue: the inputstep
(``computer-core/.../input/WorkerInputManager.java:110-141``) where raw
input is fetched, converted and shuffled by the partitioner; its
"stale edges are skipped" rule (``FileGraphPartition.java:341-343``)
maps to the inner join against the catalog (unresolvable imports drop).
The input-filter column pruning
(``input/filter/DefaultInputFilter.java``) is Catalyst's job here: only
(repo, path, content, lang) are ever read from the scan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T
from pyspark.sql.pandas.functions import pandas_udf

# One regex per language, applied with pandas' vectorized .str.findall.
LANG_IMPORT_RE = {
    "python": r"(?m)^\s*(?:from|import)\s+(mod_\d+)",
    "java": r"(?m)^\s*import\s+(?:[\w.]+\.)?(mod_\d+)\s*;",
    "go": r"\"(?:[\w./]*/)?(mod_\d+)\"",
}
_DEFAULT_RE = r"(mod_\d+)"


# DataType object (not DDL string) so the UDF can be defined without an
# active SparkContext at import time.
@pandas_udf(T.ArrayType(T.StringType()))
def extract_refs(content: pd.Series, lang: pd.Series) -> pd.Series:
    """Referenced module tokens per file (Arrow-batched; .str.findall is
    the vectorized path — one regex pass per language subset)."""
    out = pd.Series([None] * len(content), dtype=object)
    for lg in lang.dropna().unique():
        mask = lang == lg
        pat = LANG_IMPORT_RE.get(lg, _DEFAULT_RE)
        out[mask] = content[mask].str.findall(pat)
    return out


def verify_sha256(files: DataFrame, hash_col: str = "sha256") -> DataFrame:
    """Per-row integrity invariant: recomputed sha256(content) must equal
    the catalog's stored hash. Returns the verified frame; raises on any
    mismatch (the count is a cheap scan-only action — no shuffle)."""
    checked = files.withColumn("_sha_ok", F.sha2(F.col("content"), 256) == F.col(hash_col))
    # NOT (ok IS TRUE), not ~ok: a NULL content or NULL stored hash makes
    # the equality NULL, and where(~NULL) would silently pass the
    # unverifiable row instead of counting it as corrupt
    bad = checked.where(~F.col("_sha_ok").eqNullSafe(F.lit(True))).count()
    if bad:
        raise ValueError(f"sha256 mismatch on {bad} rows — corrupt input")
    return checked.drop("_sha_ok")


def dense_ids_by_sort(df: DataFrame, order_cols: list[str], id_col: str = "id") -> DataFrame:
    """Mint dense ids 0..N-1 in (order_cols) sort order WITHOUT a global
    single-task window: range-repartition (partition p holds a
    contiguous key range, all ranges ordered), rank within each
    partition in parallel (the window partitions by spark_partition_id,
    so every partition sorts its own rows concurrently), then add the
    per-partition cumulative offsets — a P-row driver cumsum broadcast
    back as a join. Same ids as ``row_number() OVER (ORDER BY ...)``,
    no stage with one task."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    # ids must come from the SAME partitioning the offsets were
    # collected from, and repartitionByRange RE-SAMPLES boundaries on
    # recompute — so pin the range-partitioned INPUT with an eager
    # localCheckpoint. Everything downstream (broadcast offset join +
    # per-partition window) is then deterministic lazily, which is
    # 2-3x cheaper than the previous eager checkpoint of the full
    # OUTPUT (measured 4.6s -> 2.0s at 200k rows / local[32]: the
    # output materialization was pure overhead for consumers that
    # immediately join it away).
    part = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        ((r["_pid"], r["cnt"]) for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect())
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        part.join(off_df, "_pid")
        .withColumn(id_col, (F.col("_off") + F.row_number().over(w) - 1).cast("long"))
        .drop("_pid", "_off")
    )
    # the mint already knows the exact row count; stash it for callers —
    # a checkpointed lineage carries no size stats, so consumers cannot
    # get this from the planner (see extract_edges' broadcast decision)
    out._hgc_row_count = acc
    return out


def build_catalog(files: DataFrame, dense_ids: bool = True) -> DataFrame:
    """(id, repo, path, module) — one row per file, long ids.

    ``dense_ids=True`` mints 0..V-1 in (repo, path) order via
    :func:`dense_ids_by_sort` — exact min-id semantics and compact
    downstream state with no single-task stage (range partition →
    parallel per-partition rank → offset add). At 10^12-file scale flip
    to ``False``: ``xxhash64(repo, path)`` is shuffle-free (the
    reference's BytesId would call these LONG ids; ordering caveats in
    SURVEY §1.3 apply only to the dense path's min-id outputs which
    stay non-negative).
    """
    base = files.select("repo", "path", F.regexp_extract("path", r"([^/]+)\.[A-Za-z]+$", 1).alias("module"))
    if dense_ids:
        minted = dense_ids_by_sort(base, ["repo", "path"])
        out = minted.select("id", "repo", "path", "module")
        out._hgc_row_count = getattr(minted, "_hgc_row_count", None)
        return out
    return base.select(
        F.xxhash64("repo", "path").alias("id"), "repo", "path", "module"
    )


def mint_bytesid_ordered_ids(values: DataFrame, col: str = "sid") -> DataFrame:
    """(sid, id) — dense long ids whose numeric order equals the
    reference's UTF8 BytesId order: **length first, then bytewise**
    (``BytesId.compareTo`` → ``BytesUtil.compare``,
    computer-api/.../util/BytesUtil.java:61-73). Any algorithm taking a
    min over ids (WCC component representative, K-core's WCC phase,
    rings' "smallest vertex") then reproduces the reference's choice
    exactly: numeric ``min`` over these ids == BytesId min over the
    strings. Uses the same parallel dense-id minting as
    :func:`build_catalog` (no single-task stage).

    Length means **UTF-8 byte length** (``octet_length``), not character
    count — the reference compares the serialized byte arrays, so a
    2-byte 'é' sorts after any 2-char ASCII id of equal byte length,
    before 3-byte ones (and DuckDB's ``strlen`` replays byte length).
    The bytewise tie-break is Spark's native string order (UTF8String
    compares raw UTF-8 bytes, which is also code-point order)."""
    base = values.select(col).distinct().withColumn("_len", F.octet_length(F.col(col)))
    return dense_ids_by_sort(base, ["_len", col]).drop("_len")


def mint_uuid_ordered_ids(values: DataFrame, col: str = "uid") -> DataFrame:
    """(uid, id) — dense long ids whose numeric order equals the
    reference's **UUID** BytesId order (``IdType.java:22-27`` lists
    LONG/UTF8/UUID; ``BytesId.of(UUID)`` serializes
    ``writeLong(mostSignificantBits); writeLong(leastSignificantBits)``
    — ``BytesId.java:79-92`` — i.e. exactly the 16 bytes of the
    canonical hex with dashes removed, big-endian). All UUIDs serialize
    to the same length (16), so ``BytesUtil.compare``'s length-first
    rule (``BytesUtil.java:61-73``) never fires and the order reduces to
    plain unsigned byte order == lexical order of the lowercase 32-char
    hex (ASCII '0'-'9' < 'a'-'f', and UTF8String comparison is unsigned
    bytewise). Simpler than the UTF8 path: no length prefix needed.

    Accepts canonical dashed UUID strings in any case; ordering uses the
    normalized lower-hex form. Same parallel dense-id minting as
    :func:`build_catalog` (no single-task stage)."""
    base = (
        values.select(col)
        .distinct()
        .withColumn("_hex", F.lower(F.regexp_replace(F.col(col), "-", "")))
    )
    return dense_ids_by_sort(base, ["_hex", col]).drop("_hex")


def extract_edges(
    files: DataFrame,
    catalog: DataFrame | None = None,
    verify: bool = True,
    broadcast_catalog: bool | None = None,
    weighted: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Full ingest: verify → extract refs → resolve → dedup.

    Returns (vertices ``(id, repo, path)``, edges ``(src, dst)`` — or
    ``(src, dst, weight)`` with ``weighted=True``).
    Edge dedup implements EdgeFrequency.SINGLE
    (``computer-api/.../config/EdgeFrequency.java:26-29``);
    ``weighted=True`` is the EdgeFrequency.MULTIPLE view folded to one
    edge per pair with the reference multiplicity as ``weight`` (how
    often src imports dst) — the natural edge weight for
    ``pagerank_weighted``. Same single shuffle either way (distinct and
    groupBy hash on the same (src,dst) key).

    The resolve is a join of the exploded reference tokens against the
    catalog on ``module``. ``broadcast_catalog=None`` auto-decides from
    the mint's known row count (small catalog → broadcast-hash joins on
    both resolve sides; huge catalog or unknown count → shuffle joins on
    the token, both sides hash-partitioned on the same key with AQE
    splitting skewed hub tokens). Pass True/False to pin it.
    """
    if verify:
        files = verify_sha256(files)
    if catalog is None:
        catalog = build_catalog(files)
    refs = files.select(
        "repo",
        "path",
        F.explode(extract_refs(F.col("content"), F.col("lang"))).alias("module"),
    )
    if broadcast_catalog is None:
        # auto-decide from the mint's exact row count (the checkpointed
        # catalog lineage carries no size stats, so the planner can never
        # see that this dimension is small): a catalog under ~5M rows is
        # tens of MB serialized — broadcast both resolve sides (measured
        # ~4x on the resolve stage at 200k files). At 10^12 files this is
        # False and both joins stay shuffle-partitioned on their keys
        # (with AQE splitting skewed hub modules).
        n = getattr(catalog, "_hgc_row_count", None)
        broadcast_catalog = n is not None and n <= 5_000_000
    src_side = catalog.select(
        F.col("id").alias("src"), F.col("repo").alias("repo"), F.col("path").alias("path")
    )
    dst_side = catalog.select(F.col("id").alias("dst"), F.col("module").alias("module"))
    if broadcast_catalog:
        src_side = F.broadcast(src_side)
        dst_side = F.broadcast(dst_side)
    raw = (
        refs.join(src_side, ["repo", "path"])
        .join(dst_side, "module")
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
    )
    if weighted:
        edges = raw.groupBy("src", "dst").agg(
            F.count(F.lit(1)).cast("double").alias("weight")
        )
    else:
        edges = raw.distinct()
    vertices = catalog.select("id", "repo", "path")
    return vertices, edges
