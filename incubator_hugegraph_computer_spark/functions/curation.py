"""End-to-end curation funnel — the composed training-corpus pipeline
as ONE auditable report.

Every stage reuses an operator that already ships standalone (exact
dedup, quality scoring, held-out split, shingle decontamination); the
funnel chains them in the order a real corpus build runs them and
reports per-stage survivor counts + token mass — the throughput/yield
report a data team reads before committing a 100 TB run.

Stages:
  0 raw              — the input corpus
  1 exact_dedup      — keep the min-doc_id representative per md5(text)
  2 quality          — keep quality_score ≥ quality_min (length band +
                       punctuation ratio + stopword ratio)
  3 holdout          — drop the deterministic md5-drawn eval split
  4 decontaminated   — drop survivors sharing ANY word 3-shingle with
                       an eval doc

Physical shape: one base projection computes (hash, token count,
quality, eval flag) in a single pass over documents and is persisted;
each stage is a filter/anti-join over it, and the per-stage totals are
map-side-combined aggregates. The only E(shingle)-scale work is stage
4's semi-join, identical to docs_decontaminate's audited plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.functions.dedup import shingles
from incubator_hugegraph_computer_spark.functions.sampling import (
    hash_uniform,
    hex_threshold,
)
from incubator_hugegraph_computer_spark.functions.text import (
    quality_score,
    token_count,
)


def curation_funnel(
    docs: DataFrame,
    quality_min: float = 0.7,
    eval_rate: float = 0.05,
    n: int = 3,
) -> DataFrame:
    """(stage_idx, stage, n_docs, n_tokens) — survivor census after each
    curation stage (see module docstring for the stage definitions)."""
    base = docs.select(
        "doc_id",
        "text",
        F.md5(F.col("text")).alias("_h"),
        token_count(F.col("text")).alias("_ntok"),
        quality_score(F.col("text"), F.col("n_chars")).alias("_q"),
        (hash_uniform(F.col("doc_id")) < F.lit(hex_threshold(eval_rate))).alias(
            "_eval"
        ),
    ).persist()

    canon = base.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
    s1 = base.join(canon, ["_h", "doc_id"])  # representatives only
    s2 = s1.where(F.col("_q") >= quality_min)
    s3 = s2.where(~F.col("_eval"))
    evsh = shingles(base.where(F.col("_eval")), n=n).select("shingle").distinct()
    bad = (
        shingles(s3, n=n)
        .join(evsh, "shingle")
        .select("doc_id")
        .distinct()
    )
    s4 = s3.join(bad, "doc_id", "left_anti")

    def census(df: DataFrame, idx: int, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("_ntok"), F.lit(0)).alias("n_tokens"),
        ).select(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            "n_docs",
            "n_tokens",
        )

    out = (
        census(base, 0, "raw")
        .unionByName(census(s1, 1, "exact_dedup"))
        .unionByName(census(s2, 2, "quality"))
        .unionByName(census(s3, 3, "holdout"))
        .unionByName(census(s4, 4, "decontaminated"))
        .localCheckpoint(eager=True)  # 5 rows; frees base's cache
    )
    base.unpersist()
    return out
