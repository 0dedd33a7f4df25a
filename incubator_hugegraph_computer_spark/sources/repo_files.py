"""Deterministic synthetic source-code corpus generator.

Produces the engine's input table per BASELINE.json ``input_hint``:

    (repo: string, path: string, commit: string, lang: string,
     content: string, sha256: string)

one row per file, with import statements synthesized so the resulting
file-dependency graph is known in closed form (tests recompute the
expected edge set from the same hash functions). Structure knobs match
FIXTURES.md §6: heavy-tailed out-degree (power-law hubs to exercise
salting), in-degree skew via a concentrating target map, ~1% dangling
files, deterministic in ``seed`` and independent of partitioning (every
value is a pure function of the file index).

Fully distributed: ``spark.range(V)`` → one Arrow-batched
``mapInPandas`` with NumPy-vectorized column construction; the only
string work is pandas vectorized concat. ``sha256`` is stamped with the
JVM-side ``F.sha2`` (validated against hashlib in tests) so the
generator itself stays off the Python-per-row path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ("python", "java", "go")
_EXT = {"python": "py", "java": "java", "go": "go"}

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG mix)."""
    with np.errstate(over="ignore"):
        x = (x + _GOLDEN).astype(np.uint64)
        x ^= x >> np.uint64(30)
        x *= _MIX1
        x ^= x >> np.uint64(27)
        x *= _MIX2
        x ^= x >> np.uint64(31)
    return x


def _uniform(idx: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """U(0,1) as a pure function of (file index, seed, stream id)."""
    with np.errstate(over="ignore"):
        h = _splitmix64(
            idx.astype(np.uint64)
            ^ _splitmix64(np.uint64(seed) + np.uint64(stream) * _GOLDEN)
        )
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def expected_degrees_and_targets(
    idx: np.ndarray,
    num_files: int,
    seed: int = 42,
    max_out_degree: int | None = None,
    dangling_frac: float = 0.01,
    zipf_s: float = 1.2,
    target_skew: float = 3.0,
):
    """Closed-form graph structure: (out_deg array, flat src array, flat
    dst array). Shared by the generator and the test oracle."""
    if max_out_degree is None:
        max_out_degree = max(8, num_files // 10)
    u_deg = _uniform(idx, seed, 1)
    u_dang = _uniform(idx, seed, 2)
    # Heavy-tailed out-degree: inverse-CDF of a Pareto-ish law.
    out_deg = 1 + np.floor(np.clip(u_deg, 1e-12, 1.0) ** (-1.0 / zipf_s) - 1.0).astype(
        np.int64
    )
    out_deg = np.clip(out_deg, 1, max_out_degree)
    out_deg = np.where(u_dang < dangling_frac, 0, out_deg)

    rows = np.repeat(np.arange(len(idx)), out_deg)
    if len(rows) == 0:
        return out_deg, np.empty(0, np.int64), np.empty(0, np.int64)
    # per-row slot number k for the k-th import of a file
    starts = np.concatenate(([0], np.cumsum(out_deg)[:-1]))
    k = np.arange(len(rows)) - np.repeat(starts, out_deg)
    src = idx[rows]
    u_t = _uniform(src * np.int64(1_000_003) + k, seed, 7)
    # Concentrate targets on low indices → power-law in-degree hubs.
    dst = np.floor(num_files * (u_t**target_skew)).astype(np.int64)
    dst = np.where(dst == src, (dst + 1) % num_files, dst)
    return out_deg, src, dst


def _lang_of(idx: np.ndarray, seed: int) -> np.ndarray:
    return np.array(LANGS, dtype=object)[
        (_splitmix64(idx.astype(np.uint64) ^ np.uint64(seed * 31)) % np.uint64(3)).astype(int)
    ]


def module_token(i: int) -> str:
    return f"mod_{i}"


def generate_repo_files(
    spark: SparkSession,
    num_files: int,
    num_repos: int = 10,
    seed: int = 42,
    commit: str = "c0ffee42",
    num_partitions: int | None = None,
    **structure_kwargs,
) -> DataFrame:
    """The synthetic Iceberg-catalog stand-in table."""

    _imp_prefix = {"python": "import mod_", "java": "import org.gen.mod_", "go": '\t"gen/mod_'}
    _imp_suffix = {"python": "", "java": ";", "go": '"'}
    _header = {"python": '"""generated module"""', "java": "package org.gen;", "go": "package gen\nimport ("}
    _footer = {"python": "VALUE = ", "java": "// end ", "go": ")\n// end "}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["file_idx"].to_numpy()
            out_deg, src, dst = expected_degrees_and_targets(
                idx, num_files, seed, **structure_kwargs
            )
            langs = pd.Series(_lang_of(idx, seed))
            repo_n = (
                _splitmix64(idx.astype(np.uint64) ^ np.uint64(seed * 17))
                % np.uint64(num_repos)
            ).astype(int)

            # import lines, fully vectorized: prefix[lang] + dst + suffix[lang]
            lang_pe = pd.Series(np.repeat(langs.to_numpy(), out_deg))
            lines = (
                lang_pe.map(_imp_prefix)
                + pd.Series(dst).astype(str)
                + lang_pe.map(_imp_suffix)
            )
            blocks = (
                pd.DataFrame({"i": src, "line": lines})
                .groupby("i", sort=False)["line"]
                .agg("\n".join)
                if len(src)
                else pd.Series(dtype=object)
            )
            imports = pd.Series(idx, dtype=np.int64).map(blocks).fillna("")

            idx_s = pd.Series(idx).astype(str)
            toks = "mod_" + idx_s
            content = (
                langs.map(_header)
                + "\n"
                + imports.reset_index(drop=True)
                + "\n"
                + langs.map(_footer)
                + idx_s
            )
            yield pd.DataFrame(
                {
                    "repo": "org/repo" + pd.Series(repo_n).astype(str),
                    "path": "src/" + toks + "." + langs.map(_EXT),
                    "commit": commit,
                    "lang": langs,
                    "content": content,
                    "file_idx": idx,
                }
            )

    base = spark.range(num_files).select(F.col("id").alias("file_idx"))
    if num_partitions:
        base = base.repartition(num_partitions)
    out = base.mapInPandas(
        gen,
        schema="repo string, path string, commit string, lang string, content string, file_idx long",
    )
    # sha256 stamped JVM-side (Tungsten, no Python): this column is the
    # per-row integrity invariant the extractor re-verifies.
    return out.withColumn("sha256", F.sha2(F.col("content"), 256))
