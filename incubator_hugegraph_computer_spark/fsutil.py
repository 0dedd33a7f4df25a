"""Tiny Hadoop-filesystem helpers for metadata sidecars and markers.

Anything written next to Spark-managed parquet must go through the SAME
filesystem abstraction Spark writes with — ``open()``/``os.makedirs``
silently target the driver's local disk when the data lives on
``hdfs://`` or ``s3a://``, which makes a feature work in local tests and
break (or worse, read stale local state) on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, d: str):
    """(FileSystem, Path) for ``d`` resolved via the session's Hadoop
    conf — honours the path's scheme (local, hdfs://, s3a://)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(d)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create/overwrite a small text file at ``path``."""
    fs, p = hadoop_fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small text file at ``path``; FileNotFoundError if absent."""
    fs, p = hadoop_fs(spark, path)
    if not fs.exists(p):
        raise FileNotFoundError(path)
    stream = fs.open(p)
    try:
        reader = spark._jvm.java.io.BufferedReader(
            spark._jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()


def touch(spark: SparkSession, path: str) -> None:
    """Create an empty marker file (parents included)."""
    fs, p = hadoop_fs(spark, path)
    parent = p.getParent()
    if parent is not None:
        fs.mkdirs(parent)
    fs.create(p, True).close()


def join(base: str, *parts: str) -> str:
    """Scheme-preserving path join (os.path.join corrupts URIs on
    Windows-style normalization and abspath collapses '//')."""
    out = base.rstrip("/")
    for part in parts:
        out += "/" + part.strip("/")
    return out
