"""Hadoop-filesystem helpers shared by build/query/streaming.

Two recurring needs, both resolved through the SAME filesystem Spark itself
will use (fs.defaultFS + scheme), never by string-matching the path:

* `fs_exists` — an explicit existence probe, so "table not written yet" is
  distinguishable from a real read error (a broad try/except around
  spark.read would treat a transient FS failure as 'empty index' and
  silently restart doc_ids at 0 — the corruption class ADVICE r2 flagged).
* `fs_is_local` — gate for the driver-local pyarrow fast paths. A
  scheme-less path resolves against fs.defaultFS (HDFS on a real cluster)
  while pyarrow resolves it against the local filesystem; only
  scheme == 'file' means both readers see the same bytes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for `path`, resolved like Spark resolves it."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def fs_is_local(spark: SparkSession, path: str) -> bool:
    """True iff Spark resolves `path` onto the LOCAL filesystem (scheme
    'file') — the only case where driver-side pyarrow reads of the same
    path are coherent with executor reads."""
    fs, _ = hadoop_fs(spark, path)
    return fs.getScheme() == "file"


def local_path(path: str) -> str:
    """Strip an explicit file: scheme for pyarrow/os callers."""
    if path.startswith("file://"):
        return path[7:]
    if path.startswith("file:"):
        return path[5:]
    return path


def chunk_dirs(spark: SparkSession, table_dir: str) -> list[str]:
    """The chunk=<c> partition values under a table dir — one FS
    listing, no Spark job. Empty list when the dir does not exist."""
    if not fs_exists(spark, table_dir):
        return []
    fs, p = hadoop_fs(spark, table_dir)
    return [st.getPath().getName().split("=", 1)[1]
            for st in fs.listStatus(p)
            if st.isDirectory()
            and st.getPath().getName().startswith("chunk=")]
