"""Hadoop-FileSystem path helpers shared by the persisted indexes and
the streaming sinks.

Why not ``os.path``: store locations are Hadoop-FS URIs on a real
cluster (``hdfs://``, ``s3a://``, ...). A local-filesystem probe
returns False for every such path, so a restarted streaming sink would
take its "first batch builds the store" branch and clobber an existing
index. Every existence / directory / delete decision about a *store
path* must go through the Hadoop FileSystem resolved for that path's
scheme; these helpers are the single implementation of that rule
(pinned by ``tests/test_streaming_fs.py``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on the filesystem its scheme resolves to."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def is_dir(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists and is a directory (scheme-aware)."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath)) and bool(fs.getFileStatus(hpath).isDirectory())


def delete_path(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` (no-op when absent), scheme-aware."""
    fs, hpath = _fs_and_path(spark, path)
    fs.delete(hpath, True)
