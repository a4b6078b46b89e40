"""Pin that store-path existence decisions are Hadoop-FS, never os.path.

VERDICT r8 defect #1: the streaming sinks probed store existence with
``os.path.isdir``. On any non-local scheme (hdfs://, s3a://) that probe
returns False, the sink takes the "first batch builds the store" branch,
and ``build_media_index`` clears the target — i.e. a restart clobbers an
existing index. These tests pin the fix two ways: a source-level grep
over the sink modules, and a functional probe through a ``file:`` URI
(which ``os.path`` cannot see but the Hadoop local FS can).
"""

from __future__ import annotations

import pathlib
import re

import pytest

PKG = pathlib.Path(__file__).resolve().parents[1] / "quantlab_data_pipeline_spark"

# Modules that own persisted stores or run foreachBatch against them.
STORE_MODULES = [
    "streaming/media_intake.py",
    "streaming/dsir_intake.py",
    "streaming/rollup_sink.py",
    "streaming/shard_sink.py",
    "streaming/ann_intake.py",
    "llm/media_index.py",
    "llm/dedup_index.py",
    "llm/ann_index.py",
    "fsutil.py",
]


def test_no_local_fs_probes_in_store_modules():
    """No os.path existence/dir probe may decide a store-path branch."""
    bad = []
    for rel in STORE_MODULES:
        src = (PKG / rel).read_text()
        for m in re.finditer(r"os\.path\.(isdir|exists|isfile)", src):
            bad.append(f"{rel}: {m.group(0)}")
    assert not bad, f"local-FS probes on store paths: {bad}"


def test_fsutil_used_by_all_sinks():
    for rel in [
        "streaming/media_intake.py",
        "streaming/dsir_intake.py",
        "streaming/rollup_sink.py",
        "streaming/shard_sink.py",
        "streaming/ann_intake.py",
    ]:
        src = (PKG / rel).read_text()
        assert "fsutil" in src, f"{rel} does not import fsutil"


def test_path_exists_through_file_uri(spark, tmp_path):
    """A ``file:`` URI is invisible to os.path but visible to the Hadoop
    local filesystem — a passing probe proves the FS routing."""
    import os

    from quantlab_data_pipeline_spark.fsutil import delete_path, is_dir, path_exists

    store = tmp_path / "store" / "meta"
    store.mkdir(parents=True)
    uri = f"file:{tmp_path}/store/meta"
    assert not os.path.isdir(uri)  # the old probe would mis-answer this
    assert path_exists(spark, uri)
    assert is_dir(spark, uri)
    assert not path_exists(spark, f"file:{tmp_path}/absent")
    delete_path(spark, uri)
    assert not path_exists(spark, uri)
    assert not (tmp_path / "store" / "meta").exists()


def test_sink_probes_see_file_uri(spark, tmp_path):
    """The actual sink probes must answer True for an existing store
    addressed by URI (the restart-clobber scenario)."""
    from quantlab_data_pipeline_spark.streaming.dsir_intake import _store_exists
    from quantlab_data_pipeline_spark.streaming.media_intake import _index_exists

    (tmp_path / "idx" / "meta").mkdir(parents=True)
    uri = f"file:{tmp_path}/idx"
    assert _index_exists(spark, uri)
    assert _store_exists(spark, uri)
    assert not _index_exists(spark, f"file:{tmp_path}/nope")
