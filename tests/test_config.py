"""Data-root resolution tests, mirroring the reference's
/root/reference/tests/test_config.py:8-25 coverage."""

from __future__ import annotations

from quantlab_data_pipeline_spark.config import (
    PIPELINE_SUBDIR_NAME,
    load_config,
    resolve_data_root,
)


def test_appends_pipeline_subdir(tmp_path):
    assert resolve_data_root(tmp_path) == tmp_path / PIPELINE_SUBDIR_NAME


def test_legacy_layout_detected(tmp_path):
    (tmp_path / "data_processed").mkdir()
    assert resolve_data_root(tmp_path) == tmp_path


def test_pipeline_root_idempotent(tmp_path):
    root = tmp_path / PIPELINE_SUBDIR_NAME
    root.mkdir()
    assert resolve_data_root(root) == root


def test_env_var_root(tmp_path, monkeypatch):
    monkeypatch.setenv("QUANTLAB_DATA_ROOT", str(tmp_path))
    assert resolve_data_root(None) == tmp_path / PIPELINE_SUBDIR_NAME


def test_load_config(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nb:\n  c: x\n")
    assert load_config(p) == {"a": 1, "b": {"c": "x"}}
