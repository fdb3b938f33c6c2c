"""Persistent-compile-cache resolution and wiring (utils/compile_cache.py).

The serving daemon's restart path is the customer: a restarted `w2t serve`
must reload its compiled programs from disk instead of recompiling
(BASELINE.md measured 152-273 s surprise compiles over the tunnel).
"""
import os

import pytest

from waymo_2d_tracking_tpu.utils import compile_cache as cc


def test_resolution_order(monkeypatch, tmp_path):
    monkeypatch.delenv(cc._ENV_VAR, raising=False)
    # default
    assert cc.resolve_cache_dir() == os.path.expanduser(cc._DEFAULT)
    # env var beats default
    monkeypatch.setenv(cc._ENV_VAR, str(tmp_path / "env"))
    assert cc.resolve_cache_dir() == str(tmp_path / "env")
    # explicit arg beats env
    assert cc.resolve_cache_dir(str(tmp_path / "arg")) == str(tmp_path / "arg")
    # 'off' from any source disables
    assert cc.resolve_cache_dir("off") is None
    assert cc.resolve_cache_dir(" OFF ") is None
    monkeypatch.setenv(cc._ENV_VAR, "off")
    assert cc.resolve_cache_dir() is None


def test_enable_sets_jax_config_and_is_idempotent(tmp_path):
    import jax

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_enabled = cc._enabled_dir
    target = str(tmp_path / "cache")
    try:
        got = cc.enable_compile_cache(target)
        assert got == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
        # second call is a no-op (same resolved dir)
        assert cc.enable_compile_cache(target) == target
        # 'off' leaves the active config untouched and returns None
        assert cc.enable_compile_cache("off") is None
        assert jax.config.jax_compilation_cache_dir == target
    finally:
        # the test suite's own cache (tests/conftest.py) must survive this
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        cc._enabled_dir = prev_enabled


def test_cli_wires_compile_cache_flag(monkeypatch, tmp_path):
    """--compile-cache on a jax verb reaches enable_compile_cache."""
    from waymo_2d_tracking_tpu import cli

    seen = {}
    monkeypatch.setattr(cc, "enable_compile_cache",
                        lambda path=None: seen.setdefault("path", path))
    args = cli.build_parser().parse_args(
        ["detect", "--compile-cache", str(tmp_path / "c"),
         "--segments-dir", "segs", "--out", "x.jsonl"])
    cli._enable_compile_cache(args)
    assert seen["path"] == str(tmp_path / "c")
