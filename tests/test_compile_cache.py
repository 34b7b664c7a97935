"""utils/compile_cache.py: persistent-cache wiring (config only)."""

import os

import jax

from owlexabrick_tpu.utils.compile_cache import (
    enable_persistent_compilation_cache,
)


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("OWLEXABRICK_COMPILE_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        d = enable_persistent_compilation_cache(str(tmp_path / "cc"))
        assert d == str(tmp_path / "cc")
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_env_opt_out(monkeypatch):
    monkeypatch.setenv("OWLEXABRICK_COMPILE_CACHE", "0")
    prev = jax.config.jax_compilation_cache_dir
    assert enable_persistent_compilation_cache() is None
    assert jax.config.jax_compilation_cache_dir == prev


def test_env_overrides_default(tmp_path, monkeypatch):
    monkeypatch.setenv("OWLEXABRICK_COMPILE_CACHE", str(tmp_path / "env"))
    prev = jax.config.jax_compilation_cache_dir
    try:
        d = enable_persistent_compilation_cache()
        assert d == str(tmp_path / "env")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
