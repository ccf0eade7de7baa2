"""Persistent XLA compilation cache activation (utils/compile_cache.py)."""
import os

import jax
import jax.numpy as jnp

from omnivideo_tpu.utils.compile_cache import enable_persistent_compile_cache


def test_enable_sets_env_and_config(tmp_path, monkeypatch):
    cache_dir = str(tmp_path / "jaxcache")
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.setenv("OMNIVIDEO_COMPILE_CACHE_DIR", cache_dir)
    try:
        got = enable_persistent_compile_cache()
        assert got == cache_dir
        assert os.environ["JAX_COMPILATION_CACHE_DIR"] == cache_dir
        assert os.path.isdir(cache_dir)

        # entries actually land on disk (drop the min-compile-time floor so
        # a tiny CPU compile qualifies)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        f = jax.jit(lambda x: jnp.tanh(x) @ x.T)
        f(jnp.ones((64, 64), jnp.float32)).block_until_ready()
        assert any(n.endswith("-cache") for n in os.listdir(cache_dir))
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_compilation_cache_dir", None)


def test_disable_via_env(monkeypatch):
    monkeypatch.setenv("OMNIVIDEO_COMPILE_CACHE", "0")
    assert enable_persistent_compile_cache() is None


def test_explicit_env_dir_wins(tmp_path, monkeypatch):
    explicit = str(tmp_path / "explicit")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", explicit)
    try:
        assert enable_persistent_compile_cache() == explicit
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
