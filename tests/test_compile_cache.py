"""Persistent compile-cache lifecycle: configure -> populate -> export
-> import on a "fresh host" (clean cache root). The shipped-cache
archive is the deployment-time half of the flagship cold-start story
(the in-process half is the staged parallel precompile,
test_staged_risk.py)."""

import os
import tarfile

import jax
import jax.numpy as jnp

from adrates_tpu.utils.compile_cache import (configure_cache,
                                             export_cache, import_cache,
                                             _host_fingerprint)


def _populate(root):
    active = configure_cache(str(root), min_compile_secs=0.0)

    @jax.jit
    def f(x):
        return jnp.sin(x) * jnp.cos(x) + jnp.tanh(x @ x.T).sum()

    f(jnp.ones((16, 16))).block_until_ready()
    return active


class TestCompileCacheShipping:
    def test_configure_suffixes_host_fingerprint(self, tmp_path):
        active = configure_cache(str(tmp_path / "a"))
        assert os.path.basename(active) == _host_fingerprint()
        assert os.path.isdir(active)

    def test_export_import_round_trip(self, tmp_path):
        src_root = tmp_path / "build_host"
        active = _populate(src_root)
        entries = os.listdir(active)
        assert entries, "jit compile produced no cache entry"

        tar = str(tmp_path / "cache.tar.gz")
        export_cache(tar, cache_root=str(src_root))
        with tarfile.open(tar) as tf:
            names = tf.getnames()
        assert any(_host_fingerprint() in n for n in names)

        dst_root = tmp_path / "prod_host"
        dst_active = import_cache(tar, cache_root=str(dst_root))
        assert os.path.basename(dst_active) == _host_fingerprint()
        # the same-fingerprint entries arrived and would be replayed
        assert set(entries) <= set(os.listdir(dst_active))
        # the process cache config now points at the imported dir
        assert jax.config.jax_compilation_cache_dir == dst_active

    def test_export_missing_root_raises(self, tmp_path):
        import pytest

        with pytest.raises(FileNotFoundError):
            export_cache(str(tmp_path / "x.tar.gz"),
                         cache_root=str(tmp_path / "nope"))
