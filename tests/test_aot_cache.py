"""AOT executable cache: store/load roundtrip, invalidation, fallback."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luminoth_tpu.utils.aot_cache import AotCachedFunction


def _fn(params, x):
    return x @ params["w"] + params["b"]


@pytest.fixture
def args():
    params = {"w": jnp.ones((8, 4)), "b": jnp.full((4,), 0.5)}
    return params, jnp.ones((2, 8))


def _entries(cache_dir):
    if not os.path.isdir(cache_dir):
        return []
    return sorted(n for n in os.listdir(cache_dir) if n.endswith(".aot"))


class TestAotCachedFunction:
    def test_store_then_load_in_new_instance(self, tmp_path, args):
        cache_dir = str(tmp_path / "aot")
        f1 = AotCachedFunction(_fn, "key", cache_dir=cache_dir)
        out1 = np.asarray(f1(*args))
        assert len(_entries(cache_dir)) == 1

        # A fresh instance (≈ a fresh process) loads the stored
        # executable — verify by corrupting nothing and checking results.
        f2 = AotCachedFunction(_fn, "key", cache_dir=cache_dir)
        out2 = np.asarray(f2(*args))
        np.testing.assert_allclose(out1, out2)
        assert len(_entries(cache_dir)) == 1  # no duplicate entry

    def test_distinct_shapes_get_distinct_entries(self, tmp_path, args):
        cache_dir = str(tmp_path / "aot")
        f = AotCachedFunction(_fn, "key", cache_dir=cache_dir)
        f(*args)
        params, _ = args
        f(params, jnp.ones((5, 8)))
        assert len(_entries(cache_dir)) == 2

    def test_distinct_key_material_distinct_entries(self, tmp_path, args):
        cache_dir = str(tmp_path / "aot")
        AotCachedFunction(_fn, "key-a", cache_dir=cache_dir)(*args)
        AotCachedFunction(_fn, "key-b", cache_dir=cache_dir)(*args)
        assert len(_entries(cache_dir)) == 2

    def test_corrupt_entry_falls_back_and_heals(self, tmp_path, args):
        cache_dir = str(tmp_path / "aot")
        f1 = AotCachedFunction(_fn, "key", cache_dir=cache_dir)
        expected = np.asarray(f1(*args))
        (entry,) = _entries(cache_dir)
        with open(os.path.join(cache_dir, entry), "wb") as fh:
            fh.write(b"corrupt")

        f2 = AotCachedFunction(_fn, "key", cache_dir=cache_dir)
        np.testing.assert_allclose(np.asarray(f2(*args)), expected)
        # The corrupt entry was overwritten with a fresh one.
        with open(os.path.join(cache_dir, entry), "rb") as fh:
            assert fh.read(7) != b"corrupt"

    def test_env_disable(self, tmp_path, args, monkeypatch):
        monkeypatch.setenv("LUMI_NO_AOT_CACHE", "1")
        cache_dir = str(tmp_path / "aot")
        f = AotCachedFunction(_fn, "key", cache_dir=cache_dir)
        f(*args)
        assert _entries(cache_dir) == []

    def test_matches_plain_jit(self, args):
        expected = np.asarray(jax.jit(_fn)(*args))
        f = AotCachedFunction(_fn, "key")  # default dir; exercised once
        os.environ.get("LUMI_NO_AOT_CACHE")
        np.testing.assert_allclose(np.asarray(f(*args)), expected)
