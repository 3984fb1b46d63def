"""Serving AOT cache: serialized compiled executables, keyed by shape.

The persistent XLA compilation cache (compilation_cache.py) removes the
*compile* from a serving cold start, but each new process still pays
tracing + lowering + cache lookup for a model the size of Faster R-CNN.
This cache also removes those: the fully-compiled executable is
serialized to disk (``jax.experimental.serialize_executable``) the
first time a (function, argument-shapes) pair runs, and later processes
deserialize and call it directly — no tracing at all.

Correctness guards, since a stale executable would silently compute the
wrong program:

* the cache key hashes the caller's key material (model config, dtype),
  the flattened argument shapes/dtypes, the jax version, the device
  fingerprint, AND a fingerprint of the installed ``luminoth_tpu``
  sources (path/size/mtime of every module) — any code edit invalidates;
* every load is best-effort: any failure (version skew, machine
  mismatch, truncated file) falls back to normal jit compilation and
  overwrites the entry.

Single-device only: sharded executables bind a device assignment, so
mesh-sharded callers keep plain ``jax.jit`` (its persistent compile
cache still applies). Disable entirely with ``LUMI_NO_AOT_CACHE=1``.
"""

import hashlib
import logging
import os
import pickle
import time

logger = logging.getLogger(__name__)

_PACKAGE_FINGERPRINT = None


def _package_fingerprint():
    """Hash of (relpath, size, mtime) over every luminoth_tpu source."""
    global _PACKAGE_FINGERPRINT
    if _PACKAGE_FINGERPRINT is None:
        import luminoth_tpu

        root = os.path.dirname(os.path.abspath(luminoth_tpu.__file__))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for name in sorted(filenames):
                if not name.endswith((".py", ".yml", ".c")):
                    continue
                path = os.path.join(dirpath, name)
                st = os.stat(path)
                h.update(
                    f"{os.path.relpath(path, root)}:{st.st_size}:"
                    f"{st.st_mtime_ns}\n".encode()
                )
        _PACKAGE_FINGERPRINT = h.hexdigest()
    return _PACKAGE_FINGERPRINT


def _device_fingerprint():
    import jax

    d = jax.devices()[0]
    return (
        f"{d.platform}/{getattr(d, 'device_kind', '?')}/"
        f"n{jax.device_count()}/jax-{jax.__version__}"
    )


class AotCachedFunction:
    """A jit-compiled function with per-shape AOT executable caching.

    Wraps ``jax.jit(fn)``; each distinct argument-shape signature is
    served by a compiled executable that is loaded from disk when a
    valid entry exists, else compiled (through the persistent XLA cache)
    and serialized for the next process.
    """

    def __init__(self, fn, key_material, cache_dir=None):
        import jax

        self._jit = jax.jit(fn)
        self._key_material = str(key_material)
        self._compiled = {}
        self._enabled = not os.environ.get("LUMI_NO_AOT_CACHE")
        if cache_dir is None:
            cache_dir = os.environ.get("LUMI_AOT_CACHE")
        if cache_dir is None:
            from luminoth_tpu.utils.homedir import get_home

            cache_dir = os.path.join(get_home(), "aot_cache")
        self._dir = cache_dir

    def _shape_key(self, args):
        import jax

        leaves = jax.tree_util.tree_leaves(args)
        return tuple(
            (tuple(getattr(x, "shape", ())), str(getattr(x, "dtype", "?")))
            for x in leaves
        )

    def _entry_path(self, shape_key):
        digest = hashlib.sha256(
            repr((
                self._key_material,
                shape_key,
                _device_fingerprint(),
                _package_fingerprint(),
            )).encode()
        ).hexdigest()[:32]
        return os.path.join(self._dir, f"exec_{digest}.aot")

    def __call__(self, *args):
        shape_key = self._shape_key(args)
        fn = self._compiled.get(shape_key)
        if fn is None:
            fn = self._load_or_compile(shape_key, args)
            self._compiled[shape_key] = fn
        return fn(*args)

    def _load_or_compile(self, shape_key, args):
        if not self._enabled:
            return self._jit
        path = self._entry_path(shape_key)
        try:
            from jax.experimental import serialize_executable

            t0 = time.time()
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            import jax

            # Pin to one device: without this, loading under a
            # multi-device backend binds every local device and then
            # rejects single-shard args.
            loaded = serialize_executable.deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:1],
            )
            logger.info(
                "AOT cache hit: loaded executable in %.1fs (%s)",
                time.time() - t0, os.path.basename(path),
            )
            return loaded
        except FileNotFoundError:
            pass
        except Exception as e:  # stale/corrupt/incompatible: recompile
            logger.warning("AOT cache load failed (%s); recompiling", e)

        compiled = self._jit.lower(*args).compile()
        try:
            from jax.experimental import serialize_executable

            payload, in_tree, out_tree = serialize_executable.serialize(
                compiled
            )
            os.makedirs(self._dir, exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)
            logger.info(
                "AOT cache store: %s (%.1f MB)", os.path.basename(path),
                os.path.getsize(path) / 1e6,
            )
            self._prune()
        except Exception as e:  # best-effort, never fatal
            logger.info("AOT cache store skipped: %s", e)
        return compiled

    def _prune(self):
        """Keep the newest N entries (executables can be large)."""
        keep = int(os.environ.get("LUMI_AOT_CACHE_MAX", 16))
        try:
            entries = [
                os.path.join(self._dir, n)
                for n in os.listdir(self._dir) if n.endswith(".aot")
            ]
            entries.sort(key=os.path.getmtime, reverse=True)
            for victim in entries[keep:]:
                os.remove(victim)
        except OSError:
            pass
