"""Persistent XLA compilation cache shared across processes.

The reference restores a TF session in seconds; a cold JAX process pays
the full XLA compile (~2 min for Faster R-CNN / ResNet-101) on the first
image per canvas bucket. Persisting compiled executables under the
toolkit home gives every later process (``lumi predict``, the web server,
training restarts) a warm start for shapes seen before.

Call :func:`enable_persistent_cache` once, before the first jitted call.
Disable with ``LUMI_NO_COMPILATION_CACHE=1`` (e.g. for benchmarking the
true cold path).
"""

import logging
import os

logger = logging.getLogger(__name__)

_ENABLED = False


def enable_persistent_cache(cache_dir=None):
    """Point JAX's compilation cache at a persistent on-disk directory.

    Safe to call multiple times and after JAX backend initialization
    (the cache config is read per-compile, not at backend init).
    """
    global _ENABLED
    if os.environ.get("LUMI_NO_COMPILATION_CACHE"):
        return None
    if cache_dir is None:
        cache_dir = os.environ.get("LUMI_COMPILATION_CACHE")
    if cache_dir is None:
        from luminoth_tpu.utils.homedir import get_home

        cache_dir = os.path.join(get_home(), "compilation_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compile that takes >1s (default threshold is 60s,
        # which skips most per-bucket predict shapes).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as exc:  # cache is best-effort, never fatal
        logger.warning("persistent compilation cache disabled: %s", exc)
        return None
    if not _ENABLED:
        logger.info("persistent compilation cache at %s", cache_dir)
        _ENABLED = True
    return cache_dir


def warm_start():
    """Entry-point warm start, one call for every CLI surface.

    Enables the persistent compilation cache and kicks off the async
    transfer-path warmup (see utils/tunnel.py) so both behaviors stay in
    sync across train/eval/predict/server.
    """
    cache_dir = enable_persistent_cache()
    from luminoth_tpu.utils.tunnel import warm_transfer_path_async

    warm_transfer_path_async()
    return cache_dir
