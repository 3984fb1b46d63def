"""Transfer-path warmup for high-latency device attachments.

Some PJRT attachments (notably tunneled/remote TPU chips) pay a large
one-time cost on the process's FIRST device->host fetch while the
transfer path is established. `warm_transfer_path_async` issues a
throwaway scalar fetch on a daemon thread so that cost overlaps model
compilation instead of landing on the first user-visible prediction or
the first logged training step. On direct-attached devices the fetch is
microseconds — calling this is always safe.

(No reference counterpart: TF sessions established their transfer path
during `Session.run` warmup implicitly.)
"""

import threading

_started = False
_lock = threading.Lock()


def warm_transfer_path_async():
    """Start (once per process) a background fetch to open the D2H path.

    Returns the thread (or None if already started / jax unavailable).
    """
    global _started
    with _lock:
        if _started:
            return None
        _started = True

    # Initialize the JAX backend HERE, on the calling thread, before the
    # fetch thread starts. If the daemon thread wins the backend-init
    # race instead, PJRT client creation can hang when driven from a
    # secondary thread (observed with tunneled-TPU plugins), and every
    # other thread then deadlocks on the backend lock behind it.
    try:
        import jax

        jax.devices()
    except Exception:  # pragma: no cover - backend issues surface later
        pass

    def _fetch():
        try:
            import jax
            import jax.numpy as jnp

            jax.device_get(jnp.zeros((), jnp.float32))
        except Exception:  # pragma: no cover - best-effort warmup
            pass

    thread = threading.Thread(
        target=_fetch, daemon=True, name="lumi-transfer-warmup"
    )
    thread.start()
    return thread
