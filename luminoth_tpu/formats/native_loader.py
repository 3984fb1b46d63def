"""Compile-on-first-use loader for the one-file C helpers in ``native/``.

Shared scaffolding for ``formats.crc32c`` and ``formats.native_example``:
compile the C source with the system compiler when the cached ``.so`` is
missing or stale, publish it atomically, and ``dlopen`` it. Returns
``None`` when anything fails (no compiler, read-only filesystem, ...) so
callers can fall back to their pure-python paths.

Safety properties:
- Thread-safe: a process-wide lock serializes compile/load, and the
  compile temp name is unique per (pid, thread, random) so even separate
  processes racing on a shared cache can't interleave writes; the final
  ``os.replace`` publication is atomic.
- The cache lives in the *per-user* directory ``$XDG_CACHE_HOME/
  luminoth_tpu/native`` (``~/.cache/...`` by default), created with mode
  0700 and verified to be owned by the current user — never a
  world-writable shared ``/tmp`` path another local user could pre-plant
  loadable code in.
"""

import ctypes
import os
import subprocess
import threading
import uuid

_LOCK = threading.Lock()


def _cache_dir():
    base = os.environ.get("LUMI_NATIVE_CACHE_DIR")
    if not base:
        xdg = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache"
        )
        base = os.path.join(xdg, "luminoth_tpu", "native")
    os.makedirs(base, mode=0o700, exist_ok=True)
    st = os.stat(base)
    if hasattr(os, "getuid") and st.st_uid != os.getuid():
        raise OSError(f"native cache dir {base!r} not owned by this user")
    # makedirs does not re-mode a pre-existing directory: a cache dir
    # created earlier under a permissive umask (or via LUMI_NATIVE_CACHE_DIR)
    # could be group/world-writable, letting another local user swap the
    # .so between the staleness check and dlopen. Close it down.
    if st.st_mode & 0o077:
        os.chmod(base, 0o700)
    return base


# ``so_name`` → CDLL or None. Failed attempts are cached too, so callers
# don't retry the compiler on every record; one memo here replaces the
# per-caller global/flag/lock boilerplate.
_CACHE = {}


def load_native_lib(so_name, c_source, configure):
    """Build (if stale) + dlopen ``native/<c_source>`` → configured CDLL.

    ``configure(lib)`` sets the ctypes restype/argtypes. Returns the lib,
    or ``None`` on any failure. Memoized per ``so_name`` (including
    failures), so calling this on a hot path is cheap.
    """
    with _LOCK:
        if so_name in _CACHE:
            return _CACHE[so_name]
        lib = _load_uncached(so_name, c_source, configure)
        _CACHE[so_name] = lib
        return lib


def _load_uncached(so_name, c_source, configure):
    try:
        so_path = os.path.join(_cache_dir(), so_name)
        if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < os.path.getmtime(c_source)
        ):
            tmp_path = (
                f"{so_path}.{os.getpid()}."
                f"{threading.get_ident()}.{uuid.uuid4().hex[:8]}"
            )
            try:
                subprocess.run(
                    [
                        "cc", "-O3", "-shared", "-fPIC",
                        c_source, "-o", tmp_path,
                    ],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp_path, so_path)
            finally:
                if os.path.exists(tmp_path):
                    os.unlink(tmp_path)
        lib = ctypes.CDLL(so_path)
        configure(lib)
        return lib
    except Exception:
        return None
