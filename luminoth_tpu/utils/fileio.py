"""Transparent local/remote file IO — the reference's ``tf.gfile`` seam.

The reference reads configs, TFRecords and checkpoints from GCS
transparently because every file touch goes through ``tf.gfile``
(reference: luminoth/utils/config.py:37, luminoth/datasets/base_dataset.py:37).
This module is the native equivalent: local paths use plain ``os``/
``open`` (zero overhead, zero behavior change), while any path with a
``scheme://`` routes through fsspec — so ``gs://bucket/run`` works as
``job_dir``/``data_dir`` wherever the matching fsspec backend (gcsfs,
s3fs, …) is installed. ``memory://`` ships with fsspec itself and backs
the tests.

All functions accept either kind of path; callers never branch.
"""

import glob as glob_module
import os
import posixpath

_SEP = "://"


def is_remote(path):
    """True for scheme:// paths that should route through fsspec."""
    path = str(path)
    return _SEP in path and not path.startswith("file://")


def _fs(path):
    import fsspec

    fs, _ = fsspec.core.url_to_fs(str(path))
    return fs


def _with_scheme(path, raw):
    """Re-attach ``path``'s scheme to an fs-returned bare path."""
    scheme = str(path).split(_SEP, 1)[0]
    return f"{scheme}{_SEP}{str(raw).lstrip('/')}" if is_remote(path) else raw


def open_file(path, mode="r"):
    if is_remote(path):
        import fsspec

        return fsspec.open(str(path), mode).open()
    return open(path, mode)


def exists(path):
    if is_remote(path):
        return _fs(path).exists(str(path))
    return os.path.exists(path)


def isdir(path):
    if is_remote(path):
        return _fs(path).isdir(str(path))
    return os.path.isdir(path)


def listdir(path):
    """Base names of the entries under a directory.

    A missing REMOTE directory lists as empty instead of raising: on
    object stores ``makedirs`` is a no-op (directories are prefixes
    that only exist once an object is written under them), so a fresh
    ``gs://.../run_dir`` would otherwise crash checkpoint discovery at
    train start rather than starting fresh. Local misses still raise —
    a missing local directory is a real error the caller should see.
    """
    if is_remote(path):
        try:
            return [
                posixpath.basename(p.rstrip("/"))
                for p in _fs(path).ls(str(path), detail=False)
            ]
        except FileNotFoundError:
            return []
    return os.listdir(path)


def glob(pattern):
    """Full (scheme-preserving) paths matching the pattern."""
    if is_remote(pattern):
        return [
            _with_scheme(pattern, p) for p in _fs(pattern).glob(str(pattern))
        ]
    return glob_module.glob(pattern)


def makedirs(path, exist_ok=True):
    if is_remote(path):
        _fs(path).makedirs(str(path), exist_ok=exist_ok)
        return
    os.makedirs(path, exist_ok=exist_ok)


def remove(path):
    if is_remote(path):
        _fs(path).rm(str(path))
        return
    os.remove(path)


def replace(src, dst):
    """Atomic rename locally; move (last-writer-wins) remotely.

    Object stores have no atomic rename — remote writers rely on the
    single-chief discipline the trainer already enforces.
    """
    if is_remote(src) or is_remote(dst):
        _fs(dst).mv(str(src), str(dst))
        return
    os.replace(src, dst)


def join(base, *parts):
    """Path join that preserves URL schemes (posix rules for remote)."""
    if is_remote(base):
        base = str(base)
        scheme, rest = base.split(_SEP, 1)
        return f"{scheme}{_SEP}{posixpath.join(rest, *parts)}"
    return os.path.join(base, *parts)
