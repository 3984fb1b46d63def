"""Run journal: append per-run metadata for forensics.

reference: luminoth/utils/experiments.py:48-73 (``save_run`` appends a JSON
line with config + environment to ``~/.luminoth/runs.json``).
"""

import getpass
import json
import os
import subprocess
import time

from luminoth_tpu.utils.config import to_plain
from luminoth_tpu.utils.homedir import get_home


def _toolkit_version():
    try:
        from luminoth_tpu.version import __version__

        return __version__
    except ImportError:  # pragma: no cover
        return None


def get_diff():
    try:
        return subprocess.check_output(
            ["git", "diff"], stderr=subprocess.DEVNULL
        ).decode("utf-8", "replace")
    except Exception:
        return None


def save_run(config, environment=None, comment=None, extra_config=None,
             filename="runs.json"):
    """Append a JSON line describing this run to the journal."""
    import jax

    diff = get_diff() if environment != "cloud" else None
    run = {
        "timestamp": time.time(),
        "user": getpass.getuser(),
        "environment": environment,
        "comment": comment,
        "config": to_plain(config),
        "extra_config": extra_config,
        "diff": diff,
        "versions": {
            "jax": jax.__version__,
            "luminoth_tpu": _toolkit_version(),
        },
    }
    path = os.path.join(get_home(), filename)
    with open(path, "a") as f:
        f.write(json.dumps(run) + "\n")
