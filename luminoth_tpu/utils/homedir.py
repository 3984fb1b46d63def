"""Toolkit home directory (``~/.luminoth_tpu``) management.

Mirrors the behavior of the reference's home management
(reference: luminoth/utils/homedir.py:9-20): a per-user directory holding the
checkpoint index, downloaded pretrained weights and the run journal, overridable
through an environment variable.
"""

import os

DEFAULT_HOME = os.path.expanduser("~/.luminoth_tpu")
HOME_ENV_VAR = "LUMI_HOME"


def get_home(create_if_missing=True):
    """Return the toolkit's home directory, creating it if needed."""
    path = os.path.abspath(os.environ.get(HOME_ENV_VAR, DEFAULT_HOME))
    if create_if_missing and not os.path.exists(path):
        os.makedirs(path, exist_ok=True)
    return path
