"""luminoth_tpu — TPU-native object-detection toolkit.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
toolkit (tryolabs/luminoth): Faster R-CNN and SSD detectors, a ``lumi``-style
CLI, layered YAML configs, dataset converters, a training loop with
data-parallel sharding over a TPU mesh, a streaming COCO-style evaluator, a
checkpoint zoo and a web demo server.

Public API mirrors the reference (reference: luminoth/__init__.py:30-33):
``Detector``, ``read_image``, ``vis_objects`` and the ``cli`` entry point.
Imports are lazy so ``import luminoth_tpu`` stays cheap.
"""

from luminoth_tpu.version import __version__  # noqa: F401

_LAZY = {
    "cli": ("luminoth_tpu.cli", "cli"),
    "Detector": ("luminoth_tpu.tasks", "Detector"),
    "read_image": ("luminoth_tpu.io", "read_image"),
    "vis_objects": ("luminoth_tpu.vis", "vis_objects"),
}

__all__ = ["__version__"] + list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'luminoth_tpu' has no attribute '{name}'")
