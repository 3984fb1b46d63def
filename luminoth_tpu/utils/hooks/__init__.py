"""Periodic observability hooks for the training loop
(reference: luminoth/utils/hooks/)."""

from luminoth_tpu.utils.hooks.image_vis_hook import ImageVisHook  # noqa: F401
from luminoth_tpu.utils.hooks.timer import SecondOrStepTimer  # noqa: F401
from luminoth_tpu.utils.hooks.var_vis_hook import VarVisHook  # noqa: F401
