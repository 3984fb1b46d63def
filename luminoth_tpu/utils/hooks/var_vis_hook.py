"""Periodic parameter-histogram hook.

reference: luminoth/utils/hooks/var_vis_hook.py:6-75 + utils/vars.py
summary helpers with full/reduced log levels.
"""

import logging

import numpy as np

from luminoth_tpu.utils.checkpoint_io import flatten_params
from luminoth_tpu.utils.hooks.timer import SecondOrStepTimer

logger = logging.getLogger(__name__)


class VarVisHook:
    def __init__(self, writer, mode="reduced", every_secs=None,
                 every_steps=None):
        self._writer = writer
        self._mode = mode
        self._timer = SecondOrStepTimer(every_secs, every_steps)

    def after_step(self, step, params):
        if self._writer is None or not self._timer.should_trigger(step):
            return
        # Consume the trigger up front so a failing summary attempt isn't
        # retried (with a full param-pytree device_get) every later step.
        self._timer.update(step)
        try:
            import jax

            flat = flatten_params(jax.device_get(params))
            for name, value in flat.items():
                value = np.asarray(value)
                if self._mode == "full":
                    # The reference's full log level (utils/vars.py:20-45):
                    # histogram + stddev/max/min/sparsity statistics.
                    self._writer.add_histogram(
                        f"variables/{name}", value, step
                    )
                    self._writer.add_scalar(
                        f"variables/{name}/stddev", float(value.std()), step
                    )
                    self._writer.add_scalar(
                        f"variables/{name}/max", float(value.max()), step
                    )
                    self._writer.add_scalar(
                        f"variables/{name}/min", float(value.min()), step
                    )
                    self._writer.add_scalar(
                        f"variables/{name}/sparsity",
                        float((value == 0).mean()), step,
                    )
                self._writer.add_scalar(
                    f"variables/{name}/mean", float(value.mean()), step
                )
            self._writer.flush()
        except Exception as e:
            logger.warning("var vis failed: %s", e)
