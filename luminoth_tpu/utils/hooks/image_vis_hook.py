"""Periodic image-summary hook for the training loop.

reference: luminoth/utils/hooks/image_vis_hook.py:7-82 (SessionRunHook with
SecondOrStepTimer, chief-only). In the functional trainer the hook is a
callback invoked after each step with the host-side batch and the
prediction dict fetched from the last step.
"""

import logging

import numpy as np

from luminoth_tpu.utils.hooks.timer import SecondOrStepTimer
from luminoth_tpu.utils.image_vis import image_vis_summaries

logger = logging.getLogger(__name__)


class ImageVisHook:
    def __init__(self, writer, model_type, image_vis_mode="train",
                 every_secs=None, every_steps=None, variances=None):
        self._writer = writer
        self._model_type = model_type
        self._mode = image_vis_mode
        self._variances = variances
        self._timer = SecondOrStepTimer(every_secs, every_steps)

    def after_step(self, step, batch, prediction_dict, all_anchors=None):
        if self._writer is None or not self._timer.should_trigger(step):
            return
        # Mark the trigger consumed up front: if the vis attempt fails,
        # retrying it (and the device_get of the whole prediction dict)
        # on EVERY subsequent step is far worse than skipping this tick.
        self._timer.update(step)
        try:
            import jax

            prediction_dict = jax.device_get(prediction_dict)
            summaries = image_vis_summaries(
                _first_in_batch(prediction_dict),
                config={"type": self._model_type},
                image_vis_mode=self._mode,
                image=batch["image"][0],
                gt_boxes=batch["gt_boxes"][0],
                all_anchors=all_anchors,
                variances=self._variances,
            )
            for name, img in summaries.items():
                self._writer.add_image(
                    f"image_vis/{name}", img, step, dataformats="HWC"
                )
            self._writer.flush()
        except Exception as e:
            logger.warning("image vis failed: %s", e)


def _first_in_batch(tree):
    """Slice the leading batch axis of every array leaf."""
    if isinstance(tree, dict):
        return {k: _first_in_batch(v) for k, v in tree.items()}
    arr = np.asarray(tree)
    if arr.ndim >= 1 and arr.shape[0] >= 1:
        return arr[0]
    return arr
