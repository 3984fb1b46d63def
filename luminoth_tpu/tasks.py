"""Python task API: the ``Detector`` class.

reference: luminoth/tasks.py:12-159. Same constructor semantics
(checkpoint alias/id or explicit config) and the same ``predict`` output
format: list of ``{"bbox": [x1, y1, x2, y2], "label": ..., "prob": ...}``.
"""

import numpy as np

from luminoth_tpu.utils.config import get_config
from luminoth_tpu.utils.predicting import PredictorNetwork

DEFAULT_CHECKPOINT = "accurate"


class Detector:
    """High-level object-detection interface."""

    def __init__(self, checkpoint=None, config=None, prob=0.7, classes=None):
        """
        Args:
            checkpoint: zoo checkpoint id or alias (defaults to
                ``accurate`` when no config given).
            config: path (or list of paths) to YAML config(s), mutually
                exclusive with ``checkpoint``.
            prob: default probability threshold for predictions.
            classes: iterable of class labels to keep by default.
        """
        if checkpoint is not None and config is not None:
            raise ValueError(
                "Only one of `checkpoint` or `config` must be specified."
            )

        class_labels = None
        if config is not None:
            loaded = get_config(config)
        else:
            from luminoth_tpu.tools.checkpoint import (
                get_checkpoint_config,
                get_checkpoint_class_labels,
            )

            checkpoint = checkpoint or DEFAULT_CHECKPOINT
            loaded = get_checkpoint_config(checkpoint)
            class_labels = get_checkpoint_class_labels(checkpoint)

        self._config = loaded
        self.prob = prob
        self.classes = set(classes) if classes else None
        self._network = PredictorNetwork(
            loaded, class_labels=class_labels
        )

    def predict(self, images, prob=None, classes=None):
        """Detect objects in one image or a list of images.

        Returns a list of objects for a single image, or a list of lists
        when given a list (the models batch internally; the python list is
        the user-facing grouping, as in the reference).
        """
        if prob is None:
            prob = self.prob
        classes = self.classes if classes is None else set(classes)

        single = not isinstance(images, (list, tuple))
        if single:
            images = [images]

        # Batched device calls (the reference loops per image —
        # tasks.py:149-154). Lists chunk into power-of-two buckets so the
        # jitted forward compiles for at most a handful of batch shapes.
        arrays = [np.asarray(image) for image in images]
        batched = []
        max_chunk = 8
        i = 0
        while i < len(arrays):
            chunk = arrays[i : i + max_chunk]
            pad_to = 1
            while pad_to < len(chunk):
                pad_to *= 2
            batched.extend(
                self._network.predict_batch(chunk, pad_to=pad_to)
            )
            i += len(chunk)

        all_results = []
        for objects in batched:
            objects = [o for o in objects if o["prob"] >= prob]
            if classes is not None:
                objects = [o for o in objects if o["label"] in classes]
            all_results.append(objects)

        return all_results[0] if single else all_results
