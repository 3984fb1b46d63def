"""TFRecord writers for converted datasets."""

from luminoth_tpu.tools.dataset.writers.object_detection_writer import (  # noqa: F401
    ObjectDetectionWriter,
)
