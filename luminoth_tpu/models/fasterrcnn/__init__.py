"""Faster R-CNN model family (TPU-native two-stage detector)."""

from luminoth_tpu.models.fasterrcnn.model import FasterRCNN  # noqa: F401
