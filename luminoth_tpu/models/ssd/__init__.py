"""SSD model family (TPU-native single-shot detector)."""

from luminoth_tpu.models.ssd.model import SSD  # noqa: F401
