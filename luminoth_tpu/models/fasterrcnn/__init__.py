from luminoth_tpu.models.fasterrcnn.model import FasterRCNN  # noqa: F401
