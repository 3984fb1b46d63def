from luminoth_tpu.models.ssd.model import SSD  # noqa: F401
