"""Model registry (reference: luminoth/models/models.py:6-22)."""


def get_model(model_type):
    if model_type == "ssd":
        from luminoth_tpu.models.ssd import SSD

        return SSD
    if model_type == "fasterrcnn":
        from luminoth_tpu.models.fasterrcnn import FasterRCNN

        return FasterRCNN
    raise ValueError('Invalid model type "{}"'.format(model_type))
