"""Dataset registry (reference: luminoth/datasets/datasets.py:5-22)."""

from luminoth_tpu.datasets.object_detection_dataset import (  # noqa: F401
    ObjectDetectionDataset,
    preprocess_image,
)


def get_dataset(dataset_type):
    if dataset_type in ("object_detection", "tfrecord"):
        return ObjectDetectionDataset
    raise ValueError('Invalid dataset type "{}"'.format(dataset_type))
