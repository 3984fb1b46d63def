"""Dataset conversion CLI: reader → TFRecord writer per split.

reference: luminoth/tools/dataset/transform.py:10-73.
"""

import logging

import click

from luminoth_tpu.datasets.exceptions import InvalidDataDirectory
from luminoth_tpu.tools.dataset.readers import get_reader
from luminoth_tpu.tools.dataset.writers import ObjectDetectionWriter
from luminoth_tpu.utils.config import parse_override

logger = logging.getLogger(__name__)


@click.command()
@click.option(
    "dataset_reader", "--type",
    type=click.Choice(["coco", "csv", "flat", "imagenet", "openimages",
                       "pascal", "taggerine"]),
    required=True)
@click.option("--data-dir", required=True,
              help="Where to locate the original data.")
@click.option("--output-dir", required=True,
              help="Where to save the transformed data.")
@click.option("splits", "--split", required=True, multiple=True,
              help="The splits to transform (ie. train, test, val).")
@click.option("--only-classes",
              help="Keep only examples of these classes. Comma separated.")
@click.option("--only-images",
              help="Create dataset with specific examples.")
@click.option("--limit-examples", type=int,
              help="Limit the dataset to the first N examples.")
@click.option("--class-examples", type=int,
              help="Finish when every class has at least N samples.")
@click.option("overrides", "--override", "-o", multiple=True,
              help="Custom parameters for readers.")
@click.option("--debug", is_flag=True, help="Set level logging to DEBUG.")
def transform(dataset_reader, data_dir, output_dir, splits, only_classes,
              only_images, limit_examples, class_examples, overrides, debug):
    """Prepare a dataset for ingestion: one TFRecords file per split."""
    logging.basicConfig(level=logging.DEBUG if debug else logging.INFO)

    try:
        reader = get_reader(dataset_reader)
    except ValueError as e:
        click.echo(f"Error getting reader: {e}")
        return

    # All splits must share a consistent class set.
    classes = None
    reader_kwargs = parse_override(list(overrides))

    try:
        for split in splits:
            split_reader = reader(
                data_dir, split,
                only_classes=only_classes, only_images=only_images,
                limit_examples=limit_examples,
                class_examples=class_examples,
                **reader_kwargs,
            )
            if classes is None:
                classes = split_reader.classes
            else:
                split_reader.classes = classes

            writer = ObjectDetectionWriter(split_reader, output_dir, split)
            writer.save()

            click.echo(f"Composition per class ({split}):")
            for label, count in split_reader._per_class_counter.most_common():
                click.echo(
                    "\t{}: {}".format(split_reader.pretty_name(label), count)
                )
    except InvalidDataDirectory as e:
        click.echo(f"Error reading dataset: {e}")
