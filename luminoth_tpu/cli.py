"""`lumi` CLI root (reference: luminoth/cli.py:23-34)."""

import click

from luminoth_tpu.train import train
from luminoth_tpu.predict import predict


CONTEXT_SETTINGS = {"help_option_names": ["-h", "--help"]}


@click.group(
    context_settings=CONTEXT_SETTINGS,
    help="Luminoth-TPU: TPU-native computer vision toolkit",
)
def cli():
    pass


cli.add_command(train)
cli.add_command(predict)

# Subcommands registered lazily to keep import cost down and allow partial
# installs; each mirrors a reference tool group (SURVEY.md §2.9).
try:
    from luminoth_tpu.eval import eval as eval_cmd

    cli.add_command(eval_cmd)
except ImportError:
    pass

try:
    from luminoth_tpu.tools.checkpoint import checkpoint

    cli.add_command(checkpoint)
except ImportError:
    pass

try:
    from luminoth_tpu.tools.dataset import dataset

    cli.add_command(dataset)
except ImportError:
    pass

try:
    from luminoth_tpu.tools.server import server

    cli.add_command(server)
except ImportError:
    pass

try:
    from luminoth_tpu.tools.cloud import cloud

    cli.add_command(cloud)
except ImportError:
    pass
