"""``lumi cloud`` command group.

reference: luminoth/tools/cloud/__init__.py (the ``gc`` Google Cloud ML
Engine group). The TPU-native equivalent targets Cloud TPU VMs / pods
instead of the deprecated ML Engine.
"""

import click

from luminoth_tpu.tools.cloud.tpu import tpu


@click.group(help="Groups of commands to train models in the cloud")
def cloud():
    pass


cloud.add_command(tpu)
