"""``lumi server`` command group (reference: tools/server/cli.py)."""

import click

from luminoth_tpu.tools.server.web import web


@click.group(help="Groups of commands to serve models")
def server():
    pass


server.add_command(web)
