"""`lumi` CLI root (reference: luminoth/cli.py:23-34).

Subcommands are genuinely lazy: the heavy modules (jax/flax via train,
eval, predict; the tools groups) are imported only when their command is
invoked, so ``lumi -h`` stays fast. An import failure inside a command
module surfaces loudly at invocation time instead of silently dropping
the command from the listing.
"""

import importlib

import click

CONTEXT_SETTINGS = {"help_option_names": ["-h", "--help"]}

# command name → (module, attribute); each mirrors a reference tool
# group / entry point (SURVEY.md §2.1, §2.9).
_COMMANDS = {
    "train": ("luminoth_tpu.train", "train"),
    "predict": ("luminoth_tpu.predict", "predict"),
    "eval": ("luminoth_tpu.eval", "eval"),
    "checkpoint": ("luminoth_tpu.tools.checkpoint", "checkpoint"),
    "dataset": ("luminoth_tpu.tools.dataset", "dataset"),
    "server": ("luminoth_tpu.tools.server", "server"),
    "cloud": ("luminoth_tpu.tools.cloud", "cloud"),
}

_HELP = {
    "train": "Train a detection model.",
    "predict": "Run a detector on images or video.",
    "eval": "Evaluate checkpoints on a dataset split.",
    "checkpoint": "Manage the checkpoint zoo.",
    "dataset": "Convert and merge datasets.",
    "server": "Serve a model over HTTP.",
    "cloud": "Launch cloud TPU jobs.",
}


class LazyGroup(click.Group):
    def list_commands(self, ctx):
        return sorted(_COMMANDS)

    def get_command(self, ctx, name):
        target = _COMMANDS.get(name)
        if target is None:
            return None
        module, attr = target
        return getattr(importlib.import_module(module), attr)

    def format_commands(self, ctx, formatter):
        # Help listing without importing any command module.
        rows = [(name, _HELP.get(name, "")) for name in sorted(_COMMANDS)]
        with formatter.section("Commands"):
            formatter.write_dl(rows)


@click.group(
    cls=LazyGroup,
    context_settings=CONTEXT_SETTINGS,
    help="Luminoth-TPU: TPU-native computer vision toolkit",
)
def cli():
    pass
