"""Interactive debugging helpers for jitted code.

reference: luminoth/utils/debug.py:6-15 (a ``tf.py_func`` ipdb trap). The
JAX equivalents: ``debug_print`` traces values from inside jit, and
``debugger`` drops into pdb via a host callback.
"""

import jax


def debug_print(fmt, *args):
    """Print traced values from inside a jitted function."""
    jax.debug.print(fmt, *args)


def debugger(*values):
    """Host-side pdb trap: breaks with the concrete values available.

    Usage inside any (even jitted) function::

        from luminoth_tpu.utils.debug import debugger
        debugger(tensor_a, tensor_b)
    """

    def _trap(*concrete):
        import pdb

        pdb.set_trace()

    jax.debug.callback(_trap, *values)
    return values[0] if len(values) == 1 else values
