"""Initializer / activation factories.

reference: luminoth/utils/vars.py:4-88 (initializer registry, activation
lookup). Maps the reference's TF initializer configs onto
``jax.nn.initializers`` so base_config.yml files keep working unchanged.
"""

import jax
import jax.numpy as jnp


def get_initializer(config, seed=None):
    """Build a flax kernel initializer from a config dict.

    Supported types (matching the reference registry):
    ``truncated_normal_initializer``, ``variance_scaling_initializer``,
    ``random_normal_initializer``, ``xavier_initializer``.
    """
    if config is None:
        return jax.nn.initializers.lecun_normal()
    itype = config.get("type", "variance_scaling_initializer")

    if itype == "truncated_normal_initializer":
        return jax.nn.initializers.truncated_normal(
            stddev=config.get("stddev", 1.0)
        )
    if itype == "random_normal_initializer":
        return jax.nn.initializers.normal(stddev=config.get("stddev", 1.0))
    if itype == "variance_scaling_initializer":
        mode_map = {
            "FAN_IN": "fan_in",
            "FAN_OUT": "fan_out",
            "FAN_AVG": "fan_avg",
        }
        mode = mode_map.get(config.get("mode", "FAN_AVG"), "fan_avg")
        distribution = (
            "uniform" if config.get("uniform", True) else "truncated_normal"
        )
        return jax.nn.initializers.variance_scaling(
            scale=config.get("factor", 1.0),
            mode=mode,
            distribution=distribution,
        )
    if itype == "xavier_initializer":
        return jax.nn.initializers.xavier_uniform()
    raise ValueError("Initializer {} not supported".format(itype))


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "relu6": lambda x: jnp.minimum(jax.nn.relu(x), 6.0),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "": lambda x: x,
    None: lambda x: x,
}


def get_activation(name):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError("Activation function {} not supported".format(name))
