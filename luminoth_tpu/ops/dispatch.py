"""Backend dispatch predicate shared by the Pallas-accelerated ops.

The fused kernels (ROI crop+pool, grouped NMS) target the TPU; every op
that uses them also carries a pure-XLA formulation for CPU/GPU and for
debugging. ``LUMI_DISABLE_PALLAS=1`` forces the XLA path everywhere.
"""

import os

import jax


def on_tpu():
    """True when the default backend should take the Pallas kernel path."""
    if os.environ.get("LUMI_DISABLE_PALLAS"):
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    # Allowlist, not "anything that isn't cpu/gpu": a non-TPU plugin
    # backend (METAL, neuron, ...) must take the XLA path rather than
    # crash lowering pltpu kernels. "axon" is this environment's
    # tunneled TPU plugin.
    return platform in ("tpu", "axon")
