"""Honor JAX_PLATFORMS under the axon tunnel plugin.

The environment's axon (TPU tunnel) plugin registers itself from
sitecustomize and forces its own platform list, ignoring the JAX_PLATFORMS
env var — so forcing CPU for tests/self-runs requires pinning via
jax.config instead (the same workaround tests/conftest.py applies before
any backend touch).  One shared helper so bench.py and the tools/ probes
don't each carry a divergent copy.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Pin jax to $JAX_PLATFORMS via the config, if the env var is set.

    Must run before the first backend touch (``jax.devices()``/first op);
    a no-op when the variable is unset."""
    p = os.environ.get("JAX_PLATFORMS")
    if p:
        import jax

        jax.config.update("jax_platforms", p)
