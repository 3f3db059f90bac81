"""Test configuration: run everything on a fake 8-device CPU mesh.

Mirrors SURVEY.md §4(d): multi-chip code paths are validated with
``--xla_force_host_platform_device_count`` instead of real TPUs.

This environment routes JAX to a remote TPU tunnel ("axon" platform) via
sitecustomize, which pins ``jax_platforms`` before pytest starts and makes
the first backend init block on a network handshake for ~1 min. For unit
tests we force the in-process CPU backend instead: re-point the config and
drop the tunnel's backend factory before any test builds an array.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:  # pragma: no cover - jax internals moved; env var still set
    pass
