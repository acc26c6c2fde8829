"""Test config: run JAX on a virtual 8-device CPU mesh so sharding/collective code is
exercised without TPU hardware (SURVEY.md §4).

This image force-registers the `axon` TPU backend via sitecustomize (single-client
tunnel — concurrent test processes would wedge it), so tests explicitly re-select the
cpu platform right after import, before any backend is initialized.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
