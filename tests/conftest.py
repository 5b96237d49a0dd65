"""Test configuration.

Tests run on CPU with an 8-device virtual mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4).  Set CSDR_TEST_TPU=1 to run the
suite on the real device instead.

NOTE: this environment force-registers the TPU backend at interpreter boot via
sitecustomize (jax.config.update("jax_platforms", "axon,cpu")), so overriding
the JAX_PLATFORMS env var is not enough — we must update the jax config after
import and before any computation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("CSDR_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
