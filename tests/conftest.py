import os
import sys

# The container's sitecustomize registers the axon TPU backend in every
# interpreter and wins over JAX_PLATFORMS env settings; override through
# jax.config before any backend initializes. Tests always run on a virtual
# 8-device CPU mesh.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
