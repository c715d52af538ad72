"""Pytest root conftest: run the suite on CPU with 8 virtual devices.

Multi-chip code paths (shard_map / psum / ppermute in src/tpurt/dist) are
tested against a fake 8-device CPU mesh per SURVEY.md §4b — real TPU hardware
is only used by the bench harness.  jax may already be imported by the
environment's sitecustomize, so we update config instead of relying on env
vars alone; the backend is initialized lazily on first use, which is late
enough for both knobs to take effect.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "src"))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
