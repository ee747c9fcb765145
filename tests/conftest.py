"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors how the reference exercises multi-GPU only at runtime
(/root/reference/main.py:37-38) — here we make multi-chip logic testable
without hardware, per SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# the axon sitecustomize pins jax_platforms at interpreter boot; an explicit
# config update is the only thing that overrides it
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() >= 8, jax.devices()
