"""Test harness: run everything on the CPU backend with 8 virtual devices
so sharding tests exercise a real Mesh without TPU hardware (the analog of
the reference's sw_emu/hw_emu targets and localhost sender emulators,
FPGA/Makefile:150-171, GPU/*/README 'simulates FPGA')."""

import os

# The session environment pins JAX_PLATFORMS=axon (the tunneled TPU chip)
# and a sitecustomize imports jax at interpreter startup, so plain env
# edits here are too late for platform selection — use jax.config.update.
# TPU compiles over the tunnel are ~20-40s each and tests need 8 devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, jax.devices()
