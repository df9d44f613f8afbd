"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This environment pins JAX_PLATFORMS=axon (real TPU via tunnel) through a
sitecustomize hook, so the env var alone cannot opt out — force the CPU
backend through jax.config before any backend initialisation. This keeps
tests hermetic/fast and lets the data-parallel pjit path be exercised
without TPU hardware (SURVEY.md §4 device-count tests).
"""

import os
import sys

# The persistent XLA cache is for the TPU processes (bench/CLI); under the
# CPU test backend it can serve CPU executables AOT-compiled by a different
# machine (observed: machine-feature mismatch warnings + ~3e-3 numeric
# drift in conv backward). Tests always compile fresh.
os.environ["NISQA_TPU_NO_CACHE"] = "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
