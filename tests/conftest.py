"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's in-process test strategy (SURVEY.md §4) while adding
multi-device sharding coverage without TPU pod hardware.

Note: the environment's ``sitecustomize`` pre-imports jax and registers the
TPU plugin before pytest starts, so env vars alone are too late — we must
switch the platform through ``jax.config`` before any backend initializes.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
