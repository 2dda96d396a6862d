"""Test config: run on a virtual 8-device CPU mesh.

Sharding logic is tested without TPU hardware, the moral equivalent of the
reference's MockKinect replay rig applied to the device mesh (SURVEY.md §4).

The environment may import jax at interpreter start (sitecustomize
registering a TPU PJRT plugin) before this file runs, so setting
JAX_PLATFORMS in os.environ is not enough — use jax.config, which takes
effect as long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
