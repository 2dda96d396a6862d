"""Test config: run on a virtual 8-device CPU mesh.

Sharding logic is tested without TPU hardware, the moral equivalent of the
reference's MockKinect replay rig applied to the device mesh (SURVEY.md §4).
Must run before jax is imported anywhere.
"""

import os

# Hard override: the session env may pin JAX_PLATFORMS to a TPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
