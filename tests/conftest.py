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

# Persistent cache for the expensive test compiles. Host-fingerprinted
# (NOT the shared .jax_cache): XLA:CPU AOT cache entries don't key on
# machine features, so a foreign host's entries can SIGILL (round-4
# verdict weak 6 / MULTICHIP_r04.json tail).
if not os.environ.get("TSDF_TPU_NO_CACHE"):
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "_graft_entry_cache",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    # __graft_entry__ itself applies the config on import
    _mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
