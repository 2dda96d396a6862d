"""On-device (TPU) smoke suite — separate from tests/, whose conftest
forces the virtual CPU mesh. Run on a chip:

    python -m pytest tests_tpu -q

Every test asserts compiled (non-interpret) kernel output == the lax
reference on the real device, catching Mosaic lowering regressions the
interpreter cannot (r1 verdict weak 4). Skips itself off-TPU.
"""

import os

import jax
import pytest

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="TPU smoke suite: no TPU backend")
    for item in items:
        item.add_marker(skip)
