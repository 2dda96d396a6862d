"""utils/profiling.py: sync, Timer rates, trace annotation, logging."""

import json
import logging

import jax.numpy as jnp
import numpy as np

from tsdf_tpu.utils.profiling import Timer, sync, trace


def test_sync_returns_checksum():
    x = {"a": jnp.arange(5.0), "b": jnp.ones(3)}
    assert sync(x) == 10.0  # first leaf: 0+1+2+3+4


def test_timer_rates_and_log(caplog):
    with caplog.at_level(logging.INFO, logger="tsdf_tpu"):
        with Timer("op", voxels=1000) as t:
            t.result = jnp.ones(4)
    assert t.elapsed is not None and t.elapsed > 0
    assert t.rate("voxels") == 1000 / t.elapsed
    rec = json.loads(caplog.records[-1].message)
    assert rec["span"] == "op"
    assert rec["ms"] > 0 and rec["voxels_per_s"] > 0


def test_timer_propagates_exceptions():
    try:
        with Timer("boom"):
            raise ValueError("x")
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("Timer swallowed the exception")


def test_trace_annotation_runs():
    with trace("span"):
        v = jnp.sum(jnp.arange(10.0))
    assert float(v) == 45.0
