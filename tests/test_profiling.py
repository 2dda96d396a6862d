"""utils/profiling.py: Timer spans, rates, sync, structured logging.

The reference's observability is stdout narration (SURVEY.md §5); the
framework's is structured one-JSON-line spans — assert the contract.
"""

import json
import logging

import jax
import jax.numpy as jnp
import pytest

from tsdf_tpu.utils import profiling


def test_sync_returns_scalar_and_blocks():
    x = jnp.arange(8, dtype=jnp.float32)
    assert profiling.sync(x) == pytest.approx(28.0)
    # works on pytrees (reduces the first leaf)
    assert profiling.sync({"a": x, "b": x * 2}) == pytest.approx(28.0)


def test_timer_rates_and_log_line(caplog):
    with caplog.at_level(logging.INFO, logger="tsdf_tpu"):
        with profiling.Timer("integrate", voxels=1000) as t:
            t.result = jnp.ones((4, 4))
    assert t.elapsed is not None and t.elapsed > 0
    assert t.rate("voxels") == pytest.approx(1000 / t.elapsed)
    # exactly one structured JSON record with span name, ms, and rate
    records = [r for r in caplog.records if r.name == "tsdf_tpu"]
    assert len(records) == 1
    payload = json.loads(records[0].getMessage())
    assert payload["span"] == "integrate"
    assert payload["ms"] == pytest.approx(t.elapsed * 1e3, rel=1e-3)
    assert payload["voxels_per_s"] == pytest.approx(
        t.rate("voxels"), rel=1e-6
    )


def test_timer_propagates_exceptions(caplog):
    with pytest.raises(ValueError):
        with profiling.Timer("boom"):
            raise ValueError("x")


def test_trace_annotation_runs_inside_jit_region():
    # TraceAnnotation must be a no-op-safe wrapper when no trace is on
    with profiling.trace("span"):
        y = jax.jit(lambda a: a + 1)(jnp.zeros(4))
    assert profiling.sync(y) == pytest.approx(4.0)


def test_profile_to_writes_a_trace(tmp_path):
    d = tmp_path / "trace"
    with profiling.profile_to(str(d)):
        profiling.sync(jax.jit(lambda a: a * 2)(jnp.ones(16)))
    produced = list(d.rglob("*"))
    assert any(p.is_file() for p in produced), produced


def test_configure_logging_idempotent_handler():
    log = logging.getLogger("tsdf_tpu")
    n0 = len(log.handlers)
    profiling.configure_logging()
    profiling.configure_logging()
    # at most one handler added per call is tolerable, but the level is set
    assert log.level == logging.INFO
    # cleanup so caplog-based tests stay deterministic
    for h in log.handlers[n0:]:
        log.removeHandler(h)
