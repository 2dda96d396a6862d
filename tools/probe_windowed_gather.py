"""Microbench: windowed vs full-scan lane gather at raycast shapes.

Per-call timing through the axon tunnel is ~1 ms dispatch-bound, so each
variant runs 100x inside ONE jit (idx perturbed per iteration so XLA
cannot hoist the gather out of the loop).
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tsdf_tpu.kernels.gather import (
    lane_gather_checked,
    lane_gather_op,
    lane_gather_windowed_op,
)

REPS = 100


def sync(x):
    return float(jnp.sum(x))


def bench_looped(gather, tab, idx, reps=REPS):
    @jax.jit
    def run(tab, idx):
        def body(i, acc):
            g = gather(tab, jnp.minimum(idx + i % 2, tab.shape[1] - 1))
            return acc + jnp.sum(g)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    sync(run(tab, idx))
    t0 = time.time()
    sync(run(tab, idx))
    return (time.time() - t0) / reps


rng = np.random.default_rng(0)
for name, s, w, c, tilt in [
    ("passA_512", 2048, 512, 480, 0.15),
    ("passB_512", 1920, 512, 640, 0.15),
    ("passA_offaxis", 2048, 512, 480, 0.5),
]:
    tab = jnp.asarray(rng.standard_normal((s, w)).astype(np.float32))
    rowshift = (np.arange(s) % 64) * tilt
    base = np.linspace(0, w - 1.0, c)[None, :] * 0.9 + rowshift[:, None]
    idx = jnp.asarray(np.clip(base, 0, w - 1).astype(np.int32))
    _, miss = lane_gather_windowed_op(tab, idx)
    t_full = bench_looped(lambda t, i: lane_gather_op(t, i), tab, idx)
    t_win = bench_looped(
        lambda t, i: lane_gather_windowed_op(t, i)[0], tab, idx
    )
    t_chk = bench_looped(lambda t, i: lane_gather_checked(t, i), tab, idx)
    eq = bool(
        jnp.array_equal(
            lane_gather_checked(tab, idx), lane_gather_op(tab, idx)
        )
    )
    print(
        f"[{name}] full={t_full*1e6:.0f}us windowed={t_win*1e6:.0f}us "
        f"checked={t_chk*1e6:.0f}us miss={int(miss)} eq={eq}",
        flush=True,
    )
