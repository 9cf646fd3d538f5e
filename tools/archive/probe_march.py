"""Decompose sample_rays (the 23 ms march) by monkeypatching stages:
full / no-occupancy-probe (always occupied) / const-t (linear candidates) /
first_s on smaller probe grids."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp

from jnerf_tpu.ops import ray_march as RM
from jnerf_tpu.ops import occupancy as OCC
from jnerf_tpu.ops.occupancy import make_grid_config

key = jax.random.PRNGKey(0)
R, S = 4096, 64

g = make_grid_config((0.0, 1.0), grid_size=128, max_steps=1024)
cfg = RM.MarchConfig(grid=g, near_distance=0.05, cone_angle=0.0, const_dt=True)
print(f"K={cfg.n_candidates} stride={cfg.probe_stride}", flush=True)

bitfield = jax.random.uniform(key, (g.n_cascades, 128, 128, 128)) < 0.3
ro = jax.random.uniform(key, (R, 3)) * 0.2 + 0.1
rd = jax.random.normal(key, (R, 3))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)


def chained(name, body, args, reps=4):
    @jax.jit
    def run(c, *a):
        def f(c, _):
            return body(c, *a), None
        out, _ = jax.lax.scan(f, c, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))

    _ = float(run(jnp.zeros((1, 8), jnp.float32), *args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(jnp.zeros((1, 8), jnp.float32), *args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)/reps*1e3:.2f} ms", flush=True)


def full(c, bf, ro, rd):
    o = ro + c[0, 0] * 1e-9
    s = RM.sample_rays(cfg, bf, o, rd, key, S)
    return s.positions[0, :, 0][None, :8]


which = sys.argv[1:] or ["full", "noocc", "nofirst"]

if "full" in which:
    chained("full sample_rays", full, (bitfield, ro, rd))

if "noocc" in which:
    real = OCC.occupancy_at_xyz

    def fake_occ(bf, x, y, z, mip, gg):
        return (x * 0.0 + 1.0) > 0.5  # all occupied, no gather

    OCC.occupancy_at_xyz = fake_occ
    RM.occupancy_at_xyz = fake_occ
    chained("no occupancy gather", full, (bitfield, ro, rd))
    OCC.occupancy_at_xyz = real
    RM.occupancy_at_xyz = real

if "nofirst" in which:
    real_f = RM._first_s_indices

    def fake_first(occ, s):
        idx = jnp.broadcast_to(
            jnp.arange(s, dtype=jnp.int32)[None], (occ.shape[0], s))
        return idx, jnp.sum(occ.astype(jnp.int32), axis=1)

    RM._first_s_indices = fake_first
    chained("no first_s (arange idx)", full, (bitfield, ro, rd))
    RM._first_s_indices = real_f
