"""Decompose the current nbr forward stage-by-stage at NGP scale.
Sections: idx / take / blend / asm / full (each adds a stage)."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp

from jnerf_tpu.ops.hash_grid import HashGridSpec
from jnerf_tpu.ops import hash_nbr as H

key = jax.random.PRNGKey(0)
N = 1 << 18
spec = HashGridSpec(n_levels=16, log2_hashmap_size=19, max_level_size=1 << 18)
L = spec.n_levels

table = jax.random.normal(key, (spec.n_entries, 2), jnp.float32) * 0.1
pos = jax.random.uniform(key, (N, 3), jnp.float32)
nbrs = jax.jit(lambda t: H.build_nbr_table(spec, t.astype(H.GATHER_DTYPE)))(table)
nbrs = jax.block_until_ready(nbrs)


def chained(name, body, carry, args, reps=4):
    @jax.jit
    def run(c, *a):
        def f(c, _):
            return body(c, *a), None
        out, _ = jax.lax.scan(f, c, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))

    _ = float(run(carry, *args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(carry, *args))
        ts.append(time.perf_counter() - t0)
    t = min(ts) / reps
    print(f"{name}: {t*1e3:.2f} ms", flush=True)


def jitter(c, x):
    return x + c.reshape(-1)[0].astype(x.dtype) * jnp.asarray(1e-9, x.dtype)


def staged(stage):
    """Rebuild _encode_from_nbr but stop after `stage`."""
    mults = H.level_multipliers(spec)
    import numpy as np

    def f(c, pos, *nbrs):
        pos = jitter(c, pos)
        bx, by, bz = (jnp.asarray(b)[None, :] for b in (H._BX, H._BY, H._BZ))
        px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
        acc16 = 0.0
        parts = []
        for lvl in range(L):
            sz = spec.level_sizes[lvl]
            scale = jnp.float32(spec.scales[lvl])
            A, B, C = (jnp.uint32(m) for m in mults[lvl])
            g, fr = [], []
            for p in (px, py, pz):
                q = p * scale + 0.5
                gq = jnp.floor(q)
                fr.append((q - gq)[:, None])
                g.append(gq.astype(jnp.uint32))
            raw = g[0] * A + g[1] * B + g[2] * C
            mask = H._level_mask(spec, lvl)
            e0 = (raw & jnp.uint32(mask) if mask is not None
                  else raw % jnp.uint32(sz)).astype(jnp.int32)
            if stage == "idx":
                acc16 = acc16 + e0.astype(jnp.float32) + fr[0][:, 0]
                continue
            rows = H._take_split(nbrs[lvl], e0)
            if stage == "take":
                acc16 = acc16 + rows[:, 0].astype(jnp.float32)
                continue
            w = (((1.0 - fr[0]) + bx * (2.0 * fr[0] - 1.0))
                 * ((1.0 - fr[1]) + by * (2.0 * fr[1] - 1.0))
                 * ((1.0 - fr[2]) + bz * (2.0 * fr[2] - 1.0)))
            part = (rows.astype(jnp.float32) * w).astype(H.GATHER_DTYPE)
            if stage == "blend":
                acc16 = acc16 + part[:, 0].astype(jnp.float32)
                continue
            parts.append(part)
        if stage in ("idx", "take", "blend"):
            return acc16[:1][None, :]
        weighted = jnp.concatenate(parts, axis=1)
        out = jnp.dot(weighted,
                      jnp.asarray(H._assembly_matrix(L)).astype(H.GATHER_DTYPE),
                      preferred_element_type=jnp.float32)
        return out[:1]

    return f


which = sys.argv[1:] or ["idx", "take", "blend", "asm"]
for s in which:
    if s == "asm":
        chained("full (asm)", staged("asm"),
                jnp.zeros((1, 2 * L), jnp.float32), (pos,) + tuple(nbrs))
    else:
        chained(s, staged(s), jnp.zeros((1, 1), jnp.float32),
                (pos,) + tuple(nbrs))
