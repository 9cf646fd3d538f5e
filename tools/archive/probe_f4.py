"""F=4/L=8 vs F=2/L=16 at NGP scale on the chip: fwd and fwd+bwd."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp
from jnerf_tpu.ops.hash_grid import HashGridSpec
from jnerf_tpu.ops import hash_nbr as H

key = jax.random.PRNGKey(0)
N = 1 << 18

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
    print(f"{name}: {min(ts)/reps*1e3:.2f} ms", flush=True)

def jitter(c, x):
    return x + c.reshape(-1)[0].astype(x.dtype) * jnp.asarray(1e-9, x.dtype)

for tag, L, F, cap in [("F4L8", 8, 4, 1 << 17), ("F2L16", 16, 2, 1 << 18)]:
    if tag not in (sys.argv[1:] or ["F4L8"]):
        continue
    spec = HashGridSpec(n_levels=L, n_features_per_level=F,
                        log2_hashmap_size=19, max_level_size=cap)
    print(f"{tag}: {spec.n_entries} entries, sizes {spec.level_sizes}",
          flush=True)
    table = jax.random.normal(key, (spec.n_entries, F), jnp.float32) * 0.1
    pos = jax.random.uniform(key, (N, 3), jnp.float32)

    def fwd(c, table, pos):
        return H.hash_encode_nbr(spec, table, jitter(c, pos))[:1]
    chained(f"{tag} fwd", fwd, jnp.zeros((1, F * L), jnp.float32),
            (table, pos))

    def bwd(c, table, pos):
        g = jax.grad(lambda t: jnp.mean(
            H.hash_encode_nbr(spec, t, jitter(c, pos)) ** 2))(table)
        return g[:1]
    chained(f"{tag} fwd+bwd", bwd, jnp.zeros((1, F), jnp.float32),
            (table, pos))
