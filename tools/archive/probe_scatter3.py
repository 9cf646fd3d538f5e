"""Does XLA scatter-add have a small-operand fast path like gather?
Per-level scatter into [E,16] f32/[E,16] bf16 accumulators at NGP scale,
16 levels chained in one jit; plus a half-size f32 variant."""

import sys
import time
import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
N = 1 << 18
L = 16


def chained_levels(name, E, dtype, reps=2):
    idxs = [jax.random.randint(jax.random.PRNGKey(i), (N,), 0, E, jnp.int32)
            for i in range(L)]
    vals = jax.random.normal(key, (N, 16), jnp.float32).astype(dtype)

    @jax.jit
    def run(c, vals, *idxs):
        def f(c, _):
            acc = 0.0
            for l in range(L):
                i = (idxs[l] + c.astype(jnp.int32)) % E
                t = jnp.zeros((E, 16), dtype).at[i].add(vals)
                acc = acc + t[0, 0].astype(jnp.float32)
            return c + acc * 1e-20, None

        out, _ = jax.lax.scan(f, c, None, length=reps)
        return out

    _ = float(run(jnp.float32(0), vals, *idxs))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(jnp.float32(0), vals, *idxs))
        ts.append(time.perf_counter() - t0)
    t = min(ts) / reps
    print(f"{name}: {t*1e3:.1f} ms ({t/(N*L)*1e9:.2f} ns/row)", flush=True)


which = sys.argv[1:] or ["f32", "bf16", "f32half"]
if "f32" in which:
    chained_levels("16x scatter [262K]->[262K,16] f32 (16MB)", 1 << 18,
                   jnp.float32)
if "bf16" in which:
    chained_levels("16x scatter [262K]->[262K,16] bf16 (8MB)", 1 << 18,
                   jnp.bfloat16)
if "f32half" in which:
    chained_levels("16x scatter [262K]->[128K,16] f32 (8MB)", 1 << 17,
                   jnp.float32)
