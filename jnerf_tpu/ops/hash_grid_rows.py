"""Row-gather hash-grid encoding — the TPU-fast path.

Motivation (measured on the bench TPU, tools/probe_tpu2.py): XLA random
access runs at ~0.1G ops/s whether gathering single elements or whole
128-lane rows.  The generic path (`jnerf_tpu.ops.hash_grid`) needs
8 corners x L levels element-gathers per sample (33.5M/step at NGP scale =
~300ms); this path needs ONE 128-lane row-gather per (sample, level)
(4.2M/step) — a 64x reduction in random accesses — by restructuring the
table:

- every entry's full 2x2x2 corner neighborhood (8 corners x 2 features)
  is precomputed into a "packed" table; 8 consecutive base entries share a
  [128]-lane row;
- the packing is built per step from the master table with ``jnp.roll``
  (bandwidth-bound, ~5ms) — possible because this path replaces the
  reference's XOR hash (`HashEncode.h:69-73`) with per-level LINEAR hashes
  ``(x*A + y*B + z*C) mod size``: a corner step (+1 in x/y/z) is then a
  constant additive offset, i.e. a roll of the table.  Dense levels already
  index linearly (`grid_index`'s stride accumulation) so they are exact
  reference semantics; hashed levels trade the XOR hash's collision pattern
  for a per-level-randomized lattice pattern (quality validated e2e);
- the trilinear blend happens in-register on the gathered rows (lane
  masking + reductions, fused by XLA into the gather consumer);
- the backward is autodiff: a row scatter-add into the packed table, then
  rolls back onto the master — all at row rate.

The master table layout ([n_entries, 2], same level offsets) is shared with
the generic path — but the INDEX MAPPING is not: hashed levels here use
per-level linear hashes instead of the reference XOR hash, so a table
trained under one indexing mode reads scrambled at hashed levels under the
other.  Checkpoints are only interchangeable between paths at dense levels;
reference-checkpoint interop requires ``hash_indexing='xor'``
(see utils/convert_ckpt.hash_table_from_reference).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hash_grid import HashGridSpec


def level_multipliers(spec: HashGridSpec) -> Tuple[Tuple[int, int, int], ...]:
    """(A, B, C) per level: dense strides for dense levels, randomized odd
    constants for hashed levels (decorrelated across levels)."""
    rng = np.random.default_rng(0x5F3759DF)
    out = []
    for lvl in range(spec.n_levels):
        res = spec.resolutions[lvl]
        size = spec.level_sizes[lvl]
        if res ** 3 <= size:
            out.append((1, res, res * res))
        else:
            a = int(rng.integers(1 << 16, 1 << 30)) | 1
            b = int(rng.integers(1 << 16, 1 << 30)) | 1
            c = int(rng.integers(1 << 16, 1 << 30)) | 1
            out.append((a, b, c))
    return tuple(out)


def _corner_offsets(spec: HashGridSpec):
    """[L, 8] additive index offset of each corner, mod the level size."""
    mults = level_multipliers(spec)
    offs = np.zeros((spec.n_levels, 8), np.int64)
    for lvl, (a, b, c) in enumerate(mults):
        size = spec.level_sizes[lvl]
        for corner in range(8):
            dx, dy, dz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
            offs[lvl, corner] = (dx * a + dy * b + dz * c) % size
    return offs


def packed_row_offsets(spec: HashGridSpec):
    """Row offset of each level in the packed [total/8, 128] table."""
    offs = [0]
    for sz in spec.level_sizes:
        offs.append(offs[-1] + sz // 8)
    return tuple(offs)


def build_packed_table(spec: HashGridSpec, table: jnp.ndarray) -> jnp.ndarray:
    """Master [n_entries, 2] -> packed [n_entries/8, 128].

    Row r of level l holds base entries 8r..8r+7 with CORNER-MAJOR lanes:
    lane = corner*16 + base_within_row*2 + feature.  Differentiable.

    Implementation note: all rolls happen on flat 1-D feature-interleaved
    views — a [size, 2] array would tile-pad its 2-lane minor dim 64x
    (docs/DESIGN.md), which both bloats HBM and crawls.
    """
    corner_offs = _corner_offsets(spec)
    flat = table.reshape(-1)  # feature-interleaved [2 * n_entries]
    parts = []
    for lvl in range(spec.n_levels):
        o, sz = spec.level_offsets[lvl], spec.level_sizes[lvl]
        sl = jax.lax.dynamic_slice_in_dim(flat, 2 * o, 2 * sz, 0)  # [2sz]
        # Corner c's row block: entries shifted by its additive offset.
        rolled = [
            jnp.roll(sl, -2 * int(corner_offs[lvl, c])).reshape(sz // 8, 16)
            for c in range(8)
        ]
        parts.append(jnp.concatenate(rolled, axis=1))  # [sz/8, 128]
    return jnp.concatenate(parts, axis=0)


def base_indices_weights(spec: HashGridSpec, pos: jnp.ndarray):
    """Per (sample, level): base entry index and trilinear corner weights.

    pos: [N, 3] in [0, 1].  Returns (e0 [N, L] int32 level-local,
    weights [N, L, 8] f32).
    """
    mults = level_multipliers(spec)
    A = jnp.asarray([m[0] for m in mults], jnp.uint32)
    B = jnp.asarray([m[1] for m in mults], jnp.uint32)
    C = jnp.asarray([m[2] for m in mults], jnp.uint32)
    sizes = jnp.asarray(spec.level_sizes, jnp.uint32)
    scales = jnp.asarray(spec.scales, jnp.float32)

    g0, fr = [], []
    for d in range(3):
        p = pos[:, d, None] * scales[None, :] + 0.5  # [N, L]
        g = jnp.floor(p)
        fr.append(p - g)
        g0.append(g.astype(jnp.uint32))
    e0 = (g0[0] * A[None] + g0[1] * B[None] + g0[2] * C[None]) % sizes[None]

    # corner-major weights: corner bits (dx, dy, dz) = (c&1, c>>1&1, c>>2&1)
    w = []
    for c in range(8):
        dx, dy, dz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        w.append(
            (fr[0] if dx else 1 - fr[0])
            * (fr[1] if dy else 1 - fr[1])
            * (fr[2] if dz else 1 - fr[2])
        )
    return e0.astype(jnp.int32), jnp.stack(w, axis=-1)


def _lane_factors(spec: HashGridSpec, pos):
    """Shared fwd/bwd index math: per-(sample,level) packed row index and
    the [N*L, 128] per-lane selection-x-weight factor.  Pure VPU math —
    recomputed in the backward instead of saving multi-GB residuals."""
    n = pos.shape[0]
    L = spec.n_levels
    row_offs = jnp.asarray(packed_row_offsets(spec)[:-1], jnp.int32)
    e0, w = base_indices_weights(spec, pos)  # [N, L], [N, L, 8]
    rows_idx = (row_offs[None, :] + (e0 >> 3)).reshape(-1)  # [N*L]
    sub = (e0 & 7).reshape(-1)  # [N*L]

    lane = jnp.arange(128, dtype=jnp.int32)
    b_of_lane = (lane >> 1) & 7
    c_of_lane = lane >> 4
    sel = (b_of_lane[None, :] == sub[:, None]).astype(jnp.float32)
    w_lane = jnp.take(w.reshape(n * L, 8), c_of_lane, axis=1)  # [N*L, 128]
    return rows_idx, sel * w_lane


def _reduce_features(spec: HashGridSpec, weighted, n):
    """[N*L, 128] weighted lanes -> [N, 2L] feature-major output."""
    L = spec.n_levels
    feat0 = weighted[:, 0::2].sum(axis=1)
    feat1 = weighted[:, 1::2].sum(axis=1)
    f = jnp.stack([feat0, feat1], axis=-1).reshape(n, L, 2)
    return jnp.concatenate([f[..., 0], f[..., 1]], axis=-1)


def unpack_packed_grad(spec: HashGridSpec, packed_grad):
    """Adjoint of build_packed_table: [rows, 128] -> [n_entries, 2]."""
    corner_offs = _corner_offsets(spec)
    row_offs = packed_row_offsets(spec)
    parts = []
    for lvl in range(spec.n_levels):
        sz = spec.level_sizes[lvl]
        pg = packed_grad[row_offs[lvl] : row_offs[lvl + 1]]  # [sz/8, 128]
        acc = 0.0
        for c in range(8):
            block = pg[:, c * 16 : (c + 1) * 16].reshape(2 * sz)
            acc = acc + jnp.roll(block, 2 * int(corner_offs[lvl, c]))
        parts.append(acc)
    return jnp.concatenate(parts).reshape(-1, 2)


from functools import partial


# Gather/scatter the packed table in bf16: random access is row-count-bound
# but the 2 GB/step of gathered bytes still rides HBM; halving it is free
# precision-wise (the reference's table/grads are fp16).
GATHER_DTYPE = jnp.bfloat16


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _encode_rows_core(spec, table, pos):
    packed = build_packed_table(spec, table.astype(GATHER_DTYPE))
    rows_idx, factor = _lane_factors(spec, pos)
    rows = jnp.take(packed, rows_idx, axis=0).astype(jnp.float32)  # [N*L,128]
    return _reduce_features(spec, rows * factor, pos.shape[0])


def _encode_rows_fwd(spec, table, pos):
    return _encode_rows_core(spec, table, pos), pos


def _encode_rows_bwd(spec, res, g):
    pos = res
    n = pos.shape[0]
    L = spec.n_levels
    rows_idx, factor = _lane_factors(spec, pos)
    # g is [N, 2L] feature-major; lane f of every (c, b) block takes
    # g[:, l + f*L].
    g_pair = jnp.stack([g[:, :L], g[:, L:]], axis=-1).reshape(n * L, 2)
    lane_f = (jnp.arange(128, dtype=jnp.int32) & 1)
    g_lane = jnp.take(g_pair, lane_f, axis=1)  # [N*L, 128]
    # Accumulate in fp32: XLA row scatter-add is random-access-count-bound,
    # so fp32 costs the same as bf16 (tools/probe_final.py) — and bf16's
    # 8-bit mantissa drops small contributions once a hot row's sum grows
    # (the reference accumulates fp16 WITH a 128x loss scale,
    # `fully_fused_mlp.py`; fp32 needs no scale).  bf16 stays for the
    # forward gather (GATHER_DTYPE), where it only quantizes table reads.
    vals = factor * g_lane
    n_rows = packed_row_offsets(spec)[-1]
    packed_grad = jnp.zeros((n_rows, 128), jnp.float32).at[rows_idx].add(vals)
    return unpack_packed_grad(spec, packed_grad), None


_encode_rows_core.defvjp(_encode_rows_fwd, _encode_rows_bwd)


def hash_encode_rows(spec: HashGridSpec, table: jnp.ndarray, pos: jnp.ndarray,
                     compute_dtype=None, packed=None):
    """[N, 3] -> [N, 2L] feature-major; one row-gather per (sample, level).

    Differentiable in ``table`` via a hand-written VJP that recomputes the
    index math and issues a single row scatter-add (no multi-GB residual
    buffers).  When ``packed`` is supplied (no-grad density sweeps) the
    gather runs against it directly.
    """
    pos = jax.lax.stop_gradient(pos)
    if packed is not None:
        rows_idx, factor = _lane_factors(spec, pos)
        rows = jnp.take(packed, rows_idx, axis=0)
        out = _reduce_features(spec, rows * factor, pos.shape[0])
    else:
        out = _encode_rows_core(spec, table, pos)
    if compute_dtype is not None:
        out = out.astype(compute_dtype)
    return out
