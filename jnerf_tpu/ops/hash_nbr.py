"""Neighborhood-row hash encoding — the round-2 TPU fast path.

Same linear-hash semantics as `hash_grid_rows` (per-level linear hashes,
reference-exact dense levels; `HashEncode.h:36-396` is the behavioral
target), rebuilt around the measured hardware envelope
(tools/probe_final.py, chained on the bench v5e):

- XLA row gather: 4.3 ns/row, WIDTH-INDEPENDENT  -> gather narrow rows
- XLA scatter-add: 15-16 ns/row                  -> don't use it
- Pallas VMEM RMW scatter loop: 10.3 ns/row      -> backward kernel
- TPU tiles are (8, 128) over the LAST TWO dims  -> no small-minor arrays:
  every bulk op here runs on 1-D flats or [*, >=16]-minor shapes
  (a [N, L, 8, 2] blend array pads 64x and alone cost ~60 ms/step in the
  first cut of this module).

Forward: ONE gather per (sample, level) from a [n_entries, 16] bf16
"neighborhood table" (entry e's full 2x2x2 corner features in one narrow
row, lane c*2+f = master[(e + off_{l,c}) % E_l, f]).  Unlike the 128-lane
packed rows of hash_grid_rows (8 bases/row), no base-slot selection is
needed and the blend touches [N*L, 16] arrays — 8x less traffic, which was
the dominant cost there.

Backward: a fused Pallas kernel, grid (level, sample-block):
- vector phase: the [BLK, 128] scatter values are built directly from
  lane-index expressions (corner bits select fractional factors, lane&1
  selects the grad feature, lane>>4 one-hots the entry slot) — ~17 vreg ops
  per block, no HBM intermediates;
- scalar phase: a read-modify-write row loop into a VMEM-resident fp32
  accumulator [E_l/8, 128] (8 entries per row, slot-major lanes, so a plain
  reshape recovers [E_l, 16]).  Deterministic (sequential adds), fp32
  accumulation (ADVICE r1: bf16 accumulation drops small contributions).
Then a roll-based unpack onto the master [n_entries, 2] layout — the
adjoint of the table build, pure 1-D streaming.

The master table layout is shared with hash_grid/hash_grid_rows; the index
mapping matches hash_grid_rows exactly (same `level_multipliers`), so the
two paths are interchangeable on the same checkpoint.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .hash_grid import HashGridSpec
from .hash_grid_rows import (
    GATHER_DTYPE,
    _corner_offsets,
    level_multipliers,
)


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _roll1d(x, shift: int):
    """jnp.roll with the zero-shift case elided (a roll-by-0 emits a
    zero-length slice+concat that trips jax 0.9's lowering cache)."""
    return jnp.roll(x, shift) if shift % x.shape[0] else x


# ------------------------------------------------------------------ build
def build_nbr_table(spec: HashGridSpec, table: jnp.ndarray) -> jnp.ndarray:
    """Master [n_entries, 2] -> neighborhood [n_entries, 16].

    Row e of level l holds base e's 8 corner entries, lane c*2+f =
    master[(e + off_{l,c}) % E_l, f].  All rolls run on 1-D feature-
    interleaved flats (a [E, 2] roll would tile-pad 64x).  Differentiable.
    """
    corner_offs = _corner_offsets(spec)
    flat = table.reshape(-1)  # [2 * n_entries] feature-interleaved
    parts = []
    for lvl in range(spec.n_levels):
        o, sz = spec.level_offsets[lvl], spec.level_sizes[lvl]
        lf = jax.lax.dynamic_slice_in_dim(flat, 2 * o, 2 * sz, 0)  # [2E]
        rolled = [
            _roll1d(lf, -2 * int(corner_offs[lvl, c])).reshape(sz, 2)
            for c in range(8)
        ]
        parts.append(jnp.concatenate(rolled, axis=1))  # [E, 16]
    return jnp.concatenate(parts, axis=0)


def unpack_nbr_grad(spec: HashGridSpec, nbr_grad: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of build_nbr_table: [n_entries, 16] f32 -> [n_entries, 2]."""
    corner_offs = _corner_offsets(spec)
    parts = []
    for lvl in range(spec.n_levels):
        o, sz = spec.level_offsets[lvl], spec.level_sizes[lvl]
        slab = jax.lax.dynamic_slice_in_dim(nbr_grad, o, sz, 0)  # [E, 16]
        acc = 0.0
        for c in range(8):
            pair = slab[:, 2 * c : 2 * c + 2].reshape(2 * sz)  # 1-D flat
            acc = acc + _roll1d(pair, 2 * int(corner_offs[lvl, c]))
        parts.append(acc.reshape(sz, 2))
    return jnp.concatenate(parts, axis=0)


# ------------------------------------------------------------------ forward
def _entry_indices(spec: HashGridSpec, pos):
    """[N, L] global entry index e0 and [N, L] x/y/z fractionals.

    All intermediates are [N, L]-shaped (minor dim L, no tile padding) —
    never [*, 8]-minor, which pads 16x on TPU.
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
    return e0.astype(jnp.int32), fr


def _weights_16(spec: HashGridSpec, pos):
    """Per (sample, level): global entry index and 16 duplicated corner
    weights (lane c*2+f gets w_c).  Shapes: [N*L] int32, [N*L, 16] f32."""
    n = pos.shape[0]
    L = spec.n_levels
    e0, fr = _entry_indices(spec, pos)
    offs = jnp.asarray(spec.level_offsets[:-1], jnp.int32)
    idx = (offs[None, :] + e0).reshape(-1)
    cols = []
    for c in range(8):
        wx = fr[0] if c & 1 else 1.0 - fr[0]
        wy = fr[1] if (c >> 1) & 1 else 1.0 - fr[1]
        wz = fr[2] if (c >> 2) & 1 else 1.0 - fr[2]
        wc = wx * wy * wz  # [N, L]
        cols += [wc, wc]
    wrep = jnp.stack(cols, axis=-1).reshape(n * L, 16)  # [N, L, 16] -> flat
    return idx, wrep


import functools


@functools.lru_cache(maxsize=8)
def _assembly_matrix(L: int):
    """[L*16, 2L] 0/1 matrix: one MXU matmul turns weighted neighborhood
    lanes [N, L*16] into the feature-major output [N, 2L] (sums each
    level's 8 corners per feature AND lays out [f0 levels..., f1 levels...]
    in one op — no small-minor reductions, no concat)."""
    m = np.zeros((L * 16, 2 * L), np.float32)
    for lvl in range(L):
        for c in range(8):
            for f in range(2):
                m[lvl * 16 + c * 2 + f, f * L + lvl] = 1.0
    return jnp.asarray(m)


def _encode_from_nbr(spec: HashGridSpec, nbr: jnp.ndarray, pos: jnp.ndarray):
    """Gather + blend against a prebuilt neighborhood table."""
    n = pos.shape[0]
    L = spec.n_levels
    idx, wrep = _weights_16(spec, pos)
    rows = jnp.take(nbr, idx, axis=0)  # [N*L, 16]
    weighted = (rows.astype(jnp.float32) * wrep).reshape(n, L * 16)
    return jnp.dot(weighted, _assembly_matrix(L),
                   preferred_element_type=jnp.float32)  # [N, 2L]


# ----------------------------------------------------------------- backward
def _sample_blk(n: int) -> int:
    blk = 8192
    while n % blk:
        blk //= 2
    return blk


def _bwd_kernel(scale_ref, rows_ref, slot_ref, pos_ref, g_ref, out_ref,
                vals_ref):
    """One (level, sample-block) cell: build [BLK,128] values, RMW-scatter.

    Accumulator row r holds entries 8r..8r+7; lane = slot*16 + c*2 + f.
    """
    import jax.lax as lax
    from jax.experimental import pallas as pl

    blk = vals_ref.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    scale = scale_ref[0, 0]

    def fract(p):
        q = p * scale + 0.5
        return q - jnp.floor(q)

    fx = fract(pos_ref[0, :])[:, None]  # [BLK, 1]
    fy = fract(pos_ref[1, :])[:, None]
    fz = fract(pos_ref[2, :])[:, None]
    g0 = g_ref[0, 0, :][:, None]
    g1 = g_ref[0, 1, :][:, None]
    slot = slot_ref[0, :][:, None]  # [BLK, 1] int32

    lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    X = jnp.where((lane >> 1) & 1 == 1, fx, 1.0 - fx)  # corner x-bit
    Y = jnp.where((lane >> 2) & 1 == 1, fy, 1.0 - fy)
    Z = jnp.where((lane >> 3) & 1 == 1, fz, 1.0 - fz)
    G = jnp.where(lane & 1 == 1, g1, g0)
    S = ((lane >> 4) == slot).astype(jnp.float32)
    vals_ref[:] = X * Y * Z * G * S

    unroll = 8

    def body(j, _):
        base = j * unroll
        for u in range(unroll):
            r = rows_ref[0, base + u]
            out_ref[0, pl.ds(r, 1), :] += vals_ref[pl.ds(base + u, 1), :]
        return 0

    lax.fori_loop(0, blk // unroll, body, 0, unroll=1)


def _grad_table_pallas(spec: HashGridSpec, pos, g, interpret: bool):
    """[N,3] pos + [N,2L] upstream grad -> master-table grad [n_entries,2]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pos.shape[0]
    L = spec.n_levels
    blk = _sample_blk(n)
    rows_max = max(spec.level_sizes) // 8

    e0, _ = _entry_indices(spec, pos)  # weights recomputed in-kernel
    rows = (e0 >> 3).T.astype(jnp.int32)  # [L, N] level-local row
    slots = (e0 & 7).T.astype(jnp.int32)  # [L, N]
    pos_t = pos.T  # [3, N]
    # [N, 2L] feature-major -> [L, 2, N]
    g_t = g.T.reshape(2, L, n).transpose(1, 0, 2)
    scales = jnp.asarray(spec.scales, jnp.float32).reshape(L, 1)

    acc = pl.pallas_call(
        _bwd_kernel,
        grid=(L, n // blk),
        in_specs=[
            pl.BlockSpec((1, 1), lambda l, i: (l, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk), lambda l, i: (l, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk), lambda l, i: (l, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, blk), lambda l, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, blk), lambda l, i: (l, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_max, 128), lambda l, i: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, rows_max, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((blk, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(scales, rows, slots, pos_t, g_t)

    # [L, rows_max, 128] -> per-level [E, 16] slabs -> master layout.
    slabs = [
        acc[lvl, : spec.level_sizes[lvl] // 8].reshape(
            spec.level_sizes[lvl], 16
        )
        for lvl in range(L)
    ]
    return unpack_nbr_grad(spec, jnp.concatenate(slabs, axis=0))


# ------------------------------------------------------------------- public
@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _encode_nbr_core(spec, table, pos):
    nbr = build_nbr_table(spec, table.astype(GATHER_DTYPE))
    return _encode_from_nbr(spec, nbr, pos)


def _encode_nbr_fwd(spec, table, pos):
    return _encode_nbr_core(spec, table, pos), pos


def _encode_nbr_bwd(spec, pos, g):
    return _grad_table_pallas(spec, pos, g, interpret=_is_cpu()), None


_encode_nbr_core.defvjp(_encode_nbr_fwd, _encode_nbr_bwd)


def hash_encode_nbr(spec: HashGridSpec, table: jnp.ndarray, pos: jnp.ndarray,
                    compute_dtype=None, nbr=None):
    """[N, 3] -> [N, 2L] feature-major; same semantics as hash_encode_rows.

    Differentiable in ``table`` (Pallas fused backward).  Pass a prebuilt
    ``nbr`` table (build_nbr_table) for no-grad density sweeps to share the
    build across chunks.
    """
    pos = jax.lax.stop_gradient(pos)
    if nbr is not None:
        out = _encode_from_nbr(spec, nbr, pos)
    else:
        out = _encode_nbr_core(spec, table, pos)
    if compute_dtype is not None:
        out = out.astype(compute_dtype)
    return out
