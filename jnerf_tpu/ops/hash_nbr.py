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
def build_nbr_table(spec: HashGridSpec, table: jnp.ndarray):
    """Master [n_entries, F] -> tuple of per-level neighborhood tables.

    Level l's table is [E_l, 8F]: row e holds base e's 8 corner entries,
    lane c*F+f = master[(e + off_{l,c}) % E_l, f].  All rolls run on 1-D
    feature-interleaved flats (a [E, F] roll would tile-pad 64x).
    Returned as SEPARATE arrays, not one concat: XLA gathers from a <=8 MB
    operand at 3.5 ns/row vs 12.4 above ~14 MB, and a gather whose operand
    is a slice-of-big-buffer fuses to the slow path.  Differentiable.
    """
    F = spec.n_features_per_level
    corner_offs = _corner_offsets(spec)
    flat = table.reshape(-1)  # [F * n_entries] feature-interleaved
    parts = []
    for lvl in range(spec.n_levels):
        o, sz = spec.level_offsets[lvl], spec.level_sizes[lvl]
        lf = jax.lax.dynamic_slice_in_dim(flat, F * o, F * sz, 0)  # [F*E]
        rolled = [
            _roll1d(lf, -F * int(corner_offs[lvl, c])).reshape(sz, F)
            for c in range(8)
        ]
        parts.append(jnp.concatenate(rolled, axis=1))  # [E, 8F]
    return tuple(parts)


def unpack_nbr_grad(spec: HashGridSpec, nbr_grad: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of build_nbr_table: [n_entries, 8F] f32 -> [n_entries, F]."""
    F = spec.n_features_per_level
    corner_offs = _corner_offsets(spec)
    parts = []
    for lvl in range(spec.n_levels):
        o, sz = spec.level_offsets[lvl], spec.level_sizes[lvl]
        slab = jax.lax.dynamic_slice_in_dim(nbr_grad, o, sz, 0)  # [E, 8F]
        acc = 0.0
        for c in range(8):
            pair = slab[:, F * c : F * c + F].reshape(F * sz)  # 1-D flat
            acc = acc + _roll1d(pair, F * int(corner_offs[lvl, c]))
        parts.append(acc.reshape(sz, F))
    return jnp.concatenate(parts, axis=0)


# ------------------------------------------------------------------ forward
def _entry_indices(spec: HashGridSpec, pos):
    """[N, L] level-local entry index e0 and [N, L] x/y/z fractionals.

    All intermediates are [N, L]-shaped (minor dim L, no tile padding) —
    never [*, 8]-minor, which pads 16x on TPU.  When every hashed level's
    size is a power of two (the TPU fast-cap default) the `% size` becomes
    a bitwise AND: dense levels never overflow their size (x + y*res +
    z*res^2 < res^3 <= size), so they mask with all-ones.
    """
    mults = level_multipliers(spec)
    A = jnp.asarray([m[0] for m in mults], jnp.uint32)
    B = jnp.asarray([m[1] for m in mults], jnp.uint32)
    C = jnp.asarray([m[2] for m in mults], jnp.uint32)
    scales = jnp.asarray(spec.scales, jnp.float32)

    g0, fr = [], []
    for d in range(3):
        p = pos[:, d, None] * scales[None, :] + 0.5  # [N, L]
        g = jnp.floor(p)
        fr.append(p - g)
        g0.append(g.astype(jnp.uint32))
    raw = g0[0] * A[None] + g0[1] * B[None] + g0[2] * C[None]
    masks = []
    use_and = True
    for lvl in range(spec.n_levels):
        sz = spec.level_sizes[lvl]
        if spec.resolutions[lvl] ** 3 <= sz:
            masks.append(0xFFFFFFFF)  # dense: raw < size already
        elif sz & (sz - 1) == 0:
            masks.append(sz - 1)
        else:
            use_and = False
            break
    if use_and:
        e0 = raw & jnp.asarray(masks, jnp.uint32)[None]
    else:
        e0 = raw % jnp.asarray(spec.level_sizes, jnp.uint32)[None]
    return e0.astype(jnp.int32), fr


def _level_mask(spec: HashGridSpec, lvl: int):
    """AND-mask for level lvl's `% size`, or None if a real mod is needed.

    Dense levels never overflow (x + y*res + z*res^2 < res^3 <= size);
    pow2 hashed levels mask with size-1.
    """
    sz = spec.level_sizes[lvl]
    if spec.resolutions[lvl] ** 3 <= sz:
        return 0xFFFFFFFF
    if sz & (sz - 1) == 0:
        return sz - 1
    return None


def _entry_indices_T(spec: HashGridSpec, pos):
    """[L, N] level-local entry indices, built per level and stacked —
    never materializes [N, L] + transpose (an XLA transpose at NGP scale
    costs ~110 ms, tools/probe_step_parts.py)."""
    mults = level_multipliers(spec)
    out = []
    for lvl in range(spec.n_levels):
        A, B, C = (jnp.uint32(m) for m in mults[lvl])
        scale = jnp.float32(spec.scales[lvl])
        g = [
            jnp.floor(pos[:, d] * scale + 0.5).astype(jnp.uint32)
            for d in range(3)
        ]
        raw = g[0] * A + g[1] * B + g[2] * C
        mask = _level_mask(spec, lvl)
        if mask is None:
            e0 = raw % jnp.uint32(spec.level_sizes[lvl])
        else:
            e0 = raw & jnp.uint32(mask)
        out.append(e0.astype(jnp.int32))
    return jnp.stack(out, axis=0)


def _corner_bits(F: int):
    """Corner bit patterns for the 8F neighborhood lanes (lane = c*F + f):
    (bx, by, bz) [8F] f32 host constants."""
    c = np.arange(8 * F) // F
    return tuple(((c >> d) & 1).astype(np.float32) for d in range(3))


import functools


@functools.lru_cache(maxsize=8)
def _assembly_matrix(L: int, F: int) -> np.ndarray:
    """[L*8F, F*L] 0/1 matrix: one MXU matmul turns weighted neighborhood
    lanes [N, L*8F] into the feature-major output [N, F*L] (sums each
    level's 8 corners per feature AND lays out [f0 levels..., f1 ...]
    in one op — no small-minor reductions, no concat).

    Returns host numpy (NOT jnp): a cached jnp array created inside a trace
    would leak that trace's tracer into every later caller."""
    W = 8 * F
    m = np.zeros((L * W, F * L), np.float32)
    for lvl in range(L):
        for c in range(8):
            for f in range(F):
                m[lvl * W + c * F + f, f * L + lvl] = 1.0
    return m


# XLA's gather strategy has a measured cliff (tools/probe_gather.py,
# bench v5e): operand tables <= ~8 MB gather at 3.4 ns/row, bigger tables
# at 12.4 ns/row regardless of the footprint the indices actually touch.
# Gathering per level (and, for levels past the cliff, from sub-table
# splits + select) keeps every gather operand on the fast side.
_FAST_GATHER_BYTES = 8 << 20  # measured cliff is ~14 MB; leave margin
# Sub-table count past which one slow-rate direct gather beats the
# split-and-select chain (see _take_split docstring).  3.5 ns/row fast
# rate x n_sub passes + select traffic vs 12.4 ns/row once -> crossover
# is between 3 and 4; set from the cap19 probe measurement.
_DIRECT_GATHER_SUBS = 4


def fast_gather_rows(row_bytes: int) -> int:
    """Largest row count whose table stays on the fast-gather side."""
    return max(1, _FAST_GATHER_BYTES // max(row_bytes, 1))


def _take_split(tbl: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather where the operand is split into <=8 MB sub-tables.

    Past ~4 sub-tables the split loses: each sub-gather walks ALL N
    indices, so the split does n_sub full-rate gathers plus (n_sub-1)
    full-width selects, while one direct gather from the big operand
    pays the slow per-row rate once (12.4 vs 3.5 ns/row, probe_gather).
    Crossover measured on the cap19 tables (tools/probe_cap19_parts.py,
    round 5): 64 MB operand split8 vs direct.  Direct wins past
    _DIRECT_GATHER_SUBS sub-tables."""
    sz = tbl.shape[0]
    limit = fast_gather_rows(tbl.shape[1] * tbl.dtype.itemsize)
    if sz <= limit:
        return jnp.take(tbl, idx, axis=0)
    n_sub = -(-sz // limit)
    if n_sub >= _DIRECT_GATHER_SUBS:
        return jnp.take(tbl, idx, axis=0)
    out = None
    for s in range(n_sub):
        lo = s * limit
        sub = tbl[lo : min(lo + limit, sz)]
        part = jnp.take(sub, jnp.clip(idx - lo, 0, sub.shape[0] - 1), axis=0)
        if out is None:
            out = part
        else:
            out = jnp.where((idx >= lo)[:, None], part, out)
    return out


def _encode_from_nbr(spec: HashGridSpec, nbr: jnp.ndarray, pos: jnp.ndarray):
    """Per-level gather + blend against a prebuilt neighborhood table.

    Everything is computed per level from the three pos columns — no
    [N, L] index/fractional tensors (their per-level column extracts are
    transpose-class ops, ~tens of ms at NGP scale).  Weights are built
    arithmetically per lane (X = (1-fx) + bx*(2fx-1)) so XLA fuses them
    into the gather consumer.
    """
    L = spec.n_levels
    F = spec.n_features_per_level
    mults = level_multipliers(spec)
    bx, by, bz = (jnp.asarray(b)[None, :] for b in _corner_bits(F))  # [1,8F]
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]  # hoisted [N] columns
    parts = []
    for lvl in range(L):
        sz = spec.level_sizes[lvl]
        scale = jnp.float32(spec.scales[lvl])
        A, B, C = (jnp.uint32(m) for m in mults[lvl])
        g, fr = [], []
        for p in (px, py, pz):
            q = p * scale + 0.5
            gq = jnp.floor(q)
            fr.append((q - gq)[:, None])  # [N, 1]
            g.append(gq.astype(jnp.uint32))
        raw = g[0] * A + g[1] * B + g[2] * C
        mask = _level_mask(spec, lvl)
        e0 = (raw & jnp.uint32(mask) if mask is not None
              else raw % jnp.uint32(sz)).astype(jnp.int32)
        rows = _take_split(nbr[lvl], e0)  # [N, 8F]
        w = (
            ((1.0 - fr[0]) + bx * (2.0 * fr[0] - 1.0))
            * ((1.0 - fr[1]) + by * (2.0 * fr[1] - 1.0))
            * ((1.0 - fr[2]) + bz * (2.0 * fr[2] - 1.0))
        )  # [N, 8F]
        # f32 product, bf16 store: halves concat+matmul traffic; the MXU
        # accumulates the corner sum in f32 (preferred_element_type).
        parts.append((rows.astype(jnp.float32) * w).astype(GATHER_DTYPE))
    weighted = jnp.concatenate(parts, axis=1)  # [N, 8F*L] bf16
    return jnp.dot(
        weighted,
        jnp.asarray(_assembly_matrix(L, F)).astype(GATHER_DTYPE),
        preferred_element_type=jnp.float32,
    )  # [N, F*L]


# ----------------------------------------------------------------- backward
def _sample_blk(n: int) -> int:
    blk = 8192
    while n % blk:
        blk //= 2
    return blk


# Scatter-loop strategy. Run-combining (accumulate equal-row runs in a
# static-address scratch, flush on change) MEASURED 2.6x SLOWER than the
# plain per-sample RMW loop on the bench chip (~26 vs ~10 ns/row, round 3):
# the two predicated regions per sample and the serial dependence through
# prev/acc cost more than the dynamic-addressed RMWs they save.  Kept
# behind this flag for measurement; default is the plain loop.
RUN_COMBINE = False


def _compute_vals(scale, pos_ref, g_ref, slot, lvl, F: int, L: int):
    """[BLK, 128] scatter values for (level, block): corner-weighted
    upstream grads, slot-one-hot across the P entry positions per row.
    Shared by the RMW and matmul backward kernels; see _make_bwd_kernel
    for the lane layout and the arithmetic-blend rationale."""
    return _vals_from_arrays(scale, pos_ref[:], g_ref[:], slot, lvl, F, L)


def _vals_from_arrays(scale, pos, gall, slot, lvl, F: int, L: int):
    """Array-based core of `_compute_vals`: pos [CH, 3], gall [CH, F*L],
    slot [CH, 1] -> [CH, 128] scatter values.  Factored out so the
    sharded kernel can build vals in row CHUNKS: the whole-block vals
    phase keeps ~12 live [8192, 128] f32 vectors, which Mosaic spills —
    50.25 MB of VMEM spill slots measured on the cap19 compile."""
    import jax.lax as lax

    log2f = F.bit_length() - 1
    log2w = (8 * F).bit_length() - 1

    def fract(p):
        q = p * scale + 0.5
        return q - jnp.floor(q)

    fx = fract(pos[:, 0:1])  # [CH, 1]
    fy = fract(pos[:, 1:2])
    fz = fract(pos[:, 2:3])
    fl = gall.shape[1]
    gl = lax.broadcasted_iota(jnp.int32, (1, fl), 1)

    lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    bx = ((lane >> log2f) & 1).astype(jnp.float32)
    by = ((lane >> (log2f + 1)) & 1).astype(jnp.float32)
    bz = ((lane >> (log2f + 2)) & 1).astype(jnp.float32)
    X = (1.0 - fx) + bx * (2.0 * fx - 1.0)
    Y = (1.0 - fy) + by * (2.0 * fy - 1.0)
    Z = (1.0 - fz) + bz * (2.0 * fz - 1.0)
    G = 0.0
    for f in range(F):
        gcol = jnp.sum(
            jnp.where(gl == lvl + f * L, gall, 0.0), axis=1,
            keepdims=True,
        )  # [BLK, 1]
        G = G + gcol * ((lane & (F - 1)) == f).astype(jnp.float32)
    S = ((lane >> log2w) == slot).astype(jnp.float32)
    return X * Y * Z * G * S


# Levels whose accumulator has at most this many rows scatter via a
# one-hot MXU matmul instead of the serial RMW loop: the loop is
# latency-bound at ~12.5 ns/row (tools/probe_rmw.py), so a level costs
# N_samples * 12.5 ns regardless of table size, while the matmul costs
# 2*N*rows*128*2 FLOPs (double-bf16) — cheaper below ~4k rows, ~5x
# cheaper at <=2k.  Coarse (dense) levels sit at the front of the level
# list with the smallest tables, so the split is a prefix.
MATMUL_ROWS_MAX = 2048


@functools.lru_cache(maxsize=16)
def _make_bwd_matmul_kernel(F: int, L: int, rows_blk: int, lvl_off: int = 0,
                            chunk: int = 512):
    """Kernel factory: one (small-level, sample-block) cell builds
    [BLK, 128] values and accumulates them into the level's [rows_blk,
    128] block with chunked one-hot matmuls on the MXU.

    The one-hot operand is exact in bf16; the values are split
    hi/lo-bf16 (double-bf16, ~2^-21 relative) so the f32-accumulated
    product stays well inside the grad tests' 5e-2 tolerance while both
    matmuls run at the MXU's bf16 rate.
    """
    import jax.lax as lax

    def kern(scale_ref, rows_ref, slot_ref, pos_ref, g_ref, out_ref,
             vals_ref):
        from jax.experimental import pallas as pl

        lvl = pl.program_id(0) + lvl_off

        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        scale = scale_ref[lvl, 0]
        slot = slot_ref[0, 0, :][:, None]  # [BLK, 1] int32
        vals_ref[:] = _compute_vals(scale, pos_ref, g_ref, slot, lvl, F, L)

        blk = vals_ref.shape[0]
        # Accumulate into the VMEM output block per chunk: a live
        # [rows_blk, 128] f32 accumulator across the unrolled chunk loop
        # is ~1 MB — far beyond the vector register file — and forces
        # mass spills.
        for c in range(blk // chunk):
            rv = rows_ref[0, 0, pl.ds(c * chunk, chunk)].reshape(1, chunk)
            oh = (
                lax.broadcasted_iota(jnp.int32, (rows_blk, chunk), 0) == rv
            ).astype(jnp.bfloat16)
            v = vals_ref[pl.ds(c * chunk, chunk), :]  # [chunk, 128] f32
            hi = v.astype(jnp.bfloat16)
            lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            out_ref[:] += (
                jnp.dot(oh, hi, preferred_element_type=jnp.float32)
                + jnp.dot(oh, lo, preferred_element_type=jnp.float32)
            )

    return kern


@functools.lru_cache(maxsize=16)
def _make_bwd_kernel(F: int, L: int, combine: bool = True, lvl_off: int = 0):
    """Kernel factory: one (level, sample-block) cell builds [BLK,128]
    values and RMW-scatters them.

    With P = 128 // (8F) entries per accumulator row, row r holds entries
    P*r..P*r+P-1; lane = slot*8F + c*F + f.  Two lowering pitfalls shape
    this kernel (tools/probe_bwd_var.py, tools/probe_step_parts.py):
    - the accumulator block must be 2-D [rows, 128];
    - inputs must arrive WITHOUT in-jit transposes — XLA transposes of
      [N, L]-shaped int/float arrays cost ~110 ms at NGP scale, 3x the
      kernel itself.  pos keeps its natural [N, 3] layout (block [blk, 3]);
      the upstream grad keeps [N, F*L] (block [blk, F*L]) and the kernel
      lane-selects its level's feature columns with an iota mask.

    The scatter loop is run-combined (round 3): samples are ray-ordered, so
    consecutive samples land in the same accumulator row whenever the ray
    stays in the same (or a row-sharing) cell — at level resolution res
    that's ~max_steps/res consecutive samples, i.e. almost always at coarse
    levels.  Runs accumulate into a statically-addressed VMEM scratch row
    (cheap) and flush to the dynamically-addressed accumulator only on row
    change (~10 ns, tools/probe_bwd_var.py), cutting dynamic RMWs several-x.
    """
    def kern(scale_ref, rows_ref, slot_ref, pos_ref, g_ref, out_ref,
             vals_ref, acc_ref, prev_ref):
        import jax.lax as lax
        from jax.experimental import pallas as pl

        lvl = pl.program_id(0) + lvl_off

        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        scale = scale_ref[lvl, 0]
        slot = slot_ref[0, 0, :][:, None]  # [BLK, 1] int32
        vals_ref[:] = _compute_vals(scale, pos_ref, g_ref, slot, lvl, F, L)

        blk = vals_ref.shape[0]
        unroll = 8
        if combine:
            # Run-combined scatter: accumulate the current run in acc_ref
            # (static address), flush to out_ref (dynamic address) on change.
            prev_ref[0] = rows_ref[0, 0, 0]
            acc_ref[0:1, :] = jnp.zeros_like(acc_ref[0:1, :])

            def body(j, _):
                base = j * unroll
                for u in range(unroll):
                    r = rows_ref[0, 0, base + u]
                    v = vals_ref[pl.ds(base + u, 1), :]
                    same = r == prev_ref[0]

                    @pl.when(same)
                    def _():
                        acc_ref[0:1, :] += v

                    @pl.when(jnp.logical_not(same))
                    def _():
                        out_ref[pl.ds(prev_ref[0], 1), :] += acc_ref[0:1, :]
                        acc_ref[0:1, :] = v
                        prev_ref[0] = r
                return 0

            lax.fori_loop(0, blk // unroll, body, 0, unroll=1)
            # Flush the block's trailing run (block boundaries may split a
            # run across grid cells; the adds are associative so that is
            # fine).
            out_ref[pl.ds(prev_ref[0], 1), :] += acc_ref[0:1, :]
        else:
            def body(j, _):
                base = j * unroll
                for u in range(unroll):
                    r = rows_ref[0, 0, base + u]
                    out_ref[pl.ds(r, 1), :] += vals_ref[pl.ds(base + u, 1), :]
                return 0

            lax.fori_loop(0, blk // unroll, body, 0, unroll=1)

    return kern


@functools.lru_cache(maxsize=16)
def _make_bwd_kernel_sharded(F: int, L: int, lvl_off: int, rows_blk: int,
                             n_shards: int):
    """RMW kernel for levels whose whole-level accumulator exceeds
    `_ACC_BLOCK_ROWS_MAX` rows (the reference's 2^19-entry tables at
    F>=4: 128 MB f32 outgrows VMEM, the round-4 cap19 crash).  The row
    space is split into `n_shards` windows; each shard is a full pass
    over the samples with rows outside the shard redirected to a dump
    row at rows_blk (the block is rows_blk+8 tall), so the RMW stays
    unconditional — a predicated skip costs two control regions per
    sample, measured ~2x the plain loop (round 3's run-combine result),
    while the dump-row add is just one more ~10 ns RMW whose result is
    sliced off.  The scatter VALUES need no masking.

    The (level, shard) pair is FLATTENED into the first grid axis: a 3-D
    (level, shard, block) grid made Mosaic double-buffer the 32 MB output
    window and spill ~50 MB of registers (measured on the cap19 compile),
    while this 2-D form keeps the proven kernel's pipeline structure.
    """
    def kern(scale_ref, rows_ref, slot_ref, pos_ref, g_ref, out_ref,
             vals_ref):
        import jax.lax as lax
        from jax.experimental import pallas as pl

        c = pl.program_id(0)
        lvl = c // n_shards + lvl_off
        base = (c % n_shards) * rows_blk

        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        scale = scale_ref[lvl, 0]
        blk = vals_ref.shape[0]
        # Build vals in row chunks: whole-block vals keep ~12 live
        # [blk, 128] vectors and spill ~50 MB of VMEM at blk=8192 —
        # chunking bounds the live set so the 2x32 MB output window fits.
        ch = min(blk, 2048)
        for q in range(blk // ch):
            sl = pl.ds(q * ch, ch)
            slot_q = slot_ref[0, 0, sl][:, None]  # [ch, 1] int32
            vals_ref[sl, :] = _vals_from_arrays(
                scale, pos_ref[sl, :], g_ref[sl, :], slot_q, lvl, F, L)

        unroll = 8

        def body(j, _):
            jb = j * unroll
            for u in range(unroll):
                r = rows_ref[0, 0, jb + u] - base
                r = jnp.where(
                    jnp.logical_and(r >= 0, r < rows_blk), r, rows_blk)
                out_ref[pl.ds(r, 1), :] += vals_ref[pl.ds(jb + u, 1), :]
            return 0

        lax.fori_loop(0, blk // unroll, body, 0, unroll=1)

    return kern


def _pad8(n: int) -> int:
    """Round up to a multiple of 8 — the Mosaic sublane granule.

    Pallas TPU lowering requires every block shape's second-to-last dim to
    be 8-divisible (or equal to the array dim).  Round 3 shipped a bench
    crash because f2l16's level 1 has 1521 accumulator rows and that raw
    count was used as a block shape (VERDICT r3 missing #2)."""
    return -(-n // 8) * 8


# Largest per-level accumulator block the whole-level RMW kernel may
# hold live in VMEM, in rows: 32768 rows = 16 MB f32.  Measured on the
# cap19 compiles (round 5): the whole-level branch carries THREE blk x
# 128 scratch buffers, so a 32 MB output window double-buffered by
# Mosaic lands at 121.2 MB — 1.2 MB over the 120 MB scoped-VMEM limit
# (f4l8 @ 2^19).  16 MB blocks leave headroom; every shipped bench
# geometry (<= 32768 rows/level) keeps its exact previous layout.
# Bigger levels take the row-SHARDED RMW kernel — one vals scratch, so
# 32 MB windows fit there (f8l4 @ 2^19 measured green): each shard is a
# full pass over the samples into its own window.
_ACC_BLOCK_ROWS_MAX = 32768
_SHARD_BLOCK_ROWS = 65536


def bwd_accumulator_plan(spec: HashGridSpec) -> dict:
    """Static layout of the backward accumulators for a spec.

    Single source of truth shared by `_grad_table_pallas` and the
    CPU-runnable Mosaic block-shape invariant test
    (tests/test_hash_nbr.py): returns, per kernel branch, the accumulator
    block shape and the overall array shape so the test can assert the
    lowering constraint (last two block dims 8/128-divisible or equal to
    the array dims) without a TPU.

    Three branches, by level size (sizes are nondecreasing, so each is a
    contiguous level range):
    - levels 0..k: one-hot MXU matmul scatter (<= MATMUL_ROWS_MAX rows);
    - levels k..k2: the plain RMW loop, whole-level accumulator in VMEM;
    - levels k2..L: the SHARDED RMW loop — accumulators past
      `_ACC_BLOCK_ROWS_MAX` rows (64 MB f32; the reference's 2^19-entry
      tables at F>=4) cannot hold a whole level in VMEM, so the row space
      is split into shards, each a full pass over the samples with
      out-of-shard rows redirected to a dump row (unconditional RMW — a
      predicated skip measured slower than adding to a scratch row).
    """
    L = spec.n_levels
    F = spec.n_features_per_level
    P = 128 // (8 * F)  # entries per accumulator row
    level_rows = [sz // P for sz in spec.level_sizes]
    assert all(a <= b for a, b in zip(level_rows, level_rows[1:])), (
        "level sizes must be nondecreasing for the prefix kernel split"
    )
    k = sum(1 for r in level_rows if r <= MATMUL_ROWS_MAX)
    k2 = k + sum(1 for r in level_rows[k:]
                 if _pad8(r) <= _ACC_BLOCK_ROWS_MAX)
    plan = {"k": k, "k2": k2, "P": P, "level_rows": level_rows,
            "blocks": []}
    if k:
        rows_small = _pad8(max(level_rows[:k]))
        plan["rows_small"] = rows_small
        plan["blocks"].append(
            ((rows_small, 128), (k * rows_small, 128)))
    if k < k2:
        rows_max = _pad8(max(level_rows[k:k2]))
        plan["rows_max"] = rows_max
        plan["blocks"].append(
            ((rows_max, 128), ((k2 - k) * rows_max, 128)))
    if k2 < L:
        rows_big = _pad8(max(level_rows[k2:]))
        n_shards = -(-rows_big // _SHARD_BLOCK_ROWS)
        rows_blk = _pad8(-(-rows_big // n_shards))
        plan["shard"] = {"rows": rows_big, "n_shards": n_shards,
                         "rows_blk": rows_blk, "dump": 8}
        plan["blocks"].append((
            (rows_blk + 8, 128),
            ((L - k2) * n_shards * (rows_blk + 8), 128)))
    return plan


def _grad_table_pallas(spec: HashGridSpec, pos, g, interpret: bool):
    """[N,3] pos + [N,F*L] upstream grad -> master-table grad [n_entries,F]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pos.shape[0]
    L = spec.n_levels
    F = spec.n_features_per_level
    plan = bwd_accumulator_plan(spec)
    P = plan["P"]
    log2p = P.bit_length() - 1
    blk = _sample_blk(n)

    nblk = n // blk
    # Per-level indices stacked straight into [L, N] (computing the
    # vectorized [N, L] form and transposing costs ~110 ms at NGP scale —
    # 3x the kernel; see _make_bwd_kernel docstring).
    e0T = _entry_indices_T(spec, pos)  # [L, N] int32
    rows = (e0T >> log2p).reshape(L * nblk, 1, blk)
    slots = (e0T & (P - 1)).reshape(L * nblk, 1, blk)
    scales = jnp.asarray(spec.scales, jnp.float32).reshape(L, 1)

    # Prefix split: levels with small accumulators take the one-hot MXU
    # matmul kernel (MATMUL_ROWS_MAX), mid levels the whole-level RMW
    # loop, and oversized levels (accumulator > _ACC_BLOCK_ROWS_MAX rows)
    # the row-sharded RMW kernel.  Level sizes are nondecreasing (dense
    # res^3 up to the cap), so each branch is a contiguous level range.
    level_rows = plan["level_rows"]
    k = plan["k"]
    k2 = plan["k2"]
    chunk = min(512, blk)

    common = dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def in_specs(lvl_off, rows_space, n_shards=1):
        # Index maps for the 2-D (cell, block) grid.  For the sharded
        # branch, cell = level * n_shards + shard: the shard never
        # changes which INPUT block a cell reads, only its row window.
        lvl_blk = lambda c, i: (
            (c // n_shards + lvl_off) * nblk + i, 0, 0)
        samp = lambda c, i: (i, 0)
        const = lambda c, i: (0, 0)
        return [
            pl.BlockSpec((L, 1), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, blk), lvl_blk, memory_space=rows_space),
            pl.BlockSpec((1, 1, blk), lvl_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 3), samp, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, F * L), samp, memory_space=pltpu.VMEM),
        ]

    slabs = [None] * L
    if k:
        rows_small = plan["rows_small"]
        acc_s = pl.pallas_call(
            _make_bwd_matmul_kernel(F, L, rows_small, lvl_off=0,
                                    chunk=chunk),
            grid=(k, nblk),
            in_specs=in_specs(0, pltpu.VMEM),
            out_specs=pl.BlockSpec((rows_small, 128), lambda l, i: (l, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k * rows_small, 128),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((blk, 128), jnp.float32)],
            **common,
        )(scales, rows, slots, pos, g)
        for lvl in range(k):
            slabs[lvl] = acc_s[lvl * rows_small:
                               lvl * rows_small + level_rows[lvl]]
    if k < k2:
        rows_max = plan["rows_max"]
        acc_b = pl.pallas_call(
            _make_bwd_kernel(F, L, RUN_COMBINE, lvl_off=k),
            grid=(k2 - k, nblk),
            in_specs=in_specs(k, pltpu.SMEM),
            out_specs=pl.BlockSpec((rows_max, 128), lambda l, i: (l, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(((k2 - k) * rows_max, 128),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((blk, 128), jnp.float32),
                pltpu.VMEM((8, 128), jnp.float32),  # run acc (row 0)
                pltpu.SMEM((1,), jnp.int32),        # current run's out row
            ],
            **common,
        )(scales, rows, slots, pos, g)
        for lvl in range(k, k2):
            slabs[lvl] = acc_b[(lvl - k) * rows_max:
                               (lvl - k) * rows_max + level_rows[lvl]]
    if k2 < L:
        sh = plan["shard"]
        n_shards, rows_blk = sh["n_shards"], sh["rows_blk"]
        stride = rows_blk + sh["dump"]  # block height incl. dump rows
        acc_h = pl.pallas_call(
            _make_bwd_kernel_sharded(F, L, k2, rows_blk, n_shards),
            grid=((L - k2) * n_shards, nblk),
            in_specs=in_specs(k2, pltpu.SMEM, n_shards=n_shards),
            out_specs=pl.BlockSpec(
                (stride, 128), lambda c, i: (c, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                ((L - k2) * n_shards * stride, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((blk, 128), jnp.float32)],
            **common,
        )(scales, rows, slots, pos, g)
        for lvl in range(k2, L):
            li = lvl - k2
            shards = [
                jax.lax.dynamic_slice_in_dim(
                    acc_h, (li * n_shards + s) * stride, rows_blk, 0)
                for s in range(n_shards)
            ]
            slabs[lvl] = jnp.concatenate(shards, axis=0)[:level_rows[lvl]]
    return unpack_slabs(spec, slabs)


@functools.lru_cache(maxsize=64)
def _corner_select(c: int, F: int, blocks: int = 8) -> np.ndarray:
    """[blocks*F, F] selection: lanes (cF..cF+F-1) -> features (0..F-1)."""
    p = np.zeros((blocks * F, F), np.float32)
    for f in range(F):
        p[c * F + f, f] = 1.0
    return p


@functools.lru_cache(maxsize=8)
def _corner_split_matrix(F: int) -> np.ndarray:
    """[1024, 1024] 0/1 permutation for the mm unpack: 8 slab rows
    (entry-major lanes slot*8F + c*F + f) -> 8 corner-major 128-lane
    blocks, block c holding the feature-interleaved flat e_loc*F + f."""
    P = 128 // (8 * F)
    W = np.zeros((8 * 128, 8 * 128), np.float32)
    for j in range(8):
        for li in range(128):
            s, cc, f = li // (8 * F), (li % (8 * F)) // F, li % F
            W[j * 128 + li, cc * 128 + (j * P + s) * F + f] = 1.0
    return W


def _unpack_level_mm(spec: HashGridSpec, lvl: int, slab2d: jnp.ndarray):
    """MXU-permute + 1-D-roll unpack of one level's kernel accumulator.

    The halving-stage unpack rolls [E, >=16] arrays by arbitrary row
    offsets — every 8-row sublane tile lands misaligned, so each roll is
    a full relayout (~27 GB/s effective at cap19, 18 ms of the 29.5 ms
    f8l4@2^19 backward).  Here ONE one-hot matmul regroups lanes into 8
    corner-major 128-lane blocks whose flats are feature-interleaved —
    exactly the layout whose 1-D rolls build_nbr_table streams — then 8
    flat rolls + an add-tree finish the corner sum.  HIGHEST precision:
    one output = one input value through an exactly-representable 1.0,
    so the triple-bf16 decomposition reconstructs f32 exactly.
    """
    F = spec.n_features_per_level
    sz = spec.level_sizes[lvl]
    A, B, C = (int(m) for m in level_multipliers(spec)[lvl])
    Y = slab2d.reshape(sz * 8 * F // 1024, 1024)
    out = jnp.dot(Y, jnp.asarray(_corner_split_matrix(F)),
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    acc = 0.0
    for c in range(8):
        off = ((c & 1) * A + ((c >> 1) & 1) * B + ((c >> 2) & 1) * C) % sz
        flat = out[:, c * 128 : (c + 1) * 128].reshape(sz * F)
        acc = acc + _roll1d(flat, F * off)
    return acc.reshape(sz, F)


def _unpack_mm_mode() -> str:
    """'' (auto: mm for sharded-branch levels), '1' (all), '0' (never)."""
    import os

    return os.environ.get("JNERF_UNPACK_MM", "")


def unpack_slabs(spec: HashGridSpec, slabs):
    """Per-level kernel accumulators [E_l/P, 128] -> master grad
    [n_entries, F].

    master[e, f] = sum_c slab[(e + off_c) mod E, c*F + f], where the
    corner offset is ADDITIVE over the three corner bits (off_c =
    bx*ox + by*oy + bz*oz mod E, `_corner_offsets`) and the slab's
    column blocks are bit-contiguous (c = bx + 2by + 4bz, f fastest).
    So the 8-corner sum factors into per-axis HALVING stages — from the
    top corner bit, add the low column half to the oz-rolled high half:

        V = slab[:, :w/2] + roll(slab[:, w/2:], oz)        # [E, w/2]

    pure slice + roll + add, no selection matmuls, and each stage halves
    the rolled width.  Rolls only run on >=16-lane-minor arrays (the
    layout rule at the top of this module: narrower rolls relayout,
    ~110 ms at NGP scale in the first cut), so halving stops when the
    half would be <16 lanes; the remaining corner bits use the original
    full-width roll + selection matmul.  Per level: f8l4 rolls 32+16+16
    lanes (vs 8x64 before, ~5x less roll traffic — unpack was 20.7 ms of
    the 31 ms cap19 backward, tools/probe_cap19.py), f4l8 16+3x16,
    f2l16 keeps the original 8x16-lane path.
    """
    F = spec.n_features_per_level
    mults = level_multipliers(spec)
    mm_mode = _unpack_mm_mode()
    plan_rows = [sz // (128 // (8 * F)) for sz in spec.level_sizes]
    parts = []
    for lvl in range(spec.n_levels):
        sz = spec.level_sizes[lvl]
        mm_ok = (sz * 8 * F) % 1024 == 0
        mm_auto = mm_ok and _pad8(plan_rows[lvl]) > _ACC_BLOCK_ROWS_MAX
        if mm_mode != "0" and (mm_mode == "1" and mm_ok or
                               mm_mode == "" and mm_auto):
            parts.append(_unpack_level_mm(spec, lvl, slabs[lvl]))
            continue
        slab = slabs[lvl].reshape(sz, 8 * F)
        # adjoint of build_nbr_table's nbr[e] = master[e + off]:
        # master[m] += slab[m - off]  ==  roll(slab, +off)[m]
        offs = [int(m) % sz for m in mults[lvl]]
        nbits = 3
        while nbits > 0 and slab.shape[1] // 2 >= 16:
            h = slab.shape[1] // 2
            off = offs[nbits - 1]
            hi = slab[:, h:]
            slab = slab[:, :h] + (jnp.roll(hi, off, axis=0) if off else hi)
            nbits -= 1
        if nbits == 0:
            parts.append(slab)  # [E, F]
            continue
        m = 0.0
        for c in range(1 << nbits):
            off = sum(offs[b] for b in range(nbits) if (c >> b) & 1) % sz
            rolled = jnp.roll(slab, off, axis=0) if off else slab
            # HIGHEST: default-precision f32 dots run through bf16 on
            # this stack (measured: one-hot selection x f32 lost ~2^-8
            # relative), silently rounding every gradient.  These selects
            # are tiny-K and HBM-bound, so exactness is free.
            m = m + jnp.dot(
                rolled, jnp.asarray(_corner_select(c, F, 1 << nbits)),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        parts.append(m)  # [E, F]
    return jnp.concatenate(parts, axis=0)


def _grad_table_xla(spec: HashGridSpec, pos, g):
    """Pure-XLA backward: vjp of the (table-linear) encode at a zero table.

    The encode is exactly linear in ``table`` (gather + position-only
    blend weights + constant assembly matmul), so its vjp is independent
    of the table value and autodiff of the plain forward — in f32, no
    bf16 table cast — is the exact adjoint.  This is the CPU path: Pallas
    interpret mode emulates the RMW kernel's (level, block) grid cell by
    cell and costs MINUTES per step at flagship shapes (the
    MULTICHIP_r03 timeout), while XLA:CPU scatter-adds are fast.  It is
    also the independent reference the grad tests compare the TPU
    kernels against (tests/test_hash_nbr.py loss_ref).
    """
    zeros = jnp.zeros((spec.n_entries, spec.n_features_per_level),
                      jnp.float32)
    _, vjp = jax.vjp(
        lambda t: _encode_from_nbr(spec, build_nbr_table(spec, t), pos),
        zeros,
    )
    return vjp(g)[0]


# Test hook: set JNERF_PALLAS_INTERPRET=1 to route the CPU backward
# through the Pallas kernels in interpret mode anyway, so kernel logic
# keeps CPU coverage (the Mosaic block-shape invariant itself is covered
# shape-only by bwd_accumulator_plan tests).
def _force_interpret() -> bool:
    import os

    return os.environ.get("JNERF_PALLAS_INTERPRET", "") == "1"


# Debug hook: set JNERF_FORCE_XLA_BWD=1 to train with the pure-XLA
# adjoint on any backend — the quality-discriminating arm for A/Bing the
# Pallas backward's numerics against the exact scatter (slow on TPU:
# ~15 ns/row XLA scatter-add vs ~10 ns RMW, plus no fused vals phase).
def _force_xla_bwd() -> bool:
    import os

    return os.environ.get("JNERF_FORCE_XLA_BWD", "") == "1"


# ------------------------------------------------------------------- public
@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _encode_nbr_core(spec, table, pos):
    nbr = build_nbr_table(spec, table.astype(GATHER_DTYPE))
    return _encode_from_nbr(spec, nbr, pos)


def _encode_nbr_fwd(spec, table, pos):
    return _encode_nbr_core(spec, table, pos), pos


def _encode_nbr_bwd(spec, pos, g):
    if _force_xla_bwd():
        return _grad_table_xla(spec, pos, g), None
    if _is_cpu() and not _force_interpret():
        return _grad_table_xla(spec, pos, g), None
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
