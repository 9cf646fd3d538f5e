"""Pallas TPU kernels for the multiresolution hash-grid encode.

The XLA element-gather path (`jnerf_tpu.ops.hash_grid.hash_encode`) is
correctness-complete but gathers ~100M elem/s on TPU — two orders of
magnitude off the step budget.  This kernel restructures the access:

- grid over (levels x sample blocks); each level's table slice is DMA'd
  into VMEM (level slices are padded to a common row count so the
  BlockSpec is static; hashed levels are 2^19 entries);
- positions arrive transposed [3, N] and outputs leave as [L, N] per
  feature, so every VMEM block has a >=128-lane minor dimension (TPU tile
  layout; an [N, 3]-blocked kernel would pad 42x);
- per-level constants (scale, resolution, table size, dense flag) ride in
  SMEM scalar blocks;
- the 8-corner gather runs VMEM-side via ``jnp.take``; if the Mosaic
  toolchain rejects the dynamic gather, callers keep the XLA fallback.

Semantics parity: `HashEncode.h` ``grid_index``/``pos_fract``/``kernel_grid``
(see jnerf_tpu/ops/hash_grid.py for the line map).  Output is feature-major
[N, 2L], bit-matching the XLA path (equivalence-tested in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jnerf_tpu.ops.hash_grid import HashGridSpec, _compile_hash_func


def max_level_rows(spec: HashGridSpec) -> int:
    return max(spec.level_sizes)


def pad_table(spec: HashGridSpec, table: jnp.ndarray) -> jnp.ndarray:
    """Flat [n_entries, 2] -> per-level padded [L, max_rows, 2]."""
    out = jnp.zeros((spec.n_levels, max_level_rows(spec), 2), table.dtype)
    for lvl in range(spec.n_levels):
        sz = spec.level_sizes[lvl]
        out = out.at[lvl, :sz].set(
            jax.lax.dynamic_slice_in_dim(table, spec.level_offsets[lvl], sz, 0)
        )
    return out


def unpad_table(spec: HashGridSpec, padded: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pad_table -> flat [n_entries, 2]."""
    return jnp.concatenate(
        [padded[lvl, : spec.level_sizes[lvl]] for lvl in range(spec.n_levels)],
        axis=0,
    )


def _corner_indices_weights(hash_fn, scale, res, size, dense, px, py, pz):
    """Shared index/weight math; returns lists of 8 ([B] idx, [B] w)."""
    pg, fr = [], []
    for p in (px, py, pz):
        q = p * scale + 0.5
        g0 = jnp.floor(q)
        fr.append(q - g0)
        pg.append(g0.astype(jnp.uint32))
    out = []
    for c in range(8):
        bits = [(c >> d) & 1 for d in range(3)]
        x = pg[0] + bits[0]
        y = pg[1] + bits[1]
        z = pg[2] + bits[2]
        idx_dense = x + y * res + z * res * res
        idx = (jnp.where(dense, idx_dense, hash_fn(x, y, z)) % size).astype(
            jnp.int32
        )
        w = (
            (fr[0] if bits[0] else 1.0 - fr[0])
            * (fr[1] if bits[1] else 1.0 - fr[1])
            * (fr[2] if bits[2] else 1.0 - fr[2])
        )
        out.append((idx, w))
    return out


def _fwd_kernel(hash_fn, fparams_ref, iparams_ref, pos_ref, table_ref,
                f0_ref, f1_ref):
    """One (level, sample-block) grid cell.

    fparams_ref: [1, 1] SMEM f32 (fractional level scale).
    iparams_ref: [1, 3] SMEM int32 (resolution, size, dense-flag).
    pos_ref: [3, B] f32; table_ref: [max_rows, 2] VMEM level slice.
    f0_ref / f1_ref: [1, B] f32 per-feature outputs.
    """
    scale = fparams_ref[0, 0]
    res = iparams_ref[0, 0].astype(jnp.uint32)
    size = iparams_ref[0, 1].astype(jnp.uint32)
    dense = iparams_ref[0, 2] != 0

    corners = _corner_indices_weights(
        hash_fn, scale, res, size, dense,
        pos_ref[0, :], pos_ref[1, :], pos_ref[2, :],
    )
    f0 = jnp.zeros_like(pos_ref[0, :])
    f1 = jnp.zeros_like(f0)
    t0 = table_ref[0, :, 0]
    t1 = table_ref[0, :, 1]
    for idx, w in corners:
        f0 = f0 + w * jnp.take(t0, idx, axis=0).astype(jnp.float32)
        f1 = f1 + w * jnp.take(t1, idx, axis=0).astype(jnp.float32)
    f0_ref[0, :] = f0
    f1_ref[0, :] = f1


def _level_params(spec: HashGridSpec):
    fparams = np.asarray([[s] for s in spec.scales], np.float32)
    iparams = np.asarray(
        [
            [r, s, int(r ** 3 <= s)]
            for r, s in zip(spec.resolutions, spec.level_sizes)
        ],
        np.int32,
    )
    return fparams, iparams


def hash_encode_pallas(
    spec: HashGridSpec,
    padded_table: jnp.ndarray,
    pos_t: jnp.ndarray,
    block: int = 32768,
    interpret: bool = False,
):
    """Encode: pos_t [3, N] (warped, transposed) -> [N, 2L] feature-major.

    ``padded_table``: [L, max_rows, 2] (see pad_table).  N must be a
    multiple of ``block`` (callers pad; all trainer shapes are powers of
    two >= block).
    """
    L = spec.n_levels
    n = pos_t.shape[1]
    block = min(block, n)
    assert n % block == 0, (n, block)
    rows = max_level_rows(spec)
    hash_fn = _compile_hash_func(spec.hash_func)
    fparams, iparams = _level_params(spec)

    kernel = functools.partial(_fwd_kernel, hash_fn)
    f0, f1 = pl.pallas_call(
        kernel,
        grid=(L, n // block),
        in_specs=[
            pl.BlockSpec((1, 1), lambda l, i: (l, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda l, i: (l, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, block), lambda l, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, rows, 2), lambda l, i: (l, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, block), lambda l, i: (l, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda l, i: (l, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, n), jnp.float32),
            jax.ShapeDtypeStruct((L, n), jnp.float32),
        ],
        interpret=interpret,
    )(fparams, iparams, pos_t, padded_table)
    # [L, N] x2 -> [N, 2L] feature-major (f0 levels..., f1 levels...).
    return jnp.concatenate([f0.T, f1.T], axis=-1)
