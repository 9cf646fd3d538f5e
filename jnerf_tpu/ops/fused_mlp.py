"""Fused Instant-NGP MLP: one Pallas kernel for density+RGB networks.

TPU-native equivalent of the reference's tensor-core fully-fused MLP
(`/root/reference/python/jnerf/ops/code_ops/fully_fused_mlp.py:23-145` +
`op_header/fully_fused_mlp_header.h:1-61`, shipped only as a prebuilt
`.o`): 64-wide hidden layers, ReLU hidden activation, no output
activation, weights resident on-chip.  Where the CUDA kernel keeps
weights in registers/shared memory and streams 128-row batches through
WMMA tiles, this kernel keeps all five weight matrices in VMEM and
streams [BLK]-row sample blocks through the MXU — the whole chain

    pos_feat[N,32] -> density MLP (32->64->16) ->+
                                                 |-> (split-matmul
    dir_feat[N,16] ------------------------------+    "concat") -> rgb
                                                      MLP (32->64->64->3)

runs per block without touching HBM between layers.  The XLA fallback
(`models/networks/mlp.py`) round-trips every activation through HBM; at
NGP scale that tier measured ~10 ms/step (docs/DESIGN.md round-2 ledger).

Mosaic-shaped details:
- no lane-axis concats: the rgb input "concat" is two matmuls against the
  top/bottom row halves of V0, and the [rgb, sigma] output concat is a
  zero-padded V2 (64x4) plus an arithmetic lane-3 blend;
- bf16 operands into every matmul, f32 accumulation
  (`preferred_element_type`), activations re-quantized to bf16 between
  layers — the TPU translation of the reference's fp16 WMMA with fp32
  accumulators, and bit-for-bit the same quantization points as the XLA
  fallback path so the two are interchangeable mid-training.

Backward recomputes the forward activations in-kernel (they are ~19 kFLOP
per sample — far cheaper than storing [N,64] residuals to HBM) and emits
dpos_feat (the hash-encode upstream gradient) plus all five weight grads,
accumulated in f32 across sample blocks inside VMEM-resident outputs.
dir_feat gets no gradient: view directions are not trainable inputs
(`sh_encoder.py:55-56` — the reference's SH grad is None).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Network geometry (reference ngp_network.py:39-67): density 32->64->16,
# rgb (16+16)->64->64->3, all bias-free.
D_IN = 32     # hash-encode features
D_HID = 64
D_GEO = 16    # density-MLP output width (geo features; col 0 = raw sigma)
SH_DIM = 16   # SH degree-4 view encoding
RGB_IN = D_GEO + SH_DIM

_BLK = 8192   # sample rows per grid step (grid-step overhead dominates the
              # tiny per-block FLOPs below ~4k rows; measured on the bench
              # chip via tools/probe_fused_mlp.py)

# The f32 activation blocks at BLK=8192 exceed the 16 MB default scoped-
# VMEM budget; the bench chip compiles fine with a raised limit (the hash
# backward kernel already runs at 120 MB).
from jax.experimental.pallas import tpu as _pltpu
_COMPILER_PARAMS = _pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _bdot(a, b):
    """bf16 x bf16 -> f32 MXU matmul."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a @ b^T with f32 accumulation (contract last dims)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_bt(a, b):
    """a^T @ b contracting the batch (first) dims -> weight-grad shapes."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _fwd_block(x, d, w0, w1, v0, v1, v2p):
    """One block's forward; returns intermediates for bwd reuse.

    v2p is V2 zero-padded to [64, 4]; the returned rgb4's lane 3 is 0.
    """
    a0 = _bdot(x, w0)
    hb = jnp.maximum(a0, 0.0).astype(jnp.bfloat16)
    dout = _bdot(hb, w1)                       # [B, 16] f32 geo features
    db = dout.astype(jnp.bfloat16)
    # rgb input is concat(db, d); computed as split matmuls on V0 halves.
    a1 = _bdot(db, v0[:D_GEO, :]) + _bdot(d, v0[D_GEO:, :])
    r1b = jnp.maximum(a1, 0.0).astype(jnp.bfloat16)
    a2 = _bdot(r1b, v1)
    r2b = jnp.maximum(a2, 0.0).astype(jnp.bfloat16)
    rgb4 = _bdot(r2b, v2p)                     # [B, 4] f32, lane 3 == 0
    return (a0, hb, dout, db, a1, r1b, a2, r2b, rgb4)


def _lane_eq(width, lane):
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    return (ids == lane).astype(jnp.float32)


def _fwd_kernel(x_ref, d_ref, w0_ref, w1_ref, v0_ref, v1_ref, v2p_ref,
                out_ref):
    (_a0, _hb, dout, _db, _a1, _r1b, _a2, _r2b, rgb4) = _fwd_block(
        x_ref[:], d_ref[:], w0_ref[:], w1_ref[:], v0_ref[:], v1_ref[:],
        v2p_ref[:],
    )
    # out = [rgb, raw_sigma]: blend sigma (geo lane 0) into lane 3.
    out_ref[:] = rgb4 + dout[:, 0:1] * _lane_eq(4, 3)


def _bwd_kernel(x_ref, d_ref, w0_ref, w1_ref, v0_ref, v1_ref, v2p_ref,
                g_ref, dx_ref, dw0_ref, dw1_ref, dv0_ref, dv1_ref, dv2_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw0_ref[:] = jnp.zeros_like(dw0_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dv0_ref[:] = jnp.zeros_like(dv0_ref)
        dv1_ref[:] = jnp.zeros_like(dv1_ref)
        dv2_ref[:] = jnp.zeros_like(dv2_ref)

    x = x_ref[:]
    d = d_ref[:]
    (a0, hb, _dout, db, a1, r1b, a2, r2b, _rgb4) = _fwd_block(
        x, d, w0_ref[:], w1_ref[:], v0_ref[:], v1_ref[:], v2p_ref[:],
    )
    g = g_ref[:]                                # [B, 4] f32
    # Lanes 0-2 are the rgb grad; lane 3 (sigma grad) is masked out of the
    # V2 path — v2p's zero pad column would otherwise be harmless for dr2
    # but would pollute dv2's pad column, which we simply never read.
    g4 = (g * (1.0 - _lane_eq(4, 3))).astype(jnp.bfloat16)

    dr2 = (_dot_t(g4, v2p_ref[:]) * (a2 > 0)).astype(jnp.bfloat16)
    dv2_ref[:] += _dot_bt(r2b, g4)
    dr1 = (_dot_t(dr2, v1_ref[:]) * (a1 > 0)).astype(jnp.bfloat16)
    dv1_ref[:] += _dot_bt(r1b, dr2)
    # d(geo features): rgb branch (V0 top rows) + direct sigma column.
    d_dout = (
        _dot_t(dr1, v0_ref[0:D_GEO, :])
        + g[:, 3:4] * _lane_eq(D_GEO, 0)
    ).astype(jnp.bfloat16)
    dv0_ref[0:D_GEO, :] += _dot_bt(db, dr1)
    dv0_ref[D_GEO:, :] += _dot_bt(d, dr1)

    dh = (_dot_t(d_dout, w1_ref[:]) * (a0 > 0)).astype(jnp.bfloat16)
    dw1_ref[:] += _dot_bt(hb, d_dout)
    dx_ref[:] = _dot_t(dh, w0_ref[:])
    dw0_ref[:] += _dot_bt(x, dh)


def _weight_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)]


def _row_spec(width):
    return pl.BlockSpec((_BLK, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _acc_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _prep_weights(weights):
    """(w0, w1, v0, v1, v2[64,3]) -> bf16 with v2 zero-padded to [64, 4]."""
    w0, w1, v0, v1, v2 = (w.astype(jnp.bfloat16) for w in weights)
    v2p = jnp.pad(v2, ((0, 0), (0, 1)))
    return w0, w1, v0, v1, v2p


@partial(jax.custom_vjp, nondiff_argnums=())
def fused_ngp_mlp(weights, pos_feat, dir_feat):
    """weights = (w0[32,64], w1[64,16], v0[32,64], v1[64,64], v2[64,3]);
    pos_feat [N,32], dir_feat [N,16] -> [N,4] f32 (rgb logits, raw sigma).
    """
    return _fwd(weights, pos_feat, dir_feat)


def _fwd(weights, pos_feat, dir_feat):
    n = pos_feat.shape[0]
    assert n % _BLK == 0, f"fused MLP needs N % {_BLK} == 0, got {n}"
    x = pos_feat.astype(jnp.bfloat16)
    d = dir_feat.astype(jnp.bfloat16)
    ws = _prep_weights(weights)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n // _BLK,),
        in_specs=[_row_spec(D_IN), _row_spec(SH_DIM)] + _weight_specs(),
        out_specs=_row_spec(4),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=_is_cpu(),
    )(x, d, *ws)


def _fused_fwd(weights, pos_feat, dir_feat):
    out = _fwd(weights, pos_feat, dir_feat)
    return out, (weights, pos_feat, dir_feat)


def _fused_bwd(res, g):
    weights, pos_feat, dir_feat = res
    n = pos_feat.shape[0]
    x = pos_feat.astype(jnp.bfloat16)
    d = dir_feat.astype(jnp.bfloat16)
    ws = _prep_weights(weights)
    shapes = [(D_IN, D_HID), (D_HID, D_GEO), (RGB_IN, D_HID),
              (D_HID, D_HID), (D_HID, 4)]
    dx, dw0, dw1, dv0, dv1, dv2p = pl.pallas_call(
        _bwd_kernel,
        grid=(n // _BLK,),
        in_specs=[_row_spec(D_IN), _row_spec(SH_DIM)] + _weight_specs()
        + [_row_spec(4)],
        out_specs=[_row_spec(D_IN)] + [_acc_spec(s) for s in shapes],
        out_shape=[jax.ShapeDtypeStruct((n, D_IN), jnp.float32)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes],
        compiler_params=_COMPILER_PARAMS,
        interpret=_is_cpu(),
    )(x, d, *ws, g.astype(jnp.float32))
    dws = (dw0, dw1, dv0, dv1, dv2p[:, :3])
    dws = tuple(dw.astype(w.dtype) for dw, w in zip(dws, weights))
    # dir grads are never consumed (view dirs are data, not params); a
    # plain zeros_like is DCE'd by XLA.
    return dws, dx, jnp.zeros_like(dir_feat)


fused_ngp_mlp.defvjp(_fused_fwd, _fused_bwd)


# ----------------------------------------------------- density-only kernel
def _density_kernel(x_ref, w0_ref, w1_ref, out_ref):
    a0 = _bdot(x_ref[:], w0_ref[:])
    hb = jnp.maximum(a0, 0.0).astype(jnp.bfloat16)
    out_ref[:] = _bdot(hb, w1_ref[:, 0:1])


def fused_density_mlp(w0, w1, pos_feat):
    """pos_feat [N,32] -> raw sigma [N,1] f32 (no grad; occupancy sweeps)."""
    n = pos_feat.shape[0]
    assert n % _BLK == 0, f"fused density MLP needs N % {_BLK} == 0, got {n}"
    x = pos_feat.astype(jnp.bfloat16)
    return pl.pallas_call(
        _density_kernel,
        grid=(n // _BLK,),
        in_specs=[_row_spec(D_IN),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=_row_spec(1),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=_is_cpu(),
    )(x, w0.astype(jnp.bfloat16), w1.astype(jnp.bfloat16))
