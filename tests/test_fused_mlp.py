"""Fused NGP MLP kernel (ops/fused_mlp.py) vs the XLA dot-chain path.

Runs in Pallas interpret mode on CPU.  The fused kernel quantizes at the
same points as models/networks/mlp.py (bf16 operands, f32 accumulation),
so forwards must agree to float-accumulation-order noise; the backward is
checked against (a) a cast-identical jnp mirror of the kernel math
(tight) and (b) XLA autodiff of the fallback path, which keeps some
intermediate grads in f32 where the kernel re-quantizes to bf16 for the
MXU (loose).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jnerf_tpu.ops import fused_mlp as fm


def _rand_weights(key):
    ks = jax.random.split(key, 5)
    shapes = [(fm.D_IN, fm.D_HID), (fm.D_HID, fm.D_GEO),
              (fm.RGB_IN, fm.D_HID), (fm.D_HID, fm.D_HID), (fm.D_HID, 3)]
    return tuple(
        jax.random.normal(k, s, jnp.float32) * (1.0 / np.sqrt(s[0]))
        for k, s in zip(ks, shapes)
    )


def _jnp_forward(weights, x, d):
    """The models/networks/mlp.py fallback chain, inlined."""
    w0, w1, v0, v1, v2 = (w.astype(jnp.bfloat16) for w in weights)
    xb = x.astype(jnp.bfloat16)
    db = d.astype(jnp.bfloat16)
    h = jnp.maximum(jnp.dot(xb, w0, preferred_element_type=jnp.float32), 0.0)
    dout = jnp.dot(h.astype(jnp.bfloat16), w1,
                   preferred_element_type=jnp.float32)
    rgb_in = jnp.concatenate([dout.astype(jnp.bfloat16), db], axis=1)
    r1 = jnp.maximum(jnp.dot(rgb_in, v0, preferred_element_type=jnp.float32), 0.0)
    r2 = jnp.maximum(
        jnp.dot(r1.astype(jnp.bfloat16), v1, preferred_element_type=jnp.float32),
        0.0,
    )
    rgb = jnp.dot(r2.astype(jnp.bfloat16), v2,
                  preferred_element_type=jnp.float32)
    return jnp.concatenate([rgb, dout[:, 0:1]], axis=1)


def _mirror_bwd(weights, x, d, g):
    """jnp mirror of _bwd_kernel's exact cast schedule."""
    w0, w1, v0, v1, v2 = (w.astype(jnp.bfloat16) for w in weights)
    v2p = jnp.pad(v2, ((0, 0), (0, 1)))
    xb = x.astype(jnp.bfloat16)
    db_dir = d.astype(jnp.bfloat16)
    f32 = jnp.float32

    a0 = jnp.dot(xb, w0, preferred_element_type=f32)
    hb = jnp.maximum(a0, 0.0).astype(jnp.bfloat16)
    dout = jnp.dot(hb, w1, preferred_element_type=f32)
    db = dout.astype(jnp.bfloat16)
    a1 = (jnp.dot(db, v0[:fm.D_GEO], preferred_element_type=f32)
          + jnp.dot(db_dir, v0[fm.D_GEO:], preferred_element_type=f32))
    r1b = jnp.maximum(a1, 0.0).astype(jnp.bfloat16)
    a2 = jnp.dot(r1b, v1, preferred_element_type=f32)
    r2b = jnp.maximum(a2, 0.0).astype(jnp.bfloat16)

    mask3 = (np.arange(4) == 3).astype(np.float32)
    g4 = (g * (1.0 - mask3)).astype(jnp.bfloat16)
    dt = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32)
    dbt = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32)

    dr2 = (dt(g4, v2p) * (a2 > 0)).astype(jnp.bfloat16)
    dv2 = dbt(r2b, g4)[:, :3]
    dr1 = (dt(dr2, v1) * (a1 > 0)).astype(jnp.bfloat16)
    dv1 = dbt(r1b, dr2)
    mask0 = (np.arange(fm.D_GEO) == 0).astype(np.float32)
    d_dout = (dt(dr1, v0[:fm.D_GEO]) + g[:, 3:4] * mask0).astype(jnp.bfloat16)
    dv0 = jnp.concatenate([dbt(db, dr1), dbt(db_dir, dr1)], axis=0)
    dh = (dt(d_dout, w1) * (a0 > 0)).astype(jnp.bfloat16)
    dw1 = dbt(hb, d_dout)
    dx = dt(dh, w0)
    dw0 = dbt(xb, dh)
    return (dw0, dw1, dv0, dv1, dv2), dx


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    kw, kx, kd, kg = jax.random.split(key, 4)
    weights = _rand_weights(kw)
    n = 2 * fm._BLK
    x = jax.random.uniform(kx, (n, fm.D_IN), jnp.float32, -1, 1)
    d = jax.random.uniform(kd, (n, fm.SH_DIM), jnp.float32, -1, 1)
    g = jax.random.normal(kg, (n, 4), jnp.float32)
    return weights, x, d, g


def test_forward_matches_xla_chain(data):
    weights, x, d, _ = data
    out_fused = fm.fused_ngp_mlp(weights, x, d)
    out_ref = _jnp_forward(weights, x, d)
    # The split-matmul "concat" sums two f32 partials where the reference
    # does one matmul; when a1 lands on a ReLU/bf16 rounding boundary the
    # order difference surfaces (~1e-4 on a handful of elements).
    np.testing.assert_allclose(out_fused, out_ref, rtol=1e-5, atol=2e-3)


def test_density_only_matches(data):
    weights, x, _, _ = data
    out = fm.fused_density_mlp(weights[0], weights[1], x)
    ref = _jnp_forward(weights, x, jnp.zeros((x.shape[0], fm.SH_DIM)))
    np.testing.assert_allclose(out[:, 0], ref[:, 3], rtol=1e-5, atol=2e-3)


def test_backward_matches_mirror(data):
    weights, x, d, g = data

    def loss(w, xx):
        return jnp.vdot(fm.fused_ngp_mlp(w, xx, d), g)

    (dws, dx) = jax.grad(loss, argnums=(0, 1))(weights, x)
    (m_dws, m_dx) = _mirror_bwd(weights, x, d, g)
    np.testing.assert_allclose(dx, m_dx, rtol=1e-5, atol=2e-3)
    for got, want in zip(dws, m_dws):
        scale = float(jnp.max(jnp.abs(want))) + 1e-8
        np.testing.assert_allclose(
            np.asarray(got) / scale, np.asarray(want) / scale,
            rtol=0.0, atol=1e-3)


def test_backward_close_to_xla_autodiff(data):
    weights, x, d, g = data

    def loss_fused(w, xx):
        return jnp.vdot(fm.fused_ngp_mlp(w, xx, d), g)

    def loss_ref(w, xx):
        return jnp.vdot(_jnp_forward(w, xx, d), g)

    dws_f, dx_f = jax.grad(loss_fused, argnums=(0, 1))(weights, x)
    dws_r, dx_r = jax.grad(loss_ref, argnums=(0, 1))(weights, x)
    # The kernel re-quantizes intermediate grads to bf16 for the MXU where
    # XLA autodiff keeps f32; compare with bf16-scale tolerances.
    for got, want in zip(dws_f + (dx_f,), dws_r + (dx_r,)):
        scale = float(jnp.max(jnp.abs(want))) + 1e-8
        np.testing.assert_allclose(
            np.asarray(got) / scale, np.asarray(want) / scale,
            rtol=0.0, atol=0.03,
        )
