"""Equivalence of the round-2 neighborhood-row hash path (ops/hash_nbr)
with the round-1 packed-row path (ops/hash_grid_rows): same linear-hash
semantics, so outputs AND table-gradients must match."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jnerf_tpu.ops.hash_grid import HashGridSpec
from jnerf_tpu.ops.hash_grid_rows import hash_encode_rows
from jnerf_tpu.ops.hash_nbr import (
    build_nbr_table,
    hash_encode_nbr,
    unpack_nbr_grad,
)


@pytest.fixture(autouse=True)
def _interpret_kernels(monkeypatch):
    """On CPU the production backward is the XLA linear-adjoint fallback;
    force interpret-mode Pallas here so the kernel logic keeps CPU
    coverage (the fallback's equivalence has its own test below)."""
    monkeypatch.setenv("JNERF_PALLAS_INTERPRET", "1")


@pytest.fixture()
def spec():
    return HashGridSpec(n_levels=4, base_resolution=4, log2_hashmap_size=10,
                        desired_resolution=64.0)


@pytest.fixture()
def table(spec):
    return jax.random.normal(jax.random.PRNGKey(0), (spec.n_entries, 2),
                             jnp.float32) * 0.1


@pytest.fixture()
def pos():
    return jax.random.uniform(jax.random.PRNGKey(1), (512, 3), jnp.float32)


def test_build_unpack_adjoint(spec, table):
    """<build(t), y> == <t, unpack(y)> — the roll pair is a true adjoint."""
    y = jax.random.normal(jax.random.PRNGKey(2), (spec.n_entries, 16),
                          jnp.float32)
    lhs = jnp.vdot(jnp.concatenate(build_nbr_table(spec, table), axis=0), y)
    rhs = jnp.vdot(table, unpack_nbr_grad(spec, y))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_forward_matches_rows_path(spec, table, pos):
    out_nbr = hash_encode_nbr(spec, table, pos)
    out_rows = hash_encode_rows(spec, table, pos)
    np.testing.assert_allclose(
        np.asarray(out_nbr), np.asarray(out_rows), rtol=2e-2, atol=2e-3
    )  # both quantize the gather to bf16; blend order differs


def test_grad_matches_rows_path(spec, table, pos):
    def loss_nbr(t):
        return jnp.sum(jnp.sin(hash_encode_nbr(spec, t, pos)))

    def loss_rows(t):
        return jnp.sum(jnp.sin(hash_encode_rows(spec, t, pos)))

    g_nbr = jax.grad(loss_nbr)(table)
    g_rows = jax.grad(loss_rows)(table)
    np.testing.assert_allclose(
        np.asarray(g_nbr), np.asarray(g_rows), rtol=5e-2, atol=5e-3
    )


def test_grad_matches_autodiff_of_forward(spec, table, pos):
    """The hand-written Pallas backward equals autodiff of the pure-XLA
    forward computed in f32 (tolerances cover the bf16 forward gather)."""
    from jnerf_tpu.ops.hash_nbr import _encode_from_nbr

    def loss_ref(t):
        nbr = build_nbr_table(spec, t)  # f32 tuple, differentiable rolls
        return jnp.sum(jnp.sin(_encode_from_nbr(spec, nbr, pos)))

    def loss_fast(t):
        return jnp.sum(jnp.sin(hash_encode_nbr(spec, t, pos)))

    g_ref = jax.grad(loss_ref)(table)
    g_fast = jax.grad(loss_fast)(table)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), rtol=5e-2, atol=5e-3
    )


def test_jit_under_grad(spec, table, pos):
    @jax.jit
    def step(t):
        return jax.grad(
            lambda t: jnp.mean(hash_encode_nbr(spec, t, pos) ** 2)
        )(t)

    g = step(table)
    assert g.shape == table.shape
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_prebuilt_nbr_matches(spec, table, pos):
    from jnerf_tpu.ops.hash_grid_rows import GATHER_DTYPE

    nbr = build_nbr_table(spec, table.astype(GATHER_DTYPE))
    out1 = hash_encode_nbr(spec, table, pos)
    out2 = hash_encode_nbr(spec, table, pos, nbr=nbr)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-6)


class TestMosaicBlockShapes:
    """CPU-runnable regression for the Mosaic lowering invariant.

    Round 3's bench crashed on TPU because f2l16's level 1 has 1521
    accumulator rows and that raw count was used as a Pallas block shape
    (Mosaic requires the last two block dims to be divisible by (8, 128)
    or equal to the array dims).  Interpret mode skips that check, so all
    125 round-3 tests stayed green while the TPU path was broken.  This
    asserts the invariant on the shared plan (`bwd_accumulator_plan`) for
    every bench encoder geometry, without needing a TPU.
    """

    @staticmethod
    def _assert_block_ok(block, array):
        assert len(block) == 2 and len(array) == 2
        sub, lane = block
        asub, alane = array
        assert lane % 128 == 0 or lane == alane, (block, array)
        assert sub % 8 == 0 or sub == asub, (block, array)
        # blocks must also cover the array exactly per grid cell
        assert asub % sub == 0 and alane % lane == 0, (block, array)

    def _bench_spec(self, levels, feats):
        # mirrors HashEncoder's fast-cap rule (hash_encoder.py:50-57)
        cap = (8 << 20) // (8 * feats * 2)
        return HashGridSpec(n_levels=levels, n_features_per_level=feats,
                            base_resolution=16, log2_hashmap_size=19,
                            max_level_size=cap)

    @pytest.mark.parametrize("levels,feats", [(16, 2), (8, 4), (4, 8)])
    def test_bench_geometries(self, levels, feats):
        from jnerf_tpu.ops.hash_nbr import bwd_accumulator_plan

        plan = bwd_accumulator_plan(self._bench_spec(levels, feats))
        assert plan["blocks"], "plan must have at least one kernel branch"
        for block, array in plan["blocks"]:
            self._assert_block_ok(block, array)

    def test_f2l16_rows_small_padded(self):
        """The exact round-3 failure: level 1 of the reference f2l16 shape
        has 1521 rows; the matmul branch's block must be 8-padded."""
        from jnerf_tpu.ops.hash_nbr import bwd_accumulator_plan

        plan = bwd_accumulator_plan(self._bench_spec(16, 2))
        assert plan["k"] >= 2  # >=2 matmul levels, so block != array dim
        assert 1521 in plan["level_rows"]
        assert plan["rows_small"] % 8 == 0
        assert plan["rows_small"] >= max(plan["level_rows"][: plan["k"]])

    def test_grad_correct_with_padded_rows(self):
        """Numeric regression: a spec whose matmul branch needs padding
        (odd max rows, k>=2) still produces autodiff-exact table grads."""
        from jnerf_tpu.ops.hash_nbr import (
            _encode_from_nbr,
            bwd_accumulator_plan,
        )

        spec = HashGridSpec(n_levels=6, base_resolution=4,
                            log2_hashmap_size=19, desired_resolution=64.0)
        plan = bwd_accumulator_plan(spec)
        assert plan["k"] >= 2
        assert max(plan["level_rows"][: plan["k"]]) % 8 != 0  # needs pad

        t = jax.random.normal(jax.random.PRNGKey(0),
                              (spec.n_entries, 2), jnp.float32) * 0.1
        p = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), jnp.float32)

        def loss_ref(t):
            nbr = build_nbr_table(spec, t)
            return jnp.sum(jnp.sin(_encode_from_nbr(spec, nbr, p)))

        def loss_fast(t):
            return jnp.sum(jnp.sin(hash_encode_nbr(spec, t, p)))

        g_ref = jax.grad(loss_ref)(t)
        g_fast = jax.grad(loss_fast)(t)
        np.testing.assert_allclose(
            np.asarray(g_fast), np.asarray(g_ref), rtol=5e-2, atol=5e-3
        )

    def test_oversized_levels_get_sharded_blocks(self):
        """The RMW kernel holds a level accumulator live in VMEM;
        f32[262144, 128] (f8l4 at the reference's 2^19 cap) is 128 MB and
        fails TPU compilation ("Allocation would exceed memory" — the
        round-4 cap19 A/B crash).  Oversized levels must get the row-
        sharded kernel: every planned block stays within the 32 MB shard
        window (+ the 8 dump rows), whole-level blocks within the 16 MB
        cap (the 3-scratch branch overflowed scoped VMEM by 1.2 MB at
        32 MB double-buffered), and the blocks still tile the array."""
        from jnerf_tpu.ops.hash_nbr import (
            _ACC_BLOCK_ROWS_MAX,
            _SHARD_BLOCK_ROWS,
            bwd_accumulator_plan,
        )

        cap19 = dict(base_resolution=16, log2_hashmap_size=19,
                     max_level_size=524288)
        for lv, ft in [(4, 8), (8, 4), (16, 2)]:
            spec = HashGridSpec(n_levels=lv, n_features_per_level=ft,
                                **cap19)
            plan = bwd_accumulator_plan(spec)
            sh = plan["shard"]
            # f2l16@cap19 (65536 rows) takes ONE 32 MB shard window — too
            # big for the 16 MB whole-level branch, no split needed.
            assert sh["n_shards"] == -(-sh["rows"] // _SHARD_BLOCK_ROWS)
            assert sh["rows_blk"] <= _SHARD_BLOCK_ROWS
            assert sh["n_shards"] * sh["rows_blk"] >= sh["rows"]
            for block, array in plan["blocks"]:
                assert block[0] <= max(_ACC_BLOCK_ROWS_MAX,
                                       sh["rows_blk"] + sh["dump"])
                self._assert_block_ok(block, array)

        # The shipped bench geometries (<= 32768 rows/level) fit whole
        # levels and must NOT shard — their layouts are unchanged.
        for levels, feats in [(16, 2), (8, 4), (4, 8)]:
            p = bwd_accumulator_plan(self._bench_spec(levels, feats))
            assert "shard" not in p

    def test_sharded_grad_matches_autodiff(self, monkeypatch):
        """Numeric regression for the sharded kernel: force sharding at
        small scale (row cap monkeypatched down) and check the interpret-
        mode Pallas backward against autodiff of the pure-XLA forward."""
        import jnerf_tpu.ops.hash_nbr as nbr_mod
        from jnerf_tpu.ops.hash_nbr import _encode_from_nbr

        spec = HashGridSpec(n_levels=4, base_resolution=4,
                            log2_hashmap_size=10, desired_resolution=64.0)
        monkeypatch.setattr(nbr_mod, "MATMUL_ROWS_MAX", 8)
        monkeypatch.setattr(nbr_mod, "_ACC_BLOCK_ROWS_MAX", 32)
        monkeypatch.setattr(nbr_mod, "_SHARD_BLOCK_ROWS", 32)
        plan = nbr_mod.bwd_accumulator_plan(spec)
        assert "shard" in plan and plan["shard"]["n_shards"] >= 2
        assert plan["k2"] < spec.n_levels

        t = jax.random.normal(jax.random.PRNGKey(0),
                              (spec.n_entries, 2), jnp.float32) * 0.1
        p = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), jnp.float32)

        def loss_ref(t):
            nbr = build_nbr_table(spec, t)
            return jnp.sum(jnp.sin(_encode_from_nbr(spec, nbr, p)))

        def loss_fast(t):
            return jnp.sum(jnp.sin(hash_encode_nbr(spec, t, p)))

        g_ref = jax.grad(loss_ref)(t)
        g_fast = jax.grad(loss_fast)(t)
        np.testing.assert_allclose(
            np.asarray(g_fast), np.asarray(g_ref), rtol=5e-2, atol=5e-3
        )


def test_xla_fallback_matches_pallas(spec, table, pos, monkeypatch):
    """The CPU production backward (_grad_table_xla, linear-adjoint vjp)
    must match the Pallas kernel path (interpret mode here)."""
    from jnerf_tpu.ops.hash_nbr import _grad_table_pallas, _grad_table_xla

    def loss(t):
        return jnp.sum(jnp.sin(hash_encode_nbr(spec, t, pos)))

    # upstream grad of sum(sin(out)) at the forward output
    out = hash_encode_nbr(spec, table, pos)
    g = jnp.cos(out)
    g_xla = _grad_table_xla(spec, pos, g)
    g_pl = _grad_table_pallas(spec, pos, g, interpret=True)
    np.testing.assert_allclose(np.asarray(g_xla), np.asarray(g_pl),
                               rtol=5e-2, atol=5e-3)
    # and the dispatching custom-vjp path agrees with both on CPU
    monkeypatch.delenv("JNERF_PALLAS_INTERPRET", raising=False)
    g_dispatch = jax.grad(loss)(table)
    np.testing.assert_allclose(np.asarray(g_dispatch), np.asarray(g_xla),
                               rtol=5e-2, atol=5e-3)


class TestF4L8:
    """F=4 features x 8 levels (NGP paper table 2's alternative config —
    halves the (sample, level) gather/scatter count at equal encoder
    output width).  Exercises the F-generalized nbr path end to end."""

    @pytest.fixture()
    def spec4(self):
        return HashGridSpec(n_levels=8, n_features_per_level=4,
                            base_resolution=16, log2_hashmap_size=13)

    def test_adjoint(self, spec4):
        t = jax.random.normal(jax.random.PRNGKey(0),
                              (spec4.n_entries, 4), jnp.float32)
        y = jax.random.normal(jax.random.PRNGKey(2),
                              (spec4.n_entries, 32), jnp.float32)
        lhs = jnp.vdot(jnp.concatenate(build_nbr_table(spec4, t), axis=0), y)
        rhs = jnp.vdot(t, unpack_nbr_grad(spec4, y))
        # f32 summation-order noise over ~2M products bounds the match
        np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-3)

    def test_grad_matches_autodiff(self, spec4):
        from jnerf_tpu.ops.hash_nbr import _encode_from_nbr

        t = jax.random.normal(jax.random.PRNGKey(0),
                              (spec4.n_entries, 4), jnp.float32) * 0.1
        p = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), jnp.float32)

        def loss_ref(t):
            nbr = build_nbr_table(spec4, t)
            return jnp.sum(jnp.sin(_encode_from_nbr(spec4, nbr, p)))

        def loss_fast(t):
            return jnp.sum(jnp.sin(hash_encode_nbr(spec4, t, p)))

        g_ref = jax.grad(loss_ref)(t)
        g_fast = jax.grad(loss_fast)(t)
        np.testing.assert_allclose(
            np.asarray(g_fast), np.asarray(g_ref), rtol=5e-2, atol=5e-3
        )

    def test_out_dim_and_shapes(self, spec4):
        t = spec4.init_table(jax.random.PRNGKey(0))
        p = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), jnp.float32)
        out = hash_encode_nbr(spec4, t, p)
        assert out.shape == (64, 32)  # F*L = 4*8 = 32, same MLP width


class TestUnpackMM:
    """The MXU-permute unpack (_unpack_level_mm) must agree exactly in
    semantics with the halving-stage unpack — it replaces relayout-bound
    row rolls on sharded-branch (cap19-class) levels (VERDICT r4 #3/#5)."""

    @pytest.mark.parametrize("levels,feats", [(4, 8), (8, 4), (16, 2)])
    def test_matches_halving_unpack(self, levels, feats, monkeypatch):
        from jnerf_tpu.ops import hash_nbr as nbr

        spec = HashGridSpec(n_levels=levels, n_features_per_level=feats,
                            base_resolution=4, log2_hashmap_size=10,
                            desired_resolution=64.0)
        P = 128 // (8 * feats)
        slabs = [
            jax.random.normal(jax.random.PRNGKey(10 + i), (sz // P, 128),
                              jnp.float32)
            for i, sz in enumerate(spec.level_sizes)
        ]
        monkeypatch.setenv("JNERF_UNPACK_MM", "0")
        ref = np.asarray(nbr.unpack_slabs(spec, slabs))
        monkeypatch.setenv("JNERF_UNPACK_MM", "1")
        got = np.asarray(nbr.unpack_slabs(spec, slabs))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_auto_mode_matches_on_big_levels(self, monkeypatch):
        """Auto gating (mm for sharded-branch levels only) is value-equal
        to the all-halving path at a cap19-class spec shape."""
        from jnerf_tpu.ops import hash_nbr as nbr

        spec = HashGridSpec(n_levels=3, n_features_per_level=8,
                            base_resolution=4, log2_hashmap_size=19,
                            desired_resolution=128.0)
        # keep it CPU-cheap: only check the one sharded-branch level
        plan = nbr.bwd_accumulator_plan(spec)
        assert plan["k2"] < spec.n_levels, "spec must have a sharded level"
        P = plan["P"]
        slabs = [
            jax.random.normal(jax.random.PRNGKey(20 + i), (sz // P, 128),
                              jnp.float32)
            for i, sz in enumerate(spec.level_sizes)
        ]
        monkeypatch.setenv("JNERF_UNPACK_MM", "0")
        ref = np.asarray(nbr.unpack_slabs(spec, slabs))
        monkeypatch.delenv("JNERF_UNPACK_MM", raising=False)
        got = np.asarray(nbr.unpack_slabs(spec, slabs))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
