"""Row-gather (packed neighborhood) hash encode: equivalence + gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from jnerf_tpu.ops.hash_grid import HashGridSpec, hash_encode
from jnerf_tpu.ops.hash_grid_rows import (
    base_indices_weights,
    build_packed_table,
    hash_encode_rows,
    level_multipliers,
    packed_row_offsets,
)


def dense_spec():
    """All levels dense (res^3 <= table size) so linear == reference indexing."""
    return HashGridSpec(n_levels=4, base_resolution=4, desired_resolution=16,
                        log2_hashmap_size=14)


def mixed_spec():
    return HashGridSpec(n_levels=6, base_resolution=4, desired_resolution=64,
                        log2_hashmap_size=10)


class TestPackedTable:
    def test_multipliers_dense_levels_match_strides(self):
        spec = dense_spec()
        for lvl, (a, b, c) in enumerate(level_multipliers(spec)):
            r = spec.resolutions[lvl]
            assert (a, b, c) == (1, r, r * r)

    def test_packed_shape_and_content(self):
        spec = dense_spec()
        table = jax.random.normal(jax.random.PRNGKey(0), (spec.n_entries, 2))
        packed = build_packed_table(spec, table)
        assert packed.shape == (spec.n_entries // 8, 128)
        # Row 0 of level 0, base entry 0, corner 0 == table[offset_0 + 0].
        np.testing.assert_allclose(
            np.asarray(packed[0, :2]), np.asarray(table[0]), rtol=1e-6
        )
        # Corner with offset (1,0,0) on level 0 => entry index 1.
        np.testing.assert_allclose(
            np.asarray(packed[0, 2:4]), np.asarray(table[1]), rtol=1e-6
        )

    def test_row_offsets(self):
        spec = mixed_spec()
        offs = packed_row_offsets(spec)
        assert offs[-1] == spec.n_entries // 8


class TestRowEncode:
    def test_matches_generic_on_dense_levels(self):
        """Dense levels index identically to the reference XOR path."""
        spec = dense_spec()
        key = jax.random.PRNGKey(1)
        table = jax.random.normal(key, (spec.n_entries, 2)) * 0.3
        pos = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))
        ref = hash_encode(spec, table, pos)
        out = hash_encode_rows(spec, table, pos)
        # The row path gathers in bf16 (GATHER_DTYPE) - tolerances to match.
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=4e-3)

    def test_constant_table_mixed_levels(self):
        spec = mixed_spec()
        table = jnp.full((spec.n_entries, 2), 0.125)
        pos = jax.random.uniform(jax.random.PRNGKey(3), (32, 3))
        out = hash_encode_rows(spec, table, pos)
        assert out.shape == (32, 2 * spec.n_levels)
        np.testing.assert_allclose(np.asarray(out), 0.125, atol=1e-3)

    def test_weights_partition_of_unity(self):
        spec = mixed_spec()
        pos = jax.random.uniform(jax.random.PRNGKey(4), (128, 3))
        e0, w = base_indices_weights(spec, pos)
        assert e0.shape == (128, spec.n_levels)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
        sizes = np.asarray(spec.level_sizes)
        assert (np.asarray(e0) < sizes[None, :]).all()

    def test_gradient_matches_generic_dense(self):
        spec = dense_spec()
        table = jnp.zeros((spec.n_entries, 2))
        pos = jax.random.uniform(jax.random.PRNGKey(5), (16, 3))
        cot = jax.random.normal(jax.random.PRNGKey(6), (16, 2 * spec.n_levels))

        g_row = jax.grad(
            lambda t: jnp.sum(hash_encode_rows(spec, t, pos) * cot)
        )(table)
        g_gen = jax.grad(
            lambda t: jnp.sum(hash_encode(spec, t, pos) * cot)
        )(table)
        np.testing.assert_allclose(np.asarray(g_row), np.asarray(g_gen),
                                   rtol=2e-2, atol=4e-3)

    def test_jit_and_shared_packed(self):
        from jnerf_tpu.ops.hash_grid_rows import GATHER_DTYPE

        spec = mixed_spec()
        table = jax.random.normal(jax.random.PRNGKey(7), (spec.n_entries, 2))
        pos = jax.random.uniform(jax.random.PRNGKey(8), (32, 3))
        packed = build_packed_table(spec, table.astype(GATHER_DTYPE))
        out1 = jax.jit(
            lambda t, p: hash_encode_rows(spec, t, p)
        )(table, pos)
        out2 = hash_encode_rows(spec, table, pos, packed=packed)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-5, atol=1e-6)
