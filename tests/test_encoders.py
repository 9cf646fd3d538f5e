"""Encoder unit tests: SH closed forms, frequency encoding, hash grid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jnerf_tpu.ops.hash_grid import HashGridSpec, hash_encode, hash_grid_indices
from jnerf_tpu.ops.sh import sh_encode


class TestSH:
    def test_constant_term(self):
        dirs = jnp.asarray(np.random.default_rng(0).uniform(size=(16, 3)))
        out = sh_encode(dirs)
        assert out.shape == (16, 16)
        np.testing.assert_allclose(out[:, 0], 0.28209479177387814, rtol=1e-6)

    def test_degree1_terms(self):
        # warped dir 0.75 -> unwarped 0.5 on each axis
        d = jnp.asarray([[0.75, 0.5, 0.5]])
        out = np.asarray(sh_encode(d))
        c = 0.48860251190291987
        np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-7)  # -c*y, y=0
        np.testing.assert_allclose(out[0, 2], 0.0, atol=1e-7)  # c*z, z=0
        np.testing.assert_allclose(out[0, 3], -c * 0.5, rtol=1e-6)

    def test_orthonormality(self):
        """Monte-Carlo check that the basis is orthonormal over the sphere
        (validates every polynomial's coefficient at once)."""
        rng = np.random.default_rng(1)
        v = rng.normal(size=(50000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        out = np.asarray(sh_encode(jnp.asarray((v + 1) / 2)))
        gram = out.T @ out / out.shape[0] * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.1)


class TestFrequencyEncoder:
    def test_values_and_order(self, fresh_cfg):
        from jnerf_tpu.models.position_encoders.freq_encoder import FrequencyEncoder

        enc = FrequencyEncoder(multires=3)
        x = jnp.asarray([[0.1, -0.2, 0.3]])
        out = np.asarray(enc({}, x))
        assert out.shape == (1, 3 * (1 + 2 * 3))
        np.testing.assert_allclose(out[0, :3], [0.1, -0.2, 0.3], rtol=1e-6)
        # order: per freq f: [sin(f*x) 3-wide, cos(f*x) 3-wide]
        np.testing.assert_allclose(out[0, 3:6], np.sin([0.1, -0.2, 0.3]), rtol=1e-5)
        np.testing.assert_allclose(out[0, 6:9], np.cos([0.1, -0.2, 0.3]), rtol=1e-5)
        np.testing.assert_allclose(out[0, 9:12], np.sin([0.2, -0.4, 0.6]), rtol=1e-5)


class TestHashGrid:
    def test_geometry_matches_reference(self):
        """Level scales/resolutions/offsets per `grid_encode.py:17-35`."""
        spec = HashGridSpec()
        assert spec.n_levels == 16
        assert spec.resolutions[0] == 16
        # per_level_scale = (2048/16)^(1/15)
        np.testing.assert_allclose(spec.per_level_scale, 128.0 ** (1 / 15), rtol=1e-12)
        assert spec.resolutions[-1] >= 2048
        # Dense levels are 8-aligned cubes, hashed levels capped at 2^19.
        for res, size in zip(spec.resolutions, spec.level_sizes):
            if res ** 3 <= (1 << 19):
                assert size == -(-res ** 3 // 8) * 8
            else:
                assert size == 1 << 19
        assert spec.level_offsets[-1] == sum(spec.level_sizes)

    def test_weights_partition_of_unity(self):
        spec = HashGridSpec(n_levels=4)
        pos = jnp.asarray(np.random.default_rng(0).uniform(0, 1, size=(32, 3)), jnp.float32)
        idx, w = hash_grid_indices(spec, pos)
        assert idx.shape == (32, 4 * 8)
        per_level = np.asarray(w).reshape(32, 4, 8).sum(-1)
        np.testing.assert_allclose(per_level, 1.0, atol=1e-5)
        assert int(idx.max()) < spec.n_entries
        assert int(idx.min()) >= 0

    def test_encode_interpolates_constant_table(self):
        """A constant table must encode to that constant everywhere."""
        spec = HashGridSpec(n_levels=4)
        table = jnp.full((spec.n_entries, 2), 0.25, jnp.float32)
        pos = jnp.asarray(np.random.default_rng(1).uniform(0, 1, size=(8, 3)), jnp.float32)
        out = hash_encode(spec, table, pos)
        assert out.shape == (8, 8)
        np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-6)

    def test_trilinear_against_numpy(self):
        """Dense level 0 (16^3): compare against a direct numpy trilinear."""
        spec = HashGridSpec(n_levels=1)
        rng = np.random.default_rng(2)
        table = rng.normal(size=(spec.n_entries, 2)).astype(np.float32)
        pos = rng.uniform(0.05, 0.95, size=(16, 3)).astype(np.float32)

        out = np.asarray(hash_encode(spec, jnp.asarray(table), jnp.asarray(pos)))

        scale = spec.scales[0]
        res = spec.resolutions[0]
        p = pos * scale + 0.5
        g0 = np.floor(p).astype(np.int64)
        f = p - g0
        expect = np.zeros((16, 2), np.float32)
        for c in range(8):
            dc = np.array([(c >> d) & 1 for d in range(3)])
            w = np.prod(np.where(dc == 1, f, 1 - f), axis=-1)
            pg = g0 + dc
            lin = pg[:, 0] + pg[:, 1] * res + pg[:, 2] * res * res
            expect += w[:, None] * table[lin % spec.level_sizes[0]]
        np.testing.assert_allclose(out, expect, rtol=2e-4, atol=1e-5)

    def test_gradient_is_scatter_add(self):
        """d(sum)/dtable must equal the summed trilinear weights per entry."""
        spec = HashGridSpec(n_levels=2)
        table = jnp.zeros((spec.n_entries, 2), jnp.float32)
        pos = jnp.asarray(np.random.default_rng(3).uniform(0, 1, size=(4, 3)), jnp.float32)

        g = jax.grad(lambda t: hash_encode(spec, t, pos).sum())(table)
        idx, w = hash_grid_indices(spec, pos)
        expect = np.zeros((spec.n_entries, 2), np.float32)
        np.add.at(expect, np.asarray(idx).reshape(-1), np.asarray(w).reshape(-1, 1))
        np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5, atol=1e-6)

    def test_custom_hash_func_string(self):
        spec = HashGridSpec(n_levels=16, hash_func="p0 * 73856093 ^ p1 * 19349663 ^ p2")
        pos = jnp.asarray(np.random.default_rng(4).uniform(0, 1, size=(4, 3)), jnp.float32)
        idx, _ = hash_grid_indices(spec, pos)
        assert int(idx.max()) < spec.n_entries
