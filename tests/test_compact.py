"""Ragged compaction (ops.compact): equivalence against the padded path.

The compacted composite must reproduce ops.composite.render_rays exactly
on the kept samples (values AND gradients), and the global-M cap must
implement the reference's compaction-cap semantics (`calc_rgb.h:68-71`:
capped rays keep their prefix and skip the background term).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jnerf_tpu.ops.compact import compact_indices, render_rays_compact
from jnerf_tpu.ops.composite import render_rays


def _random_case(key, r=32, s=16, max_count=None):
    kc, kr, kd = jax.random.split(key, 3)
    max_count = s if max_count is None else max_count
    counts = jax.random.randint(kc, (r,), 0, max_count + 1)
    valid = jnp.arange(s)[None, :] < counts[:, None]
    raw = jax.random.normal(kr, (r, s, 4))
    dts = jnp.where(valid, jax.random.uniform(kd, (r, s)) * 0.02 + 1e-3, 0.0)
    return valid, raw, dts, counts


def _compact_args(valid, raw, dts, m):
    info = compact_indices(valid, m)
    raw_c = raw.reshape(-1, 4)[info.idx]
    dts_c = jnp.where(info.slot_valid, dts.reshape(-1)[info.idx], 0.0)
    return info, raw_c, dts_c


class TestCompactIndices:
    def test_roundtrip_layout(self):
        valid, raw, dts, counts = _random_case(jax.random.PRNGKey(0))
        m = int(valid.size)
        info = compact_indices(valid, m)
        total = int(jnp.sum(counts))
        assert int(jnp.sum(info.slot_valid)) == total
        # Lane k of ray r's segment maps back to slot (r, k).
        idx = np.asarray(info.idx)
        off = np.asarray(info.offsets)
        cnt = np.asarray(counts)
        s = valid.shape[1]
        for r in range(valid.shape[0]):
            for k in range(cnt[r]):
                assert idx[off[r] + k] == r * s + k
        assert not bool(jnp.any(info.truncated))

    def test_empty_rays_and_holes(self):
        # Rays 0 and 2 empty; ray 3 has a hole at s=1 -> post-hole dropped.
        valid = jnp.asarray([
            [0, 0, 0, 0],
            [1, 1, 0, 0],
            [0, 0, 0, 0],
            [1, 0, 1, 1],
        ], bool)
        info = compact_indices(valid, 16)
        assert np.asarray(info.counts).tolist() == [0, 2, 0, 1]
        assert np.asarray(info.idx)[:3].tolist() == [4, 5, 12]

    def test_cap_truncation_flags(self):
        valid, *_ = _random_case(jax.random.PRNGKey(1))
        counts = jnp.sum(valid, axis=1)
        off = jnp.cumsum(counts)
        m = int(off[-1]) // 2
        info = compact_indices(valid, m)
        expect = np.asarray(off) > m
        np.testing.assert_array_equal(np.asarray(info.truncated), expect)


class TestRenderEquivalence:
    @pytest.mark.parametrize("with_bg", [False, True])
    def test_values(self, with_bg):
        valid, raw, dts, _ = _random_case(jax.random.PRNGKey(2))
        bg = jnp.asarray([0.3, 0.5, 0.7]) if with_bg else None
        rgb_p, op_p = render_rays(raw, dts, valid, background=bg)
        info, raw_c, dts_c = _compact_args(valid, raw, dts, int(valid.size))
        rgb_c, op_c = render_rays_compact(raw_c, dts_c, info, background=bg)
        np.testing.assert_allclose(rgb_c, rgb_p, atol=1e-5)
        np.testing.assert_allclose(op_c, op_p, atol=1e-5)

    def test_gradients(self):
        valid, raw, dts, _ = _random_case(jax.random.PRNGKey(3))
        bg = jnp.asarray([0.2, 0.2, 0.9])
        m = int(valid.size)
        info = compact_indices(valid, m)

        def loss_p(raw):
            rgb, op = render_rays(raw, dts, valid, background=bg)
            return jnp.sum(rgb**2) + jnp.sum(op)

        def loss_c(raw):
            raw_c = raw.reshape(-1, 4)[info.idx]
            dts_c = jnp.where(info.slot_valid, dts.reshape(-1)[info.idx], 0.0)
            rgb, op = render_rays_compact(raw_c, dts_c, info, background=bg)
            return jnp.sum(rgb**2) + jnp.sum(op)

        np.testing.assert_allclose(loss_c(raw), loss_p(raw), rtol=1e-6)
        g_p = jax.grad(loss_p)(raw)
        g_c = jax.grad(loss_c)(raw)
        # Gradients agree on kept samples; padded slots carry no gradient
        # in either formulation.
        np.testing.assert_allclose(
            np.asarray(g_c)[np.asarray(valid)],
            np.asarray(g_p)[np.asarray(valid)], atol=1e-5,
        )

    def test_cap_matches_reference_semantics(self):
        """Capped rays composite their kept prefix and skip the bg term."""
        valid, raw, dts, counts = _random_case(jax.random.PRNGKey(4))
        off = np.concatenate([[0], np.cumsum(np.asarray(counts))])
        m = int(off[-1]) // 2
        bg = jnp.asarray([1.0, 1.0, 1.0])
        info, raw_c, dts_c = _compact_args(valid, raw, dts, m)
        rgb_c, _ = render_rays_compact(raw_c, dts_c, info, background=bg)

        kept = np.clip(np.minimum(off[1:], m) - off[:-1], 0, None)
        s = valid.shape[1]
        prefix_valid = jnp.arange(s)[None, :] < jnp.asarray(kept)[:, None]
        rgb_ref, _ = render_rays(raw, dts, prefix_valid, background=bg)
        rgb_nobg, _ = render_rays(raw, dts, prefix_valid, background=None)
        expect = np.where(np.asarray(info.truncated)[:, None],
                          np.asarray(rgb_nobg), np.asarray(rgb_ref))
        np.testing.assert_allclose(np.asarray(rgb_c), expect, atol=1e-5)


class TestTrainStepSmoke:
    def test_compacted_training_converges(self, tmp_path, fresh_cfg):
        """A few windows of real training with compaction on: loss drops
        and shapes stay sane (CPU, tiny scene)."""
        import jax as _jax

        from jnerf_tpu.runner import Runner
        from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg

        cfg = ngp_synthetic_cfg(
            n_images=4, H=48, W=48, n_rays_per_batch=128,
            target_batch_size=1 << 12, grid_size=32, hash_levels=4,
            log2_hashmap_size=12, tot_train_steps=200,
        )
        cfg.compacted_batch = True
        cfg.march_budget_factor = 2
        r = Runner()
        assert r.sampler.compacted_batch == 1 << 12
        # factor 2 doubles the per-ray budget: 2 * 4096 / 128 = 64
        assert r.sampler.n_samples_per_ray == 64
        first = float(_jax.device_get(r.train_range(0, 16)))
        last = float(_jax.device_get(r.train_range(16, 96)))
        assert np.isfinite(last)
        assert last < first
