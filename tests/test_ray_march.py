"""Ray marching + occupancy grid + compositing unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from jnerf_tpu.ops.composite import render_rays
from jnerf_tpu.ops.occupancy import (
    GridConfig,
    make_grid_config,
    mip_from_pos_xyz,
    update_bitfield,
)
from jnerf_tpu.ops.ray_march import (
    MarchConfig,
    aabb_ray_intersect,
    candidate_ts,
    _first_s_indices,
    sample_rays,
)


def unit_grid_cfg():
    return make_grid_config((0.0, 1.0))


class TestAabb:
    def test_axis_ray(self):
        o = jnp.asarray([[-1.0, 0.5, 0.5]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        tmin, tmax = aabb_ray_intersect(o, d, 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(tmin), [1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(tmax), [2.0], atol=1e-6)

    def test_miss(self):
        o = jnp.asarray([[-1.0, 2.5, 0.5]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        tmin, tmax = aabb_ray_intersect(o, d, 0.0, 1.0)
        assert float(tmax[0]) <= float(tmin[0]) + 1e-6  # empty interval


class TestMip:
    def _mips(self, pos, cfg):
        pos = jnp.asarray(pos)
        return np.asarray(
            mip_from_pos_xyz(pos[:, 0], pos[:, 1], pos[:, 2], cfg)
        )

    def test_inside_unit_cube_is_mip0(self):
        cfg = GridConfig()
        mips = self._mips([[0.5, 0.5, 0.5], [0.3, 0.7, 0.45], [0.05, 0.95, 0.5]], cfg)
        np.testing.assert_array_equal(mips, [0, 0, 0])

    def test_outside_increases(self):
        cfg = GridConfig()
        mips = self._mips([[1.3, 0.5, 0.5], [2.4, 0.5, 0.5]], cfg)
        assert mips[0] == 1  # |0.8| in (0.5, 1]
        assert mips[1] == 2  # |1.9| in (1, 2]


class TestCandidates:
    def test_const_dt_spacing(self):
        cfg = MarchConfig(grid=unit_grid_cfg(), const_dt=True)
        t0 = jnp.asarray([0.3, 0.7])
        t, dt = candidate_ts(cfg, t0, 64)
        diffs = np.diff(np.asarray(t), axis=1)
        np.testing.assert_allclose(diffs, cfg.dt_const, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dt), cfg.dt_const, rtol=1e-6)

    def test_cone_dt_matches_recurrence(self):
        """Closed-form t_k must match the sequential t += calc_dt(t)."""
        g = make_grid_config((-1.5, 2.5))
        cfg = MarchConfig(grid=g, const_dt=False, cone_angle=1.0 / 256)
        t0 = np.array([0.21, 1.7], np.float32)
        n = 256
        t, dt = candidate_ts(cfg, jnp.asarray(t0), n)
        t = np.asarray(t)
        for r in range(2):
            tr = t0[r]
            for k in range(n):
                assert abs(t[r, k] - tr) <= 2e-3 * max(tr, 1.0), (r, k, t[r, k], tr)
                step = np.clip(tr * cfg.cone_angle, cfg.dt_min, cfg.dt_max)
                tr = tr + step

    def test_first_s_selection(self):
        occ = jnp.asarray(
            [
                [0, 1, 1, 0, 1, 0, 0, 1],
                [1, 1, 1, 1, 1, 1, 1, 1],
                [0, 0, 0, 0, 0, 0, 0, 0],
            ],
            bool,
        )
        idx, count = _first_s_indices(occ, 3)
        np.testing.assert_array_equal(np.asarray(count), [4, 8, 0])
        np.testing.assert_array_equal(np.asarray(idx[0]), [1, 2, 4])
        np.testing.assert_array_equal(np.asarray(idx[1]), [0, 1, 2])


class TestSampleRays:
    def test_fully_occupied_grid(self):
        g = unit_grid_cfg()
        cfg = MarchConfig(grid=g, near_distance=0.05, const_dt=True)
        bitfield = jnp.ones((g.n_cascades, 128, 128, 128), bool)
        # Ray through the cube center.
        o = jnp.asarray([[0.5, 0.5, -1.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        s = sample_rays(cfg, bitfield, o, d, jax.random.PRNGKey(0), 32)
        assert bool(s.valid.all())
        assert bool(s.truncated[0])  # chord of length 1 has ~2368 candidates
        # Positions are warped into [0,1] and increase along z.
        z = np.asarray(s.positions[0, :, 2])
        assert (np.diff(z) > 0).all()
        assert z.min() >= 0 and z.max() <= 1
        np.testing.assert_allclose(np.asarray(s.dirs[0, 0]), [0.5, 0.5, 1.0], atol=1e-6)

    def test_empty_grid_gives_no_samples(self):
        g = unit_grid_cfg()
        cfg = MarchConfig(grid=g, const_dt=True)
        bitfield = jnp.zeros((g.n_cascades, 128, 128, 128), bool)
        o = jnp.asarray([[0.5, 0.5, -1.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        s = sample_rays(cfg, bitfield, o, d, jax.random.PRNGKey(0), 16)
        assert int(s.numsteps[0]) == 0
        assert not bool(s.valid.any())

    def test_occupied_slab_only(self):
        """Only a z-slab occupied: all samples must fall inside it."""
        g = unit_grid_cfg()
        cfg = MarchConfig(grid=g, const_dt=True)
        bf = np.zeros((g.n_cascades, 128, 128, 128), bool)
        bf[0, :, :, 40:48] = True  # z in [40/128, 48/128)
        o = jnp.asarray([[0.5, 0.5, -1.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        s = sample_rays(cfg, jnp.asarray(bf), o, d, jax.random.PRNGKey(1), 128)
        n = int(s.numsteps[0])
        assert n > 0
        z = np.asarray(s.positions[0, :n, 2])
        assert (z >= 40 / 128 - 1e-3).all() and (z <= 48 / 128 + 1e-3).all()


class TestComposite:
    def _numpy_reference(self, raw, dts, valid, truncated, bg):
        """Direct per-ray loop port of compute_rgbs (`calc_rgb.h:11-74`)."""
        R, S, _ = raw.shape
        out = np.zeros((R, 3))
        for r in range(R):
            T = 1.0
            rgb_ray = np.zeros(3)
            for s in range(S):
                if not valid[r, s]:
                    continue
                rgb = 1 / (1 + np.exp(-raw[r, s, :3]))
                sigma = np.exp(raw[r, s, 3])
                alpha = 1 - np.exp(-sigma * dts[r, s])
                rgb_ray += alpha * T * rgb
                T *= 1 - alpha
            if not truncated[r]:
                rgb_ray += T * bg[r]
            out[r] = rgb_ray
        return out

    def test_matches_reference_loop(self):
        rng = np.random.default_rng(0)
        R, S = 4, 16
        raw = rng.normal(size=(R, S, 4)).astype(np.float32)
        dts = np.full((R, S), 0.01, np.float32)
        valid = rng.uniform(size=(R, S)) < 0.7
        truncated = np.array([False, True, False, False])
        bg = rng.uniform(size=(R, 3)).astype(np.float32)

        rgb, opacity = render_rays(
            jnp.asarray(raw), jnp.asarray(dts), jnp.asarray(valid),
            jnp.asarray(truncated), jnp.asarray(bg),
        )
        expect = self._numpy_reference(raw, dts, valid, truncated, bg)
        np.testing.assert_allclose(np.asarray(rgb), expect, rtol=1e-4, atol=1e-5)

    def test_gradients_flow(self):
        raw = jnp.zeros((2, 8, 4))
        dts = jnp.full((2, 8), 0.01)
        valid = jnp.ones((2, 8), bool)

        def f(raw):
            rgb, _ = render_rays(raw, dts, valid)
            return rgb.sum()

        g = jax.grad(f)(raw)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).sum()) > 0

    def test_density_activation_saturates(self):
        """Raw density beyond RAW_DENSITY_CAP must stay finite end-to-end.

        Round-4 regression: bf16 MLP outputs grew without bound in
        unsupervised regions (no restoring gradient at weight≈0), raw
        crossed 88, exp overflowed f32, and the grid mean / L1 reg / every
        parameter went NaN.  The reference's fp16 network output implicitly
        saturates; ours must saturate explicitly (`network_to_density`).
        """
        from jnerf_tpu.ops.compact import compact_indices, render_rays_compact
        from jnerf_tpu.ops.composite import network_to_density
        from jnerf_tpu.ops.occupancy import GridConfig, splat_density

        huge = jnp.asarray([0.0, 14.9, 90.0, 4000.0])
        d = network_to_density(huge)
        assert bool(jnp.isfinite(d).all())
        assert float(d[2]) == float(d[3])  # saturated

        # Padded compositing: forward and gradient stay finite.
        raw = jnp.zeros((2, 8, 4)).at[:, :, 3].set(500.0)
        dts = jnp.full((2, 8), 0.01)
        valid = jnp.ones((2, 8), bool)

        def f(raw):
            rgb, _ = render_rays(raw, dts, valid)
            return rgb.sum()

        assert bool(jnp.isfinite(f(raw)))
        assert bool(jnp.isfinite(jax.grad(f)(raw)).all())

        # Compacted compositing too.
        info = compact_indices(valid, 16)

        def fc(raw_c):
            rgb, _ = render_rays_compact(raw_c, dts.reshape(-1), info)
            return rgb.sum()

        raw_c = jnp.zeros((16, 4)).at[:, 3].set(500.0)
        assert bool(jnp.isfinite(fc(raw_c)))
        assert bool(jnp.isfinite(jax.grad(fc)(raw_c)).all())

        # Grid refresh splat.
        g = GridConfig(n_cascades=1)
        tmp = jnp.zeros((1, 128, 128, 128))
        out = splat_density(jnp.asarray([0, 1]), jnp.asarray([900.0, 90.0]),
                            tmp, g)
        assert bool(jnp.isfinite(out).all())


class TestBitfield:
    def test_threshold_and_maxpool(self):
        g = GridConfig(n_cascades=2)
        grid = np.zeros((2, 128, 128, 128), np.float32)
        grid[0, 10, 10, 10] = 1.0  # hot cell in cascade 0
        bf = np.asarray(update_bitfield(jnp.asarray(grid), jnp.asarray(0.02), g))
        assert bf[0, 10, 10, 10]
        assert bf[0].sum() == 1
        # cascade 1 center octant gets the pooled bit at 32 + 10//2 = 37.
        assert bf[1, 37, 37, 37]
        assert bf[1].sum() == 1
