"""Dataset loaders: blender-json, LLFF, synthetic, pose math, fox real data."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from jnerf_tpu.dataset.dataset import NerfDataset, matrix_nerf2ngp, matrix_ngp2nerf


class TestPoseMath:
    def test_nerf2ngp_roundtrip(self):
        rng = np.random.default_rng(0)
        m = rng.normal(size=(3, 4)).astype(np.float32)
        fwd = matrix_nerf2ngp(m, 0.33, [0.5, 0.5, 0.5])
        back = matrix_ngp2nerf(fwd, 0.33, [0.5, 0.5, 0.5])
        np.testing.assert_allclose(back, m, atol=1e-6)

    def test_translation_lands_in_unit_cube(self):
        # Blender cameras orbit at radius ~4; 4*0.33+0.5 stays within aabb 4.
        m = np.eye(3, 4, dtype=np.float32)
        m[:, 3] = [4.0, 0, 0]
        out = matrix_nerf2ngp(m, 0.33, [0.5, 0.5, 0.5])
        assert np.all(np.abs(out[:, 3] - 0.5) <= 4.0 * 0.33 + 1e-6)


class TestNerfDataset:
    def test_load_synthetic_scene(self, synthetic_scene):
        ds = NerfDataset(synthetic_scene, batch_size=64, mode="train")
        # "train" mode also absorbs the val split's json (`dataset.py:77`).
        assert ds.n_images == 14
        assert ds.H == ds.W == 64
        assert ds.image_data.shape == (14 * 64 * 64, 4)
        img_ids, rays_o, rays_d, rgba = next(ds)
        assert rays_o.shape == (64, 3)
        norms = np.linalg.norm(np.asarray(rays_d), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        # Camera origins are at radius 4*scale from the aabb center.
        r = np.linalg.norm(np.asarray(rays_o) - 0.5, axis=-1)
        np.testing.assert_allclose(r, 4 * 0.33, atol=0.02)

    def test_rays_hit_scene_content(self, synthetic_scene):
        """Rays through non-transparent pixels must intersect the unit aabb."""
        from jnerf_tpu.ops.ray_march import aabb_ray_intersect

        ds = NerfDataset(synthetic_scene, batch_size=512, mode="train")
        img_ids, rays_o, rays_d, rgba = next(ds)
        tmin, tmax = aabb_ray_intersect(rays_o, rays_d, 0.0, 1.0)
        solid = np.asarray(rgba[:, 3]) > 0.5
        hits = np.asarray(tmax > tmin)
        assert hits[solid].mean() > 0.99

    def test_val_mode_subsamples(self, synthetic_scene):
        # val mode keeps every 10th frame (`dataset.py:98-99`): 2 frames -> 1.
        ds = NerfDataset(synthetic_scene, batch_size=16, mode="val")
        assert ds.n_images == 1

    def test_full_image_rays(self, synthetic_scene):
        ds = NerfDataset(synthetic_scene, batch_size=16, mode="train")
        rays_o, rays_d = ds.generate_rays_total_test(0)
        assert rays_o.shape == (64 * 64, 3)
        # Center pixel's ray ~ straight through the aabb center.
        c = 32 * 64 + 32
        center_dir = np.asarray(rays_d[c])
        to_center = 0.5 - np.asarray(rays_o[c])
        to_center /= np.linalg.norm(to_center)
        assert np.dot(center_dir, to_center) > 0.995


class TestLLFF:
    @pytest.fixture()
    def llff_scene(self, tmp_path):
        """Minimal fake LLFF capture: 6 images + poses_bounds.npy."""
        from jnerf_tpu.dataset.dataset_util import write_image

        rng = np.random.default_rng(0)
        img_dir = tmp_path / "images"
        img_dir.mkdir()
        H, W, focal = 64, 96, 80.0
        n = 6
        poses = np.zeros((n, 3, 5), np.float32)
        for i in range(n):
            # forward-facing cameras, slight offsets, LLFF [down,right,back]
            c2w = np.eye(3, 4, dtype=np.float32)
            c2w[:, 3] = [0.1 * i, 0.05 * i, 2.0]
            poses[i, :, :4] = c2w
            poses[i, :, 4] = [H, W, focal]
            write_image(str(img_dir / f"img_{i:02d}.png"),
                        rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
        bounds = np.tile(np.array([[1.0, 6.0]], np.float32), (n, 1))
        arr = np.concatenate([poses.reshape(n, 15), bounds], axis=1)
        np.save(tmp_path / "poses_bounds.npy", arr)
        return str(tmp_path)

    def test_load_and_split(self, llff_scene):
        from jnerf_tpu.dataset.llff_dataset import LLFFDataset

        ds = LLFFDataset(llff_scene, batch_size=32, mode="train", factor=2,
                         llffhold=3, aabb_scale=16)
        # llffhold=3 on 6 images -> test {0, 3}, train the rest.
        assert ds.n_images == 4
        assert ds.H == 32 and ds.W == 48  # factor-2 downscale
        with open(os.path.join(llff_scene, "split.json")) as f:
            splits = json.load(f)
        assert splits["test"] == [0, 3]
        ds_test = LLFFDataset(llff_scene, batch_size=32, mode="test", factor=2,
                              llffhold=3, aabb_scale=16)
        assert ds_test.n_images == 2
        _ids, rays_o, rays_d, _rgba = next(ds)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, atol=1e-5
        )


@pytest.mark.slow
class TestFoxRealData:
    def test_load_reference_fox_capture(self):
        """Integration: the real fox capture (distortion params, aabb_scale 4)."""
        fox = "/root/reference/data/fox"
        if not os.path.isdir(fox):
            pytest.skip("fox capture not present")
        ds = NerfDataset(fox, batch_size=128, mode="train")
        assert ds.n_images == 50
        assert ds.aabb_scale == 4
        assert ds.aabb_range == (-1.5, 2.5)
        assert ds.metadata[0, 0] != 0  # k1 distortion present
        _ids, rays_o, rays_d, rgba = next(ds)
        assert bool(jnp.isfinite(rays_d).all())


class TestHardScene:
    """Round-4 quality scene (VERDICT r3 #4): textured spheres + thin
    helix/ring, SSAA ground truth."""

    def test_ssaa_premultiplied_box_filter(self):
        """SSAA output must equal a box filter of the subpixel render in
        PREMULTIPLIED space (the trainer composites rgb*a + bg*(1-a), so
        that is the space where averaging is linear)."""
        from jnerf_tpu.dataset.synthetic import _look_at_pose, render_analytic

        eye = 4.0 * np.array([0.7, 0.55, 0.45])
        pose = _look_at_pose(eye / np.linalg.norm(eye) * 4.0)
        hi = render_analytic(pose, 64, 64, 0.69, scene="hard", ssaa=1)
        # render at 2x resolution manually and box filter
        hi2 = render_analytic(pose, 128, 128, 0.69, scene="hard", ssaa=1)
        premul = hi2[..., :3] * hi2[..., 3:]
        premul_ds = premul.reshape(64, 2, 64, 2, 3).mean(axis=(1, 3))
        a_ds = hi2[..., 3].reshape(64, 2, 64, 2).mean(axis=(1, 3))
        aa = render_analytic(pose, 64, 64, 0.69, scene="hard", ssaa=2)
        np.testing.assert_allclose(aa[..., 3], a_ds, atol=1e-6)
        np.testing.assert_allclose(aa[..., :3] * aa[..., 3:], premul_ds,
                                   atol=1e-5)
        # anti-aliased edges: alpha must take fractional values
        frac = (aa[..., 3] > 0.01) & (aa[..., 3] < 0.99)
        assert frac.sum() > 20
        # and plain ssaa=1 must be binary
        assert set(np.unique(hi[..., 3])) <= {0.0, 1.0}

    def test_hard_scene_has_texture_and_thin_structure(self):
        from jnerf_tpu.dataset.synthetic import _hard_scene

        centers, radii, colors, freqs, phases = _hard_scene()
        assert (freqs > 0).sum() >= 4  # textured objects
        assert (radii <= 0.05).sum() >= 90  # thin helix + ring members
        assert len(radii) == centers.shape[0] == colors.shape[0]

    def test_dataset_cache_roundtrip(self, tmp_path, monkeypatch):
        """The hard scene renders minutes of numpy at quality scale; the
        npz cache must return bit-identical images on reload."""
        from jnerf_tpu.dataset.procedural import SyntheticSpheresDataset

        monkeypatch.setenv("JNERF_SCENE_CACHE", str(tmp_path))
        ds1 = SyntheticSpheresDataset(batch_size=16, mode="val", n_images=2,
                                      H=32, W=32, scene="hard", ssaa=2)
        cached = list(tmp_path.glob("hard_*.npz"))
        assert len(cached) == 1
        ds2 = SyntheticSpheresDataset(batch_size=16, mode="val", n_images=2,
                                      H=32, W=32, scene="hard", ssaa=2)
        np.testing.assert_array_equal(np.asarray(ds1.image_data),
                                      np.asarray(ds2.image_data))
