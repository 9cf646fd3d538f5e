"""NGP mesh extraction: density field -> iso-surface -> colored PLY.

Parity target: `/root/reference/tools/extract_mesh.py` — sample the raw
density head on an N^3 grid over the unit cube in x-chunks, extract the
sigma>0.5 surface, keep the largest connected component, then color each
vertex by volume-rendering a short ray from ``vertex - 0.2 * normal``
along the normal.  marching-tetrahedra + scipy replace
mcubes/open3d/plyfile (unavailable here; see jnerf_tpu/ops/marching.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def vertex_normals(vertices, triangles):
    """Area-weighted average of incident face normals."""
    v = np.asarray(vertices)
    t = np.asarray(triangles)
    fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    normals = np.zeros_like(v)
    for k in range(3):
        np.add.at(normals, t[:, k], fn)
    norm = np.linalg.norm(normals, axis=-1, keepdims=True)
    return normals / np.maximum(norm, 1e-12)


def mesh():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="", metavar="FILE", type=str)
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--mcube_smooth", type=bool, default=False)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from jnerf_tpu.ops.marching import (
        largest_component,
        marching_tetrahedra,
        write_ply,
    )
    from jnerf_tpu.runner import Runner
    from jnerf_tpu.utils.config import init_cfg

    if args.config_file:
        init_cfg(args.config_file)
    runner = Runner()
    runner.load_ckpt(runner.ckpt_path)
    mesh_dir = runner.save_path
    aabb_scale = runner.dataset["train"].aabb_scale
    N = args.resolution

    # Density field over the unit cube, chunked along x (`extract_mesh.py:49-71`).
    density_chunk = jax.jit(lambda pos: runner.model.density(runner.params, pos)[:, 0])
    lin = np.linspace(0, 1, N, dtype=np.float32)
    step = max(min((512 ** 3) // (N * N), N), 1)
    slabs = []
    for k in range(0, N, step):
        xs = lin[k : k + step]
        gx, gy, gz = np.meshgrid(xs, lin, lin, indexing="ij")
        pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)
        out = []
        chunk = 1 << 19
        for i in range(0, len(pts), chunk):
            out.append(np.asarray(density_chunk(jnp.asarray(pts[i : i + chunk]))))
        slabs.append(np.maximum(np.concatenate(out), 0).astype(np.int32))
    sigma = np.concatenate(slabs).reshape(N, N, N).astype(np.float32)

    vertices, triangles = marching_tetrahedra(sigma, 0.5)
    vertices = vertices / N
    # Reference swaps x/y after extraction (`extract_mesh.py:80-85`).
    vertices = vertices[:, [1, 0, 2]]
    write_ply(os.path.join(mesh_dir, "mesh-origin.ply"), vertices, triangles)
    print("mesh origin generated mesh-origin.ply")

    vertices, triangles = largest_component(vertices, triangles)
    normals = vertex_normals(vertices, triangles)

    # Color vertices: march from slightly inside, along the normal
    # (`extract_mesh.py:119-143`), undo the x/y swap for the sampler's space.
    v_s = vertices[:, [1, 0, 2]]
    n_s = normals[:, [1, 0, 2]]
    rays_o = v_s - n_s * 0.2
    rays_o = (rays_o - 0.5) * aabb_scale + 0.5
    rays_d = n_s

    n_verts = len(vertices)
    chunk = runner.render_chunk_rays
    fn = runner._build_render_chunk(chunk, runner.sampler.inference_samples_per_ray)
    key = jax.random.PRNGKey(0)
    rgb_out = np.zeros((n_verts + chunk, 3), np.float32)
    a_out = np.zeros((n_verts + chunk, 1), np.float32)
    for s in range(0, n_verts, chunk):
        e = s + chunk
        ro = jnp.asarray(np.resize(rays_o[s:e], (chunk, 3)))
        rd = jnp.asarray(np.resize(rays_d[s:e], (chunk, 3)))
        rgb, a = fn(runner.params, runner.sampler.state, ro, rd, key)
        rgb_out[s:e] = np.asarray(rgb)
        a_out[s:e] = np.asarray(a)[:, None]
    img = rgb_out[:n_verts] + np.asarray(runner.background_color) * (
        1 - a_out[:n_verts]
    )

    write_ply(os.path.join(mesh_dir, "mesh-color.ply"), vertices, triangles, img)
    print("mesh color generated mesh-color.ply")


if __name__ == "__main__":
    mesh()
