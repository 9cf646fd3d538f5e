"""Native C++ components: build, correctness vs numpy reference, scale."""

import time

import numpy as np
import pytest

from jnerf_tpu import native
from jnerf_tpu.ops.marching import marching_tetrahedra

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_matches_numpy_sphere():
    g = np.mgrid[0:24, 0:24, 0:24].astype(np.float32)
    field = 8.0 - np.sqrt(((g - 11.5) ** 2).sum(axis=0))
    v_n, t_n = marching_tetrahedra(field, 0.0, use_native=True)
    v_p, t_p = marching_tetrahedra(field, 0.0, use_native=False)
    assert len(t_n) == len(t_p)
    # Same welded vertex set (order may differ) and same surface radius.
    sn = np.asarray(sorted(map(tuple, np.round(v_n, 4))))
    sp = np.asarray(sorted(map(tuple, np.round(v_p, 4))))
    np.testing.assert_allclose(sn, sp, atol=1e-4)
    r = np.linalg.norm(v_n - 11.5, axis=-1)
    np.testing.assert_allclose(r.mean(), 8.0, atol=0.1)


def test_native_empty_and_full():
    field = np.zeros((8, 8, 8), np.float32)
    v, t = native.marching_tets_native(field, 0.5)
    assert len(v) == 0 and len(t) == 0
    v, t = native.marching_tets_native(field + 1.0, 0.5)
    assert len(v) == 0 and len(t) == 0


def test_native_scales_to_large_grids():
    """256^3 extraction must complete quickly (numpy path cannot)."""
    n = 256
    ax = np.arange(n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    field = 60.0 - np.sqrt(
        (gx - n / 2) ** 2 + (gy - n / 2) ** 2 + (gz - n / 2) ** 2
    )
    t0 = time.perf_counter()
    v, t = native.marching_tets_native(field, 0.0)
    dt = time.perf_counter() - t0
    assert len(t) > 50_000
    assert dt < 30.0, f"native MT too slow: {dt:.1f}s"
    r = np.linalg.norm(v - n / 2, axis=-1)
    np.testing.assert_allclose(r.mean(), 60.0, atol=0.2)
