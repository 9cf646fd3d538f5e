"""Reference checkpoint conversion: morton math + grid/bitfield round-trips."""

import numpy as np

from jnerf_tpu.utils.convert_ckpt import (
    bitfield_from_reference,
    bitfield_to_reference,
    density_grid_from_reference,
    density_grid_to_reference,
    density_input_permutation,
    hash_table_from_reference,
    hash_table_to_reference,
    morton3d,
    morton3d_invert,
)


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    x, y, z = (rng.integers(0, 128, 1000, dtype=np.uint32) for _ in range(3))
    code = morton3d(x, y, z)
    np.testing.assert_array_equal(morton3d_invert(code), x)
    np.testing.assert_array_equal(morton3d_invert(code >> np.uint32(1)), y)
    np.testing.assert_array_equal(morton3d_invert(code >> np.uint32(2)), z)


def test_morton_known_values():
    # morton(1,0,0)=1, morton(0,1,0)=2, morton(0,0,1)=4, morton(1,1,1)=7.
    assert int(morton3d(1, 0, 0)) == 1
    assert int(morton3d(0, 1, 0)) == 2
    assert int(morton3d(0, 0, 1)) == 4
    assert int(morton3d(1, 1, 1)) == 7
    assert int(morton3d(2, 0, 0)) == 8


def test_density_grid_roundtrip():
    rng = np.random.default_rng(1)
    g, c = 32, 2
    grid = rng.normal(size=(c, g, g, g)).astype(np.float32)
    flat = density_grid_to_reference(grid)
    back = density_grid_from_reference(flat, c, g)
    np.testing.assert_array_equal(back, grid)
    # Spot value: reference's morton position 0 is cell (0,0,0) of cascade 0.
    assert flat[0] == grid[0, 0, 0, 0]
    # morton code 7 -> cell (1,1,1).
    assert flat[7] == grid[0, 1, 1, 1]


def test_bitfield_roundtrip():
    rng = np.random.default_rng(2)
    g, c = 16, 3
    bf = rng.uniform(size=(c, g, g, g)) < 0.2
    packed = bitfield_to_reference(bf)
    assert packed.dtype == np.uint8
    assert len(packed) == c * g ** 3 // 8
    back = bitfield_from_reference(packed, c, g)
    np.testing.assert_array_equal(back, bf)


def test_hash_table_roundtrip():
    rng = np.random.default_rng(3)
    flat = rng.normal(size=4096).astype(np.float16)
    table = hash_table_from_reference(flat)
    assert table.shape == (2048, 2)
    np.testing.assert_array_equal(hash_table_to_reference(table), flat)


def test_density_permutation():
    perm = density_input_permutation(4)
    # ref rows [l0f0, l0f1, l1f0, l1f1, ...] -> ours [f0 levels..., f1 ...].
    np.testing.assert_array_equal(perm, [0, 2, 4, 6, 1, 3, 5, 7])


def test_fmlp_roundtrip():
    """Concat-transposed FMLP vector unpacking inverts exactly, including
    the reference's 16-wide padding of the 3-wide rgb head."""
    import numpy as np
    from jnerf_tpu.utils.convert_ckpt import (
        fmlp_from_reference,
        fmlp_to_reference,
    )

    rng = np.random.default_rng(0)
    dims = (32, 64, 64, 3)
    layers = [
        {"w": rng.standard_normal((dims[i], dims[i + 1])).astype(np.float16)
         .astype(np.float32)}
        for i in range(len(dims) - 1)
    ]
    vec = fmlp_to_reference(layers)
    assert vec.dtype == np.float16
    assert vec.size == 32 * 64 + 64 * 64 + 64 * 16
    back = fmlp_from_reference(vec, dims)
    for a, b in zip(layers, back):
        np.testing.assert_array_equal(a["w"].astype(np.float16),
                                      b["w"].astype(np.float16))


def test_ngp_mlps_from_reference_shapes():
    import numpy as np
    from jnerf_tpu.utils.convert_ckpt import ngp_mlps_from_reference

    rng = np.random.default_rng(1)
    dvec = rng.standard_normal(32 * 64 + 64 * 16).astype(np.float16)
    rvec = rng.standard_normal(32 * 64 + 64 * 64 + 64 * 16).astype(np.float16)
    density, rgb = ngp_mlps_from_reference(dvec, rvec, n_levels=16)
    assert [p["w"].shape for p in density] == [(32, 64), (64, 16)]
    assert [p["w"].shape for p in rgb] == [(32, 64), (64, 64), (64, 3)]
