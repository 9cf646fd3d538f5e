from . import composite, hash_grid, occupancy, ray_march, sh  # noqa: F401
