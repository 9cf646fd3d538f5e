"""Multiresolution hash-grid encoder module.

Parity target: `/root/reference/python/jnerf/models/position_encoders/hash_encoder/hash_encoder.py`
(+ `grid_encode.py` geometry).  The parameter table is part of the model
params pytree under key ``"grid"``; compute dtype follows the model's
mixed-precision policy (bf16 on TPU instead of the reference's fp16).
"""

from __future__ import annotations

from jnerf_tpu.ops.hash_grid import DEFAULT_HASH_FUNC, HashGridSpec, hash_encode
from jnerf_tpu.utils.config import get_cfg
from jnerf_tpu.utils.registry import ENCODERS


@ENCODERS.register_module()
class HashEncoder:
    def __init__(
        self,
        n_pos_dims=3,
        n_features_per_level=2,
        n_levels=16,
        base_resolution=16,
        log2_hashmap_size=19,
        aabb_scale=None,
        hash_func=None,
        indexing=None,
    ):
        cfg = get_cfg()
        if aabb_scale is None:
            aabb_scale = (
                cfg.dataset_obj.aabb_scale if cfg.dataset_obj is not None else 1
            )
        if hash_func is None:
            hash_func = cfg.hash_func or DEFAULT_HASH_FUNC
        if indexing is None:
            # 'linear_rows' = TPU-fast packed-neighborhood path (per-level
            # linear hashes, one row-gather per sample-level);
            # 'xor' = reference-exact hash_func semantics (element gathers,
            # ~60x slower on TPU; see ops/hash_grid_rows.py).
            indexing = cfg.hash_indexing or "linear_rows"
        assert n_pos_dims == 3, "hash grid is 3-D"
        self.indexing = indexing
        self.spec = HashGridSpec(
            n_levels=n_levels,
            n_features_per_level=n_features_per_level,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            aabb_scale=float(aabb_scale),
            hash_func=hash_func,
        )
        self.out_dim = self.spec.out_dim
        self.compute_dtype = None  # set by the owning network's precision policy

    def init(self, key):
        return {"grid": self.spec.init_table(key)}

    def build_packed(self, params):
        """Precompute the packed neighborhood table (row path); callers in
        multi-invocation loops pass it back via __call__ to share the work."""
        from jnerf_tpu.ops.hash_grid_rows import GATHER_DTYPE, build_packed_table

        return build_packed_table(self.spec, params["grid"].astype(GATHER_DTYPE))

    def __call__(self, params, x, packed=None):
        if self.indexing == "linear_rows":
            from jnerf_tpu.ops.hash_grid_rows import hash_encode_rows

            return hash_encode_rows(
                self.spec, params["grid"], x, self.compute_dtype, packed=packed
            )
        return hash_encode(self.spec, params["grid"], x, self.compute_dtype)
