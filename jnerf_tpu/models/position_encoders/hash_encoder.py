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
            # 'linear_rows' = TPU-fast linear-hash path (one row-gather per
            # sample-level; served by ops/hash_nbr on accelerators and
            # ops/hash_grid_rows on CPU — see _linear_impl);
            # 'linear_nbr' / 'linear_rows_xla' = force one implementation;
            # 'xor' = reference-exact hash_func semantics (element gathers,
            # ~60x slower on TPU; required for reference-ckpt interop).
            indexing = cfg.hash_indexing or "linear_rows"
        assert n_pos_dims == 3, "hash grid is 3-D"
        self.indexing = indexing
        # TPU-first deviation: the linear-hash paths cap hashed-level tables
        # at 2^18 entries (8 MB bf16 neighborhood rows) — XLA row gathers are
        # 3.5x faster below a ~14 MB operand cliff (tools/probe_gather.py),
        # and pow2 sizes turn `% size` into AND.  Override with
        # cfg.hashmap_fast_cap (entries); 'xor' keeps reference-exact sizes.
        fast_cap = None
        if indexing != "xor":
            # 8 MB of [E, 8F] bf16 neighborhood rows per level.
            default_cap = (8 << 20) // (8 * n_features_per_level * 2)
            fast_cap = int(cfg.hashmap_fast_cap or default_cap)
        self.spec = HashGridSpec(
            n_levels=n_levels,
            n_features_per_level=n_features_per_level,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            aabb_scale=float(aabb_scale),
            hash_func=hash_func,
            max_level_size=fast_cap,
        )
        self.out_dim = self.spec.out_dim
        self.compute_dtype = None  # set by the owning network's precision policy

    def init(self, key):
        return {"grid": self.spec.init_table(key)}

    def _linear_impl(self) -> str:
        """Which linear-hash implementation serves 'linear_rows'.

        'nbr' (ops/hash_nbr: narrow-row gather + Pallas fused backward) on
        accelerators; 'rows' (ops/hash_grid_rows: pure XLA) on CPU, where the
        Pallas kernel would run in interpret mode.  Both compute the same
        encoding (tests/test_hash_nbr.py); 'linear_nbr' / 'linear_rows_xla'
        force one explicitly.
        """
        import jax

        if self.indexing == "linear_nbr":
            return "nbr"
        if self.spec.n_features_per_level != 2:
            return "nbr"  # the 128-lane rows packing is F=2-only
        if self.indexing == "linear_rows_xla":
            return "rows"
        return "rows" if jax.default_backend() == "cpu" else "nbr"

    def build_packed(self, params):
        """Precompute the gather table for the active fast path; callers in
        multi-invocation loops pass it back via __call__ to share the work."""
        from jnerf_tpu.ops.hash_grid_rows import GATHER_DTYPE

        if self.indexing == "xor":
            return None
        table = params["grid"].astype(GATHER_DTYPE)
        if self._linear_impl() == "nbr":
            from jnerf_tpu.ops.hash_nbr import build_nbr_table

            return ("nbr", build_nbr_table(self.spec, table))
        from jnerf_tpu.ops.hash_grid_rows import build_packed_table

        return ("rows", build_packed_table(self.spec, table))

    def __call__(self, params, x, packed=None):
        if self.indexing != "xor":
            kind = None
            pre = None
            if packed is not None:
                kind, pre = packed
            if (kind or self._linear_impl()) == "nbr":
                from jnerf_tpu.ops.hash_nbr import hash_encode_nbr

                return hash_encode_nbr(
                    self.spec, params["grid"], x, self.compute_dtype, nbr=pre
                )
            from jnerf_tpu.ops.hash_grid_rows import hash_encode_rows

            return hash_encode_rows(
                self.spec, params["grid"], x, self.compute_dtype, packed=pre
            )
        return hash_encode(self.spec, params["grid"], x, self.compute_dtype)
