"""Instant-NGP network: hash encode -> density MLP; SH + density feature -> RGB MLP.

Parity target: `/root/reference/python/jnerf/models/networks/ngp_network.py`
(density MLP 32->64->16, rgb MLP 32->64->64->3, both bias-free; output is
``[rgb_raw, sigma_raw]`` 4-wide; ``density()`` exposes the sigma head for
occupancy-grid updates).

TPU-first: the reference gates its tensor-core fully-fused MLP on
``use_fully`` + sm>=75 (`ngp_network.py:49-67`, kernels shipped as a
prebuilt ``.o``).  Here ``use_fully`` gates the Pallas fused kernel
(`jnerf_tpu/ops/fused_mlp.py`): the whole density+RGB chain runs in one
kernel with VMEM-resident weights, bf16 on the MXU, fp32 accumulation.
Geometry off the fused shape (64-wide, 32-dim encode, 16-dim SH) or
batches not divisible by the kernel block fall back to the XLA bf16 dot
chain (`models/networks/mlp.py`) — the analog of the reference's
``jt.nn.Linear`` fallback on old GPUs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jnerf_tpu.utils.config import get_cfg
from jnerf_tpu.utils.registry import ENCODERS, NETWORKS, build_from_cfg
from .mlp import apply_mlp, init_mlp


@NETWORKS.register_module()
class NGPNetworks:
    def __init__(
        self,
        use_fully=True,
        density_hidden_layer=1,
        density_n_neurons=64,
        rgb_hidden_layer=2,
        rgb_n_neurons=64,
    ):
        cfg = get_cfg()
        # cfg.fp16 selects reduced-precision compute; on TPU that means bf16.
        # NGP configs that omit the key still get bf16 (it is strictly better
        # on this hardware and numerically safer than fp16).
        self.compute_dtype = jnp.bfloat16 if cfg.fp16 in (None, True) else jnp.float32
        self.use_fully = use_fully
        self.pos_encoder = build_from_cfg(cfg.encoder.pos_encoder, ENCODERS)
        self.dir_encoder = build_from_cfg(cfg.encoder.dir_encoder, ENCODERS)
        self.pos_encoder.compute_dtype = self.compute_dtype
        self.dir_encoder.compute_dtype = self.compute_dtype
        self.density_dims = [self.pos_encoder.out_dim] + [density_n_neurons] * density_hidden_layer + [16]
        self.rgb_dims = [self.dir_encoder.out_dim + 16] + [rgb_n_neurons] * rgb_hidden_layer + [3]
        from jnerf_tpu.ops import fused_mlp as _fm

        # The Pallas fused-MLP kernel (ops/fused_mlp.py) implements the
        # reference's FullyFusedMlp semantics, but MEASURED SLOWER in-step
        # on the bench chip (+21 ms at f4l8 scale, round-3 ledger): its
        # custom_vjp is a fusion barrier, while XLA fuses the bf16 dot
        # chain into the surrounding step.  So `use_fully` follows the
        # reference's meaning (64-wide fused-shape networks) but the kernel
        # itself is opt-in via cfg.use_pallas_mlp.
        self._fused_ok = bool(
            get_cfg().use_pallas_mlp
            and use_fully
            and self.compute_dtype == jnp.bfloat16
            and self.density_dims == [_fm.D_IN, _fm.D_HID, _fm.D_GEO]
            and self.rgb_dims == [_fm.RGB_IN, _fm.D_HID, _fm.D_HID, 3]
            and self.dir_encoder.out_dim == _fm.SH_DIM
        )

    @staticmethod
    def _mlp_weights(params):
        return tuple(p["w"] for p in params["density_mlp"]) + tuple(
            p["w"] for p in params["rgb_mlp"]
        )

    def init(self, key):
        k_pos, k_dir, k_den, k_rgb = jax.random.split(key, 4)
        return {
            "pos_encoder": self.pos_encoder.init(k_pos),
            "dir_encoder": self.dir_encoder.init(k_dir),
            "density_mlp": init_mlp(k_den, self.density_dims, bias=False),
            "rgb_mlp": init_mlp(k_rgb, self.rgb_dims, bias=False),
        }

    def _encode_pos(self, params, pos, packed=None):
        try:
            return self.pos_encoder(params["pos_encoder"], pos, packed=packed)
        except TypeError:  # encoders without a packed-table fast path
            return self.pos_encoder(params["pos_encoder"], pos)

    def __call__(self, params, pos, dirs, packed=None):
        """[N,3] warped pos, [N,3] warped dirs -> [N,4] raw (rgb, sigma)."""
        dir_feat = self.dir_encoder(params["dir_encoder"], dirs)
        pos_feat = self._encode_pos(params, pos, packed)
        from jnerf_tpu.ops import fused_mlp as _fm

        if self._fused_ok and pos_feat.shape[0] % _fm._BLK == 0:
            return _fm.fused_ngp_mlp(
                self._mlp_weights(params), pos_feat, dir_feat
            )
        density = apply_mlp(params["density_mlp"], pos_feat, self.compute_dtype)
        h = jnp.concatenate(
            [density.astype(self.compute_dtype), dir_feat.astype(self.compute_dtype)],
            axis=-1,
        )
        rgb = apply_mlp(params["rgb_mlp"], h, self.compute_dtype)
        return jnp.concatenate([rgb, density[..., :1]], axis=-1).astype(jnp.float32)

    def density(self, params, pos, packed=None):
        """[N,3] warped pos -> [N,1] raw sigma (pre-activation).

        Uses the XLA dot chain, not the fused kernel: measured on the bench
        chip the density-only Pallas kernel's 1-lane output writes make it
        ~3x slower than XLA here (12 vs ~3.5 ms per 1M points, round-3
        ledger) — the fused kernel's win case is the full two-MLP chain.
        """
        feat = self._encode_pos(params, pos, packed)
        out = apply_mlp(params["density_mlp"], feat, self.compute_dtype)
        return out[:, :1].astype(jnp.float32)

    def build_packed(self, params):
        """Hoisted packed-table build for multi-chunk density sweeps."""
        if hasattr(self.pos_encoder, "build_packed"):
            return self.pos_encoder.build_packed(params["pos_encoder"])
        return None
