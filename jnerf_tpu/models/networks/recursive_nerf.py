"""Recursive-NeRF: a growing LOD tree of MLP segments with uncertainty-gated
early termination.

Parity target: `/root/reference/contrib/Recursive-NeRF/run_nerf_helpers.py`
(NeRF :97-…: static binary tree of linear segments, per-node confidence and
output heads, anchor-based routing; `run_nerf.py` dfs/do_kmeans :539-592:
high-uncertainty points are k-means-clustered to place child anchors;
training stages step1/2/3 unlock deeper levels).

TPU-first: the tree is static (head_num fixes the topology), every node's
segment runs on the full point batch with routing expressed as masks — XLA
sees one fused dense program; "early termination" selects which node's
output each point uses rather than skipping compute (at these widths the
masked compute is cheaper than dynamic shapes).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _tree(head_num: int):
    """(children per node, linears per node, skip positions) like build_tree."""
    if head_num == 1:
        return [[1], [2], [3], []], [2, 2, 4, 4], [4]
    if head_num == 4:
        return (
            [[1, 2], [3, 4], [5, 6], [7], [8], [9], [10], [], [], [], []],
            [2, 2, 2, 4, 4, 4, 4, 4, 4, 4, 4],
            [6, 10, 14, 18],
        )
    if head_num == 8:
        return (
            [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14],
             [], [], [], [], [], [], [], []],
            [2, 2, 2, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4],
            [6, 10, 14, 18],
        )
    raise ValueError(f"unsupported head_num {head_num}")


def positional_encoding(x, multires):
    freqs = 2.0 ** jnp.arange(multires)
    xb = (x[..., None, :] * freqs[:, None]).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(xb), jnp.cos(xb)], axis=-1)


class RecursiveNeRF:
    def __init__(self, head_num=8, W=256, multires=10, multires_views=4,
                 threshold=3e-2):
        self.sons, self.nlinears, self.skip_linear = _tree(head_num)
        self.node_num = len(self.sons)
        self.W = W
        self.threshold = threshold
        self.multires = multires
        self.multires_views = multires_views
        self.in_ch = 3 + 6 * multires
        self.in_ch_views = 3 + 6 * multires_views
        # depth (stage level) of each node
        self.depth = [0] * self.node_num
        for i, sons in enumerate(self.sons):
            for s in sons:
                self.depth[s] = self.depth[i] + 1
        self.max_depth = max(self.depth)
        # linear index ranges per node
        self.node_linears = []
        k = 0
        for n in self.nlinears:
            self.node_linears.append(list(range(k, k + n)))
            k += n
        self.linear_num = k

    def _lin(self, key, i, o):
        bound = math.sqrt(6.0 / i)
        k1, _ = jax.random.split(key)
        return {"w": jax.random.uniform(k1, (i, o), jnp.float32, -bound, bound),
                "b": jnp.zeros((o,))}

    def init(self, key):
        keys = jax.random.split(key, self.linear_num + 3 * self.node_num + 1)
        W = self.W
        lins = []
        for li in range(self.linear_num):
            in_dim = self.in_ch if li == 0 else W
            if li - 1 in self.skip_linear:  # layer after a skip concat
                in_dim = W + self.in_ch
            lins.append(self._lin(keys[li], in_dim, W))
        p = {
            "linears": lins,
            "confidence": [
                self._lin(keys[self.linear_num + i], W, 1)
                for i in range(self.node_num)
            ],
            "alpha": [
                self._lin(keys[self.linear_num + self.node_num + i], W, 1)
                for i in range(self.node_num)
            ],
            "rgb": [
                {
                    "feat": self._lin(jax.random.fold_in(keys[-1], 2 * i), W, W // 2),
                    "view": self._lin(
                        jax.random.fold_in(keys[-1], 2 * i + 1),
                        W // 2 + self.in_ch_views, 3,
                    ),
                }
                for i in range(self.node_num)
            ],
            # routing anchors: [node, n_children, 3] (kmeans-updated)
            "anchors": [
                jnp.zeros((max(len(s), 1), 3)) for s in self.sons
            ],
        }
        return p

    @staticmethod
    def _apply(p, x):
        return x @ p["w"] + p["b"]

    def _node_out(self, params, t, h, views_enc):
        conf = self._apply(params["confidence"][t], h)[:, 0]
        alpha = self._apply(params["alpha"][t], h)
        feat = jax.nn.relu(self._apply(params["rgb"][t]["feat"], h))
        rgb = self._apply(
            params["rgb"][t]["view"], jnp.concatenate([feat, views_enc], -1)
        )
        return conf, jnp.concatenate([rgb, alpha], -1)

    def __call__(self, params, pts, views, max_level=None):
        """pts [N, 3], views [N, 3] -> (raw [N, 4], uncertainty [N]).

        max_level gates recursion depth (the step1/2/3 schedule); points
        whose node confidence is already below threshold keep shallow
        outputs even when deeper levels exist.
        """
        if max_level is None:
            max_level = self.max_depth
        pts_enc = positional_encoding(pts, self.multires)
        views_enc = positional_encoding(
            views / jnp.linalg.norm(views, axis=-1, keepdims=True),
            self.multires_views,
        )
        n = pts.shape[0]

        out = jnp.zeros((n, 4))
        uncert = jnp.zeros((n,))
        # per-node hidden state and assignment mask, walked in index order
        # (parents precede children by construction).
        h_in = {0: pts_enc}
        mask = {0: jnp.ones((n,), bool)}
        identity = {0: None}
        for t in range(self.node_num):
            if t not in h_in or self.depth[t] > max_level:
                continue
            h = h_in[t]
            ident = identity[t]
            for j, li in enumerate(self.node_linears[t]):
                h = self._apply(params["linears"][li], h)
                if t == 0 and j == 0:
                    ident = h
                if j == len(self.node_linears[t]) - 1 and ident is not None \
                        and ident.shape == h.shape:
                    h = h + ident
                h = jax.nn.relu(h)
                if li in self.skip_linear:
                    h = jnp.concatenate([pts_enc, h], -1)
            conf, node_out = self._node_out(
                params, t, h[:, : self.W] if h.shape[-1] != self.W else h,
                views_enc,
            )
            m = mask[t]
            # This node's output stands for its points (children overwrite
            # unless the point is confident or recursion is capped).
            out = jnp.where(m[:, None], node_out, out)
            uncert = jnp.where(m, conf, uncert)

            sons = self.sons[t]
            if sons and self.depth[t] < max_level:
                # Route uncertain points to the nearest-anchor child.
                anchors = params["anchors"][t]  # [n_sons, 3]
                d = jnp.linalg.norm(
                    pts[:, None, :] - anchors[None, : len(sons)], axis=-1
                )
                nearest = jnp.argmin(d, axis=-1)
                go_deeper = m & (conf > self.threshold)
                for si, s in enumerate(sons):
                    child_mask = go_deeper & (nearest == si)
                    mask[s] = mask.get(s, jnp.zeros((n,), bool)) | child_mask
                    h_in[s] = h
                    identity[s] = h
        return out, uncert


def kmeans(points: np.ndarray, k: int, iters: int = 10, seed: int = 0):
    """Plain numpy k-means for anchor placement (do_kmeans parity)."""
    rng = np.random.default_rng(seed)
    if len(points) < k:
        points = np.concatenate(
            [points, rng.normal(scale=0.1, size=(k, 3)).astype(points.dtype)]
        )
    centers = points[rng.choice(len(points), k, replace=False)]
    for _ in range(iters):
        d = np.linalg.norm(points[:, None] - centers[None], axis=-1)
        assign = d.argmin(1)
        for j in range(k):
            sel = points[assign == j]
            if len(sel):
                centers[j] = sel.mean(0)
    return centers


def split_anchors(model: RecursiveNeRF, params, sample_pts, uncert,
                  threshold=None):
    """Place child anchors by k-means over high-uncertainty points
    (`run_nerf.py:539-592`)."""
    threshold = threshold if threshold is not None else model.threshold
    pts = np.asarray(sample_pts)
    u = np.asarray(uncert)
    hard = pts[u > threshold]
    if len(hard) == 0:
        hard = pts
    anchors = list(params["anchors"])
    for t, sons in enumerate(model.sons):
        if sons:
            anchors[t] = jnp.asarray(
                kmeans(hard, max(len(sons), 1), seed=t).astype(np.float32)
            )
    return {**params, "anchors": anchors}
