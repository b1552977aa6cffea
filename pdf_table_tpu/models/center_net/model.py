"""Cycle-CenterNet model + on-device decode.

Reference: TableStructureRec (model/center_net/modeling_table_structure.py:21)
over the DLA trunk; decode helpers bbox_decode/gbox_decode
(table_process.py:151,188). One jitted program: heads -> nms -> topk cells
(hm ch 0 + v2c offsets) and topk vertices (hm ch 1 + c2v offsets); the
cyclic vertex-snap grouping stays host-side on the small K/MK arrays.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.centernet import decode_boxes_4ps, gather_feat, heatmap_nms, topk_scores
from ..centernet_base import DLACenterNet
from .config import CenterNetConfig


class CycleCenterNet(nn.Module):
    config: CenterNetConfig

    def setup(self):
        self.trunk = DLACenterNet(self.config.heads, self.config.head_conv,
                                  dtype=jnp.dtype(self.config.dtype))

    def __call__(self, x, train: bool = False):
        cfg = self.config
        out = self.trunk(x, train)
        hm = jax.nn.sigmoid(out["hm"])

        # cells: 4-point decode from center channel + v2c offsets
        dets, scores, _, centers, inds = decode_boxes_4ps(
            hm[..., 0:1], out["v2c"], out["reg"], cfg.K)

        # vertices: position + c2v offsets (gbox_decode)
        B, H, W, _ = hm.shape
        vheat = heatmap_nms(hm[..., 1:2])
        vscores, vinds, _, vys, vxs = topk_scores(vheat, cfg.MK)
        vreg = gather_feat(out["reg"].reshape(B, H * W, 2), vinds)
        vx = vxs + vreg[:, :, 0]
        vy = vys + vreg[:, :, 1]
        c2v = gather_feat(out["c2v"].reshape(B, H * W, 8), vinds)
        # centers pointed to by this vertex: v - c2v
        cxs = vx[:, :, None] - c2v[:, :, 0::2]
        cys = vy[:, :, None] - c2v[:, :, 1::2]
        gboxes = jnp.concatenate(
            [vx[:, :, None], vy[:, :, None],
             jnp.stack([cxs[..., 0], cys[..., 0], cxs[..., 1], cys[..., 1],
                        cxs[..., 2], cys[..., 2], cxs[..., 3], cys[..., 3]],
                       axis=-1),
             vscores[:, :, None]], axis=-1)             # (B, MK, 11)

        if train:
            return {"heads": out, "hm": hm}
        return {"dets": dets, "scores": scores, "gboxes": gboxes,
                "centers": centers}
