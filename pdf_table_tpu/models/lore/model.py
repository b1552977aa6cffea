"""LoreModel: detector + on-device decode + logical-location regressor.

Reference control flow (modeling_lore.py:120-200 + process_detect_output,
lineless_table_process.py:592): detect -> host decode/filter -> processor.
TPU redesign: the whole forward is ONE jitted program with static K cell
slots — decode (nms/topk/gather), corner-feature aggregation, and the
transformer regressor all stay on device; invalid slots carry a mask
instead of being filtered (no dynamic shapes, no device->host sync).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.centernet import decode_boxes_4ps, gather_feat
from .config import LoreConfig
from .detector import build_detector
from .processor_model import LoreProcessor


def gather_corner_features(cr_map: jax.Array, dets: jax.Array) -> jax.Array:
    """Sum the cr feature map at a cell's 4 predicted corners
    (reference _get_4ps_feat, lineless_table_process.py).

    cr_map (B, H, W, D); dets (B, K, 8) feature-map coords.
    -> (B, K, D)."""
    B, H, W, D = cr_map.shape
    flat = cr_map.reshape(B, H * W, D)
    xs = jnp.clip(jnp.round(dets[..., 0::2]).astype(jnp.int32), 0, W - 1)
    ys = jnp.clip(jnp.round(dets[..., 1::2]).astype(jnp.int32), 0, H - 1)
    idx = ys * W + xs                        # (B, K, 4)
    K = idx.shape[1]
    g = jnp.take_along_axis(flat, idx.reshape(B, K * 4)[:, :, None], axis=1)
    return g.reshape(B, K, 4, D).sum(axis=2)


class LoreModel(nn.Module):
    config: LoreConfig

    def setup(self):
        self.detector = build_detector(self.config)
        self.processor = LoreProcessor(self.config)

    def features(self, pixel_values: jax.Array, train: bool = False
                 ) -> Dict[str, Any]:
        """Detector + on-device decode + corner-feature aggregation:
        everything before the logical-location regressor. Split out as its
        own jittable program — see :meth:`__call__` notes."""
        cfg = self.config
        out = self.detector(pixel_values, train=train)
        hm = jax.nn.sigmoid(out["hm"])
        K = cfg.max_objs

        # cell-center channel decode (reference ctdet_4ps_decode)
        dets, scores, _clses, centers, inds = decode_boxes_4ps(
            hm[..., 0:1], out["wh"], out["reg"], K)

        if cfg.wiz_rev:
            # corner channel decode (corner_decode:97: gbox = corner - st)
            # + vectorized vertex snap (lineless_table_process.py:178-236)
            from .corner_refine import refine_vertices_by_corners

            gboxes, gscores, _gc, gcenters, _gi = decode_boxes_4ps(
                hm[..., 1:2], out["st"], out["reg"], cfg.max_corners)
            dets, scores = refine_vertices_by_corners(
                dets, scores, gboxes, gcenters, gscores,
                cfg.vis_thresh, cfg.vis_thresh_corner)
            order = jnp.argsort(-scores, axis=1)
            dets = jnp.take_along_axis(dets, order[..., None], axis=1)
            scores = jnp.take_along_axis(scores, order, axis=1)
            inds = jnp.take_along_axis(inds, order, axis=1)
            centers = jnp.take_along_axis(centers, order[..., None], axis=1)

        valid = scores >= cfg.vis_thresh

        B, H, W, _ = hm.shape
        ax_flat = out["ax"].reshape(B, H * W, -1)
        ax_feat = gather_feat(ax_flat, inds)                 # (B, K, 256)
        cr_feat = gather_corner_features(out["cr"], dets)    # (B, K, 256)
        result: Dict[str, Any] = {
            "feat": ax_feat + cr_feat, "dets": dets, "scores": scores,
            "valid": valid, "centers": centers,
        }
        if train:
            result["heads"] = out
            result["hm"] = hm
        return result

    def logical(self, feat: jax.Array, dets: jax.Array,
                mask: Optional[jax.Array] = None):
        """Logical-location regressor program (transformer + stacking)."""
        return self.processor(feat, dets=dets, mask=mask)

    def detect_decode(self, pixel_values: jax.Array) -> Dict[str, Any]:
        """Detector + BOTH channel decodes, NO corner refine: the wiz_rev
        refine runs on host between this program and :meth:`gather_logical`
        (the in-program refine trips the axon re-execution bug; its inputs
        are tiny). ax/cr maps return as device arrays and never download."""
        cfg = self.config
        out = self.detector(pixel_values, train=False)
        hm = jax.nn.sigmoid(out["hm"])
        dets, scores, _c, centers, inds = decode_boxes_4ps(
            hm[..., 0:1], out["wh"], out["reg"], cfg.max_objs)
        gboxes, gscores, _gc, gcenters, _gi = decode_boxes_4ps(
            hm[..., 1:2], out["st"], out["reg"], cfg.max_corners)
        B, H, W, _ = hm.shape
        # ONE packed download (each D2H array costs ~40 ms of tunnel
        # latency): cells rows padded to the corner row width and stacked
        # along the slot axis; ax/cr maps stay device-resident
        cells = jnp.concatenate(
            [dets, scores[..., None], inds.astype(jnp.float32)[..., None],
             jnp.zeros_like(scores)[..., None]], axis=-1)    # (B, K, 11)
        corners = jnp.concatenate(
            [gboxes, gcenters, gscores[..., None]], axis=-1)  # (B, M, 11)
        return {"dc_packed": jnp.concatenate([cells, corners], axis=1),
                "ax_flat": out["ax"].reshape(B, H * W, -1),
                "cr_map": out["cr"]}

    def gather_logical(self, ax_flat: jax.Array, cr_map: jax.Array,
                       dets: jax.Array, inds: jax.Array,
                       scores: jax.Array):
        """Feature gathers at (host-refined) dets + the logical regressor,
        packed into one output array (see tasks/table_structure.py)."""
        cfg = self.config
        ax_feat = gather_feat(ax_flat, inds)
        cr_feat = gather_corner_features(cr_map, dets)
        logi, stacked = self.processor(ax_feat + cr_feat, dets=dets,
                                       mask=None)
        if stacked is None:
            stacked = logi
        valid = scores >= cfg.vis_thresh
        return jnp.concatenate(
            [dets, scores[..., None], valid.astype(jnp.float32)[..., None],
             jnp.zeros_like(dets[..., :2]), logi, stacked], axis=-1)

    def __call__(self, pixel_values: jax.Array, train: bool = False):
        """pixel_values (B, H, W, 3) normalized. Returns dict with
        dets (B, K, 8) fmap coords, scores (B, K), valid (B, K),
        logi / stacked_logi (B, K, 4), plus raw head outputs when training.

        NOTE: on the remote-TPU backend the inference task runs
        :meth:`features` and :meth:`logical` as TWO jitted programs —
        the monolithic program trips an axon-runtime re-execution bug
        (first call succeeds, later calls fail INVALID_ARGUMENT; splitting
        the processor into its own executable sidesteps it, see
        tasks/table_structure.py). This fused entry stays for CPU tests
        and training.
        """
        result = self.features(pixel_values, train=train)
        feat = result.pop("feat")
        logi, stacked = self.logical(
            feat, result["dets"], mask=result["valid"] if train else None)
        result["logi"] = logi
        result["stacked_logi"] = stacked if stacked is not None else logi
        return result

    def train_forward(self, pixel_values: jax.Array, hm_ind: jax.Array,
                      gt_dets: jax.Array, hm_mask: jax.Array,
                      cc_match: Optional[jax.Array] = None):
        """Teacher-forced training path (reference
        LoreProcessModel.get_train_features, lore_processor.py:432-463):
        the processor consumes features gathered at GROUND-TRUTH center
        indices and GT corner positions, not the decoder's top-K.

        hm_ind (B, M) flat fmap indices of GT centers; gt_dets (B, M, 8) GT
        corner coords in fmap space; hm_mask (B, M) validity. cc_match
        (B, M, 4), when given, holds the DEDUPED integer fmap positions of
        each cell's corners (data/wtw.py) — the reference gathers cr
        features there (_get_4ps_feat on cc_match) rather than at rounded
        float corners.
        Returns heads + logi/stacked_logi aligned with GT slots.

        BatchNorm runs on stored statistics (train=False) so the step needs
        no mutable collections; gradients still flow through the affine."""
        out = self.detector(pixel_values, train=False)
        B, H, W, _ = out["hm"].shape
        ax_flat = out["ax"].reshape(B, H * W, -1)
        ax_feat = gather_feat(ax_flat, hm_ind)
        if cc_match is not None:
            cr_flat = out["cr"].reshape(B, H * W, -1)
            M = cc_match.shape[1]
            g = jnp.take_along_axis(
                cr_flat, cc_match.reshape(B, M * 4)[:, :, None], axis=1)
            cr_feat = g.reshape(B, M, 4, -1).sum(axis=2)
        else:
            cr_feat = gather_corner_features(out["cr"], gt_dets)
        feat = ax_feat + cr_feat
        logi, stacked = self.processor(feat, dets=gt_dets, mask=hm_mask)
        return {"heads": out, "hm": jax.nn.sigmoid(out["hm"]),
                "logi": logi,
                "stacked_logi": stacked if stacked is not None else logi}
