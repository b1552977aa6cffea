"""LORE wiz_rev corner refinement, fully vectorized for TPU.

Reference (lineless_table_process.py:178-236, WTW config wiz_rev=True,
configuration_lore.py:97): the corner-heatmap channel is decoded separately
(corner_decode:97) into corner points with per-corner group boxes; each
detected cell's vertices are snapped to overlapping corner detections, and
cells with <=2 refinement events have their score multiplied by 0.4.

The reference runs an O(K*M) Python double loop on the host per image.
Here the same semantics are computed as dense (B, K, M) masked tensor ops
inside the jitted decode program:

  - pair validity  = cell score >= vis_thresh AND corner score >=
    vis_thresh_corner AND AABBs intersect AND some group-box vertex lies
    strictly inside the cell quad (is_group_faster_faster:357; the shapely
    point-in-polygon becomes a convex cross-product sign test)
  - per pair, the refined vertex is the cell vertex nearest the corner
    (find4ps:329); among a vertex's candidate corners the one nearest the
    ORIGINAL vertex wins, later corners winning ties (the reference
    replaces on `dist(origin, old) >= dist(origin, new)`)
  - refinement "events" reproduce the sequential counter: corner j is an
    event iff its distance is <= the running minimum over earlier valid
    corners of the same vertex (lax.cummin); count <= 2 -> score * 0.4
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


def _point_in_quad(quads: jax.Array, pts: jax.Array) -> jax.Array:
    """quads (..., 4, 2), pts (..., 2) -> bool (...,): strictly inside a
    convex quad (either winding)."""
    v0 = quads
    v1 = jnp.roll(quads, -1, axis=-2)
    e = v1 - v0                                   # (..., 4, 2)
    r = pts[..., None, :] - v0                    # (..., 4, 2)
    cross = e[..., 0] * r[..., 1] - e[..., 1] * r[..., 0]
    return jnp.all(cross > 0, axis=-1) | jnp.all(cross < 0, axis=-1)


def refine_vertices_by_corners(
        dets: jax.Array, scores: jax.Array,
        gboxes: jax.Array, gcenters: jax.Array, gscores: jax.Array,
        vis_thresh: float, vis_thresh_corner: float,
) -> Tuple[jax.Array, jax.Array]:
    """dets (B,K,8) cell quads, scores (B,K); gboxes (B,M,8) per-corner
    group quads, gcenters (B,M,2), gscores (B,M) sorted descending.
    Returns (refined dets (B,K,8), adjusted scores (B,K))."""
    B, K, _ = dets.shape
    M = gboxes.shape[1]
    bb = dets.reshape(B, K, 4, 2)
    gb = gboxes.reshape(B, M, 4, 2)

    # symmetric AABB intersection (is_group_faster_faster:363-367)
    bmin, bmax = bb.min(2), bb.max(2)             # (B, K, 2)
    gmin, gmax = gb.min(2), gb.max(2)             # (B, M, 2)
    aabb = jnp.all((bmin[:, :, None] <= gmax[:, None]) &
                   (gmin[:, None] <= bmax[:, :, None]), axis=-1)  # (B,K,M)

    # any group-box vertex strictly inside the cell quad
    pin = _point_in_quad(bb[:, :, None, None],            # (B,K,1,1,4,2)
                         gb[:, None])                     # (B,1,M,4,2)
    pin = jnp.any(pin, axis=-1)                           # (B, K, M)

    valid = (aabb & pin
             & (scores >= vis_thresh)[:, :, None]
             & (gscores >= vis_thresh_corner)[:, None, :])

    # nearest cell vertex per (cell, corner) and its distance to the
    # ORIGINAL vertex (find4ps + dist)
    d4 = jnp.sum((bb[:, :, None] - gcenters[:, None, :, None]) ** 2,
                 axis=-1)                                 # (B, K, M, 4)
    v_idx = jnp.argmin(d4, axis=-1)                       # (B, K, M)
    d_star = jnp.min(d4, axis=-1)                         # (B, K, M)

    # (B, K, 4, M): distance per vertex slot, masked where not assigned
    per_v = (valid[:, :, None, :]
             & (v_idx[:, :, None, :] == jnp.arange(4)[None, None, :, None]))
    dv = jnp.where(per_v, d_star[:, :, None, :], _INF)

    # sequential-events counter: corner j is accepted iff d <= running min
    # of earlier corners (first valid corner always accepts)
    run = jax.lax.cummin(dv, axis=dv.ndim - 1)
    prev = jnp.concatenate([jnp.full_like(run[..., :1], _INF),
                            run[..., :-1]], axis=-1)
    events = (dv < _INF) & (dv <= prev)                   # (B, K, 4, M)
    counts = events.sum(axis=(-1, -2))                    # (B, K)

    # final vertex position: nearest corner, later index winning ties
    dmin = dv.min(axis=-1)                                # (B, K, 4)
    at_min = (dv == dmin[..., None]) & (dv < _INF)
    last_j = jnp.where(at_min, jnp.arange(M)[None, None, None], -1) \
        .max(axis=-1)                                     # (B, K, 4)
    any_hit = last_j >= 0
    new_pos = jnp.take_along_axis(
        gcenters, jnp.maximum(last_j, 0).reshape(B, K * 4)[..., None],
        axis=1).reshape(B, K, 4, 2)
    refined = jnp.where(any_hit[..., None], new_pos, bb).reshape(B, K, 8)

    new_scores = jnp.where((scores >= vis_thresh) & (counts <= 2),
                           scores * 0.4, scores)
    return refined, new_scores


def refine_vertices_by_corners_np(dets, scores, gboxes, gcenters, gscores,
                                  vis_thresh, vis_thresh_corner):
    """Numpy mirror of :func:`refine_vertices_by_corners` for the host-side
    wiz_rev path (the in-program refine trips an axon-runtime re-execution
    bug; its inputs are ~100 KB so host math is effectively free)."""
    import numpy as np

    B, K, _ = dets.shape
    M = gboxes.shape[1]
    bb = dets.reshape(B, K, 4, 2)
    gb = gboxes.reshape(B, M, 4, 2)

    bmin, bmax = bb.min(2), bb.max(2)
    gmin, gmax = gb.min(2), gb.max(2)
    aabb = np.all((bmin[:, :, None] <= gmax[:, None]) &
                  (gmin[:, None] <= bmax[:, :, None]), axis=-1)

    v0 = bb[:, :, None, None]                      # (B,K,1,1,4,2)
    v1 = np.roll(bb, -1, axis=2)[:, :, None, None]
    e = v1 - v0
    r = gb[:, None][..., None, :] - v0             # (B,K,M,4,4,2)
    cross = e[..., 0] * r[..., 1] - e[..., 1] * r[..., 0]
    pin = np.any(np.all(cross > 0, axis=-1) | np.all(cross < 0, axis=-1),
                 axis=-1)                          # (B,K,M)

    valid = (aabb & pin
             & (scores >= vis_thresh)[:, :, None]
             & (gscores >= vis_thresh_corner)[:, None, :])

    d4 = np.sum((bb[:, :, None] - gcenters[:, None, :, None]) ** 2, axis=-1)
    v_idx = np.argmin(d4, axis=-1)
    d_star = np.min(d4, axis=-1)

    per_v = (valid[:, :, None, :]
             & (v_idx[:, :, None, :] == np.arange(4)[None, None, :, None]))
    INF = np.float32(1e30)
    dv = np.where(per_v, d_star[:, :, None, :], INF)

    run = np.minimum.accumulate(dv, axis=-1)
    prev = np.concatenate([np.full_like(run[..., :1], INF),
                           run[..., :-1]], axis=-1)
    events = (dv < INF) & (dv <= prev)
    counts = events.sum(axis=(-1, -2))

    dmin = dv.min(axis=-1)
    at_min = (dv == dmin[..., None]) & (dv < INF)
    last_j = np.where(at_min, np.arange(M)[None, None, None], -1).max(-1)
    any_hit = last_j >= 0
    new_pos = np.take_along_axis(
        gcenters, np.maximum(last_j, 0).reshape(B, K * 4)[..., None],
        axis=1).reshape(B, K, 4, 2)
    refined = np.where(any_hit[..., None], new_pos, bb).reshape(B, K, 8)
    new_scores = np.where((scores >= vis_thresh) & (counts <= 2),
                          scores * 0.4, scores).astype(np.float32)
    return refined.astype(np.float32), new_scores
