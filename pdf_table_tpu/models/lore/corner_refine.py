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
    bug; its inputs are ~100 KB so host math is effectively free).

    Works on the threshold-compressed (cell, corner) pair list per batch
    item instead of the dense (B, K, M, 4, 4, 2) broadcast — at the wtw
    defaults (K=300, M=600) the dense form allocated ~184 MB of
    temporaries and cost ~2.8 s per 8-crop sub-batch on the bench host;
    the sparse form is bounded by the AABB-intersecting pairs actually
    above threshold."""
    import numpy as np

    B, K, _ = dets.shape
    bb0 = dets.reshape(B, K, 4, 2)
    gb0 = gboxes.reshape(B, -1, 4, 2)
    INF = np.float32(1e30)
    refined = bb0.astype(np.float32).copy()
    new_scores = scores.astype(np.float32).copy()

    for b in range(B):
        ks = np.flatnonzero(scores[b] >= vis_thresh)
        if not len(ks):
            continue
        counts_k = np.zeros(len(ks), np.int64)
        ms = np.flatnonzero(gscores[b] >= vis_thresh_corner)
        pk = pm = np.zeros(0, np.int64)
        if len(ms):
            bb = bb0[b, ks]                         # (K', 4, 2)
            gb = gb0[b, ms]                         # (M', 4, 2)
            cc = gcenters[b, ms]                    # (M', 2)
            bmin, bmax = bb.min(1), bb.max(1)
            gmin, gmax = gb.min(1), gb.max(1)
            aabb = np.all((bmin[:, None] <= gmax[None]) &
                          (gmin[None] <= bmax[:, None]), axis=-1)
            pk, pm = np.nonzero(aabb)               # pairs, m ascending
        if len(pk):
            # any group-box vertex strictly inside the cell quad, per pair
            v0 = bb[pk]                             # (P, 4, 2)
            e = np.roll(bb, -1, axis=1)[pk] - v0    # (P, 4edges, 2)
            r = gb[pm][:, :, None] - v0[:, None]    # (P, 4gv, 4edges, 2)
            cross = (e[:, None, :, 0] * r[..., 1]
                     - e[:, None, :, 1] * r[..., 0])
            pin = np.any(np.all(cross > 0, axis=-1)
                         | np.all(cross < 0, axis=-1), axis=-1)  # (P,)
            pk, pm = pk[pin], pm[pin]
        if len(pk):
            # nearest cell vertex per surviving pair + distance to the
            # ORIGINAL vertex
            d4 = np.sum((bb[pk] - cc[pm][:, None]) ** 2, axis=-1)  # (P, 4)
            v_idx = d4.argmin(-1)
            d_star = d4.min(-1).astype(np.float32)
            # per (cell, vertex) segment, corners in ascending m
            # (= descending corner score, the reference's iteration
            # order): an event is d <= running min of earlier corners; the
            # final position is the min-distance corner, later index
            # winning ties
            g = pk * 4 + v_idx
            order = np.lexsort((np.arange(len(g)), g))  # m order kept
            gs_, ds_, ms_ = g[order], d_star[order], pm[order]
            P = len(gs_)
            starts = np.r_[True, gs_[1:] != gs_[:-1]]
            seg_start_idx = np.flatnonzero(starts)
            seg_id = np.cumsum(starts) - 1
            # segmented INCLUSIVE prefix-min (Hillis-Steele doubling:
            # log2(max segment length) passes, exact float compares — no
            # offset tricks), then shift by one for the "earlier corners"
            # running min
            run = ds_.copy()
            max_len = int(np.diff(np.r_[seg_start_idx, P]).max())
            shift = 1
            while shift < max_len:
                same = seg_id[shift:] == seg_id[:-shift]
                cand = np.where(same, run[:-shift], INF)
                run[shift:] = np.minimum(run[shift:], cand)
                shift *= 2
            prev = np.r_[INF, run[:-1]]
            prev[seg_start_idx] = INF               # first corner accepts
            events = ds_ <= prev
            counts_k += np.bincount(gs_[events] // 4, minlength=len(ks))
            # final vertex: min-distance corner, later index winning ties
            dmin_seg = np.minimum.reduceat(ds_, seg_start_idx)
            at_min = ds_ == dmin_seg[seg_id]
            last = np.maximum.reduceat(
                np.where(at_min, np.arange(P), -1), seg_start_idx)
            head = gs_[seg_start_idx]
            refined[b, ks[head // 4], head % 4] = cc[ms_[last]]
        drop = counts_k <= 2
        new_scores[b, ks[drop]] = scores[b, ks[drop]] * 0.4
    return refined.reshape(B, K, 8), new_scores
