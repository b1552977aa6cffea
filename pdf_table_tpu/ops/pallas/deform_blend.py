"""Pallas TPU kernel: fused bilinear-blend + im2col-matmul for DCNv2.

This is the deformable conv's hot back half (SURVEY.md §2.9 mandates a
fused Pallas kernel for the DCN hot path; the reference fuses the same
stages in CUDA — model/lore/DCNv2_latest/src/cuda/dcn_v2_im2col_cuda.cu
builds the modulated im2col buffer that cuBLAS then contracts).

Division of labor on TPU (measured on v5e, see docs/performance.md):
* the 4-corner row gather itself stays in XLA — `take_along_axis` is
  row-rate-bound (~67M rows/s) and Mosaic has no per-element HBM gather
  to beat it with;
* everything AFTER the gather — corner lerp weights × gathered corners,
  the implicit im2col reshape, and the (N, K·4C) x (K·4C, Cout)
  contraction — fuses HERE into one VMEM-resident kernel.

Weight expansion rides the MXU (round 5): the per-corner lerp weights
w4 (Np, K·4) used to be `jnp.repeat`-ed across the Cin channels on the
host-XLA side into a (Np, K·4·C) bf16 tensor — at the hot LORE shape
that is a ~680 MB HBM temp written + read per DCN call, and the round-5
device trace showed its repeat/copy/reshape chain costing more than the
gather itself. The kernel now takes the COMPACT w4 plus a constant 0/1
expansion matrix E = repeat(eye(K·4), C, axis=1) and expands in VMEM
with one tiny matmul (w4_tile @ E): bit-exact to the repeat (E is 0/1),
no giant temp, and the kernel's own VMEM need DROPS (the w4e row tile
is replaced by a (rows, 128) tile + the resident E block).

Layout contract (lane-aligned, checked/padded by the wrapper):
  g2:   (Np, K*4*C)  bf16 — gathered corner rows, corner-major per tap
                            (the natural reshape of the quad-gather).
  w4:   (Np, K4P)    bf16 — lerp weight x mask per tap-corner, zero-
                            padded from K*4 to K4P = 128-multiple.
  exp:  (K4P, K*4*C) bf16 — constant 0/1 expansion (row j -> channels
                            j*C..(j+1)*C; padding rows all-zero).
  wrep: (K*4*C, Co)  bf16 — conv weights replicated over the 4 corners.
  out:  (Np, Co)     f32 accumulation.

out = ((w4 @ exp) * g2) @ wrep, i.e. sum_k sum_corner w4[p,k,q] *
X[corner] @ Wk — corner reduction and channel expansion both ride the
MXU contraction for free.

The custom VJP recomputes the product terms with plain XLA einsums (the
backward is bandwidth-bound either way and keeps training parity with
jax autodiff of the unfused form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_ROWS = 256


def _kernel(g_ref, w_ref, e_ref, wm_ref, out_ref):
    # channel expansion: (rows, K4P) @ (K4P, kc) — exact, E is 0/1
    w4e = jnp.dot(w_ref[:], e_ref[:],
                  preferred_element_type=jnp.float32).astype(g_ref.dtype)
    out_ref[:] = jnp.dot(g_ref[:] * w4e, wm_ref[:],
                         preferred_element_type=jnp.float32)


def _pad_k4(w4: jax.Array):
    k4 = w4.shape[1]
    k4p = -(-k4 // 128) * 128
    if k4p != k4:
        w4 = jnp.pad(w4, ((0, 0), (0, k4p - k4)))
    return w4, k4p


def expand_matrix(k4: int, cin: int, dtype=jnp.bfloat16) -> jax.Array:
    """Constant 0/1 channel-expansion matrix (K4P, k4*cin): row j is one
    on columns [j*cin, (j+1)*cin); zero rows pad K4 up to a lane
    multiple. XLA constant-folds it (k4=36, cin=64 -> 166 KB)."""
    k4p = -(-k4 // 128) * 128
    e = jnp.repeat(jnp.eye(k4, dtype=dtype), cin, axis=1)
    if k4p != k4:
        e = jnp.pad(e, ((0, k4p - k4), (0, 0)))
    return e


def _blend_matmul_fwd_impl(g2: jax.Array, w4: jax.Array, exp: jax.Array,
                           wrep: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    np_, kc = g2.shape
    co = wrep.shape[1]
    w4, k4p = _pad_k4(w4)
    assert exp.shape == (k4p, kc), (exp.shape, k4p, kc)
    grid = (np_ // TILE_ROWS,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((np_, co), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_ROWS, kc), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_ROWS, k4p), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k4p, kc), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kc, co), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_ROWS, co), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(g2, w4, exp, wrep)


@jax.custom_vjp
def blend_matmul(g2: jax.Array, w4: jax.Array, exp: jax.Array,
                 wrep: jax.Array) -> jax.Array:
    """((w4 @ exp) * g2) @ wrep with f32 accumulation, fused in VMEM."""
    return _blend_matmul_fwd_impl(g2, w4, exp, wrep)


def _fwd(g2, w4, exp, wrep):
    return blend_matmul(g2, w4, exp, wrep), (g2, w4, exp, wrep)


def _bwd(res, dout):
    g2, w4, exp, wrep = res
    dout = dout.astype(jnp.float32)
    w4p, _ = _pad_k4(w4)
    w4e = jnp.dot(w4p.astype(jnp.float32), exp.astype(jnp.float32))
    dgm = jnp.dot(dout, wrep.astype(jnp.float32).T)      # (Np, K4C)
    dg2 = (dgm * w4e).astype(g2.dtype)
    dw4e = dgm * g2.astype(jnp.float32)
    dw4 = jnp.dot(dw4e, exp.astype(jnp.float32).T)[:, :w4.shape[1]] \
        .astype(w4.dtype)
    gm = g2.astype(jnp.float32) * w4e
    dwrep = jnp.dot(gm.T, dout).astype(wrep.dtype)
    return dg2, dw4, jnp.zeros_like(exp), dwrep


blend_matmul.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# tap-major kernel (round 5): grid (B, row-tiles, K) with the tap as the
# INNER accumulation dimension. The gather emits rows ordered
# (batch, tap, pixel), which the kernel consumes AS-IS — the flat-kc
# kernel above forces XLA to physically retile the (Np*K, 4C) gather
# output into (Np, K*4C) at the custom-call boundary (~680 MB per
# stride-4 LORE DCN call, visible as 'reshape' time in the round-5
# device trace). Per grid step: out_tile += ((w4_tile @ E4) * g_tile)
# @ W[tap]; the (tile, 4C) x (4C, Co) dot keeps a >=128-deep MXU
# contraction, and per-step VMEM is ~4 MB even at Cin=256 — so the tap
# kernel covers ALL LORE DCN levels, not just stride 4.
# ---------------------------------------------------------------------------


def _kernel_tap(g_ref, w_ref, e_ref, wm_ref, out_ref):
    from jax.experimental import pallas as pl

    t = pl.program_id(2)
    w4e = jnp.dot(w_ref[:], e_ref[:],
                  preferred_element_type=jnp.float32).astype(g_ref.dtype)
    part = jnp.dot(g_ref[:] * w4e, wm_ref[:],
                   preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _init():
        out_ref[:] = part

    @pl.when(t != 0)
    def _acc():
        out_ref[:] = out_ref[:] + part


def row_tile(hw: int, cap: int = 512) -> int:
    """Largest multiple-of-8 divisor of hw, capped (VMEM tile height).
    Returns 0 when hw has no multiple-of-8 divisor <= cap."""
    best = 0
    for t in range(8, min(hw, cap) + 1, 8):
        if hw % t == 0:
            best = t
    return best


def expand4_matrix(cin: int, dtype=jnp.bfloat16) -> jax.Array:
    """(4, 4*cin) corner expansion: row q is one on [q*cin, (q+1)*cin)."""
    return jnp.repeat(jnp.eye(4, dtype=dtype), cin, axis=1)


def _blend_tap_fwd_impl(g: jax.Array, w4: jax.Array, e4: jax.Array,
                        wt: jax.Array, b: int, hw: int,
                        tile: int) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, c4, co = wt.shape
    nblk = hw // tile
    assert g.shape == (b * k * hw, c4), (g.shape, b, k, hw, c4)
    assert w4.shape == (b * k * hw, 4)
    assert e4.shape == (4, c4)
    grid = (b, nblk, k)
    return pl.pallas_call(
        _kernel_tap,
        out_shape=jax.ShapeDtypeStruct((b * hw, co), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, c4),
                             lambda bi, i, t, _n=nblk, _k=k:
                             ((bi * _k + t) * _n + i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 4),
                             lambda bi, i, t, _n=nblk, _k=k:
                             ((bi * _k + t) * _n + i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, c4), lambda bi, i, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, c4, co), lambda bi, i, t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, co),
                                   lambda bi, i, t, _n=nblk:
                                   (bi * _n + i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(g, w4, e4, wt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def blend_matmul_tap(g: jax.Array, w4: jax.Array, e4: jax.Array,
                     wt: jax.Array, b: int, hw: int,
                     tile: int) -> jax.Array:
    """Tap-major fused blend+matmul: rows of ``g``/``w4`` ordered
    (batch, tap, pixel); out[(bi,p), :] = sum_t ((w4 @ e4) * g)[(bi,t,p)]
    @ wt[t]. f32 accumulation in VMEM across the inner tap grid dim."""
    return _blend_tap_fwd_impl(g, w4, e4, wt, b, hw, tile)


def _tap_fwd(g, w4, e4, wt, b, hw, tile):
    return blend_matmul_tap(g, w4, e4, wt, b, hw, tile), (g, w4, e4, wt)


def _tap_bwd(b, hw, tile, res, dout):
    g, w4, e4, wt = res
    k, c4, co = wt.shape
    dout3 = dout.astype(jnp.float32).reshape(b, hw, co)
    w4e = jnp.dot(w4.astype(jnp.float32),
                  e4.astype(jnp.float32))              # (bkhw, c4)
    g3 = g.astype(jnp.float32).reshape(b, k, hw, c4)
    # dgm[(b,t,p), c] = dout[(b,p), o] wt[t, c, o]
    dgm = jnp.einsum("bpo,tco->btpc", dout3,
                     wt.astype(jnp.float32)).reshape(b * k * hw, c4)
    dg = (dgm * w4e).astype(g.dtype)
    dw4 = jnp.dot(dgm * g.astype(jnp.float32),
                  e4.astype(jnp.float32).T).astype(w4.dtype)
    gm = g3 * w4e.reshape(b, k, hw, c4)
    dwt = jnp.einsum("btpc,bpo->tco", gm, dout3).astype(wt.dtype)
    return dg, dw4, jnp.zeros_like(e4), dwt


blend_matmul_tap.defvjp(_tap_fwd, _tap_bwd)


def blend_tap_xla(g, w4, e4, wt, b, hw, tile):
    """Reference semantics of :func:`blend_matmul_tap` in plain XLA."""
    k, c4, co = wt.shape
    w4e = jnp.dot(w4.astype(jnp.float32),
                  e4.astype(jnp.float32)).astype(g.dtype)
    gm = (g.astype(jnp.float32) * w4e.astype(jnp.float32)
          ).reshape(b, k, hw, c4)
    return jnp.einsum("btpc,tco->bpo", gm, wt.astype(jnp.float32)
                      ).reshape(b * hw, co)


def _tap_vmem_fits(tile: int, c4: int, co: int) -> bool:
    need = (2 * (tile * c4 * 2)        # g tile, 2x buffered, bf16
            + 2 * (tile * 128 * 2)     # w4 tile (lane-padded)
            + 8 * c4 * 2               # e4 (sublane-padded)
            + 2 * (c4 * co * 2)        # wt[t], 2x buffered
            + tile * co * 4)           # out tile, f32, resident
    return need <= 12 * 1024 * 1024


def blend_tap_supported(b: int, hw: int, k: int, c4: int, co: int,
                        dtype) -> int:
    """Row-tile size when the tap-major kernel applies, else 0.
    PDFTABLE_PALLAS_DCN=0 disables all fused kernels;
    PDFTABLE_PALLAS_DCN_TAP=0 disables just this one (A/B)."""
    import os

    if os.environ.get("PDFTABLE_PALLAS_DCN", "auto") == "0":
        return 0
    if os.environ.get("PDFTABLE_PALLAS_DCN_TAP", "1") == "0":
        return 0
    if dtype != jnp.bfloat16 or c4 % 128 != 0 \
            or jax.default_backend() != "tpu":
        return 0
    tile = row_tile(hw)
    if tile < 128 or not _tap_vmem_fits(tile, c4, co):
        return 0
    return tile


def _vmem_fits(kc: int, co: int) -> bool:
    """Conservative VMEM estimate for one grid step: double-buffered g2
    row tiles + the compact (rows, 128) w4 tiles + the resident expand
    and wrep blocks + the f32 out tile, against a 12 MB budget (v5e has
    ~16 MB/core; leave headroom for Mosaic temporaries)."""
    need = (2 * (TILE_ROWS * kc * 2)        # g2, 2x buffered, bf16
            + 2 * (TILE_ROWS * 128 * 2)     # w4 tile (padded), 2x
            + 128 * kc * 2                  # expand, resident
            + kc * co * 2                   # wrep, resident
            + 2 * TILE_ROWS * co * 4)       # out tile, f32, 2x buffered
    return need <= 12 * 1024 * 1024


def blend_matmul_supported(np_: int, kc: int, co: int,
                           dtype) -> bool:
    """Whether deform_conv2d routes its back half through the fused
    kernel; callers fall back to the XLA form otherwise.

    Hardware A/B (v5e, 2026-08-18, recorded in docs/performance.md):
    the kernel wins at the stride-4 LORE shapes (Cin=64, kc=2304:
    121.9->108.9 ms at 8x256^2, 75.0->62.3 ms at 8x192^2), ties within
    noise at Cin=128 (kc=4608), and VMEM-OOMs at Cin>=256. Default is
    therefore AUTO = the measured win region (kc <= 2304);
    PDFTABLE_PALLAS_DCN=1 forces it on wherever the tiles fit,
    PDFTABLE_PALLAS_DCN=0 forces the XLA form everywhere.
    (The round-5 compact-w4 kernel lowers both the kernel's VMEM need
    and the XLA-side prep cost; the auto region is re-validated by the
    bench's dcn_pallas_ab tail every run.)"""
    import os

    mode = os.environ.get("PDFTABLE_PALLAS_DCN", "auto")
    if mode == "0":
        return False
    ok = (dtype == jnp.bfloat16 and np_ % TILE_ROWS == 0
          and kc % 128 == 0 and co >= 1 and _vmem_fits(kc, co)
          and jax.default_backend() == "tpu")
    if mode == "1":
        return ok
    return ok and kc <= 2304


@functools.partial(jax.jit, static_argnames=())
def blend_matmul_xla(g2: jax.Array, w4: jax.Array, exp: jax.Array,
                     wrep: jax.Array) -> jax.Array:
    """Reference semantics of :func:`blend_matmul` in plain XLA (used by
    the CPU tests and as the structural fallback)."""
    w4p, _ = _pad_k4(w4)
    w4e = jnp.dot(w4p.astype(jnp.float32),
                  exp.astype(jnp.float32)).astype(g2.dtype)
    gm = (g2.astype(jnp.float32) * w4e.astype(jnp.float32)).astype(g2.dtype)
    return jnp.dot(gm, wrep, preferred_element_type=jnp.float32)
