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
  contraction — fuses HERE into one VMEM-resident kernel. The XLA
  formulation materializes the blended im2col tensor to HBM between the
  blend and the matmul in a (…, K, 4, C) layout whose trailing dims pad
  16/9 x 128/64 = 3.6x on TPU tiles; the fused kernel never writes it.

Layout contract (all 128-lane aligned, checked by the wrapper):
  g2:   (Np, K*4*C)  bf16 — gathered corner rows, corner-major per tap
                            (the natural reshape of the quad-gather).
  w4e:  (Np, K*4*C)  bf16 — lerp weight x mask, repeated per channel.
  wrep: (K*4*C, Co)  bf16 — conv weights replicated over the 4 corners.
  out:  (Np, Co)     f32 accumulation.

out = (g2 * w4e) @ wrep, i.e. sum_k sum_corner w4[p,k,q] * X[corner] @ Wk
— the corner reduction rides the MXU contraction for free.

The custom VJP recomputes the product terms with plain XLA einsums (the
backward is bandwidth-bound either way and keeps training parity with
jax autodiff of the unfused form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_ROWS = 256


def _kernel(g_ref, w_ref, wm_ref, out_ref):
    gm = g_ref[:] * w_ref[:]
    out_ref[:] = jnp.dot(gm, wm_ref[:],
                         preferred_element_type=jnp.float32)


def _blend_matmul_fwd_impl(g2: jax.Array, w4e: jax.Array,
                           wrep: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    np_, kc = g2.shape
    co = wrep.shape[1]
    grid = (np_ // TILE_ROWS,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((np_, co), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_ROWS, kc), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_ROWS, kc), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kc, co), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_ROWS, co), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(g2, w4e, wrep)


@jax.custom_vjp
def blend_matmul(g2: jax.Array, w4e: jax.Array,
                 wrep: jax.Array) -> jax.Array:
    """(g2 * w4e) @ wrep with f32 accumulation, fused in VMEM."""
    return _blend_matmul_fwd_impl(g2, w4e, wrep)


def _fwd(g2, w4e, wrep):
    return blend_matmul(g2, w4e, wrep), (g2, w4e, wrep)


def _bwd(res, dout):
    g2, w4e, wrep = res
    dout = dout.astype(jnp.float32)
    dgm = jnp.dot(dout, wrep.astype(jnp.float32).T)      # (Np, K4C)
    dg2 = (dgm * w4e.astype(jnp.float32)).astype(g2.dtype)
    dw4e = (dgm * g2.astype(jnp.float32)).astype(w4e.dtype)
    gm = g2.astype(jnp.float32) * w4e.astype(jnp.float32)
    dwrep = jnp.dot(gm.T, dout).astype(wrep.dtype)
    return dg2, dw4e, dwrep


blend_matmul.defvjp(_fwd, _bwd)


def _vmem_fits(kc: int, co: int) -> bool:
    """Conservative VMEM estimate for one grid step: double-buffered
    (g2, w4e) row tiles + the resident wrep block + the f32 out tile,
    against a 12 MB budget (v5e has ~16 MB/core; leave headroom for
    Mosaic temporaries). kc=9216 (Cin=256) measured a hard Mosaic OOM."""
    need = (2 * (2 * TILE_ROWS * kc * 2)    # g2 + w4e, 2x buffered, bf16
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
    PDFTABLE_PALLAS_DCN=0 forces the XLA form everywhere."""
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
def blend_matmul_xla(g2: jax.Array, w4e: jax.Array,
                     wrep: jax.Array) -> jax.Array:
    """Reference semantics of :func:`blend_matmul` in plain XLA (used by
    the CPU tests and as the structural fallback)."""
    gm = (g2.astype(jnp.float32) * w4e.astype(jnp.float32)).astype(g2.dtype)
    return jnp.dot(gm, wrep, preferred_element_type=jnp.float32)
