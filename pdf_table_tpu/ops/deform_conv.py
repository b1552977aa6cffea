"""Modulated deformable convolution v2 for TPU.

Replaces the reference's CUDA extension (model/lore/DCNv2_latest/src/cuda/
dcn_v2_im2col_cuda.cu:1-397; python op model/lore/dcnv2.py:25 over
torchvision deform_conv2d). TPU-first design: rather than translating the
im2col CUDA kernel, sampling is expressed as per-tap batched gathers +
bilinear blend (VPU work) and the contraction as one MXU matmul
(B*H*W, Cin) x (Cin, Cout) per kernel tap, accumulated in f32. The per-tap
loop keeps peak HLO-temp memory K x below a one-shot im2col (which OOMs a
16 GB chip at LORE's shapes for batch >= 4). Gradients come for free
through gather/matmul autodiff (training parity with the reference's
backward kernels).

Pallas-kernel division of labor (A/B'd on v5e, 2026-08-18 — the table
lives in docs/performance.md): the 4-corner row gather stays in XLA
(Mosaic has no per-element 2D gather: jnp.take_along_axis fails to
lower; one-hot matmul blows VMEM; per-row dynamic slices can't express
per-position sample coordinates), while the post-gather back half —
corner blend x modulation, implicit im2col, and the output contraction
— runs in the fused Pallas kernel ops/pallas/deform_blend.py whenever
`blend_matmul_supported` says the shape is in the measured win region
(bf16, kc<=2304: the stride-4 LORE shapes, 11-17% faster end-to-end).
The C++ oracle (ops/native/deform_conv_cpu.cc) pins the numerics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("stride", "padding", "dilation"))
def deform_conv2d(x: jax.Array, offset: jax.Array, mask: jax.Array,
                  weight: jax.Array, bias=None,
                  stride: Tuple[int, int] = (1, 1),
                  padding: Tuple[int, int] = (1, 1),
                  dilation: Tuple[int, int] = (1, 1)) -> jax.Array:
    """Modulated deformable conv (DCNv2), channels-last.

    x:      (B, H, W, Cin)
    offset: (B, Ho, Wo, 2*Kh*Kw)  — (dy, dx) pairs per kernel tap, matching
            the reference layout (y first).
    mask:   (B, Ho, Wo, Kh*Kw)    — post-sigmoid modulation.
    weight: (Kh, Kw, Cin, Cout)
    Returns (B, Ho, Wo, Cout) float32.
    """
    B, H, W, Cin = x.shape
    Kh, Kw, _, Cout = weight.shape
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    Ho = (H + 2 * ph - dh * (Kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (Kw - 1) - 1) // sw + 1
    K = Kh * Kw

    # base sampling grid: p0 + pk
    oy = jnp.arange(Ho, dtype=jnp.float32) * sh - ph
    ox = jnp.arange(Wo, dtype=jnp.float32) * sw - pw
    ky = jnp.arange(Kh, dtype=jnp.float32) * dh
    kx = jnp.arange(Kw, dtype=jnp.float32) * dw
    base_y = oy[:, None, None, None] + ky[None, None, :, None]   # (Ho,1,Kh,1)
    base_x = ox[None, :, None, None] + kx[None, None, None, :]   # (1,Wo,1,Kw)
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, Kh, Kw)).reshape(Ho, Wo, K)
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, Kh, Kw)).reshape(Ho, Wo, K)

    off = offset.reshape(B, Ho, Wo, K, 2).astype(jnp.float32)
    sy = base_y[None] + off[..., 0]   # (B, Ho, Wo, K)
    sx = base_x[None] + off[..., 1]

    # Gather strategy (TPU): gathers are the bottleneck — they move
    # 4 corners x K taps x Cin values per output pixel and run far below
    # HBM bandwidth when rows are narrow. Three measures (each measured on
    # v5e; see git history):
    #   1. channel-stack the 2x2 pixel neighborhood so ONE gather row
    #      (4*Cin wide) fetches all four bilinear corners of a tap —
    #      2.6x faster than four separate corner gathers;
    #   2. gather in the model compute dtype (bf16 halves the bytes);
    #   3. chunk taps (TAP_CHUNK) so peak temp memory stays bounded —
    #      the one-shot all-tap im2col needed >10 GB at LORE's shapes and
    #      OOMed a 16 GB chip.
    # Out-of-bounds corners: the quad index wraps modulo H/W and each
    # corner carries its own in-bounds mask, reproducing the reference's
    # zero padding exactly (corner (y0+1, x) stays valid when (y0, x) sits
    # above the image: the wrapped row is the true row 0).
    gdt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32
    xg = x.astype(gdt)
    xq = jnp.concatenate(
        [xg,
         jnp.roll(xg, -1, axis=2),                    # (y,   x+1)
         jnp.roll(xg, -1, axis=1),                    # (y+1, x)
         jnp.roll(jnp.roll(xg, -1, axis=2), -1, axis=1)],  # (y+1, x+1)
        axis=-1).reshape(B, H * W, 4 * Cin)
    mask32 = mask.astype(jnp.float32)
    wmat = weight.astype(jnp.float32).reshape(K, Cin, Cout)

    # adaptive tap chunk: one fused gather for all taps when the gathered
    # temp stays under ~1.5 GB (fewer, larger gathers measure faster),
    # otherwise split to bound peak memory
    bytes_per_tap = B * Ho * Wo * 4 * Cin * jnp.dtype(gdt).itemsize
    tap_chunk = max(1, min(K, int(1.5e9 // max(bytes_per_tap, 1))))
    # fused Pallas back half (blend + implicit im2col + matmul in VMEM,
    # ops/pallas/deform_blend.py): the XLA form materializes the blended
    # im2col tensor in a (..., T, 4, Cin) layout whose trailing dims pad
    # 3.6x on TPU tiles. bf16-only (the production compute dtype) — the
    # f32 path below stays bit-stable for the C++ oracle parity tests.
    from .pallas.deform_blend import blend_matmul, blend_matmul_supported
    Np = B * Ho * Wo
    # (A 1KB-row "wide gather" variant — pairing adjacent-x quads into one
    # row to halve row count — was A/B'd on v5e 2026-08-18 and LOST at the
    # hot shape: 147 vs 121 ms at 8x256^2x64. The gather there is
    # byte-bound, not row-rate-bound; the variant was deleted.)

    # tap-major fast path (round 5): gather rows ordered (batch, tap,
    # pixel) feed the Pallas tap kernel AS-IS — no (Np*K, 4C) ->
    # (Np, K*4C) retile at the custom-call boundary (a ~680 MB relayout
    # per stride-4 LORE call in the round-5 device trace), and the
    # per-tap grid keeps VMEM small enough to cover EVERY LORE DCN
    # level (the flat-kc kernel below is stride-4 only).
    from .pallas.deform_blend import (blend_matmul_tap,
                                      blend_tap_supported,
                                      expand4_matrix)
    hw = Ho * Wo
    tile = blend_tap_supported(B, hw, K, 4 * Cin, Cout, gdt) \
        if bytes_per_tap * K <= 1.5e9 else 0
    if tile:
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        wy = sy - y0
        wx = sx - x0
        yi = y0.astype(jnp.int32)
        xi = x0.astype(jnp.int32)
        in_y0 = (yi >= 0) & (yi < H)
        in_y1 = (yi + 1 >= 0) & (yi + 1 < H)
        in_x0 = (xi >= 0) & (xi < W)
        in_x1 = (xi + 1 >= 0) & (xi + 1 < W)
        w4 = jnp.stack(
            [(1 - wy) * (1 - wx) * (in_y0 & in_x0),
             (1 - wy) * wx * (in_y0 & in_x1),
             wy * (1 - wx) * (in_y1 & in_x0),
             wy * wx * (in_y1 & in_x1)], axis=-1)      # (B, Ho, Wo, K, 4)
        w4 = w4 * mask32[..., None]
        base = (yi % H) * W + (xi % W)                 # (B, Ho, Wo, K)
        base_tm = base.reshape(B, hw, K).transpose(0, 2, 1) \
            .reshape(B, K * hw)
        w4_tm = w4.reshape(B, hw, K, 4).transpose(0, 2, 1, 3) \
            .reshape(B * K * hw, 4).astype(gdt)
        g = jnp.take_along_axis(xq, base_tm[:, :, None], axis=1) \
            .reshape(B * K * hw, 4 * Cin)
        wt = jnp.broadcast_to(
            wmat.reshape(K, 1, Cin, Cout),
            (K, 4, Cin, Cout)).reshape(K, 4 * Cin, Cout).astype(gdt)
        out = blend_matmul_tap(g, w4_tm, expand4_matrix(Cin, gdt), wt,
                               B, hw, tile).reshape(B, Ho, Wo, Cout)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out

    out = jnp.zeros((B * Ho * Wo, Cout), jnp.float32)
    for t0 in range(0, K, tap_chunk):
        t1 = min(t0 + tap_chunk, K)
        T = t1 - t0
        syk, sxk = sy[..., t0:t1], sx[..., t0:t1]     # (B, Ho, Wo, T)
        y0 = jnp.floor(syk)
        x0 = jnp.floor(sxk)
        wy = syk - y0
        wx = sxk - x0
        yi = y0.astype(jnp.int32)
        xi = x0.astype(jnp.int32)
        base = ((yi % H) * W + (xi % W)).reshape(B, Ho * Wo * T)
        in_y0 = (yi >= 0) & (yi < H)
        in_y1 = (yi + 1 >= 0) & (yi + 1 < H)
        in_x0 = (xi >= 0) & (xi < W)
        in_x1 = (xi + 1 >= 0) & (xi + 1 < W)
        w4 = jnp.stack(
            [(1 - wy) * (1 - wx) * (in_y0 & in_x0),
             (1 - wy) * wx * (in_y0 & in_x1),
             wy * (1 - wx) * (in_y1 & in_x0),
             wy * wx * (in_y1 & in_x1)], axis=-1)      # (B, Ho, Wo, T, 4)
        w4 = w4 * mask32[..., t0:t1, None]
        g = jnp.take_along_axis(xq, base[:, :, None], axis=1)
        if blend_matmul_supported(Np, T * 4 * Cin, Cout, gdt):
            # corner-major flat layouts, no sub-128 trailing dims anywhere:
            # g2 (Np, T*4C) is the gather output's natural reshape; w4
            # stays COMPACT (Np, T*4) — the per-channel repeat happens
            # inside the kernel via a constant 0/1 matmul (the
            # materialized (Np, T*4*Cin) w4e was a ~680 MB HBM temp at
            # the hot LORE shape whose repeat/copy chain out-cost the
            # gather — round-5 device trace, docs/performance.md); wrep
            # replicates each tap's weights over the 4 corners so the
            # corner reduction rides the MXU contraction.
            from .pallas.deform_blend import expand_matrix
            g2 = g.reshape(B, Ho * Wo, T * 4 * Cin
                           ).reshape(Np, T * 4 * Cin)
            w4s = w4.reshape(Np, T * 4).astype(gdt)
            exp = expand_matrix(T * 4, Cin, gdt)
            wrep = jnp.broadcast_to(
                wmat[t0:t1].reshape(T, 1, Cin, Cout),
                (T, 4, Cin, Cout)).reshape(T * 4 * Cin, Cout).astype(gdt)
            out = out + blend_matmul(g2, w4s, exp, wrep)
            continue
        g = g.reshape(B, Ho, Wo, T, 4, Cin)
        # ONE matmul per chunk over the (T*Cin) contraction instead of a
        # per-tap loop: T separate (N, Cin)x(Cin, Cout) dots paid T f32
        # accumulation round trips over the (N, Cout) output and ran the
        # MXU at a 64-deep contraction; fused, the contraction is T*Cin
        # deep and the output accumulates once (6.5x on the IDAUp shape
        # 8x256x256x64, v5e)
        s = (g.astype(jnp.float32) * w4[..., None]).sum(axis=-2)
        out = out + jnp.dot(
            s.reshape(B * Ho * Wo, T * Cin),
            wmat[t0:t1].reshape(T * Cin, Cout),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(B, Ho, Wo, Cout)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def deform_conv2d_reference_numpy(x, offset, mask, weight, bias=None,
                                  stride=(1, 1), padding=(1, 1), dilation=(1, 1)):
    """Slow numpy reference (mirrors the reference CPU kernel semantics,
    dcn_v2_im2col_cpu.cpp) used only for parity tests."""
    import numpy as np

    B, H, W, Cin = x.shape
    Kh, Kw, _, Cout = weight.shape
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    Ho = (H + 2 * ph - dh * (Kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (Kw - 1) - 1) // sw + 1
    K = Kh * Kw
    out = np.zeros((B, Ho, Wo, Cout), np.float64)

    def sample(b, y, x_):
        if y <= -1 or y >= H or x_ <= -1 or x_ >= W:
            return np.zeros(Cin)
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        vy, vx = y - y0, x_ - x0
        acc = np.zeros(Cin)
        for (yy, ww_y) in ((y0, 1 - vy), (y0 + 1, vy)):
            for (xx, ww_x) in ((x0, 1 - vx), (x0 + 1, vx)):
                if 0 <= yy < H and 0 <= xx < W and ww_y * ww_x > 0:
                    acc += x[b, yy, xx] * (ww_y * ww_x)
        return acc

    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                col = np.zeros((K, Cin))
                for k in range(K):
                    kh, kw = divmod(k, Kw)
                    dy = offset[b, i, j, 2 * k]
                    dx = offset[b, i, j, 2 * k + 1]
                    y = i * sh - ph + kh * dh + dy
                    x_ = j * sw - pw + kw * dw + dx
                    col[k] = sample(b, y, x_) * mask[b, i, j, k]
                out[b, i, j] = np.einsum("kc,kco->o", col,
                                         weight.reshape(K, Cin, Cout))
    if bias is not None:
        out += bias
    return out
