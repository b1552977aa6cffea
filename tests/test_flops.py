"""Analytic jaxpr FLOP counter (utils/flops.py) — the MFU accounting
backend for bench.py (the axon client returns None from
Lowered.cost_analysis, so FLOPs come from the traced jaxpr)."""

import jax
import jax.numpy as jnp
import numpy as np

from pdf_table_tpu.utils.flops import fn_flops


class TestFlops:
    def test_matmul(self):
        a = jax.ShapeDtypeStruct((64, 128), jnp.float32)
        b = jax.ShapeDtypeStruct((128, 32), jnp.float32)
        assert fn_flops(lambda x, y: x @ y, a, b) == 2 * 64 * 128 * 32

    def test_batched_dot(self):
        a = jax.ShapeDtypeStruct((4, 8, 16), jnp.float32)
        b = jax.ShapeDtypeStruct((4, 16, 8), jnp.float32)
        want = 2 * 4 * 8 * 8 * 16
        assert fn_flops(jnp.matmul, a, b) == want

    def test_conv(self):
        x = jax.ShapeDtypeStruct((2, 16, 16, 8), jnp.float32)
        w = jax.ShapeDtypeStruct((3, 3, 8, 4), jnp.float32)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # 2 * out_elems * Cin * kh * kw
        want = 2 * (2 * 16 * 16 * 4) * 8 * 9
        assert fn_flops(conv, x, w) == want

    def test_grouped_conv(self):
        x = jax.ShapeDtypeStruct((1, 8, 8, 16), jnp.float32)
        w = jax.ShapeDtypeStruct((3, 3, 1, 16), jnp.float32)

        def dw(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", feature_group_count=16,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        want = 2 * (1 * 8 * 8 * 16) * 1 * 9   # Cin/groups = 1
        assert fn_flops(dw, x, w) == want

    def test_scan_multiplies_by_length(self):
        a = jax.ShapeDtypeStruct((32, 32), jnp.float32)

        def f(x):
            def step(c, _):
                return c @ x, None
            out, _ = jax.lax.scan(step, x, None, length=10)
            return out

        assert fn_flops(f, a) == 10 * 2 * 32 * 32 * 32

    def test_nested_jit_and_elementwise_free(self):
        a = jax.ShapeDtypeStruct((16, 16), jnp.float32)

        @jax.jit
        def inner(x):
            return jax.nn.relu(x @ x + 1.0)

        def outer(x):
            return inner(x) * 2.0

        assert fn_flops(outer, a) == 2 * 16 ** 3

    def test_pallas_blend_matmul(self):
        # the fused DCN back half: kernel dot x grid steps
        from pdf_table_tpu.ops.pallas import deform_blend as db

        np_, kc, co, k4 = 512, 1152, 64, 36
        g = jax.ShapeDtypeStruct((np_, kc), jnp.bfloat16)
        w = jax.ShapeDtypeStruct((np_, 128), jnp.bfloat16)  # padded k4
        e = jax.ShapeDtypeStruct((128, kc), jnp.bfloat16)
        wm = jax.ShapeDtypeStruct((kc, co), jnp.bfloat16)
        got = fn_flops(db._blend_matmul_fwd_impl, g, w, e, wm)
        # grid tiles sum back to the full dot + the in-kernel expansion
        want = 2 * np_ * kc * co + 2 * np_ * 128 * kc
        assert got == want
        del k4

    def test_tracked_program_flops(self):
        from pdf_table_tpu.utils.profiling import TrackedProgram

        fn = jax.jit(lambda x: x @ x)
        tp = TrackedProgram("t", fn)
        x = jnp.ones((8, 8), jnp.float32)
        np.testing.assert_allclose(np.asarray(tp(x)), np.full((8, 8), 8.0))
        assert tp.calls == 1
        assert tp.flops() == 2 * 8 ** 3
