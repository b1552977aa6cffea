"""Fused Pallas blend+matmul for DCNv2 (ops/pallas/deform_blend.py):
interpret-mode parity with the XLA reference form, and VJP correctness
(training path). The on-TPU timing lives in docs/performance.md."""

import jax
import jax.numpy as jnp
import numpy as np

from pdf_table_tpu.ops.pallas import deform_blend as db


def _mk(np_=512, k=9, c=64, co=64, seed=0):
    rng = np.random.default_rng(seed)
    kc = k * 4 * c
    g2 = jnp.asarray(rng.standard_normal((np_, kc)), jnp.bfloat16)
    w4 = jnp.asarray(rng.random((np_, k * 4)), jnp.bfloat16)
    exp = db.expand_matrix(k * 4, c)
    wrep = jnp.asarray(rng.standard_normal((kc, co)) * 0.1, jnp.bfloat16)
    return g2, w4, exp, wrep


def _repeat_ref(g2, w4, c, wrep):
    """Round-4 semantics: explicit jnp.repeat of w4 across channels."""
    w4e = jnp.repeat(w4, c, axis=-1).astype(g2.dtype)
    gm = (g2.astype(jnp.float32) * w4e.astype(jnp.float32)
          ).astype(g2.dtype)
    return jnp.dot(gm, wrep, preferred_element_type=jnp.float32)


class TestDeformBlend:
    def test_expand_matrix_equals_repeat(self):
        # the in-kernel 0/1 matmul expansion must be BIT-exact vs repeat
        k4, c = 36, 64
        rng = np.random.default_rng(7)
        w4 = jnp.asarray(rng.random((16, k4)), jnp.bfloat16)
        e = db.expand_matrix(k4, c)
        w4p, _ = db._pad_k4(w4)
        got = np.asarray(jnp.dot(w4p.astype(jnp.float32),
                                 e.astype(jnp.float32)))
        want = np.asarray(jnp.repeat(w4, c, axis=-1), np.float32)
        np.testing.assert_array_equal(got, want)

    def test_xla_twin_matches_repeat_form(self):
        g2, w4, exp, wrep = _mk()
        got = np.asarray(db.blend_matmul_xla(g2, w4, exp, wrep))
        want = np.asarray(_repeat_ref(g2, w4, 64, wrep))
        np.testing.assert_array_equal(got, want)

    def test_interpret_matches_xla(self, monkeypatch):
        g2, w4, exp, wrep = _mk()
        want = np.asarray(db.blend_matmul_xla(g2, w4, exp, wrep))

        import jax.experimental.pallas as pl

        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(pl, "pallas_call", interp)
        got = np.asarray(db._blend_matmul_fwd_impl(g2, w4, exp, wrep))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_vjp_matches_xla_grads(self):
        # the custom VJP must equal autodiff of the unfused XLA form
        g2, w4, exp, wrep = _mk(np_=256, k=2, c=64, co=32)
        g2f = g2.astype(jnp.float32)
        w4f = w4.astype(jnp.float32)
        wrf = wrep.astype(jnp.float32)

        def loss_xla(g, w, wm):
            return jnp.sum(db.blend_matmul_xla(
                g.astype(jnp.bfloat16), w.astype(jnp.bfloat16), exp,
                wm.astype(jnp.bfloat16)) ** 2)

        want = jax.grad(loss_xla, argnums=(0, 1, 2))(g2f, w4f, wrf)
        got = db._bwd(
            (g2, w4, exp, wrep),
            2.0 * db.blend_matmul_xla(g2, w4, exp, wrep))
        got = (got[0], got[1], got[3])
        for a, b in zip(got, want):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            # both sides are bf16-rounded estimates of the same gradient;
            # compare relative to the gradient's scale
            np.testing.assert_allclose(a, b, rtol=5e-2,
                                       atol=2e-2 * float(np.abs(b).max()))

    def test_grad_through_kernel_interpret(self, monkeypatch):
        """jax.grad through blend_matmul itself (custom_vjp wiring) with
        the forward in interpret mode — the path a TPU train step takes."""
        import jax.experimental.pallas as pl

        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(pl, "pallas_call", interp)
        g2, w4, exp, wrep = _mk(np_=256, k=2, c=64, co=32, seed=1)

        def loss(g, w, wm):
            return jnp.sum(db.blend_matmul(g, w, exp, wm) ** 2)

        got = jax.grad(loss, argnums=(0, 1, 2))(g2, w4, wrep)

        def loss_ref(g, w, wm):
            return jnp.sum(db.blend_matmul_xla(g, w, exp, wm) ** 2)

        want = jax.grad(loss_ref, argnums=(0, 1, 2))(g2, w4, wrep)
        for a, b in zip(got, want):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            np.testing.assert_allclose(
                a, b, rtol=5e-2, atol=2e-2 * float(np.abs(b).max() + 1e-6))

    def test_integration_packing_matches_unfused(self, monkeypatch):
        """Route the deform_conv2d pallas branch through the XLA twin on
        CPU: validates the g2 / w4e / wrep packing (tap + corner + channel
        order) independently of TPU hardware."""
        import pdf_table_tpu.ops.deform_conv as dc
        from pdf_table_tpu.ops.pallas import deform_blend as dbm

        rng = np.random.default_rng(3)
        B, H, W, C, Co = 2, 16, 8, 32, 16  # Np=256 rows, K*4C=1152 (%128)
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        off = jnp.asarray(rng.standard_normal((B, H, W, 18)) * 1.5,
                          jnp.float32)
        mask = jnp.asarray(rng.random((B, H, W, 9)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.1,
                          jnp.float32)
        want = np.asarray(dc.deform_conv2d(x, off, mask, wgt))

        monkeypatch.setattr(dbm, "blend_matmul_supported",
                            lambda *a, **k: True)
        monkeypatch.setattr(dbm, "blend_matmul", dbm.blend_matmul_xla)
        dc.deform_conv2d.clear_cache()
        got = np.asarray(dc.deform_conv2d(x, off, mask, wgt))
        dc.deform_conv2d.clear_cache()
        scale = float(np.abs(want).max()) + 1e-6
        # bf16 blend vs f32 blend: small quantization delta only
        assert float(np.abs(got - want).max()) / scale < 2e-2
        assert got.shape == want.shape

    def test_supported_gate(self):
        assert not db.blend_matmul_supported(255, 2304, 64, jnp.bfloat16)
        assert not db.blend_matmul_supported(512, 100, 64, jnp.bfloat16)
        assert not db.blend_matmul_supported(512, 2304, 64, jnp.float32)
        # TPU-only gate: on the CPU test backend it must refuse
        assert not db.blend_matmul_supported(512, 2304, 64, jnp.bfloat16) \
            or jax.default_backend() == "tpu"


def _mk_tap(b=2, hw=512, k=9, c=32, co=64, seed=0):
    rng = np.random.default_rng(seed)
    c4 = 4 * c
    g = jnp.asarray(rng.standard_normal((b * k * hw, c4)), jnp.bfloat16)
    w4 = jnp.asarray(rng.random((b * k * hw, 4)), jnp.bfloat16)
    e4 = db.expand4_matrix(c)
    wt = jnp.asarray(rng.standard_normal((k, c4, co)) * 0.1,
                     jnp.bfloat16)
    return g, w4, e4, wt


class TestBlendTap:
    def test_row_tile(self):
        assert db.row_tile(9216) == 512
        assert db.row_tile(2304) == 384
        assert db.row_tile(576) == 288
        assert db.row_tile(7) == 0

    def test_interpret_matches_xla(self, monkeypatch):
        b, hw, k, c, co = 2, 512, 9, 32, 64
        g, w4, e4, wt = _mk_tap(b, hw, k, c, co)
        want = np.asarray(db.blend_tap_xla(g, w4, e4, wt, b, hw, 256))

        import jax.experimental.pallas as pl

        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(pl, "pallas_call", interp)
        got = np.asarray(db._blend_tap_fwd_impl(g, w4, e4, wt, b, hw, 256))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_tap_xla_matches_flat_kernel_semantics(self):
        # tap-major reference == the flat-kc reference on re-ordered rows
        b, hw, k, c, co = 1, 256, 2, 32, 16
        g, w4, e4, wt = _mk_tap(b, hw, k, c, co, seed=3)
        got = np.asarray(db.blend_tap_xla(g, w4, e4, wt, b, hw, 256))
        # flat form: rows (p, t*4C); build from tap-major (t, p, 4C)
        c4 = 4 * c
        g_f = np.asarray(g, np.float32).reshape(k, hw, c4) \
            .transpose(1, 0, 2).reshape(hw, k * c4)
        w4e = np.asarray(jnp.dot(w4.astype(jnp.float32),
                                 e4.astype(jnp.float32))) \
            .reshape(k, hw, c4).transpose(1, 0, 2).reshape(hw, k * c4)
        wrep = np.asarray(wt, np.float32).reshape(k * c4, co)
        want = (np.float32(g_f) * w4e) @ wrep
        np.testing.assert_allclose(got, want, rtol=2e-2,
                                   atol=2e-2 * np.abs(want).max())

    def test_vjp_matches_xla_grads(self):
        b, hw, k, c, co = 1, 256, 2, 32, 16
        g, w4, e4, wt = _mk_tap(b, hw, k, c, co, seed=1)

        def loss_xla(gg, ww, wm):
            return jnp.sum(db.blend_tap_xla(gg, ww, e4, wm,
                                            b, hw, 256) ** 2)

        want = jax.grad(loss_xla, argnums=(0, 1, 2))(
            g.astype(jnp.float32), w4.astype(jnp.float32),
            wt.astype(jnp.float32))
        dout = 2.0 * db.blend_tap_xla(g, w4, e4, wt, b, hw, 256)
        got = db._tap_bwd(b, hw, 256, (g, w4, e4, wt), dout)
        got = (got[0], got[1], got[3])
        for a, bb in zip(got, want):
            a = np.asarray(a, np.float32)
            bb = np.asarray(bb, np.float32)
            np.testing.assert_allclose(
                a, bb, rtol=5e-2, atol=2e-2 * float(np.abs(bb).max() + 1e-6))

    def test_integration_packing_matches_unfused(self, monkeypatch):
        """Route deform_conv2d through the tap branch with the XLA twin
        on CPU: validates the tap-major packing (base/w4 transposes,
        corner-broadcast weights) independently of TPU hardware."""
        import pdf_table_tpu.ops.deform_conv as dc
        from pdf_table_tpu.ops.pallas import deform_blend as dbm

        rng = np.random.default_rng(5)
        B, H, W, C, Co = 2, 16, 16, 32, 16   # hw=256, 4C=128 (%128)
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        off = jnp.asarray(rng.standard_normal((B, H, W, 18)) * 1.5,
                          jnp.float32)
        mask = jnp.asarray(rng.random((B, H, W, 9)), jnp.float32)
        wgt = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.1,
                          jnp.float32)
        want = np.asarray(dc.deform_conv2d(x, off, mask, wgt))

        monkeypatch.setattr(dbm, "blend_tap_supported",
                            lambda *a, **k: 256)
        monkeypatch.setattr(dbm, "blend_matmul_tap",
                            lambda *a: db.blend_tap_xla(*a))
        dc.deform_conv2d.clear_cache()
        got = np.asarray(dc.deform_conv2d(x, off, mask, wgt))
        dc.deform_conv2d.clear_cache()
        scale = float(np.abs(want).max()) + 1e-6
        assert float(np.abs(got - want).max()) / scale < 2e-2
        assert got.shape == want.shape
