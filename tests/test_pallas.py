"""Fused-decode kernel tests.

The hand-derived MLP VJP is checked against autodiff on CPU (exact).  The
Pallas kernel itself only runs on real TPU hardware; its equivalence test
is skipped on CPU (covered by the TPU-side validation run + bench)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nice_slam_tpu.models.decoders import init_model, nice_model_spec
from nice_slam_tpu.ops.pallas import fused_decode as fd


@pytest.fixture(scope="module")
def setup():
    params = init_model(jax.random.PRNGKey(0), nice_model_spec())
    ws = list(fd.pack_nice_weights(params))
    return params, ws


class TestMlpMath:
    def test_forward_matches_apply_mlp(self, setup):
        """fd._mlp_forward must equal the production decoder math given the
        same weights and pre-gathered features."""
        from nice_slam_tpu.models.decoders import apply_mlp
        from nice_slam_tpu.state import make_map_state

        state = make_map_state(
            jax.random.PRNGKey(0), nice_model_spec(),
            [[-2.0, 2.0]] * 3,
            {"coarse": 2.0, "middle": 0.32, "fine": 0.16, "color": 0.16},
            0.32)
        ws = list(fd.pack_nice_weights(state.params))
        p = jax.random.uniform(jax.random.PRNGKey(1), (40, 3),
                               minval=-1.5, maxval=1.5)
        expected = apply_mlp(state.params["middle"],
                             nice_model_spec().decoder_specs()["middle"],
                             p, state.grids, state.bound)
        from nice_slam_tpu.ops.grid import normalize_coords, trilinear_interp
        c = trilinear_interp(state.grids["middle"],
                             normalize_coords(p, state.bound))
        B, W, b, V, a, Wo, bo = fd._unpack(ws, 0)
        got = fd._mlp_forward(p, c, B, W, b, V, a, Wo, bo)[:, 0]
        # hidden-layer matmuls use default (fast) precision in the kernel
        # vs "highest" in the production decoder -> small drift
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=5e-3)

    def test_backward_matches_autodiff(self, setup):
        params, ws = setup
        N = 23
        p = jax.random.uniform(jax.random.PRNGKey(1), (N, 3),
                               minval=-2, maxval=2)
        c = jax.random.normal(jax.random.PRNGKey(2), (N, 64)) * 0.1
        B, W, b, V, a, Wo, bo = fd._unpack(ws, 1)
        dout = jax.random.normal(jax.random.PRNGKey(3), (N, 1))

        def f(p, c, *flat):
            W_ = list(flat[0:5])
            b_ = list(flat[5:10])
            V_ = list(flat[10:15])
            a_ = list(flat[15:20])
            return jnp.sum(
                fd._mlp_forward(p, c, flat[20], W_, b_, V_, a_, flat[21],
                                flat[22]) * dout)

        flat = (*W, *b, *V, *a, B, Wo, bo)
        g_auto = jax.grad(f, argnums=tuple(range(2 + len(flat))))(p, c, *flat)
        dp, dc, wg = fd._mlp_backward(dout, p, c, B, W, b, V, a, Wo, bo)
        manual = [dp, dc, *wg[1:6], *wg[6:11], *wg[11:16], *wg[16:21],
                  wg[0], wg[21], wg[22]]
        for m, au in zip(manual, g_auto):
            # both paths use default-precision matmuls; accumulation-order
            # noise scales with the values
            np.testing.assert_allclose(np.asarray(m),
                                       np.asarray(au).reshape(m.shape),
                                       rtol=5e-3, atol=5e-3)

    def test_reference_decode_color_occ_semantics(self, setup):
        params, ws = setup
        N = 9
        p = jax.random.uniform(jax.random.PRNGKey(4), (N, 3))
        f = jax.random.normal(jax.random.PRNGKey(5), (3, N, 32)) * 0.1
        full = fd.reference_nice_decode(True, p, f[0], f[1], f[2], *ws)
        fine = fd.reference_nice_decode(False, p, f[0], f[1], f[2], *ws)
        # occupancy identical whether or not color head runs
        np.testing.assert_allclose(np.asarray(full[:, 3]),
                                   np.asarray(fine[:, 3]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(fine[:, :3]), 0.0)

    def test_fused_wiring_matches_model_apply(self):
        """The _fused_apply gather + packed-weight decode must equal the
        standard jnp model_apply for both stages it serves (validated here
        via reference_nice_decode, which the TPU kernel is tested against)."""
        from nice_slam_tpu.models.decoders import model_apply, nice_model_spec
        from nice_slam_tpu.ops.grid import normalize_coords, trilinear_interp
        from nice_slam_tpu.state import make_map_state

        mspec = nice_model_spec()
        state = make_map_state(
            jax.random.PRNGKey(3), mspec, [[-2.0, 2.0]] * 3,
            {"coarse": 2.0, "middle": 0.32, "fine": 0.16, "color": 0.16},
            0.32)
        ws = list(fd.pack_nice_weights(state.params))
        p = jax.random.uniform(jax.random.PRNGKey(7), (50, 3),
                               minval=-1.5, maxval=1.5)
        p_nor = normalize_coords(p, state.bound)
        c_mid = trilinear_interp(state.grids["middle"], p_nor)
        c_fine = trilinear_interp(state.grids["fine"], p_nor)
        c_color = trilinear_interp(state.grids["color"], p_nor)
        for stage, with_color in (("fine", False), ("color", True)):
            want = model_apply(state.params, mspec, state.grids, state.bound,
                               p, stage, fused=False)
            got = fd.reference_nice_decode(with_color, p, c_mid, c_fine,
                                           c_color, *ws)
            np.testing.assert_allclose(np.asarray(got[:, 3]),
                                       np.asarray(want[:, 3]), atol=5e-3)
            if with_color:
                np.testing.assert_allclose(np.asarray(got[:, :3]),
                                           np.asarray(want[:, :3]), atol=5e-3)

    def test_pack_shapes(self, setup):
        params, ws = setup
        assert len(ws) == 3 * fd.N_PER_DEC
        B, W, b, V, a, Wo, bo = fd._unpack(ws, 1)
        assert W[3].shape == (125, 32)   # skip-concat layer
        assert V[0].shape == (64, 32)    # fine consumes own+middle feats
        assert Wo.shape == (32, 1)
        B, W, b, V, a, Wo, bo = fd._unpack(ws, 2)
        assert Wo.shape == (32, 4)       # color head


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Pallas kernel needs TPU hardware")
class TestKernelOnTpu:
    def test_fwd_matches_reference(self, setup):
        params, ws = setup
        N = 700
        p = jax.random.uniform(jax.random.PRNGKey(1), (N, 3),
                               minval=-2, maxval=2)
        f = jax.random.normal(jax.random.PRNGKey(2), (3, N, 32)) * 0.1
        out = fd.fused_nice_decode(True, True, p, f[0], f[1], f[2], *ws)
        ref = fd.reference_nice_decode(True, p, f[0], f[1], f[2], *ws)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-3)

    def test_bwd_matches_autodiff_of_reference(self, setup):
        """The backward kernel (hand-derived VJP + cross-tile weight-grad
        accumulation) must match autodiff of the jnp reference."""
        params, ws = setup
        N = 700
        p = jax.random.uniform(jax.random.PRNGKey(3), (N, 3),
                               minval=-2, maxval=2)
        f = jax.random.normal(jax.random.PRNGKey(4), (3, N, 32)) * 0.1
        cot = jax.random.normal(jax.random.PRNGKey(5), (N, 4))

        def loss_fused(p_, cm, cf, cc, *w):
            return jnp.sum(
                fd.fused_nice_decode(True, True, p_, cm, cf, cc, *w) * cot)

        def loss_ref(p_, cm, cf, cc, *w):
            return jnp.sum(
                fd.reference_nice_decode(True, p_, cm, cf, cc, *w) * cot)

        nargs = 4 + len(ws)
        g_fused = jax.grad(loss_fused, argnums=tuple(range(nargs)))(
            p, f[0], f[1], f[2], *ws)
        g_ref = jax.grad(loss_ref, argnums=tuple(range(nargs)))(
            p, f[0], f[1], f[2], *ws)
        # the backward kernel RECOMPUTES activations at kernel (MXU)
        # precision; near-zero pre-activations can flip their ReLU mask vs
        # the reference forward, perturbing individual elements.  The
        # meaningful contract for an SGD gradient is direction + scale:
        # require near-perfect cosine similarity and matched norms.
        for i, (a, b) in enumerate(zip(g_fused, g_ref)):
            a = np.asarray(a).ravel().astype(np.float64)
            b = np.asarray(b).ravel().astype(np.float64)
            nb = np.linalg.norm(b)
            if nb < 1e-6:
                assert np.linalg.norm(a) < 1e-4, i
                continue
            cos = float(a @ b / (np.linalg.norm(a) * nb + 1e-30))
            assert cos > 0.999, (i, cos)
            assert abs(np.linalg.norm(a) / nb - 1.0) < 0.02, i
