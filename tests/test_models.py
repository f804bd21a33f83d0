"""Decoder model tests: shape/semantics checks plus a full equivalence test
against a torch re-implementation of the reference decoder math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nice_slam_tpu.models import (
    DecoderSpec,
    ModelSpec,
    nice_model_spec,
    imap_model_spec,
    init_model,
    init_decoder,
    apply_mlp,
    model_apply,
)
from nice_slam_tpu.state import make_map_state, pad_bound

BOUND = [[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]]
GRID_LEN = {"coarse": 2.0, "middle": 0.32, "fine": 0.16, "color": 0.16}


@pytest.fixture(scope="module")
def state():
    return make_map_state(jax.random.PRNGKey(0), nice_model_spec(),
                          BOUND, GRID_LEN, 0.32)


class TestShapes:
    def test_grid_shapes(self, state):
        # padded bound is 4.16^3 -> middle 13^3, fine 26^3, coarse (x2 bound) 4^3
        assert state.grids["middle"].shape == (13, 13, 13, 32)
        assert state.grids["fine"].shape == (26, 26, 26, 32)
        assert state.grids["color"].shape == (26, 26, 26, 32)
        assert state.grids["coarse"].shape == (4, 4, 4, 32)

    def test_fine_grid_small_init(self, state):
        assert float(jnp.std(state.grids["fine"])) < 0.001
        assert float(jnp.std(state.grids["middle"])) > 0.005

    @pytest.mark.parametrize("stage", ["coarse", "middle", "fine", "color"])
    def test_stage_output_shapes(self, state, stage):
        p = jnp.zeros((17, 3))
        raw = model_apply(state.params, nice_model_spec(), state.grids,
                          state.bound, p, stage)
        assert raw.shape == (17, 4)
        if stage != "color":
            np.testing.assert_allclose(np.asarray(raw[:, :3]), 0.0)

    def test_fine_is_middle_plus_fine(self, state):
        spec = nice_model_spec()
        p = jax.random.normal(jax.random.PRNGKey(3), (9, 3))
        mid = model_apply(state.params, spec, state.grids, state.bound, p, "middle")
        fine = model_apply(state.params, spec, state.grids, state.bound, p, "fine")
        color = model_apply(state.params, spec, state.grids, state.bound, p, "color")
        # color stage occupancy equals fine-stage occupancy
        np.testing.assert_allclose(np.asarray(color[:, 3]), np.asarray(fine[:, 3]),
                                   atol=1e-5)
        # and differs from middle alone
        assert not np.allclose(np.asarray(fine[:, 3]), np.asarray(mid[:, 3]))

    def test_imap_model(self):
        spec = imap_model_spec()
        params = init_model(jax.random.PRNGKey(1), spec)
        p = jnp.zeros((5, 3))
        raw = model_apply(params, spec, {}, jnp.asarray(BOUND, jnp.float32), p)
        assert raw.shape == (5, 4)

    def test_middle_grad_stopped_in_fine(self, state):
        spec = nice_model_spec()
        p = jnp.ones((4, 3)) * 0.3

        def loss(grids):
            raw = model_apply(state.params, spec, grids, state.bound, p, "fine")
            return jnp.sum(raw[:, 3])

        g = jax.grad(loss)(state.grids)
        # fine stage: fine grid gets grads through fine decoder; middle grid
        # gets grads ONLY through the middle decoder term (concat path stopped)
        assert float(jnp.abs(g["fine"]).sum()) > 0
        assert float(jnp.abs(g["middle"]).sum()) > 0
        assert float(jnp.abs(g["color"]).sum()) == 0


class TestPackedDecode:
    """The block-diagonal packed fine/color decode (decoders.py
    _packed_nice_apply) must match the sequential per-decoder path in
    values AND gradients (it is the default on all backends)."""

    @pytest.mark.parametrize("stage", ["fine", "color"])
    def test_packed_matches_sequential(self, state, stage, monkeypatch):
        from nice_slam_tpu.models.decoders import _packed_nice_apply

        spec = nice_model_spec(matmul_precision="highest")
        p = jax.random.uniform(jax.random.PRNGKey(7), (257, 3),
                               minval=-1.8, maxval=1.8)

        packed = _packed_nice_apply(state.params, spec, state.grids,
                                    state.bound, p, stage)
        monkeypatch.setenv("NICE_SLAM_TPU_PACKED", "0")
        seq = model_apply(state.params, spec, state.grids, state.bound, p,
                          stage)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(seq),
                                   atol=2e-5, rtol=2e-5)

    def test_packed_grads_match(self, state, monkeypatch):
        from nice_slam_tpu.models.decoders import _packed_nice_apply

        spec = nice_model_spec(matmul_precision="highest")
        p = jax.random.uniform(jax.random.PRNGKey(9), (64, 3),
                               minval=-1.5, maxval=1.5)

        def loss_packed(params, grids):
            raw = _packed_nice_apply(params, spec, grids, state.bound, p,
                                     "color")
            return jnp.sum(raw ** 2)

        def loss_seq(params, grids):
            raw = model_apply(params, spec, grids, state.bound, p, "color")
            return jnp.sum(raw ** 2)

        from jax.flatten_util import ravel_pytree

        gp = jax.grad(loss_packed, argnums=(0, 1))(state.params, state.grids)
        monkeypatch.setenv("NICE_SLAM_TPU_PACKED", "0")
        gs = jax.grad(loss_seq, argnums=(0, 1))(state.params, state.grids)
        flat_p, _ = ravel_pytree(gp)
        flat_s, _ = ravel_pytree(gs)
        np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_s),
                                   atol=3e-4, rtol=1e-3)


class TestPackedFCInterp:
    """The lane-packed fine+color interp (NICE_SLAM_TPU_PACK_FC=1, the
    TPU default for the color stage) must match the per-grid interp path
    in values and gradients up to float reassociation."""

    def test_values_and_grads_match(self, state, monkeypatch):
        spec = nice_model_spec(matmul_precision="highest")
        p = jax.random.uniform(jax.random.PRNGKey(13), (123, 3),
                               minval=-1.8, maxval=1.8)

        def loss(params, grids):
            raw = model_apply(params, spec, grids, state.bound, p, "color")
            return jnp.sum(raw ** 2)

        from jax.flatten_util import ravel_pytree

        monkeypatch.setenv("NICE_SLAM_TPU_PACK_FC", "1")
        v_pk = model_apply(state.params, spec, state.grids, state.bound, p,
                           "color")
        g_pk = jax.grad(loss, argnums=(0, 1))(state.params, state.grids)
        monkeypatch.setenv("NICE_SLAM_TPU_PACK_FC", "0")
        v_sq = model_apply(state.params, spec, state.grids, state.bound, p,
                           "color")
        g_sq = jax.grad(loss, argnums=(0, 1))(state.params, state.grids)

        np.testing.assert_allclose(np.asarray(v_pk), np.asarray(v_sq),
                                   atol=1e-5, rtol=1e-5)
        flat_p, _ = ravel_pytree(g_pk)
        flat_s, _ = ravel_pytree(g_sq)
        np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_s),
                                   atol=1e-4, rtol=1e-3)


class TestTorchEquivalence:
    """Build a torch replica of the reference MLP math, load OUR params into
    it, and check outputs match — verifying layer order, skip placement,
    feature injection, and grid sampling together."""

    def _torch_mlp(self, params, spec, p, grid_np, mid_np, bound_np):
        import torch
        import torch.nn.functional as F

        tp = torch.tensor(np.asarray(p))
        # grid feature: reference layout [1,C,Nz,Ny,Nx]
        def sample(g):
            lo = torch.tensor(bound_np[:, 0], dtype=torch.float32)
            hi = torch.tensor(bound_np[:, 1], dtype=torch.float32)
            pn = (tp - lo) / (hi - lo) * 2 - 1
            tg = torch.tensor(g).permute(3, 2, 1, 0)[None]
            v = pn[None, :, None, None, :]
            return F.grid_sample(tg, v, padding_mode="border",
                                 align_corners=True)[0, :, :, 0, 0].T

        c = sample(grid_np)
        if spec.concat_feature:
            c = torch.cat([c, sample(mid_np)], dim=1)

        e = torch.sin(tp @ torch.tensor(np.asarray(params["embed"]["B"])))
        h = e
        for i in range(spec.n_blocks):
            w = torch.tensor(np.asarray(params["pts"][i]["w"]))
            b = torch.tensor(np.asarray(params["pts"][i]["b"]))
            h = F.relu(h @ w + b)
            if spec.c_dim != 0:
                wc = torch.tensor(np.asarray(params["fc_c"][i]["w"]))
                bc = torch.tensor(np.asarray(params["fc_c"][i]["b"]))
                h = h + c @ wc + bc
            if i in spec.skips:
                h = torch.cat([e, h], dim=-1)
        wo = torch.tensor(np.asarray(params["out"]["w"]))
        bo = torch.tensor(np.asarray(params["out"]["b"]))
        out = h @ wo + bo
        return out.numpy()

    def test_fine_decoder_matches_torch(self, state):
        # golden math test vs an f64-capable oracle: pin parity precision
        # (the default bf16 MXU GEMMs would fail a 1e-4 tolerance on TPU)
        spec = nice_model_spec(
            matmul_precision="highest").decoder_specs()["fine"]
        rng = np.random.RandomState(0)
        p = rng.uniform(-1.8, 1.8, (50, 3)).astype(np.float32)
        ours = apply_mlp(state.params["fine"], spec, jnp.asarray(p),
                         state.grids, state.bound)
        bound_np = np.asarray(state.bound)
        expect = self._torch_mlp(
            state.params["fine"], spec, p,
            np.asarray(state.grids["fine"]), np.asarray(state.grids["middle"]),
            bound_np)[:, 0]
        np.testing.assert_allclose(np.asarray(ours), expect, atol=1e-4)

    def test_color_decoder_matches_torch(self, state):
        spec = nice_model_spec(
            matmul_precision="highest").decoder_specs()["color"]
        rng = np.random.RandomState(1)
        p = rng.uniform(-1.5, 1.5, (30, 3)).astype(np.float32)
        ours = apply_mlp(state.params["color"], spec, jnp.asarray(p),
                         state.grids, state.bound)
        expect = self._torch_mlp(
            state.params["color"], spec, p,
            np.asarray(state.grids["color"]), None, np.asarray(state.bound))
        np.testing.assert_allclose(np.asarray(ours), expect, atol=1e-4)


class TestPadBound:
    def test_replica_room0(self):
        # reference worked example: room0 bound padded by 0.32-divisibility
        b = pad_bound([[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]], 0.32)
        lens = b[:, 1] - b[:, 0]
        np.testing.assert_allclose(lens, [11.84, 8.96, 7.04], atol=1e-6)
