"""Unit tests for nice_slam_tpu.ops against independent oracles
(scipy, torch CPU, closed forms)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nice_slam_tpu import ops
from nice_slam_tpu.ops import se3, grid as gridops


def rand_rot(rng, n):
    from scipy.spatial.transform import Rotation

    return Rotation.random(n, random_state=rng)


class TestSE3:
    def test_quat_to_rot_matches_scipy(self):
        rng = np.random.RandomState(0)
        rots = rand_rot(rng, 32)
        q_xyzw = rots.as_quat()  # scipy: (x, y, z, w)
        q_wxyz = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, :3]], axis=1)
        R = se3.quat_to_rot(jnp.asarray(q_wxyz, jnp.float32))
        np.testing.assert_allclose(np.asarray(R), rots.as_matrix(), atol=1e-5)

    def test_quat_to_rot_unnormalized(self):
        rng = np.random.RandomState(1)
        rots = rand_rot(rng, 8)
        q = rots.as_quat()
        q_wxyz = np.concatenate([q[:, 3:4], q[:, :3]], axis=1) * 2.7
        R = se3.quat_to_rot(jnp.asarray(q_wxyz, jnp.float32))
        np.testing.assert_allclose(np.asarray(R), rots.as_matrix(), atol=1e-5)

    def test_rot_quat_roundtrip(self):
        rng = np.random.RandomState(2)
        R = rand_rot(rng, 64).as_matrix().astype(np.float32)
        q = se3.rot_to_quat(jnp.asarray(R))
        R2 = se3.quat_to_rot(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_rot_to_quat_edge_cases(self):
        # 180-degree rotations hit the non-trace pivots
        mats = [
            np.diag([1.0, -1.0, -1.0]),
            np.diag([-1.0, 1.0, -1.0]),
            np.diag([-1.0, -1.0, 1.0]),
            np.eye(3),
        ]
        for R in mats:
            q = se3.rot_to_quat(jnp.asarray(R, jnp.float32))
            R2 = se3.quat_to_rot(q)
            np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_cam_tensor_roundtrip(self):
        rng = np.random.RandomState(3)
        R = rand_rot(rng, 16).as_matrix().astype(np.float32)
        t = rng.randn(16, 3).astype(np.float32)
        c2w = np.concatenate([R, t[:, :, None]], axis=2)
        vec = se3.tensor_from_cam(jnp.asarray(c2w))
        c2w2 = se3.cam_from_tensor(vec)
        np.testing.assert_allclose(np.asarray(c2w2), c2w, atol=1e-5)

    def test_to_homogeneous(self):
        c2w = jnp.zeros((3, 4)).at[:, :3].set(jnp.eye(3))
        h = se3.to_homogeneous(c2w)
        assert h.shape == (4, 4)
        np.testing.assert_allclose(np.asarray(h[3]), [0, 0, 0, 1])


class TestRays:
    def test_ray_dirs_convention(self):
        # center pixel looks down -z
        d = ops.ray_dirs(jnp.array(319.5), jnp.array(239.5), 600.0, 600.0, 319.5, 239.5)
        np.testing.assert_allclose(np.asarray(d), [0, 0, -1], atol=1e-6)
        # pixel right of center: +x; pixel below center (larger j): -y
        d = ops.ray_dirs(jnp.array(419.5), jnp.array(339.5), 600.0, 600.0, 319.5, 239.5)
        assert d[0] > 0 and d[1] < 0

    def test_rays_from_uv_rotation(self):
        rng = np.random.RandomState(4)
        R = rand_rot(rng, 1).as_matrix()[0].astype(np.float32)
        t = rng.randn(3).astype(np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = R
        c2w[:3, 3] = t
        i = jnp.array([100.0, 200.0])
        j = jnp.array([50.0, 60.0])
        o, d = ops.rays_from_uv(i, j, jnp.asarray(c2w), 600.0, 600.0, 319.5, 239.5)
        dirs = np.stack(
            [(np.asarray(i) - 319.5) / 600.0, -(np.asarray(j) - 239.5) / 600.0, -np.ones(2)], -1
        )
        np.testing.assert_allclose(np.asarray(d), dirs @ R.T, atol=1e-3)
        np.testing.assert_allclose(np.asarray(o), np.tile(t, (2, 1)), atol=1e-6)

    def test_image_rays_matches_uv(self):
        c2w = jnp.eye(4)
        o, d = ops.image_rays(4, 5, 10.0, 10.0, 2.0, 1.5, c2w)
        i = jnp.array([3.0])
        j = jnp.array([2.0])
        o2, d2 = ops.rays_from_uv(i, j, c2w, 10.0, 10.0, 2.0, 1.5)
        np.testing.assert_allclose(np.asarray(d[2, 3]), np.asarray(d2[0]), atol=1e-4)

    def test_ray_aabb_far(self):
        bound = jnp.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        far = ops.ray_aabb_far(o, d, bound)
        np.testing.assert_allclose(np.asarray(far), [1.0], atol=1e-5)
        # diagonal ray
        d = jnp.array([[1.0, 1.0, 1.0]]) / np.sqrt(3)
        far = ops.ray_aabb_far(o, d, bound)
        np.testing.assert_allclose(np.asarray(far), [np.sqrt(3)], atol=1e-4)

    def test_sample_pixels_range(self):
        i, j = ops.sample_pixels(jax.random.PRNGKey(0), 1000, 20, 460, 30, 610)
        assert i.min() >= 30 and i.max() < 610
        assert j.min() >= 20 and j.max() < 460


class TestSampling:
    def test_stratified(self):
        z = ops.stratified_zvals(jnp.array([[0.1]]), jnp.array([[1.1]]), 11)
        np.testing.assert_allclose(np.asarray(z[0]), np.linspace(0.1, 1.1, 11), atol=1e-6)

    def test_surface_zvals(self):
        d = jnp.array([2.0, 0.0])
        z = ops.surface_zvals(d, 4, 5.0)
        np.testing.assert_allclose(np.asarray(z[0]), np.linspace(0.95 * 2, 1.05 * 2, 4), atol=1e-6)
        np.testing.assert_allclose(np.asarray(z[1]), np.linspace(0.001, 5.0, 4), atol=1e-6)

    def test_sample_pdf_det_against_torch(self):
        import torch

        rng = np.random.RandomState(5)
        bins = np.sort(rng.rand(3, 8).astype(np.float32), axis=1)
        w = rng.rand(3, 7).astype(np.float32)

        ours = ops.sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(w), 16, det=True)

        # torch oracle (same math as reference common.py:19-63)
        tw = torch.tensor(w) + 1e-5
        pdf = tw / tw.sum(-1, keepdim=True)
        cdf = torch.cumsum(pdf, -1)
        cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
        u = torch.linspace(0.0, 1.0, 16).expand(3, 16).contiguous()
        inds = torch.searchsorted(cdf, u, right=True)
        below = torch.clamp(inds - 1, min=0)
        above = torch.clamp(inds, max=cdf.shape[-1] - 1)
        cdf_lo = torch.gather(cdf, 1, below)
        cdf_hi = torch.gather(cdf, 1, above)
        b = torch.tensor(bins)
        b_lo = torch.gather(b, 1, below)
        b_hi = torch.gather(b, 1, above)
        denom = cdf_hi - cdf_lo
        denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
        t = (u - cdf_lo) / denom
        expect = b_lo + t * (b_hi - b_lo)
        np.testing.assert_allclose(np.asarray(ours), expect.numpy(), atol=1e-5)

    def test_sample_pdf_stochastic_in_range(self):
        bins = jnp.linspace(0, 1, 9)[None].repeat(4, 0)
        w = jnp.ones((4, 8))
        s = ops.sample_pdf(jax.random.PRNGKey(1), bins, w, 32)
        assert s.min() >= 0 and s.max() <= 1


class TestComposite:
    def _torch_reference(self, raw, z, rd, occupancy):
        import torch
        import torch.nn.functional as F

        raw = torch.tensor(raw).clone()
        z = torch.tensor(z)
        rd = torch.tensor(rd)
        dists = z[..., 1:] - z[..., :-1]
        dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
        dists = dists * torch.norm(rd[..., None, :], dim=-1)
        rgb = raw[..., :-1]
        if occupancy:
            alpha = torch.sigmoid(10 * raw[..., -1])
        else:
            alpha = 1.0 - torch.exp(-F.relu(raw[..., -1]) * dists)
        weights = alpha * torch.cumprod(
            torch.cat([torch.ones(alpha.shape[0], 1), 1.0 - alpha + 1e-10], -1), -1
        )[:, :-1]
        rgb_map = torch.sum(weights[..., None] * rgb, -2)
        depth = torch.sum(weights * z, -1)
        var = torch.sum(weights * (z - depth.unsqueeze(-1)) ** 2, -1)
        return depth.numpy(), var.numpy(), rgb_map.numpy(), weights.numpy()

    @pytest.mark.parametrize("occupancy", [True, False])
    def test_matches_torch(self, occupancy):
        rng = np.random.RandomState(6)
        raw = rng.randn(5, 12, 4).astype(np.float32)
        z = np.sort(rng.rand(5, 12).astype(np.float32) * 3, axis=1)
        rd = rng.randn(5, 3).astype(np.float32)
        d, v, c, w = ops.raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd), occupancy)
        de, ve, ce, we = self._torch_reference(raw, z, rd, occupancy)
        np.testing.assert_allclose(np.asarray(d), de, atol=1e-4)
        np.testing.assert_allclose(np.asarray(v), ve, atol=1e-4)
        np.testing.assert_allclose(np.asarray(c), ce, atol=1e-4)
        np.testing.assert_allclose(np.asarray(w), we, atol=1e-4)

    def test_opaque_surface_depth(self):
        # single fully-occupied sample at z=2 -> depth 2
        z = jnp.linspace(1.9, 2.1, 8)[None]
        raw = jnp.zeros((1, 8, 4)).at[..., 3].set(-100.0).at[0, 4, 3].set(100.0)
        d, v, c, w = ops.raw2outputs(raw, z, jnp.array([[0.0, 0.0, -1.0]]), True)
        np.testing.assert_allclose(float(d[0]), float(z[0, 4]), atol=1e-4)


class TestGrid:
    def test_normalize_coords(self):
        bound = jnp.array([[-2.0, 2.0], [0.0, 4.0], [-1.0, 3.0]])
        p = jnp.array([[-2.0, 0.0, -1.0], [2.0, 4.0, 3.0], [0.0, 2.0, 1.0]])
        n = ops.normalize_coords(p, bound)
        np.testing.assert_allclose(np.asarray(n), [[-1, -1, -1], [1, 1, 1], [0, 0, 0]], atol=1e-6)

    def test_trilinear_matches_grid_sample(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(7)
        nx, ny, nz, C = 6, 5, 7, 8
        g = rng.randn(nx, ny, nz, C).astype(np.float32)
        p = (rng.rand(200, 3).astype(np.float32) * 2.4 - 1.2)  # includes out-of-range

        ours = gridops.trilinear_interp(jnp.asarray(g), jnp.asarray(p))

        # torch oracle with the reference's layout/settings
        # (decoder.py:168-175): grid [1, C, Nz, Ny, Nx], vgrid x->Nx.
        tg = torch.tensor(g).permute(3, 2, 1, 0)[None]  # [1, C, nz, ny, nx]
        vgrid = torch.tensor(p)[None, :, None, None, :]  # [1, N, 1, 1, 3]
        expect = (
            F.grid_sample(tg, vgrid, padding_mode="border", align_corners=True, mode="bilinear")
            .squeeze(-1)
            .squeeze(-1)[0]
            .transpose(0, 1)
        )
        np.testing.assert_allclose(np.asarray(ours), expect.numpy(), atol=2e-5)

    def test_trilinear_grad_flows_to_grid(self):
        g = jnp.ones((4, 4, 4, 2))
        p = jnp.zeros((3, 3))

        def f(grid):
            return gridops.trilinear_interp(grid, p).sum()

        gr = jax.grad(f)(g)
        assert float(jnp.abs(gr).sum()) > 0

    def test_moment_scatter_backward_matches_autodiff(self):
        # The moment-scatter VJP (ops/grid.py _moment_scatter_bwd) must
        # reproduce XLA's autodiff gradient exactly — for BOTH the grid
        # (8x fewer scatter rows) and the points (pose grads in tracking).
        rng = np.random.RandomState(11)
        nx, ny, nz, C = 6, 5, 7, 8
        g = jnp.asarray(rng.randn(nx, ny, nz, C).astype(np.float32))
        p = jnp.asarray(
            (rng.rand(150, 3).astype(np.float32) * 2.4 - 1.2))  # incl. OOB
        ct = jnp.asarray(rng.randn(150, C).astype(np.float32))

        def loss(fn, grid, pts):
            return jnp.sum(fn(grid, pts) * ct)

        gg_ref, gp_ref = jax.grad(
            lambda a, b: loss(gridops._interp_impl, a, b), (0, 1))(g, p)
        gg_ms, gp_ms = jax.grad(
            lambda a, b: loss(gridops._interp_mscatter, a, b), (0, 1))(g, p)
        np.testing.assert_allclose(np.asarray(gg_ms), np.asarray(gg_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp_ms), np.asarray(gp_ref),
                                   rtol=1e-5, atol=1e-5)
        # forward identical
        np.testing.assert_allclose(
            np.asarray(gridops._interp_mscatter(g, p)),
            np.asarray(gridops._interp_impl(g, p)), atol=0)

    def test_moment_scatter_bf16_buffer_env(self, monkeypatch):
        # NICE_SLAM_TPU_MSCATTER_BF16=1 stores the cell-moment buffer in
        # bf16 (halving the backward's dominant dense HBM traffic).  The
        # grid gradient must stay within bf16 rounding of autodiff; the
        # POINT gradient path never touches the moment buffer and must
        # stay exactly f32-equal.
        rng = np.random.RandomState(13)
        nx, ny, nz, C = 6, 5, 7, 8
        g = jnp.asarray(rng.randn(nx, ny, nz, C).astype(np.float32))
        p = jnp.asarray(rng.rand(150, 3).astype(np.float32) * 2 - 1)
        ct = jnp.asarray(rng.randn(150, C).astype(np.float32))

        def loss(fn, grid, pts):
            return jnp.sum(fn(grid, pts) * ct)

        gg_ref, gp_ref = jax.grad(
            lambda a, b: loss(gridops._interp_impl, a, b), (0, 1))(g, p)
        monkeypatch.setenv("NICE_SLAM_TPU_MSCATTER_BF16", "1")
        gg_bf, gp_bf = jax.grad(
            lambda a, b: loss(gridops._interp_mscatter, a, b), (0, 1))(g, p)
        assert gg_bf.dtype == jnp.float32
        # bf16 has ~3 significant decimal digits; contributions per cell
        # are few, so the summed gradient stays within a loose rel tol
        np.testing.assert_allclose(np.asarray(gg_bf), np.asarray(gg_ref),
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(gp_bf), np.asarray(gp_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_moment_scatter_under_scan_and_vmap(self):
        # mapping runs the VJP inside lax.scan; keyframe selection vmaps
        # interp-bearing code — both must compose with the custom_vjp
        g = jnp.asarray(np.random.RandomState(0)
                        .randn(4, 4, 4, 2).astype(np.float32))
        p = jnp.asarray(np.random.RandomState(1)
                        .rand(5, 10, 3).astype(np.float32) * 2 - 1)

        def per(pp):
            return gridops.trilinear_interp(g, pp).sum()

        out_v = jax.vmap(per)(p)
        out_ref = jnp.stack([gridops._interp_impl(g, pp).sum() for pp in p])
        np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_ref),
                                   rtol=1e-6)

        def step(grid, pp):
            l, gr = jax.value_and_grad(
                lambda gg: gridops.trilinear_interp(gg, pp).sum())(grid)
            return grid - 0.1 * gr, l

        final, losses = jax.lax.scan(step, g, p)
        final_ref, losses_ref = jax.lax.scan(
            lambda grid, pp: (
                grid - 0.1 * jax.grad(
                    lambda gg: gridops._interp_impl(gg, pp).sum())(grid),
                gridops._interp_impl(grid, pp).sum()), g, p)
        np.testing.assert_allclose(np.asarray(final), np.asarray(final_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_bf16_gather_path(self, monkeypatch):
        # NICE_SLAM_TPU_INTERP_BF16=1 (the TPU default) gathers bf16
        # corner rows but keeps the lerp and ALL gradients f32.  Forward
        # must match f32 to bf16 rounding; grid gradient must stay EXACT
        # f32 moment-scatter (it never sees the rounded corners).
        rng = np.random.RandomState(5)
        g = jnp.asarray(rng.randn(6, 5, 7, 8).astype(np.float32)) * 0.1
        p = jnp.asarray(rng.rand(200, 3).astype(np.float32) * 2.2 - 1.1)
        ct = jnp.asarray(rng.randn(200, 8).astype(np.float32))

        f32_fwd = gridops._interp_impl(g, p)
        f32_gg = jax.grad(
            lambda a: jnp.sum(gridops._interp_mscatter(a, p) * ct))(g)

        monkeypatch.setenv("NICE_SLAM_TPU_INTERP_BF16", "1")
        lp_fwd = gridops._interp_mscatter(g, p)
        lp_gg = jax.grad(
            lambda a: jnp.sum(gridops._interp_mscatter(a, p) * ct))(g)

        assert lp_fwd.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(lp_fwd), np.asarray(f32_fwd),
                                   atol=2e-3, rtol=2e-2)
        # the moment scatter runs on the f32 cotangent + f32 weights:
        # identical regardless of the forward's gather dtype
        np.testing.assert_allclose(np.asarray(lp_gg), np.asarray(f32_gg),
                                   rtol=1e-6, atol=1e-7)

    def test_mirror_gather_path(self, monkeypatch):
        # NICE_SLAM_TPU_MIRROR=1 (the TPU default) interpolates through
        # the cell-corner mirror: same corner values, Σ w_k·c_k lerp
        # (float reassociation only).  Gradients: grid grad is the same
        # moment scatter (exact match); p_nor grad differs only by the
        # same reassociation.
        rng = np.random.RandomState(11)
        g = jnp.asarray(rng.randn(6, 5, 7, 8).astype(np.float32)) * 0.1
        p = jnp.asarray(rng.rand(200, 3).astype(np.float32) * 2.2 - 1.1)
        ct = jnp.asarray(rng.randn(200, 8).astype(np.float32))

        f32_fwd = gridops._interp_impl(g, p)
        f32_gg, f32_gp = jax.grad(
            lambda a, b: jnp.sum(gridops._interp_mscatter(a, b) * ct),
            argnums=(0, 1))(g, p)

        monkeypatch.setenv("NICE_SLAM_TPU_MIRROR", "1")
        m_fwd = gridops._interp_mscatter(g, p)
        m_gg, m_gp = jax.grad(
            lambda a, b: jnp.sum(gridops._interp_mscatter(a, b) * ct),
            argnums=(0, 1))(g, p)

        np.testing.assert_allclose(np.asarray(m_fwd), np.asarray(f32_fwd),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(m_gg), np.asarray(f32_gg),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(m_gp), np.asarray(f32_gp),
                                   rtol=1e-4, atol=1e-5)

    def test_grid_shape_for_bound(self):
        # Replica room0 worked example (SURVEY.md §2.4)
        bound = [[-2.9, 8.94], [-3.2, 5.76], [-3.5, 3.54]]
        assert gridops.grid_shape_for_bound(bound, 0.32) == [37, 28, 22]
        assert gridops.grid_shape_for_bound(bound, 0.16) == [74, 56, 44]
        assert gridops.grid_shape_for_bound(bound, 2.0, enlarge=2) == [11, 8, 7]


class TestAdam:
    def test_matches_torch_adam(self):
        import torch

        w0 = np.array([1.0, -2.0, 3.0], np.float32)
        tw = torch.tensor(w0, requires_grad=True)
        opt = torch.optim.Adam([tw], lr=0.1)

        params = {"w": jnp.asarray(w0)}
        state = ops.adam_init(params)

        def loss_fn(p):
            return jnp.sum(p["w"] ** 2)

        for _ in range(5):
            g = jax.grad(loss_fn)(params)
            params, state = ops.adam_update(params, g, state, 0.1)

            opt.zero_grad()
            (tw**2).sum().backward()
            opt.step()

        np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-3)

    def test_per_leaf_lr(self):
        params = {"a": jnp.ones(2), "b": jnp.ones(2)}
        grads = {"a": jnp.ones(2), "b": jnp.ones(2)}
        state = ops.adam_init(params)
        lr = {"a": 0.0, "b": 0.1}
        params2, _ = ops.adam_update(params, grads, state, lr)
        np.testing.assert_allclose(np.asarray(params2["a"]), 1.0)
        assert float(params2["b"][0]) < 1.0

    def test_component_lr_vector(self):
        # tracker's seperate_LR: quaternion gets 0.2x lr (Tracker.py:202-213)
        params = jnp.ones(7)
        grads = jnp.ones(7)
        state = ops.adam_init(params)
        lr = jnp.concatenate([jnp.full(4, 0.02), jnp.full(3, 0.1)])
        p2, _ = ops.adam_update(params, grads, state, lr)
        assert abs(float(p2[0]) - 1.0) < abs(float(p2[4]) - 1.0)
