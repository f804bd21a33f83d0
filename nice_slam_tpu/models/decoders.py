"""Hierarchical grid decoders, TPU-functional style.

Semantics match the reference decoders exactly (so pretrained ConvONet
checkpoints remain loadable; see models/pretrain.py):

- `MLP` (reference decoder.py:91-203): per-point grid feature via trilinear
  interp, Fourier/NeRF point embedding, 5 dense blocks with additive
  per-layer feature injection ``h += fc_c[i](c)`` and a skip-concat of the
  embedding at block 2.  The fine decoder consumes its own + the middle
  grid's features (middle sampled under stop_gradient; decoder.py:182-187).
- `MLP_no_xyz` (decoder.py:206-274): feature-only input, skip-concat of the
  feature at block 2.
- `NICE` stage dispatch (decoder.py:312-342): coarse/middle -> occ only;
  fine -> fine+middle occ sum; color -> color head's 4-vector with occ
  overwritten by fine+middle.
- iMAP* (src/conv_onet/config.py:28-32): single MLP, c_dim=0, hidden 256,
  4 blocks, no skips, RGB+sigma output.

Weights are stored (in_dim, out_dim) so forward is ``x @ w + b``.
Dense matmuls are sized N x hidden — batch N large so the MXU sees big
GEMMs; everything is static-shaped and fuses under jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.models.embedding import (
    apply_embedding,
    embedding_dim,
    init_fourier_embedding,
)
from nice_slam_tpu.ops.grid import normalize_coords, trilinear_interp

STAGES = ("coarse", "middle", "fine", "color")


@dataclass(frozen=True)
class DecoderSpec:
    name: str = ""
    c_dim: int = 32
    hidden: int = 32
    n_blocks: int = 5
    skips: Tuple[int, ...] = (2,)
    color: bool = False
    concat_feature: bool = False
    embed: str = "fourier"
    no_xyz: bool = False
    # GEMM precision for the dense blocks (see ModelSpec.matmul_precision)
    precision: str = "default"


@dataclass(frozen=True)
class ModelSpec:
    nice: bool = True
    coarse: bool = True
    c_dim: int = 32
    hidden: int = 32
    pos_embedding_method: str = "fourier"
    coarse_bound_enlarge: int = 2
    # Decoder GEMM precision on the MXU: "highest" = 6-pass f32 emulation
    # (parity with the reference's CUDA f32 GEMMs), "float32" = 3-pass,
    # "default" = single-pass bf16 inputs / f32 accumulate (MXU-native; a
    # 3-seed ATE study showed no quality loss).  The Fourier embedding
    # always stays at "highest" (sin() of O(100) arguments).  Static jit
    # state — per-engine, unlike a process-global flag.  CPU ignores it.
    matmul_precision: str = "default"

    def decoder_specs(self):
        if not self.nice:
            return {
                "imap": DecoderSpec(
                    name="imap", c_dim=0, hidden=256, n_blocks=4, skips=(),
                    color=True, embed=self.pos_embedding_method,
                    precision=self.matmul_precision,
                )
            }
        specs = {
            "middle": DecoderSpec(
                name="middle", c_dim=self.c_dim, hidden=self.hidden,
                embed=self.pos_embedding_method,
                precision=self.matmul_precision,
            ),
            "fine": DecoderSpec(
                name="fine", c_dim=self.c_dim * 2, hidden=self.hidden,
                concat_feature=True, embed=self.pos_embedding_method,
                precision=self.matmul_precision,
            ),
            "color": DecoderSpec(
                name="color", c_dim=self.c_dim, hidden=self.hidden,
                color=True, embed=self.pos_embedding_method,
                precision=self.matmul_precision,
            ),
        }
        if self.coarse:
            specs["coarse"] = DecoderSpec(
                name="coarse", c_dim=self.c_dim, hidden=self.hidden,
                no_xyz=True, precision=self.matmul_precision,
            )
        return specs


def nice_model_spec(c_dim=32, hidden=32, coarse=True, pos_embedding_method="fourier",
                    coarse_bound_enlarge=2,
                    matmul_precision="default") -> ModelSpec:
    return ModelSpec(nice=True, coarse=coarse, c_dim=c_dim, hidden=hidden,
                     pos_embedding_method=pos_embedding_method,
                     coarse_bound_enlarge=coarse_bound_enlarge,
                     matmul_precision=matmul_precision)


def imap_model_spec(pos_embedding_method="fourier") -> ModelSpec:
    return ModelSpec(nice=False, coarse=False,
                     pos_embedding_method=pos_embedding_method)


# ---------------------------------------------------------------------------
# Initialization (matches torch inits used by the reference)

def _xavier_uniform(key, in_dim, out_dim, gain):
    a = gain * np.sqrt(6.0 / (in_dim + out_dim))
    return jax.random.uniform(key, (in_dim, out_dim), minval=-a, maxval=a)


def _dense_init(key, in_dim, out_dim, activation="relu"):
    """DenseLayer init: xavier_uniform by activation gain, zero bias
    (reference decoder.py:70-79)."""
    gain = np.sqrt(2.0) if activation == "relu" else 1.0
    return {"w": _xavier_uniform(key, in_dim, out_dim, gain),
            "b": jnp.zeros((out_dim,))}


def _torch_linear_init(key, in_dim, out_dim):
    """torch.nn.Linear default init (kaiming-uniform a=sqrt(5) + uniform
    bias) — used by the reference's fc_c layers (decoder.py:124-126)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound),
    }


def _calibrate_head(out_params, spec: DecoderSpec):
    """Calibrate the occupancy head at init: small weights and a slightly
    negative occupancy bias so sigmoid(10*occ) starts in its responsive
    range with an 'empty space' prior.

    The reference never runs from random init — its ConvONet-pretrained
    decoders are calibrated by training (NICE_SLAM.py:159-190).  A raw
    xavier head emits logits ~N(0,2): |occ| > 2 makes sigmoid(10*occ)
    exactly 0/1 in f32 and kills all gradients through that sample, which
    destabilizes pretrain-free runs."""
    occ_idx = 3 if spec.color else 0
    w = out_params["w"] * 0.1
    b = out_params["b"].at[occ_idx].set(-0.2)
    return {"w": w, "b": b}


def init_decoder(key, spec: DecoderSpec):
    keys = jax.random.split(key, 3 + 2 * spec.n_blocks)
    params = {}
    h = spec.hidden

    if spec.no_xyz:
        pts = []
        for i in range(spec.n_blocks):
            in_dim = h + spec.c_dim if (i - 1) in spec.skips else h
            pts.append(_dense_init(keys[i], in_dim, h))
        params["pts"] = pts
        params["out"] = _calibrate_head(
            _dense_init(keys[-1], h, 4 if spec.color else 1,
                        activation="linear"), spec)
        return params

    emb = embedding_dim(spec.embed, spec.name)
    if spec.embed == "fourier":
        params["embed"] = init_fourier_embedding(keys[-2])
    elif spec.embed == "fc_relu":
        params["embed"] = _dense_init(keys[-2], 3, emb)
    else:
        params["embed"] = {}

    pts = []
    for i in range(spec.n_blocks):
        if i == 0:
            in_dim = emb
        elif (i - 1) in spec.skips:
            in_dim = h + emb
        else:
            in_dim = h
        pts.append(_dense_init(keys[i], in_dim, h))
    params["pts"] = pts

    if spec.c_dim != 0:
        params["fc_c"] = [
            _torch_linear_init(keys[spec.n_blocks + i], spec.c_dim, h)
            for i in range(spec.n_blocks)
        ]
    params["out"] = _calibrate_head(
        _dense_init(keys[-1], h, 4 if spec.color else 1,
                    activation="linear"), spec)
    return params


def init_model(key, spec: ModelSpec):
    dspecs = spec.decoder_specs()
    keys = jax.random.split(key, len(dspecs))
    return {name: init_decoder(k, dspecs[name])
            for k, name in zip(keys, sorted(dspecs))}


# ---------------------------------------------------------------------------
# Forward

def _dense(x, layer, precision: str = "default"):
    prec = None if precision == "default" else precision
    return jnp.dot(x, layer["w"], precision=prec,
                   preferred_element_type=jnp.float32) + layer["b"]


def apply_mlp(params, spec: DecoderSpec, p: jnp.ndarray, grids, bound,
              c=None, e=None):
    """Coordinate MLP with per-layer grid-feature injection.

    p: (N, 3) world coords. Returns (N, 4) if color else (N,).
    c: optional precomputed grid features (N, c_dim) — used by the
    sharded-grid path, where the gather psums over a mesh axis.
    e: optional precomputed embedding (N, emb) — used by the packed
    multi-decoder embed (one sin GEMM for all decoders of a stage)."""
    if spec.c_dim != 0 and c is None:
        p_nor = normalize_coords(p, bound)
        c = trilinear_interp(grids[spec.name], p_nor)
        if spec.concat_feature:
            c_mid = jax.lax.stop_gradient(
                trilinear_interp(grids["middle"], p_nor))
            c = jnp.concatenate([c, c_mid], axis=-1)

    if e is None:
        e = apply_embedding(params["embed"], p, spec.embed, spec.name)
    h = e
    for i in range(spec.n_blocks):
        h = jax.nn.relu(_dense(h, params["pts"][i], spec.precision))
        if spec.c_dim != 0:
            h = h + _dense(c, params["fc_c"][i], spec.precision)
        if i in spec.skips:
            h = jnp.concatenate([e, h], axis=-1)
    out = _dense(h, params["out"], spec.precision)
    return out if spec.color else out[..., 0]


def apply_mlp_no_xyz(params, spec: DecoderSpec, p: jnp.ndarray, grids, bound,
                     c=None):
    """Feature-only MLP (coarse level).  bound here is the enlarged coarse
    bound (reference NICE_SLAM.py:157)."""
    if c is None:
        p_nor = normalize_coords(p, bound)
        c = trilinear_interp(grids[spec.name], p_nor)
    h = c
    for i in range(spec.n_blocks):
        h = jax.nn.relu(_dense(h, params["pts"][i], spec.precision))
        if i in spec.skips:
            h = jnp.concatenate([c, h], axis=-1)
    out = _dense(h, params["out"], spec.precision)
    return out if spec.color else out[..., 0]


def model_apply_feats(params, spec: ModelSpec, p: jnp.ndarray, feats,
                      stage: str) -> jnp.ndarray:
    """Stage-dispatched forward with PRECOMPUTED grid features.

    feats: dict with (N, c_dim) features per level in use — the caller owns
    the gather.  This is the decode entry point for sharded grids
    (parallel/grid_sharded.py), where each feature row is a psum over the
    mesh's model axis.  Semantics mirror model_apply: the fine decoder
    consumes [fine, stop_grad(middle)] (reference decoder.py:182-187), the
    color stage's occupancy is middle+fine (decoder.py:336-341).

    When every decoder of a multi-decoder stage uses the fourier
    embedding, their sin(p @ B_d) embeds ride ONE packed GEMM + sine —
    bit-identical to separate embeds (the contraction dim is 3, so each
    output column's 3-term sum is computed in the same order either
    way), but one kernel launch instead of 2-3."""
    dspecs = spec.decoder_specs()
    names = {"fine": ["middle", "fine"],
             "color": ["middle", "fine", "color"]}.get(stage, [])
    embeds = {}
    if len(names) > 1 and all(dspecs[n].embed == "fourier" for n in names):
        B_all = jnp.concatenate([params[n]["embed"]["B"] for n in names],
                                axis=1)
        e_all = jnp.sin(jnp.matmul(p, B_all, precision="highest"))
        off = 0
        for n in names:
            d = embedding_dim("fourier", n)
            embeds[n] = e_all[:, off:off + d]
            off += d

    def occ_mf():
        c_full = jnp.concatenate(
            [feats["fine"], jax.lax.stop_gradient(feats["middle"])], axis=-1)
        fine_occ = apply_mlp(params["fine"], dspecs["fine"], p, None, None,
                             c=c_full, e=embeds.get("fine"))
        mid_occ = apply_mlp(params["middle"], dspecs["middle"], p, None,
                            None, c=feats["middle"], e=embeds.get("middle"))
        return fine_occ + mid_occ

    if stage == "coarse":
        occ = apply_mlp_no_xyz(params["coarse"], dspecs["coarse"], p, None,
                               None, c=feats["coarse"])
        return jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (3,)), occ[..., None]], axis=-1)
    if stage == "middle":
        occ = apply_mlp(params["middle"], dspecs["middle"], p, None, None,
                        c=feats["middle"])
        return jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (3,)), occ[..., None]], axis=-1)
    if stage == "fine":
        return jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (3,)), occ_mf()[..., None]], axis=-1)
    if stage == "color":
        raw = apply_mlp(params["color"], dspecs["color"], p, None, None,
                        c=feats["color"], e=embeds.get("color"))
        return jnp.concatenate([raw[..., :3], occ_mf()[..., None]], axis=-1)
    raise ValueError(f"unknown stage {stage}")


def _use_fused(spec: ModelSpec, stage: str, fused) -> bool:
    """Static dispatch decision for the fused Pallas decode kernel
    (ops/pallas/fused_decode.py).  OPT-IN only (fused=True or
    NICE_SLAM_TPU_FUSED=1): measured end-to-end on v5e, XLA's own fusion
    of the gather+MLP pipeline beats the hand-written kernel (2.45 vs
    2.29 frames/s at the Replica budget) — the kernel's sequential
    weight-gradient accumulation across tiles serializes its backward.
    Kept as infrastructure for wider-MLP configs where VMEM residency
    wins."""
    import os

    if fused is False:
        return False
    if not (spec.nice and stage in ("fine", "color") and spec.c_dim == 32
            and spec.hidden == 32
            and spec.pos_embedding_method == "fourier"):
        return False
    try:
        from nice_slam_tpu.ops.pallas.fused_decode import pallas_available
        if not pallas_available():
            return False
    except Exception:  # pragma: no cover
        return False
    # explicit fused=True outranks the env kill-switch (a test passing
    # rspec.fused=True must actually exercise the kernel); env=1 opts a
    # whole process in when the caller left fused=None
    env = os.environ.get("NICE_SLAM_TPU_FUSED", "")
    if fused is True or env == "1":
        return jax.default_backend() in ("tpu", "axon")
    return False


def _fused_apply(params, spec: ModelSpec, grids, bound, p, stage: str,
                 train_decoders: bool) -> jnp.ndarray:
    """fine/color-stage decode through the fused Pallas kernel: features
    gathered here (XLA gather + lerp), the 2-3 MLPs + occ sum in one
    kernel per direction."""
    from nice_slam_tpu.ops.pallas.fused_decode import (
        fused_nice_decode,
        pack_nice_weights,
    )

    p_nor = normalize_coords(p, bound)
    c_mid = trilinear_interp(grids["middle"], p_nor)
    c_fine = trilinear_interp(grids["fine"], p_nor)
    with_color = stage == "color"
    c_color = (trilinear_interp(grids["color"], p_nor) if with_color
               else jnp.zeros_like(c_mid))
    ws = pack_nice_weights(params)
    return fused_nice_decode(with_color, train_decoders, p, c_mid, c_fine,
                             c_color, *ws)


# ---------------------------------------------------------------------------
# Packed multi-decoder forward (fine/color stages)
#
# The fine stage runs 2 MLPs (middle + fine) and the color stage 3
# (middle + fine + color), each hidden-32: every dense block is a
# (N, <=128) @ (<=128, 32) GEMM that fills at most a quarter of the
# 128x128 MXU tile, and XLA does not merge independent GEMMs.  Packing
# the decoders into block-diagonal weights turns each layer's 2-3 narrow
# GEMMs into ONE wider one — (N, 96) @ (96, 96) for the hidden blocks,
# (N, 128) @ (128, 96) for the feature injections — cutting the MXU pass
# count of a color-stage decode from ~33 to ~15 (fwd; bwd scales the
# same).  Semantics are IDENTICAL to the sequential path (same blocks,
# same relu/skip/injection order; the zero off-diagonal blocks contribute
# exact +0.0 terms); only f32 summation order inside a GEMM differs.
#
# MEASURED (v5e, Replica budget, A/B same session): 10.7 fps packed vs
# 10.9 fps sequential — a consistent ~2% LOSS end-to-end.  XLA's dot
# merger already batches the narrow independent dots, so the manual
# packing only adds the block-assembly scatters (fwd) and dW slicing
# (bwd).  OPT-IN via NICE_SLAM_TPU_PACKED=1; kept (with parity tests)
# for configs with wider/more MLPs where merging is out of the dot
# merger's reach.

def _pack_blockdiag(ws, row_offsets, col_offsets, in_total, out_total):
    """Assemble a block-diagonal weight from per-decoder blocks.  Tiny
    trace-time scatters (32x32-ish) — negligible next to the N-row GEMMs,
    and gradients flow back through the slice placement."""
    W = jnp.zeros((in_total, out_total), ws[0].dtype)
    for w, (r0, r1), (c0, c1) in zip(ws, row_offsets, col_offsets):
        W = W.at[r0:r1, c0:c1].set(w)
    return W


def _offsets(dims):
    outs, o = [], 0
    for d in dims:
        outs.append((o, o + d))
        o += d
    return outs, o


def _packed_nice_apply(params, spec: ModelSpec, grids, bound, p, stage):
    """fine/color-stage decode with the 2-3 MLPs packed into
    block-diagonal GEMMs.  Returns raw (N, 4) [rgb, occ] exactly like
    model_apply's sequential branch (reference decoder.py:312-342)."""
    dspecs = spec.decoder_specs()
    names = ("middle", "fine", "color") if stage == "color" else (
        "middle", "fine")
    specs = [dspecs[n] for n in names]
    H = specs[0].hidden
    n_blocks = specs[0].n_blocks
    skips = specs[0].skips
    prec = specs[0].precision
    D = len(names)

    # grid features: middle live, fine = [own, stop_grad(middle)]
    # (reference decoder.py:182-187), color own
    p_nor = normalize_coords(p, bound)
    c_mid = trilinear_interp(grids["middle"], p_nor)
    c_fine = trilinear_interp(grids["fine"], p_nor)
    cs = [c_mid,
          jnp.concatenate([c_fine, jax.lax.stop_gradient(c_mid)], axis=-1)]
    if stage == "color":
        cs.append(trilinear_interp(grids["color"], p_nor))
    c_all = jnp.concatenate(cs, axis=-1)
    c_offs, c_total = _offsets([s.c_dim for s in specs])

    # embeddings: one sin(p @ [B1|B2|B3]) GEMM when all-fourier
    emb_dims = [embedding_dim(s.embed, s.name) for s in specs]
    e_offs, e_total = _offsets(emb_dims)
    if all(s.embed == "fourier" for s in specs):
        B_all = jnp.concatenate([params[n]["embed"]["B"] for n in names],
                                axis=1)
        e_all = jnp.sin(jnp.matmul(p, B_all, precision="highest"))
    else:
        e_all = jnp.concatenate(
            [apply_embedding(params[n]["embed"], p, s.embed, s.name)
             for n, s in zip(names, specs)], axis=-1)

    h_offs, h_total = _offsets([H] * D)

    h_all = None
    for i in range(n_blocks):
        if i == 0:
            x, in_total = e_all, e_total
            row_blocks = [[e_offs[d]] for d in range(D)]
        elif (i - 1) in skips:
            # per-decoder input is [e_d, h_d] (decoder.py:198-199); rows
            # of decoder d's weight split across the e and h regions of
            # the packed [e_all | h_all] input
            x = jnp.concatenate([e_all, h_all], axis=-1)
            in_total = e_total + h_total
            row_blocks = [[e_offs[d],
                           (e_total + h_offs[d][0], e_total + h_offs[d][1])]
                          for d in range(D)]
        else:
            x, in_total = h_all, h_total
            row_blocks = [[h_offs[d]] for d in range(D)]

        W = jnp.zeros((in_total, h_total), x.dtype)
        b_all = jnp.concatenate([params[n]["pts"][i]["b"] for n in names])
        for d, n in enumerate(names):
            w = params[n]["pts"][i]["w"]
            c0, c1 = h_offs[d]
            r_cursor = 0
            for (r0, r1) in row_blocks[d]:
                W = W.at[r0:r1, c0:c1].set(w[r_cursor:r_cursor + (r1 - r0)])
                r_cursor += r1 - r0
        pr = None if prec == "default" else prec
        h_all = jax.nn.relu(
            jnp.dot(x, W, precision=pr,
                    preferred_element_type=jnp.float32) + b_all)

        # feature injection h += fc_c[i](c) (decoder.py:196-197)
        Wc = _pack_blockdiag([params[n]["fc_c"][i]["w"] for n in names],
                             c_offs, h_offs, c_total, h_total)
        bc = jnp.concatenate([params[n]["fc_c"][i]["b"] for n in names])
        h_all = h_all + (jnp.dot(c_all, Wc, precision=pr,
                                 preferred_element_type=jnp.float32) + bc)

    out_dims = [4 if s.color else 1 for s in specs]
    o_offs, o_total = _offsets(out_dims)
    Wo = _pack_blockdiag([params[n]["out"]["w"] for n in names],
                         h_offs, o_offs, h_total, o_total)
    bo = jnp.concatenate([params[n]["out"]["b"] for n in names])
    pr = None if prec == "default" else prec
    out = jnp.dot(h_all, Wo, precision=pr,
                  preferred_element_type=jnp.float32) + bo

    occ = out[..., 0] + out[..., 1]            # middle + fine occ
    if stage == "color":
        rgb = out[..., 2:5]                    # color head rgb (occ chan
    else:                                      #  discarded, decoder.py:340)
        rgb = jnp.zeros(p.shape[:-1] + (3,))
    return jnp.concatenate([rgb, occ[..., None]], axis=-1)


def _pack_fc_interp(grids) -> bool:
    """Trace-time choice: fetch fine+color features through one
    lane-packed interp (TPU default; NICE_SLAM_TPU_PACK_FC=0/1 overrides,
    tests pin 0 and opt back in).  Requires same-shaped fine/color grids
    (same grid_len, the default everywhere)."""
    import os

    env = os.environ.get("NICE_SLAM_TPU_PACK_FC", "")
    if env == "0":
        return False
    if not ("fine" in grids and "color" in grids
            and grids["fine"].shape == grids["color"].shape):
        return False
    return env == "1" or jax.default_backend() in ("tpu", "axon")


def _use_packed(spec: ModelSpec, stage: str) -> bool:
    import os

    if os.environ.get("NICE_SLAM_TPU_PACKED", "0") != "1":
        return False
    if not (spec.nice and stage in ("fine", "color")):
        return False
    dspecs = spec.decoder_specs()
    names = ("middle", "fine", "color") if stage == "color" else (
        "middle", "fine")
    s0 = dspecs[names[0]]
    return all(dspecs[n].hidden == s0.hidden
               and dspecs[n].n_blocks == s0.n_blocks
               and dspecs[n].skips == s0.skips
               and dspecs[n].c_dim != 0
               for n in names)


def model_apply(params, spec: ModelSpec, grids, bound, p: jnp.ndarray,
                stage: str = "color", fused=None,
                train_decoders: bool = True) -> jnp.ndarray:
    """Stage-dispatched forward: (N, 3) points -> raw (N, 4) [rgb, occ].

    `stage` must be static under jit (one compile per stage).
    `fused`/`train_decoders` control the fused Pallas kernel dispatch
    (see _use_fused); train_decoders=False skips decoder weight-gradient
    accumulation in the kernel's backward (frozen decoders)."""
    dspecs = spec.decoder_specs()
    if not spec.nice:
        return apply_mlp(params["imap"], dspecs["imap"], p, grids, bound)

    if stage in ("fine", "color") and _use_fused(spec, stage, fused):
        return _fused_apply(params, spec, grids, bound, p, stage,
                            train_decoders)

    if _use_packed(spec, stage):
        return _packed_nice_apply(params, spec, grids, bound, p, stage)

    if stage == "coarse":
        coarse_bound = bound * spec.coarse_bound_enlarge
        occ = apply_mlp_no_xyz(params["coarse"], dspecs["coarse"], p, grids,
                               coarse_bound)
        return jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (3,)), occ[..., None]], axis=-1)
    if stage == "middle":
        occ = apply_mlp(params["middle"], dspecs["middle"], p, grids, bound)
        return jnp.concatenate(
            [jnp.zeros(p.shape[:-1] + (3,)), occ[..., None]], axis=-1)
    if stage in ("fine", "color"):
        # multi-decoder stages route through the feats path: features
        # interpolated once per grid (the fine decoder's stop_grad middle
        # concat reuses the live middle features) and the decoders'
        # fourier embeds packed into one GEMM+sine — both bit-identical
        # to the per-decoder formulation.
        p_nor = normalize_coords(p, bound)
        feats = {"middle": trilinear_interp(grids["middle"], p_nor)}
        if stage == "color" and _pack_fc_interp(grids):
            # fetch fine+color features through ONE packed interp: the
            # lane-concatenated grid halves both the corner-gather rows
            # and — the real win — the moment-scatter rows of the grid
            # backward (scatter cost is row-count-bound; see ops/grid.py
            # and tools/microbench_scatter.py).  Exact same features.
            c_fc = trilinear_interp(
                jnp.concatenate([grids["fine"], grids["color"]], axis=-1),
                p_nor)
            C = grids["fine"].shape[-1]
            feats["fine"], feats["color"] = c_fc[:, :C], c_fc[:, C:]
        else:
            feats["fine"] = trilinear_interp(grids["fine"], p_nor)
            if stage == "color":
                feats["color"] = trilinear_interp(grids["color"], p_nor)
        return model_apply_feats(params, spec, p, feats, stage)
    raise ValueError(f"unknown stage {stage}")
