"""Fused NICE decode as a Pallas TPU kernel (forward + hand-derived VJP).

The color-stage decode — the hot op in both tracking and mapping
(SURVEY §3.2/3.3) — evaluates three structurally identical 5-block MLPs
per point (middle, fine, color; reference decoder.py:91-203, 336-341).
As separate XLA ops this is ~100 small HLOs per iteration with HBM
round-trips between layers.  Here the whole per-point pipeline
(Fourier embedding -> 5 dense blocks with additive feature injection and
the skip-concat at block 2 -> heads -> middle+fine occupancy sum) runs in
ONE kernel per direction, with all activations resident in VMEM and every
matmul on the MXU.

Grid features are gathered OUTSIDE the kernel (XLA gathers are fast on
this hardware); the kernel consumes per-point feature rows.  The backward
kernel recomputes activations (cheaper than spilling residuals to HBM)
and accumulates weight gradients across tiles into single output blocks
(sequential TPU grid).

Semantics notes:
- the fine decoder's view of the middle features is stop-gradient
  (decoder.py:182-187): the backward kernel simply drops that cotangent;
- the color head's occupancy output is discarded (overwritten by
  middle+fine; decoder.py:336-341): its cotangent is zero.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False

TILE = 512
HID = 32
EMB = 93
# decoder order inside the packed weight list
DECS = ("middle", "fine", "color")
C_DIMS = {"middle": HID, "fine": 2 * HID, "color": HID}
OUT_DIMS = {"middle": 1, "fine": 1, "color": 4}
LAYER_IN = [EMB, HID, HID, HID + EMB, HID]
N_BLOCKS = 5
SKIP = 2


def pallas_available() -> bool:
    return _PALLAS


def pack_nice_weights(params) -> Tuple[jnp.ndarray, ...]:
    """Flatten middle/fine/color decoder params into the kernel operand
    order: per decoder [B, W0..W4, b0..b4, V0..V4, a0..a4, Wo, bo]."""
    ws = []
    for name in DECS:
        d = params[name]
        ws.append(d["embed"]["B"])
        for i in range(N_BLOCKS):
            ws.append(d["pts"][i]["w"])
        for i in range(N_BLOCKS):
            ws.append(d["pts"][i]["b"].reshape(1, -1))
        for i in range(N_BLOCKS):
            ws.append(d["fc_c"][i]["w"])
        for i in range(N_BLOCKS):
            ws.append(d["fc_c"][i]["b"].reshape(1, -1))
        ws.append(d["out"]["w"])
        ws.append(d["out"]["b"].reshape(1, -1))
    return tuple(ws)


N_PER_DEC = 1 + 4 * N_BLOCKS + 2  # 23 arrays per decoder


def _unpack(ws, dec_idx):
    base = dec_idx * N_PER_DEC
    B = ws[base]
    W = ws[base + 1: base + 6]
    b = ws[base + 6: base + 11]
    V = ws[base + 11: base + 16]
    a = ws[base + 16: base + 21]
    Wo = ws[base + 21]
    bo = ws[base + 22]
    return B, W, b, V, a, Wo, bo


def _mm(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _mm_hi(x, w):
    # full-f32 path: embedding arguments reach O(100) before sin(), where
    # bf16 mantissa error (~0.4 rad) would corrupt the features
    return jnp.dot(x, w, precision="highest",
                   preferred_element_type=jnp.float32)


def _mlp_forward(p, c, B, W, b, V, a, Wo, bo, save=False):
    """Reference MLP forward (decoder.py:177-203) on a tile.
    With save=True also returns intermediates for the backward pass."""
    e = jnp.sin(_mm_hi(p, B))
    x = e
    zs, xs = [], []
    for i in range(N_BLOCKS):
        xs.append(x)
        z = _mm(x, W[i]) + b[i]
        h = jax.nn.relu(z) + _mm(c, V[i]) + a[i]
        zs.append(z)
        x = jnp.concatenate([e, h], axis=-1) if i == SKIP else h
    out = _mm(x, Wo) + bo
    if save:
        return out, (e, xs, zs, x)
    return out


def _mlp_backward(dout, p, c, B, W, b, V, a, Wo, bo):
    """Hand-derived VJP of _mlp_forward.  Returns (dp, dc, weight grads
    in pack order [dB, dW0..4, db0..4, dV0..4, da0..4, dWo, dbo])."""
    pb = _mm_hi(p, B)
    e = jnp.sin(pb)
    x = e
    xs, zs = [], []
    for i in range(N_BLOCKS):
        xs.append(x)
        z = _mm(x, W[i]) + b[i]
        h = jax.nn.relu(z) + _mm(c, V[i]) + a[i]
        zs.append(z)
        x = jnp.concatenate([e, h], axis=-1) if i == SKIP else h
    x_last = x

    dWo = _mm(x_last.T, dout)
    dbo = jnp.sum(dout, axis=0, keepdims=True)
    dx = _mm(dout, Wo.T)

    de = jnp.zeros_like(e)
    dc = jnp.zeros_like(c)
    dW, db, dV, da = [None] * N_BLOCKS, [None] * N_BLOCKS, \
        [None] * N_BLOCKS, [None] * N_BLOCKS
    for i in reversed(range(N_BLOCKS)):
        if i == SKIP:
            # x_{i+1} was concat([e, h_i])
            de = de + dx[:, :EMB]
            dh = dx[:, EMB:]
        else:
            dh = dx
        dc = dc + _mm(dh, V[i].T)
        dV[i] = _mm(c.T, dh)
        da[i] = jnp.sum(dh, axis=0, keepdims=True)
        dz = dh * (zs[i] > 0)
        dW[i] = _mm(xs[i].T, dz)
        db[i] = jnp.sum(dz, axis=0, keepdims=True)
        dx = _mm(dz, W[i].T)
    de = de + dx  # x_0 = e

    dpre = de * jnp.cos(pb)
    # B entries are O(25): full precision here, like the forward embedding
    dp = _mm_hi(dpre, B.T)
    dB = _mm_hi(p.T, dpre)
    return dp, dc, [dB] + dW + db + dV + da + [dWo, dbo]


# ---------------------------------------------------------------------------
# Kernels

def _fwd_kernel(with_color, p_ref, cm_ref, cf_ref, cc_ref, *refs):
    ws = [r[:] for r in refs[:-1]]
    out_ref = refs[-1]
    p = p_ref[:]
    cm = cm_ref[:]

    Bm, Wm, bm, Vm, am, Wom, bom = _unpack(ws, 0)
    occ_mid = _mlp_forward(p, cm, Bm, Wm, bm, Vm, am, Wom, bom)[:, 0]

    Bf, Wf, bf, Vf, af, Wof, bof = _unpack(ws, 1)
    cfull = jnp.concatenate([cf_ref[:], cm], axis=-1)
    occ_fine = _mlp_forward(p, cfull, Bf, Wf, bf, Vf, af, Wof, bof)[:, 0]

    occ = occ_mid + occ_fine
    if with_color:
        Bc, Wc, bc, Vc, ac, Woc, boc = _unpack(ws, 2)
        rgb = _mlp_forward(p, cc_ref[:], Bc, Wc, bc, Vc, ac, Woc, boc)[:, :3]
    else:
        rgb = jnp.zeros((p.shape[0], 3), jnp.float32)
    out_ref[:] = jnp.concatenate([rgb, occ[:, None]], axis=-1)


def _bwd_kernel(with_color, train_weights, p_ref, cm_ref, cf_ref, cc_ref,
                g_ref, *refs):
    n_w = 3 * N_PER_DEC
    ws = [r[:] for r in refs[:n_w]]
    outs = refs[n_w:]
    dp_ref, dcm_ref, dcf_ref, dcc_ref = outs[:4]
    wgrad_refs = outs[4:]

    p = p_ref[:]
    cm = cm_ref[:]
    g = g_ref[:]
    docc = g[:, 3:4]

    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:] = jnp.zeros_like(ref)
        ref[:] = ref[:] + val

    # middle decoder: occupancy cotangent
    Bm, Wm, bm, Vm, am, Wom, bom = _unpack(ws, 0)
    dp_m, dcm_m, wg_m = _mlp_backward(docc, p, cm, Bm, Wm, bm, Vm, am,
                                      Wom, bom)
    # fine decoder
    Bf, Wf, bf, Vf, af, Wof, bof = _unpack(ws, 1)
    cfull = jnp.concatenate([cf_ref[:], cm], axis=-1)
    dp_f, dcfull, wg_f = _mlp_backward(docc, p, cfull, Bf, Wf, bf, Vf, af,
                                       Wof, bof)
    dcf = dcfull[:, :HID]
    # middle-feature half is stop-gradient (decoder.py:184-187): dropped.

    dp = dp_m + dp_f
    dcm = dcm_m

    if with_color:
        Bc, Wc, bc, Vc, ac, Woc, boc = _unpack(ws, 2)
        # color head: rgb cotangent only; occ output overwritten upstream
        dout_c = jnp.concatenate(
            [g[:, :3], jnp.zeros_like(g[:, :1])], axis=-1)
        dp_c, dcc, wg_c = _mlp_backward(dout_c, p, cc_ref[:], Bc, Wc, bc,
                                        Vc, ac, Woc, boc)
        dp = dp + dp_c
    else:
        dcc = jnp.zeros_like(cc_ref[:])
        wg_c = [jnp.zeros_like(w) for w in
                [ws[2 * N_PER_DEC + k] for k in range(N_PER_DEC)]]

    dp_ref[:] = dp
    dcm_ref[:] = dcm
    dcf_ref[:] = dcf
    dcc_ref[:] = dcc

    if train_weights:
        for ref, val in zip(wgrad_refs, wg_m + wg_f + wg_c):
            acc(ref, val)
    else:
        @pl.when(first)
        def _():
            for ref in wgrad_refs:
                ref[:] = jnp.zeros_like(ref)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP

def _pad(x, n_pad):
    return jnp.concatenate([x, jnp.zeros((n_pad,) + x.shape[1:], x.dtype)])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_nice_decode(with_color: bool, train_weights: bool,
                      p, c_mid, c_fine, c_color, *weights):
    """Fused color/fine-stage decode: raw (N, 4) = [rgb, occ_mid+occ_fine].

    weights: pack_nice_weights(params) order.  with_color=False computes
    the 'fine' stage (rgb zeros).  train_weights=False skips weight-grad
    accumulation in the backward kernel (frozen decoders)."""
    return _fwd(with_color, p, c_mid, c_fine, c_color, weights)


def _fwd(with_color, p, c_mid, c_fine, c_color, weights):
    n = p.shape[0]
    n_pad = (-n) % TILE
    pp = _pad(p, n_pad)
    cmp_ = _pad(c_mid, n_pad)
    cfp = _pad(c_fine, n_pad)
    ccp = _pad(c_color, n_pad)
    n_tiles = pp.shape[0] // TILE

    tile_spec = lambda w: pl.BlockSpec(
        (TILE, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, with_color),
        grid=(n_tiles,),
        in_specs=[tile_spec(3), tile_spec(HID), tile_spec(HID),
                  tile_spec(HID)] + w_specs,
        out_specs=tile_spec(4),
        out_shape=jax.ShapeDtypeStruct((pp.shape[0], 4), jnp.float32),
    )(pp, cmp_, cfp, ccp, *weights)
    return out[:n]


def _fwd_rule(with_color, train_weights, p, c_mid, c_fine, c_color,
              *weights):
    out = _fwd(with_color, p, c_mid, c_fine, c_color, weights)
    return out, (p, c_mid, c_fine, c_color, weights)


def _bwd_rule(with_color, train_weights, res, g):
    p, c_mid, c_fine, c_color, weights = res
    n = p.shape[0]
    n_pad = (-n) % TILE
    pp = _pad(p, n_pad)
    cmp_ = _pad(c_mid, n_pad)
    cfp = _pad(c_fine, n_pad)
    ccp = _pad(c_color, n_pad)
    gp = _pad(g, n_pad)   # zero cotangent on padding -> no wgrad pollution
    n_tiles = pp.shape[0] // TILE

    tile_spec = lambda w: pl.BlockSpec(
        (TILE, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    # weight grads: every tile maps to the same (only) block -> sequential
    # accumulation across the grid
    wg_specs = [pl.BlockSpec(w.shape,
                             (lambda i, _nd=len(w.shape): (0,) * _nd),
                             memory_space=pltpu.VMEM) for w in weights]
    wg_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                 for w in weights]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, with_color, train_weights),
        grid=(n_tiles,),
        in_specs=[tile_spec(3), tile_spec(HID), tile_spec(HID),
                  tile_spec(HID), tile_spec(4)] + w_specs,
        out_specs=[tile_spec(3), tile_spec(HID), tile_spec(HID),
                   tile_spec(HID)] + wg_specs,
        out_shape=[jax.ShapeDtypeStruct((pp.shape[0], 3), jnp.float32),
                   jax.ShapeDtypeStruct((pp.shape[0], HID), jnp.float32),
                   jax.ShapeDtypeStruct((pp.shape[0], HID), jnp.float32),
                   jax.ShapeDtypeStruct((pp.shape[0], HID), jnp.float32)]
        + wg_shapes,
    )(pp, cmp_, cfp, ccp, gp, *weights)

    dp, dcm, dcf, dcc = [o[:n] for o in outs[:4]]
    wgrads = outs[4:]
    return (dp, dcm, dcf, dcc) + tuple(wgrads)


fused_nice_decode.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Reference (pure jnp) implementation for testing equivalence

def reference_nice_decode(with_color, p, c_mid, c_fine, c_color, *weights):
    """Same math as the kernels, in plain jnp (the autodiff oracle)."""
    Bm, Wm, bm, Vm, am, Wom, bom = _unpack(list(weights), 0)
    occ_mid = _mlp_forward(p, c_mid, Bm, Wm, bm, Vm, am, Wom, bom)[:, 0]
    Bf, Wf, bf, Vf, af, Wof, bof = _unpack(list(weights), 1)
    cfull = jnp.concatenate(
        [c_fine, jax.lax.stop_gradient(c_mid)], axis=-1)
    occ_fine = _mlp_forward(p, cfull, Bf, Wf, bf, Vf, af, Wof, bof)[:, 0]
    occ = occ_mid + occ_fine
    if with_color:
        Bc, Wc, bc, Vc, ac, Woc, boc = _unpack(list(weights), 2)
        rgb = _mlp_forward(p, c_color, Bc, Wc, bc, Vc, ac, Woc, boc)[:, :3]
    else:
        rgb = jnp.zeros((p.shape[0], 3), jnp.float32)
    return jnp.concatenate([rgb, occ[:, None]], axis=-1)
