"""Point-coordinate embeddings for the decoders.

- 'fourier': learnable Gaussian Fourier features, sin(x @ B), B ~ N(0, 25^2),
  93 output dims (reference decoder.py:7-30).
- 'nerf': NeRF positional encoding, [x, sin(fx), cos(fx), ...]; color decoder
  uses multires 10 log-sampled, others multires 5 linear (decoder.py:33-67,
  135-144).
- 'same': identity (decoder.py:82-88).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_fourier_embedding(key, in_dim: int = 3, mapping_size: int = 93,
                           scale: float = 25.0):
    return {"B": jax.random.normal(key, (in_dim, mapping_size)) * scale}


def embedding_dim(method: str, name: str = "", in_dim: int = 3) -> int:
    if method == "fourier":
        return 93
    if method == "same":
        return in_dim
    if method == "nerf":
        multires = 10 if "color" in name else 5
        return multires * 2 * in_dim + in_dim
    if method == "fc_relu":
        return 93
    raise ValueError(f"unknown embedding method {method}")


def _nerf_pe(x: jnp.ndarray, multires: int, log_sampling: bool) -> jnp.ndarray:
    if log_sampling:
        freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires)
    else:
        freqs = jnp.linspace(2.0 ** 0.0, 2.0 ** (multires - 1), multires)
    outs = [x]
    for f in freqs:  # static unroll; multires is a Python int
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def apply_embedding(params, x: jnp.ndarray, method: str, name: str = "") -> jnp.ndarray:
    if method == "fourier":
        # args reach O(100); low-precision matmul would corrupt sin()
        return jnp.sin(jnp.matmul(x, params["B"], precision="highest"))
    if method == "same":
        return x
    if method == "nerf":
        multires = 10 if "color" in name else 5
        return _nerf_pe(x, multires, log_sampling=("color" in name))
    if method == "fc_relu":
        return jax.nn.relu(jnp.matmul(x, params["w"], precision="highest") + params["b"])
    raise ValueError(f"unknown embedding method {method}")
