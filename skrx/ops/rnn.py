"""Recurrent cells for the session-RNN family.

TPU-native equivalent of the TF1 ``tf.nn.rnn_cell.GRUCell`` stacks used by
GRU4Rec/GRU4RecPlus/SRGNN (GRU4Rec.py:147-151, SRGNN.py:120-143): a pure
functional GRU step matching TF semantics (update gate u: h' = u*h +
(1-u)*c; gate kernels concatenated [x, h]), applied per step inside
`lax.scan` so whole sequences compile to one fused loop.
"""
from typing import Dict, List

import jax
import jax.numpy as jnp

__all__ = ["gru_init", "gru_step", "stacked_gru_step"]


def gru_init(key: jax.Array, input_dim: int, hidden_dim: int) -> Dict:
    """TF GRUCell layout: gate kernel (in+hid, 2*hid) for [r, u], candidate
    kernel (in+hid, hid). glorot init, gate bias 1.0 (TF default)."""
    k1, k2 = jax.random.split(key)
    glorot = jax.nn.initializers.glorot_uniform()
    return {
        "gate_w": glorot(k1, (input_dim + hidden_dim, 2 * hidden_dim)),
        "gate_b": jnp.ones((2 * hidden_dim,), jnp.float32),
        "cand_w": glorot(k2, (input_dim + hidden_dim, hidden_dim)),
        "cand_b": jnp.zeros((hidden_dim,), jnp.float32),
    }


def gru_step(params: Dict, x: jnp.ndarray, h: jnp.ndarray,
             activation=jnp.tanh) -> jnp.ndarray:
    """One GRU step. x: (B, in), h: (B, hid) -> new h (B, hid)."""
    xh = jnp.concatenate([x, h], axis=-1)
    gates = jax.nn.sigmoid(xh @ params["gate_w"] + params["gate_b"])
    r, u = jnp.split(gates, 2, axis=-1)
    xrh = jnp.concatenate([x, r * h], axis=-1)
    c = activation(xrh @ params["cand_w"] + params["cand_b"])
    return u * h + (1.0 - u) * c


def stacked_gru_step(layer_params: List[Dict], x: jnp.ndarray,
                     states: List[jnp.ndarray],
                     activation=jnp.tanh):
    """Stacked GRU layers; returns (top output, new states list)."""
    new_states = []
    inp = x
    for p, h in zip(layer_params, states):
        h_new = gru_step(p, inp, h, activation)
        new_states.append(h_new)
        inp = h_new
    return inp, new_states
