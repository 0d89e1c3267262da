"""Self-attention primitives for the sequential model family.

TPU-native equivalents of the reference's TF1 attention stacks
(SASRec.py:108-308 kyubyong-style blocks, BERT4Rec/modeling.py transformer):
pure-function multi-head attention with the exact masking semantics of the
reference implementations (key mask from |sum(keys)| sign, post-softmax
query-mask multiply, additive -2^32 causal mask), expressed as batched
einsums that XLA tiles onto the MXU.
"""
from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["layer_norm", "dense", "multihead_attention_kyubyong",
           "feedforward_conv1", "dropout"]

_NEG_BIG = -(2.0 ** 32) + 1


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               epsilon: float = 1e-8) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return scale * (x - mean) / jnp.sqrt(var + epsilon) + bias


def dense(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def dropout(key: Optional[jax.Array], x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout; identity when key is None (eval) or rate == 0."""
    if key is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def multihead_attention_kyubyong(params: Dict, queries: jnp.ndarray,
                                 keys: jnp.ndarray, num_heads: int,
                                 causal: bool = True,
                                 dropout_rate: float = 0.0,
                                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Multi-head attention with the reference's masking quirks
    (SASRec.py:174-270):

    * key mask = sign(|sum(keys, -1)|)  -> -2^32 pre-softmax;
    * causal lower-triangular -2^32 pre-softmax;
    * query mask = sign(|sum(queries, -1)|) multiplied AFTER softmax;
    * residual adds ``queries`` (the layer-normed input).
    """
    b, t, c = queries.shape
    h = num_heads
    hd = c // h
    q = dense(queries, params["q"]).reshape(b, t, h, hd)
    k = dense(keys, params["k"]).reshape(b, t, h, hd)
    v = dense(keys, params["v"]).reshape(b, t, h, hd)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)

    key_mask = (jnp.abs(jnp.sum(keys, axis=-1)) > 0)          # (B, T)
    logits = jnp.where(key_mask[:, None, None, :], logits, _NEG_BIG)
    if causal:
        tril = jnp.tril(jnp.ones((t, t), bool))
        logits = jnp.where(tril[None, None], logits, _NEG_BIG)

    probs = jax.nn.softmax(logits, axis=-1)
    query_mask = (jnp.abs(jnp.sum(queries, axis=-1)) > 0).astype(probs.dtype)
    probs = probs * query_mask[:, None, :, None]
    probs = dropout(rng, probs, dropout_rate)

    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, c)
    return out + queries


def feedforward_conv1(params: Dict, x: jnp.ndarray, dropout_rate: float = 0.0,
                      rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Position-wise FFN (two 1x1 convs), relu inner, dropout after each,
    residual (SASRec.py:276-308)."""
    k1 = k2 = None
    if rng is not None:
        k1, k2 = jax.random.split(rng)
    h = jax.nn.relu(dense(x, params["ff1"]))
    h = dropout(k1, h, dropout_rate)
    h = dense(h, params["ff2"])
    h = dropout(k2, h, dropout_rate)
    return h + x
