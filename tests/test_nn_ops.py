"""Unit tests for the neural ops (GRU, attention, layer norm) against
independent NumPy oracles."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from skrx.ops.attention import (dense, feedforward_conv1, layer_norm,
                                multihead_attention_kyubyong)
from skrx.ops.rnn import gru_init, gru_step, stacked_gru_step


def _np_gru(params, x, h):
    """TF GRUCell semantics in NumPy."""
    gw, gb = np.asarray(params["gate_w"]), np.asarray(params["gate_b"])
    cw, cb = np.asarray(params["cand_w"]), np.asarray(params["cand_b"])
    xh = np.concatenate([x, h], -1)
    gates = 1 / (1 + np.exp(-(xh @ gw + gb)))
    r, u = np.split(gates, 2, -1)
    c = np.tanh(np.concatenate([x, r * h], -1) @ cw + cb)
    return u * h + (1 - u) * c


def test_gru_step_matches_numpy():
    rng = np.random.default_rng(0)
    p = gru_init(jax.random.key(0), 6, 4)
    x = rng.standard_normal((3, 6)).astype(np.float32)
    h = rng.standard_normal((3, 4)).astype(np.float32)
    got = np.asarray(gru_step(p, jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(got, _np_gru(p, x, h), rtol=1e-5, atol=1e-6)


def test_stacked_gru_shapes():
    ps = [gru_init(jax.random.key(i), 6 if i == 0 else 4, 4) for i in range(2)]
    x = jnp.ones((3, 6))
    states = [jnp.zeros((3, 4)), jnp.zeros((3, 4))]
    out, new_states = stacked_gru_step(ps, x, states)
    assert out.shape == (3, 4) and len(new_states) == 2


def test_layer_norm_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 7, 8)).astype(np.float32)
    scale = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale),
                                jnp.asarray(bias)))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    expected = scale * (x - mu) / np.sqrt(var + 1e-8) + bias
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_attention_causality_and_masks():
    """Future positions must not influence earlier outputs; fully-padded
    keys/queries behave per the reference's masking rules."""
    rng = np.random.default_rng(2)
    b, t, d = 2, 6, 8
    params = {c: {"w": jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.1),
                  "b": jnp.zeros((d,))} for c in "qkv"}
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    out1 = np.asarray(multihead_attention_kyubyong(params, jnp.asarray(x),
                                                   jnp.asarray(x), 2, True))
    # perturb the LAST timestep only: earlier outputs must be unchanged
    x2 = x.copy()
    x2[:, -1, :] += 10.0
    out2 = np.asarray(multihead_attention_kyubyong(params, jnp.asarray(x2),
                                                   jnp.asarray(x2), 2, True))
    np.testing.assert_allclose(out1[:, :-1], out2[:, :-1], rtol=1e-5,
                               atol=1e-5)

    # zero queries (query mask) -> output equals residual (queries)
    xq = x.copy()
    xq[:, 0, :] = 0.0
    out3 = np.asarray(multihead_attention_kyubyong(params, jnp.asarray(xq),
                                                   jnp.asarray(x), 2, True))
    np.testing.assert_allclose(out3[:, 0], xq[:, 0], atol=1e-6)


def test_ffn_residual():
    rng = np.random.default_rng(3)
    d = 8
    params = {"ff1": {"w": jnp.zeros((d, d)), "b": jnp.zeros((d,))},
              "ff2": {"w": jnp.zeros((d, d)), "b": jnp.zeros((d,))}}
    x = jnp.asarray(rng.standard_normal((2, 3, d)).astype(np.float32))
    out = feedforward_conv1(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))  # zero net + residual


def test_loss_helpers_match_session_model_inline_math():
    """The library loss helpers (skrx/ops/losses.py) equal the GRU4Rec-family
    inline formulations when fed diagonal-masked in-batch logits — pins the
    helpers so a drop-in use stays correct."""
    import jax
    import jax.numpy as jnp
    from skrx.ops.losses import bpr_max_loss, top1_loss, top1_max_loss

    rng = np.random.default_rng(0)
    b = 6
    logits = jnp.asarray(rng.standard_normal((b, b)).astype(np.float32))
    y_pos = jnp.diagonal(logits)
    eye = jnp.eye(b, dtype=bool)
    neg_masked = jnp.where(eye, -jnp.inf, logits)

    # inline GRU4RecPlus bpr-max: softmax over non-diagonal negatives
    w = jax.nn.softmax(neg_masked, axis=-1)
    p = jnp.sum(w * jax.nn.sigmoid(y_pos[:, None] - logits)
                * (~eye), axis=-1)
    ref_bprmax = -jnp.log(p + 1e-24)
    got = bpr_max_loss(y_pos, jnp.where(eye, -jnp.inf, logits))
    # helper computes sigmoid(pos - (-inf)) = 1 on the diagonal but its
    # softmax weight there is 0, so the results agree
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_bprmax),
                               rtol=1e-5, atol=1e-6)

    # TOP1 on explicit negatives
    negs = jnp.asarray(rng.standard_normal((b, 4)).astype(np.float32))
    ref_top1 = jnp.mean(jax.nn.sigmoid(negs - y_pos[:, None])
                        + jax.nn.sigmoid(negs ** 2), axis=-1)
    np.testing.assert_allclose(np.asarray(top1_loss(y_pos, negs)),
                               np.asarray(ref_top1), rtol=1e-6)

    wn = jax.nn.softmax(negs, axis=-1)
    ref_t1m = jnp.sum(wn * (jax.nn.sigmoid(negs - y_pos[:, None])
                            + jax.nn.sigmoid(negs ** 2)), axis=-1)
    np.testing.assert_allclose(np.asarray(top1_max_loss(y_pos, negs)),
                               np.asarray(ref_t1m), rtol=1e-6)


def test_info_nce_loss_matches_manual():
    import jax
    import jax.numpy as jnp
    from skrx.ops.losses import info_nce_loss

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))
    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    pn = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    logits = an @ pn.T / 0.2
    ref = -jnp.diagonal(jax.nn.log_softmax(logits, axis=-1))
    np.testing.assert_allclose(np.asarray(info_nce_loss(a, p, 0.2)),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)
