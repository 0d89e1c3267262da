"""Loss functions and distance helpers (pure JAX, element-wise — XLA fuses
these into the surrounding matmuls).

Capability parity with reference skrec/utils/torch.py:20-121 and
skrec/utils/tf1x.py (bpr/l2/sigmoid-CE/square/hinge), plus the session-RNN
losses (TOP1, BPR-max, TOP1-max from GRU4Rec/GRU4RecPlus,
GRU4Rec.py:121-135, GRU4RecPlus.py:137-166) and InfoNCE used by the
contrastive family — all expressed once here instead of per-model.

Reductions: like the reference, element-wise losses return per-example
values; callers reduce.
"""
import jax
import jax.numpy as jnp

__all__ = ["inner_product", "euclidean_distance", "l2_distance", "bpr_loss",
           "l2_loss", "sigmoid_cross_entropy", "square_loss", "hinge_loss",
           "top1_loss", "bpr_max_loss", "top1_max_loss", "info_nce_loss",
           "log_loss"]


def inner_product(a, b, axis: int = -1):
    return jnp.sum(a * b, axis=axis)


def euclidean_distance(a, b, axis: int = -1):
    return jnp.sqrt(jnp.sum(jnp.square(a - b), axis=axis) + 1e-12)


l2_distance = euclidean_distance


def bpr_loss(y_pos, y_neg):
    """-log sigmoid(y_pos - y_neg), element-wise."""
    return -jax.nn.log_sigmoid(y_pos - y_neg)


def l2_loss(*weights):
    """sum(||w||^2) / 2 over all given arrays (reference torch.py:67-75)."""
    return 0.5 * sum(jnp.sum(jnp.square(w)) for w in weights)


def sigmoid_cross_entropy(y_pre, y_true):
    """Numerically-stable BCE with logits, element-wise."""
    y_true = jnp.asarray(y_true, dtype=y_pre.dtype)
    return jnp.maximum(y_pre, 0) - y_pre * y_true + jnp.log1p(jnp.exp(-jnp.abs(y_pre)))


def square_loss(y_pre, y_true):
    y_true = jnp.asarray(y_true, dtype=y_pre.dtype)
    return jnp.square(y_pre - y_true)


def hinge_loss(y_pos, y_neg, margin: float = 1.0):
    """max(0, margin - (y_pos - y_neg)) (reference tf1x.py hinge)."""
    return jnp.maximum(0.0, margin - (y_pos - y_neg))


def log_loss(logits):
    """-log sigmoid(logits) — used by pointwise positive-only objectives."""
    return -jax.nn.log_sigmoid(logits)


def top1_loss(y_pos, y_neg):
    """TOP1: sigmoid(neg - pos) + sigmoid(neg^2), averaged over negatives.

    y_pos: (...,); y_neg: (..., n_neg).
    """
    diff = y_neg - y_pos[..., None]
    return jnp.mean(jax.nn.sigmoid(diff) + jax.nn.sigmoid(jnp.square(y_neg)),
                    axis=-1)


def _neg_softmax_weights(y_neg):
    return jax.nn.softmax(y_neg, axis=-1)


def bpr_max_loss(y_pos, y_neg, reg: float = 0.0):
    """BPR-max with softmax-weighted negatives + score regularization
    (GRU4RecPlus.py:137-166 semantics).

    NOTE: ``y_neg`` must contain NEGATIVES ONLY. For in-batch (B, B) logits
    the positive sits on the diagonal — mask it to -inf before passing
    (GRU4Rec's session walker does this in its inline _softmax_neg)."""
    w = _neg_softmax_weights(y_neg)
    p = jnp.sum(w * jax.nn.sigmoid(y_pos[..., None] - y_neg), axis=-1)
    loss = -jnp.log(p + 1e-24)
    if reg:
        loss = loss + reg * jnp.sum(w * jnp.square(y_neg), axis=-1)
    return loss


def top1_max_loss(y_pos, y_neg):
    """TOP1-max: softmax-weighted TOP1. Same in-batch caveat as
    :func:`bpr_max_loss`: mask the diagonal out of (B, B) logits first."""
    w = _neg_softmax_weights(y_neg)
    diff = y_neg - y_pos[..., None]
    return jnp.sum(w * (jax.nn.sigmoid(diff) + jax.nn.sigmoid(jnp.square(y_neg))),
                   axis=-1)


def info_nce_loss(anchor, positive, temperature: float = 0.2,
                  negatives=None):
    """InfoNCE. With ``negatives=None`` uses in-batch negatives: positives of
    the other rows are the negative pool (the LightGCL/SLMRec/MGCN pattern).

    anchor, positive: (B, D). Returns (B,) losses.
    """
    anchor = anchor / (jnp.linalg.norm(anchor, axis=-1, keepdims=True) + 1e-12)
    positive = positive / (jnp.linalg.norm(positive, axis=-1, keepdims=True) + 1e-12)
    pos_logit = jnp.sum(anchor * positive, axis=-1) / temperature
    if negatives is None:
        logits = anchor @ positive.T / temperature  # (B, B)
        return jax.nn.logsumexp(logits, axis=-1) - pos_logit
    negatives = negatives / (jnp.linalg.norm(negatives, axis=-1, keepdims=True) + 1e-12)
    neg_logits = jnp.einsum("bd,bnd->bn", anchor, negatives) / temperature
    all_logits = jnp.concatenate([pos_logit[:, None], neg_logits], axis=-1)
    return jax.nn.logsumexp(all_logits, axis=-1) - pos_logit
