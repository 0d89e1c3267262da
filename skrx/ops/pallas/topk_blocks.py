"""Pallas blockwise top-k over very large catalogs.

For full-catalog ranking the evaluator needs top-k of a (B, N) score matrix
where N can be millions. A monolithic `lax.top_k` keeps the whole row
resident; this kernel streams the item axis through VMEM in lane-aligned
blocks, keeps only each block's top-k candidates (grid-parallel, one block
per program), and a final cheap `lax.top_k` over the (B, blocks*k)
candidates produces the exact result — the same two-stage local/global merge
the cross-chip evaluator uses over the mesh (skrx/parallel/topk_merge.py),
applied within a chip. Exactness: every global top-k element is its block's
top-<=k element, so it survives stage one; ties resolve to the lower global
index, matching `lax.top_k`.

Falls back to interpret mode off-TPU (tests run it on CPU).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["blockwise_topk"]


def _block_topk_kernel(k, k_eff, scores_ref, vals_ref, idx_ref):
    # lax.top_k has no Pallas TPU lowering; select iteratively: k rounds of
    # (max, argmax, mask-out) over the VMEM block — each round is one VPU
    # reduction, so the kernel stays bandwidth-bound on the block load.
    j = pl.program_id(0)
    block = scores_ref[...]                       # (B, BLOCK_N)
    bsz, bn = block.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bsz, bn), 1)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (bsz, k_eff), 1)
    offset = j * bn

    init_vals = jnp.full((bsz, k_eff), -jnp.inf, vals_ref.dtype)
    init_idx = jnp.full((bsz, k_eff), jnp.iinfo(jnp.int32).max // 2, jnp.int32)

    def body(i, carry):
        block, vals_acc, idx_acc = carry
        best = jnp.max(block, axis=1)                       # (B,)
        # argmax with lowest-index tie-breaking
        is_best = block == best[:, None]
        best_idx = jnp.min(jnp.where(is_best, col_ids, bn), axis=1)
        # one-hot write into column i (dynamic lane stores don't lower)
        sel = out_cols == i
        vals_acc = jnp.where(sel, best[:, None], vals_acc)
        idx_acc = jnp.where(sel, best_idx[:, None] + offset, idx_acc)
        block = jnp.where(col_ids == best_idx[:, None], -jnp.inf, block)
        return block, vals_acc, idx_acc

    _, vals_acc, idx_acc = jax.lax.fori_loop(0, k, body,
                                             (block, init_vals, init_idx))
    vals_ref[...] = vals_acc
    idx_ref[...] = idx_acc


@functools.partial(jax.jit, static_argnames=("k", "block_n", "interpret"))
def blockwise_topk(scores: jnp.ndarray, k: int, block_n: int = 4096,
                   interpret: bool = False):
    """Exact (values, indices) top-k per row of ``scores`` (B, N).

    ``block_n`` should be a multiple of 128 (lane width). N is padded up to a
    block multiple with -inf.
    """
    b, n = scores.shape
    n_blocks = max(-(-n // block_n), 1)
    padded_n = n_blocks * block_n
    if padded_n != n:
        scores = jnp.pad(scores, ((0, 0), (0, padded_n - n)),
                         constant_values=-jnp.inf)
    # candidate count per block, rounded up to the 128-lane tile so the
    # output block shape is TPU-legal
    k_eff = min(-(-k // 128) * 128, block_n)

    vals, idx = pl.pallas_call(
        functools.partial(_block_topk_kernel, min(k, block_n), k_eff),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((b, block_n), lambda j: (0, j))],
        out_specs=(pl.BlockSpec((b, k_eff), lambda j: (0, j)),
                   pl.BlockSpec((b, k_eff), lambda j: (0, j))),
        out_shape=(jax.ShapeDtypeStruct((b, n_blocks * k_eff), scores.dtype),
                   jax.ShapeDtypeStruct((b, n_blocks * k_eff), jnp.int32)),
        interpret=interpret,
    )(scores)

    # final merge over the candidate set; ties broken toward lower global
    # index by biasing the comparison key with the candidate order (blocks
    # are emitted left to right, and top_k within a block is index-ordered)
    top_vals, pos = jax.lax.top_k(vals, min(k, vals.shape[1]))
    top_idx = jnp.take_along_axis(idx, pos, axis=1)
    return top_vals, top_idx
