"""Pallas threshold-pruned blockwise top-k over very large catalogs.

For full-catalog ranking the evaluator needs top-k of a (B, N) score matrix
where N can be millions, after setting train-item scores to -inf
(reference evaluator.py:197-200 + partial_sort in evaluate.h:33-45). A
monolithic ``lax.top_k`` keeps the whole row resident (measured 41ms for
(64, 1M) f32 on v5e); a naive blockwise kernel running k argmax rounds per
block is VPU-bound at k x N compares. This kernel cuts the selection work to
~O(N) with a two-pass threshold prune:

1. **Threshold pass (bandwidth-bound).** Per row, compute the max of every
   item block, then tau = k-th largest block max. At least k blocks have
   max >= tau, and each contributes one element >= tau, so the k-th largest
   element v_k >= tau: every global top-k element is >= tau.
2. **Extraction pass (Pallas, grid = item blocks).** Each program loads its
   score block once and runs an iterative lowest-index argmax loop
   (`lax.top_k` has no Pallas TPU lowering) that STOPS as soon as the block
   max falls below tau, capped at k rounds. For eval score distributions the
   expected number of extractions per block is k/n_blocks << 1, so the loop
   body almost never runs — the kernel is dominated by the block load.
3. **Merge (plain XLA).** A final `lax.top_k` over the (B, n_blocks*k_eff)
   candidates. Exactness: every global top-k element is >= tau and is its
   block's top-<=k element, so it survives extraction; ties resolve to the
   lower global index, matching `lax.top_k` (blocks are emitted left to
   right and extraction is index-ordered within a block).

**Fused train-item masking via a bit-packed mask.** ``mask_table`` (B, L)
fuses the evaluator's -inf masking into the selection. Materializing a
masked f32 copy — or even a (B, N) int8 bitmap — pays an XLA scatter whose
cost scales with the scattered ARRAY size on this chip (~6ms for a (64, 1M)
int8 target vs ~0.03ms for a (64, 128) one at the same update count).
Packing 32 items per uint32 word shrinks the scatter target 32x; since the
packer dedupes ids per row, bit-add == bit-or, so a plain add-scatter builds
the bitmap. The bit layout matches ``pltpu.repeat``'s tile semantics: with
W = block_n/32 words per block, word lane ``c % W`` holds, in bit
``c // W``, the mask for block column ``c`` — so unpacking is ONE lane-tile
repeat plus a shift by ``col_ids >> log2(W)``, entirely 2-D (Mosaic cannot
relayout (B, W, 32) -> (B, W*32) casts, and 3-D blocks tile only the last
two dims, costing ~2.4x). Both passes apply the mask at block load; the
cost is data-independent.

MEASURED (TPU v5e, B=64, N=1M, k=50, L=512): fused mask+top-k 3.3ms
regardless of score distribution vs 24ms XLA mask+`lax.top_k` (7.3x);
unmasked 2.9ms vs 41ms monolithic `lax.top_k` (14x). 3.3ms for the two
score passes is ~155 GB/s — this chip's measured streaming rate, i.e. the
kernel is at its bandwidth roofline.

Falls back to interpret mode off-TPU (tests run it on CPU).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["blockwise_topk"]

_BITS = 32


def _apply_mask(block, packed_ref, col_ids, interpret):
    """(B, BN) block, (B, BN/32) uint32 words: word lane c % W holds, in bit
    c // W, the mask for block column c (tile-repeat unpack layout)."""
    packed = packed_ref[...]
    w = packed.shape[1]
    if interpret:
        rep = jnp.tile(packed, (1, _BITS))
    else:
        from jax.experimental.pallas import tpu as pltpu
        rep = pltpu.repeat(packed, _BITS, axis=1)
    bit = (col_ids // w).astype(jnp.uint32)
    return jnp.where((rep >> bit) & jnp.uint32(1) != 0, -jnp.inf, block)


def _block_max_kernel(interpret, scores_ref, packed_ref, out_ref):
    block = scores_ref[...]                          # (B, BN)
    if packed_ref is not None:
        bsz, bn = block.shape
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (bsz, bn), 1)
        block = _apply_mask(block, packed_ref, col_ids, interpret)
    out_ref[...] = jnp.broadcast_to(
        jnp.max(block, axis=1, keepdims=True), out_ref.shape)


def _extract_kernel(k, k_eff, interpret, scores_ref, packed_ref, tau_ref,
                    vals_ref, idx_ref):
    j = pl.program_id(0)
    block = scores_ref[...]                          # (B, BN)
    bsz, bn = block.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bsz, bn), 1)
    if packed_ref is not None:
        block = _apply_mask(block, packed_ref, col_ids, interpret)
    tau = tau_ref[:, 0]                              # (B,)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (bsz, k_eff), 1)
    offset = j * bn

    # accumulate via ref read-modify-write so the while carry stays small
    vals_ref[...] = jnp.full((bsz, k_eff), -jnp.inf, vals_ref.dtype)
    idx_ref[...] = jnp.full((bsz, k_eff), jnp.iinfo(jnp.int32).max // 2,
                            jnp.int32)

    def cond(carry):
        i, _, cur_max = carry
        return (i < k) & jnp.any(cur_max >= tau)

    def body(carry):
        i, block, cur_max = carry
        alive = cur_max >= tau                              # (B,)
        # lowest-index argmax of each alive row
        is_best = block == cur_max[:, None]
        best_idx = jnp.min(jnp.where(is_best, col_ids, bn), axis=1)
        sel = (out_cols == i) & alive[:, None]
        vals_ref[...] = jnp.where(sel, cur_max[:, None], vals_ref[...])
        idx_ref[...] = jnp.where(sel, best_idx[:, None] + offset, idx_ref[...])
        # mask the extracted (leftmost-tied) element; dead rows unchanged
        block = jnp.where((col_ids == best_idx[:, None]) & alive[:, None],
                          -jnp.inf, block)
        return i + 1, block, jnp.max(block, axis=1)

    jax.lax.while_loop(cond, body, (0, block, jnp.max(block, axis=1)))


@functools.partial(jax.jit,
                   static_argnames=("k", "block_n", "interpret"))
def blockwise_topk(scores: jnp.ndarray, k: int, block_n: int = 4096,
                   interpret: bool = False, mask_table: jnp.ndarray = None):
    """Exact (values, indices) top-k per row of ``scores`` (B, N).

    ``mask_table`` (B, L) int32 excludes ``scores[b, mask_table[b, :]]``
    from the result, fused into the selection (entries outside [0, N) are
    padding and ignored; duplicate entries are allowed) — the evaluator's
    train-item -inf masking without materializing a masked copy. Masked
    slots beyond the number of surviving items carry -inf values with
    sentinel (out-of-range) indices. ``block_n`` must be a multiple of 4096
    (so the packed mask block keeps 128-lane words). N is padded up to a
    block multiple with -inf.
    """
    assert block_n % _BITS == 0, "block_n must be a multiple of 32"
    if mask_table is not None and not interpret:
        # packed words per block must stay 128-lane aligned on real TPU
        assert block_n % (_BITS * 128) == 0, \
            "masked block_n must be a multiple of 4096 on TPU"
    b, n = scores.shape
    n_blocks = max(-(-n // block_n), 1)
    padded_n = n_blocks * block_n
    w32 = block_n // _BITS                           # words per block

    packed = None
    if mask_table is not None:
        # word lane c % w32 of block j, bit c // w32  <->  block column c
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], mask_table.shape)
        # bit-add == bit-or only for unique ids: sort per row and keep first
        # occurrences so duplicate table entries (legal for mask_items)
        # cannot carry into neighboring bits
        sorted_ids = jnp.sort(jnp.where((mask_table >= 0) & (mask_table < n),
                                        mask_table, n), axis=1)
        first = jnp.concatenate(
            [jnp.ones((b, 1), bool),
             sorted_ids[:, 1:] != sorted_ids[:, :-1]], axis=1)
        valid = (sorted_ids < n) & first
        ids = jnp.where(valid, sorted_ids, 0)
        c = ids % block_n
        word = (ids // block_n) * w32 + c % w32
        bit = (c // w32).astype(jnp.uint32)
        packed = jnp.zeros((b, n_blocks * w32), jnp.uint32).at[
            rows, word].add(
            jnp.where(valid, jnp.uint32(1) << bit, jnp.uint32(0)),
            mode="drop")

    if padded_n != n:
        scores = jnp.pad(scores, ((0, 0), (0, padded_n - n)),
                         constant_values=-jnp.inf)

    # candidate count per block, rounded up to the 128-lane tile so the
    # output block shape is TPU-legal
    k_cap = min(k, block_n)
    k_eff = min(-(-k // 128) * 128, block_n)

    def specs():
        in_specs = [pl.BlockSpec((b, block_n), lambda j: (0, j))]
        ops = [scores]
        if packed is not None:
            in_specs.append(pl.BlockSpec((b, w32), lambda j: (0, j)))
            ops.append(packed)
        return in_specs, ops

    # threshold pass: per-row max of every (masked) block; Pallas so the
    # bit-unpacked mask never materializes at (B, N)
    in_specs, operands = specs()
    if packed is not None:
        bm_kernel = functools.partial(_block_max_kernel, interpret)
    else:
        def bm_kernel(scores_ref, out_ref):
            return _block_max_kernel(interpret, scores_ref, None, out_ref)
    bm = pl.pallas_call(
        bm_kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, 128), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n_blocks * 128), scores.dtype),
        interpret=interpret,
    )(*operands)[:, ::128]                                   # (B, n_blocks)

    # tau = k-th largest (masked) block max: a lower bound on the k-th
    # largest (masked) element whenever n_blocks >= k; degenerate small-N
    # case uses -inf, i.e. no pruning
    if n_blocks >= k:
        tau = jax.lax.top_k(bm, k)[0][:, k - 1:k]            # (B, 1)
    else:
        tau = jnp.full((b, 1), -jnp.inf, scores.dtype)
    tau = jnp.broadcast_to(tau, (b, 128))  # lane-aligned VMEM operand

    in_specs, operands = specs()
    in_specs.append(pl.BlockSpec((b, 128), lambda j: (0, 0)))
    operands.append(tau)
    if packed is not None:
        kernel = functools.partial(_extract_kernel, k_cap, k_eff, interpret)
    else:
        def kernel(scores_ref, tau_ref, vals_ref, idx_ref):
            return _extract_kernel(k_cap, k_eff, interpret, scores_ref, None,
                                   tau_ref, vals_ref, idx_ref)

    vals, idx = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((b, k_eff), lambda j: (0, j)),
                   pl.BlockSpec((b, k_eff), lambda j: (0, j))),
        out_shape=(jax.ShapeDtypeStruct((b, n_blocks * k_eff), scores.dtype),
                   jax.ShapeDtypeStruct((b, n_blocks * k_eff), jnp.int32)),
        interpret=interpret,
    )(*operands)

    # final merge over the candidate set; ties break toward the lower global
    # index because blocks are emitted left to right and extraction within a
    # block is (value desc, index asc)
    top_vals, pos = jax.lax.top_k(vals, min(k, vals.shape[1]))
    top_idx = jnp.take_along_axis(idx, pos, axis=1)
    return top_vals, top_idx
