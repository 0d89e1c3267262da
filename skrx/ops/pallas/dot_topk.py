"""Fused full-catalog scoring + top-k: the (B, N) score matrix never exists.

For dot-scoring models (the MF/graph family: score = user_vec @ item_emb.T
+ bias — reference BPRMF.py:84-88 and the whole LightGCN-style family), the
evaluator pipeline `predict -> mask -> top-k` moves the score matrix through
HBM three times (one write + the two streaming reads of the threshold-pruned
top-k in topk_blocks.py): ~500 MB of traffic at (1024, 40960). But at d<=256
the scores are nearly free to COMPUTE (one (block_b, d) x (d, block_n) MXU
matmul per block, ~0.1 ms/pass for the whole matrix), so both passes of the
threshold-pruned selection simply RECOMPUTE their score block in VMEM:

1. threshold pass: matmul block -> mask -> per-sub-block maxima
   (emit_submaxes), then tau = k-th largest sub-max via vmem_topk;
2. extraction pass: matmul block -> mask -> tau-pruned iterative argmax
   (extract_block), then a vmem_topk merge of the per-block candidates.

Item-table traffic replaces score traffic: each pass reads N*d*4 bytes of
embeddings per batch tile (~80 MB total at (1024, 40960, d=64)) instead of
N*B*4 of scores (~340 MB), and nothing (B, N)-sized is ever written — so
full-catalog ranking of a 1M-item catalog at B=4096 needs ~50 MB of HBM
where the materialized path needs 16 GB.

Exactness: identical selection logic to topk_blocks.py (same tau bound,
same lowest-index tie-breaking). The scores themselves are computed by the
same MXU bf16-input/f32-accumulate path XLA uses for a default-precision
f32 jnp.matmul, so ranking matches the materialized pipeline BIT-FOR-BIT
(asserted on-chip in tests; an explicit bf16 operand cast was measured to
produce identical bits — Mosaic and XLA share the matmul lowering).

MEASURED (TPU v5e, k=50, d=64; scalar-chained true device time with the
dependency forced through FLOAT — round 4 corrected the round-3 chains,
whose integer x*0 dependency constant-folded and inflated every number
~2x; see topk_blocks.py and BASELINE.md round-4 correction): (1024, 40960)
masked incl. per-batch mask packing runs in 1.82 ms vs ~2.0 ms for the
blockwise kernel on ALREADY-MATERIALIZED scores (which the full pipeline
must also produce: +160 MB matmul write) — the fused kernel reads
2 x 10.5 MB of transposed item table per batch tile instead of three
(B, N) score passes, so from round 3 the evaluator auto-routes dot models
through it wherever the threshold-pruned selection engages (~32k+ items;
round 2 measured the opposite with dispatch-inflated timings of 5.9 vs
3.1 ms). The fused kernel's other value is MEMORY: (256, 1M) masked
ranking runs in 3.39 ms chained (75.5k users/s) with ~50 MB of HBM where
`predict` would materialize a 1 GB score block (4 GB at B=1024) — the
single-call serving/ranking primitive for huge catalogs (skrx/serve.py
routes to it from num_items >= 131072; round 2's pre-fold-tree number was
15.9 ms).

Falls back to interpret mode off-TPU (tests run it on CPU).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .topk_blocks import (_BITS, _apply_mask, emit_submaxes, extract_block,
                          pack_mask, vmem_topk)

__all__ = ["dot_topk", "dot_topk_candidates", "dot_topk_ranks",
           "pack_items"]


@functools.partial(jax.jit, static_argnames=("block_n",))
def pack_items(items: jnp.ndarray, bias: jnp.ndarray = None,
               block_n: int = 4096):
    """Pre-transpose + pad the item table for repeated ``dot_topk`` calls.

    ``items.T`` inside ``dot_topk`` materializes a full transposed copy of
    the padded table on EVERY call (~256 MB / ~2 ms at 1M items, d=64) and
    doubles the table's HBM residency while live; callers that rank many
    batches against one frozen table (the evaluator's per-eval loop,
    serving) should pack once and pass ``packed=`` + ``n=`` instead.

    Returns ``(items_t, bias2)``: the (d_sub, padded_n) transposed slab and
    the (1, padded_n) bias row with pad columns at -inf. ``block_n`` must
    match the later ``dot_topk`` calls.
    """
    n, d = items.shape
    items = jnp.asarray(items, jnp.float32)
    d_sub = -(-d // 8) * 8
    if d_sub != d:
        items = jnp.pad(items, ((0, 0), (0, d_sub - d)))
    n_blocks = max(-(-n // block_n), 1)
    padded_n = n_blocks * block_n
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    bias = jnp.asarray(bias, jnp.float32)
    if padded_n != n:
        items = jnp.pad(items, ((0, padded_n - n), (0, 0)))
        bias = jnp.pad(bias, (0, padded_n - n), constant_values=-jnp.inf)
    return items.T, bias.reshape(1, padded_n)


def _scores_block(uv_ref, items_ref, bias_ref, packed_ref, interpret):
    """(block_b, block_n) masked score block from VMEM-resident operands;
    ``items_ref`` holds a (d, block_n) TRANSPOSED item slab (so the HBM
    item stream is exactly N*d elements — an (N, d) layout would pad the
    lane dim to 128, doubling traffic at d=64)."""
    scores = jax.lax.dot_general(
        uv_ref[...], items_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    scores = scores + bias_ref[...]
    if packed_ref is not None:
        scores = _apply_mask(scores, packed_ref[...], interpret)
    return scores


def _dot_submax_kernel(interpret, uv_ref, items_ref,
                       bias_ref, packed_ref, out_ref):
    block = _scores_block(uv_ref, items_ref, bias_ref, packed_ref, interpret)
    emit_submaxes(block, out_ref)


def _dot_extract_kernel(k, k_eff, interpret, uv_ref, items_ref, bias_ref,
                        packed_ref, tau_ref, vals_ref, idx_ref, scratch_ref):
    j = pl.program_id(1)
    block = _scores_block(uv_ref, items_ref, bias_ref, packed_ref, interpret)
    extract_block(block, tau_ref[:, 0], k, k_eff, j * block.shape[1],
                  vals_ref, idx_ref, scratch_ref, interpret=interpret)


def dot_topk_candidates(uv: jnp.ndarray, items: jnp.ndarray,
                        bias: jnp.ndarray, k: int,
                        mask_table: jnp.ndarray = None, block_n: int = 4096,
                        block_b: int = 256, interpret: bool = False,
                        packed=None, n: int = None):
    """Fused score+threshold+extraction WITHOUT the final merge: returns
    ``(cand_vals, cand_ids, tau)`` exactly as
    ``topk_blocks.blockwise_candidates`` but with every score block
    recomputed in the MXU instead of read from HBM (see module header).
    The evaluator's rank-counting path (:func:`dot_topk_ranks`) consumes
    this directly; ``dot_topk`` adds the sorted merge.
    """
    b, d = uv.shape
    assert d <= 512, "re-budget VMEM before using dot_topk beyond d=512"
    assert block_n % 128 == 0 and (block_n // 128) & (block_n // 128 - 1) \
        == 0, "block_n must be 128 * a power of two"
    if mask_table is not None and not interpret:
        assert block_n % (_BITS * 128) == 0, \
            "masked block_n must be a multiple of 4096 on TPU"
    block_b = min(block_b, b)
    nb_b = -(-b // block_b)
    d_sub = -(-d // 8) * 8

    if packed is not None:
        assert n is not None, "packed dot_topk needs the true catalog size n"
        items_t, bias2 = packed
        assert items_t.shape[0] == d_sub, \
            "packed table dim does not match uv"
        padded_n = items_t.shape[1]
        n_blocks = padded_n // block_n
        assert n_blocks * block_n == padded_n and n <= padded_n
        if d_sub != d:
            uv = jnp.pad(uv, ((0, 0), (0, d_sub - d)))
    else:
        n = items.shape[0]
        assert items.shape[1] == d
        n_blocks = max(-(-n // block_n), 1)
        padded_n = n_blocks * block_n

        # pad the contraction dim to a SUBLANE multiple only: the item slab
        # is streamed transposed as (d, N), so d rides the 8-sublane f32
        # tile and the HBM item traffic is N*d*4 bytes — an (N, d) layout
        # would pad d to the 128-lane tile (2x the bytes at d=64). uv is
        # lane-padded instead (a (B, d) sliver, negligible).
        if d_sub != d:
            uv = jnp.pad(uv, ((0, 0), (0, d_sub - d)))
            items = jnp.pad(items, ((0, 0), (0, d_sub - d)))
        # catalog padding: zero item rows scored to -inf THROUGH THE BIAS so
        # pad columns can never rank (0-vector items would otherwise score 0)
        if bias is None:
            bias = jnp.zeros((n,), jnp.float32)
        if padded_n != n:
            items = jnp.pad(items, ((0, padded_n - n), (0, 0)))
            bias = jnp.pad(bias, (0, padded_n - n), constant_values=-jnp.inf)
        items_t = items.T                            # (d_sub, padded_n)
        bias2 = bias.reshape(1, padded_n)
    w32 = block_n // _BITS
    n_sub = n_blocks * 128

    packed = None
    if mask_table is not None:
        packed = pack_mask(mask_table, b, n, n_blocks, block_n)

    k_cap = min(k, block_n)
    k_eff = min(-(-k // 128) * 128, block_n)

    def specs():
        in_specs = [
            pl.BlockSpec((block_b, d_sub), lambda i, j: (i, 0)),
            pl.BlockSpec((d_sub, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ]
        ops = [uv, items_t, bias2]
        if packed is not None:
            in_specs.append(pl.BlockSpec((block_b, w32), lambda i, j: (i, j)))
            ops.append(packed)
        return in_specs, ops

    in_specs, operands = specs()
    if packed is not None:
        bm_kernel = functools.partial(_dot_submax_kernel, interpret)
    else:
        def bm_kernel(uv_ref, items_ref, bias_ref, out_ref):
            return _dot_submax_kernel(interpret, uv_ref,
                                      items_ref, bias_ref, None, out_ref)
    bm = pl.pallas_call(
        bm_kernel,
        grid=(nb_b, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, 128), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((nb_b * block_b, n_sub),
                                       jnp.float32),
        interpret=interpret,
    )(*operands)[:b]

    if n_sub >= k:
        from .topk_blocks import _TAU_MAX_W, _fold_submaxes, kth_largest
        bmf = _fold_submaxes(bm, max(_TAU_MAX_W, 2 * (-(-k // 128) * 128)))
        # k-th largest VALUE by bitwise bisection — ~4x less VPU work than
        # the k-argmax-round vmem_topk, identical tau (round 5)
        tau = kth_largest(bmf, k, interpret=interpret)
    else:
        tau = jnp.broadcast_to(jnp.full((b, 1), -jnp.inf, jnp.float32),
                               (b, 128))

    in_specs, operands = specs()
    in_specs.append(pl.BlockSpec((block_b, 128), lambda i, j: (i, 0)))
    operands.append(tau)
    if packed is not None:
        kernel = functools.partial(_dot_extract_kernel, k_cap, k_eff,
                                   interpret)
    else:
        def kernel(uv_ref, items_ref, bias_ref, tau_ref, vals_ref, idx_ref,
                   scratch_ref):
            return _dot_extract_kernel(k_cap, k_eff, interpret, uv_ref,
                                       items_ref, bias_ref, None, tau_ref,
                                       vals_ref, idx_ref, scratch_ref)

    from jax.experimental.pallas import tpu as pltpu
    from .topk_blocks import GROUP_ROUNDS
    cand_w = GROUP_ROUNDS * 128 + k_eff              # candidates per block
    vals, idx = pl.pallas_call(
        kernel,
        grid=(nb_b, n_blocks),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((block_b, cand_w), lambda i, j: (i, j)),
                   pl.BlockSpec((block_b, cand_w), lambda i, j: (i, j))),
        out_shape=(jax.ShapeDtypeStruct((nb_b * block_b, n_blocks * cand_w),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((nb_b * block_b, n_blocks * cand_w),
                                        jnp.int32)),
        scratch_shapes=[pltpu.VMEM((block_b, block_n), jnp.float32)],
        interpret=interpret,
    )(*operands)
    return vals[:b], idx[:b], tau


@functools.partial(jax.jit,
                   static_argnames=("k", "block_n", "block_b", "interpret",
                                    "n"))
def dot_topk(uv: jnp.ndarray, items: jnp.ndarray, bias: jnp.ndarray, k: int,
             mask_table: jnp.ndarray = None, block_n: int = 4096,
             block_b: int = 256,
             interpret: bool = False,
             packed=None, n: int = None):
    """Exact (values, indices) top-k per row of ``uv @ items.T + bias``,
    with ``mask_table`` items excluded, never materializing (B, N).

    uv: (B, d) float32 user/query vectors.
    items: (N, d) float32 item table.
    bias: (N,) float32 or None.
    mask_table: (B, L) int32 per-row exclusions (out-of-range = padding).
    packed: optional ``pack_items(items, bias, block_n)`` result; when given,
        ``items``/``bias`` are ignored (pass None) and the per-call table
        transpose is skipped — use for repeated calls against one frozen
        table. Requires ``n`` = the true (unpadded) catalog size.

    Same exactness/tie-break semantics and the same gating advice as
    ``blockwise_topk`` (route catalogs below ~32k items to lax.top_k).
    ``block_n`` must be 128 * a power of two (fold-tree threshold pass).
    """
    vals, idx, tau = dot_topk_candidates(uv, items, bias, k, mask_table,
                                         block_n, block_b, interpret,
                                         packed, n)
    from .topk_blocks import merge_topk
    k_out = min(k, vals.shape[1])
    return merge_topk(vals, idx, k_out, tau=tau[:, 0], interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("k", "block_n", "block_b", "interpret",
                                    "n"))
def dot_topk_ranks(uv: jnp.ndarray, items: jnp.ndarray, bias: jnp.ndarray,
                   k: int, test_table: jnp.ndarray,
                   mask_table: jnp.ndarray = None, block_n: int = 4096,
                   block_b: int = 256, interpret: bool = False,
                   packed=None, n: int = None) -> jnp.ndarray:
    """(B, T) int32 rank of each ``test_table`` item in the row's masked
    ``uv @ items.T + bias`` ranking — exact wherever the rank is < k and
    guaranteed >= k otherwise, never materializing (B, N) and never
    merging sorted ids (the fused-eval counterpart of
    ``topk_blocks.masked_topk_ranks``).

    Unlike the score-reading path, the test item's score is NOT recomputed
    outside the kernel (a separate gather-dot could round differently from
    the MXU block matmul and corrupt tie comparisons); instead it is
    LOOKED UP from the candidate set by id: a test item with rank < k is
    in the top-k and therefore emitted with its exact kernel value (the
    blockwise emission guarantee), so the lookup is always found when it
    matters. Not-found / -inf (masked, catalog-pad, out-of-range,
    sub-extraction) test items return k — they cannot be in the top-k.
    Duplicate ids in the candidate list (a cleared element re-surfacing as
    an empty-group -inf lane) are harmless: the lookup takes the max.
    """
    vals, idx, _tau = dot_topk_candidates(uv, items, bias, k, mask_table,
                                          block_n, block_b, interpret,
                                          packed, n)
    from .topk_blocks import _rank_lookup_counts
    ranks, found = _rank_lookup_counts(vals, idx,
                                       test_table.astype(jnp.int32),
                                       interpret)
    return jnp.where(found, ranks, jnp.int32(k))
