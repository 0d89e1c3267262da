"""Pallas threshold-pruned blockwise top-k over large catalogs.

For full-catalog ranking the evaluator needs top-k of a (B, N) score matrix
where N ranges from tens of thousands to millions, after setting train-item
scores to -inf (reference evaluator.py:197-200 + partial_sort in
evaluate.h:33-45). A monolithic ``lax.top_k`` is selection- not
bandwidth-bound on this chip (measured 8.8ms for (1024, 40960) f32 — about
17 GB/s effective; 41ms for (64, 1M)); a naive blockwise kernel running k
argmax rounds per block is VPU-bound at k x N compares. This kernel cuts the
selection work to ~O(N) with a two-pass threshold prune:

1. **Threshold pass (bandwidth-bound).** Per row, compute the max of every
   STRIDED 32-element column group (group l = columns c with c % 128 == l
   per 4096-block) by a fold tree of aligned elementwise maxima, then
   tau = k-th largest group max. At least k groups have max >= tau and each
   contributes one element >= tau, so the k-th largest element v_k >= tau:
   every global top-k element is >= tau. The bound holds for ANY partition
   of the columns into groups, and finer groups give a strictly tighter
   tau; for eval score distributions only ~1.0-1.1*k elements per row
   survive the prune.
2. **Extraction pass (Pallas, grid = batch tiles x item blocks).** Each
   program loads its (block_b, block_n) score block once and extracts in
   two stages (`lax.top_k` has no Pallas TPU lowering): GROUP_ROUNDS
   static rounds of per-group argmax (128 candidates per round via
   fold/repeat trees — see :func:`extract_block`), then a classic
   one-element-per-round lowest-index argmax fallback that fires only when
   a group held more survivors, capped at k rounds and stopping as soon as
   the block max falls below tau.
3. **Merge (Pallas VMEM top-k).** A final sorted top-k over the
   (B, n_blocks*cand_w) candidates via ``merge_topk`` — tau-pruned
   extraction into a narrow scratch then k argmax rounds, width-chunked
   for huge catalogs (see :func:`pruned_merge` / :func:`merge_topk`).
   XLA's ``lax.top_k`` costs a fixed ~2.7us per ROW at any width on this
   chip (2.8ms for (1024, 128)!), which would dominate the whole kernel at
   big batches; ``vmem_topk`` also selects tau from the (folded) group
   maxima. Exactness: every global top-k element is >= tau and is its
   block's top-<=k element, so it survives extraction; ties resolve to
   the lower global index, matching `lax.top_k` (the merge tie-breaks on
   the candidate id value, and extraction is index-ordered within a block).
   Ties need no special casing: a tie storm (e.g. constant popularity
   scores) just pays the full k rounds per block.

The batch dimension is tiled at ``block_b`` rows per program so big eval
batches fit VMEM: (1024, 4096) f32 blocks would be 16 MB — past the ~16 MB
VMEM budget once double-buffered — where (256, 4096) is 4 MB.

**Fused train-item masking via a bit-packed mask.** ``mask_table`` (B, L)
fuses the evaluator's -inf masking into the selection (materializing a
masked f32 copy would pay a scatter whose cost scales with the target
array size). The packed words are built by a dense unrolled bitwise-OR —
one (B, W) pass per table column, which XLA fuses into a few streaming
passes — NOT a scatter: the TPU scatter-add serializes its updates at
~19 ns each and DOMINATED the whole kernel until round 5 (1.0/5.2/17.2 ms
at L=64/256/1024, B=2048, vs 0.8/1.9/6.6 dense-OR). The bit layout
matches ``pltpu.repeat``'s tile semantics: with
W = block_n/32 words per block, word lane ``c % W`` holds, in bit
``c // W``, the mask for block column ``c`` — so unpacking is ONE lane-tile
repeat plus a shift by ``col_ids >> log2(W)``, entirely 2-D (Mosaic cannot
relayout (B, W, 32) -> (B, W*32) casts, and 3-D blocks tile only the last
two dims, costing ~2.4x). Both passes apply the mask at block load; the
cost is data-independent.

MEASURED (round-5 metrology — differenced multi-rep timings; see
bench.py measure_hbm_stream for why every earlier host-timed number
carried tunnel-RTT pollution): after the dense-OR pack fix, fused
mask+top-k costs ~0.7-1.1 ms per 1024x(40960) rows at batch >= 2048
(chip-load-dependent) — ~310-480 GB/s over its two 168 MB passes, i.e.
~40-65% of the TRUE same-session streaming-reduce rate of ~743 GB/s
(in-dispatch fori_loop, 0.3% repeatable; round 4's '172-237 GB/s
ceiling' was RTT-polluted the other way). With the scatter gone the
Pallas-vs-XLA break-even moved down to ~4k items (4.5-15x over masked
lax.top_k at N=4096-16384, B=512-8192 — skrx/ops/metrics.py gate), and
the bench-visible paged eval reached 655k users/s dispatch-inclusive
(6.97x XLA). RETRACTION (round 4, VERDICT
r3 #3): the round-3 claim of "1.20 ms = 279 GB/s" was a folded-int chain
artifact. Round-2 shape history (dispatch-inclusive timings): 12.9 ms
XLA mask+lax.top_k -> 4.4 ms (contiguous-sub-block threshold pass,
one-element extraction) -> 3.5 ms (fold-tree threshold pass) -> this.
At (64, 1M) masked: 4.6 ms dispatch-inclusive vs 25.2 ms XLA.
End-to-end evaluator throughput is captured dispatch-inclusive by
bench.py's paged eval, which since round 5 FLATTENS its pages into one
(G*B, N) kernel call (the lax.scan alternative paid a 168 MB
dynamic-slice copy + ~0.6 ms of fixed tiny-op tail overhead per page:
534k -> 698k users/s device-true at 16x(1024, 40960), 4 metrics @<=50).

ROUND-5 STAGE PROFILE + the merge-free eval path
(scripts/bench_topk_stages.py, B=16384 N=40960 K=50 L=64 T=16, chained
in-dispatch, same session): pack 1.1 / submax 3.5 (775 GB/s — AT the
743 GB/s measured stream rate) / tau 2.3->0.6 (``kth_largest`` bitwise
bisection replaced vmem_topk's k argmax rounds — identical value) /
extract 4.7 (~690 GB/s over its read+candidate-write bytes — also
bandwidth-bound now) / eval tail 5.0->1.4 (``masked_topk_ranks`` counts
each test item's exact lexicographic rank over the candidates in a VMEM
Pallas kernel and skips the sorted merge entirely; the XLA broadcast-
compare-reduce version of the same count cost 2.4). Evaluation total
14.7 -> 11.25 ms = 1.46M users/s device-true (+30%); the sorted-ids
``blockwise_topk`` (predict/serve) total 16.3 -> 14.6 ms from the tau
win. REJECTED (measured, same session): a one-pass design fusing
threshold+extraction (stage-A-only kernel emitting 4 rounds of per-group
candidates + residual group maxima, tau computed after, residual>=tau
flagging per-block-column rescue recounts, two-pass fallback for tie
storms) measured 11.69 ms vs this design's 11.25 — the second read it
saves (3.5 ms at stream rate) is fully repaid by stage-A VPU cost (4
rounds x [2 fold trees + 2 pltpu.repeat broadcasts + clear] ~ 8-10 ms
kernel-alone, block_b 128-192 all equal) plus the wider candidate
write/count. The kernel is VPU-bound the moment it does 4 rounds; only a
fundamentally cheaper per-group top-R (e.g. a top-R sorting-network fold)
would change the balance. See NEXT.md #0.

COMPILE-TIME NOTE: the extraction loop's block must be mutated through a
VMEM scratch ref, NOT carried as a `lax.while_loop` value — a 4 MB
loop-carried value sends Mosaic's register allocator into minutes of
compile time (measured 327s; with the scratch ref: ~1s).

Falls back to interpret mode off-TPU (tests run it on CPU).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["blockwise_topk", "blockwise_candidates", "masked_topk_ranks",
           "masked_topk_ranks_small",
           "kth_largest", "vmem_topk"]

_BITS = 32


def _apply_mask(block, packed, interpret):
    """Mask a (B, BN) block given its (B, BN/32) packed words: word lane
    c % W holds, in bit c // W, the mask for block column c (tile-repeat
    unpack layout)."""
    w = packed.shape[1]
    if interpret:
        rep = jnp.tile(packed, (1, _BITS))
    else:
        from jax.experimental.pallas import tpu as pltpu
        rep = pltpu.repeat(packed, _BITS, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 1)
    bit = (col // w).astype(jnp.uint32)
    return jnp.where((rep >> bit) & jnp.uint32(1) != 0, -jnp.inf, block)


def _vmem_topk_kernel(k, k_pad, vals_ref, idx_ref, out_v_ref, out_i_ref,
                      scratch_ref):
    """Exact top-k of a VMEM-resident (block_b, W) block by k argmax rounds;
    ties break toward the smaller INDEX VALUE (callers pass global ids or an
    iota, so this matches lax.top_k's lower-position rule)."""
    vals = vals_ref[...]
    bsz, w = vals.shape
    idx = idx_ref[...]
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (bsz, k_pad), 1)
    sentinel = jnp.iinfo(jnp.int32).max // 2
    scratch_ref[...] = vals
    out_v_ref[...] = jnp.full((bsz, k_pad), -jnp.inf, out_v_ref.dtype)
    out_i_ref[...] = jnp.full((bsz, k_pad), sentinel, jnp.int32)

    def body(r, _):
        cur = scratch_ref[...]
        cur_max = jnp.max(cur, axis=1)
        is_best = cur == cur_max[:, None]
        best_id = jnp.min(jnp.where(is_best, idx, sentinel), axis=1)
        sel = out_cols == r
        out_v_ref[...] = jnp.where(sel, cur_max[:, None], out_v_ref[...])
        out_i_ref[...] = jnp.where(sel, best_id[:, None], out_i_ref[...])
        scratch_ref[...] = jnp.where(is_best & (idx == best_id[:, None]),
                                     -jnp.inf, cur)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def vmem_topk(vals: jnp.ndarray, idx: jnp.ndarray, k: int,
              block_b: int = 256, interpret: bool = False):
    """Exact (values, ids) top-k per row of a NARROW (B, W) candidate matrix
    (W up to a few thousand), with ids carried through the selection.

    Replaces XLA ``lax.top_k`` for the kernel-internal tau and merge steps:
    on this chip ``lax.top_k`` costs a fixed ~2.7 us per ROW at any width
    (2.8 ms for (1024, 128)!), where k argmax rounds over a VMEM-resident
    block cost ~0.2-0.5 ms. Ties break toward the smaller id VALUE — pass a
    row iota for ``idx`` to reproduce lax.top_k's lower-position rule, or
    global candidate ids to get global lowest-index tie-breaking.
    """
    b, w = vals.shape
    assert idx.shape == (b, w)
    assert k <= w, (k, w)
    pad_w = -(-w // 128) * 128 - w
    if pad_w:
        vals = jnp.pad(vals, ((0, 0), (0, pad_w)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, pad_w)),
                      constant_values=jnp.iinfo(jnp.int32).max // 2)
        w += pad_w
    # keep 2x(vals+ids) in-blocks + scratch + outputs under the VMEM budget
    block_b = max(8, min(block_b, b, (1 << 21) // (w * 4)) // 8 * 8)
    nb_b = -(-b // block_b)
    k_pad = -(-k // 128) * 128
    from jax.experimental.pallas import tpu as pltpu
    out_v, out_i = pl.pallas_call(
        functools.partial(_vmem_topk_kernel, k, k_pad),
        grid=(nb_b,),
        in_specs=[pl.BlockSpec((block_b, w), lambda i: (i, 0)),
                  pl.BlockSpec((block_b, w), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((block_b, k_pad), lambda i: (i, 0)),
                   pl.BlockSpec((block_b, k_pad), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((nb_b * block_b, k_pad), vals.dtype),
                   jax.ShapeDtypeStruct((nb_b * block_b, k_pad), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((block_b, w), vals.dtype)],
        interpret=interpret,
    )(vals, idx.astype(jnp.int32))
    out_v, out_i = out_v[:b, :k], out_i[:b, :k]
    # -inf output slots must NOT leak real candidate ids: the mask-by-
    # (value, id) selection re-surfaces ALREADY-PICKED entries (their value
    # is set to -inf but the id stays), so a row with fewer than k finite
    # candidates would emit duplicates of its picked ids in the filler
    # ranks — a downstream hit-check would then double-count real items
    # (caught on-chip by test_chunked_eval_sparse_user_never_falsely_hits_
    # item_zero: Recall 4.0). Emit an out-of-range sentinel instead.
    return out_v, jnp.where(jnp.isneginf(out_v),
                            jnp.iinfo(jnp.int32).max // 2, out_i)


def _kth_largest_kernel(k, vals_ref, out_ref):
    """Exact per-row k-th largest VALUE of a VMEM-resident (block_b, W)
    block by 32-round bitwise bisection over the monotone float->uint32
    order embedding — no ids, no sorting, no extraction.

    Round-5 profile (scripts/bench_topk_stages.py, B=16384 N=40960 K=50):
    the tau selection was 2.2 ms of the 16.3 ms eval — ``vmem_topk``'s k
    argmax rounds cost k*(~6 ops)*W per row where only the k-th VALUE is
    needed. Bisection refines the answer one bit per round from the top:
    candidate = cur | bit; count rows' elements >= candidate; keep the bit
    iff count >= k. After 32 rounds cur IS the k-th order statistic in the
    sortable domain (max s with count(>= s) >= k), i.e. bit-identical to
    vmem_topk's k-th output — 32*(2 ops)*W per row, ~4x less VPU work.

    Order embedding (all-int32, signed — Mosaic vector compares are
    signed): f(i) = i XOR ((i >> 31) & 0x7FFFFFFF) maps IEEE754 bits to a
    signed-int total order matching the float order (-inf lowest; the
    arithmetic shift turns negative floats' magnitude order around while
    leaving the sign bit, so all negatives stay below all positives). f is
    an involution, so the same map recovers the float at the end. The sign
    bit is bisected first with its inverted meaning (answer >= 0 iff
    count(s >= 0) >= k); bits 30..0 then follow the plain descending
    construction, which is monotone in two's complement for either sign.
    NaNs must not appear (scores are finite or -inf by construction).
    """
    v = vals_ref[...]
    i = jax.lax.bitcast_convert_type(v, jnp.int32)
    s = i ^ (jax.lax.shift_right_arithmetic(i, 31)
             & jnp.int32(0x7FFFFFFF))
    cnt0 = jnp.sum((s >= 0).astype(jnp.int32), axis=1)
    cur = jnp.where(cnt0 >= k, jnp.int32(0), jnp.int32(-2147483648))
    for bit in range(30, -1, -1):
        cand = cur | jnp.int32(1 << bit)
        cnt = jnp.sum((s >= cand[:, None]).astype(jnp.int32), axis=1)
        cur = jnp.where(cnt >= k, cand, cur)
    back = cur ^ (jax.lax.shift_right_arithmetic(cur, 31)
                  & jnp.int32(0x7FFFFFFF))
    tau = jax.lax.bitcast_convert_type(back, jnp.float32)
    out_ref[...] = jnp.broadcast_to(tau[:, None], out_ref.shape)


def kth_largest(vals: jnp.ndarray, k: int, block_b: int = 256,
                interpret: bool = False) -> jnp.ndarray:
    """Exact per-row k-th largest value of a (B, W) f32 matrix -> (B, 128)
    lane-broadcast column (the tau operand layout the selection kernels
    consume). Requires k <= W and no NaNs; -inf entries are ordered lowest
    (a row with < k finite entries yields -inf, i.e. no pruning)."""
    b, w = vals.shape
    assert k <= w, (k, w)
    assert vals.dtype == jnp.float32, vals.dtype
    pad_w = -(-w // 128) * 128 - w
    if pad_w:
        vals = jnp.pad(vals, ((0, 0), (0, pad_w)), constant_values=-jnp.inf)
        w += pad_w
    block_b = max(8, min(block_b, b, (1 << 21) // (w * 4)) // 8 * 8)
    nb_b = -(-b // block_b)
    out = pl.pallas_call(
        functools.partial(_kth_largest_kernel, k),
        grid=(nb_b,),
        in_specs=[pl.BlockSpec((block_b, w), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_b, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nb_b * block_b, 128), jnp.float32),
        interpret=interpret,
    )(vals)
    return out[:b]


_MERGE_CHUNK_W = 8192
_PRUNED_MIN_W = 1024


def _pruned_merge_kernel(k, k_pad, interpret, vals_ref, idx_ref, tau_ref,
                         out_v_ref, out_i_ref, scr_ref, cv_ref, ci_ref):
    """Tau-pruned sorted top-k of a VMEM-resident (block_b, W) candidate
    block: the stage-A/B extraction of :func:`extract_block` (per-strided-
    group maxima + classic fallback, id-value tie-breaking) shrinks the
    candidates into a narrow (block_b, 2*128 + k_pad) scratch, then k
    sorted argmax rounds run over the scratch instead of the full width —
    ~4x less VPU work than ``_vmem_topk_kernel``'s k rounds over W. Exact
    when every row has >= k candidates >= tau (rows without must pass
    tau=-inf): a candidate of row-rank j <= k is either in its group's
    top-GROUP_ROUNDS (stage A) or extracted by stage B before it can stop."""
    bsz, w = vals_ref.shape
    m = w // 128
    tau = tau_ref[:, 0]
    sentinel = jnp.iinfo(jnp.int32).max // 2
    ga_w = GROUP_ROUNDS * 128
    cw = ga_w + k_pad

    scr_ref[...] = vals_ref[...]
    cv_ref[...] = jnp.full((bsz, cw), -jnp.inf, cv_ref.dtype)
    ci_ref[...] = jnp.full((bsz, cw), sentinel, jnp.int32)

    for r in range(GROUP_ROUNDS):                    # stage A
        cur = scr_ref[...]
        idx = idx_ref[...]
        gm = _fold(cur, jnp.maximum)
        iseq = cur == _rep(gm, m, interpret)
        gid = _fold(jnp.where(iseq, idx, sentinel), jnp.minimum)
        cv_ref[:, r * 128:(r + 1) * 128] = gm.astype(cv_ref.dtype)
        ci_ref[:, r * 128:(r + 1) * 128] = gid
        scr_ref[...] = jnp.where(
            iseq & (idx == _rep(gid, m, interpret)), -jnp.inf, cur)

    out_cols = jax.lax.broadcasted_iota(jnp.int32, (bsz, cw), 1)

    def cond(carry):                                 # stage B
        i, cur_max = carry
        return (i < k) & jnp.any(cur_max >= tau)

    def body(carry):
        # all large state re-read through refs: a closed-over (block_b, W)
        # VALUE in a while body sends Mosaic's register allocator into
        # minutes of compile time (see module compile-time note)
        i, cur_max = carry
        alive = cur_max >= tau
        cur = scr_ref[...]
        idx = idx_ref[...]
        is_best = cur == cur_max[:, None]
        best_id = jnp.min(jnp.where(is_best, idx, sentinel), axis=1)
        sel = (out_cols == ga_w + i) & alive[:, None]
        cv_ref[...] = jnp.where(sel, cur_max[:, None], cv_ref[...])
        ci_ref[...] = jnp.where(sel, best_id[:, None], ci_ref[...])
        cur = jnp.where(is_best & (idx == best_id[:, None])
                        & alive[:, None], -jnp.inf, cur)
        scr_ref[...] = cur
        return i + 1, jnp.max(cur, axis=1)

    jax.lax.while_loop(cond, body, (0, jnp.max(scr_ref[...], axis=1)))

    # final: k sorted (value desc, id asc, dedup-by-id) rounds over the
    # narrow candidate scratch (ci re-read per round: refs, not captures)
    ocols = jax.lax.broadcasted_iota(jnp.int32, (bsz, k_pad), 1)
    out_v_ref[...] = jnp.full((bsz, k_pad), -jnp.inf, out_v_ref.dtype)
    out_i_ref[...] = jnp.full((bsz, k_pad), sentinel, jnp.int32)

    def fbody(r, _):
        cur = cv_ref[...]
        ci = ci_ref[...]
        cur_max = jnp.max(cur, axis=1)
        is_best = cur == cur_max[:, None]
        best_id = jnp.min(jnp.where(is_best, ci, sentinel), axis=1)
        sel = ocols == r
        out_v_ref[...] = jnp.where(sel, cur_max[:, None], out_v_ref[...])
        out_i_ref[...] = jnp.where(sel, best_id[:, None], out_i_ref[...])
        cv_ref[...] = jnp.where(is_best & (ci == best_id[:, None]),
                                -jnp.inf, cur)
        return 0

    jax.lax.fori_loop(0, k, fbody, 0)


def pruned_merge(vals: jnp.ndarray, idx: jnp.ndarray, k: int,
                 tau: jnp.ndarray, block_b: int = 256,
                 interpret: bool = False):
    """Exact sorted (values, ids) top-k per row of a (B, W) candidate
    matrix, pruned by ``tau`` (B,) — a per-row lower bound on the k-th
    largest candidate (rows with fewer than k finite candidates must carry
    -inf). Same output contract and tie-breaking as :func:`vmem_topk`."""
    b, w = vals.shape
    assert k <= w, (k, w)
    sentinel = jnp.iinfo(jnp.int32).max // 2
    target = 128
    while target < w:                                # fold tree needs 2^m
        target *= 2
    if target != w:
        vals = jnp.pad(vals, ((0, 0), (0, target - w)),
                       constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, target - w)),
                      constant_values=sentinel)
        w = target
    k_pad = -(-k // 128) * 128
    cw = GROUP_ROUNDS * 128 + k_pad
    block_b = max(8, min(block_b, b, (1 << 21) // (w * 4)) // 8 * 8)
    nb_b = -(-b // block_b)
    tau2 = jnp.broadcast_to(jnp.reshape(tau, (b, 1)), (b, 128))
    from jax.experimental.pallas import tpu as pltpu
    out_v, out_i = pl.pallas_call(
        functools.partial(_pruned_merge_kernel, k, k_pad, interpret),
        grid=(nb_b,),
        in_specs=[pl.BlockSpec((block_b, w), lambda i: (i, 0)),
                  pl.BlockSpec((block_b, w), lambda i: (i, 0)),
                  pl.BlockSpec((block_b, 128), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((block_b, k_pad), lambda i: (i, 0)),
                   pl.BlockSpec((block_b, k_pad), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((nb_b * block_b, k_pad), vals.dtype),
                   jax.ShapeDtypeStruct((nb_b * block_b, k_pad), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((block_b, w), vals.dtype),
                        pltpu.VMEM((block_b, cw), vals.dtype),
                        pltpu.VMEM((block_b, cw), jnp.int32)],
        interpret=interpret,
    )(vals, idx.astype(jnp.int32), tau2)
    out_v, out_i = out_v[:b, :k], out_i[:b, :k]
    # same -inf-slot id guard as vmem_topk (picked ids re-surface)
    return out_v, jnp.where(jnp.isneginf(out_v), sentinel, out_i)


def merge_topk(vals: jnp.ndarray, idx: jnp.ndarray, k: int,
               tau: jnp.ndarray = None, interpret: bool = False):
    """Exact sorted per-row top-k of a candidate matrix of ANY width.

    ``vmem_topk`` holds its whole (block_b, W) block in VMEM, so very wide
    candidate sets (huge catalogs: 1M items = n_blocks * cand_w ~ 94k
    lanes) blow the VMEM budget. This wrapper splits the width into
    ``_MERGE_CHUNK_W`` chunks folded into the BATCH dimension (a reshape,
    not a copy), selects top-k per chunk, and recurses on the per-chunk
    winners — exact because a row's global top-k is the top-k of the union
    of its chunks' top-k, and (value desc, id asc) tie-breaking composes.
    Duplicate (value, id) candidates split across chunks are collapsed by
    the final round's mask-by-id rule, same as within one vmem_topk.

    ``tau`` (B,) routes wide levels through :func:`pruned_merge` (global
    per-row tau stays valid inside any chunk: a global-top-k element's
    rank within its chunk is <= k, so the chunk's stage B reaches it
    before its stop condition can fire)."""
    b, w = vals.shape
    sentinel = jnp.iinfo(jnp.int32).max // 2

    def level(v, i, kk, t):
        if t is not None and v.shape[1] > _PRUNED_MIN_W:
            return pruned_merge(v, i, kk, t, interpret=interpret)
        return vmem_topk(v, i, kk, interpret=interpret)

    while w > _MERGE_CHUNK_W:
        nc = -(-w // _MERGE_CHUNK_W)
        pad = nc * _MERGE_CHUNK_W - w
        if pad:
            vals = jnp.pad(vals, ((0, 0), (0, pad)),
                           constant_values=-jnp.inf)
            idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=sentinel)
        kc = min(k, _MERGE_CHUNK_W)
        tau_c = None
        if tau is not None:
            tau_c = jnp.broadcast_to(jnp.reshape(tau, (b, 1)),
                                     (b, nc)).reshape(b * nc)
        vals, idx = level(vals.reshape(b * nc, _MERGE_CHUNK_W),
                          idx.reshape(b * nc, _MERGE_CHUNK_W), kc, tau_c)
        vals, idx = vals.reshape(b, nc * kc), idx.reshape(b, nc * kc)
        w = vals.shape[1]
    return level(vals, idx, k, tau)


def emit_submaxes(block, out_ref):
    """Write this (masked) block's per-row STRIDED-group maxima into the
    (block_b, 128) output block: group l = block columns c with
    c % 128 == l, reduced by a log2(block_n/128)-step elementwise fold of
    aligned halves (fold of [:half] with [half:] composes to stride-128
    groups). The tau bound holds for ANY partition of the columns into
    groups — at least k groups have max >= tau and each contributes one
    element >= tau — and these 32-element groups give a strictly TIGHTER
    tau than contiguous 128-wide sub-blocks (merging two groups deletes the
    smaller max from the multiset tau is selected from, so finer partitions
    can only raise the k-th largest group max). Unlike the per-sub-slice
    max+select loop this replaced, the fold is pure aligned elementwise
    VPU work: no cross-lane reductions, no lane-iota selects (measured
    ~2.3x on the threshold pass — see module header). Shared by the
    score-reading and the matmul-producing (dot_topk) threshold kernels."""
    h = block
    while h.shape[1] > 128:
        half = h.shape[1] // 2
        h = jnp.maximum(h[:, :half], h[:, half:])
    out_ref[...] = h.astype(out_ref.dtype)


def _submax_kernel(interpret, scores_ref, packed_ref, out_ref):
    """Strided-group maxima of this (block_b, block_n) score block (see
    :func:`emit_submaxes`)."""
    block = scores_ref[...]                          # (B, BN)
    if packed_ref is not None:
        block = _apply_mask(block, packed_ref[...], interpret)
    emit_submaxes(block, out_ref)


GROUP_ROUNDS = 2


def _fold(h, op):
    """Reduce (B, W) to (B, 128) strided-group values by an elementwise
    fold of aligned halves (W must be 128 * a power of two); group l =
    columns c with c % 128 == l."""
    while h.shape[1] > 128:
        half = h.shape[1] // 2
        h = op(h[:, :half], h[:, half:])
    return h


def _rep(x, m, interpret):
    """(B, 128) -> (B, 128*m): lane c reads x[:, c % 128] (tile repeat)."""
    if m == 1:
        return x
    if interpret:
        return jnp.tile(x, (1, m))
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.repeat(x, m, axis=1)


def extract_block(block, tau, k, k_eff, offset, vals_ref, idx_ref,
                  scratch_ref, interpret=False):
    """Two-stage tau-pruned extraction of one (masked) block VALUE into the
    output refs (width GROUP_ROUNDS*128 + k_eff; global ids offset by
    ``offset``). Shared by the score-reading and the matmul-producing
    (dot_topk) extraction kernels.

    Stage A (GROUP_ROUNDS static rounds): extract the per-STRIDED-GROUP
    maximum of all 128 groups at once — fold-max tree to (B, 128) group
    maxima, ``pltpu.repeat`` broadcast back, fold-min tree to recover each
    group's lowest-index argmax column, one static-slice write. Each round
    emits up to 128 candidates where the classic argmax loop emits ONE, so
    the loop count stops being max-over-rows of per-row survivors (~6-12
    for a (256, 4096) eval block) and becomes max survivors per GROUP (~2).

    Stage B (while loop, up to k rounds): the classic one-element-per-round
    lowest-index argmax on whatever still exceeds tau — fires only when
    some group held more than GROUP_ROUNDS survivors (rare for real score
    distributions; guaranteed-correct for ties/adversarial layouts).

    Exactness: stage A removes exactly the top-GROUP_ROUNDS of every group
    (ties broken lowest-index, one element per round). An element whose
    whole-block rank is j <= k either sits in its group's top-GROUP_ROUNDS
    (emitted by A) or remains for stage B, where its rank among the
    remainder is <= j <= k, so B's k-round cap emits it before stopping.
    Groups whose max is below tau emit sub-tau garbage in stage A; tau
    guarantees >= k candidates >= tau exist globally, so garbage can never
    displace a true top-k element in the merge. Duplicate (value, id)
    candidates (possible for -inf-tied rows) are collapsed by vmem_topk's
    mask-by-id rule, exactly as for the classic loop's repeated -inf picks.
    """
    bsz, bn = block.shape
    m = bn // 128
    ga_w = GROUP_ROUNDS * 128
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bsz, bn), 1)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (bsz, ga_w + k_eff), 1)
    fold = _fold

    def rep(x):
        return _rep(x, m, interpret)

    # all loop state lives in refs (the extraction rounds mutate the block
    # in VMEM scratch): a (B, BN) loop-carried VALUE sends Mosaic's register
    # allocator into minutes of compile time at 4 MB blocks
    scratch_ref[...] = block
    vals_ref[...] = jnp.full((bsz, ga_w + k_eff), -jnp.inf, vals_ref.dtype)
    idx_ref[...] = jnp.full((bsz, ga_w + k_eff), jnp.iinfo(jnp.int32).max // 2,
                            jnp.int32)

    for r in range(GROUP_ROUNDS):                    # stage A, static unroll
        cur = scratch_ref[...]
        gm = fold(cur, jnp.maximum)                  # (B, 128) group maxima
        gidx = fold(jnp.where(cur == rep(gm), col_ids, bn), jnp.minimum)
        vals_ref[:, r * 128:(r + 1) * 128] = gm.astype(vals_ref.dtype)
        idx_ref[:, r * 128:(r + 1) * 128] = gidx + offset
        # clear exactly the extracted (lowest-index) element of each group
        scratch_ref[...] = jnp.where(col_ids == rep(gidx), -jnp.inf, cur)

    def cond(carry):                                 # stage B
        i, cur_max = carry
        return (i < k) & jnp.any(cur_max >= tau)

    def body(carry):
        i, cur_max = carry
        alive = cur_max >= tau                              # (B,)
        block = scratch_ref[...]
        # lowest-index argmax of each alive row
        is_best = block == cur_max[:, None]
        best_idx = jnp.min(jnp.where(is_best, col_ids, bn), axis=1)
        sel = (out_cols == ga_w + i) & alive[:, None]
        vals_ref[...] = jnp.where(sel, cur_max[:, None], vals_ref[...])
        idx_ref[...] = jnp.where(sel, best_idx[:, None] + offset, idx_ref[...])
        # mask the extracted (leftmost-tied) element; dead rows unchanged
        block = jnp.where((col_ids == best_idx[:, None]) & alive[:, None],
                          -jnp.inf, block)
        scratch_ref[...] = block
        return i + 1, jnp.max(block, axis=1)

    jax.lax.while_loop(cond, body, (0, jnp.max(scratch_ref[...], axis=1)))


def _extract_kernel(k, k_eff, interpret, scores_ref, packed_ref, tau_ref,
                    vals_ref, idx_ref, scratch_ref):
    j = pl.program_id(1)
    block = scores_ref[...]                          # (B, BN)
    if packed_ref is not None:
        block = _apply_mask(block, packed_ref[...], interpret)
    extract_block(block, tau_ref[:, 0], k, k_eff, j * block.shape[1],
                  vals_ref, idx_ref, scratch_ref, interpret=interpret)


def pack_mask(mask_table, b: int, n: int, n_blocks: int, block_n: int):
    """Bit-pack a (B, L) exclusion table into per-block uint32 words:
    word lane c % W of block j holds, in bit c // W, the mask for block
    column c (W = block_n/32; see the module header for why this layout).
    Out-of-range and duplicate table entries are handled.

    Round 5: dense unrolled-OR instead of an XLA scatter-add — the TPU
    scatter serialized its updates (~19 ns/update: 1.0/5.2/17.2 ms at
    L=64/256/1024, B=2048) and round 4's stage profile showed the packing
    DOMINATING the whole masked top-k kernel. One (B, W) bitwise-or pass
    per table column fuses into a few streaming passes (0.8/1.9/6.6 ms
    same shapes, bit-identical output); OR makes duplicate ids harmless,
    so the old per-row dedup sort is gone too."""
    w32 = block_n // _BITS
    total_w = n_blocks * w32
    valid = (mask_table >= 0) & (mask_table < n)
    ids = jnp.where(valid, mask_table, 0)
    c = ids % block_n
    # invalid entries get word index total_w: matches no lane
    word = jnp.where(valid, (ids // block_n) * w32 + c % w32,
                     total_w).astype(jnp.int32)
    bitval = jnp.left_shift(jnp.uint32(1), (c // w32).astype(jnp.uint32))
    lanes = jnp.arange(total_w, dtype=jnp.int32)[None, :]
    acc = jnp.zeros((b, total_w), jnp.uint32)
    for j in range(mask_table.shape[1]):
        acc = acc | jnp.where(word[:, j:j + 1] == lanes,
                              bitval[:, j:j + 1], jnp.uint32(0))
    return acc


def _fold_submaxes(bm: jnp.ndarray, max_w: int) -> jnp.ndarray:
    """Fold a (B, n_sub) group-max matrix down to width <= max_w by pairwise
    maxima (pads odd widths with -inf). Each fold step merges two strided
    groups into one — still a partition of the catalog columns, so tau
    selected from the folded maxima stays a valid lower bound on the k-th
    largest element; folding only loosens tau, and is applied only when the
    unfolded width would make the tau-selection (k argmax rounds over a
    (B, n_sub) block) cost more than the looser prune adds (huge catalogs:
    1M items = 31360 group maxima)."""
    w = bm.shape[1]
    while w > max_w:
        if (w // 128) % 2:
            bm = jnp.pad(bm, ((0, 0), (0, 128)), constant_values=-jnp.inf)
            w += 128
        half = w // 2
        bm = jnp.maximum(bm[:, :half], bm[:, half:])
        w = half
    return bm


_TAU_MAX_W = 4096


def blockwise_candidates(scores: jnp.ndarray, k: int, block_n: int = 4096,
                         block_b: int = 256, interpret: bool = False,
                         mask_table: jnp.ndarray = None):
    """Threshold + extraction passes of :func:`blockwise_topk` WITHOUT the
    final merge: returns ``(cand_vals, cand_ids, tau)`` where the
    (B, n_blocks*cand_w) candidate set is a superset of the row's top-k
    (each matrix element appears at most once; non-candidate lanes carry
    values < tau, or -inf with sentinel ids) and ``tau`` (B, 128) is the
    lane-broadcast k-th-largest-group-max lower bound on the k-th largest
    element. Callers that don't need sorted ids (the evaluator's
    rank-counting path, :func:`masked_topk_ranks`) skip the merge
    entirely; ``blockwise_topk`` = candidates + ``merge_topk``."""
    assert block_n % 128 == 0 and (block_n // 128) & (block_n // 128 - 1) \
        == 0, "block_n must be 128 * a power of two"
    if mask_table is not None and not interpret:
        # packed words per block must stay 128-lane aligned on real TPU
        assert block_n % (_BITS * 128) == 0, \
            "masked block_n must be a multiple of 4096 on TPU"
    b, n = scores.shape
    block_b = min(block_b, b)
    n_blocks = max(-(-n // block_n), 1)
    nb_b = -(-b // block_b)
    padded_n = n_blocks * block_n
    w32 = block_n // _BITS                           # words per block
    n_sub = n_blocks * 128                           # stride-128 groups

    packed = None
    if mask_table is not None:
        packed = pack_mask(mask_table, b, n, n_blocks, block_n)

    if padded_n != n:
        scores = jnp.pad(scores, ((0, 0), (0, padded_n - n)),
                         constant_values=-jnp.inf)

    # per-block candidate budget, rounded up to the 128-lane tile so the
    # output block shape is TPU-legal
    k_cap = min(k, block_n)
    k_eff = min(-(-k // 128) * 128, block_n)

    def specs():
        in_specs = [pl.BlockSpec((block_b, block_n), lambda i, j: (i, j))]
        ops = [scores]
        if packed is not None:
            in_specs.append(pl.BlockSpec((block_b, w32), lambda i, j: (i, j)))
            ops.append(packed)
        return in_specs, ops

    # threshold pass: per-row strided-group maxima (fold tree); Pallas so
    # the bit-unpacked mask never materializes at (B, N)
    in_specs, operands = specs()
    if packed is not None:
        bm_kernel = functools.partial(_submax_kernel, interpret)
    else:
        def bm_kernel(scores_ref, out_ref):
            return _submax_kernel(interpret, scores_ref, None, out_ref)
    bm = pl.pallas_call(
        bm_kernel,
        grid=(nb_b, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, 128), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((nb_b * block_b, n_sub),
                                       scores.dtype),
        interpret=interpret,
    )(*operands)[:b]                                 # (B, n_sub)

    # tau = k-th largest (masked) group max: a lower bound on the k-th
    # largest (masked) element whenever n_sub >= k; degenerate small-N case
    # uses -inf, i.e. no pruning. Selected by bitwise bisection
    # (:func:`kth_largest`, ~4x less VPU work than the k-argmax-round
    # vmem_topk it replaced in round 5 — 2.2 ms of a 16.3 ms eval call at
    # (16384, 40960) k=50; identical value) — lax.top_k's fixed ~2.7us/row
    # would cost more than the streaming pass.
    if n_sub >= k:
        # folding halves the width, so keep >= 2*k lanes pre-fold to
        # guarantee the folded width stays >= k
        bmf = _fold_submaxes(bm, max(_TAU_MAX_W, 2 * (-(-k // 128) * 128)))
        if bmf.dtype == jnp.float32:
            tau = kth_largest(bmf, k, interpret=interpret)
        else:
            iota = jnp.broadcast_to(
                jnp.arange(bmf.shape[1], dtype=jnp.int32)[None, :], bmf.shape)
            tau = jnp.broadcast_to(
                vmem_topk(bmf, iota, k, interpret=interpret)[0][:, k - 1:k],
                (b, 128))
    else:
        tau = jnp.broadcast_to(jnp.full((b, 1), -jnp.inf, scores.dtype),
                               (b, 128))

    in_specs, operands = specs()
    in_specs.append(pl.BlockSpec((block_b, 128), lambda i, j: (i, 0)))
    operands.append(tau)
    if packed is not None:
        kernel = functools.partial(_extract_kernel, k_cap, k_eff, interpret)
    else:
        def kernel(scores_ref, tau_ref, vals_ref, idx_ref, scratch_ref):
            return _extract_kernel(k_cap, k_eff, interpret, scores_ref,
                                   None, tau_ref, vals_ref, idx_ref,
                                   scratch_ref)

    from jax.experimental.pallas import tpu as pltpu
    cand_w = GROUP_ROUNDS * 128 + k_eff              # candidates per block
    vals, idx = pl.pallas_call(
        kernel,
        grid=(nb_b, n_blocks),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((block_b, cand_w), lambda i, j: (i, j)),
                   pl.BlockSpec((block_b, cand_w), lambda i, j: (i, j))),
        out_shape=(jax.ShapeDtypeStruct((nb_b * block_b, n_blocks * cand_w),
                                        scores.dtype),
                   jax.ShapeDtypeStruct((nb_b * block_b, n_blocks * cand_w),
                                        jnp.int32)),
        scratch_shapes=[pltpu.VMEM((block_b, block_n), scores.dtype)],
        interpret=interpret,
    )(*operands)
    return vals[:b], idx[:b], tau


@functools.partial(jax.jit,
                   static_argnames=("k", "block_n", "block_b", "interpret"))
def blockwise_topk(scores: jnp.ndarray, k: int, block_n: int = 4096,
                   block_b: int = 256,
                   interpret: bool = False, mask_table: jnp.ndarray = None):
    """Exact (values, indices) top-k per row of ``scores`` (B, N).

    ``mask_table`` (B, L) int32 excludes ``scores[b, mask_table[b, :]]``
    from the result, fused into the selection (entries outside [0, N) are
    padding and ignored; duplicate entries are allowed) — the evaluator's
    train-item -inf masking without materializing a masked copy. Masked
    slots beyond the number of surviving items carry -inf values with
    sentinel (out-of-range) indices. ``block_n`` must be 128 * a power of
    two (for the fold-tree threshold pass), and a multiple of 4096 when a
    mask is used on real TPU (so the packed words stay 128-lane aligned);
    rows are processed ``block_b`` at a time. N is padded up to a block
    multiple with -inf.

    The threshold prunes only when there are >= k stride-128 column groups
    (n_sub = n_blocks*128 >= k); below that tau degrades toward -inf and
    extraction pays up to k argmax rounds per block — route small catalogs
    to plain ``lax.top_k`` instead (see skrx/ops/metrics.py gating).
    """
    vals, idx, tau = blockwise_candidates(scores, k, block_n, block_b,
                                          interpret, mask_table)
    # final merge over the candidate set via the (width-chunked, tau-
    # pruned) VMEM top-k kernel. Ties break toward the lower global index
    # — identical to merging by candidate position (blocks are emitted
    # left to right and extraction within a block is (value desc, index
    # asc)), which is lax.top_k's rule.
    k_out = min(k, vals.shape[1])
    return merge_topk(vals, idx, k_out, tau=tau[:, 0], interpret=interpret)


def _rank_count_kernel(t_count, vals_ref, idx_ref, st_ref, tid_ref,
                       out_ref):
    """Per-row count of candidates lexicographically above each of the
    first ``t_count`` (score, id) probes — the rank-counting tail of
    :func:`masked_topk_ranks` with the (block_b, W) candidate block VMEM-
    resident. One static round per probe: broadcast the probe's score/id
    columns over the candidate width, compare, reduce. Replaces the XLA
    (B, W, T) broadcast-compare-reduce which paid ~3x in materialized
    broadcasts (measured 2.4 ms -> target <1 ms of a 12 ms eval call at
    B=16384, W=3840, T=16)."""
    v = vals_ref[...]
    ids = idx_ref[...]
    bsz = v.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bsz, 128), 1)
    # ref-accumulation, not a carried value chain (see
    # _rank_lookup_count_kernel's stack note)
    out_ref[...] = jnp.zeros((bsz, 128), jnp.int32)
    for t in range(t_count):
        s = st_ref[:, t:t + 1]
        ti = tid_ref[:, t:t + 1]
        above = (v > s) | ((v == s) & (ids < ti))
        cnt = jnp.sum(above.astype(jnp.int32), axis=1)
        out_ref[...] = jnp.where(lanes == t, cnt[:, None], out_ref[...])


def _rank_counts(vals: jnp.ndarray, idx: jnp.ndarray, s_t: jnp.ndarray,
                 t_ids: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """(B, T) int32 lexicographic-rank counts of T probes against a (B, W)
    candidate set (see :func:`_rank_count_kernel`); T must be <= 128."""
    b, w = vals.shape
    t = s_t.shape[1]
    assert t <= 128, t
    pad_w = -(-w // 128) * 128 - w
    if pad_w:
        vals = jnp.pad(vals, ((0, 0), (0, pad_w)),
                       constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, pad_w)),
                      constant_values=jnp.iinfo(jnp.int32).max // 2)
        w += pad_w
    st = jnp.pad(s_t, ((0, 0), (0, 128 - t)))
    ti = jnp.pad(t_ids, ((0, 0), (0, 128 - t)))
    block_b = max(8, min(256, b, (1 << 21) // (w * 4)) // 8 * 8)
    nb_b = -(-b // block_b)
    out = pl.pallas_call(
        functools.partial(_rank_count_kernel, t),
        grid=(nb_b,),
        in_specs=[pl.BlockSpec((block_b, w), lambda i: (i, 0)),
                  pl.BlockSpec((block_b, w), lambda i: (i, 0)),
                  pl.BlockSpec((block_b, 128), lambda i: (i, 0)),
                  pl.BlockSpec((block_b, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_b, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nb_b * block_b, 128), jnp.int32),
        interpret=interpret,
    )(vals, idx.astype(jnp.int32), st, ti.astype(jnp.int32))
    return out[:b, :t]


def _rank_lookup_count_kernel(t_count, vals_ref, idx_ref, tid_ref,
                              out_ref, sv_ref):
    """Like :func:`_rank_count_kernel`, but each probe's score is LOOKED
    UP from the candidate set by id (max over lanes with matching id)
    instead of arriving as an operand — the fused dot-eval path cannot
    recompute scores outside the kernel without risking a different
    rounding of the same dot product (see dot_topk_ranks). Emits the
    looked-up value too (sv) so the caller can detect not-found/-inf."""
    v = vals_ref[...]
    ids = idx_ref[...]
    bsz = v.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bsz, 128), 1)
    # accumulate THROUGH the output refs, not a carried value: a value
    # chain keeps ~t_count (bsz, 128) snapshots live on Mosaic's stack
    # (measured 17.8M scoped vmem at t_count~128 — the module compile-time
    # note's failure mode); a ref store ends each iteration's liveness
    out_ref[...] = jnp.zeros((bsz, 128), jnp.int32)
    sv_ref[...] = jnp.full((bsz, 128), -jnp.inf, sv_ref.dtype)
    for t in range(t_count):
        ti = tid_ref[:, t:t + 1]
        s = jnp.max(jnp.where(ids == ti, v, -jnp.inf), axis=1,
                    keepdims=True)
        above = (v > s) | ((v == s) & (ids < ti))
        cnt = jnp.sum(above.astype(jnp.int32), axis=1)
        out_ref[...] = jnp.where(lanes == t, cnt[:, None], out_ref[...])
        sv_ref[...] = jnp.where(lanes == t, s, sv_ref[...])


def _rank_lookup_counts(vals: jnp.ndarray, idx: jnp.ndarray,
                        t_ids: jnp.ndarray, interpret: bool):
    """((B, T) int32 counts, (B, T) bool found) — lookup-by-id variant of
    :func:`_rank_counts` (see :func:`_rank_lookup_count_kernel`); T must
    be <= 128."""
    b, w = vals.shape
    t = t_ids.shape[1]
    assert t <= 128, t
    pad_w = -(-w // 128) * 128 - w
    if pad_w:
        vals = jnp.pad(vals, ((0, 0), (0, pad_w)),
                       constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, pad_w)),
                      constant_values=jnp.iinfo(jnp.int32).max // 2)
        w += pad_w
    ti = jnp.pad(t_ids, ((0, 0), (0, 128 - t)),
                 constant_values=jnp.iinfo(jnp.int32).max // 2)
    block_b = max(8, min(256, b, (1 << 21) // (w * 4)) // 8 * 8)
    nb_b = -(-b // block_b)
    out, sv = pl.pallas_call(
        functools.partial(_rank_lookup_count_kernel, t),
        grid=(nb_b,),
        in_specs=[pl.BlockSpec((block_b, w), lambda i: (i, 0)),
                  pl.BlockSpec((block_b, w), lambda i: (i, 0)),
                  pl.BlockSpec((block_b, 128), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((block_b, 128), lambda i: (i, 0)),
                   pl.BlockSpec((block_b, 128), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((nb_b * block_b, 128), jnp.int32),
                   jax.ShapeDtypeStruct((nb_b * block_b, 128),
                                        vals.dtype)),
        interpret=interpret,
    )(vals, idx.astype(jnp.int32), ti.astype(jnp.int32))
    return out[:b, :t], jnp.isfinite(sv[:b, :t])


def _direct_rank_kernel(t_count, interpret, scores_ref, packed_ref,
                        tid_ref, out_ref, sv_ref):
    """Whole-row rank counting for SMALL catalogs: the full (masked) score
    row lives in VMEM, ids are the column iota, and each probe's score is
    looked up by id then counted lexicographically — no threshold, no
    candidates, no merge (see :func:`masked_topk_ranks_small`)."""
    blk = scores_ref[...]
    if packed_ref is not None:
        blk = _apply_mask(blk, packed_ref[...], interpret)
    bsz, np_ = blk.shape
    ids = jax.lax.broadcasted_iota(jnp.int32, (bsz, np_), 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bsz, 128), 1)
    # ref-accumulation, not a carried value chain (see
    # _rank_lookup_count_kernel's stack note)
    out_ref[...] = jnp.zeros((bsz, 128), jnp.int32)
    sv_ref[...] = jnp.full((bsz, 128), -jnp.inf, sv_ref.dtype)
    for t in range(t_count):
        ti = tid_ref[:, t:t + 1]
        s = jnp.max(jnp.where(ids == ti, blk, -jnp.inf), axis=1,
                    keepdims=True)
        above = (blk > s) | ((blk == s) & (ids < ti))
        cnt = jnp.sum(above.astype(jnp.int32), axis=1)
        out_ref[...] = jnp.where(lanes == t, cnt[:, None], out_ref[...])
        sv_ref[...] = jnp.where(lanes == t, s, sv_ref[...])


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def masked_topk_ranks_small(scores: jnp.ndarray, k: int,
                            test_table: jnp.ndarray,
                            mask_table: jnp.ndarray = None,
                            interpret: bool = False) -> jnp.ndarray:
    """(B, T) int32 EXACT rank of each test item over the full masked row
    — the small-catalog (N <= ~16k) evaluation path, where the whole row
    fits VMEM and a direct lexicographic count beats everything else.

    XLA's ``lax.top_k`` costs a fixed ~2.7 us per ROW at any width on this
    chip — 44 ms for a (16384, 2048) eval batch — which is exactly the
    regime of the reference's headline datasets (ML-100k: 1682 items,
    ML-1M: ~3.7k). The direct count does T*(~5 ops)*N per row: ~0.03 us
    per row at T=16, N=4096 — two orders of magnitude less. Exact at ANY
    rank (every element is counted — no candidate emission involved);
    clamp semantics and the masked/-inf/oob never-hit contract match
    :func:`masked_topk_ranks`.
    """
    b, n = scores.shape
    t = test_table.shape[1]
    assert t <= 128, t
    if mask_table is not None and not interpret:
        npad = -(-n // 4096) * 4096        # packed-mask lane alignment
    else:
        npad = -(-n // 128) * 128
    if npad != n:
        scores = jnp.pad(scores, ((0, 0), (0, npad - n)),
                         constant_values=-jnp.inf)
    ti = jnp.pad(test_table.astype(jnp.int32), ((0, 0), (0, 128 - t)),
                 constant_values=jnp.iinfo(jnp.int32).max // 2)
    block_b = max(8, min(256, b, (1 << 21) // (npad * 4)) // 8 * 8)
    nb_b = -(-b // block_b)
    in_specs = [pl.BlockSpec((block_b, npad), lambda i: (i, 0))]
    ops = [scores]
    if mask_table is not None:
        packed = pack_mask(mask_table, b, n, 1, npad)
        in_specs.append(pl.BlockSpec((block_b, npad // _BITS),
                                     lambda i: (i, 0)))
        ops.append(packed)
        kernel = functools.partial(_direct_rank_kernel, t, interpret)
    else:
        def kernel(scores_ref, tid_ref, out_ref, sv_ref):
            return _direct_rank_kernel(t, interpret, scores_ref, None,
                                       tid_ref, out_ref, sv_ref)
    in_specs.append(pl.BlockSpec((block_b, 128), lambda i: (i, 0)))
    ops.append(ti)
    out, sv = pl.pallas_call(
        kernel,
        grid=(nb_b,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((block_b, 128), lambda i: (i, 0)),
                   pl.BlockSpec((block_b, 128), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((nb_b * block_b, 128), jnp.int32),
                   jax.ShapeDtypeStruct((nb_b * block_b, 128),
                                        scores.dtype)),
        interpret=interpret,
    )(*ops)
    found = jnp.isfinite(sv[:b, :t])
    return jnp.where(found, out[:b, :t], jnp.int32(k))


@functools.partial(jax.jit,
                   static_argnames=("k", "block_n", "block_b", "interpret"))
def masked_topk_ranks(scores: jnp.ndarray, k: int,
                      test_table: jnp.ndarray,
                      mask_table: jnp.ndarray = None,
                      block_n: int = 4096, block_b: int = 256,
                      interpret: bool = False) -> jnp.ndarray:
    """(B, T) int32 rank of each ``test_table`` item in the row's masked
    descending-score ranking — exact wherever the rank is < k, and
    guaranteed >= k otherwise (clamp semantics; the ranking evaluator only
    consumes ranks < k). Replaces [merge to sorted top-k ids -> id-vs-truth
    hit compare] for evaluation: the merge was 4.1 ms of a 16.3 ms eval
    call at (16384, 40960) k=50 (round-5 stage profile) and its sorted ids
    are never needed — only WHERE the few test items landed.

    rank(t) = #{unmasked i: s_i > s_t or (s_i == s_t and i < t)}, counted
    over the candidate set of :func:`blockwise_candidates`. Exactness:
    every element above a rank-<k test item has global rank <= k, and any
    element of global rank <= k is emitted as a candidate (the
    blockwise_topk exactness argument); candidates are unique per element,
    and sub-tau garbage lanes can never count (garbage < tau <= s_t for
    any test item with rank < k, value-strictly). When the true rank is
    >= k the count still includes the full emitted top-k, all of which
    rank above t, so the result stays >= k. Out-of-range, masked, and
    -inf-scoring test items return k (never hit — matching the merged
    kernel's sentinel-id contract for -inf slots).
    """
    b, n = scores.shape
    vals, idx, _ = blockwise_candidates(scores, k, block_n, block_b,
                                        interpret, mask_table)
    t_ids = test_table.astype(jnp.int32)
    valid = (t_ids >= 0) & (t_ids < n)
    safe = jnp.where(valid, t_ids, 0)
    s_t = jnp.take_along_axis(scores, safe, axis=1)
    if mask_table is not None:
        in_mask = jnp.any(safe[:, :, None] == mask_table[:, None, :],
                          axis=-1)
        valid &= ~in_mask
    valid &= jnp.isfinite(s_t)
    if s_t.shape[1] <= 128:
        ranks = _rank_counts(vals, idx, s_t, safe, interpret)
    else:           # very wide truth tables: XLA broadcast-compare-reduce
        above = (vals[:, :, None] > s_t[:, None, :]) \
            | ((vals[:, :, None] == s_t[:, None, :])
               & (idx[:, :, None] < safe[:, None, :]))
        ranks = jnp.sum(above.astype(jnp.int32), axis=1)
    return jnp.where(valid, ranks, jnp.int32(k))
