"""Stream-rate microbenchmarks for the Pallas selection kernels (VERDICT r2 #2).

The round-2 roofline put the blockwise_topk passes at ~110-155 GB/s of the
chip's 819 GB/s HBM peak. This script isolates WHERE the gap is.

Measurement notes (axon remote TPU):
  * dispatch floor: a trivial jitted call costs ~1 ms through the tunnel,
    so any sub-ms kernel timed one-dispatch-per-rep reads as ~max(1ms, t).
  * lax.scan chaining is pathological on this platform (measured ~60 ms
    per iteration for a scan over stacked 160 MB slices — 25x the array's
    stream time; do NOT use scan to amortize dispatch here).
  * the clean method: chain R kernel calls inside ONE jit via a SCALAR
    data dependency — call i+1 takes a (1,1) operand derived from call
    i's output (value 0.0), so XLA cannot CSE the calls, nothing big is
    copied, and every call re-reads the same HBM array. Per-call time =
    (t_chain(R) - t_chain(0)) / R.
  * kernels slower than the ~1 ms floor (the e2e top-k) are measured
    back-to-back-dispatch style: steady state = max(host, device) =
    device time.

Run on the real TPU: python scripts/bench_topk_stream.py
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, K = 1024, 40_960, 50
R = 8          # chained calls per dispatch
REPS = 6       # dispatches per timing


def timeit(fn, reps=REPS):
    out = fn()
    np.asarray(out)  # materialize (axon: block_until_ready won't sync)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def row(name, t, nbytes):
    print(f"{name:58s} {t*1e3:8.3f} ms   {nbytes/t/1e9:7.1f} GB/s",
          flush=True)



def guarded(name, fn, nbytes):
    """One measurement row; a transient remote-compile 500 must not kill
    the whole script (the axon compile helper intermittently fails)."""
    try:
        row(name, fn(), nbytes)
    except Exception as e:  # pragma: no cover - infra flake
        print(f"{name:58s}    FAILED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:80]})", flush=True)


def make_stream_kernel(block_b, block_n, dimsem, reduce_mode):
    """Streaming kernel with a (1,1) scalar operand added to the output so
    chained calls have a data dependency (see module header)."""
    def kernel(x_ref, off_ref, o_ref):
        # the (1, 1) dependency offset is ALWAYS f32 and the add runs in
        # f32 (current Mosaic lowers neither a bf16 scalar vector.extract
        # nor a bf16 both-axis (1,1) broadcast); result casts back to the
        # stream dtype — free for f32, one VPU cast for bf16
        blk = x_ref[...]
        if reduce_mode == "max":
            res = jnp.broadcast_to(jnp.max(blk, axis=1, keepdims=True),
                                   o_ref.shape)
        elif reduce_mode == "sub32":
            lanes = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 1)
            acc = jnp.full(o_ref.shape, -jnp.inf, o_ref.dtype)
            sub = blk.shape[1] // 32
            for s in range(32):
                m = jnp.max(blk[:, s * sub:(s + 1) * sub], axis=1,
                            keepdims=True)
                acc = jnp.where(lanes == s, m, acc)
            res = acc
        elif reduce_mode == "fold":
            h = blk
            while h.shape[1] > 128:
                half = h.shape[1] // 2
                h = jnp.maximum(h[:, :half], h[:, half:])
            res = h
        o_ref[...] = (res.astype(jnp.float32)
                      + off_ref[...]).astype(o_ref.dtype)

    nb_b, n_blocks = -(-B // block_b), -(-N // block_n)
    params = {}
    if dimsem is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=dimsem)

    def call(x, off):
        return pl.pallas_call(
            kernel,
            grid=(nb_b, n_blocks),
            in_specs=[pl.BlockSpec((block_b, block_n), lambda i, j: (i, j)),
                      pl.BlockSpec((1, 1), lambda i, j: (0, 0))],
            out_specs=pl.BlockSpec((block_b, 128), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((nb_b * block_b, 128), x.dtype),
            **params,
        )(x, off)

    return call


def chained_time(call, scores, r=R):
    """Per-call device time of ``call`` by scalar-dependency chaining."""
    @jax.jit
    def run(x):
        off = jnp.zeros((1, 1), x.dtype)
        for _ in range(r):
            out = call(x, off)
            off = out[:1, :1] * 0.0
        return off
    return timeit(lambda: run(scores)) / r


def main():
    rs = np.random.RandomState(0)
    scores = jnp.asarray(rs.randn(B, N).astype(np.float32))
    nbytes = B * N * 4
    print(f"scores ({B}, {N}) f32 = {nbytes/1e6:.0f} MB; "
          f"chip: {jax.devices()[0].device_kind}; chain R={R}")

    # dispatch floor
    tiny = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    np.asarray(f(tiny))
    t0 = time.perf_counter()
    out = tiny
    for _ in range(30):
        out = f(out)
    np.asarray(out)
    print(f"dispatch floor (trivial jit call): "
          f"{(time.perf_counter()-t0)/30*1e3:.3f} ms/call")

    print("\n-- pure stream (load + single row max), scalar-chained --")
    for block_b, block_n in ((256, 2048), (256, 4096), (512, 2048),
                             (128, 4096), (1024, 1024), (128, 8192)):
        for dimsem in (None, ("parallel", "arbitrary")):
            tag = "default" if dimsem is None else "par,arb"
            call = make_stream_kernel(block_b, block_n, dimsem, "max")
            t = chained_time(call, scores)
            row(f"stream b={block_b} n={block_n} [{tag}]", t, nbytes)

    print("\n-- threshold-pass compute styles (b=256 n=4096, par,arb) --")
    for mode in ("max", "sub32", "fold"):
        call = make_stream_kernel(256, 4096, ("parallel", "arbitrary"), mode)
        t = chained_time(call, scores)
        row(f"reduce={mode}", t, nbytes)

    print("\n-- concurrency / dtype probes, scalar-chained --")
    # two concurrent input streams: is the 240 GB/s cap per-stream (DMA
    # queue depth) or chip-global?
    half = N // 2
    s_lo, s_hi = scores[:, :half], scores[:, half:]

    def make_stream2(block_b, block_n):
        def kernel(a_ref, b_ref, off_ref, o_ref):
            m = jnp.maximum(jnp.max(a_ref[...], axis=1, keepdims=True),
                            jnp.max(b_ref[...], axis=1, keepdims=True))
            o_ref[...] = jnp.broadcast_to(m, o_ref.shape) + off_ref[0, 0]

        nb_b, n_blocks = -(-B // block_b), -(-half // block_n)

        def call(x, off):
            return pl.pallas_call(
                kernel,
                grid=(nb_b, n_blocks),
                in_specs=[
                    pl.BlockSpec((block_b, block_n), lambda i, j: (i, j)),
                    pl.BlockSpec((block_b, block_n), lambda i, j: (i, j)),
                    pl.BlockSpec((1, 1), lambda i, j: (0, 0))],
                out_specs=pl.BlockSpec((block_b, 128), lambda i, j: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((nb_b * block_b, 128),
                                               jnp.float32),
                **{})(x[0], x[1], off)
        return call

    for block_b, block_n in ((256, 2048), (128, 2048)):
        call2 = make_stream2(block_b, block_n)

        @jax.jit
        def run2(a, b):
            off = jnp.zeros((1, 1), jnp.float32)
            for _ in range(R):
                out = call2((a, b), off)
                off = out[:1, :1] * 0.0
            return off
        t = timeit(lambda: run2(s_lo, s_hi)) / R
        row(f"stream2 (2 operands) b={block_b} n={block_n}", t, nbytes)

    sb = scores.astype(jnp.bfloat16)
    call = make_stream_kernel(256, 4096, None, "max")

    @jax.jit
    def runbf(x):
        off = jnp.zeros((1, 1), jnp.float32)
        for _ in range(R):
            out = call(x, off)
            off = out[:1, :1].astype(jnp.float32) * 0.0
        return off
    t = timeit(lambda: runbf(sb)) / R
    row("stream bf16 b=256 n=4096 (half the bytes)", t, nbytes // 2)

    print("\n-- kernel-internal stages, scalar-chained --")
    from skrx.ops.pallas.topk_blocks import vmem_topk

    cand = jnp.asarray(rs.randn(B, 1280).astype(np.float32))
    iot = jnp.broadcast_to(jnp.arange(1280, dtype=jnp.int32)[None], cand.shape)

    @jax.jit
    def run_merge(c):
        off = jnp.zeros((), jnp.float32)
        for _ in range(R):
            v, i = vmem_topk(c + off, iot, K)
            off = v[0, 0] * 0.0
        return off
    t = timeit(lambda: run_merge(cand)) / R
    row("vmem_topk (1024, 1280) k=50 (merge stage)", t, B * 1280 * 4)

    print("\n-- ceiling probes: R DISTINCT arrays, one dispatch (no CSE, "
          "no copies, no dispatch floor) --")
    # VERDICT r3 #3: the 240 GB/s "pure-load ceiling" came from the chained
    # pallas stream, whose serialization between chained calls could hide
    # headroom, while the XLA row-max baseline was dispatch-inclusive.
    # These probes give every implementation the same clean metrology:
    # R independent 160 MB operands inside ONE jit — nothing can be CSEd,
    # nothing needs a dependency-induced copy, and XLA/Mosaic may overlap
    # the streams (we WANT the achievable peak for a ceiling number).
    xs = [jnp.asarray(rs.randn(B, N).astype(np.float32)) for _ in range(R)]

    @jax.jit
    def rowmax_multi(*arrs):
        return sum(jnp.max(a, axis=1) for a in arrs)
    guarded("XLA row max, R distinct arrays / dispatch",
            lambda: timeit(lambda: rowmax_multi(*xs)) / R, nbytes)

    # read+write ceiling: a pallas copy whose full (B, N) output lands in
    # HBM but only a (1, 1) slice crosses the tunnel (an XLA `a * c` copy
    # can't be timed here: materializing its output moves 160 MB through
    # the tunnel and times the transfer, not the chip)
    def copy_call(x):
        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 1.000001
        return pl.pallas_call(
            kernel,
            grid=(B // 256, N // 4096),
            in_specs=[pl.BlockSpec((256, 4096), lambda i, j: (i, j))],
            out_specs=pl.BlockSpec((256, 4096), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        )(x)

    @jax.jit
    def copy_multi(*arrs):
        return sum(copy_call(a)[0, 0] for a in arrs)
    guarded("pallas copy (read+write), R distinct arrays",
            lambda: timeit(lambda: copy_multi(*xs)) / R, 2 * nbytes)

    stream_call = make_stream_kernel(256, 4096, ("parallel", "arbitrary"),
                                     "max")
    zoff = jnp.zeros((1, 1), jnp.float32)

    @jax.jit
    def stream_multi(*arrs):
        return sum(stream_call(a, zoff)[0, 0] for a in arrs)
    guarded("pallas stream b=256 n=4096, R distinct arrays",
            lambda: timeit(lambda: stream_multi(*xs)) / R, nbytes)

    print("\n-- XLA reference ops, back-to-back dispatch --")
    rowmax = jax.jit(lambda x: jnp.max(x, axis=1))
    t = timeit(lambda: rowmax(scores), reps=20)
    row("XLA row max (jnp.max axis=1)  [>= dispatch floor]", t, nbytes)

    print("\n-- real kernels, back-to-back dispatch (device-bound) --")
    from skrx.ops.pallas.topk_blocks import blockwise_topk

    for block_b, block_n in ((256, 4096), (512, 2048), (256, 2048),
                             (128, 4096)):
        call = jax.jit(functools.partial(blockwise_topk, k=K,
                                         block_n=block_n, block_b=block_b))
        guarded(f"blockwise_topk e2e b={block_b} n={block_n}",
                lambda: timeit(lambda: call(scores)[0], reps=20), 2 * nbytes)

    mask = jnp.asarray(rs.randint(0, N, (B, 64)).astype(np.int32))
    guarded("blockwise_topk e2e fused-mask (default blocks)",
            lambda: timeit(lambda: blockwise_topk(scores, K,
                                                  mask_table=mask)[0],
                           reps=20), 2 * nbytes)

    # chained TRUE device time of the full masked kernel (dependency
    # threaded through the tiny mask table VIA FLOAT — integer x*0 gets
    # constant-folded and the whole chain DCEd, see ADVICE r3)
    @jax.jit
    def run_masked_chain(s, m):
        off = jnp.zeros((1, 1), jnp.int32)
        for _ in range(R):
            v, i = blockwise_topk(s, K, mask_table=m + off)
            off = (i[:1, :1].astype(jnp.float32) * 0.0).astype(jnp.int32)
        return off
    guarded("blockwise_topk fused-mask, scalar-chained",
            lambda: timeit(lambda: run_masked_chain(scores, mask)) / R,
            2 * nbytes)

    guarded("XLA lax.top_k",
            lambda: timeit(lambda: lax.top_k(scores, K)[0], reps=20),
            nbytes)


if __name__ == "__main__":
    main()
