"""Ranking evaluation driver: MetricReport, RankingEvaluator, EarlyStopping.

Capability parity with reference skrec/utils/py/evaluator.py:17-246, with the
compute path re-designed for TPU: instead of predict → copy scores to host →
C++ thread-pool ranking (evaluator.py:192-204), the evaluator keeps the whole
loop on device — models expose ``predict_scores(users) -> (B, N) jax array``,
train-item masking / exact top-k / all metric prefix-sums run inside one jit
(skrx/ops/metrics.py), per-batch metric sums are accumulated on device, and a
single scalar transfer happens at the end. Test batches are padded to a fixed
size so the program compiles once.

Semantics preserved exactly (SURVEY §7.3/§7.4): metrics averaged over users;
cumulative metrics at every k <= max_top with ``top_show`` column selection
(evaluator.py:207-213); leave-one-out and fold-out both supported by the same
math; -inf train masking; NDCG/MAP/MRR details per metric.h.
"""
import itertools
from collections import OrderedDict
from typing import Dict, Iterable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import METRIC2ID, ID2METRIC, eval_score_matrix_device

__all__ = ["MetricReport", "RankingEvaluator", "EarlyStopping"]

# ANSI colors (colorama-free; the file handler strips these).
_COLORS = ["\x1b[31m", "\x1b[32m", "\x1b[33m", "\x1b[34m", "\x1b[35m", "\x1b[36m"]
_RESET = "\x1b[0m"


class MetricReport:
    """Ordered metric -> value mapping with colored string rendering
    (parity: evaluator.py:17-54)."""

    def __init__(self, metrics: Sequence[str], values: Sequence[float]):
        assert len(metrics) == len(values), \
            f"lengths of metrics and values differ ({len(metrics)}!={len(values)})"
        self._results = OrderedDict(zip(metrics, [float(v) for v in values]))

    def metrics(self):
        return self._results.keys()

    def values(self):
        return self._results.values()

    def items(self):
        return self._results.items()

    @property
    def results(self) -> Dict[str, float]:
        return self._results

    @property
    def metrics_str(self) -> str:
        colors = itertools.cycle(_COLORS)
        return "\t".join(c + f"{m}".ljust(12) + _RESET
                         for c, m in zip(colors, self.metrics()))

    @property
    def values_str(self) -> str:
        colors = itertools.cycle(_COLORS)
        return "\t".join(c + f"{v:.8f}".ljust(12) + _RESET
                         for c, v in zip(colors, self.values()))

    def __getitem__(self, item):
        if item not in self._results:
            raise KeyError(item)
        return self._results[item]

    def __str__(self):
        return str(self._results)


def _pad_table(user_dict: Dict[int, np.ndarray], users: np.ndarray,
               pad_id: int, bucket: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """(len(users), maxLen) padded item table + lengths for the given users."""
    lengths = np.array([len(user_dict.get(int(u), ())) for u in users],
                       dtype=np.int32)
    max_len = max(int(lengths.max()) if len(lengths) else 1, 1)
    max_len = ((max_len + bucket - 1) // bucket) * bucket
    table = np.full((len(users), max_len), pad_id, dtype=np.int32)
    for i, u in enumerate(users):
        items = user_dict.get(int(u))
        if items is not None and len(items):
            table[i, : len(items)] = items
    return table, lengths


class RankingEvaluator:
    """Evaluate a model's top-K ranking quality on device.

    The model must provide ``predict(users) -> (B, N) scores`` (numpy or jax
    array — same contract as the reference, evaluator.py:163-192).
    """

    def __init__(self, user_train_dict: Optional[Dict[int, np.ndarray]],
                 user_test_dict: Dict[int, np.ndarray],
                 metric: Union[None, str, Tuple[str, ...], List[str]] = None,
                 top_k: Union[int, List[int], Tuple[int, ...]] = 50,
                 batch_size: int = 256, num_thread: int = 8, mesh=None,
                 eval_mode: str = "auto", chunk_size: int = 65536,
                 chunk_threshold: int = 131072):
        if metric is None:
            metric = ["Precision", "Recall", "MAP", "NDCG", "MRR"]
        elif isinstance(metric, str):
            metric = [metric]
        elif isinstance(metric, (tuple, list)):
            metric = list(metric)
        else:
            raise TypeError(f"invalid 'metric' type: {type(metric).__name__}")
        for m in metric:
            assert m in METRIC2ID, \
                f"'{m}' is not in {tuple(METRIC2ID)}"

        self.user_pos_train = user_train_dict if user_train_dict is not None else {}
        assert len(user_test_dict) > 0, "'user_test_dict' cannot be empty."
        self.user_pos_test = user_test_dict

        self.metrics_num = len(metric)
        self.metrics = tuple(METRIC2ID[m] for m in metric)
        self.num_thread = num_thread  # kept for API parity; unused on device
        self.batch_size = batch_size
        # Optional jax.sharding.Mesh: evaluation batches are sharded over the
        # 'data' axis so ranking/metrics compute data-parallel across chips
        # (no reference counterpart — skrec is single-GPU).
        self.mesh = mesh
        # evaluate() routing: "full" (materialize (B, N)), "chunked" (running
        # top-k merge over catalog slices), "fused" (single-kernel score+
        # select via dot_topk — dot-scoring models only), "topk"
        # (tensor-parallel model.predict_topk), or "auto" — topk when the
        # mesh has a model axis > 1; fused on single-device TPU for models
        # exposing dot factors whenever the threshold-pruned selection
        # engages (the ops.metrics._use_blockwise gate: >= 4096 items AND
        # n/128 >= 2k, i.e. >= 12.8k at k=50 — below that, full eval's
        # small-catalog direct rank count is the fast path);
        # chunked when num_items >= chunk_threshold; else full.
        assert eval_mode in ("auto", "full", "chunked", "fused", "topk"), \
            eval_mode
        self.eval_mode = eval_mode
        self.chunk_size = int(chunk_size)
        self.chunk_threshold = int(chunk_threshold)

        if isinstance(top_k, int):
            self.max_top = top_k
            self.top_show = np.arange(top_k) + 1
        else:
            self.max_top = max(top_k)
            self.top_show = np.sort(top_k)

    def set_train_data(self, user_train_dict: Optional[Dict[int, np.ndarray]] = None):
        self.user_pos_train = user_train_dict if user_train_dict is not None else {}
        self._data_version = getattr(self, "_data_version", 0) + 1

    def set_test_data(self, user_test_dict: Dict[int, np.ndarray]):
        assert len(user_test_dict) > 0, "'user_test_dict' cannot be empty."
        self.user_pos_test = user_test_dict
        self._data_version = getattr(self, "_data_version", 0) + 1

    @property
    def metrics_list(self) -> List[str]:
        return [f"{ID2METRIC[mid]}@{k}" for mid in self.metrics
                for k in self.top_show]

    @property
    def metrics_str(self) -> str:
        colors = itertools.cycle(_COLORS)
        return "\t".join(c + f"{m}".ljust(12) + _RESET
                         for c, m in zip(colors, self.metrics_list))

    def _tables_for(self, users: np.ndarray, num_items: int):
        """Padded train/test tables for the given users, memoized on the
        full-width layout so every eval batch compiles to the same shapes."""
        key = (getattr(self, "_data_version", 0), num_items)
        if getattr(self, "_table_key", None) != key:
            all_users = np.arange(
                max((max(self.user_pos_test, default=0),
                     max(self.user_pos_train, default=0))) + 1, dtype=np.int32)
            self._train_table, _ = _pad_table(self.user_pos_train, all_users,
                                              num_items)
            self._test_table, self._test_len = _pad_table(self.user_pos_test,
                                                          all_users, num_items)
            self._table_key = key
        return (self._train_table[users], self._test_table[users],
                self._test_len[users])

    # -- device-resident eval-table cache ------------------------------
    #
    # Per-epoch evaluation would otherwise re-upload the padded train/test
    # tables through the host->device tunnel every epoch (measured 7.7 s of
    # a 7.8 s Gowalla-scale evaluate(), round 4). A small LRU (not a single
    # slot) so the common fit() pattern of alternating validation-user and
    # test-user evaluations keeps BOTH uploads resident (advisor r4);
    # over the HBM budget the builders return a LAZY generator instead, so
    # only one batch/group of device arrays exists at a time (advisor r4
    # medium — the old fallback still materialized the whole list).

    _LRU_SLOTS = 4

    def _lru_tables(self, key, build, cacheable: bool):
        cache = self.__dict__.setdefault("_eval_table_lru", OrderedDict())
        if cacheable and key in cache:
            cache.move_to_end(key)
            return cache[key]
        if not cacheable:
            return build()          # generator: lazy, nothing retained
        val = list(build())
        cache[key] = val
        while len(cache) > self._LRU_SLOTS:
            cache.popitem(last=False)
        return val

    def _dev_batches(self, users: np.ndarray, num_items: int):
        """Per-batch device tables ``(batch_users, train_t, test_t,
        test_len(>=1), weight)`` for every evaluation strategy that pages
        users through fixed-size batches. Cached across evaluations of the
        same test set; over ``table_cache_budget`` a lazy generator uploads
        one batch at a time."""
        bs = self.batch_size
        n_users = len(users)
        shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))

        def put(x):
            a = jnp.asarray(x)
            return jax.device_put(a, shard) if shard is not None else a

        def build():
            for lo in range(0, n_users, bs):
                batch_users = users[lo: lo + bs]
                n_real = len(batch_users)
                pad = bs - n_real
                if pad:  # pad final batch: same shapes -> one compilation
                    batch_users = np.concatenate(
                        [batch_users,
                         np.full(pad, batch_users[-1], np.int32)])
                train_table, test_table, test_len = self._tables_for(
                    batch_users, num_items)
                weight = (np.arange(bs) < n_real) & (test_len > 0)
                yield (batch_users, put(train_table), put(test_table),
                       put(np.maximum(test_len, 1)),
                       put(weight.astype(np.float32)))

        # width probe (also materializes the full-layout tables host-side)
        self._tables_for(users[:1], num_items)
        w = self._train_table.shape[1] + self._test_table.shape[1]
        total_bytes = 4 * (-(-n_users // bs) * bs) * (w + 3)
        cacheable = total_bytes <= getattr(self, "table_cache_budget",
                                           1 << 30)
        key = ("batches", getattr(self, "_data_version", 0), num_items, bs,
               hash(users.tobytes()))
        return self._lru_tables(key, build, cacheable)

    def _chunked_fns(self):
        """Jitted merge/metric helpers for evaluate_chunked, built once per
        evaluator (fresh closures per call would retrace + recompile every
        evaluation and grow the jit caches without bound)."""
        fns = getattr(self, "_chunked_fns_cache", None)
        if fns is not None:
            return fns
        from ..ops.metrics import (hits_against_padded_truth, mask_items,
                                   ranking_metrics_from_hits,
                                   topk_scores_and_indices)
        k = self.max_top
        metrics = self.metrics
        on_tpu = jax.default_backend() == "tpu"
        # test hook: force the Pallas kernels in interpret mode off-TPU so
        # the mesh/shard_map routing is CPU-verifiable bit-for-bit
        force = getattr(self, "_force_pallas_eval", False)
        use_pal = on_tpu or force
        interp = not on_tpu

        def merge_impl(best_vals, best_idx, scores, train_table, offset):
            """Per-device chunk merge (identical math on/off mesh)."""
            width = scores.shape[1]
            shifted = train_table - offset
            # negative indices would WRAP in the scatter; send both
            # below-chunk and above-chunk ids out of bounds (mode='drop')
            shifted = jnp.where(shifted < 0, width, shifted)
            if force:
                from ..ops.pallas import blockwise_topk
                vals, idx = blockwise_topk(scores, min(k, width),
                                           mask_table=shifted,
                                           interpret=interp)
            elif on_tpu:
                vals, idx = topk_scores_and_indices(scores, min(k, width),
                                                    mask_table=shifted)
            else:
                vals, idx = jax.lax.top_k(mask_items(scores, shifted),
                                          min(k, width))
            idx = idx + offset
            all_vals = jnp.concatenate([best_vals, vals], axis=1)
            all_idx = jnp.concatenate([best_idx, idx], axis=1)
            if use_pal:
                # lax.top_k costs a fixed ~2.7us/row on TPU even at tiny
                # widths — per CHUNK; the VMEM kernel merges in ~0.1ms.
                # Tie-break by id value == reference lowest-global-index.
                from ..ops.pallas import vmem_topk
                return vmem_topk(all_vals, all_idx, k, interpret=interp)
            top_vals, pos = jax.lax.top_k(all_vals, k)
            return top_vals, jnp.take_along_axis(all_idx, pos, axis=1)

        if self.mesh is None or self.batch_size % self.mesh.shape[
                self.mesh.axis_names[0]] != 0:
            merge = jax.jit(merge_impl)
        else:
            # Mesh: run the SAME merge per-device on its batch rows under
            # shard_map (manual sharding — the Pallas kernels apply to the
            # local shard, which auto-partitioning cannot do; round 5,
            # same pattern as parallel/topk_merge.sharded_dot_topk)
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            ax = self.mesh.axis_names[0]
            row = P(ax, None)
            merge = jax.jit(shard_map(
                merge_impl, mesh=self.mesh,
                in_specs=(row, row, row, row, P()),
                out_specs=(row, row), check_vma=False))

        @jax.jit
        def batch_metrics(top_idx, test_table, test_len, weight):
            hits = hits_against_padded_truth(top_idx, test_table)
            per_user = ranking_metrics_from_hits(hits, test_len, metrics)
            return jnp.sum(per_user * weight[:, None, None], axis=0)

        self._chunked_fns_cache = (merge, batch_metrics)
        return self._chunked_fns_cache

    def evaluate_chunked(self, model, num_items: int, chunk_size: int = 65536,
                         test_users: Optional[Iterable[int]] = None
                         ) -> MetricReport:
        """Huge-catalog evaluation that NEVER materializes the (B, N) score
        matrix (SURVEY §7.3): the model must expose
        ``predict_chunk(users, item_lo, item_hi) -> (B, hi-lo)`` scores; per
        chunk we mask train items and keep a running top-k merge, then the
        metrics run on the merged top-k (identical numbers to
        :meth:`evaluate` — tested)."""
        assert hasattr(model, "predict_chunk"), \
            "model must expose predict_chunk(users, lo, hi) for chunked eval"
        if test_users is not None:
            test_users = [int(u) for u in test_users if int(u) in self.user_pos_test]
        else:
            test_users = [int(u) for u in self.user_pos_test.keys()]
        assert len(test_users) > 0, "no test users"
        users = np.asarray(test_users, dtype=np.int32)
        n_users = len(users)
        bs = self.batch_size
        k = self.max_top
        merge, batch_metrics = self._chunked_fns()

        shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))

        metric_sum = None
        for (batch_users, train_table, test_table, test_len,
             weight) in self._dev_batches(users, num_items):
            best_vals = jnp.full((bs, k), -jnp.inf, jnp.float32)
            # sentinel init: an id that can never match a test item OR the
            # test table's pad id (= num_items), so -inf filler slots for
            # users with < k rankable items are misses (index 0 would be
            # falsely hit-checked)
            best_idx = jnp.full((bs, k), num_items + 1, jnp.int32)
            if shard is not None:
                best_vals = jax.device_put(best_vals, shard)
                best_idx = jax.device_put(best_idx, shard)
            for item_lo in range(0, num_items, chunk_size):
                item_hi = min(item_lo + chunk_size, num_items)
                scores = jnp.asarray(
                    model.predict_chunk(batch_users, item_lo, item_hi),
                    jnp.float32)
                if shard is not None:
                    scores = jax.device_put(scores, shard)
                best_vals, best_idx = merge(best_vals, best_idx, scores,
                                            train_table, item_lo)
            batch_sum = batch_metrics(best_idx, test_table, test_len, weight)
            metric_sum = batch_sum if metric_sum is None else metric_sum + batch_sum

        final = np.asarray(metric_sum) / n_users
        final = final[:, self.top_show - 1].reshape(-1)
        return MetricReport(self.metrics_list, final)

    def evaluate_topk(self, model, num_items: int,
                      test_users: Optional[Iterable[int]] = None
                      ) -> MetricReport:
        """Tensor-parallel evaluation: the model's
        ``predict_topk(users, k, train_table) -> (vals, global ids)`` returns
        the train-masked exact top-k with the catalog row-sharded over the
        mesh 'model' axis (two-stage merge), so the (B, N) score matrix never
        exists on one chip; metrics run on the merged top-k — identical
        numbers to :meth:`evaluate` (tested)."""
        assert hasattr(model, "predict_topk"), \
            "model must expose predict_topk(users, k, train_table)"

        def topk_fn(batch_users, k, train_table):
            return model.predict_topk(batch_users, k, train_table)

        return self._evaluate_from_topk(topk_fn, num_items, test_users)

    def evaluate_fused(self, model, num_items: int,
                       test_users: Optional[Iterable[int]] = None
                       ) -> MetricReport:
        """Single-kernel huge-catalog evaluation for dot-scoring models: the
        fused score+select Pallas kernel (skrx/ops/pallas/dot_topk.py)
        recomputes (block_b, block_n) score blocks on the MXU in VMEM during
        both top-k passes, so the (B, N) score matrix never exists AND the
        per-catalog-chunk Python dispatch loop of :meth:`evaluate_chunked`
        collapses to one device call per eval batch. The model must expose
        its dot factorization — either ``_chunk_embeddings() -> (u_all,
        i_all)`` (+ optional ``_chunk_bias``, the ChunkedDotPredictMixin
        contract) or ``_topk_factors(uv)`` over cached per-batch user vectors
        (the CachedUserVecChunkMixin tower contract; dot towers only — SGAT's
        euclidean score has no dot form). Selection is bit-identical to the
        materialized pipeline (same tau bound, same lowest-index tie-break),
        so metrics equal :meth:`evaluate` (tested). Single-device only (the
        kernel is not SPMD-partitionable)."""
        no_custom_score = getattr(model, "_topk_score_fn", None) is None
        dot_tower = hasattr(model, "_topk_factors") and no_custom_score
        assert ((hasattr(model, "_chunk_embeddings") and no_custom_score)
                or dot_tower), \
            "fused eval needs the model's PLAIN dot factors " \
            "(_chunk_embeddings or _topk_factors, without a custom " \
            "score_fn — dot_topk has no activation hook)"
        assert not self._model_parallel(), \
            "fused eval is single-device (the dot_topk kernel is not SPMD-" \
            "partitionable); use eval_mode='topk' on model-parallel meshes"
        interpret = jax.default_backend() != "tpu"
        return self._evaluate_fused_paged(model, num_items, test_users,
                                          interpret)

    def _evaluate_fused_paged(self, model, num_items: int,
                              test_users, interpret: bool) -> MetricReport:
        """Fused evaluation with the dot_topk + metrics of ALL user batches
        paged through one device dispatch: a ``lax.scan`` over the stacked
        per-batch inputs runs the fused score+select and the metric
        prefix-sums per page and accumulates the metric sum on device. One
        host round trip for the ranking work instead of one per batch — on
        the axon tunnel each dispatch costs ~1 ms that does not overlap
        device work, so per-epoch eval at (20k users, bs=1024) was paying
        ~20 ms of pure dispatch.

        Covers BOTH fused families (round 4): ChunkedDotPredict models
        stack per-page user vectors with one device gather; towers
        (CachedUserVecChunkMixin) run their encoder per batch (model code,
        inherently one dispatch each) and only the stacked uv factors enter
        the paged scan. The item table is transposed + padded ONCE
        (pack_items) — the in-call items.T would cost ~N*d*4 bytes per
        batch. Numerics identical to the per-batch loop (same program,
        scanned; tested against evaluate()). The factors enter as ARGUMENTS
        of one cached jitted runner, so per-epoch factor updates never
        retrace."""
        from ..ops.metrics import (hits_against_padded_truth,
                                   hits_from_ranks,
                                   ranking_metrics_from_hits)
        from ..ops.pallas import dot_topk
        from ..ops.pallas.dot_topk import pack_items

        if test_users is not None:
            test_users = [int(u) for u in test_users
                          if int(u) in self.user_pos_test]
        else:
            test_users = [int(u) for u in self.user_pos_test.keys()]
        assert len(test_users) > 0, "no test users"
        users = np.asarray(test_users, dtype=np.int32)
        n_users = len(users)
        bs = self.batch_size
        k = self.max_top
        n_batches = -(-n_users // bs)
        pad_total = n_batches * bs - n_users
        if pad_total:
            users_padded = np.concatenate(
                [users, np.full(pad_total, users[-1], np.int32)])
        else:
            users_padded = users
        train_table, test_table, test_len = self._tables_for(users_padded,
                                                             num_items)
        users_g = users_padded.reshape(n_batches, bs)
        train_g = train_table.reshape(n_batches, bs, -1)
        test_g = test_table.reshape(n_batches, bs, -1)
        len_g = np.maximum(test_len, 1).reshape(n_batches, bs)
        real = np.arange(n_batches * bs) < n_users
        weight_g = (real & (test_len > 0)).astype(np.float32) \
            .reshape(n_batches, bs)

        if hasattr(model, "_chunk_embeddings"):
            u_all, i_all = model._chunk_embeddings()
            bias = model._chunk_bias() if hasattr(model, "_chunk_bias") \
                else None
            u_all = jnp.asarray(u_all, jnp.float32)
            d = int(u_all.shape[1])
            uv_for = None
        else:
            # tower family: item factors are uv-independent (probed with
            # uv=None) and uv passes through _topk_factors untouched (the
            # documented contract), so the per-batch encoder output IS the
            # dot factor; the encoder is model code and stays a dispatch
            # per batch — only its outputs enter the paged scan
            _, i_all, bias = model._topk_factors(None)
            u_all = None
            probe = model._cached_user_vectors(users_g[0])
            d = int(jnp.asarray(probe).shape[1])

            def uv_for(g):
                return jnp.asarray(
                    model._cached_user_vectors(users_g[g]), jnp.float32)
        packed = pack_items(jnp.asarray(i_all, jnp.float32), bias)
        n_items = int(i_all.shape[0])
        sentinel = num_items + 1   # never matches a test id OR the pad id

        # bound the device residency of the stacked per-page inputs (the
        # per-batch loop this replaced held ONE page at a time): page
        # groups of at most ~256 MB of stacked uv+tables per dispatch
        row_bytes = bs * (d + train_g.shape[2] + test_g.shape[2] + 2) * 4
        budget = getattr(self, "paged_mem_budget", 256 << 20)
        pages_per_call = max(1, min(n_batches, budget // row_bytes))
        n_calls = -(-n_batches // pages_per_call)

        key = ("fused_paged", n_items, num_items, k, self.metrics, interpret,
               bs, d, pages_per_call, train_g.shape[2], test_g.shape[2])
        cache = self.__dict__.setdefault("_paged_cache", {})
        runner = cache.get(key)
        if runner is None:
            metrics = self.metrics

            use_ranks = test_g.shape[2] <= 128

            def run(uv_g, items_t, bias2, train_g, test_g, len_g,
                    weight_g):
                # scan ONLY the per-page fused score+select; the tiny-op
                # hits/metric tail batches across all pages afterwards
                # (0.62 ms/page of fixed kernel overhead inside the scan —
                # see ops.metrics.eval_score_matrix_device_paged, round 5)
                def body_ranks(c, inp):
                    # round-5 late: merge-free — count each test item's
                    # exact rank over the fused candidates (score looked
                    # up IN the candidate set for bitwise consistency
                    # with the MXU block matmul; rank(t) < k iff t is in
                    # the sorted top-k ids, so hits are identical to the
                    # merge path's id-compare — ops/pallas/dot_topk.py)
                    uv, tr, te = inp
                    from ..ops.pallas import dot_topk_ranks
                    ranks = dot_topk_ranks(uv, None, None, k, te,
                                           mask_table=tr,
                                           interpret=interpret,
                                           packed=(items_t, bias2),
                                           n=n_items)
                    return c, ranks

                def body_idx(c, inp):
                    uv, tr, _te = inp
                    vals, idx = dot_topk(uv, None, None, k,
                                         mask_table=tr, interpret=interpret,
                                         packed=(items_t, bias2), n=n_items)
                    idx = jnp.where(jnp.isneginf(vals), sentinel, idx)
                    if idx.shape[1] < k:
                        fill = jnp.full((bs, k - idx.shape[1]), sentinel,
                                        jnp.int32)
                        idx = jnp.concatenate([idx, fill], axis=1)
                    return c, idx

                p = uv_g.shape[0]
                if use_ranks:
                    ranks_g = jax.lax.scan(
                        body_ranks, 0, (uv_g, train_g, test_g))[1]
                    hits = hits_from_ranks(ranks_g.reshape(p * bs, -1), k)
                else:       # very wide truth tables: sorted-ids compare
                    idx_g = jax.lax.scan(body_idx, 0,
                                         (uv_g, train_g, test_g))[1]
                    hits = hits_against_padded_truth(
                        idx_g.reshape(p * bs, k), test_g.reshape(p * bs, -1))
                per_user = ranking_metrics_from_hits(
                    hits, len_g.reshape(p * bs), metrics)
                return jnp.sum(
                    per_user * weight_g.reshape(p * bs)[:, None, None],
                    axis=0)

            runner = jax.jit(run)
            cache[key] = runner

        # The stacked tables are fixed across evaluations of the same test
        # set: upload them to the device ONCE and reuse (per-epoch eval was
        # paying a multi-MB host->device table transfer through the tunnel
        # every epoch — measured 7.7 s of a 7.8 s Gowalla-scale evaluate()
        # before this cache; ~0.2 s after). users_g also rides along for
        # the chunk-family uv gather. Cached in the shared 4-slot LRU
        # (_lru_tables) so alternating valid/test evaluations keep both;
        # past table_cache_budget (~1 GB) the generator stays LAZY — one
        # group of device arrays resident at a time.
        tkey = ("paged", getattr(self, "_data_version", 0), num_items, bs,
                pages_per_call, test_g.shape[2], train_g.shape[2],
                hash(users_padded.tobytes()))
        total_bytes = 4 * n_batches * bs * (train_g.shape[2]
                                            + test_g.shape[2] + 3)
        cache_ok = total_bytes <= getattr(self, "table_cache_budget",
                                          1 << 30)

        def build_groups():
            for lo in range(0, n_batches, pages_per_call):
                hi = min(lo + pages_per_call, n_batches)
                gpad = pages_per_call - (hi - lo)
                tr_g, te_g = train_g[lo:hi], test_g[lo:hi]
                ln_g, wt_g = len_g[lo:hi], weight_g[lo:hi]
                us_g = users_g[lo:hi]
                if gpad:   # pad the tail group: one compiled shape,
                    tr_g = np.concatenate(   # zero weight
                        [tr_g, np.repeat(tr_g[-1:], gpad, 0)])
                    te_g = np.concatenate(
                        [te_g, np.repeat(te_g[-1:], gpad, 0)])
                    ln_g = np.concatenate(
                        [ln_g, np.repeat(ln_g[-1:], gpad, 0)])
                    wt_g = np.concatenate(
                        [wt_g,
                         np.zeros((gpad,) + wt_g.shape[1:], np.float32)])
                    us_g = np.concatenate(
                        [us_g, np.repeat(us_g[-1:], gpad, 0)])
                yield (lo, hi, jnp.asarray(us_g),
                       jnp.asarray(tr_g), jnp.asarray(te_g),
                       jnp.asarray(ln_g), jnp.asarray(wt_g))

        groups = self._lru_tables(tkey, build_groups, cache_ok)

        metric_sum = None
        for lo, hi, us_g, tr_g, te_g, ln_g, wt_g in groups:
            if uv_for is None:
                uv_g = u_all[us_g.reshape(-1)].reshape(
                    pages_per_call, bs, d)
            else:
                uv_g = jnp.stack(
                    [uv_for(g) for g in range(lo, hi)])
                gpad = pages_per_call - (hi - lo)
                if gpad:
                    uv_g = jnp.concatenate(
                        [uv_g, jnp.broadcast_to(
                            uv_g[-1:], (gpad,) + uv_g.shape[1:])], 0)
            part = runner(uv_g, packed[0], packed[1], tr_g, te_g, ln_g,
                          wt_g)
            metric_sum = part if metric_sum is None else metric_sum + part
        final = np.asarray(metric_sum) / n_users
        final = final[:, self.top_show - 1].reshape(-1)
        return MetricReport(self.metrics_list, final)

    def _evaluate_from_topk(self, topk_fn, num_items: int,
                            test_users: Optional[Iterable[int]] = None
                            ) -> MetricReport:
        """Shared driver for the strategies that produce a train-masked exact
        top-k directly (``topk``/``fused``): page users through ``topk_fn``,
        guard -inf slots with a sentinel id, run metrics on the top-k."""
        if test_users is not None:
            test_users = [int(u) for u in test_users
                          if int(u) in self.user_pos_test]
        else:
            test_users = [int(u) for u in self.user_pos_test.keys()]
        assert len(test_users) > 0, "no test users"
        users = np.asarray(test_users, dtype=np.int32)
        n_users = len(users)
        bs = self.batch_size
        k = self.max_top
        sentinel = num_items + 1   # never matches a test id OR the pad id
        _, batch_metrics = self._chunked_fns()

        metric_sum = None
        for (batch_users, train_table, test_table, test_len,
             weight) in self._dev_batches(users, num_items):
            vals, idx = topk_fn(batch_users, k, train_table)
            vals = jnp.asarray(vals, jnp.float32)
            idx = jnp.asarray(idx, jnp.int32)
            # -inf slots (masked / padded catalog) must never hit a test item
            idx = jnp.where(jnp.isneginf(vals), sentinel, idx)
            if idx.shape[1] < k:   # catalog smaller than the metric cutoff
                fill = jnp.full((bs, k - idx.shape[1]), sentinel, jnp.int32)
                idx = jnp.concatenate([idx, fill], axis=1)
            batch_sum = batch_metrics(idx, test_table, test_len, weight)
            metric_sum = batch_sum if metric_sum is None \
                else metric_sum + batch_sum

        final = np.asarray(metric_sum) / n_users
        final = final[:, self.top_show - 1].reshape(-1)
        return MetricReport(self.metrics_list, final)

    def _model_parallel(self) -> bool:
        if self.mesh is None:
            return False
        from ..parallel.mesh import model_parallel_size
        return model_parallel_size(self.mesh) > 1

    def evaluate(self, model, test_users: Optional[Iterable[int]] = None) -> MetricReport:
        """Route to the right evaluation strategy (see ``eval_mode``), then
        compute ranking metrics. All strategies produce identical numbers;
        they differ in how the score matrix is (not) materialized."""
        # catalog width of predict's score matrix: models whose predict
        # exposes extra columns (HGN/Caser's zero-scored pad column, parity
        # with the reference's full-W2 predict) declare _eval_width so every
        # strategy ranks the same column range
        num_items = (getattr(model, "_eval_width", None)
                     or getattr(model, "num_items", None))
        mode = self.eval_mode
        tp = self._model_parallel() and hasattr(model, "predict_topk")
        big = (num_items is not None and num_items >= self.chunk_threshold)
        # single-device TPU dot models: the fused score+select kernel beats
        # the materialized predict->mask->top-k pipeline from wherever the
        # threshold-pruned selection engages (measured 0.91 ms vs 2.3 ms
        # per (1024, 40960) batch, r3) — its item-table reads replace three
        # (B, N) score passes — and at huge catalogs it also replaces the
        # chunk dispatch loop. Gate exactly like ops.metrics._use_blockwise
        # so small catalogs keep the plain lax.top_k path.
        no_custom_score = getattr(model, "_topk_score_fn", None) is None
        dot_tower = hasattr(model, "_topk_factors") and no_custom_score
        from ..ops.metrics import _use_blockwise
        fused_sized = (num_items is not None
                       and _use_blockwise(num_items, self.max_top))
        fused_ok = (fused_sized
                    and ((hasattr(model, "_chunk_embeddings")
                          and no_custom_score) or dot_tower)
                    and self.mesh is None
                    and jax.default_backend() == "tpu")
        if fused_ok and mode == "auto":
            # dot_topk's VMEM budget asserts d <= 512; auto must degrade to
            # chunked for wider factors, not crash mid-eval. The embeddings
            # call is the same one fused eval would make (models cache it).
            try:
                if hasattr(model, "_chunk_embeddings"):
                    _, i_all = model._chunk_embeddings()
                else:  # factors are uv-independent; probe with uv=None
                    _, i_all, _ = model._topk_factors(None)
                fused_ok = int(i_all.shape[1]) <= 512
            except NotImplementedError:
                fused_ok = False
        if mode == "fused" or (mode == "auto" and fused_ok and not tp):
            assert num_items is not None, "fused eval needs model.num_items"
            return self.evaluate_fused(model, num_items, test_users)
        if mode == "chunked" or (mode == "auto" and big
                                 and hasattr(model, "predict_chunk")
                                 and not tp):
            assert num_items is not None, \
                "chunked eval needs model.num_items"
            return self.evaluate_chunked(model, num_items, self.chunk_size,
                                         test_users)
        if mode == "topk" or (mode == "auto" and tp):
            assert num_items is not None, "topk eval needs model.num_items"
            return self.evaluate_topk(model, num_items, test_users)
        return self._evaluate_full(model, test_users)

    def _evaluate_full(self, model,
                       test_users: Optional[Iterable[int]] = None) -> MetricReport:
        assert hasattr(model, "predict"), "the model must have a 'predict' method"
        if test_users is not None:
            test_users = [int(u) for u in test_users if int(u) in self.user_pos_test]
        else:
            test_users = [int(u) for u in self.user_pos_test.keys()]
        assert len(test_users) > 0, "no test users"
        users = np.asarray(test_users, dtype=np.int32)
        n_users = len(users)
        bs = self.batch_size

        # num_items comes from the first predict's width; the per-batch
        # device tables ride the shared _dev_batches cache (mesh sharding
        # is baked into the cached arrays)
        first_users = users[: bs] if n_users >= bs else np.concatenate(
            [users, np.full(bs - n_users, users[-1], np.int32)])
        first_scores = jnp.asarray(model.predict(first_users),
                                   dtype=jnp.float32)
        shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))

        metric_sum = None
        batches = self._dev_batches(users, int(first_scores.shape[1]))
        for bi, (batch_users, train_table, test_table, test_len_j,
                 weight_j) in enumerate(batches):
            scores = first_scores if bi == 0 else jnp.asarray(
                model.predict(batch_users), dtype=jnp.float32)
            if shard is not None:
                scores = jax.device_put(scores, shard)
            per_user = eval_score_matrix_device(
                scores, train_table, test_table, test_len_j, self.metrics,
                self.max_top, use_pallas=self.mesh is None)
            batch_sum = jnp.sum(per_user * weight_j[:, None, None], axis=0)
            metric_sum = batch_sum if metric_sum is None \
                else metric_sum + batch_sum

        final = np.asarray(metric_sum) / n_users          # (M, max_top)
        final = final[:, self.top_show - 1].reshape(-1)
        return MetricReport(self.metrics_list, final)


class EarlyStopping:
    """Track the best MetricReport on one key metric with patience
    (parity: evaluator.py:217-246)."""

    def __init__(self, metric: str = "NDCG@10", patience: int = 100):
        self._metric = metric
        self._patience = patience
        self._best_score: Optional[MetricReport] = None
        self._counter = 0

    def __call__(self, val_result: MetricReport) -> bool:
        if self._best_score is None:
            self._best_score = val_result
        elif val_result[self.key_metric] <= self._best_score[self.key_metric]:
            self._counter += 1
            if self._counter >= self._patience > 0:
                return True
        else:
            self._best_score = val_result
            self._counter = 0
        return False

    @property
    def key_metric(self) -> str:
        return self._metric

    @property
    def best_result(self) -> MetricReport:
        if self._best_score is not None:
            return self._best_score
        return MetricReport(["None"], [0])

    # -- checkpoint support (no reference counterpart) --

    def get_state(self) -> dict:
        best = None
        if self._best_score is not None:
            best = (list(self._best_score.metrics()),
                    list(self._best_score.values()))
        return {"counter": self._counter, "best": best}

    def set_state(self, state: dict) -> None:
        self._counter = state.get("counter", 0)
        best = state.get("best")
        if best is not None:
            self._best_score = MetricReport(best[0], best[1])
