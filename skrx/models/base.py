"""Abstract recommender + shared JAX training harness.

Capability parity with reference skrec/recommender/base.py:20-74 (dataset /
logger / evaluator / activity-group wiring, run-id naming) plus the shared
``fit()`` epoch loop that in the reference is duplicated in every model
(e.g. BPRMF.py:101-139): per-epoch on-device training, per-epoch evaluation,
early stopping on NDCG@10, colored metric logging. Concrete models supply
``_train_epoch`` and ``predict`` only.
"""
import os
import platform
import time
from typing import Iterable, List, Optional, Tuple, Union

import numpy as np

from ..eval import EarlyStopping, MetricReport, RankingEvaluator
from ..io import RSDataset, group_users_by_interactions
from ..run_config import RunConfig
from ..utils import Config, Logger, slugify
from ..version import __version__


def resolve_eval_batch_size(batch_size: Union[int, str],
                            num_items: int) -> int:
    """Resolve RunConfig.test_batch_size. "auto" picks the largest
    power-of-two batch whose (B, num_items) f32 score block stays under
    ~1 GB, clamped to [64, 4096] (throughput keeps rising through B=4096
    with the Pallas eval top-k — 326k -> 506k users/s from 1024 -> 4096 at
    N=40k; metrics are batch-size invariant — BASELINE.md)."""
    if not isinstance(batch_size, str):
        return int(batch_size)
    budget_rows = (2 ** 30) // max(4 * num_items, 1)
    b = 64
    while b * 2 <= min(budget_rows, 4096):
        b *= 2
    return b

__all__ = ["AbstractRecommender", "JaxRecommender"]


class AbstractRecommender:
    def __init__(self, run_config: RunConfig, model_config: Config):
        self.run_config = run_config
        # Route the run-level dtype policy into the model config (models
        # read it AFTER this constructor returns). Models with a
        # mixed-precision path declare a ``compute_dtype`` field
        # (SASRec/BERT4Rec/MultVAE); an explicitly passed model-level value
        # wins; models without the field warn-and-ignore — their compute
        # stays f32 for metric parity with the reference.
        cdt = getattr(run_config, "compute_dtype", "float32")
        if cdt != "float32":
            if not hasattr(type(model_config), "compute_dtype"):
                import warnings
                warnings.warn(
                    f"RunConfig.compute_dtype={cdt!r} ignored: "
                    f"{type(model_config).__name__} declares no "
                    f"compute_dtype (no bfloat16 compute path); this model "
                    f"runs float32")
            elif "compute_dtype" not in model_config.__dict__:
                model_config.compute_dtype = cdt
        self.dataset = RSDataset(run_config.data_dir, run_config.sep,
                                 run_config.file_column)
        self.logger: Logger = self._create_logger(self.dataset, model_config)
        self.dataset.set_logger(self.logger)
        mesh = None
        if getattr(run_config, "mesh_shape", None):
            from ..parallel import make_mesh
            mesh = make_mesh(tuple(run_config.mesh_shape))
        self.mesh = mesh
        self.evaluator = RankingEvaluator(
            self.dataset.train_data.to_user_dict(),
            self.dataset.test_data.to_user_dict(),
            metric=run_config.metric, top_k=run_config.top_k,
            batch_size=resolve_eval_batch_size(run_config.test_batch_size,
                                               self.dataset.num_items),
            num_thread=run_config.test_thread, mesh=mesh,
            eval_mode=getattr(run_config, "eval_mode", "auto"),
            chunk_size=getattr(run_config, "eval_chunk_size", 65536),
            chunk_threshold=getattr(run_config, "eval_chunk_threshold",
                                    131072))
        # fail fast on a forced eval_mode this model cannot serve — better
        # than burning a training epoch and asserting at the first eval
        _mode = self.evaluator.eval_mode
        _ok = True
        if _mode == "chunked":
            _ok = hasattr(type(self), "predict_chunk")
        elif _mode == "topk":
            _ok = hasattr(type(self), "predict_topk")
        elif _mode == "fused":
            _ok = (hasattr(type(self), "_chunk_embeddings")
                   or (hasattr(type(self), "_topk_factors")
                       and getattr(type(self), "_topk_score_fn", None)
                       is None))
        if not _ok:
            raise TypeError(
                f"eval_mode={_mode!r} is not supported by "
                f"{type(self).__name__} (its predict has no compatible "
                f"factorization); use eval_mode='auto' or 'full'")
        self._user_groups = group_users_by_interactions(self.dataset)

    def _create_logger(self, dataset: RSDataset, config: Config) -> Logger:
        timestamp = time.time()
        model_name = self.__class__.__name__
        param_str = slugify(f"{dataset.data_name}_{model_name}_"
                            f"{config.to_string('_')}", max_len=155)
        run_id = f"{param_str}_{timestamp:.8f}"
        # basename keeps logs under ./log/ even for absolute data_dir
        # (os.path.join discards 'log' when a component is absolute)
        data_tag = os.path.basename(os.path.normpath(dataset.data_dir))
        log_dir = os.path.join("log", data_tag, model_name)
        logger = Logger(os.path.join(log_dir, run_id + ".log"))

        logger.info(f"Server:\t{platform.node()}")
        logger.info(f"Workspace:\t{os.getcwd()}")
        logger.info(f"PID:\t{os.getpid()}")
        logger.info(f"skrx version:\tv{__version__}")
        logger.info(f"Model:\t{self.__class__.__module__}")
        logger.info(f"\n{dataset.statistic_info}")
        logger.info(f"\nHyper-parameters:\n{config.to_string(chr(10))}\n")
        return logger

    def fit(self) -> MetricReport:
        raise NotImplementedError

    def evaluate(self, test_users: Optional[Iterable[int]] = None) -> MetricReport:
        return self.evaluator.evaluate(self, test_users)

    def evaluate_group(self) -> List[Tuple[str, MetricReport]]:
        return [(g.label, self.evaluate(g.users)) for g in self._user_groups]

    def predict(self, users: Union[List[int], np.ndarray]):
        raise NotImplementedError


class JaxRecommender(AbstractRecommender):
    """Shared epoch-loop harness for JAX models.

    Subclasses set ``self.config`` (with epochs / early_stop) before calling
    ``super().__init__`` and implement:

    * ``_train_epoch(epoch) -> float`` — run one epoch (on device), return loss.
    * ``predict(users) -> (B, N) scores`` — device array is fine.
    """

    def _checkpointer(self):
        rc = self.run_config
        if not rc.checkpoint_dir or rc.checkpoint_every <= 0:
            return None
        from ..utils.checkpoint import Checkpointer
        return Checkpointer(os.path.join(rc.checkpoint_dir,
                                         type(self).__name__))

    def _train_state(self):
        """Pytree saved in checkpoints; subclasses with extra state override."""
        state = {}
        if getattr(self, "params", None) is not None:
            state["params"] = self.params
        if getattr(self, "opt_state", None) is not None:
            state["opt_state"] = self.opt_state
        return state

    def _load_train_state(self, state) -> None:
        if "params" in state:
            self.params = state["params"]
        if "opt_state" in state:
            self.opt_state = state["opt_state"]

    # conventional derived-prediction caches (propagated embeddings, user
    # vectors); cleared after every training epoch so predict() never serves
    # stale state (e.g. fit() aborting on non-finite loss before evaluate())
    _PREDICT_CACHE_ATTRS = ("_final", "_final_emb", "_final_items",
                            "_uv_cache")

    def _invalidate_predict_cache(self) -> None:
        for attr in self._PREDICT_CACHE_ATTRS:
            if getattr(self, attr, None) is not None:
                setattr(self, attr, None)

    def fit(self) -> MetricReport:
        self.logger.info("metrics:".ljust(12) + f"\t{self.evaluator.metrics_str}")
        # universal scan-chunking knob (see pipeline.max_scan_steps)
        cap = getattr(self.config, "max_scan_steps", None)
        if cap is not None and getattr(self, "pipeline", None) is not None:
            self.pipeline.max_scan_steps = int(cap)
        early_stopping = EarlyStopping(metric="NDCG@10",
                                       patience=self.config.early_stop)
        # evaluate every `verbose` epochs (BERT4Rec parity: the reference
        # Estimator loop strides epochs by verbose, BERT4Rec.py:180, so
        # early-stop patience counts EVALUATIONS, not epochs); every other
        # model keeps verbose=1
        eval_every = max(1, int(getattr(self.config, "verbose", 1)))
        ckpt = self._checkpointer()
        start_epoch = 0
        if ckpt is not None and self.run_config.resume:
            state, extra, step = ckpt.restore(self._train_state())
            if step is not None:
                self._load_train_state(state)
                early_stopping.set_state(extra.get("early_stopping", {}))
                start_epoch = extra.get("epoch", step) + 1
                self.logger.info(f"resumed from checkpoint at epoch {step}")

        profile_dir = getattr(self.run_config, "profile_dir", "")
        epoch_start = time.perf_counter()
        for epoch in range(start_epoch, self.config.epochs):
            # profile the second epoch (first is dominated by compilation)
            profiling = bool(profile_dir) and epoch == start_epoch + 1
            if profiling:
                import jax
                jax.profiler.start_trace(profile_dir)
            loss = self._train_epoch(epoch)
            self._invalidate_predict_cache()
            if loss is not None and not np.isfinite(loss):
                # failure detection: divergence aborts cleanly with the best
                # checkpointed/early-stopped result instead of burning epochs
                self.logger.error(f"epoch {epoch}: non-finite loss ({loss}); "
                                  f"stopping")
                break
            skip_eval = ((epoch + 1) % eval_every != 0
                         and epoch != self.config.epochs - 1)
            if profiling and skip_eval:
                # stop the trace even on non-eval epochs (verbose > 1) so the
                # profiled epoch is never left open
                import jax
                jax.profiler.stop_trace()
                self.logger.info(f"profiler trace written to {profile_dir}")
            if ckpt is not None and skip_eval and \
                    (epoch + 1) % self.run_config.checkpoint_every == 0:
                # checkpoint cadence is independent of eval cadence
                ckpt.save(epoch, self._train_state(),
                          {"epoch": epoch,
                           "early_stopping": early_stopping.get_state()})
            if skip_eval:
                continue  # final epoch always evaluates
            cur_result = self.evaluate()
            if profiling:
                import jax
                jax.profiler.stop_trace()
                self.logger.info(f"profiler trace written to {profile_dir}")
            elapsed = time.perf_counter() - epoch_start
            epoch_start = time.perf_counter()
            loss_str = f"loss={loss:.5f} [{elapsed:.2f}s]" if loss is not None else ""
            self.logger.info(f"epoch {epoch}:".ljust(12)
                             + f"\t{cur_result.values_str}\t{loss_str}")
            stop = early_stopping(cur_result)
            if ckpt is not None and \
                    (epoch + 1) % self.run_config.checkpoint_every == 0:
                ckpt.save(epoch, self._train_state(),
                          {"epoch": epoch,
                           "early_stopping": early_stopping.get_state()})
            if stop:
                self.logger.info("early stop")
                break
        self.logger.info("best:".ljust(12)
                         + f"\t{early_stopping.best_result.values_str}")
        return early_stopping.best_result

    def _train_epoch(self, epoch: int) -> Optional[float]:
        raise NotImplementedError
