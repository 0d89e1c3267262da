"""Hyper-parameter search driver (TPE via the hyperopt library).

Capability parity with reference skrec/utils/hyperopt.py:20-133: same search
semantics — `hp.choice` space from ``ModelConfig.param_space()``, TPE with
``max_evals = num_combos``, search-level EarlyStopping("NDCG@10",
patience=max(num_combos/2, 10)), per-trial TSV log rows, objective =
-NDCG@10 of ``model.fit()``; when hyperopt is off (or the model declares no
grid), a single fit runs.
"""
import json
import os
import platform
import time
from copy import deepcopy
from typing import Dict

from ..eval import EarlyStopping, MetricReport
from ..io import RSDataset
from ..run_config import RunConfig
from ..version import __version__
from .generic import slugify
from .logger import Logger

__all__ = ["HyperOpt"]


class HyperOpt:
    def __init__(self, run_config: RunConfig, model_class, config_class,
                 fixed_params: Dict):
        run_config.hyperopt = bool(run_config.hyperopt
                                   and config_class.param_space())
        self._run_config = run_config
        self._model_class = model_class
        self._config_class = config_class
        # (run_config.compute_dtype is routed into the model config by
        # AbstractRecommender.__init__ — one mechanism for the CLI/HyperOpt
        # path AND direct library construction.)
        self._fixed_params = fixed_params
        self._current_model = None
        self._best_trial_str = None
        if not run_config.hyperopt:
            return

        try:  # TPE via the hyperopt library when available
            from hyperopt import hp
            self._param_space = {key: hp.choice(key, values)
                                 for key, values in
                                 config_class.param_space().items()}
            self._have_hyperopt = True
        except ImportError:
            # fallback: exhaustive shuffled grid search with the same
            # early-stopping semantics (capability-preserving when the
            # hyperopt dependency is absent)
            self._param_space = None
            self._have_hyperopt = False
        self._num_combos = config_class.num_combos()
        self._patience = max(int(self._num_combos / 2), 10)
        self._early_stopping = EarlyStopping(metric="NDCG@10",
                                             patience=self._patience)
        self._dataset = RSDataset(run_config.data_dir, run_config.sep,
                                  run_config.file_column)
        self.logger = self._create_logger()

    def _create_logger(self) -> Logger:
        timestamp = time.time()
        param_str = slugify(f"{self._dataset.data_name}_"
                            f"{self._model_class.__name__}", max_len=155)
        run_id = f"hyperopt_{param_str}_{timestamp:.8f}"
        data_tag = os.path.basename(
            os.path.normpath(self._dataset.data_dir))
        log_dir = os.path.join("log", data_tag,
                               self._model_class.__name__)
        logger = Logger(os.path.join(log_dir, run_id + ".log"))
        logger.info("Task: Tune Hyper-Parameters")
        logger.info(f"Server:\t{platform.node()}")
        logger.info(f"Workspace:\t{os.getcwd()}")
        logger.info(f"PID:\t{os.getpid()}")
        logger.info(f"skrx version:\tv{__version__}")
        logger.info(f"Model:\t{self._model_class.__module__}")
        logger.info(f"Dataset:\t{os.path.abspath(self._dataset.data_dir)}")
        logger.info("Hyper-Parameters Info:\t"
                    + json.dumps(self._config_class.param_space()))
        logger.info("")
        return logger

    @property
    def fixed_params(self) -> Dict:
        return deepcopy(self._fixed_params)

    def run(self):
        if not self._run_config.hyperopt:
            model = self._model_class(self._run_config, self.fixed_params)
            return model.fit()
        if not self._have_hyperopt:
            return self._run_grid_search()

        from hyperopt import Trials, fmin, space_eval, tpe

        trials = Trials()
        self.logger.info(f"Early stopping patience:\t{self._patience}")
        self.logger.info(f"fmin max evals count:\t{self._num_combos}")
        best = fmin(fn=self.objective, space=self._param_space,
                    algo=tpe.suggest, max_evals=self._num_combos,
                    trials=trials, early_stop_fn=self.early_stop_fn,
                    verbose=False)
        del best, space_eval  # fmin's argmin is the stop-sentinel trial
        self.logger.info("Best params:\t"
                         + json.dumps(getattr(self, "_best_params", {}),
                                      default=str))
        self.logger.info("\n\nBest results:")
        self.logger.info(str(self._best_trial_str))
        self.logger.info("\nDetailed results:\n"
                         + json.dumps(self._early_stopping.best_result.results,
                                      default=str))
        return self._early_stopping.best_result

    def _run_grid_search(self):
        """Shuffled exhaustive grid with the search-level early stopping —
        used when the hyperopt library is unavailable."""
        import itertools
        import random as pyrandom

        space = self._config_class.param_space()
        keys = list(space.keys())
        combos = list(itertools.product(*(space[k] for k in keys)))
        pyrandom.Random(self._run_config.seed).shuffle(combos)
        self.logger.info(f"hyperopt library unavailable; grid search over "
                         f"{len(combos)} combos")
        best_params = None
        for tid, combo in enumerate(combos):
            params = self.fixed_params
            params.update(dict(zip(keys, combo)))
            self._current_model = self._model_class(self._run_config, params)
            result = self._current_model.fit()
            score = result[self._early_stopping.key_metric]
            self.logger.info(f"trial {tid}\t{dict(zip(keys, combo))}\t"
                             f"{self._early_stopping.key_metric}={score:.6f}")
            stopped = self._early_stopping(result)
            if self._early_stopping.best_result is result:
                best_params = dict(zip(keys, combo))
            if stopped:
                self.logger.info("search early stop")
                break
        self.logger.info("Best params:\t" + json.dumps(best_params, default=str))
        self.logger.info("\nDetailed results:\n" + json.dumps(
            self._early_stopping.best_result.results, default=str))
        return self._early_stopping.best_result

    def objective(self, hp_params) -> float:
        model_params = self.fixed_params
        model_params.update(hp_params)
        self._current_model = self._model_class(self._run_config, model_params)
        result: MetricReport = self._current_model.fit()
        loss = -result[self._early_stopping.key_metric]
        prev_best = self._early_stopping.best_result
        stop = self._early_stopping(result)
        if self._early_stopping.best_result is not prev_best \
                or getattr(self, "_best_params", None) is None:
            # track the ACTUAL best trial's params: fmin's argmin is the
            # early-stop sentinel trial (-10+loss), not the best one
            self._best_params = dict(hp_params)
        if stop:
            # sentinel below any reachable metric value => stop the search
            return -10.0 + loss
        return loss

    def early_stop_fn(self, trials):
        from hyperopt import space_eval

        latest = trials.trials[-1]
        if len(trials.trials) == 1:
            self.logger.info(self._trial2title(latest))
        self.logger.info(self._trial2value(latest))
        stopped = latest["result"]["loss"] < -1.01
        if not stopped:
            self._best_trial_str = self._trial2value(trials.best_trial)
        return stopped, []

    def _real_params(self, trial: Dict) -> Dict:
        from hyperopt import space_eval

        vals = trial["misc"]["vals"]
        rval = {k: v[0] for k, v in vals.items() if v}
        return space_eval(self._param_space, rval)

    def _trial2title(self, trial: Dict) -> str:
        titles = ["tid"] + list(self._real_params(trial).keys()) \
            + ["loss", "book_time", "refresh_time"]
        return "\t".join(f"{v}".ljust(20) for v in titles)

    def _trial2value(self, trial: Dict) -> str:
        values = [trial["tid"]] + list(self._real_params(trial).values()) \
            + [trial["result"]["loss"], trial["book_time"],
               trial["refresh_time"]]
        return "\t".join(f"{v}".ljust(20) for v in values)
