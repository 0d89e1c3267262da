"""Minimal deterministic stand-in for the `hyperopt` library (VERDICT r4
#5): just enough surface for skrx.utils.hyperopt_driver's TPE branch —
``hp.choice`` / ``Trials`` / ``fmin`` / ``tpe.suggest`` / ``space_eval`` —
with ``fmin`` walking the choice space exhaustively in deterministic order
(index-lexicographic) instead of TPE sampling. Installed into
``sys.modules["hyperopt"]`` by tests so the real TPE code path (objective,
early_stop_fn, trial TSV logging — mirroring reference
skrec/utils/hyperopt.py:73-123) executes in CI, where the library is not
installed."""
import datetime
import itertools


class _Choice:
    def __init__(self, key, values):
        self.key, self.values = key, list(values)


class hp:
    @staticmethod
    def choice(key, values):
        return _Choice(key, values)


class tpe:
    suggest = "tpe-suggest"


class Trials:
    def __init__(self):
        self.trials = []

    @property
    def best_trial(self):
        return min(self.trials, key=lambda t: t["result"]["loss"])


def space_eval(space, rval):
    return {k: space[k].values[idx] for k, idx in rval.items()}


def fmin(fn, space, algo=None, max_evals=None, trials=None,
         early_stop_fn=None, verbose=False):
    keys = list(space.keys())
    combos = list(itertools.product(*(range(len(space[k].values))
                                      for k in keys)))
    if max_evals is not None:
        combos = combos[:max_evals]
    trials = trials if trials is not None else Trials()
    for tid, combo in enumerate(combos):
        rval = dict(zip(keys, combo))
        book = datetime.datetime.now()
        loss = fn(space_eval(space, rval))
        trial = {"tid": tid,
                 "misc": {"vals": {k: [i] for k, i in rval.items()}},
                 "result": {"loss": loss},
                 "book_time": book,
                 "refresh_time": datetime.datetime.now()}
        trials.trials.append(trial)
        if early_stop_fn is not None:
            stopped, _ = early_stop_fn(trials)
            if stopped:
                break
    best = trials.best_trial
    return {k: v[0] for k, v in best["misc"]["vals"].items() if v}
