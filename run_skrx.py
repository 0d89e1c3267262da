"""CLI entry point.

Capability parity with reference run_skrec.py:8-86:
``python run_skrx.py --recommender BPRMF --data_dir <dir> --lr 0.001 ...``
Flags are split between RunConfig keys and model hyper-parameters exactly as
in the reference (one flat ``--key value`` list; unknown keys flow to the
model config). Seeding covers numpy/random/JAX (JAX PRNG keys are derived
from RunConfig.seed inside the models).
"""
import os
import random
import sys

import numpy as np

from skrx import RunConfig
from skrx.utils import ModelRegistry, merge_config_with_cmd_args
from skrx.utils import merge_config_with_ini
from skrx.utils.hyperopt_driver import HyperOpt
from skrx.utils.random import set_host_seed


def _set_random_seed(seed: int = 2020):
    np.random.seed(seed)
    random.seed(seed)
    set_host_seed(seed)


def main():
    run_dict = {"recommender": "BPRMF",
                "data_dir": "",
                "file_column": "UIRT",
                "sep": "\t",
                "hyperopt": False,
                "gpu_id": 0,
                "metric": ("Precision", "Recall", "MAP", "NDCG"),
                "top_k": (10, 20, 30, 40, 50),
                "test_thread": 4,
                "test_batch_size": 64,
                "seed": 2021}

    # Optional ini overlay: --config <file.ini> (restores the advertised
    # capability missing from the reference code, SURVEY §5.6). Run-level
    # keys (EVERY declared RunConfig field, incl. the TPU extensions:
    # mesh_shape, checkpoint_dir/checkpoint_every/resume, profile_dir,
    # compute_dtype) overlay run_dict; everything else in the ini is a MODEL
    # hyper-parameter. CLI flags override both.
    run_keys = set(RunConfig().to_dict().keys())
    argv = sys.argv[1:]
    model_params = {}
    if "--config" in argv:
        i = argv.index("--config")
        ini_all = merge_config_with_ini({}, argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
        run_dict.update({k: v for k, v in ini_all.items() if k in run_keys})
        model_params.update({k: v for k, v in ini_all.items()
                             if k not in run_keys})

    cli = merge_config_with_cmd_args({}, argv)
    run_dict.update({k: v for k, v in cli.items() if k in run_keys})
    model_params.update({k: v for k, v in cli.items() if k not in run_keys})
    run_config = RunConfig(**run_dict)
    model_name = run_config.recommender

    registry = ModelRegistry()
    registry.load_skrx_model(model_name)
    if os.path.exists("unarchived_models"):
        registry.load_model_from_dir("unarchived_models", model_name)
    model_class, _config_class = registry.get_model(model_name)

    _set_random_seed(run_config.seed)
    hyperopt = HyperOpt(run_config, model_class, _config_class, model_params)
    return hyperopt.run()


if __name__ == "__main__":
    main()
