"""skrx — a TPU-native recommender framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
scikit-recommender (skrec): 26-model top-N recommendation zoo, dataset layer,
on-device negative sampling + ranking evaluation, config/registry/hyperopt
drivers, plus multi-host SPMD machinery the reference lacks.
"""
from .version import __version__
from .run_config import RunConfig
from . import utils
from . import io
# top-level convenience re-exports (reference skrec/__init__.py:6-13 parity)
from .utils import (Config, ModelConfig, ModelRegistry,
                    merge_config_with_cmd_args, merge_config_with_ini)

__all__ = ["__version__", "RunConfig", "utils", "io",
           "Config", "ModelConfig", "ModelRegistry",
           "merge_config_with_cmd_args", "merge_config_with_ini"]
