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

__all__ = ["__version__", "RunConfig", "utils", "io"]
