"""Parameter initializer registry.

Capability parity with reference skrec/utils/torch.py:88-111
(`get_initializer`): same names, same distribution constants
(normal sigma=0.01, truncated_normal sigma=0.01, uniform +-0.05, he/xavier
variants, zeros/ones). Implemented as JAX initializer callables
``(key, shape, dtype) -> Array``.
"""
import jax
import jax.numpy as jnp
from jax.nn import initializers as jinit

__all__ = ["get_initializer", "InitArg", "torch_layer_default"]


class InitArg:
    MEAN = 0.0
    STDDEV = 0.01
    MIN_VAL = -0.05
    MAX_VAL = 0.05


def _normal(key, shape, dtype=jnp.float32):
    return InitArg.MEAN + InitArg.STDDEV * jax.random.normal(key, shape, dtype)


def _truncated_normal(key, shape, dtype=jnp.float32):
    return InitArg.MEAN + InitArg.STDDEV * jax.random.truncated_normal(
        key, -2.0, 2.0, shape, dtype)


def _uniform(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype,
                              minval=InitArg.MIN_VAL, maxval=InitArg.MAX_VAL)


def _zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def _ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)


_INITIALIZERS = {
    "normal": _normal,
    "truncated_normal": _truncated_normal,
    "uniform": _uniform,
    "he_normal": jinit.he_normal(),
    "he_uniform": jinit.he_uniform(),
    "xavier_normal": jinit.glorot_normal(),
    "xavier_uniform": jinit.glorot_uniform(),
    "zeros": _zeros,
    "ones": _ones,
}


def torch_layer_default(key, shape, fan_in: int, dtype=jnp.float32):
    """torch's default nn.Linear / nn.Conv2d init: U(-1/sqrt(fan_in),
    1/sqrt(fan_in)) for both weight (kaiming_uniform with a=sqrt(5)) and
    bias. Models whose reference counterpart leaves a layer at torch
    defaults (e.g. Caser's conv/fc towers — _Caser.reset_parameters only
    re-inits embeddings, Caser.py:104-115) must use this for init parity.
    """
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def get_initializer(init_method: str):
    if init_method not in _INITIALIZERS:
        names = ", ".join(_INITIALIZERS)
        raise ValueError(f"'init_method' is invalid, must be one of '{names}'")
    return _INITIALIZERS[init_method]
