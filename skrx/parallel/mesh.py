"""Device mesh construction and sharding specs.

No reference counterpart: scikit-recommender is single-process/single-GPU
(SURVEY §2.4). This module is the first-class "mesh + collectives" component
of the TPU build: a 2-D ``Mesh(('data', 'model'))`` where training batches
are sharded over ``data`` and the large embedding tables are row-sharded
over ``model``; XLA lowers annotated einsums/gathers to
all-gather/reduce-scatter/psum over ICI.
"""
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "model_row_sharding", "replicated",
           "P", "Mesh", "NamedSharding", "shard_params_for_mf",
           "mf_param_shardings", "model_parallel_size"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh.

    ``shape=None`` uses all devices on the data axis (pure DP).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} does not match {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dimension sharding: leading axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def model_row_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharding for embedding tables: rows split over the model axis."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def model_parallel_size(mesh: Optional[Mesh]) -> int:
    """Size of the model axis (1 when no mesh / no model axis)."""
    if mesh is None:
        return 1
    return int(dict(mesh.shape).get(MODEL_AXIS, 1))


def mf_param_shardings(mesh: Mesh, params):
    """NamedSharding pytree matching :func:`shard_params_for_mf`'s placement
    (used as ``with_sharding_constraint`` targets inside train steps so the
    scan carry keeps its tensor-parallel layout)."""
    rows = model_row_sharding(mesh)
    rep = replicated(mesh)

    def spec(x):
        if hasattr(x, "ndim") and x.ndim == 2 and x.shape[0] >= mesh.shape[MODEL_AXIS]:
            return rows
        return rep

    return jax.tree_util.tree_map(spec, params)


def shard_params_for_mf(mesh: Mesh, params: dict) -> dict:
    """Place MF-style params: embedding tables row-sharded on ``model``,
    everything else replicated. Tables are recognized by ndim==2 and a large
    leading axis; biases replicate."""
    rows = model_row_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim == 2 and x.shape[0] >= mesh.shape[MODEL_AXIS]:
            return jax.device_put(x, rows)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, params)
