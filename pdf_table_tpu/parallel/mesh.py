"""Device mesh + sharding utilities.

The reference has no distributed runtime (SURVEY.md §2.10: single GPU,
hard-coded cuda:0 in base_infer_task.py:69). The TPU framework's scaling
story is *data parallelism over pages/crops*: a 1-D "dp" mesh, batch dims
sharded with NamedSharding, params replicated, XLA inserting all-gathers
over ICI only where results are consumed host-side. Model parallelism is
unnecessary (every model is <60M params) but the helpers accept arbitrary
axis layouts so a tp axis can be added without API change.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp",),
              devices=None) -> Mesh:
    """1-D (default) mesh over available devices.

    ``n_devices=None`` uses all local devices. Multi-axis layouts pass
    ``axis_names`` + a matching ``devices`` ndarray.
    """
    if devices is None:
        devs = jax.devices()
        if n_devices is not None:
            devs = devs[:n_devices]
        if len(axis_names) == 1:
            devices = np.array(devs)
        else:
            raise ValueError("multi-axis mesh requires explicit devices array")
    return Mesh(devices, axis_names=axis_names)


def data_sharding(mesh: Mesh, axis: str = "dp", ndim: int = 4) -> NamedSharding:
    """Shard dim 0 over ``axis``; replicate the rest."""
    spec = [None] * ndim
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    """Zero-pad ``axis`` up to a multiple (device-count divisibility)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(arr, pad)


def shard_batch(arrays, mesh: Mesh, axis: str = "dp"):
    """Place host arrays on the mesh with dim-0 sharding (padding to the dp
    size if needed). Returns (device_arrays, original_batch). Accepts a
    single array or a pytree; all leaves must share dim-0 length."""
    leaves, treedef = jax.tree.flatten(arrays)
    n = leaves[0].shape[0]
    dp = mesh.shape[axis]
    out = []
    for leaf in leaves:
        leaf = np.asarray(leaf)
        leaf = pad_to_multiple(leaf, dp, axis=0)
        sh = data_sharding(mesh, axis, leaf.ndim)
        out.append(jax.device_put(leaf, sh))
    return jax.tree.unflatten(treedef, out), n


def replicate_params(params, mesh: Mesh):
    """Replicate a parameter pytree onto every device of the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), params)
