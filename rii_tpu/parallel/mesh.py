"""Mesh construction and database sharding helpers."""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices=None, axis_name=DATA_AXIS):
    """1-D mesh over all (or the first n) local devices; axis = database shard."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_database(mesh, codes, norms, axis_name=DATA_AXIS):
    """Place (cap, M) codes and (cap,) norms row-sharded over the mesh.

    cap must be divisible by the mesh size (the caller pads capacity to a
    power of two, so any power-of-two mesh divides it).
    """
    ndev = mesh.shape[axis_name]
    assert codes.shape[0] % ndev == 0, (codes.shape, ndev)
    codes_sh = jax.device_put(codes, NamedSharding(mesh, P(axis_name, None)))
    norms_sh = jax.device_put(norms, NamedSharding(mesh, P(axis_name)))
    return codes_sh, norms_sh
