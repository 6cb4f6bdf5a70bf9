"""Device mesh construction and chain sharding helpers."""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_samples", "SAMPLE_AXIS"]

SAMPLE_AXIS = "samples"


def make_mesh(n_devices=None, devices=None):
    """1D mesh over the sample axis. Uses all local devices by default."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (SAMPLE_AXIS,))


def shard_samples(mesh, samples, weights):
    """Place (N, P) samples and (N,) weights sharded on the sample axis.

    N must divide by the mesh size (pad or trim upstream if not; KDE
    results are insensitive to dropping < mesh-size samples).
    """
    n_dev = mesh.devices.size
    n = samples.shape[0] - samples.shape[0] % n_dev
    sharding_2d = NamedSharding(mesh, P(SAMPLE_AXIS, None))
    sharding_1d = NamedSharding(mesh, P(SAMPLE_AXIS))
    return (
        jax.device_put(samples[:n], sharding_2d),
        jax.device_put(weights[:n], sharding_1d),
    )
