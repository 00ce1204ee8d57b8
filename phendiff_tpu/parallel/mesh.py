"""Device mesh construction + sharding specs.

Replaces the reference's entire distributed layer (HF Accelerate DDP +
NCCL, SURVEY.md §2b): the only parallelism the reference has is data
parallelism, which here is a 1-axis ``jax.sharding.Mesh`` with the batch
dimension sharded over the ``data`` axis.  Gradients are averaged by XLA's
collectives automatically when the loss is computed under such shardings —
no explicit allreduce calls anywhere.

The mesh builder also supports a 2-axis (data, model) layout so larger
model families (SD-size UNet) can shard attention/conv channels over a
``model`` axis later without changing call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch axis sharded over 'data'; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays onto the mesh, batch-sharded.

    Single-host: a plain sharded device_put.  Multi-host (jax.distributed):
    each process passes its LOCAL shard of the global batch and the pieces
    are assembled into one global array — the TPU-native replacement for
    per-rank DataLoaders + DDP (the loader's ``num_shards/shard_index``
    fields produce exactly these local shards).
    """
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                data_sharding(mesh, np.ndim(x)), np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def replicate(mesh: Mesh, tree):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)
