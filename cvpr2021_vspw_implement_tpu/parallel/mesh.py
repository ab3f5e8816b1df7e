"""Device mesh construction and sharding policy.

The reference's multi-device story is single-process DataParallel over GPUs
with a thread-queue sync-BN (reference: train.py:305-311,
models/sync_batchnorm/comm.py).  The TPU-native replacement is GSPMD over a
``jax.sharding.Mesh``:

  * ``data`` axis — batch (and folded clip-time) dimension; gradients and BN
    statistics all-reduce over ICI automatically;
  * ``model`` axis — optional tensor parallelism for wide head channels
    (PPM/OCR 512-d convs) — weights sharded on their output-channel dim.

``make_mesh(n_data, n_model)`` works on real TPU slices and on the CPU
fake-device mesh used by tests/dry-runs alike.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host initialization (`jax.distributed`) — the TPU-native
    replacement for the reference's absent torch.distributed story
    (SURVEY §2 parallelism census).  On single-host runs this is a no-op;
    on pods/pod-slices, call before building the mesh so ``jax.devices()``
    spans all hosts and GSPMD lays collectives over ICI/DCN."""
    import os
    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return  # single-host
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_seq_mesh(n_data: int, n_seq: int, n_model: int = 1,
                  devices=None) -> Mesh:
    """3-axis mesh (data, seq, model): 'seq' shards the clip-time axis —
    TCB blending's cross-frame means become psums of KB-scale pooled
    statistics over 'seq' (SURVEY §5 long-context plan)."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_data * n_seq * n_model
    assert n <= len(devices)
    arr = np.array(devices[:n]).reshape(n_data, n_seq, n_model)
    return Mesh(arr, ("data", "seq", "model"))


def make_pipe_mesh(n_data: int, n_pipe: int, n_model: int = 1,
                   devices=None) -> Mesh:
    """3-axis mesh (data, pipe, model): 'pipe' carries the GPipe stages of
    the deep trunk (models/pipeline.py) — stage weights/activations shard
    over it and the inter-stage shift rides ICI as a collective-permute."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_data * n_pipe * n_model
    assert n <= len(devices), (
        f"mesh ({n_data}x{n_pipe}x{n_model}) needs {n} devices, "
        f"have {len(devices)}")
    arr = np.array(devices[:n]).reshape(n_data, n_pipe, n_model)
    return Mesh(arr, ("data", "pipe", "model"))


def make_pod_mesh(n_data: int = -1, n_seq: int = 1, n_model: int = 1,
                  n_pipe: int = 1, devices=None) -> Mesh:
    """DCN-aware 4-axis mesh (data, seq, model, pipe) for pods/multi-slice.

    Layout policy (scaling-book recipe): only the 'data' axis crosses the
    DCN boundary — gradient all-reduces are latency-tolerant and
    overlappable — while seq/model/pipe collectives (KB-scale psums,
    head-channel all-gathers, the pipeline's per-tick collective-permute)
    stay inside one slice's ICI domain.  On multi-granule topologies this
    uses ``mesh_utils.create_hybrid_device_mesh`` (data across granules);
    single-host/single-slice runs fall back to ``create_device_mesh``,
    which still orders devices for ICI-contiguous inner axes.
    """
    from jax.experimental import mesh_utils

    devices = list(devices if devices is not None else jax.devices())
    inner = n_seq * n_model * n_pipe
    if n_data in (-1, 0):
        n_data = len(devices) // inner
    shape = (n_data, n_seq, n_model, n_pipe)
    n = n_data * inner
    assert n <= len(devices), (
        f"mesh {shape} needs {n} devices, have {len(devices)}")
    devices = devices[:n]
    n_granules = len({getattr(d, "process_index", 0) for d in devices})
    if n_granules > 1 and n_data % n_granules == 0:
        arr = mesh_utils.create_hybrid_device_mesh(
            (n_data // n_granules, n_seq, n_model, n_pipe),
            (n_granules, 1, 1, 1), devices=devices)
    else:
        try:
            arr = mesh_utils.create_device_mesh(shape, devices=devices)
        except Exception:  # odd shapes on virtual devices
            arr = np.array(devices).reshape(shape)
    return Mesh(arr, ("data", "seq", "model", "pipe"))


def make_mesh(n_data: int = -1, n_model: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data in (-1, 0):
        n_data = len(devices) // n_model
    n = n_data * n_model
    assert n <= len(devices), (
        f"mesh ({n_data}x{n_model}) needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def auto_data_axis(batch_size: int, n_devices: int | None = None) -> int:
    """Largest device count ≤ n_devices that divides the global batch."""
    if n_devices is None:
        n_devices = len(jax.devices())
    for d in range(min(batch_size, n_devices), 0, -1):
        if batch_size % d == 0:
            return d
    return 1


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/time-folded) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, spec: PartitionSpec | None = None):
    """Device-put a host batch pytree with the batch axis sharded on 'data'."""
    sh = batch_sharding(mesh) if spec is None else NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def device_prefetch(batch_iter, mesh: Mesh, spec: PartitionSpec | None = None,
                    depth: int = 2):
    """Overlap host→device transfer with compute: keep ``depth`` batches
    in flight on the device ahead of the consumer (the TPU-native version of
    the reference's side-stream ``async_copy_to``,
    lib/nn/parallel/data_parallel.py:82-112)."""
    import collections

    queue = collections.deque()
    for batch in batch_iter:
        queue.append(shard_batch(mesh, batch, spec))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
