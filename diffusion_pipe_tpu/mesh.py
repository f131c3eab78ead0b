"""Device mesh construction and named sharding helpers.

TPU-native replacement for the reference's DeepSpeed process topology
(PipeModelDataParallelTopology implied by PipelineModule(num_stages);
reference train.py:596-622, README.md:144-145). The reference's parallelism
is DP x PP only; here the mesh has three axes so TP comes for free with pjit:

  ('data', 'stage', 'tensor')

- 'data'   : data parallelism (grad psum) — reference's DP replicas.
- 'stage'  : pipeline parallelism (GPipe/1F1B over ICI via ppermute) —
             reference's DeepSpeed pipeline stages.
- 'tensor' : tensor parallelism of weight matrices (absent in the reference;
             SURVEY.md section 2.7 marks it "free with pjit design").

DP degree auto-derives as n_devices // (stages * tensor), matching the
reference rule DP = world_size / pipeline_stages (README.md:144-145).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
STAGE_AXIS = "stage"
TENSOR_AXIS = "tensor"
AXIS_NAMES = (DATA_AXIS, STAGE_AXIS, TENSOR_AXIS)


def make_mesh(
    pipeline_stages: int = 1,
    tensor_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the ('data','stage','tensor') mesh over all (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    denom = pipeline_stages * tensor_parallel
    if n % denom != 0:
        raise ValueError(
            f"{n} devices not divisible by pipeline_stages*tensor_parallel={denom}"
        )
    data = n // denom
    arr = np.asarray(devices).reshape(data, pipeline_stages, tensor_parallel)
    return Mesh(arr, AXIS_NAMES)


def data_parallel_size(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


def num_stages(mesh: Mesh) -> int:
    return mesh.shape[STAGE_AXIS]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: sharded over 'data', replicated over stage/tensor."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def maybe_init_distributed(config: Optional[dict] = None) -> None:
    """Multi-host initialization (multi-slice / multi-pod).

    The reference launches one process per GPU under deepspeed's MPI-style
    env (LOCAL_RANK/WORLD_SIZE, train.py startup). The TPU analogue is one
    process per HOST: jax.distributed.initialize() discovers coordinator +
    process ids from the TPU runtime env (or JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID when set). Call before any other
    jax API on each host. No-op for single-process runs unless
    `multi_host = true` is set in the config or the coordinator env is
    present.
    """
    import os

    config = config or {}
    wants = bool(config.get("multi_host")) or bool(
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if not wants:
        return
    # NOTE: do not touch jax.process_count()/jax.devices() here — any
    # backend query initializes XLA and makes initialize() illegal.
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return  # already initialized by the launcher
    kw = {}
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # explicit env-driven bring-up (CPU multi-process tests, custom
        # launchers); TPU pods auto-detect with no kwargs
        kw = dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "0")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    jax.distributed.initialize(**kw)


def local_mesh_or_default(
    config: Optional[dict] = None, devices=None
) -> Mesh:
    """Mesh from a training config ({pipeline_stages, tensor_parallel}).

    Multi-host: uses jax.devices() (all devices across processes). Axis
    order ('data', 'stage', 'tensor') puts 'data' outermost, so with the
    default device order the DATA axis spans DCN (slice boundaries) while
    'stage'/'tensor' collectives stay on ICI within a slice — gradient
    psum is the only cross-slice traffic, matching the scaling-book
    recipe for DCN-friendly layouts.
    """
    config = config or {}
    maybe_init_distributed(config)
    if devices is None and config.get("num_devices"):
        # restrict the run to the first N devices (tests / partial-pod use)
        devices = jax.devices()[: int(config["num_devices"])]
    return make_mesh(
        pipeline_stages=int(config.get("pipeline_stages", 1)),
        tensor_parallel=int(config.get("tensor_parallel", 1)),
        devices=devices,
    )
