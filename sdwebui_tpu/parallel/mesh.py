"""Device-mesh runtime — the component the reference never had.

The reference is strictly single-process single-GPU (SURVEY.md §2.6): its
"substrate" is `modules/devices.py` + CUDA streams.  Here parallelism is a
first-class design axis:

mesh axes
    ``data``   — batch / images / X-Y-Z grid cells, sharded over ICI
    ``model``  — optional tensor parallelism of attention heads & MLP
                 channels for latency at batch=1
    (a ``seq`` axis for context-parallel megapixel latents is reserved in
    the design; latent-row sharding with conv halo exchange plugs into the
    same runtime.)

All sharding is expressed as `NamedSharding(mesh, PartitionSpec(...))` and
handed to `jax.jit` — XLA inserts the ICI collectives.  Nothing in model
code talks to a device directly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass
class MeshRuntime:
    mesh: Mesh

    # ---- construction ------------------------------------------------

    @staticmethod
    def create(data: int | None = None, model: int = 1,
               devices: Sequence[jax.Device] | None = None) -> "MeshRuntime":
        """Build a (data, model) mesh over the available devices.

        ``data=None`` → use all devices not consumed by ``model``.
        The model axis is innermost so tensor-parallel collectives ride
        the fastest ICI links.
        """
        devs = list(devices if devices is not None else jax.devices())
        n = len(devs)
        if model < 1 or n % model:
            raise ValueError(f"model axis {model} does not divide {n} devices")
        if data is None:
            data = n // model
        if data * model != n:
            devs = devs[: data * model]
        arr = np.array(devs).reshape(data, model)
        return MeshRuntime(Mesh(arr, (DATA_AXIS, MODEL_AXIS)))

    # ---- axis info ---------------------------------------------------

    @property
    def data_size(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def model_size(self) -> int:
        return self.mesh.shape[MODEL_AXIS]

    @property
    def n_devices(self) -> int:
        return self.data_size * self.model_size

    # ---- shardings ---------------------------------------------------

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding()

    @property
    def batch_sharded(self) -> NamedSharding:
        """Activations: batch over `data`, rest replicated."""
        return self.sharding(DATA_AXIS)

    def shard_batch(self, x):
        """Place a batched array with its leading dim sharded over `data`.

        Pads are the caller's job — batch must divide ``data_size`` (the
        pipeline buckets batch sizes so this holds).
        """
        return jax.device_put(x, self.batch_sharded)

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated)

    def pad_batch(self, n: int) -> int:
        """Smallest multiple of the data-axis size ≥ n (batch bucketing)."""
        d = self.data_size
        return int(math.ceil(n / d) * d)


_runtime: MeshRuntime | None = None


def get_runtime() -> MeshRuntime:
    global _runtime
    if _runtime is None:
        _runtime = MeshRuntime.create()
    return _runtime


def set_runtime(rt: MeshRuntime | None) -> None:
    global _runtime
    _runtime = rt
