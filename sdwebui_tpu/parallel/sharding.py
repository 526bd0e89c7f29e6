"""Sharding rules: how model param trees and activations lay out on the mesh.

Tensor parallelism for the UNet/CLIP (no reference counterpart — SURVEY.md
§2.6): feed-forward and attention projections split over the ``model`` axis
(column-parallel on the output-feature dim, row-parallel on the reducing
dim — the Megatron layout), convolution output channels likewise; XLA's
GSPMD inserts the psum/all-gathers over ICI.  Batch rides the ``data``
axis.  Everything degrades gracefully: dims not divisible by the axis size
stay replicated.
"""

from __future__ import annotations

from jax.sharding import NamedSharding, PartitionSpec as P

from sdwebui_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, MeshRuntime
from sdwebui_tpu.utils.pytree import flatten, unflatten

# param-path suffix → which dim of the weight is split over `model`
_COL_PARALLEL = ("to_q.weight", "to_k.weight", "to_v.weight",
                 "ff.net.0.proj.weight", "q_proj.weight", "k_proj.weight",
                 "v_proj.weight", "mlp.fc1.weight")
_ROW_PARALLEL = ("to_out.0.weight", "ff.net.2.weight", "out_proj.weight",
                 "mlp.fc2.weight")


def _spec_for(path: str, shape, model_size: int):
    if model_size <= 1:
        return P()
    ndim = len(shape)
    for suf in _COL_PARALLEL:
        if path.endswith(suf) and ndim == 2 and shape[1] % model_size == 0:
            return P(None, MODEL_AXIS)
    for suf in _ROW_PARALLEL:
        if path.endswith(suf) and ndim == 2 and shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)
    if path.endswith(".weight") and ndim == 4 and shape[3] % model_size == 0:
        # conv HWIO: split output channels
        return P(None, None, None, MODEL_AXIS)
    return P()


def param_shardings(rt: MeshRuntime, params) -> dict:
    """Matching tree of NamedShardings for a param pytree."""
    flat = flatten(params)
    out = {}
    for path, leaf in flat.items():
        out[path] = NamedSharding(
            rt.mesh, _spec_for(path, getattr(leaf, "shape", ()), rt.model_size))
    return unflatten(out)


def batch_sharding(rt: MeshRuntime, ndim: int = 4) -> NamedSharding:
    return NamedSharding(rt.mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_params(rt: MeshRuntime, params):
    import jax

    return jax.device_put(params, param_shardings(rt, params))
