"""Context-parallel (spatially sharded) VAE decode/encode.

The reference never scales past one GPU — megapixel decodes just OOM or
fall back to slicing/tiled third-party extensions.  Here the latent's ROWS
shard over the mesh (SURVEY.md §5: "shard the sequence (latent rows) over
ICI with halo exchange"): every 3x3 conv exchanges one boundary row with
its neighbors (`models/layers._halo_exchange_rows`, ppermute over ICI),
GroupNorm statistics psum across shards, and the mid-block attention
all-gathers k/v — so the sharded result equals the single-device op to
float tolerance while activations per chip shrink by the mesh size (the
VAE at 2048² in fp32 is ~8 GB of activations — past a single v5e chip's
comfortable headroom next to SDXL weights).

Usage: decode_spatial(vae_params, cfg, latents, rt) with latents (B,h,w,C);
h must divide by the mesh's data-axis size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sdwebui_tpu.models import vae as vae_model
from sdwebui_tpu.models.layers import spatial_sharding
from sdwebui_tpu.parallel.mesh import DATA_AXIS, MeshRuntime, get_runtime


@functools.partial(jax.jit, static_argnames=("cfg", "mesh_holder"))
def _decode_sharded(params, cfg, z, mesh_holder):
    mesh = mesh_holder.mesh

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, DATA_AXIS, None, None)),
        out_specs=P(None, DATA_AXIS, None, None), check_vma=False)
    def run(p, zi):
        with spatial_sharding(DATA_AXIS):
            return vae_model.decode(p, cfg, zi)

    return run(params, z)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh_holder"))
def _encode_sharded(params, cfg, x, mesh_holder):
    mesh = mesh_holder.mesh

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, DATA_AXIS, None, None)),
        out_specs=P(None, DATA_AXIS, None, None), check_vma=False)
    def run(p, xi):
        with spatial_sharding(DATA_AXIS):
            return vae_model.encode_moments(p, cfg, xi)

    return run(params, x)


class _MeshHolder:
    """Hashable jit-static wrapper for a Mesh."""

    def __init__(self, mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash((tuple(self.mesh.axis_names), self.mesh.devices.shape))

    def __eq__(self, other):
        return isinstance(other, _MeshHolder) and self.mesh == other.mesh


def decode_spatial(params, cfg, latents, rt: MeshRuntime | None = None):
    """Latents (B,h,w,C) → images (B,8h,8w,3), rows sharded over `data`."""
    rt = rt or get_runtime()
    n = rt.data_size
    if n <= 1 or latents.shape[1] % n != 0:
        return vae_model.decode(params, cfg, latents)
    z = jax.device_put(latents, rt.sharding(None, DATA_AXIS))
    return _decode_sharded(params, cfg, z, _MeshHolder(rt.mesh))


def encode_spatial(params, cfg, images, rt: MeshRuntime | None = None):
    """Images (B,H,W,3) → moments, rows sharded over `data`."""
    rt = rt or get_runtime()
    n = rt.data_size
    if n <= 1 or images.shape[1] % (8 * n) != 0:
        return vae_model.encode_moments(params, cfg, images)
    x = jax.device_put(images, rt.sharding(None, DATA_AXIS))
    return _encode_sharded(params, cfg, x, _MeshHolder(rt.mesh))
