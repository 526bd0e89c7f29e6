"""Sharded diffusion training step (noise-prediction MSE + AdamW).

The gradient path of the framework (the reference's only training code is
textual inversion / hypernetworks, modules/textual_inversion/,
modules/hypernetworks/ — this is the generic step both build on, plus full
fine-tuning which the reference lacks).  Parallelism: batch over ``data``,
Megatron-style tensor parallelism of attention/MLP projections over
``model`` (parallel/sharding.py); XLA inserts the ICI collectives.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from sdwebui_tpu.models import unet as unet_model
from sdwebui_tpu.parallel.mesh import MeshRuntime
from sdwebui_tpu.parallel.sharding import batch_sharding, param_shardings, shard_params
from sdwebui_tpu.sampling.discretization import Discretization


def make_optimizer(lr: float = 1e-5, weight_decay: float = 1e-2):
    return optax.adamw(lr, weight_decay=weight_decay)


def diffusion_loss(params, unet_cfg, sqrt_ac, sqrt_1mac, x0, noise, t, ctx):
    """eps-prediction MSE at integer timesteps t (ldm objective)."""
    a = sqrt_ac[t][:, None, None, None]
    am = sqrt_1mac[t][:, None, None, None]
    x_t = a * x0 + am * noise
    from sdwebui_tpu.ops.attention import training_attention_ctx

    with training_attention_ctx():
        pred = unet_model.apply(params, unet_cfg, x_t,
                                t.astype(jnp.float32), ctx)
    return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)


def make_train_step(rt: MeshRuntime, unet_cfg, disc: Discretization,
                    optimizer=None):
    """Returns (step_fn, shard_fn) where step_fn(params, opt_state, batch)
    -> (params, opt_state, loss) is jitted over the runtime's mesh."""
    optimizer = optimizer or make_optimizer()
    ac = jnp.asarray(disc.alphas_cumprod, jnp.float32)
    sqrt_ac = jnp.sqrt(ac)
    sqrt_1mac = jnp.sqrt(1.0 - ac)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(diffusion_loss)(
            params, unet_cfg, sqrt_ac, sqrt_1mac,
            batch["x0"], batch["noise"], batch["t"], batch["ctx"])
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_batch(batch):
        sh4 = batch_sharding(rt, 4)
        sh3 = batch_sharding(rt, 3)
        sh1 = batch_sharding(rt, 1)
        return {
            "x0": jax.device_put(batch["x0"], sh4),
            "noise": jax.device_put(batch["noise"], sh4),
            "t": jax.device_put(batch["t"], sh1),
            "ctx": jax.device_put(batch["ctx"], sh3),
        }

    def prepare(params):
        params = shard_params(rt, params)
        opt_state = optimizer.init(params)  # inherits param shardings
        return params, opt_state

    with rt.mesh:
        step_jit = jax.jit(step, donate_argnums=(0, 1))

    return step_jit, shard_batch, prepare
