"""Textual-inversion training (reference
modules/textual_inversion/textual_inversion.py:400 train_embedding).

Functional retake: the ONLY trainable leaf is the (vectors, width) embedding
matrix; loss = eps-prediction MSE with the embedding spliced into the CLIP
input embeddings (differentiable splice via dynamic_update_slice).  Whole
step jits; dataset latents are VAE-encoded once up front."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sdwebui_tpu.models import clip as clip_model
from sdwebui_tpu.models import unet as unet_model
from sdwebui_tpu.networks.textual_inversion import Embedding
from sdwebui_tpu.text.tokenizer import BOS, EOS


def prepare_tokens(tokenizer, template: str, placeholder_vectors: int,
                   max_len: int = 77):
    """template contains '{}' → (tokens (77,), splice_pos)."""
    before, _, after = template.partition("{}")
    ids_before = tokenizer.encode(before)
    ids_after = tokenizer.encode(after)
    pos = 1 + len(ids_before)
    ids = ([BOS] + ids_before + [0] * placeholder_vectors + ids_after)
    ids = ids[: max_len - 1] + [EOS] * (max_len - len(ids)) + [EOS]
    return np.asarray(ids[:max_len], np.int32), pos


def make_ti_train_step(model, tokens: np.ndarray, splice_pos: int,
                       n_vectors: int, lr: float = 5e-3):
    """Returns (step_fn, opt_state_init). step_fn(emb, opt_state, latents,
    noise, t, key) -> (emb, opt_state, loss)."""
    optimizer = optax.adam(lr)
    ac = jnp.asarray(model.disc.alphas_cumprod, jnp.float32)
    sqrt_ac, sqrt_1mac = jnp.sqrt(ac), jnp.sqrt(1.0 - ac)
    tokens_j = jnp.asarray(tokens)[None]
    clip_params = model.conditioner.params
    clip_cfg = model.conditioner.cfg
    unet_params = model.unet_params
    unet_cfg = model.unet_cfg

    def loss_fn(emb, latents, noise, t):
        emb_table = clip_params["embeddings"]["token_embedding"]["weight"]
        b = latents.shape[0]
        toks = jnp.tile(tokens_j, (b, 1))
        x_embeds = jnp.take(emb_table, toks, axis=0)
        x_embeds = jax.lax.dynamic_update_slice(
            x_embeds, jnp.tile(emb[None].astype(x_embeds.dtype), (b, 1, 1)),
            (0, splice_pos, 0))
        ctx, _ = clip_model.encode(clip_params, clip_cfg, toks,
                                   inputs_embeds=x_embeds)
        a = sqrt_ac[t][:, None, None, None]
        am = sqrt_1mac[t][:, None, None, None]
        x_t = a * latents + am * noise
        pred = unet_model.apply(unet_params, unet_cfg, x_t,
                                t.astype(jnp.float32), ctx)
        return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)

    @jax.jit
    def step(emb, opt_state, latents, noise, t):
        loss, grads = jax.value_and_grad(loss_fn)(emb, latents, noise, t)
        updates, opt_state = optimizer.update(grads, opt_state)
        emb = optax.apply_updates(emb, updates)
        return emb, opt_state, loss

    def init(emb):
        return optimizer.init(emb)

    return step, init


def train_embedding(model, name: str, latents: np.ndarray,
                    n_vectors: int = 1, steps: int = 100, lr: float = 5e-3,
                    batch_size: int = 1, template: str = "a photo of a {}",
                    seed: int = 0, save_path: str | None = None,
                    log_every: int = 0, callback=None):
    """latents: (N, h, w, C) pre-encoded scaled latents of the training set.

    Returns (Embedding, losses list)."""
    tokens, pos = prepare_tokens(model.conditioner.tokenizer, template, n_vectors)
    step_fn, init_fn = make_ti_train_step(model, tokens, pos, n_vectors, lr)

    width = model.conditioner.cfg.width
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.standard_normal((n_vectors, width)) * 0.01, jnp.float32)
    opt_state = init_fn(emb)

    latents = np.asarray(latents, np.float32)
    n = latents.shape[0]
    losses = []
    for i in range(steps):
        idx = rng.integers(0, n, batch_size)
        batch = jnp.asarray(latents[idx])
        noise = jnp.asarray(rng.standard_normal(batch.shape), jnp.float32)
        t = jnp.asarray(rng.integers(0, 1000, (batch_size,)), jnp.int32)
        emb, opt_state, loss = step_fn(emb, opt_state, batch, noise, t)
        losses.append(float(loss))
        if callback is not None and callback(i, losses[-1]) is False:
            break
        if log_every and (i + 1) % log_every == 0:
            print(f"[TI {name}] step {i + 1}/{steps} loss {losses[-1]:.4f}")

    result = Embedding(name, np.asarray(jax.device_get(emb)), step=len(losses))
    if save_path:
        from sdwebui_tpu.loader.safetensors_io import write_safetensors

        write_safetensors(save_path, {"emb_params": result.vec},
                          metadata={"name": name, "step": str(result.step)})
    return result, losses
