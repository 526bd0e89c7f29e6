"""Hypernetwork training (reference modules/hypernetworks/hypernetwork.py:472
train_hypernetwork): optimize the per-dim attention k/v MLPs on the
eps-prediction loss, base model frozen."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sdwebui_tpu.models import unet as unet_model
from sdwebui_tpu.networks.hypernetwork import create_hypernetwork, save_hypernetwork


def make_hn_train_step(model, hn_meta=("linear", 1.0, False), lr: float = 1e-4,
                       dropout_structure=None):
    """dropout_structure: per-layer probabilities (training forward only —
    reference applies torch.nn.Dropout modules in .train() mode)."""
    optimizer = optax.adamw(lr)
    ac = jnp.asarray(model.disc.alphas_cumprod, jnp.float32)
    sqrt_ac, sqrt_1mac = jnp.sqrt(ac), jnp.sqrt(1.0 - ac)
    unet_params = model.unet_params
    unet_cfg = model.unet_cfg
    use_dropout = dropout_structure is not None and any(dropout_structure)
    drop = tuple(dropout_structure) if use_dropout else None

    def loss_fn(hn_tree, latents, noise, t, ctx, key):
        a = sqrt_ac[t][:, None, None, None]
        am = sqrt_1mac[t][:, None, None, None]
        x_t = a * latents + am * noise
        hn = (hn_tree, hn_meta, (drop, key)) if use_dropout \
            else (hn_tree, hn_meta)
        from sdwebui_tpu.ops.attention import training_attention_ctx

        with training_attention_ctx():
            pred = unet_model.apply(unet_params, unet_cfg, x_t,
                                    t.astype(jnp.float32), ctx, hypernet=hn)
        return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)

    @jax.jit
    def step(hn_tree, opt_state, latents, noise, t, ctx, key):
        loss, grads = jax.value_and_grad(loss_fn)(hn_tree, latents, noise,
                                                  t, ctx, key)
        updates, opt_state = optimizer.update(grads, opt_state, hn_tree)
        hn_tree = optax.apply_updates(hn_tree, updates)
        return hn_tree, opt_state, loss

    return step, optimizer.init


def train_hypernetwork(model, name: str, latents: np.ndarray, conds: np.ndarray,
                       dims=None, layer_structure=(1, 2, 1), steps: int = 100,
                       lr: float = 1e-4, batch_size: int = 1, seed: int = 0,
                       save_path: str | None = None, callback=None,
                       use_dropout: bool = False,
                       last_layer_dropout: bool = True,
                       dropout_structure=None):
    """latents: (N,h,w,C); conds: (N,S,D) pre-encoded caption conds.

    Returns (hn_tree, losses)."""
    if dims is None:
        dims = (model.unet_cfg.context_dim,)
    from sdwebui_tpu.networks.hypernetwork import parse_dropout_structure

    if dropout_structure is None:
        dropout_structure = parse_dropout_structure(
            layer_structure, use_dropout, last_layer_dropout)
    hn = create_hypernetwork(dims=dims, layer_structure=layer_structure, seed=seed)
    hn = jax.tree_util.tree_map(jnp.asarray, hn)
    step_fn, init_fn = make_hn_train_step(model, lr=lr,
                                          dropout_structure=dropout_structure)
    opt_state = init_fn(hn)
    base_key = jax.random.PRNGKey(seed)

    rng = np.random.default_rng(seed)
    n = latents.shape[0]
    losses = []
    for i in range(steps):
        idx = rng.integers(0, n, batch_size)
        batch = jnp.asarray(latents[idx])
        noise = jnp.asarray(rng.standard_normal(batch.shape), jnp.float32)
        t = jnp.asarray(rng.integers(0, 1000, (batch_size,)), jnp.int32)
        ctx = jnp.asarray(conds[idx])
        hn, opt_state, loss = step_fn(hn, opt_state, batch, noise, t, ctx,
                                      jax.random.fold_in(base_key, i))
        losses.append(float(loss))
        if callback is not None and callback(i, losses[-1]) is False:
            break

    hn_host = jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), hn)
    if save_path:
        save_hypernetwork(hn_host, save_path, name=name, step=len(losses),
                          layer_structure=layer_structure)
    return hn_host, losses


def train_hypernetwork_from_dir(model, name: str, data_root: str,
                                dims=None, layer_structure=(1, 2, 1),
                                activation: str = "linear",
                                weight_init: str = "Normal",
                                add_layer_norm: bool = False,
                                use_dropout: bool = False,
                                last_layer_dropout: bool = True,
                                dropout_structure=None,
                                steps: int = 100, learn_rate="0.00001",
                                batch_size: int = 1,
                                template: str = "hypernetwork",
                                width: int = 512, height: int = 512,
                                varsize: bool = False,
                                use_weight: bool = False,
                                shuffle_tags: bool = False,
                                tag_drop_out: float = 0.0,
                                latent_sampling_method: str = "once",
                                seed: int = 0, save_path: str | None = None,
                                save_every: int = 0, callback=None,
                                preview_every: int = 0,
                                preview_prompt: str | None = None,
                                preview_steps: int = 8,
                                preview_size: tuple = (256, 256)):
    """Directory-of-images hypernetwork training (reference
    modules/hypernetworks/hypernetwork.py:472 train_hypernetwork) — dataset
    captions condition each step; layer structure / activation /
    weight-init / layer-norm / dropout options mirror the reference's
    create UI (dropout_structure derives from use_dropout +
    last_layer_dropout via parse_dropout_structure and applies in the
    training forward only, reference hypernetwork.py:43-57,180).
    """
    from sdwebui_tpu.training.dataset import (LearnRateScheduler,
                                              PersonalizedDataset)

    if dims is None:
        dims = (model.unet_cfg.context_dim,)
    ds = PersonalizedDataset(
        data_root, model, width=width, height=height, placeholder=name,
        template=template, varsize=varsize, use_weight=use_weight,
        shuffle_tags=shuffle_tags, tag_drop_out=tag_drop_out,
        latent_sampling_method=latent_sampling_method, seed=seed)
    schedule = LearnRateScheduler(learn_rate, steps)
    hn = create_hypernetwork(dims=dims, layer_structure=layer_structure,
                             seed=seed, weight_init=weight_init,
                             add_layer_norm=add_layer_norm)
    hn = jax.tree_util.tree_map(jnp.asarray, hn)

    optimizer = optax.inject_hyperparams(optax.adamw)(
        learning_rate=schedule.learn_rate)
    ac = jnp.asarray(model.disc.alphas_cumprod, jnp.float32)
    sqrt_ac, sqrt_1mac = jnp.sqrt(ac), jnp.sqrt(1.0 - ac)
    unet_params, unet_cfg = model.unet_params, model.unet_cfg
    hn_meta = (activation, 1.0, False)
    from sdwebui_tpu.networks.hypernetwork import parse_dropout_structure

    if dropout_structure is None:
        dropout_structure = parse_dropout_structure(
            layer_structure, use_dropout, last_layer_dropout)
    dropping = any(dropout_structure)
    drop = tuple(dropout_structure) if dropping else None

    def loss_fn(hn_tree, latents, noise, t, ctx, weights, key):
        a = sqrt_ac[t][:, None, None, None]
        am = sqrt_1mac[t][:, None, None, None]
        x_t = a * latents + am * noise
        hyper = (hn_tree, hn_meta, (drop, key)) if dropping \
            else (hn_tree, hn_meta)
        from sdwebui_tpu.ops.attention import training_attention_ctx

        with training_attention_ctx():
            pred = unet_model.apply(unet_params, unet_cfg, x_t,
                                    t.astype(jnp.float32), ctx,
                                    hypernet=hyper)
        return jnp.mean((pred.astype(jnp.float32) - noise) ** 2 * weights)

    @jax.jit
    def step_fn(hn_tree, opt_state, latents, noise, t, ctx, weights, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            hn_tree, latents, noise, t, ctx, weights, key)
        updates, opt_state = optimizer.update(grads, opt_state, hn_tree)
        return optax.apply_updates(hn_tree, updates), opt_state, loss

    opt_state = optimizer.init(hn)
    base_key = jax.random.PRNGKey(seed + 1)
    rng = np.random.default_rng(seed)
    from sdwebui_tpu.utils.options import opts as _hn_opts

    if bool(_hn_opts.get("unload_models_when_training", False)):
        # reference unload_models_when_training: latents are pre-encoded by
        # the dataset, so the VAE tree parks to host RAM for the run (CLIP
        # stays — per-caption conds encode every step)
        import dataclasses as _dc

        model = _dc.replace(model, vae_params=jax.device_get(model.vae_params))
    losses = []
    for i in range(steps):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            schedule.rate_at(i), jnp.float32)
        latents, texts, weights = ds.sample_batch(batch_size)
        ctx = model.encode_texts(texts)
        if isinstance(ctx, tuple):
            ctx = ctx[0]
        noise = rng.standard_normal(latents.shape).astype(np.float32)
        t = rng.integers(0, len(model.disc.alphas_cumprod),
                         (latents.shape[0],)).astype(np.int32)
        w = np.ones_like(latents) if weights is None else weights
        hn, opt_state, loss = step_fn(hn, opt_state, jnp.asarray(latents),
                                      jnp.asarray(noise), jnp.asarray(t),
                                      ctx, jnp.asarray(w),
                                      jax.random.fold_in(base_key, i))
        losses.append(float(loss))
        if callback is not None and callback(i, losses[-1]) is False:
            break
        if save_every and save_path and (i + 1) % save_every == 0 \
                and (i + 1) < steps:
            host = jax.tree_util.tree_map(
                lambda x: np.asarray(jax.device_get(x)), hn)
            save_hypernetwork(host, save_path, name=name, step=i + 1,
                              layer_structure=layer_structure,
                              activation=activation,
                              dropout_structure=dropout_structure
                              if dropping else None)
        if preview_every and save_path and (i + 1) % preview_every == 0:
            # reference create_image_every (hypernetwork.py:688): sample
            # with the in-training hypernetwork active
            _save_hn_preview(model, name, hn, activation, i + 1, save_path,
                             preview_prompt or texts[0], preview_steps,
                             preview_size, seed)

    hn_host = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), hn)
    if save_path:
        save_hypernetwork(hn_host, save_path, name=name, step=len(losses),
                          layer_structure=layer_structure,
                          activation=activation,
                          dropout_structure=dropout_structure
                          if dropping else None)
    return hn_host, losses


def _save_hn_preview(model, name: str, hn, activation: str, step: int,
                     save_path: str, prompt: str, steps: int, size: tuple,
                     seed: int):
    """Sample a preview with the in-training hypernetwork active (reference
    hypernetwork.py:688 create_image_every flow); PNG → <save dir>/images/."""
    import os

    try:
        from sdwebui_tpu.pipeline.params import GenerationParams
        from sdwebui_tpu.pipeline.processing import process_txt2img

        host = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), hn)
        tree = {str(k): v for k, v in host.items()}
        p = GenerationParams(prompt=prompt, seed=seed, steps=steps,
                             width=size[0], height=size[1],
                             hypernet_override=(tree,
                                                (activation, 1.0, False)))
        res = process_txt2img(model, p)
        out_dir = os.path.join(os.path.dirname(save_path) or ".", "images")
        os.makedirs(out_dir, exist_ok=True)
        res.images[0].save(os.path.join(out_dir, f"{name}-{step}.png"))
    except Exception:
        pass
