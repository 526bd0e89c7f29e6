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


def make_ti_train_step(model, tokens: np.ndarray | None = None,
                       splice_pos: int | None = None,
                       n_vectors: int = 1, lr: float = 5e-3):
    """Returns (step_fn, opt_state_init).

    step_fn(emb, opt_state, latents, noise, t, tokens (B,77), pos (B,),
    weights (B,h,w,C)) -> (emb, opt_state, loss).  The legacy fixed
    (tokens, splice_pos) arguments pre-bake one caption for every step;
    the dataset pipeline passes per-batch captions instead.  The learn
    rate lives in the optimizer state (optax.inject_hyperparams) so
    LearnRateScheduler can retune it without re-jitting."""
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    ac = jnp.asarray(model.disc.alphas_cumprod, jnp.float32)
    sqrt_ac, sqrt_1mac = jnp.sqrt(ac), jnp.sqrt(1.0 - ac)
    fixed_tokens = None if tokens is None else jnp.asarray(tokens)[None]
    clip_params = model.conditioner.params
    clip_cfg = model.conditioner.cfg
    unet_params = model.unet_params
    unet_cfg = model.unet_cfg

    def loss_fn(emb, latents, noise, t, toks, pos, weights):
        emb_table = clip_params["embeddings"]["token_embedding"]["weight"]

        def splice(row_embeds, p):
            return jax.lax.dynamic_update_slice(
                row_embeds, emb.astype(row_embeds.dtype), (p, 0))

        x_embeds = jnp.take(emb_table, toks, axis=0)
        x_embeds = jax.vmap(splice)(x_embeds, pos)
        ctx, _ = clip_model.encode(clip_params, clip_cfg, toks,
                                   inputs_embeds=x_embeds)
        a = sqrt_ac[t][:, None, None, None]
        am = sqrt_1mac[t][:, None, None, None]
        x_t = a * latents + am * noise
        from sdwebui_tpu.ops.attention import training_attention_ctx

        with training_attention_ctx():
            pred = unet_model.apply(unet_params, unet_cfg, x_t,
                                    t.astype(jnp.float32), ctx)
        err = (pred.astype(jnp.float32) - noise) ** 2
        return jnp.mean(err * weights)

    @jax.jit
    def jit_step(emb, opt_state, latents, noise, t, toks, pos, weights):
        loss, grads = jax.value_and_grad(loss_fn)(
            emb, latents, noise, t, toks, pos, weights)
        updates, opt_state = optimizer.update(grads, opt_state)
        emb = optax.apply_updates(emb, updates)
        return emb, opt_state, loss

    def step(emb, opt_state, latents, noise, t, toks=None, pos=None,
             weights=None):
        b = latents.shape[0]
        if toks is None:
            toks = jnp.tile(fixed_tokens, (b, 1))
            pos = jnp.full((b,), splice_pos, jnp.int32)
        if weights is None:
            weights = jnp.ones_like(latents)
        return jit_step(emb, opt_state, latents, noise, t,
                        jnp.asarray(toks), jnp.asarray(pos),
                        jnp.asarray(weights))

    def init(emb):
        return optimizer.init(emb)

    step.optimizer = optimizer
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
            # epoch display uses opts.training_image_repeats_per_epoch
            # (reference: "used only for displaying epoch number")
            from sdwebui_tpu.utils.options import opts as _opts

            rep = int(_opts.get("training_image_repeats_per_epoch", 1) or 1)
            epoch = (i + 1) * batch_size // max(n * rep, 1)
            print(f"[TI {name}] step {i + 1}/{steps} epoch {epoch} "
                  f"loss {losses[-1]:.4f}")

    result = Embedding(name, np.asarray(jax.device_get(emb)), step=len(losses))
    if save_path:
        from sdwebui_tpu.loader.safetensors_io import write_safetensors

        write_safetensors(save_path, {"emb_params": result.vec},
                          metadata={"name": name, "step": str(result.step)})
    return result, losses


def tokens_for_caption(tokenizer, caption: str, placeholder: str,
                       n_vectors: int, max_len: int = 77):
    """Dataset caption (contains the placeholder word) → (tokens (77,),
    splice position).  The placeholder occupies n_vectors slots, mirroring
    the reference's EmbeddingDatabase hijack of the placeholder token."""
    if placeholder in caption:
        before, _, after = caption.partition(placeholder)
    else:
        before, after = caption + " ", ""
    return prepare_tokens(tokenizer, before + "{}" + after, n_vectors,
                          max_len)


def train_embedding_from_dir(model, name: str, data_root: str,
                             placeholder: str | None = None,
                             n_vectors: int = 1, steps: int = 100,
                             learn_rate="0.005", batch_size: int = 1,
                             template: str = "subject",
                             width: int = 512, height: int = 512,
                             varsize: bool = False, use_weight: bool = False,
                             shuffle_tags: bool = False,
                             tag_drop_out: float = 0.0,
                             flip_p: float = 0.5,
                             latent_sampling_method: str = "once",
                             seed: int = 0, save_path: str | None = None,
                             save_every: int = 0, log_every: int = 0,
                             initial_vec: np.ndarray | None = None,
                             callback=None, preview_every: int = 0,
                             preview_prompt: str | None = None,
                             preview_steps: int = 8,
                             preview_size: tuple[int, int] = (256, 256)):
    """Directory-of-images training — the reference's train_embedding flow
    (modules/textual_inversion/textual_inversion.py:400): dataset prep with
    captions/templates/buckets (training/dataset.py), piecewise learn-rate
    schedule, per-caption conditioning, alpha-weighted loss, periodic
    .safetensors + PNG-card saves.

    Returns (Embedding, losses)."""
    from sdwebui_tpu.training.dataset import (LearnRateScheduler,
                                              PersonalizedDataset)

    placeholder = placeholder or name
    ds = PersonalizedDataset(
        data_root, model, width=width, height=height,
        placeholder=placeholder, template=template, flip_p=flip_p,
        varsize=varsize, use_weight=use_weight, shuffle_tags=shuffle_tags,
        tag_drop_out=tag_drop_out,
        latent_sampling_method=latent_sampling_method, seed=seed)
    schedule = LearnRateScheduler(learn_rate, steps)
    step_fn, init_fn = make_ti_train_step(model, n_vectors=n_vectors,
                                          lr=schedule.learn_rate)

    cw = model.conditioner.cfg.width
    rng = np.random.default_rng(seed)
    if initial_vec is not None:
        emb = jnp.asarray(np.asarray(initial_vec, np.float32)
                          .reshape(n_vectors, cw))
    else:
        emb = jnp.asarray(rng.standard_normal((n_vectors, cw)) * 0.01,
                          jnp.float32)
    opt_state = init_fn(emb)

    tokenizer = model.conditioner.tokenizer
    from sdwebui_tpu.utils.options import opts as _t_opts

    if initial_vec is not None and save_path \
            and _t_opts.get("save_optimizer_state", False):
        # resume: restore Adam moments saved alongside the embedding
        opt_state = load_optim_state(opt_state, save_path)

    if save_path and _t_opts.get("save_training_settings_to_txt", True):
        # reference textual_inversion.py:467 save_settings_to_file
        _write_settings_txt(save_path, dict(
            name=name, data_root=data_root, n_vectors=n_vectors, steps=steps,
            learn_rate=learn_rate, batch_size=batch_size, template=template,
            width=width, height=height, varsize=varsize,
            use_weight=use_weight, shuffle_tags=shuffle_tags,
            tag_drop_out=tag_drop_out,
            latent_sampling_method=latent_sampling_method, seed=seed,
            num_images=len(ds.entries)))
    if bool(_t_opts.get("unload_models_when_training", False)):
        # reference unload_models_when_training ("move VAE and CLIP to RAM
        # if possible"): the dataset has already VAE-encoded its latents, so
        # the VAE tree parks to host RAM for the whole run, freeing HBM.
        # CLIP stays — TI trains THROUGH the text encoder.  Previews still
        # work: numpy trees ride back through the jit arg path on demand.
        import dataclasses as _dc

        model = _dc.replace(model, vae_params=jax.device_get(model.vae_params))
    csv_every = int(_t_opts.get("training_write_csv_every", 500) or 0)
    losses = []
    for i in range(steps):
        lr_now = schedule.rate_at(i)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr_now,
                                                             jnp.float32)
        latents, texts, weights = ds.sample_batch(batch_size)
        toks, poss = zip(*[tokens_for_caption(tokenizer, t, placeholder,
                                              n_vectors) for t in texts])
        noise = rng.standard_normal(latents.shape).astype(np.float32)
        t = rng.integers(0, len(model.disc.alphas_cumprod),
                         (latents.shape[0],)).astype(np.int32)
        emb, opt_state, loss = step_fn(
            emb, opt_state, jnp.asarray(latents), jnp.asarray(noise),
            jnp.asarray(t), np.stack(toks), np.asarray(poss, np.int32),
            None if weights is None else jnp.asarray(weights))
        losses.append(float(loss))
        if callback is not None and callback(i, losses[-1]) is False:
            break
        if log_every and (i + 1) % log_every == 0:
            print(f"[TI {name}] step {i + 1}/{steps} "
                  f"loss {losses[-1]:.4f} lr {lr_now:g}")
        if csv_every and save_path and (i + 1) % csv_every == 0:
            _write_loss_csv(save_path, i + 1,
                            float(np.mean(losses[-csv_every:])),
                            schedule.rate_at(i))
        if save_every and save_path and (i + 1) % save_every == 0 \
                and (i + 1) < steps:
            _save_embedding(name, emb, i + 1, save_path)
            if _t_opts.get("save_optimizer_state", False):
                _save_optim_state(opt_state, save_path)
        if preview_every and save_path and (i + 1) % preview_every == 0:
            # reference create_image_every (textual_inversion.py:600):
            # sample with the in-training embedding, save under images/
            _save_preview(model, name, emb, i + 1, save_path,
                          preview_prompt or texts[0], preview_steps,
                          preview_size, seed)

    result = Embedding(name, np.asarray(jax.device_get(emb)),
                       step=len(losses))
    if save_path:
        _save_embedding(name, emb, result.step, save_path)
        if _t_opts.get("save_optimizer_state", False):
            _save_optim_state(opt_state, save_path)
    return result, losses


def _write_settings_txt(save_path: str, settings: dict):
    """reference save_settings_to_file (textual_inversion.py:467): training
    hyperparameters recorded next to the artifact."""
    import os

    path = os.path.splitext(save_path)[0] + "_settings.txt"
    try:
        with open(path, "w", encoding="utf8") as f:
            f.write("training settings\n")
            for k, v in settings.items():
                f.write(f"{k}: {v}\n")
    except OSError:
        pass


def _write_loss_csv(save_path: str, step: int, loss: float, lr: float):
    """reference write_loss (textual_inversion.py:325): append per-interval
    mean loss rows to a csv next to the artifact."""
    import csv
    import os

    path = os.path.splitext(save_path)[0] + "_loss.csv"
    header = not os.path.exists(path)
    try:
        with open(path, "a", encoding="utf8", newline="") as f:
            w = csv.writer(f)
            if header:
                w.writerow(["step", "loss", "learn_rate"])
            w.writerow([step, f"{loss:.7f}", lr])
    except OSError:
        pass


def _save_optim_state(opt_state, save_path: str):
    """reference save_optimizer_state: .optim blob alongside the embedding,
    so training can resume with Adam moments intact.  Leaves are stored by
    flatten order index — the optimizer tree structure is deterministic."""
    from sdwebui_tpu.loader.safetensors_io import write_safetensors

    try:
        leaves, _ = jax.tree_util.tree_flatten(opt_state.inner_state)
        flat = {f"leaf{i}": np.asarray(jax.device_get(v))
                for i, v in enumerate(leaves) if hasattr(v, "shape")}
        write_safetensors(save_path + ".optim", flat)
    except Exception:
        pass


def load_optim_state(opt_state, save_path: str):
    """Restore Adam moments saved by _save_optim_state into a freshly
    initialized opt_state (same tree structure); returns opt_state."""
    import os

    import jax.numpy as _jnp

    from sdwebui_tpu.loader.safetensors_io import read_state_dict

    path = save_path + ".optim"
    if not os.path.exists(path):
        return opt_state
    saved = read_state_dict(path)
    leaves, treedef = jax.tree_util.tree_flatten(opt_state.inner_state)
    out = []
    for i, v in enumerate(leaves):
        s = saved.get(f"leaf{i}")
        if s is not None and hasattr(v, "shape") \
                and tuple(s.shape) == tuple(v.shape):
            out.append(_jnp.asarray(np.asarray(s)))
        else:
            out.append(v)
    return opt_state._replace(
        inner_state=jax.tree_util.tree_unflatten(treedef, out))


def _save_embedding(name: str, emb, step: int, save_path: str):
    """.safetensors + a reference-format PNG embedding card next to it."""
    import os

    from sdwebui_tpu.loader.safetensors_io import write_safetensors

    vec = np.asarray(jax.device_get(emb), np.float32)
    write_safetensors(save_path, {"emb_params": vec},
                      metadata={"name": name, "step": str(step)})
    try:
        from PIL import Image, ImageDraw

        from sdwebui_tpu.training.image_embedding import \
            insert_image_data_embed

        card = Image.new("RGB", (512, 512), (32, 38, 48))
        draw = ImageDraw.Draw(card)
        draw.text((24, 230), name, fill=(235, 235, 235))
        draw.text((24, 260), f"step {step}", fill=(150, 150, 150))
        data = {"string_to_token": {"*": 265},
                "string_to_param": {"*": vec},
                "name": name, "step": step,
                "sd_checkpoint": None, "sd_checkpoint_name": None}
        png = insert_image_data_embed(card, data)
        png.save(os.path.splitext(save_path)[0] + ".png")
    except Exception:
        pass


def _save_preview(model, name: str, emb, step: int, save_path: str,
                  prompt: str, steps: int, size: tuple, seed: int):
    """Sample a preview with the in-training embedding spliced into the
    live embedding database (reference textual_inversion.py:600
    create_image_every flow); PNG lands in <save dir>/images/."""
    import os

    try:
        from sdwebui_tpu.networks.textual_inversion import \
            Embedding as _LiveEmbedding
        from sdwebui_tpu.pipeline.params import GenerationParams
        from sdwebui_tpu.pipeline.processing import process_txt2img

        db = getattr(model.conditioner, "embedding_db", None)
        if db is not None:
            db.register(_LiveEmbedding(
                name, np.asarray(jax.device_get(emb), np.float32), step=step))
        p = GenerationParams(prompt=prompt, seed=seed, steps=steps,
                             width=size[0], height=size[1])
        res = process_txt2img(model, p)
        out_dir = os.path.join(os.path.dirname(save_path) or ".", "images")
        os.makedirs(out_dir, exist_ok=True)
        res.images[0].save(os.path.join(out_dir, f"{name}-{step}.png"))
    except Exception:
        pass
