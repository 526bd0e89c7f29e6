"""The loaded-model bundle: UNet + VAE + text encoder(s) + discretization.

Replaces the reference's mutable `shared.sd_model` (a hijacked ldm object,
modules/sd_models.py:676) with an explicit immutable bundle of param
pytrees + configs.  "Hijacks" (LoRA, TI, optimizations) become functions
over this bundle, never in-place patches.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sdwebui_tpu.models import clip as clip_model
from sdwebui_tpu.models import unet as unet_model
from sdwebui_tpu.models import vae as vae_model
from sdwebui_tpu.models.configs import (
    CLIP_L, CLIPTextConfig, SD15_UNET, SD_VAE, UNetConfig, VAEConfig,
)
from sdwebui_tpu.sampling.discretization import Discretization, make_alphas_cumprod
from sdwebui_tpu.text.conditioner import TextConditioner
from sdwebui_tpu.text.tokenizer import get_tokenizer


@dataclasses.dataclass
class SDModel:
    kind: str                     # sd1 | sd2 | sdxl | sdxl-refiner
    unet_params: Any
    unet_cfg: UNetConfig
    vae_params: Any
    vae_cfg: VAEConfig
    disc: Discretization
    conditioner: TextConditioner          # primary text encoder
    conditioner2: TextConditioner | None = None  # SDXL's OpenCLIP-bigG
    title: str = "random-sd15"
    sha256: str = ""
    t5_params: Any = None         # SD3 third encoder (models/t5.py)
    t5_cfg: Any = None
    t5_tokenizer: Any = None      # pluggable — SentencePiece data is not
                                  # shipped in this image (see models/t5.py)
    # SD2 conditioning variants, sniffed from the weights (loader/sniff.py)
    image_embedder_params: Any = None  # unclip: open_clip vision tower
    image_embedder_cfg: Any = None
    noise_aug_stats: Any = None        # unclip: {"mean": (D,), "std": (D,)}
    depth_params: Any = None           # depth2img: MiDaS DPT-hybrid tower
    depth_cfg: Any = None
    # host-side high-precision copies of fp8-quantized UNet weights, keyed
    # by flat path (opts.cache_fp16_weight: LoRA merges use these as the
    # base instead of double-quantizing; reference networks.py weights_backup)
    unet_params_hp: Any = None

    @property
    def is_unclip(self) -> bool:
        """crossattn-adm conditioning (SD2.1-unclip)."""
        return self.image_embedder_params is not None

    @property
    def is_depth(self) -> bool:
        """hybrid depth conditioning (SD2-depth, 5ch UNet)."""
        return self.depth_params is not None

    @property
    def is_sdxl(self) -> bool:
        return self.kind.startswith("sdxl")

    @property
    def is_sd3(self) -> bool:
        return self.kind == "sd3"

    @property
    def latent_channels(self) -> int:
        return self.vae_cfg.embed_dim

    # ---- conditioning -------------------------------------------------

    def encode_texts(self, texts, target_chunks=None):
        """texts → (N, S, D) crossattn conds, or (conds, pooled) when the
        family uses pooled vectors (SDXL, SD3)."""
        if self.kind == "sd3":
            # CLIP-L(768) ⊕ bigG(1280) on features → zero-pad to 4096 (the
            # T5 channel slot), then sequence-concat the T5-XXL context when
            # loaded + tokenizer available (reference sd3_cond.py: lg ⊕ t5
            # along tokens; T5 off by default as in the reference);
            # pooled = l_pooled(768) ⊕ g_pooled(1280) = 2048
            c1, p1 = self.conditioner.encode(texts, target_chunks=target_chunks)
            c2, p2 = self.conditioner2.encode(texts, target_chunks=target_chunks)
            lg = jnp.concatenate([c1, c2], axis=-1)
            lg = jnp.pad(lg, ((0, 0), (0, 0),
                              (0, self.unet_cfg.context_dim - lg.shape[-1])))
            if self.t5_params is not None and self.t5_tokenizer is not None:
                from sdwebui_tpu.models import t5 as t5_model

                ids = np.asarray([self.t5_tokenizer(t) for t in texts],
                                 np.int32)
                t5_out = t5_model.apply(self.t5_params, self.t5_cfg,
                                        jnp.asarray(ids))
                lg = jnp.concatenate([lg, t5_out.astype(lg.dtype)], axis=1)
            return lg, jnp.concatenate([p1, p2], axis=-1)
        if self.kind == "sdxl":
            # CLIP-L (no final LN, penultimate) ⊕ bigG (penultimate),
            # concatenated on features; pooled comes from bigG
            c1, _ = self.conditioner.encode(texts, target_chunks=target_chunks)
            c2, pooled = self.conditioner2.encode(texts, target_chunks=target_chunks)
            return jnp.concatenate([c1, c2], axis=-1), pooled
        if self.kind == "sdxl-refiner":
            cond, pooled = self.conditioner.encode(texts, target_chunks=target_chunks)
            return cond, pooled
        cond, _ = self.conditioner.encode(texts, target_chunks=target_chunks)
        return cond

    # ---- weight swap helpers ------------------------------------------

    def with_unet_params(self, params) -> "SDModel":
        return dataclasses.replace(self, unet_params=params)

    def park_to_host(self) -> "SDModel":
        """Move the big param trees to host RAM (reference
        sd_checkpoints_keep_in_cpu: the previous model moves to CPU on swap,
        modules/sd_models.py:890).  Freeing HBM costs a re-upload on the
        next use — numpy trees ride back via the jit arg path
        automatically."""
        import copy

        new = dataclasses.replace(
            self,
            unet_params=jax.device_get(self.unet_params),
            vae_params=jax.device_get(self.vae_params))
        new.conditioner = copy.copy(self.conditioner)
        new.conditioner.params = jax.device_get(self.conditioner.params)
        if new.conditioner2 is not None:
            new.conditioner2 = copy.copy(self.conditioner2)
            new.conditioner2.params = jax.device_get(self.conditioner2.params)
        return new

    def replicate(self, rt=None) -> "SDModel":
        """Place params on the active mesh for multi-device generation
        (first-class TPU component; no reference counterpart, SURVEY §2.6):
        replicated over `data`; when the mesh has a model axis >1, the UNet's
        attention/MLP projections shard Megatron-style over `model`
        (parallel/sharding.py) and GSPMD inserts the ICI collectives —
        tensor parallelism for latency at small batch."""
        from sdwebui_tpu.parallel.mesh import get_runtime
        from sdwebui_tpu.parallel.sharding import shard_params

        rt = rt or get_runtime()
        if rt.n_devices <= 1:
            return self
        import copy

        rep = rt.replicated
        unet_placed = shard_params(rt, self.unet_params) if rt.model_size > 1 \
            else jax.device_put(self.unet_params, rep)
        new = dataclasses.replace(
            self,
            unet_params=unet_placed,
            vae_params=jax.device_put(self.vae_params, rep))
        # shallow-copy the conditioners: dataclasses.replace shares them, and
        # re-placing params in place would silently move the ORIGINAL model's
        # conditioner onto this mesh too
        new.conditioner = copy.copy(self.conditioner)
        new.conditioner.params = jax.device_put(self.conditioner.params, rep)
        if new.conditioner2 is not None:
            new.conditioner2 = copy.copy(self.conditioner2)
            new.conditioner2.params = jax.device_put(self.conditioner2.params, rep)
        return new


def make_denoise_fn(model: SDModel):
    """Build denoise(x, sigma, ctx, y, c_concat) → denoised for the CFG
    wrapper: k-diffusion CompVis(V)Denoiser scalings + quantized σ→t lookup
    done on-device (the reference keeps sigmas on CPU and indexes per step;
    here the whole table rides in the compiled program)."""
    from sdwebui_tpu.utils import devices as _dv

    log_sigmas = jnp.asarray(model.disc.log_sigmas, jnp.float32)
    prediction_type = model.disc.prediction_type
    unet_cfg = model.unet_cfg
    unet_params = model.unet_params
    compute_dtype = _dv.get_policy().compute_dtype

    def denoise(x, sigma, ctx, y=None, c_concat=None):
        sigma = sigma.astype(jnp.float32)
        t = jnp.argmin(
            jnp.abs(jnp.log(jnp.maximum(sigma, 1e-12))[:, None] - log_sigmas[None, :]),
            axis=-1).astype(jnp.float32)
        c_in = (1.0 / jnp.sqrt(sigma ** 2 + 1.0))[:, None, None, None]
        x_in = (x * c_in).astype(compute_dtype)
        if c_concat is not None:
            x_in = jnp.concatenate([x_in, c_concat.astype(x_in.dtype)], axis=-1)
        out = unet_model.apply(unet_params, unet_cfg, x_in, t, ctx, y=y)
        out = out.astype(jnp.float32)
        sig = sigma[:, None, None, None]
        if prediction_type == "v":
            c_out = -sig / jnp.sqrt(sig ** 2 + 1.0)
            c_skip = 1.0 / (sig ** 2 + 1.0)
            return c_skip * x + c_out * out
        return x - out * sig

    return denoise


def decode_latents(model: SDModel, latents):
    """scaled latents (B,h,w,C) → images (B,H,W,3) float32 in [0,1]."""
    z = latents.astype(jnp.float32)
    img = vae_model.decode(model.vae_params, model.vae_cfg, z)
    return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)


def encode_images(model: SDModel, images, sample_noise=None):
    """images (B,H,W,3) in [0,1] → scaled latents. Deterministic (mean) when
    sample_noise is None — the reference img2img path."""
    x = images.astype(jnp.float32) * 2.0 - 1.0
    moments = vae_model.encode_moments(model.vae_params, model.vae_cfg, x)
    if sample_noise is None:
        return vae_model.encode_mode(moments, model.vae_cfg)
    return vae_model.sample_latent(moments, sample_noise, model.vae_cfg)


def sdxl_vector_maker(model: SDModel, width: int, height: int,
                      crop: tuple = (0, 0),
                      aesthetic_score: float = 6.0,
                      negative_aesthetic_score: float = 2.5):
    """SDXL adm vector builder (reference modules/sd_models_xl.py:12-52):

    base:    [pooled(1280) | emb(orig_h,orig_w) | emb(crop_t,crop_l) |
              emb(target_h,target_w)]                       = 2816
    refiner: [pooled(1280) | emb(orig_h,orig_w) | emb(crop_t,crop_l) |
              emb(aesthetic_score)]                          = 2560
    each scalar sinusoid-embedded at dim 256 (sgm layout).
    """
    from sdwebui_tpu.models.layers import timestep_embedding

    refiner = model.kind == "sdxl-refiner"

    def emb_scalars(values):
        parts = [timestep_embedding(jnp.asarray([float(v)]), 256)[0]
                 for v in values]
        return jnp.concatenate(parts, axis=-1)

    common = emb_scalars([height, width, crop[0], crop[1]])
    if not refiner:
        common = jnp.concatenate([common, emb_scalars([height, width])], axis=-1)

    def maker(pooled, is_uncond):
        n = pooled.shape[0]
        tail = jnp.broadcast_to(common[None], (n, common.shape[0]))
        if refiner:
            pos = timestep_embedding(jnp.asarray([aesthetic_score]), 256)[0]
            neg = timestep_embedding(jnp.asarray([negative_aesthetic_score]), 256)[0]
            aes = jnp.where(is_uncond[:, None], neg[None], pos[None])
            tail = jnp.concatenate([tail, aes], axis=-1)
        return jnp.concatenate([pooled.astype(jnp.float32), tail], axis=-1)

    return maker


def unclip_adm(model: SDModel, images=None, noise_level: int = 0,
               seed: int = 0):
    """The unclip model's adm vector (reference
    modules/processing.py:328-334 unclip_image_conditioning +
    txt2img_image_conditioning:113):

    img2img: CLIP-vision embed of the source image → normalize by the
    checkpoint's data stats → q_sample at `noise_level` (ldm
    CLIPEmbeddingNoiseAugmentation; the reference uses level 0 and torch
    global noise — here Philox(seed) for reproducibility) → un-normalize →
    concat sinusoid embedding of the noise level.  txt2img: zeros.

    Returns a single (adm_in_channels,) vector (batch items share the init
    image in the webui flow; the CFG wrapper broadcasts per batch/branch).
    """
    adm_ch = int(model.unet_cfg.adm_in_channels)
    if images is None:
        return jnp.zeros((adm_ch,), jnp.float32)

    from sdwebui_tpu.models import clip_vision
    from sdwebui_tpu.models.layers import timestep_embedding
    from sdwebui_tpu.rng.philox import PhiloxGenerator

    # adm = [noised embed (projection_dim) | timestep emb (the rest)]
    dim = adm_ch - int(model.image_embedder_cfg.projection_dim)
    im = images[0]
    pixels = jnp.asarray(clip_vision.preprocess(
        im, model.image_embedder_cfg.image_size))
    emb = clip_vision.apply(model.image_embedder_params,
                            model.image_embedder_cfg, pixels,
                            normalize=False).astype(jnp.float32)   # (1, D)
    mean = jnp.asarray(model.noise_aug_stats["mean"],
                       jnp.float32).reshape(1, -1)
    std = jnp.asarray(model.noise_aug_stats["std"],
                      jnp.float32).reshape(1, -1)
    x = (emb - mean) / std
    ac = float(make_alphas_cumprod()[noise_level])
    noise = jnp.asarray(PhiloxGenerator(seed).randn(x.shape), jnp.float32)
    z = (ac ** 0.5) * x + ((1.0 - ac) ** 0.5) * noise
    z = z * std + mean
    lvl = timestep_embedding(jnp.asarray([float(noise_level)]), dim)
    return jnp.concatenate([z, lvl.astype(z.dtype)], axis=-1)[0]


# --------------------------------------------------------------------------
# factories
# --------------------------------------------------------------------------

def _rand_on_device(module, cfg, seed, dtype=jnp.float32, **kw):
    """Random params generated ON the accelerator in one jitted dispatch
    (init_utils.device_init) — host numpy + a multi-GB transfer through the
    TPU tunnel takes minutes per billion params; this takes one compile."""
    from sdwebui_tpu.models.init_utils import SpecInit, device_init

    spec = module.init_params(cfg, seed, dtype=dtype, ini=SpecInit(), **kw)
    return device_init(spec, seed)


def create_random_sd15(seed: int = 0, dtype=jnp.bfloat16,
                       prediction_type: str = "eps") -> SDModel:
    """Random-weight SD1.5 — the reference CI's empty-checkpoint mode
    (SURVEY.md §4) and the bench target."""
    disc = Discretization(make_alphas_cumprod(), prediction_type=prediction_type)
    clip_params = _rand_on_device(clip_model, CLIP_L, seed + 1)
    cond = TextConditioner(clip_params, CLIP_L, get_tokenizer())
    return SDModel(
        kind="sd1",
        unet_params=_rand_on_device(unet_model, SD15_UNET, seed, dtype=dtype),
        unet_cfg=SD15_UNET,
        vae_params=_rand_on_device(vae_model, SD_VAE, seed + 2),
        vae_cfg=SD_VAE,
        disc=disc,
        conditioner=cond,
        title="random-sd15.safetensors [0000000000]",
    )


def create_random_sdxl(seed: int = 0, dtype=jnp.bfloat16,
                       refiner: bool = False) -> SDModel:
    """Full-size random-weight SDXL base (or refiner) for the BASELINE
    benchmark configs (BASELINE.md config #5): identical compute graph and
    data movement as real weights.  Base = CLIP-L ⊕ OpenCLIP-bigG dual
    encoder, 2816-dim adm; refiner = bigG only, 2560-dim adm
    (reference modules/sd_models_config.py + sgm configs)."""
    from sdwebui_tpu.models.configs import (OPEN_CLIP_BIGG, SDXL_REFINER_UNET,
                                            SDXL_UNET, SDXL_VAE)

    disc = Discretization(make_alphas_cumprod())
    tok = get_tokenizer()
    # bigG encodes once per generation; bf16 params halve its HBM share so
    # base+refiner+encoders fit one v5e chip together
    cond_g = TextConditioner(
        _rand_on_device(clip_model, OPEN_CLIP_BIGG, seed + 3, dtype=dtype),
        OPEN_CLIP_BIGG, tok, clip_skip=2, apply_final_norm=False)
    if refiner:
        return SDModel(
            kind="sdxl-refiner",
            unet_params=_rand_on_device(unet_model, SDXL_REFINER_UNET, seed,
                                        dtype=dtype),
            unet_cfg=SDXL_REFINER_UNET,
            vae_params=_rand_on_device(vae_model, SDXL_VAE, seed + 2),
            vae_cfg=SDXL_VAE,
            disc=disc,
            conditioner=cond_g,
            title="random-sdxl-refiner.safetensors [0000000001]",
        )
    cond_l = TextConditioner(
        _rand_on_device(clip_model, CLIP_L, seed + 1, dtype=dtype), CLIP_L,
        tok, clip_skip=2, apply_final_norm=False)
    return SDModel(
        kind="sdxl",
        unet_params=_rand_on_device(unet_model, SDXL_UNET, seed,
                                    dtype=dtype),
        unet_cfg=SDXL_UNET,
        vae_params=_rand_on_device(vae_model, SDXL_VAE, seed + 2),
        vae_cfg=SDXL_VAE,
        disc=disc,
        conditioner=cond_l,
        conditioner2=cond_g,
        title="random-sdxl.safetensors [0000000000]",
    )


def create_tiny_sdxl(seed: int = 0) -> SDModel:
    """Miniature SDXL-shaped model (dual encoders + adm vectors) for tests."""
    unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                          attention_resolutions=(2,), transformer_depth=(0, 1),
                          context_dim=96, num_heads=4,
                          use_linear_in_transformer=True,
                          adm_in_channels=64 + 6 * 256)
    vae_cfg = VAEConfig(ch=32, ch_mult=(1, 2, 2, 2), num_res_blocks=1,
                        scale_factor=0.13025)
    cfg_l = CLIPTextConfig(width=32, layers=2, heads=2)
    cfg_g = CLIPTextConfig(width=64, layers=2, heads=2, projection_dim=64)
    disc = Discretization(make_alphas_cumprod())
    tok = get_tokenizer()
    cond1 = TextConditioner(clip_model.init_params(cfg_l, seed + 1), cfg_l, tok,
                            clip_skip=2, apply_final_norm=False)
    cond2 = TextConditioner(clip_model.init_params(cfg_g, seed + 3), cfg_g, tok,
                            clip_skip=2, apply_final_norm=False)
    return SDModel(
        kind="sdxl",
        unet_params=jax.device_put(unet_model.init_params(unet_cfg, seed, dtype=jnp.float32)),
        unet_cfg=unet_cfg,
        vae_params=jax.device_put(vae_model.init_params(vae_cfg, seed + 2)),
        vae_cfg=vae_cfg,
        disc=disc,
        conditioner=cond1,
        conditioner2=cond2,
        title="tiny-sdxl-test [0000000000]",
    )


def create_tiny_sd3(seed: int = 0) -> SDModel:
    """Miniature SD3-shaped model: MMDiT + 16ch VAE + dual CLIP, flow sigmas."""
    from sdwebui_tpu.models import mmdit as mmdit_model
    from sdwebui_tpu.models.mmdit import MMDiTConfig
    from sdwebui_tpu.sampling.discretization import FlowDiscretization

    cfg = MMDiTConfig(depth=2, in_channels=16, context_dim=96, pooled_dim=96,
                      pos_embed_max_size=16)
    vae_cfg = VAEConfig(embed_dim=16, z_channels=16, ch=32, ch_mult=(1, 2, 2, 2),
                        num_res_blocks=1, scale_factor=1.5305,
                        shift_factor=0.0609)
    cfg_l = CLIPTextConfig(width=32, layers=2, heads=2)
    cfg_g = CLIPTextConfig(width=64, layers=2, heads=2, projection_dim=64)
    tok = get_tokenizer()
    cond1 = TextConditioner(clip_model.init_params(cfg_l, seed + 1), cfg_l, tok,
                            clip_skip=2, apply_final_norm=False)
    cond2 = TextConditioner(clip_model.init_params(cfg_g, seed + 3), cfg_g, tok,
                            clip_skip=2, apply_final_norm=False)
    return SDModel(
        kind="sd3",
        unet_params=jax.device_put(mmdit_model.init_params(cfg, seed)),
        unet_cfg=cfg,
        vae_params=jax.device_put(vae_model.init_params(vae_cfg, seed + 2)),
        vae_cfg=vae_cfg,
        disc=FlowDiscretization(shift=3.0),
        conditioner=cond1,
        conditioner2=cond2,
        title="tiny-sd3-test [0000000000]",
    )


def create_tiny_sd(seed: int = 0) -> SDModel:
    """Miniature model for CI-speed end-to-end tests (64×64 images)."""
    unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                          attention_resolutions=(2, 1), transformer_depth=(1, 1),
                          context_dim=64, num_heads=4)
    vae_cfg = VAEConfig(ch=32, ch_mult=(1, 2, 2, 2), num_res_blocks=1)
    clip_cfg = CLIPTextConfig(width=64, layers=2, heads=4)
    disc = Discretization(make_alphas_cumprod())
    cond = TextConditioner(clip_model.init_params(clip_cfg, seed + 1), clip_cfg,
                           get_tokenizer())
    return SDModel(
        kind="sd1",
        unet_params=jax.device_put(unet_model.init_params(unet_cfg, seed, dtype=jnp.float32)),
        unet_cfg=unet_cfg,
        vae_params=jax.device_put(vae_model.init_params(vae_cfg, seed + 2)),
        vae_cfg=vae_cfg,
        disc=disc,
        conditioner=cond,
        title="tiny-test-model [0000000000]",
    )


def quantize_unet_fp8(model: SDModel, keep_hp: bool = False) -> SDModel:
    """Store the UNet's conv/linear weights as float8_e4m3fn in HBM
    (reference opts.fp8_storage, modules/sd_models.py fp8 path: Linear/Conv
    weights only; norms, biases and embeddings stay high-precision).  The
    UNet forward upcasts to bf16 at use — XLA fuses the convert into the
    consumer, so HBM holds half the bytes and the MXU still sees bf16.

    keep_hp (opts.cache_fp16_weight): retain host copies of the quantized
    leaves so LoRA merges use the original values as the base instead of
    re-quantizing quantized weights.
    """
    import numpy as np

    from sdwebui_tpu.utils.pytree import flatten, unflatten

    flat = flatten(model.unet_params)
    hp: dict = {}
    new: dict = {}
    f8 = jnp.float8_e4m3fn
    for path, w in flat.items():
        quantizable = (path.endswith(".weight") and getattr(w, "ndim", 0) >= 2
                       and w.dtype in (jnp.bfloat16, jnp.float32, jnp.float16)
                       and "norm" not in path.rsplit(".", 2)[-2])
        if quantizable:
            if keep_hp:
                hp[path] = np.asarray(jax.device_get(w))  # original dtype
            new[path] = jnp.asarray(w).astype(f8)
        else:
            new[path] = w
    return dataclasses.replace(model, unet_params=unflatten(new),
                               unet_params_hp=hp if keep_hp else None)


def dequantize_unet_fp8(model: SDModel, dtype=jnp.bfloat16) -> SDModel:
    """Undo fp8 storage from the retained host copies (exact) or, without
    them, by upcasting the quantized values (lossy — same as the reference,
    which requires a checkpoint reload to fully undo fp8)."""
    from sdwebui_tpu.utils.pytree import flatten, unflatten

    flat = flatten(model.unet_params)
    hp = model.unet_params_hp or {}
    new = {}
    for path, w in flat.items():
        if getattr(w, "dtype", None) == jnp.float8_e4m3fn:
            src = hp.get(path)
            new[path] = (jnp.asarray(src) if src is not None
                         else jnp.asarray(w).astype(dtype))
        else:
            new[path] = w
    return dataclasses.replace(model, unet_params=unflatten(new),
                               unet_params_hp=None)
