"""Checkpoint key+shape manifest generator — INDEPENDENT of sdwebui_tpu.

Authors the canonical state-dict key inventories of the public Stable
Diffusion checkpoint families by replaying the module-composition rules of
the code that *produces* those checkpoints:

  * ldm  UNetModel / AutoencoderKL   (Stability-AI/stablediffusion,
    `ldm/modules/diffusionmodules/openaimodel.py`, `.../model.py`; config
    values from /root/reference/configs/v1-inference.yaml,
    v2-inference-v.yaml, v1-inpainting-inference.yaml)
  * sgm  UNetModel (SDXL base/refiner; config values from the published
    sd_xl_base.yaml / sd_xl_refiner.yaml as documented in
    /root/reference/modules/sd_models_config.py and sd_models_xl.py)
  * transformers CLIPTextModel        (SD1 cond_stage_model.transformer)
  * open_clip text towers             (SD2 ViT-H 23-resblock pruned tower;
    SDXL ViT-bigG 32-resblock tower)
  * the DDPM schedule buffers ldm registers on the wrapper class

This file deliberately imports nothing from the repo: if loader/convert.py
or model param naming drifts from these manifests, tests/test_key_manifests
fails — the manifest, not repo code, defines what the loader must accept
(VERDICT r2 item 3).

Run:  python tests/fixtures/key_manifests/generate_manifests.py
writes <family>.json files (key -> shape list) next to itself.
"""

import json
import os

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


# --------------------------------------------------------------------------
# ldm / sgm UNetModel
# --------------------------------------------------------------------------

def _resblock(keys, pre, cin, cout, time_dim):
    keys[f"{pre}.in_layers.0.weight"] = [cin]
    keys[f"{pre}.in_layers.0.bias"] = [cin]
    keys[f"{pre}.in_layers.2.weight"] = [cout, cin, 3, 3]
    keys[f"{pre}.in_layers.2.bias"] = [cout]
    keys[f"{pre}.emb_layers.1.weight"] = [cout, time_dim]
    keys[f"{pre}.emb_layers.1.bias"] = [cout]
    keys[f"{pre}.out_layers.0.weight"] = [cout]
    keys[f"{pre}.out_layers.0.bias"] = [cout]
    keys[f"{pre}.out_layers.3.weight"] = [cout, cout, 3, 3]
    keys[f"{pre}.out_layers.3.bias"] = [cout]
    if cin != cout:
        keys[f"{pre}.skip_connection.weight"] = [cout, cin, 1, 1]
        keys[f"{pre}.skip_connection.bias"] = [cout]


def _spatial_transformer(keys, pre, ch, depth, ctx_dim, use_linear):
    keys[f"{pre}.norm.weight"] = [ch]
    keys[f"{pre}.norm.bias"] = [ch]
    proj_shape = [ch, ch] if use_linear else [ch, ch, 1, 1]
    keys[f"{pre}.proj_in.weight"] = proj_shape
    keys[f"{pre}.proj_in.bias"] = [ch]
    for d in range(depth):
        blk = f"{pre}.transformer_blocks.{d}"
        for attn, kdim in (("attn1", ch), ("attn2", ctx_dim)):
            keys[f"{blk}.{attn}.to_q.weight"] = [ch, ch]
            keys[f"{blk}.{attn}.to_k.weight"] = [ch, kdim]
            keys[f"{blk}.{attn}.to_v.weight"] = [ch, kdim]
            keys[f"{blk}.{attn}.to_out.0.weight"] = [ch, ch]
            keys[f"{blk}.{attn}.to_out.0.bias"] = [ch]
        inner = 4 * ch
        keys[f"{blk}.ff.net.0.proj.weight"] = [2 * inner, ch]   # GEGLU
        keys[f"{blk}.ff.net.0.proj.bias"] = [2 * inner]
        keys[f"{blk}.ff.net.2.weight"] = [ch, inner]
        keys[f"{blk}.ff.net.2.bias"] = [ch]
        for n in ("norm1", "norm2", "norm3"):
            keys[f"{blk}.{n}.weight"] = [ch]
            keys[f"{blk}.{n}.bias"] = [ch]
    keys[f"{pre}.proj_out.weight"] = proj_shape
    keys[f"{pre}.proj_out.bias"] = [ch]


def unet_keys(in_channels=4, model_channels=320, out_channels=4,
              num_res_blocks=2, attention_ds=(4, 2, 1),
              channel_mult=(1, 2, 4, 4), transformer_depth=1,
              transformer_depth_middle=None, context_dim=768,
              use_linear=False, adm_in_channels=0,
              prefix="model.diffusion_model."):
    """Key layout of ldm/sgm UNetModel.__init__ (module registration
    order replayed; per-level transformer_depth list as in sgm)."""
    keys = {}
    mc = model_channels
    time_dim = 4 * mc
    if isinstance(transformer_depth, int):
        transformer_depth = [transformer_depth] * len(channel_mult)
    if transformer_depth_middle is None:
        transformer_depth_middle = transformer_depth[-1]

    keys["time_embed.0.weight"] = [time_dim, mc]
    keys["time_embed.0.bias"] = [time_dim]
    keys["time_embed.2.weight"] = [time_dim, time_dim]
    keys["time_embed.2.bias"] = [time_dim]
    if adm_in_channels:
        # sgm: label_emb = Sequential(Sequential(Linear, SiLU, Linear))
        keys["label_emb.0.0.weight"] = [time_dim, adm_in_channels]
        keys["label_emb.0.0.bias"] = [time_dim]
        keys["label_emb.0.2.weight"] = [time_dim, time_dim]
        keys["label_emb.0.2.bias"] = [time_dim]

    keys["input_blocks.0.0.weight"] = [mc, in_channels, 3, 3]
    keys["input_blocks.0.0.bias"] = [mc]

    ch, ds, idx = mc, 1, 1
    skip_chs = [mc]
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            _resblock(keys, f"input_blocks.{idx}.0", ch, mult * mc, time_dim)
            ch = mult * mc
            if ds in attention_ds:
                _spatial_transformer(keys, f"input_blocks.{idx}.1", ch,
                                     transformer_depth[level], context_dim,
                                     use_linear)
            skip_chs.append(ch)
            idx += 1
        if level != len(channel_mult) - 1:
            keys[f"input_blocks.{idx}.0.op.weight"] = [ch, ch, 3, 3]
            keys[f"input_blocks.{idx}.0.op.bias"] = [ch]
            skip_chs.append(ch)
            idx += 1
            ds *= 2

    _resblock(keys, "middle_block.0", ch, ch, time_dim)
    _spatial_transformer(keys, "middle_block.1", ch,
                         transformer_depth_middle, context_dim, use_linear)
    _resblock(keys, "middle_block.2", ch, ch, time_dim)

    idx = 0
    for level, mult in reversed(list(enumerate(channel_mult))):
        for i in range(num_res_blocks + 1):
            ich = skip_chs.pop()
            _resblock(keys, f"output_blocks.{idx}.0", ch + ich, mult * mc,
                      time_dim)
            ch = mult * mc
            n = 1
            if ds in attention_ds:
                _spatial_transformer(keys, f"output_blocks.{idx}.{n}", ch,
                                     transformer_depth[level], context_dim,
                                     use_linear)
                n += 1
            if level and i == num_res_blocks:
                keys[f"output_blocks.{idx}.{n}.conv.weight"] = [ch, ch, 3, 3]
                keys[f"output_blocks.{idx}.{n}.conv.bias"] = [ch]
                ds //= 2
            idx += 1

    keys["out.0.weight"] = [mc]
    keys["out.0.bias"] = [mc]
    keys["out.2.weight"] = [out_channels, mc, 3, 3]
    keys["out.2.bias"] = [out_channels]
    return {prefix + k: v for k, v in keys.items()}


# --------------------------------------------------------------------------
# ldm AutoencoderKL (first_stage_model)
# --------------------------------------------------------------------------

def _vae_resblock(keys, pre, cin, cout):
    keys[f"{pre}.norm1.weight"] = [cin]
    keys[f"{pre}.norm1.bias"] = [cin]
    keys[f"{pre}.conv1.weight"] = [cout, cin, 3, 3]
    keys[f"{pre}.conv1.bias"] = [cout]
    keys[f"{pre}.norm2.weight"] = [cout]
    keys[f"{pre}.norm2.bias"] = [cout]
    keys[f"{pre}.conv2.weight"] = [cout, cout, 3, 3]
    keys[f"{pre}.conv2.bias"] = [cout]
    if cin != cout:
        keys[f"{pre}.nin_shortcut.weight"] = [cout, cin, 1, 1]
        keys[f"{pre}.nin_shortcut.bias"] = [cout]


def _vae_mid(keys, pre, ch):
    _vae_resblock(keys, f"{pre}.block_1", ch, ch)
    keys[f"{pre}.attn_1.norm.weight"] = [ch]
    keys[f"{pre}.attn_1.norm.bias"] = [ch]
    for proj in ("q", "k", "v", "proj_out"):
        keys[f"{pre}.attn_1.{proj}.weight"] = [ch, ch, 1, 1]
        keys[f"{pre}.attn_1.{proj}.bias"] = [ch]
    _vae_resblock(keys, f"{pre}.block_2", ch, ch)


def vae_keys(ch=128, ch_mult=(1, 2, 4, 4), num_res_blocks=2, z_channels=4,
             embed_dim=4, in_ch=3, out_ch=3, prefix="first_stage_model."):
    keys = {}
    # encoder
    keys["encoder.conv_in.weight"] = [ch, in_ch, 3, 3]
    keys["encoder.conv_in.bias"] = [ch]
    cur = ch
    for i, mult in enumerate(ch_mult):
        for b in range(num_res_blocks):
            _vae_resblock(keys, f"encoder.down.{i}.block.{b}", cur, ch * mult)
            cur = ch * mult
        if i != len(ch_mult) - 1:
            keys[f"encoder.down.{i}.downsample.conv.weight"] = [cur, cur, 3, 3]
            keys[f"encoder.down.{i}.downsample.conv.bias"] = [cur]
    _vae_mid(keys, "encoder.mid", cur)
    keys["encoder.norm_out.weight"] = [cur]
    keys["encoder.norm_out.bias"] = [cur]
    keys["encoder.conv_out.weight"] = [2 * z_channels, cur, 3, 3]
    keys["encoder.conv_out.bias"] = [2 * z_channels]
    # decoder (ldm registers levels as up.{i_level}: up.0 = highest res)
    keys["decoder.conv_in.weight"] = [cur, z_channels, 3, 3]
    keys["decoder.conv_in.bias"] = [cur]
    _vae_mid(keys, "decoder.mid", cur)
    for i_level in reversed(range(len(ch_mult))):
        out = ch * ch_mult[i_level]
        for b in range(num_res_blocks + 1):
            _vae_resblock(keys, f"decoder.up.{i_level}.block.{b}", cur, out)
            cur = out
        if i_level != 0:
            keys[f"decoder.up.{i_level}.upsample.conv.weight"] = \
                [cur, cur, 3, 3]
            keys[f"decoder.up.{i_level}.upsample.conv.bias"] = [cur]
    keys["decoder.norm_out.weight"] = [cur]
    keys["decoder.norm_out.bias"] = [cur]
    keys["decoder.conv_out.weight"] = [out_ch, cur, 3, 3]
    keys["decoder.conv_out.bias"] = [out_ch]
    keys["quant_conv.weight"] = [2 * embed_dim, 2 * z_channels, 1, 1]
    keys["quant_conv.bias"] = [2 * embed_dim]
    keys["post_quant_conv.weight"] = [embed_dim, z_channels, 1, 1]
    keys["post_quant_conv.bias"] = [embed_dim]
    return {prefix + k: v for k, v in keys.items()}


# --------------------------------------------------------------------------
# text encoders
# --------------------------------------------------------------------------

def clip_hf_keys(width=768, layers=12, vocab=49408, max_len=77,
                 prefix="cond_stage_model.transformer.text_model."):
    """transformers CLIPTextModel state dict (as shipped inside SD1/SDXL
    checkpoints, including the position_ids int buffer the torch versions
    of the era persisted)."""
    keys = {
        "embeddings.token_embedding.weight": [vocab, width],
        "embeddings.position_embedding.weight": [max_len, width],
        "embeddings.position_ids": [1, max_len],
        "final_layer_norm.weight": [width],
        "final_layer_norm.bias": [width],
    }
    for i in range(layers):
        lp = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            keys[f"{lp}.self_attn.{proj}.weight"] = [width, width]
            keys[f"{lp}.self_attn.{proj}.bias"] = [width]
        keys[f"{lp}.layer_norm1.weight"] = [width]
        keys[f"{lp}.layer_norm1.bias"] = [width]
        keys[f"{lp}.layer_norm2.weight"] = [width]
        keys[f"{lp}.layer_norm2.bias"] = [width]
        keys[f"{lp}.mlp.fc1.weight"] = [4 * width, width]
        keys[f"{lp}.mlp.fc1.bias"] = [4 * width]
        keys[f"{lp}.mlp.fc2.weight"] = [width, 4 * width]
        keys[f"{lp}.mlp.fc2.bias"] = [width]
    return {prefix + k: v for k, v in keys.items()}


def open_clip_keys(width=1024, layers=23, vocab=49408, max_len=77,
                   mlp_ratio=4, prefix="cond_stage_model.model."):
    """open_clip text tower (SD2 checkpoints ship 23 resblocks — the final
    block is pruned since conditioning is penultimate; SDXL's bigG ships
    all 32)."""
    keys = {
        "logit_scale": [],
        "positional_embedding": [max_len, width],
        "text_projection": [width, width],
        "token_embedding.weight": [vocab, width],
        "ln_final.weight": [width],
        "ln_final.bias": [width],
    }
    for i in range(layers):
        rp = f"transformer.resblocks.{i}"
        keys[f"{rp}.attn.in_proj_weight"] = [3 * width, width]
        keys[f"{rp}.attn.in_proj_bias"] = [3 * width]
        keys[f"{rp}.attn.out_proj.weight"] = [width, width]
        keys[f"{rp}.attn.out_proj.bias"] = [width]
        keys[f"{rp}.ln_1.weight"] = [width]
        keys[f"{rp}.ln_1.bias"] = [width]
        keys[f"{rp}.ln_2.weight"] = [width]
        keys[f"{rp}.ln_2.bias"] = [width]
        keys[f"{rp}.mlp.c_fc.weight"] = [mlp_ratio * width, width]
        keys[f"{rp}.mlp.c_fc.bias"] = [mlp_ratio * width]
        keys[f"{rp}.mlp.c_proj.weight"] = [width, mlp_ratio * width]
        keys[f"{rp}.mlp.c_proj.bias"] = [width]
    return {prefix + k: v for k, v in keys.items()}


def ddpm_schedule_keys(timesteps=1000, with_ema_counters=True,
                       with_logvar=True):
    """Buffers ldm's LatentDiffusion registers on the checkpoint root
    (register_schedule); present in v1/v2 .ckpt files, absent from sgm
    (SDXL) files."""
    names = ["betas", "alphas_cumprod", "alphas_cumprod_prev",
             "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
             "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
             "sqrt_recipm1_alphas_cumprod", "posterior_variance",
             "posterior_log_variance_clipped", "posterior_mean_coef1",
             "posterior_mean_coef2"]
    keys = {n: [timesteps] for n in names}
    if with_logvar:
        keys["logvar"] = [timesteps]
    if with_ema_counters:
        keys["model_ema.decay"] = []
        keys["model_ema.num_updates"] = []
    return keys


# --------------------------------------------------------------------------
# families
# --------------------------------------------------------------------------

def sd15(in_channels=4):
    keys = {}
    keys.update(ddpm_schedule_keys())
    keys.update(unet_keys(in_channels=in_channels))
    keys.update(vae_keys())
    keys.update(clip_hf_keys())
    return keys


def sd21():
    keys = {}
    keys.update(ddpm_schedule_keys(with_ema_counters=False))
    # v2-inference-v.yaml: head_channels 64, linear transformer projections
    keys.update(unet_keys(context_dim=1024, use_linear=True))
    keys.update(vae_keys())
    keys.update(open_clip_keys(width=1024, layers=23))
    return keys


def sdxl_base():
    keys = {}
    keys.update(unet_keys(
        channel_mult=(1, 2, 4), attention_ds=(4, 2),
        transformer_depth=[1, 2, 10], context_dim=2048, use_linear=True,
        adm_in_channels=2816))
    keys.update(vae_keys())
    keys.update(clip_hf_keys(
        prefix="conditioner.embedders.0.transformer.text_model."))
    keys.update(open_clip_keys(
        width=1280, layers=32,
        prefix="conditioner.embedders.1.model."))
    return keys


def sdxl_refiner():
    keys = {}
    keys.update(unet_keys(
        model_channels=384, channel_mult=(1, 2, 4, 4),
        attention_ds=(4, 2), transformer_depth=4, context_dim=1280,
        use_linear=True, adm_in_channels=2560))
    keys.update(vae_keys())
    keys.update(open_clip_keys(
        width=1280, layers=32,
        prefix="conditioner.embedders.0.model."))
    return keys


FAMILIES = {
    "sd15": lambda: sd15(),
    "sd15_inpaint": lambda: sd15(in_channels=9),
    "sd21": sd21,
    "sdxl_base": sdxl_base,
    "sdxl_refiner": sdxl_refiner,
}


def main():
    for name, fn in FAMILIES.items():
        keys = fn()
        path = os.path.join(OUT_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(keys, f, indent=0, sort_keys=True)
        n_params = sum(
            int(__import__("math").prod(s or [1])) for s in keys.values())
        print(f"{name}: {len(keys)} keys, {n_params / 1e6:.0f}M params "
              f"-> {path}")


if __name__ == "__main__":
    main()
