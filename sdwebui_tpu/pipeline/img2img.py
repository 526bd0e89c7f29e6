"""img2img / inpainting (reference StableDiffusionProcessingImg2Img,
modules/processing.py:1602-1784 + modules/img2img.py).

Pipeline: init images → resize → mask (binarize/invert/blur,
inpaint-full-res crop via masking.get_crop_region_v2) → fill modes 0-3 →
VAE encode → noise to sigma_sched[0] (t_enc slice of the schedule) →
sampled with per-step latent mask blend → final blend → decode → overlay
paste-back.  Mask blur uses PIL GaussianBlur (no cv2 in this image)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from PIL import Image

from sdwebui_tpu.pipeline.params import GenerationParams, Processed
from sdwebui_tpu.pipeline.processing import (
    _build_conds, _resolve_seeds, _solver_extra, create_infotext,
    encode_first_stage, sample_latents,
    should_save_samples,
)
from sdwebui_tpu.pipeline.sd_model import SDModel
from sdwebui_tpu.rng import ImageRNG, PhiloxGenerator, create_rng
from sdwebui_tpu.sampling.registry import get_sampler
from sdwebui_tpu.sampling.sampler import prepare_noise
from sdwebui_tpu.sampling.schedulers import get_schedule
from sdwebui_tpu.sampling.solvers import SOLVERS
from sdwebui_tpu.utils import images as images_util
from sdwebui_tpu.utils import masking


def setup_img2img_steps(steps: int, denoising_strength: float,
                        fix_steps: bool = False):
    """(steps_to_schedule, t_enc) — reference sd_samplers_common.py:22."""
    if fix_steps:
        requested = steps
        steps = int(requested / min(denoising_strength, 0.999)) \
            if denoising_strength > 0 else 0
        t_enc = requested - 1
    else:
        t_enc = int(min(denoising_strength, 0.999) * steps)
    return steps, t_enc


def _prepare_images_and_mask(p: GenerationParams):
    """Returns (image array (B,H,W,3) [0,1], mask_latent info dict)."""
    init_images = p.init_images if isinstance(p.init_images, list) else [p.init_images]
    imgs = []
    mask_img = None
    overlay_mask = None
    crop_region = None

    if p.mask is not None:
        mask_img = masking.binarize_mask(
            p.mask if isinstance(p.mask, Image.Image) else Image.fromarray(p.mask),
            invert=bool(p.inpainting_mask_invert))
        mask_img = masking.blur_mask(mask_img, p.mask_blur)

    final_mask = None
    for im in init_images:
        if not isinstance(im, Image.Image):
            im = Image.fromarray(np.asarray(im))
        from sdwebui_tpu.utils.options import opts as _opts

        # reference processing.py:1677: transparent init pixels filled with
        # opts.img2img_background_color before RGB conversion
        im = images_util.flatten(
            im, _opts.get("img2img_background_color", "#ffffff") or "#ffffff")

        if _opts.get("save_init_img", False):
            # reference processing.py:1673-1675: content-addressed copy of
            # the init image, hash recorded in infotext
            import hashlib

            p.init_img_hash = hashlib.md5(im.tobytes()).hexdigest()
            images_util.save_image(
                im, _opts.get("outdir_init_images", "outputs/init-images")
                or "outputs/init-images",
                forced_filename=p.init_img_hash, save_to_dirs=False,
                existing_info=dict(getattr(im, "info", {}) or {}))

        if mask_img is not None and p.inpaint_full_res:
            m = np.asarray(mask_img.resize(im.size)) > 127
            crop_region = masking.get_crop_region_v2(m, p.inpaint_full_res_padding)
            crop_region = masking.expand_crop_region(
                crop_region, p.width, p.height, im.width, im.height)
            overlay_mask = mask_img.resize(im.size)
            x1, y1, x2, y2 = crop_region
            im = im.crop(crop_region)
            mask_use = overlay_mask.crop(crop_region)
        else:
            mask_use = mask_img
            overlay_mask = mask_img

        im = images_util.resize_image(
            p.resize_mode, im, p.width, p.height,
            upscaler_name=_opts.get("upscaler_for_img2img", "None"))
        if mask_use is not None:
            mask_use = mask_use.resize((p.width, p.height))
            if p.inpainting_fill == 0:  # fill with surrounding colors
                im = Image.composite(
                    masking.fill(im, mask_use), im,
                    masking.binarize_mask(mask_use))
        imgs.append(images_util.pil_to_tensor(im))
        final_mask = mask_use

    arr = np.stack(imgs)
    info = {
        "mask": final_mask if mask_img is not None else None,
        "overlay_mask": overlay_mask,
        "crop_region": crop_region,
        "originals": [
            (im if isinstance(im, Image.Image) else Image.fromarray(np.asarray(im))).convert("RGB")
            for im in init_images],
    }
    return arr, info


def process_img2img(model: SDModel, p: GenerationParams,
                    outdir: str | None = None, callback=None,
                    step_callback=None) -> Processed:
    """img2img with per-request override_settings applied + auto-restored."""
    from sdwebui_tpu.pipeline import sd_unet as _sd_unet
    from sdwebui_tpu.utils.options import opts as _opts

    with _opts.override(p.override_settings):
        return _process_img2img(_sd_unet.resolve(model), p, outdir=outdir,
                                callback=callback,
                                step_callback=step_callback)


def _process_img2img(model: SDModel, p: GenerationParams,
                     outdir: str | None = None, callback=None,
                     step_callback=None) -> Processed:
    assert p.init_images is not None, "img2img requires init_images"
    from sdwebui_tpu.scripts.framework import (
        MaskBlendArgs, PostprocessBatchListArgs, PostprocessImageArgs,
        PostProcessMaskOverlayArgs, PostSampleArgs, get_runner)

    runner = get_runner()
    runner.setup_scripts(p)
    runner.before_process(p)
    from sdwebui_tpu.pipeline.processing import (_console_log_prompt,
                                                  _reset_ti_usage)
    _console_log_prompt("img2img", p)
    _reset_ti_usage(model)
    if p.denoising_strength is None:
        p.denoising_strength = 0.75
    _resolve_seeds(p)
    from sdwebui_tpu.pipeline.processing import _strip_prompt_comments

    _strip_prompt_comments(p)
    from sdwebui_tpu.networks import extra_networks

    clean_prompt, model, hypernet = extra_networks.activate(model, p.prompt)
    runner.after_extra_networks_activate(p)
    runner.process(p)
    if p.tiling:
        import dataclasses as _dc

        model = _dc.replace(
            model,
            unet_cfg=_dc.replace(model.unet_cfg, tiling=True),
            vae_cfg=_dc.replace(model.vae_cfg, tiling=True))
    from sdwebui_tpu.pipeline.processing import _apply_hypertile

    model = _apply_hypertile(model, kind="img2img")
    from sdwebui_tpu.pipeline.processing import (
        _apply_schedule_overrides, _resolve_scheduler, _skip_uncond_mask)

    model = _apply_schedule_overrides(model, p)
    sampler = get_sampler(p.sampler_name)
    scheduler = _resolve_scheduler(sampler, p.scheduler)
    spec = SOLVERS[sampler.solver]
    h, w = p.latent_size()
    c = model.latent_channels

    image_arr, mask_info = _prepare_images_and_mask(p)

    color_corrections = None
    from sdwebui_tpu.utils.options import opts as _opts

    if _opts.get("img2img_color_correction", False):
        from sdwebui_tpu.utils.color import setup_color_correction

        color_corrections = [setup_color_correction(im)
                             for im in mask_info["originals"]]
    if image_arr.shape[0] > p.batch_size:
        # multiple init images (API batch): batch matches the image count
        p.batch_size = image_arr.shape[0]
        _resolve_seeds(p)
    b = p.batch_size
    if image_arr.shape[0] == 1 and b > 1:
        image_arr = np.repeat(image_arr, b, axis=0)

    init_latent = encode_first_stage(model, jnp.asarray(image_arr))

    # latent mask (mask = keep weight; nmask = repaint weight)
    mask = nmask = None
    if mask_info["mask"] is not None:
        latmask_img = mask_info["mask"].convert("L").resize((w, h))
        latmask = np.asarray(latmask_img, np.float32) / 255.0
        if not p.soft_inpainting:   # soft inpainting keeps continuous masks
            latmask = np.around(latmask)
        nmask = jnp.asarray(latmask)[None, :, :, None]
        mask = 1.0 - nmask

        if p.inpainting_fill == 2:     # latent noise in repaint region
            fill_noise = np.stack([
                PhiloxGenerator(s).randn((c, h, w)).transpose(1, 2, 0)
                for s in p.all_seeds[:init_latent.shape[0]]])
            init_latent = init_latent * mask + jnp.asarray(fill_noise) * nmask
        elif p.inpainting_fill == 3:   # latent nothing
            init_latent = init_latent * mask

    # schedule: last t_enc+1 sigmas
    steps, t_enc = setup_img2img_steps(p.steps, p.denoising_strength)
    from sdwebui_tpu.sampling.registry import build_sigmas

    sigmas_full = build_sigmas(sampler, scheduler, steps, model.disc,
                               extra_params_out=p.extra_generation_params,
                               is_sdxl=model.is_sdxl)
    sigma_sched = sigmas_full[steps - t_enc - 1:]

    # instruct-pix2pix (8-channel UNet): unscaled init-latent conditioning
    c_concat = None
    edit_mode = model.unet_cfg.in_channels == 8
    if edit_mode:
        c_concat = init_latent / model.vae_cfg.scale_factor

    # inpainting-model image conditioning (9-channel UNet)
    if model.unet_cfg.in_channels == 9:
        if nmask is not None:
            mask_full = np.around(np.asarray(
                mask_info["mask"].convert("L").resize((p.width, p.height)),
                np.float32)[None, :, :, None] / 255.0)
            masked = encode_first_stage(
                model, jnp.asarray(image_arr * (1.0 - mask_full)))
            cond_mask = jnp.broadcast_to(nmask, (init_latent.shape[0], h, w, 1))
        else:
            cond_mask = jnp.zeros((init_latent.shape[0], h, w, 1))
            masked = init_latent
        c_concat = jnp.concatenate([cond_mask, masked], axis=-1)

    # depth2img (SD2-depth, 5ch hybrid UNet): MiDaS inverse depth of the
    # source image, min-max normalized to [-1,1] on the latent grid
    # (reference depth2img_image_conditioning, processing.py:304-321)
    if model.is_depth and model.unet_cfg.in_channels == 5:
        from sdwebui_tpu.models import midas

        c_concat = midas.depth_conditioning(
            model.depth_params, model.depth_cfg, jnp.asarray(image_arr),
            h, w)

    all_images, infotexts = [], []
    for n in range(p.n_iter):
        if callback is not None and callback("batch", n, None) is False:
            break
        lo = n * b
        seeds = p.all_seeds[lo: lo + b]
        subseeds = p.all_subseeds[lo: lo + b]
        runner.before_process_batch(p, batch_number=n, seeds=seeds)

        adm = None
        if model.is_unclip:     # image-derived adm (processing.py:328)
            from sdwebui_tpu.pipeline.sd_model import unclip_adm
            adm = unclip_adm(model, images=mask_info["originals"],
                             seed=p.all_seeds[0])
        sched = _build_conds(model, p, t_enc + 1, prompt=clean_prompt,
                             adm_vector=adm)
        runner.process_batch(p, batch_number=n, seeds=seeds)
        runner.process_before_every_sampling(p, batch_number=n)
        if c_concat is not None:
            sched.c_concat = c_concat
        if edit_mode and p.image_cfg_scale not in (None, 1.0):
            sched.image_cfg_scale = jnp.asarray(float(p.image_cfg_scale),
                                                jnp.float32)

        rng = create_rng((c, h, w), seeds, subseeds=subseeds,
                         subseed_strength=p.subseed_strength)
        if p.init_noise_override is not None:
            x = jnp.asarray(p.init_noise_override, jnp.float32)
        else:
            x = jnp.asarray(rng.first(), jnp.float32)
        if p.initial_noise_multiplier != 1.0:
            x = x * p.initial_noise_multiplier
        if model.disc.prediction_type == "flow":
            # rectified flow: x_t = σ·noise + (1−σ)·x0 (sd3_impls noise_scaling)
            s0 = float(sigma_sched[0])
            xi = s0 * x + (1.0 - s0) * init_latent
        else:
            xi = init_latent + x * float(sigma_sched[0])
        extra_noise = float(_opts.get("img2img_extra_noise", 0.0) or 0.0)
        if extra_noise > 0:
            # un-scheduled extra noise on top of the σ₀ injection (reference
            # sd_samplers_kdiffusion.py:145-150)
            p.extra_generation_params["Extra noise"] = extra_noise
            xi = xi + x * extra_noise

        extra = _solver_extra(p, sampler)
        if extra.get("s_churn"):
            import dataclasses as _dc_spec

            spec = _dc_spec.replace(
                spec, noises_per_step=max(spec.noises_per_step, 1))
        sched.skip_uncond = _skip_uncond_mask(sigma_sched, p)
        noise = prepare_noise(spec, len(sigma_sched) - 1, rng, (b, h, w, c))
        if p.soft_inpainting and nmask is not None:
            extra["soft_inpainting"] = (float(p.mask_blend_power),
                                        float(p.mask_blend_scale),
                                        float(p.inpaint_detail_preservation))
        if nmask is not None:
            # in-graph blend (sampling/cfg.py); fired once with the blend
            # inputs for hook parity (reference fires per step)
            runner.on_mask_blend(p, MaskBlendArgs(xi, nmask, init_latent,
                                                  mask))
        control, control_cfgs = (), ()
        if p.controlnet_units:
            from sdwebui_tpu.pipeline.control import prepare_controls

            control, control_cfgs = prepare_controls(
                p.controlnet_units, w * 8, h * 8, t_enc + 1,
                latent_channels=c,
                default_image=(p.init_images[0] if p.init_images else None))
        latents = sample_latents(model, sched, xi, sigma_sched, noise,
                                 sampler.solver, extra,
                                 mask=mask, nmask=nmask, init_latent=init_latent,
                                 hypernet=hypernet, step_callback=step_callback,
                                 control=control, control_cfgs=control_cfgs)
        if mask is not None and not p.soft_inpainting:
            latents = latents * nmask + init_latent * mask

        runner.post_sample(p, PostSampleArgs(latents))
        from sdwebui_tpu.pipeline.processing import decode_fetch_pils

        # u8 on-device decode quarters the tunnel fetch vs f32, and the
        # overlapped path hides the per-image transfers behind the decodes
        pils = decode_fetch_pils(model, latents)
        from sdwebui_tpu.pipeline.processing import _maybe_restore_faces

        runner.postprocess_batch(p, images=pils, batch_number=n)
        blist = PostprocessBatchListArgs(pils)
        runner.postprocess_batch_list(p, blist)
        pils = blist.images
        from sdwebui_tpu.pipeline.processing import save_extra_copies

        if p.restore_faces and _opts.get(
                "save_images_before_face_restoration", False):
            save_extra_copies(pils, p, model, outdir, seeds,
                              "-before-face-restoration", lo)
        pils = _maybe_restore_faces(p, pils)
        if color_corrections is not None:
            from sdwebui_tpu.utils.color import apply_color_correction

            if _opts.get("save_images_before_color_correction", False):
                save_extra_copies(pils, p, model, outdir, seeds,
                                  "-before-color-correction", lo)
            pils = [apply_color_correction(
                        color_corrections[min(idx, len(color_corrections) - 1)], img)
                    for idx, img in enumerate(pils)]
        pils = [runner.postprocess_image(p, img) for img in pils]
        if mask_info.get("mask") is not None:
            for idx in range(len(pils)):
                runner.postprocess_maskoverlay(p, PostProcessMaskOverlayArgs(
                    idx, mask_info.get("overlay_mask"),
                    mask_info.get("originals")))
        # reference processing.py:1096 original_denoised_image: the mask
        # composites are built from the PRE-overlay model output
        pre_overlay = list(pils)
        if _opts.get("overlay_inpaint", True):
            pils = [apply_overlay(p, img, mask_info, idx)
                    for idx, img in enumerate(pils)]
        for idx in range(len(pils)):
            ppi = PostprocessImageArgs(pils[idx], idx)
            runner.postprocess_image_after_composite(p, ppi)
            pils[idx] = ppi.image

        # inpainting mask copies (reference processing.py:1086-1090)
        if mask_info.get("mask") is not None and outdir \
                and not p.do_not_save_samples:
            from PIL import Image as PILImage

            mask_l = mask_info["mask"].convert("L")
            if _opts.get("save_mask", False):
                save_extra_copies([mask_l] * len(pils), p, model, outdir,
                                  seeds, "-mask", lo)
            if _opts.get("save_mask_composite", False):
                comps = [PILImage.composite(
                    img.convert("RGBA").convert("RGBa"),
                    PILImage.new("RGBa", img.size),
                    mask_l.resize(img.size)).convert("RGBA")
                    for img in pre_overlay]
                save_extra_copies(comps, p, model, outdir, seeds,
                                  "-mask-composite", lo)

        for i, img in enumerate(pils):
            info = create_infotext(p, model, lo + i,
                                   extra={"Denoising strength": p.denoising_strength})
            infotexts.append(info)
            if _opts.get("samples_log_stdout", False):
                print(info, flush=True)   # reference shared_options system
            if should_save_samples(p, outdir):
                p.batch_index, p.iteration = i, n
                p.sd_model_name, p.sd_model_hash = model.title, model.sha256[:10]
                images_util.save_image(img, outdir, seed=seeds[i],
                                       prompt=p.all_prompts[lo + i], info=info,
                                       p=p)
        all_images.extend(pils)

        # return_mask/return_mask_composite: masks appended to the result
        # gallery (reference processing.py return_mask block)
        if mask_info.get("mask") is not None and \
                (_opts.get("return_mask", False)
                 or _opts.get("return_mask_composite", False)):
            from PIL import Image as PILImage

            mask_l = mask_info["mask"].convert("L")
            for idx in range(len(pils)):
                if _opts.get("return_mask", False):
                    all_images.append(mask_l.convert("RGB"))
                    infotexts.append(infotexts[-1] if infotexts else "")
                if _opts.get("return_mask_composite", False):
                    img = pre_overlay[idx]
                    all_images.append(PILImage.composite(
                        img.convert("RGBA").convert("RGBa"),
                        PILImage.new("RGBa", img.size),
                        mask_l.resize(img.size)).convert("RGBA"))
                    infotexts.append(infotexts[-1] if infotexts else "")
        if callback is not None:
            callback("batch_done", n, pils)

    from sdwebui_tpu.pipeline.processing import apply_grid_stage

    first_idx = apply_grid_stage(all_images, infotexts, p, model)
    res = Processed(images=all_images, params=p, seed=p.all_seeds[0],
                    subseed=p.all_subseeds[0], infotexts=infotexts,
                    all_seeds=p.all_seeds, all_subseeds=p.all_subseeds,
                    all_prompts=p.all_prompts, width=p.width, height=p.height,
                    index_of_first_image=first_idx,
                    sd_model_name=(model.title or "").split(" [")[0],
                    sd_model_hash=model.sha256[:10] if model.sha256 else "")
    runner.postprocess(p, res)
    return res


def apply_overlay(p: GenerationParams, img: Image.Image, mask_info: dict,
                  index: int) -> Image.Image:
    """Paste the generated region back over the original (inpaint-full-res)
    and composite outside the blurred mask (reference apply_overlay)."""
    if mask_info.get("mask") is None or mask_info.get("originals") is None:
        return img
    original = mask_info["originals"][min(index, len(mask_info["originals"]) - 1)].copy()
    overlay_mask = mask_info["overlay_mask"]

    if mask_info["crop_region"] is not None:
        x1, y1, x2, y2 = mask_info["crop_region"]
        img = img.resize((x2 - x1, y2 - y1))
        original.paste(
            Image.composite(img, original.crop(mask_info["crop_region"]),
                            overlay_mask.crop(mask_info["crop_region"]).resize(img.size)),
            (x1, y1))
        return original

    original = original.resize(img.size)
    return Image.composite(img, original, overlay_mask.resize(img.size))
