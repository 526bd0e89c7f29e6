"""Server application state: model lifecycle + generation entry points.

Replaces the reference's shared.* singleton web (SdModelData lazy loading,
modules/sd_models.py:676; queue_lock, modules/call_queue.py): one Engine
object owns the checkpoint registry, the loaded SDModel, the FIFO lock
serializing device work, options and job state."""

from __future__ import annotations

import base64
import io
import os
import threading

from PIL import Image

from sdwebui_tpu.loader.registry import CheckpointRegistry
from sdwebui_tpu.pipeline.params import GenerationParams
from sdwebui_tpu.pipeline.sd_model import SDModel, create_tiny_sd
from sdwebui_tpu.runtime.state import state
from sdwebui_tpu.utils.options import opts


class Engine:
    def __init__(self, model_dirs=None, ckpt: str | None = None,
                 outdir: str = "outputs", test_model: bool = False):
        from sdwebui_tpu.utils.timer import startup_timer as _st

        self.model_dirs = model_dirs or ["models/Stable-diffusion"]
        self.registry = CheckpointRegistry(self.model_dirs,
                                           cache_path="cache.json")
        _st.record("create engine/list SD models")
        self.queue_lock = threading.Lock()
        self.outdir = outdir
        self.state = state
        self.opts = opts
        self._model: SDModel | None = None
        self._model_lock = threading.Lock()
        self._requested_ckpt = ckpt
        self._test_model = test_model
        from sdwebui_tpu.text.styles import get_style_database

        self.styles = get_style_database()
        from sdwebui_tpu.models.dat import register_dat_dir
        from sdwebui_tpu.models.esrgan import register_esrgan_dir
        from sdwebui_tpu.models.hat import register_hat_dir
        from sdwebui_tpu.models.ldsr import register_ldsr_dir
        from sdwebui_tpu.models.scunet import register_scunet_dir
        from sdwebui_tpu.models.swinir import register_swinir_dir

        register_esrgan_dir()  # models/ESRGAN, models/RealESRGAN
        register_swinir_dir()  # models/SwinIR
        register_scunet_dir()  # models/ScuNET
        register_ldsr_dir()    # models/LDSR
        register_hat_dir()     # models/HAT
        register_dat_dir()     # models/DAT
        _st.record("create engine/list upscalers")

        # third-party extensions: scripts execute only with --allow-code /
        # enable_extension_scripts consent (sdwebui_tpu/extensions.py);
        # declarative assets (styles.csv) always load — per-extension
        # embeddings load once a model is attached (load_extension_assets)
        from sdwebui_tpu.extensions import load_extension_scripts

        self.extension_scripts = load_extension_scripts()
        _st.record("create engine/load extensions")

    def apply_styles(self, p: GenerationParams):
        if p.styles:
            p.prompt, p.negative_prompt = self.styles.apply(
                p.prompt, p.negative_prompt, p.styles)

    def _apply_runtime_opts(self):
        """Push live settings into the loaded model's conditioners / ops
        (the reference reads shared.opts inside the hijacks; we apply
        explicitly per generation)."""
        from sdwebui_tpu.ops.attention import set_attention_impl

        model = self.sd_model
        for cond in (model.conditioner, model.conditioner2):
            if cond is None:
                continue
            cond.emphasis = opts.get("emphasis", "Original") \
                if opts.get("enable_emphasis", True) else "None"
            cond.comma_padding_backtrack = opts.get("comma_padding_backtrack", 20)
        impl = opts.get("cross_attention_optimization", "Automatic")
        set_attention_impl(None if impl == "Automatic" else impl)
        # opts.show_warnings: surface Python warnings in the console
        # (reference initialize_util.configure_opts_onchange equivalent)
        import warnings

        warnings.simplefilter(
            "default" if opts.get("show_warnings", False) else "ignore")
        self._apply_fp8_storage(model)

    def _apply_fp8_storage(self, model):
        """opts.fp8_storage: keep UNet conv/linear weights as float8 in HBM
        (reference modules/sd_models.py fp8 path; TPU-native: the forward
        upcasts inside jit, halving weight residency).  Enabling converts in
        place; disabling restores from the cache_fp16_weight host copies
        when present, else upcasts the quantized values (lossy, as the
        reference without a checkpoint reload)."""
        import jax.numpy as jnp

        mode = opts.get("fp8_storage", "Disable")
        want = mode == "Enable" or (mode == "Enable for SDXL"
                                    and model.is_sdxl)
        from sdwebui_tpu.utils.pytree import flatten

        has_fp8 = any(getattr(w, "dtype", None) == jnp.float8_e4m3fn
                      for w in flatten(model.unet_params).values())
        if want == has_fp8:
            return
        from sdwebui_tpu.networks import extra_networks
        from sdwebui_tpu.pipeline.sd_model import (dequantize_unet_fp8,
                                                   quantize_unet_fp8)

        with self._model_lock:
            if want:
                self._model = quantize_unet_fp8(
                    model, keep_hp=bool(opts.get("cache_fp16_weight", False)))
            else:
                self._model = dequantize_unet_fp8(model)
        extra_networks._merge_cache.clear()

    # ---- model lifecycle ----------------------------------------------

    @property
    def sd_model(self) -> SDModel:
        loaded = False
        with self._model_lock:
            if self._model is None:
                self._model = self._load_initial()
                self._attach_embeddings(self._model)
                loaded = True
        if loaded:
            # outside the lock: load_extension_assets reads engine.sd_model
            from sdwebui_tpu.extensions import load_extension_assets

            load_extension_assets(self)
        return self._model

    def _attach_embeddings(self, model: SDModel, dirpath: str = "embeddings"):
        from sdwebui_tpu.networks.textual_inversion import EmbeddingDatabase

        params = getattr(model.conditioner, "params", None)
        if not isinstance(params, dict) or "embeddings" not in params:
            return   # non-CLIP conditioner (AltDiffusion XLM-R): no TI
        dim = int(params["embeddings"]["token_embedding"]["weight"].shape[1])
        db = EmbeddingDatabase(model.conditioner.tokenizer, expected_dim=dim)
        db.load_from_dir(dirpath)
        model.conditioner.embedding_db = db
        if model.conditioner2 is not None:
            model.conditioner2.embedding_db = db

    def _load_checkpoint_file(self, path: str, title=None, sha256=""):
        """load + per-checkpoint VAE resolution (reference sd_vae chain)."""
        from sdwebui_tpu.loader.load import (load_external_vae, load_model,
                                             resolve_vae)

        model = load_model(path, title=title, sha256=sha256)
        # hidden option mirroring the loaded hash (reference
        # shared_options sd_checkpoint_hash, fed to infotext consumers)
        opts.data["sd_checkpoint_hash"] = model.sha256 or sha256 or ""
        # keep the embedded VAE so a live sd_vae switch can restore it
        self._embedded_vae = (model.vae_params, model.vae_cfg)
        self._ckpt_path = path
        vae_path = resolve_vae(path)
        self._vae_key = vae_path or "embedded"
        if vae_path:
            import dataclasses as _dc

            tree, cfg = load_external_vae(
                vae_path, scale_factor=model.vae_cfg.scale_factor)
            model = _dc.replace(model, vae_params=tree, vae_cfg=cfg)
        return model

    def _load_initial(self) -> SDModel:
        if self._test_model:
            return create_tiny_sd()
        info = None
        if self._requested_ckpt:
            if os.path.exists(self._requested_ckpt):
                self._model_key = os.path.basename(self._requested_ckpt)
                return self._load_checkpoint_file(self._requested_ckpt)
            info = self.registry.find(self._requested_ckpt)
        info = info or self.registry.find(opts.get("sd_model_checkpoint"))
        if info is None:
            # reference CI mode: no checkpoint → random-weight test model
            return create_tiny_sd()
        self._model_key = info.name
        return self._load_checkpoint_file(
            info.filename, title=info.name,
            sha256=info.calculate_sha256("cache.json"))

    def reload_checkpoint(self, name: str | None = None):
        """Swap checkpoints; up to opts.sd_checkpoints_limit models stay
        resident (reference reuse_model_from_already_loaded,
        modules/sd_models.py:878)."""
        with self._model_lock:
            info = self.registry.find(name or opts.get("sd_model_checkpoint"))
            if info is None:
                raise ValueError(f"checkpoint not found: {name}")
            if not hasattr(self, "_model_cache"):
                self._model_cache = {}
            # key by registry name, NOT model.title (titles carry a
            # " [hash]" suffix that find() names don't)
            if self._model is not None:
                prev_key = getattr(self, "_model_key", None) or \
                    getattr(self._model, "title", "")
                prev = self._model
                if bool(opts.get("sd_checkpoints_keep_in_cpu", True)):
                    # reference default: the displaced model parks in host
                    # RAM, freeing HBM; False keeps it device-resident for
                    # instant swap-back (sd_checkpoints_limit permitting)
                    try:
                        prev = prev.park_to_host()
                    except Exception:
                        pass
                self._model_cache[prev_key] = prev
            if info.name in self._model_cache:
                self._model = self._model_cache.pop(info.name)
            else:
                self._model = self._load_checkpoint_file(
                    info.filename, title=info.name,
                    sha256=info.calculate_sha256("cache.json"))
            self._model_key = info.name
            limit = max(int(opts.get("sd_checkpoints_limit", 1)) - 1, 0)
            while len(self._model_cache) > limit:
                self._model_cache.pop(next(iter(self._model_cache)))

    def unload_checkpoint(self):
        with self._model_lock:
            self._model = None

    # ---- generation ----------------------------------------------------

    def _maybe_switch_checkpoint(self, p: GenerationParams):
        """Per-request checkpoint via override_settings.sd_model_checkpoint
        (reference override semantics; the current model is restored on the
        NEXT request without the override, via the residency cache)."""
        want = (p.override_settings or {}).get("sd_model_checkpoint")
        if not want:
            return
        if getattr(self, "_model_key", None) == want:
            return
        if self.registry.find(want) is not None:
            self.reload_checkpoint(want)

    def _maybe_switch_vae(self, p: GenerationParams):
        """Live VAE selection (reference modules/sd_vae.py reload_vae_weights
        + per-request override_settings.sd_vae; drives the XYZ VAE axis).
        Re-resolves the sd_vae chain and swaps the model's VAE params; the
        checkpoint's embedded VAE is kept for restoring on 'None'."""
        if self._model is None:
            return     # resolution happens at first load
        want = (p.override_settings or {}).get(
            "sd_vae", opts.get("sd_vae", "Automatic"))
        from sdwebui_tpu.loader.load import load_external_vae, resolve_vae

        if not hasattr(self, "_embedded_vae"):
            self._embedded_vae = (self._model.vae_params, self._model.vae_cfg)
            self._vae_key = "embedded"
        with opts.override({"sd_vae": want}):
            path = resolve_vae(getattr(self, "_ckpt_path", "") or "")
        key = path or "embedded"
        if key == getattr(self, "_vae_key", "embedded"):
            return
        import dataclasses as _dc

        if path is None:
            params, cfg = self._embedded_vae
            self._model = _dc.replace(self._model, vae_params=params,
                                      vae_cfg=cfg)
        else:
            tree, cfg = load_external_vae(
                path, scale_factor=self._model.vae_cfg.scale_factor)
            self._model = _dc.replace(self._model, vae_params=tree,
                                      vae_cfg=cfg)
        self._vae_key = key

    def _resolve_outdirs(self, which: str) -> tuple[str, str]:
        """Sample/grid output dirs for `which` in {txt2img, img2img}:
        opts.outdir_samples / outdir_grids override everything (reference
        shared_options 'saving-paths'), then the per-kind outdir_*_samples /
        outdir_*_grids options, falling back to <--outdir>/<kind>-images
        when the option still carries its reference default."""
        from sdwebui_tpu.utils.options import opts

        def pick(override_key, specific_key, kind_dir):
            v = opts.get(override_key, "") or opts.get(specific_key, "")
            tpl = opts.data_labels.get(specific_key)
            default = tpl.default if tpl is not None else f"outputs/{kind_dir}"
            if v and v != default:
                return v
            return os.path.join(self.outdir, kind_dir)

        samples = pick("outdir_samples", f"outdir_{which}_samples",
                       f"{which}-images")
        grids = pick("outdir_grids", f"outdir_{which}_grids",
                     f"{which}-grids")
        return samples, grids

    def _apply_save_flags(self, p: GenerationParams, save: bool,
                          which: str) -> str | None:
        """reference modules/api/api.py txt2imgapi: save_images drives both
        do_not_save_samples and do_not_save_grid; outpath_grids is set from
        the saving-paths options."""
        if not save:
            p.do_not_save_grid = True
            return None
        samples, grids = self._resolve_outdirs(which)
        p.outpath_grids = grids
        return samples

    def txt2img(self, p: GenerationParams, save: bool = False):
        from sdwebui_tpu.pipeline.processing import process_txt2img

        self.apply_styles(p)
        self._maybe_switch_checkpoint(p)
        self._maybe_switch_vae(p)
        self._apply_runtime_opts()
        with self.queue_lock:
            state.begin("txt2img")
            state.job_count = p.n_iter
            try:
                outdir = self._apply_save_flags(p, save, "txt2img")
                refiner = self._resolve_refiner(p)
                from sdwebui_tpu.utils.profiling import profile

                with profile(bool(opts.get("profiling_enable", False)),
                             outdir=os.path.dirname(
                                 opts.get("profiling_filename",
                                          "trace.json")) or "profile-traces"):
                    return process_txt2img(
                        self.sd_model, p, outdir=outdir,
                        callback=self._batch_callback,
                        refiner_model=refiner,
                        step_callback=self._make_step_callback())
            finally:
                state.end()

    def _resolve_refiner(self, p: GenerationParams):
        """Secondary checkpoint residency (reference
        reuse_model_from_already_loaded, modules/sd_models.py:878)."""
        if not p.refiner_checkpoint or not (0 < p.refiner_switch_at < 1):
            return None
        if not hasattr(self, "_extra_models"):
            self._extra_models = {}
        if p.refiner_checkpoint in self._extra_models:
            return self._extra_models[p.refiner_checkpoint]
        info = self.registry.find(p.refiner_checkpoint)
        if info is None:
            raise ValueError(f"refiner checkpoint not found: {p.refiner_checkpoint}")
        from sdwebui_tpu.loader.load import load_model

        m = load_model(info.filename, title=info.name)
        if len(self._extra_models) >= 2:
            self._extra_models.clear()
        self._extra_models[p.refiner_checkpoint] = m
        return m

    def img2img(self, p: GenerationParams, save: bool = False):
        from sdwebui_tpu.pipeline.img2img import process_img2img

        self.apply_styles(p)
        self._maybe_switch_checkpoint(p)
        self._maybe_switch_vae(p)
        self._apply_runtime_opts()
        with self.queue_lock:
            state.begin("img2img")
            state.job_count = p.n_iter
            try:
                outdir = self._apply_save_flags(p, save, "img2img")
                return process_img2img(self.sd_model, p, outdir=outdir,
                                       callback=self._batch_callback,
                                       step_callback=self._make_step_callback())
            finally:
                state.end()

    # inner entry points for scripts (no queue-lock re-entry, no state reset)
    def txt2img_inner(self, p: GenerationParams):
        from sdwebui_tpu.pipeline.processing import process_txt2img

        self._maybe_switch_checkpoint(p)
        return process_txt2img(self.sd_model, p,
                               refiner_model=self._resolve_refiner(p))

    def img2img_inner(self, p: GenerationParams):
        from sdwebui_tpu.pipeline.img2img import process_img2img

        self._maybe_switch_checkpoint(p)
        return process_img2img(self.sd_model, p)

    def run_script(self, script_name: str, p: GenerationParams,
                   script_args: list):
        import sdwebui_tpu.scripts.builtin  # noqa: F401  (registers scripts)
        from sdwebui_tpu.scripts.framework import (get_script,
                                                   validate_script_args)

        script = get_script(script_name)
        if script is None:
            raise ValueError(f"unknown script {script_name!r}")
        validate_script_args(script, script_args)
        with self.queue_lock:
            state.begin(f"script:{script_name}")
            try:
                return script.run(self, p, *script_args)
            finally:
                state.end()

    def _make_step_callback(self):
        """Per-step hook (stepwise sampling): progress numbers, mid-run
        interrupt/skip, cheap live previews (reference store_latent +
        shared.state flow). Returns None when previews are disabled so the
        fused single-program scan path is used instead."""
        if not opts.get("live_previews_enable", True):
            return None
        every = int(opts.get("show_progress_every_n_steps", 10))
        ptype = opts.get("show_progress_type", "Approx NN")
        show_grid = bool(opts.get("show_progress_grid", True))
        model = self.sd_model
        from sdwebui_tpu.utils.images import image_grid, tensor_to_pil

        def to_rgb(latents):
            """Sampler-space latents → float RGB in [0,1] per
            opts.show_progress_type (reference sd_samplers_common.py:37
            samples_to_images_tensor modes).  Every approximator takes the
            sampler-space latent directly, like the reference; 'Approx NN'
            falls back to the cheap matrix when no VAE-approx weights are
            present, 'TAESD' likewise."""
            if ptype == "Full":
                from sdwebui_tpu.pipeline.processing import decode_first_stage

                return decode_first_stage(model, latents)  # already [0,1]
            from sdwebui_tpu.models.vae_approx import approx_decode

            return approx_decode(model.kind, ptype, latents)

        def cb(i, n, latents):
            state.sampling_step = i + 1
            state.sampling_steps = n
            from sdwebui_tpu.runtime import console

            console.update(i + 1, n, state.job_no, state.job_count)
            if state.interrupted or state.skipped:
                state.skipped = False
                return False
            if every > 0 and (i + 1) % every == 0:
                try:
                    import numpy as _np

                    pils = tensor_to_pil(_np.asarray(to_rgb(latents)))
                    if show_grid and len(pils) > 1:
                        state.set_current_image(image_grid(pils))
                    else:
                        state.set_current_image(pils[0])
                except Exception:
                    pass
            return True

        return cb

    def _batch_callback(self, kind, n, images):
        if kind == "batch":
            if state.interrupted or state.stopping_generation:
                return False
            state.job_no = n
        elif kind == "batch_done" and images:
            state.set_current_image(images[-1])
        return True


# ---- base64 image codecs (reference modules/api/api.py:77-132) -----------

def decode_base64_to_image(encoding: str) -> Image.Image:
    if encoding.startswith(("http://", "https://")):
        # reference decode_base64_to_image (modules/api/api.py:85-108):
        # URLs are fetched when opts.api_enable_requests, with
        # opts.api_useragent as the request UA
        from sdwebui_tpu.utils.options import opts

        if not opts.get("api_enable_requests", True):
            raise ValueError("Requests not allowed (api_enable_requests off)")
        import urllib.request

        headers = {}
        ua = opts.get("api_useragent", "")
        if ua:
            headers["User-Agent"] = ua
        req = urllib.request.Request(encoding, headers=headers)
        with urllib.request.urlopen(req, timeout=30) as resp:
            return Image.open(io.BytesIO(resp.read()))
    if encoding.startswith("data:image/"):
        encoding = encoding.split(";", 1)[1].split(",", 1)[1]
    return Image.open(io.BytesIO(base64.b64decode(encoding)))


def encode_pil_to_base64(image: Image.Image, fmt: str = "png",
                         info: str | None = None) -> str:
    buf = io.BytesIO()
    if fmt == "png":
        from PIL import PngImagePlugin

        pnginfo = PngImagePlugin.PngInfo()
        if info:
            pnginfo.add_text("parameters", info)
        image.save(buf, format="PNG", pnginfo=pnginfo)
    else:
        image.save(buf, format=fmt.upper())
    return base64.b64encode(buf.getvalue()).decode("ascii")
