"""Reference option inventory — the remainder of the webui's 282-option
settings surface (modules/shared_options.py) not already covered by the
TPU-specific templates in utils/options.py.

Names, defaults, and labels mirror the reference so config.json files and
`/sdapi/v1/options` clients carry over unchanged.  Entries here are plain
data (name, default, label) grouped by the reference's section keys; options
with engine behavior behind them graduate into utils/options.py's typed
templates as features consume them.

What remains after the round-2 graduations is almost entirely
environment-specific no-ops with no TPU/stdlib-server counterpart:
torch memory/precision knobs (pin_memory, cache_fp16_weight, fp8_storage,
upcast/autocast variants already subsumed by the bf16+fp32-islands dtype
policy), gradio-frontend plumbing (js_modal_lightbox*, gradio_theme,
compact_prompt_box, accordion toggles), console-noise toggles
(multiple_tqdm, hide_ldm_prints, enable_upscale_progressbar — tiles run as
ONE batched device call here, there is no per-tile loop to report), and
torch-DataLoader training knobs (pin_memory, unload_models_when_training —
params are HBM-resident by design).  pad_cond_uncond* are structurally
always-on: the fused CFG batch requires equal cond/uncond chunk counts, so
the conditioner always pads (reference behavior with pad_cond_uncond=True).
no_dpmpp_sde_batch_determinism is likewise N/A: per-image Philox streams
make SDE noise batch-size-invariant (the reference's enable_batch_seeds=True
behavior) by construction.
"""

REFERENCE_OPTIONS = [
    (("saving-images", "Saving images/grids"), [
        ('temp_dir', '', 'Directory for temporary images; leave empty for default'),
        ('clean_temp_dir_at_start', False, 'Cleanup non-default temporary directory when starting webui'),
    ]),
    (("saving-paths", "Paths for saving"), [
    ]),
    (("saving-to-dirs", "Saving to a directory"), [
    ]),
    (("upscaling", "Upscaling"), [
        ('realesrgan_enabled_models', ['R-ESRGAN 4x+', 'R-ESRGAN 4x+ Anime6B'], 'Select which Real-ESRGAN models to show in the web UI.'),
        ('dat_enabled_models', ['DAT x2', 'DAT x3', 'DAT x4'], 'Select which DAT models to show in the web UI.'),
        ('set_scale_by_when_changing_upscaler', False, 'Automatically set the Scale by factor based on the name of the selected Upscaler.'),
    ]),
    (("system", "System"), [
        ('auto_launch_browser', 'Local', 'Automatically open webui in browser on startup'),
        ('show_warnings', False, 'Show warnings in console.'),
        ('show_gradio_deprecation_warnings', True, 'Show gradio deprecation warnings in console.'),
        ('memmon_poll_rate', 8, 'VRAM usage polls per second during generation.'),
        ('multiple_tqdm', True, 'Add a second progress bar to the console that shows progress for an entire job.'),
        ('enable_upscale_progressbar', True, 'Show a progress bar in the console for tiled upscaling.'),
        ('hide_ldm_prints', True, "Prevent Stability-AI's ldm/sgm modules from printing noise to console."),
    ]),
    (("profiler", "Profiler"), [
        ('profiling_explanation', '\nThose settings allow you to enable torch profiler when generating pictures.\nProfiling allows you to see which code uses how much of computer\'s resources during generation.\nEach generation writes its own profile to one file, overwriting previous.\nThe file can be viewed in <a href="chrome:tracing">Chrome</a>, or on a <a href="https://ui.perfetto.dev/">Perfetto</a> web site.\nWarning: writing profile can take a lot of time, up to 30 seconds, and the file itelf can be around 500MB in size.\n', 'profiling_explanation'),
        ('profiling_activities', ['CPU'], 'Activities'),
        ('profiling_record_shapes', True, 'Record shapes'),
        ('profiling_profile_memory', True, 'Profile memory'),
        ('profiling_with_stack', True, 'Include python stack'),
    ]),
    (("API", "API"), [
        ('api_useragent', '', 'User agent for requests'),
    ]),
    (("training", "Training"), [
        ('unload_models_when_training', False, 'Move VAE and CLIP to RAM when training if possible. Saves VRAM.'),
        ('pin_memory', False, 'Turn on pin_memory for DataLoader. Makes training slightly faster but can increase memory usage.'),
        ('training_image_repeats_per_epoch', 1, 'Number of repeats for a single input image per epoch; used only for displaying epoch number'),
        ('training_xattention_optimizations', False, 'Use cross attention optimizations while training'),
        ('training_enable_tensorboard', False, 'Enable tensorboard logging.'),
        ('training_tensorboard_save_images', False, 'Save generated images within tensorboard.'),
        ('training_tensorboard_flush_every', 120, 'How often, in seconds, to flush the pending tensorboard events and summaries to disk.'),
    ]),
    (("sd", "Stable Diffusion"), [
        ('sd_checkpoints_keep_in_cpu', True, 'Only keep one model on device'),
        ('sd_unet', 'Automatic', 'SD Unet'),
        ('enable_batch_seeds', True, 'Make K-diffusion samplers produce same images in a batch as when making a single image'),
    ]),
    (("sdxl", "Stable Diffusion XL"), [
    ]),
    (("vae", "VAE"), [
        ('sd_vae_explanation', "\n<abbr title='Variational autoencoder'>VAE</abbr> is a neural network that transforms a standard <abbr title='red/green/blue'>RGB</abbr>\nimage into latent space representation and back. Latent space representation is what stable diffusion is working on during sampling\n(i.e. when the progress bar is between empty and full). For txt2img, VAE is used to create a resulting image after the sampling is finished.\nFor img2img, VAE is used to process user's input image before the sampling, and to create an image after sampling.\n", 'sd_vae_explanation'),
        ('auto_vae_precision_bfloat16', False, 'Automatically convert VAE to bfloat16'),
    ]),
    (("img2img", "img2img"), [
    ]),
    (("optimizations", "Optimizations"), [
        ('pad_cond_uncond', False, 'Pad prompt/negative prompt'),
        ('pad_cond_uncond_v0', False, 'Pad prompt/negative prompt (v0)'),
        ('fp8_storage', 'Disable', 'FP8 weight'),
        ('cache_fp16_weight', False, 'Cache FP16 weight for LoRA'),
    ]),
    (("compatibility", "Compatibility"), [
        ('use_old_emphasis_implementation', False, 'Use old emphasis implementation. Can be useful to reproduce old seeds.'),
        ('no_dpmpp_sde_batch_determinism', False, 'Do not make DPM++ SDE deterministic across different batch sizes.'),
    ]),
    (("interrogate", "Interrogate"), [
    ]),
    (("extra_networks", "Extra Networks"), [
        ('extra_networks_show_hidden_directories', True, 'Show hidden directories'),
        ('extra_networks_dir_button_function', False, "Add a '/' to the beginning of directory buttons"),
        ('extra_networks_hidden_models', 'When searched', 'Show cards for models in hidden directories'),
        ('extra_networks_card_description_is_html', False, 'Treat card description as HTML'),
        ('extra_networks_tree_view_style', 'Dirs', 'Extra Networks directory view style'),
        ('extra_networks_tree_view_default_enabled', True, 'Show the Extra Networks directory view by default'),
        ('extra_networks_tree_view_default_width', 180, 'Default width for the Extra Networks directory tree view'),
        ('ui_extra_networks_tab_reorder', '', 'Extra networks tab order'),
    ]),
    (("ui_prompt_editing", "Prompt editing"), [
        ('keyedit_precision_extra', 0.05, 'Precision for <extra networks:0.9> when editing the prompt with Ctrl+up/down'),
        ('keyedit_delimiters_whitespace', ['Tab', 'Carriage Return', 'Line Feed'], 'Ctrl+up/down whitespace delimiters'),
    ]),
    (("ui_gallery", "Gallery"), [
        ('js_modal_lightbox', True, 'Full page image viewer: enable'),
        ('js_modal_lightbox_initially_zoomed', True, 'Full page image viewer: show images zoomed in by default'),
        ('js_modal_lightbox_gamepad', False, 'Full page image viewer: navigate with gamepad'),
        ('js_modal_lightbox_gamepad_repeat', 250, 'Full page image viewer: gamepad repeat period'),
        ('sd_webui_modal_lightbox_icon_opacity', 1, 'Full page image viewer: control icon unfocused opacity'),
        ('sd_webui_modal_lightbox_toolbar_opacity', 0.9, 'Full page image viewer: tool bar opacity'),
        ('open_dir_button_choice', 'Subdirectory', 'What directory the [📂] button opens'),
    ]),
    (("ui_alternatives", "UI alternatives"), [
        ('compact_prompt_box', False, 'Compact prompt layout'),
        ('samplers_in_dropdown', True, 'Use dropdown for sampler selection instead of radio group'),
        ('dimensions_and_batch_together', True, 'Show Width/Height and Batch sliders in same row'),
        ('sd_checkpoint_dropdown_use_short', False, 'Checkpoint dropdown: use filenames without paths'),
        ('txt2img_settings_accordion', False, 'Settings in txt2img hidden under Accordion'),
        ('img2img_settings_accordion', False, 'Settings in img2img hidden under Accordion'),
    ]),
    (("ui", "User interface"), [
        ('ui_reorder_list', [], 'UI item order for txt2img/img2img tabs'),
        ('gradio_theme', 'Default', 'Gradio theme'),
        ('gradio_themes_cache', True, 'Cache gradio themes locally'),
        ('enable_reloading_ui_scripts', False, 'Reload UI scripts when using Reload UI option'),
    ]),
    (("infotext", "Infotext"), [
        ('infotext_explanation', '\nInfotext is what this software calls the text that contains generation parameters and can be used to generate the same picture again.\nIt is displayed in UI below the image. To use infotext, paste it into the prompt and click the ↙️ paste button.\n', 'infotext_explanation'),
    ]),
    (("ui", "Live previews"), [
        ('live_preview_allow_lowvram_full', False, 'Allow Full live preview method with lowvram/medvram'),
        ('js_live_preview_in_modal_lightbox', False, 'Show Live preview in full page image viewer'),
    ]),
    (("sampler-params", "Sampler parameters"), [
    ]),
    (("postprocessing", "Postprocessing"), [
        ('postprocessing_enable_in_main_ui', [], 'Enable postprocessing operations in txt2img and img2img tabs'),
    ]),
    (("None", "Hidden options"), [
        ('sd_checkpoint_hash', '', 'SHA256 hash of the current checkpoint'),
    ]),
]
