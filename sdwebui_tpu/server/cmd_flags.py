"""Reference CLI flag inventory (modules/cmd_args.py, ~120 flags).

Accepted for drop-in compatibility with launch scripts and wrappers written
for the reference.  Flags with TPU-native behavior are wired in
server/__main__.py (host/port/api/auth/paths/test mode); CUDA-/torch-
specific tuning flags (vram modes, attention-implementation switches,
xformers...) parse cleanly and surface via /sdapi/v1/cmd-flags but are
no-ops on this runtime — the equivalents are dtype policy + Pallas flash
attention, always on.
"""

# (flag, is_store_true, type, default, help) — reference modules/cmd_args.py inventory
REFERENCE_FLAGS = [
    ('--update-all-extensions', True, '', None, 'launch.py argument: download updates for all extensions when starting the program'),
    ('--skip-python-version-check', True, '', None, 'launch.py argument: do not check python version'),
    ('--skip-torch-cuda-test', True, '', None, 'launch.py argument: do not check if CUDA is able to work properly'),
    ('--reinstall-xformers', True, '', None, 'launch.py argument: install the appropriate version of xformers even if you have some v...'),
    ('--reinstall-torch', True, '', None, 'launch.py argument: install the appropriate version of torch even if you have some vers...'),
    ('--update-check', True, '', None, 'launch.py argument: check for updates at startup'),
    ('--test-server', True, '', None, 'launch.py argument: configure server for testing'),
    ('--log-startup', True, '', None, "launch.py argument: print a detailed log of what's happening at startup"),
    ('--skip-prepare-environment', True, '', None, 'launch.py argument: skip all environment preparation'),
    ('--skip-install', True, '', None, 'launch.py argument: skip installation of packages'),
    ('--dump-sysinfo', True, '', None, 'launch.py argument: dump limited sysinfo file (without information about extensions, op...'),
    ('--loglevel', False, '', None, 'log level; one of: CRITICAL, ERROR, WARNING, INFO, DEBUG'),
    ('--do-not-download-clip', True, '', None, "do not download CLIP model even if it's not included in the checkpoint"),
    ('--data-dir', False, '', None, 'base path where all user data is stored'),
    ('--models-dir', False, '', None, 'base path where models are stored; overrides --data-dir'),
    ('--config', False, '', None, 'path to config which constructs model'),
    ('--ckpt', False, '', None, 'path to checkpoint of stable diffusion model; if specified, this checkpoint will be add...'),
    ('--ckpt-dir', False, '', None, 'Path to directory with stable diffusion checkpoints'),
    ('--vae-dir', False, '', None, 'Path to directory with VAE files'),
    ('--gfpgan-dir', False, '', None, 'GFPGAN directory'),
    ('--gfpgan-model', False, '', None, 'GFPGAN model file name'),
    ('--no-half', True, '', None, 'do not switch the model to 16-bit floats'),
    ('--no-half-vae', True, '', None, 'do not switch the VAE model to 16-bit floats'),
    ('--no-progressbar-hiding', True, '', None, 'do not hide progressbar in gradio UI (we hide it because it slows down ML if you have h...'),
    ('--max-batch-count', False, '', 16, 'does not do anything'),
    ('--embeddings-dir', False, '', None, 'embeddings directory for textual inversion (default: embeddings)'),
    ('--textual-inversion-templates-dir', False, '', None, 'directory with textual inversion templates'),
    ('--hypernetwork-dir', False, '', None, 'hypernetwork directory'),
    ('--localizations-dir', False, '', None, 'localizations directory'),
    ('--allow-code', True, '', None, 'allow custom script execution from webui'),
    ('--medvram', True, '', None, 'enable stable diffusion model optimizations for sacrificing a little speed for low VRM ...'),
    ('--medvram-sdxl', True, '', None, 'enable --medvram optimization just for SDXL models'),
    ('--lowvram', True, '', None, 'enable stable diffusion model optimizations for sacrificing a lot of speed for very low...'),
    ('--lowram', True, '', None, 'load stable diffusion checkpoint weights to VRAM instead of RAM'),
    ('--always-batch-cond-uncond', True, '', None, 'does not do anything'),
    ('--unload-gfpgan', True, '', None, 'does not do anything.'),
    ('--precision', False, '', 'autocast', 'evaluate at this precision'),
    ('--upcast-sampling', True, '', None, 'upcast sampling. No effect with --no-half. Usually produces similar results to --no-hal...'),
    ('--share', True, '', None, 'use share=True for gradio and make the UI accessible through their site'),
    ('--ngrok', False, '', None, 'ngrok authtoken, alternative to gradio --share'),
    ('--ngrok-region', False, '', '', 'does not do anything.'),
    ('--ngrok-options', False, '', None, "The options to pass to ngrok in JSON format, e.g.: '{'authtoken_from_env':true, 'basic_..."),
    ('--enable-insecure-extension-access', True, '', None, 'enable extensions tab regardless of other options'),
    ('--codeformer-models-path', False, '', None, 'Path to directory with codeformer model file(s).'),
    ('--gfpgan-models-path', False, '', None, 'Path to directory with GFPGAN model file(s).'),
    ('--esrgan-models-path', False, '', None, 'Path to directory with ESRGAN model file(s).'),
    ('--bsrgan-models-path', False, '', None, 'Path to directory with BSRGAN model file(s).'),
    ('--realesrgan-models-path', False, '', None, 'Path to directory with RealESRGAN model file(s).'),
    ('--dat-models-path', False, '', None, 'Path to directory with DAT model file(s).'),
    ('--clip-models-path', False, '', None, 'Path to directory with CLIP model file(s).'),
    ('--xformers', True, '', None, 'enable xformers for cross attention layers'),
    ('--force-enable-xformers', True, '', None, 'enable xformers for cross attention layers regardless of whether the checking code thin...'),
    ('--xformers-flash-attention', True, '', None, 'enable xformers with Flash Attention to improve reproducibility (supported for SD2.x or...'),
    ('--deepdanbooru', True, '', None, 'does not do anything'),
    ('--opt-split-attention', True, '', None, "prefer Doggettx's cross-attention layer optimization for automatic choice of optimization"),
    ('--opt-sub-quad-attention', True, '', None, 'prefer memory efficient sub-quadratic cross-attention layer optimization for automatic ...'),
    ('--sub-quad-q-chunk-size', False, '', 1024, 'query chunk size for the sub-quadratic cross-attention layer optimization to use'),
    ('--sub-quad-kv-chunk-size', False, '', None, 'kv chunk size for the sub-quadratic cross-attention layer optimization to use'),
    ('--sub-quad-chunk-threshold', False, '', None, 'the percentage of VRAM threshold for the sub-quadratic cross-attention layer optimizati...'),
    ('--opt-split-attention-invokeai', True, '', None, "prefer InvokeAI's cross-attention layer optimization for automatic choice of optimization"),
    ('--opt-split-attention-v1', True, '', None, 'prefer older version of split attention optimization for automatic choice of optimization'),
    ('--opt-sdp-attention', True, '', None, 'prefer scaled dot product cross-attention layer optimization for automatic choice of op...'),
    ('--opt-sdp-no-mem-attention', True, '', None, 'prefer scaled dot product cross-attention layer optimization without memory efficient a...'),
    ('--disable-opt-split-attention', True, '', None, 'prefer no cross-attention layer optimization for automatic choice of optimization'),
    ('--disable-nan-check', True, '', None, 'do not check if produced images/latent spaces have nans; useful for running without a c...'),
    ('--use-cpu', False, '', [], 'use CPU as torch device for specified modules'),
    ('--use-ipex', True, '', None, 'use Intel XPU as torch device'),
    ('--disable-model-loading-ram-optimization', True, '', None, 'disable an optimization that reduces RAM use when loading a model'),
    ('--listen', True, '', None, 'launch gradio with 0.0.0.0 as server name, allowing to respond to network requests'),
    ('--port', False, '', None, 'launch gradio with given server port, you need root/admin rights for ports < 1024, defa...'),
    ('--show-negative-prompt', True, '', False, 'does not do anything'),
    ('--ui-config-file', False, '', None, 'filename to use for ui configuration'),
    ('--hide-ui-dir-config', True, '', False, 'hide directory configuration from webui'),
    ('--freeze-settings', True, '', False, 'disable editing of all settings globally'),
    ('--freeze-settings-in-sections', False, '', None, 'disable editing settings in specific sections of the settings page by specifying a comm...'),
    ('--freeze-specific-settings', False, '', None, "disable editing of individual settings by specifying a comma-delimited list like 'sampl..."),
    ('--ui-settings-file', False, '', None, 'filename to use for ui settings'),
    ('--gradio-debug', True, '', None, 'launch gradio with --debug option'),
    ('--gradio-auth', False, '', None, "set gradio authentication like 'username:password'; or comma-delimit multiple like 'u1:..."),
    ('--gradio-auth-path', False, '', None, "set gradio authentication file path ex. '/path/to/auth/file' same auth format as --grad..."),
    ('--gradio-img2img-tool', False, '', None, 'does not do anything'),
    ('--gradio-inpaint-tool', False, '', None, 'does not do anything'),
    ('--gradio-allowed-path', False, '', None, "add path to gradio's allowed_paths, make it possible to serve files from it"),
    ('--opt-channelslast', True, '', None, 'change memory type for stable diffusion to channels last'),
    ('--styles-file', False, '', [], 'path or wildcard path of styles files, allow multiple entries.'),
    ('--autolaunch', True, '', False, "open the webui URL in the system's default browser upon launch"),
    ('--theme', False, '', None, 'launches the UI with light or dark theme'),
    ('--use-textbox-seed', True, '', False, 'use textbox for seeds in UI (no up/down, but possible to input long seeds)'),
    ('--disable-console-progressbars', True, '', False, 'do not output progressbars to console'),
    ('--enable-console-prompts', True, '', False, 'does not do anything'),
    ('--vae-path', False, '', None, 'Checkpoint to use as VAE; setting this argument disables all settings related to VAE'),
    ('--disable-safe-unpickle', True, '', False, 'disable checking pytorch models for malicious code'),
    ('--api', True, '', None, 'use api=True to launch the API together with the webui (use --nowebui instead for only ...'),
    ('--api-auth', False, '', None, "Set authentication for API like 'username:password'; or comma-delimit multiple like 'u1..."),
    ('--api-log', True, '', None, 'use api-log=True to enable logging of all API requests'),
    ('--nowebui', True, '', None, 'use api=True to launch the API instead of the webui'),
    ('--ui-debug-mode', True, '', None, "Don't load model to quickly launch UI"),
    ('--device-id', False, '', None, 'Select the default CUDA device to use (export CUDA_VISIBLE_DEVICES=0,1,etc might be nee...'),
    ('--administrator', True, '', False, 'Administrator rights'),
    ('--cors-allow-origins', False, '', None, 'Allowed CORS origin(s) in the form of a comma-separated list (no spaces)'),
    ('--cors-allow-origins-regex', False, '', None, 'Allowed CORS origin(s) in the form of a single regular expression'),
    ('--tls-keyfile', False, '', None, 'Partially enables TLS, requires --tls-certfile to fully function'),
    ('--tls-certfile', False, '', None, 'Partially enables TLS, requires --tls-keyfile to fully function'),
    ('--disable-tls-verify', False, '', None, 'When passed, enables the use of self-signed certificates.'),
    ('--server-name', False, '', None, 'Sets hostname of server'),
    ('--gradio-queue', True, '', True, 'does not do anything'),
    ('--no-gradio-queue', True, '', None, 'Disables gradio queue; causes the webpage to use http requests instead of websockets; w...'),
    ('--skip-version-check', True, '', None, 'Do not check versions of torch and xformers'),
    ('--no-hashing', True, '', False, 'disable sha256 hashing of checkpoints to help loading performance'),
    ('--no-download-sd-model', True, '', False, "don't download SD1.5 model even if no model is found in --ckpt-dir"),
    ('--subpath', False, '', None, 'customize the subpath for gradio, use with reverse proxy'),
    ('--add-stop-route', True, '', None, 'does not do anything'),
    ('--api-server-stop', True, '', None, 'enable server stop/restart/kill via api'),
    ('--timeout-keep-alive', False, '', 30, 'set timeout_keep_alive for uvicorn'),
    ('--disable-all-extensions', True, '', False, 'prevent all extensions from running regardless of any other settings'),
    ('--disable-extra-extensions', True, '', False, 'prevent all extensions except built-in from running regardless of any other settings'),
    ('--skip-load-model-at-start', True, '', None, 'if load a model at web start, only take effect when --nowebui'),
    ('--unix-filenames-sanitization', True, '', None, "allow any symbols except '/' in filenames. May conflict with your browser and file system"),
    ('--filenames-max-length', False, '', 128, 'maximal length of filenames of saved images. If you override it, it can conflict with y...'),
    ('--no-prompt-history', True, '', None, 'disable read prompt from last generation feature; settings this argument will not creat...'),
]


# --------------------------------------------------------------------------
# parsed-flag singleton (reference shared.cmd_opts): set once at server
# start; scripts and routes read gates like allow_code from here.
# --------------------------------------------------------------------------

import types

cmd_opts = types.SimpleNamespace()


def set_cmd_opts(args) -> None:
    for k, v in vars(args).items():
        setattr(cmd_opts, k, v)


def flag(name: str, default=None):
    return getattr(cmd_opts, name, default)
