"""CLI launcher: `python -m sdwebui_tpu.server --port 7860 --api`.

Mirrors the relevant subset of the reference's ~120 cmd flags
(modules/cmd_args.py)."""

from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser("sdwebui_tpu server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--ckpt", default=None, help="checkpoint path or name")
    p.add_argument("--ckpt-dir", default="models/Stable-diffusion")
    p.add_argument("--outdir", default="outputs")
    p.add_argument("--api", action="store_true", default=True)
    p.add_argument("--api-auth", default=None, help="user:pass[,user:pass]")
    p.add_argument("--test-server", action="store_true",
                   help="random tiny model (CI mode, reference --test-server)")
    p.add_argument("--api-server-stop", action="store_true", default=True)
    p.add_argument("--config-path", default="config.json")

    # the reference's full flag surface (server/cmd_flags.py): accepted for
    # launcher compatibility; --listen/--server-name wire to host below
    from sdwebui_tpu.server.cmd_flags import REFERENCE_FLAGS

    seen = {a.option_strings[0] for a in p._actions if a.option_strings}
    for flag, store_true, typ, default, help_ in REFERENCE_FLAGS:
        if flag in seen:
            continue
        kw = {"help": help_ or None, "default": default}
        if store_true:
            kw = {"help": help_ or None, "action": "store_true"}
        elif typ == "int":
            kw["type"] = int
        elif typ == "float":
            kw["type"] = float
        try:
            p.add_argument(flag, **kw)
        except argparse.ArgumentError:
            pass
    args = p.parse_args(argv)
    if getattr(args, "listen", False) and args.host == "127.0.0.1":
        args.host = "0.0.0.0"
    if getattr(args, "server_name", None):
        args.host = args.server_name
    return args


def main(argv=None):
    args = parse_args(argv)

    from sdwebui_tpu.utils import timer as timer_mod

    st = timer_mod.startup_timer
    st.reset()
    st.record("parse args")

    from sdwebui_tpu.server.api import ApiServer
    from sdwebui_tpu.server.app import Engine
    from sdwebui_tpu.server.cmd_flags import set_cmd_opts
    from sdwebui_tpu.utils.options import opts

    st.record("import server")
    set_cmd_opts(args)
    opts.load(args.config_path)
    st.record("load options")

    if getattr(args, "use_cpu", None):
        # reference --use-cpu <modules> (the CI launches `--use-cpu all`
        # for its empty-weights test server): the only accelerator here is
        # the TPU, so any --use-cpu selection pins JAX to the CPU backend.
        # Must run before first device contact; the env-var form is
        # overridden by the container's sitecustomize, the config knob
        # is not.
        import jax

        jax.config.update("jax_platforms", "cpu")
        print("--use-cpu: pinned JAX to the CPU backend", flush=True)

    restore_state = opts.get("restore_config_state_file", "")
    if restore_state:
        # reference initialize_util.restore_config_state_file: apply a saved
        # config state once at startup, then clear the option
        try:
            import json as _json

            from sdwebui_tpu.utils.config_states import \
                restore_extension_config

            with open(restore_state, encoding="utf-8") as f:
                restore_extension_config(_json.load(f))
            print(f"restored config state from {restore_state}", flush=True)
        except Exception as e:
            print(f"could not restore config state {restore_state!r}: {e}",
                  flush=True)
        opts.set("restore_config_state_file", "")
        opts.save(args.config_path)

    if opts.get("dump_stacks_on_signal", False):
        # reference shared_options system section: ctrl+c prints all-thread
        # stacks before exit
        import faulthandler
        import signal

        faulthandler.register(signal.SIGINT, chain=True)

    credentials = None
    if args.api_auth:
        credentials = dict(pair.split(":", 1) for pair in args.api_auth.split(","))

    engine = Engine(model_dirs=[args.ckpt_dir], ckpt=args.ckpt,
                    outdir=args.outdir, test_model=args.test_server)
    st.record("create engine")
    server = ApiServer(engine, host=args.host, port=args.port,
                       credentials=credentials)
    server.start()
    st.record("start server")
    timer_mod.startup_record = st.dump()
    print(f"sdwebui_tpu API listening on http://{server.host}:{server.port}",
          flush=True)

    while True:
        cmd = server.wait_for_command()
        if cmd in ("stop", "kill"):
            print(f"server command: {cmd}; shutting down", flush=True)
            server.shutdown()
            return 0
        if cmd == "restart":
            print("restart requested (in-process reload not needed: "
                  "models are explicit state); continuing", flush=True)


if __name__ == "__main__":
    sys.exit(main())
