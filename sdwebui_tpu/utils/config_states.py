"""Config-state snapshots (reference modules/config_states.py): JSON files
under config_states/ recording the webui commit and every extension's
name/remote/branch/commit/enabled flag, so a known-good setup can be listed
and re-applied (we restore the enabled set; git checkouts are left to the
user in this zero-egress environment)."""

from __future__ import annotations

import json
import os
import subprocess
import time

CONFIG_STATES_DIR = "config_states"


def _webui_info() -> dict:
    def git(*args):
        try:
            return subprocess.run(["git", *args], capture_output=True,
                                  text=True, timeout=5).stdout.strip()
        except Exception:
            return ""

    return {"remote": git("config", "--get", "remote.origin.url") or None,
            "commit_hash": git("rev-parse", "HEAD"),
            "branch": git("rev-parse", "--abbrev-ref", "HEAD")}


def get_config() -> dict:
    from sdwebui_tpu.extensions import list_extensions

    exts = {}
    for e in list_extensions():
        e.read_info_from_repo()
        exts[e.name] = {"name": e.name, "path": e.path, "enabled": e.enabled,
                        "is_builtin": e.is_builtin, "remote": e.remote,
                        "branch": e.branch, "commit_hash": e.commit_hash,
                        "commit_date": e.commit_date}
    return {"created_at": time.time(), "webui": _webui_info(),
            "extensions": exts}


def save_config_state(name: str = "Config", dirpath: str = CONFIG_STATES_DIR) -> str:
    os.makedirs(dirpath, exist_ok=True)
    state = get_config()
    state["name"] = name
    ts = time.strftime("%Y_%m_%d-%H_%M_%S")
    path = os.path.join(dirpath, f"{ts}_{name}.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(state, f, indent=4)
    return path


def list_config_states(dirpath: str = CONFIG_STATES_DIR) -> list:
    if not os.path.isdir(dirpath):
        return []
    out = []
    for fn in os.listdir(dirpath):
        if not fn.endswith(".json"):
            continue
        path = os.path.join(dirpath, fn)
        try:
            with open(path, encoding="utf-8") as f:
                j = json.load(f)
            assert "created_at" in j
            j["filepath"] = path
            out.append(j)
        except Exception:
            continue
    return sorted(out, key=lambda cs: cs["created_at"], reverse=True)


def restore_extension_config(state: dict):
    """Re-apply the enabled/disabled set from a saved state (reference
    restore_extension_config; git resets are out of scope without egress)."""
    from sdwebui_tpu.utils.options import opts

    disabled = [name for name, info in state.get("extensions", {}).items()
                if not info.get("enabled", True)]
    opts.set("disabled_extensions", disabled)
    return disabled
