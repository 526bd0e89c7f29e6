"""Extensions manager (reference modules/extensions.py).

Discovers extensions in `extensions/` (user) and `extensions-builtin/`
(shipped), reads git metadata when the extension is a git checkout, and
applies the enable/disable policy from options (`disabled_extensions`,
`disable_all_extensions` = none|extra|all — reference
modules/extensions.py:22-27).

Unlike the reference, extension *code* is not auto-executed: by policy only
declarative assets load (styles csv, embeddings/, models subdirs).  Python
scripts an extension ships register through the scripts framework only when
`enable_extension_scripts` is turned on explicitly.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess


@dataclasses.dataclass
class Extension:
    name: str
    path: str
    enabled: bool = True
    is_builtin: bool = False
    remote: str | None = None
    branch: str = ""
    commit_hash: str = ""
    commit_date: int = 0
    version: str = ""

    def read_info_from_repo(self):
        """git metadata, best effort (reference Extension.read_info_from_repo)."""
        if not os.path.isdir(os.path.join(self.path, ".git")):
            return

        def git(*args):
            try:
                return subprocess.run(
                    ["git", "-C", self.path, *args], capture_output=True,
                    text=True, timeout=5).stdout.strip()
            except Exception:
                return ""

        self.remote = git("config", "--get", "remote.origin.url") or None
        head = git("rev-parse", "HEAD")
        if not all(c in "0123456789abcdef" for c in head) or len(head) != 40:
            return   # repo without commits: keep empty metadata
        self.commit_hash = head
        self.branch = git("rev-parse", "--abbrev-ref", "HEAD")
        date = git("log", "-1", "--format=%ct")
        self.commit_date = int(date) if date.isdigit() else 0
        self.version = head[:8]


def list_extensions(dirs=("extensions", "extensions-builtin")) -> list:
    """Discover extensions and apply the options disable policy."""
    from sdwebui_tpu.utils.options import opts

    disable_all = opts.get("disable_all_extensions", "none")
    disabled = set(opts.get("disabled_extensions", []) or [])
    out = []
    for d in dirs:
        if not os.path.isdir(d):
            continue
        builtin = d.endswith("-builtin")
        for name in sorted(os.listdir(d)):
            path = os.path.join(d, name)
            if not os.path.isdir(path) or name.startswith("."):
                continue
            enabled = name not in disabled
            if disable_all == "all":
                enabled = False
            elif disable_all == "extra" and not builtin:
                enabled = False
            out.append(Extension(name=name, path=path, enabled=enabled,
                                 is_builtin=builtin))
    return out


def active_extensions(dirs=("extensions", "extensions-builtin")) -> list:
    return [e for e in list_extensions(dirs) if e.enabled]


def _topo_sort(exts: list) -> list:
    """Stable topological order honoring metadata.ini [Extension] Requires
    (reference modules/extensions.py:228 ExtensionMetadata + scripts.py
    topological_sort)."""
    import configparser

    requires = {}
    for ext in exts:
        reqs = []
        meta = os.path.join(ext.path, "metadata.ini")
        if os.path.isfile(meta):
            cp = configparser.ConfigParser()
            try:
                cp.read(meta)
                raw = cp.get("Extension", "Requires", fallback="")
                reqs = [r.strip() for r in raw.split(",") if r.strip()]
            except configparser.Error:
                pass
        requires[ext.name] = reqs
    by_name = {e.name: e for e in exts}
    done, out = set(), []

    def visit(name, chain=()):
        if name in done or name not in by_name or name in chain:
            return
        for req in requires.get(name, []):
            visit(req, chain + (name,))
        done.add(name)
        out.append(by_name[name])

    for ext in exts:
        visit(ext.name)
    return out


def load_extension_scripts(dirs=("extensions", "extensions-builtin"),
                           allow: bool | None = None) -> dict:
    """Execute enabled extensions' `scripts/*.py` through the Script
    framework (reference modules/scripts.py:487 load_scripts).

    Policy-gated: runs only with --allow-code or the
    `enable_extension_scripts` option (third-party code execution needs
    explicit consent here, unlike the reference's always-on model).
    Scripts see the reference's `modules.*` script API via
    scripts/compat.py; Script subclasses they define self-register.

    Returns {extension: [script files]} for what actually loaded.
    """
    import importlib.util
    import traceback

    from sdwebui_tpu.scripts.compat import shim_installed
    from sdwebui_tpu.scripts.framework import (Script, _SCRIPT_REGISTRY,
                                               register_script)
    from sdwebui_tpu.server.cmd_flags import flag
    from sdwebui_tpu.utils.options import opts

    if allow is None:
        allow = bool(flag("allow_code")) or \
            bool(opts.get("enable_extension_scripts", False))
    if not allow:
        return {}

    loaded: dict[str, list] = {}
    for ext in _topo_sort(active_extensions(dirs)):
        script_dir = os.path.join(ext.path, "scripts")
        if not os.path.isdir(script_dir):
            continue
        for fn in sorted(os.listdir(script_dir)):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(script_dir, fn)
            mod_name = f"sdwebui_ext.{ext.name}.{fn[:-3]}".replace("-", "_")
            try:
                before = set(_SCRIPT_REGISTRY.values())
                with shim_installed(ext.path):
                    spec = importlib.util.spec_from_file_location(mod_name,
                                                                  path)
                    module = importlib.util.module_from_spec(spec)
                    import sys

                    sys.modules[mod_name] = module
                    spec.loader.exec_module(module)
                # auto-register Script subclasses the file defined but did
                # not register itself (the reference collects them by scan)
                for obj in vars(module).values():
                    if isinstance(obj, type) and issubclass(obj, Script) \
                            and obj is not Script \
                            and obj not in before \
                            and obj not in _SCRIPT_REGISTRY.values():
                        if getattr(obj, "name", None) in (None, "base"):
                            obj.name = getattr(
                                obj(), "title", lambda: fn[:-3])() or fn[:-3]
                        register_script(obj)
                loaded.setdefault(ext.name, []).append(fn)
            except Exception:
                print(f"Error loading extension script {path}:")
                traceback.print_exc()
    return loaded


def load_extension_assets(engine, dirs=("extensions", "extensions-builtin")):
    """Load declarative assets from enabled extensions: per-extension
    embeddings/ dirs and styles.csv files (the safe subset of what the
    reference executes)."""
    loaded = []
    for ext in active_extensions(dirs):
        emb_dir = os.path.join(ext.path, "embeddings")
        if os.path.isdir(emb_dir):
            db = getattr(engine.sd_model.conditioner, "embedding_db", None)
            if db is not None:
                db.load_from_dir(emb_dir)
                loaded.append((ext.name, "embeddings"))
        styles = os.path.join(ext.path, "styles.csv")
        if os.path.isfile(styles):
            engine.styles.load_extra(styles)
            loaded.append((ext.name, "styles"))
    return loaded


def install_from_url(url: str, dirname: str | None = None,
                     branch: str | None = None,
                     target_root: str = "extensions") -> Extension:
    """Install an extension by git clone (reference modules/ui_extensions.py
    install_extension_from_url).  In the zero-egress image this serves local
    paths / file:// remotes; the flow is identical for network URLs.

    The reference also runs the extension's install.py (pip requirements)
    via launch_utils; that is code execution, so it only happens when
    third-party script execution is enabled (--allow-code equivalent,
    scripts/compat policy)."""
    if not url:
        raise ValueError("empty extension URL")
    name = dirname or os.path.basename(url.rstrip("/")).removesuffix(".git")
    if not name:
        raise ValueError(f"cannot derive extension name from {url!r}")
    # single path component only: no traversal out of extensions/
    if name in (".", "..") or any(c in name for c in ("/", "\\", "\0")) \
            or name.startswith("."):
        raise ValueError(f"invalid extension directory name {name!r}")
    target = os.path.join(target_root, name)
    if os.path.exists(target):
        raise FileExistsError(
            f"Extension with this name is already installed: {name}")
    os.makedirs(target_root, exist_ok=True)
    tmp = target + ".tmp"
    cmd = ["git", "clone", "--depth", "1"]
    if branch:
        cmd += ["-b", branch]
    cmd += [url, tmp]
    try:
        subprocess.run(cmd, capture_output=True, text=True, timeout=120,
                       check=True)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(f"git clone failed: {e.stderr.strip()}") from e
    os.rename(tmp, target)

    from sdwebui_tpu.server.cmd_flags import cmd_opts

    install_py = os.path.join(target, "install.py")
    if os.path.isfile(install_py) and getattr(cmd_opts, "allow_code", False):
        subprocess.run(["python", install_py], capture_output=True,
                       text=True, timeout=600, cwd=target)

    ext = Extension(name=name, path=target)
    ext.read_info_from_repo()
    return ext


def check_updates(dirs=("extensions",)) -> dict:
    """git fetch + behind-count per extension (reference
    Extension.check_updates); returns {name: 'latest'|'behind N'|'unknown'}."""
    out = {}
    for ext in list_extensions(dirs):
        if not os.path.isdir(os.path.join(ext.path, ".git")):
            out[ext.name] = "unknown"
            continue
        try:
            subprocess.run(["git", "-C", ext.path, "fetch", "--quiet"],
                           capture_output=True, timeout=30)
            r = subprocess.run(
                ["git", "-C", ext.path, "rev-list", "--count",
                 "HEAD..@{upstream}"], capture_output=True, text=True,
                timeout=10)
            n = r.stdout.strip()
            out[ext.name] = "latest" if n == "0" else \
                (f"behind {n}" if n.isdigit() else "unknown")
        except Exception:
            out[ext.name] = "unknown"
    return out


# --------------------------------------------------------------------------
# available-extensions index browser (reference modules/ui_extensions.py:407
# refresh_available_extensions + refresh_available_extensions_from_data)
# --------------------------------------------------------------------------

DEFAULT_INDEX_URL = ("https://raw.githubusercontent.com/AUTOMATIC1111/"
                     "stable-diffusion-webui-extensions/master/index.json")

_available_index: dict | None = None

# reference sort_ordering (ui_extensions.py:434-443), by dropdown position
_SORT_KEYS = [
    ("added", True), ("added", False), ("name", False), ("name", True),
    (None, False), ("commit_time", True), ("created_at", True),
    ("stars", True),
]


def load_available_index(url_or_path: str | None = None) -> dict:
    """Fetch/read and cache the extensions catalog.  Format (the reference's
    index repo): {"tags": {tag: description}, "extensions": [{"name", "url",
    "description", "added", "tags", ...}]}.  Local paths are first-class:
    the zero-egress image can't reach the default URL, but a user-supplied
    index file drives the identical browse/filter/install flow."""
    global _available_index

    src = url_or_path or DEFAULT_INDEX_URL
    if src.startswith(("http://", "https://")):
        import urllib.request

        with urllib.request.urlopen(src, timeout=20) as resp:
            data = json.loads(resp.read())
    else:
        with open(src, encoding="utf-8") as f:
            data = json.load(f)
    if not isinstance(data.get("extensions"), list):
        raise ValueError("index has no 'extensions' list")
    _available_index = {"tags": dict(data.get("tags") or {}),
                        "extensions": data["extensions"]}
    return _available_index


def _normalize_git_url(url):
    if not url:
        return None
    return url.removesuffix(".git")


def browse_available(selected_tags=(), filter_text: str = "",
                     sort_column: int = 0, hide_installed: bool = True,
                     hide_tags=("ads", "localization", "installed"),
                     dirs=("extensions", "extensions-builtin")) -> dict:
    """Filter/sort the cached index the way the reference's Available tab
    does: tag whitelist (selected), tag blacklist (hide), substring search
    over name+description, installed detection by dir name or git remote.

    Returns {"tags": {...}, "extensions": [row...], "hidden": n} with each
    row carrying an `installed` flag for the UI's Install button state."""
    if _available_index is None:
        raise ValueError("no index loaded — call load_available_index first")
    installed = list_extensions(dirs)
    installed_names = {e.name for e in installed}
    installed_urls = {_normalize_git_url(getattr(e, "remote", None))
                      for e in installed} - {None}

    selected = set(selected_tags or ())
    hidden_tags = set(hide_tags or ()) - selected
    needle = (filter_text or "").strip().lower()
    rows, hidden = [], 0
    for info in _available_index["extensions"]:
        ext_tags = set(info.get("tags") or [])
        name = info.get("name") or ""
        is_installed = (name in installed_names
                        or _normalize_git_url(info.get("url"))
                        in installed_urls)
        keep = True
        if selected and not (ext_tags & selected):
            keep = False
        if ext_tags & hidden_tags:
            keep = False
        if is_installed and hide_installed and "installed" not in selected:
            keep = False
        if needle and needle not in (name + " "
                                     + (info.get("description") or "")).lower():
            keep = False
        if not keep:
            hidden += 1
            continue
        rows.append({**info, "installed": is_installed})

    key, reverse = _SORT_KEYS[sort_column % len(_SORT_KEYS)]
    if key is not None:
        default = 0 if key == "stars" else "z"
        rows.sort(key=lambda r: r.get(key) or default, reverse=reverse)
    return {"tags": _available_index["tags"], "extensions": rows,
            "hidden": hidden}
