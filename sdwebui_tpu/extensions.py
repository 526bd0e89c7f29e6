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
