"""Filesystem discovery helpers (reference modules/util.py walk_files).

`visible(path)` implements opts.list_hidden_files (reference util.py:48:
"Load models/files in hidden directories", default on): when the option is
off, any file living under a dot-directory is skipped by the model/network
registries."""

from __future__ import annotations

import os


def visible(path: str) -> bool:
    from sdwebui_tpu.utils.options import opts

    if opts.get("list_hidden_files", True):
        return True
    parts = os.path.normpath(os.path.dirname(path)).split(os.sep)
    return not any(p.startswith(".") and p not in (".", "..") for p in parts)
