"""Infotext codec: generation parameters ↔ "parameters" text.

Format-compatible with the reference (modules/processing.py:705
create_infotext; modules/infotext_utils.py:234 parse_generation_parameters)
so images carry their own reproduction recipe and round-trip through
PNG-info / paste / API."""

from __future__ import annotations

import re


def quote(text):
    text = str(text)
    if "," not in text and "\n" not in text and ":" not in text:
        return text
    return '"' + text.replace("\\", "\\\\").replace('"', '\\"') + '"'


def unquote(text: str):
    if len(text) == 0 or text[0] != '"' or text[-1] != '"':
        return text
    try:
        import json

        return json.loads(text)
    except Exception:
        return text


def build(prompt: str, negative_prompt: str, params: dict) -> str:
    pairs = ", ".join(f"{k}: {quote(v)}" for k, v in params.items() if v is not None)
    neg = f"\nNegative prompt: {negative_prompt}" if negative_prompt else ""
    return f"{prompt}{neg}\n{pairs}".strip()


_PARAM_RE = re.compile(r"""
\s*([\w ]+):\s*
("(?:\\.|[^\\"])+"|[^,]*)
(?:,|$)
""", re.X)

_SIZE_RE = re.compile(r"^(\d+)x(\d+)$")


def parse(text: str) -> dict:
    """parameters text → flat dict (reference parse_generation_parameters)."""
    res: dict = {}
    if not text:
        return res
    *prompt_lines, lastline = text.strip().split("\n")
    if len(_PARAM_RE.findall(lastline)) < 3:
        prompt_lines.append(lastline)
        lastline = ""

    prompt, negative = [], []
    in_negative = False
    for line in prompt_lines:
        line = line.strip()
        if line.startswith("Negative prompt:"):
            in_negative = True
            line = line[len("Negative prompt:"):].strip()
        (negative if in_negative else prompt).append(line)
    res["Prompt"] = "\n".join(prompt)
    res["Negative prompt"] = "\n".join(negative)

    for k, v in _PARAM_RE.findall(lastline):
        k = k.strip()
        v = unquote(v.strip())
        m = _SIZE_RE.match(str(v))
        if m and k == "Size":
            res["Size-1"] = int(m.group(1))
            res["Size-2"] = int(m.group(2))
        res[k] = v
    return res
