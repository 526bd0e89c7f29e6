"""Filename-pattern engine for saved images.

Behaviour mirrors the reference's FilenameGenerator
(/root/reference/modules/images.py:381-541): ``[token]`` patterns with
``<arg>`` suffixes, NOTHING_AND_SKIP_PREVIOUS_TEXT semantics (a skipped
token also drops the literal text preceding it), unknown tokens kept
verbatim, per-token error tolerance.  Drives the samples_filename_pattern /
directories_filename_pattern options.
"""

from __future__ import annotations

import datetime
import hashlib
import os
import re
import string

from sdwebui_tpu.utils.images import sanitize_filename_part

NOTHING_AND_SKIP_PREVIOUS_TEXT = object()

re_nonletters = re.compile(r"[\s" + string.punctuation + "]+")
re_pattern = re.compile(r"(.*?)(?:\[([^\[\]]+)\]|$)")
re_pattern_arg = re.compile(r"(.*)<([^>]*)>$")


def _scheduler_str(p, with_sampler: bool):
    from sdwebui_tpu.sampling.registry import get_sampler

    scheduler = getattr(p, "scheduler", None)
    sampler_name = getattr(p, "sampler_name", None)
    if scheduler is None or sampler_name is None:
        return NOTHING_AND_SKIP_PREVIOUS_TEXT
    if scheduler == "Automatic":
        try:
            scheduler = get_sampler(sampler_name).scheduler_override or "Automatic"
        except ValueError:
            pass
    text = f"{sampler_name} {scheduler.capitalize()}" if with_sampler \
        else scheduler.capitalize()
    return sanitize_filename_part(text, replace_spaces=False)


class FilenameGenerator:
    replacements = {
        "basename": lambda self: self.basename or "img",
        "seed": lambda self: self.seed if self.seed is not None else "",
        "seed_first": lambda self: self.seed if self.p.batch_size == 1
        else self.p.all_seeds[0],
        "seed_last": lambda self: NOTHING_AND_SKIP_PREVIOUS_TEXT
        if self.p.batch_size == 1 else self.p.all_seeds[-1],
        "steps": lambda self: self.p and self.p.steps,
        "cfg": lambda self: self.p and self.p.cfg_scale,
        "width": lambda self: self.image.width,
        "height": lambda self: self.image.height,
        "styles": lambda self: self.p and sanitize_filename_part(
            ", ".join(s for s in self.p.styles if s != "None") or "None",
            replace_spaces=False),
        "sampler": lambda self: self.p and sanitize_filename_part(
            self.p.sampler_name, replace_spaces=False),
        "sampler_scheduler": lambda self: self.p and _scheduler_str(self.p, True),
        "scheduler": lambda self: self.p and _scheduler_str(self.p, False),
        "model_hash": lambda self: getattr(self.p, "sd_model_hash", "") or
        NOTHING_AND_SKIP_PREVIOUS_TEXT,
        "model_name": lambda self: sanitize_filename_part(
            getattr(self.p, "sd_model_name", "") or "", replace_spaces=False)
        or NOTHING_AND_SKIP_PREVIOUS_TEXT,
        "date": lambda self: datetime.datetime.now().strftime("%Y-%m-%d"),
        "datetime": lambda self, *args: self.datetime(*args),
        "job_timestamp": lambda self: getattr(self.p, "job_timestamp", "") or
        datetime.datetime.now().strftime("%Y%m%d%H%M%S"),
        "prompt_hash": lambda self, *args: self.string_hash(self.prompt, *args),
        "negative_prompt_hash": lambda self, *args: self.string_hash(
            self.p.negative_prompt, *args),
        "full_prompt_hash": lambda self, *args: self.string_hash(
            f"{self.p.prompt} {self.p.negative_prompt}", *args),
        "prompt": lambda self: sanitize_filename_part(self.prompt),
        "prompt_no_styles": lambda self: self.prompt_no_style(),
        "prompt_spaces": lambda self: sanitize_filename_part(
            self.prompt, replace_spaces=False),
        "prompt_words": lambda self: self.prompt_words(),
        "batch_number": lambda self: NOTHING_AND_SKIP_PREVIOUS_TEXT
        if self.p.batch_size == 1 or self.zip
        else getattr(self.p, "batch_index", 0) + 1,
        "batch_size": lambda self: self.p.batch_size,
        "generation_number": lambda self: NOTHING_AND_SKIP_PREVIOUS_TEXT
        if (self.p.n_iter == 1 and self.p.batch_size == 1) or self.zip
        else (getattr(self.p, "iteration", 0) * self.p.batch_size
              + getattr(self.p, "batch_index", 0) + 1),
        "hasprompt": lambda self, *args: self.hasprompt(*args),
        "clip_skip": lambda self: _opt("CLIP_stop_at_last_layers"),
        "denoising": lambda self: self.p.denoising_strength
        if self.p and self.p.denoising_strength
        else NOTHING_AND_SKIP_PREVIOUS_TEXT,
        "user": lambda self: getattr(self.p, "user", None) or
        NOTHING_AND_SKIP_PREVIOUS_TEXT,
        "vae_filename": lambda self: self.get_vae_filename(),
        "none": lambda self: "",
        "image_hash": lambda self, *args: self.image_hash(*args),
    }
    default_time_format = "%Y%m%d%H%M%S"

    def __init__(self, p, seed, prompt, image, zip=False, basename=""):
        self.p = p
        self.seed = seed
        self.prompt = prompt
        self.image = image
        self.zip = zip
        self.basename = basename

    def get_vae_filename(self):
        from sdwebui_tpu.loader import load as loader_load

        loaded = getattr(loader_load, "loaded_vae_file", None)
        if not loaded:
            return "NoneType"
        name = os.path.basename(loaded).split(".")
        if len(name) > 1 and name[0] == "":
            return name[1]
        return name[0]

    def hasprompt(self, *args):
        if self.p is None or self.prompt is None:
            return None
        lower = self.prompt.lower()
        outres = ""
        for arg in args:
            if arg != "":
                division = arg.split("|")
                expected = division[0].lower()
                default = division[1] if len(division) > 1 else ""
                if lower.find(expected) >= 0:
                    outres = f"{outres}{expected}"
                else:
                    outres = outres if default == "" else f"{outres}{default}"
        return sanitize_filename_part(outres)

    def prompt_no_style(self):
        if self.p is None or self.prompt is None:
            return None
        from sdwebui_tpu.text.styles import get_style_database

        prompt_no_style = self.prompt
        for style in get_style_database().get_style_prompts(self.p.styles):
            if style:
                for part in style.split("{prompt}"):
                    prompt_no_style = prompt_no_style.replace(part, "") \
                        .replace(", ,", ",").strip().strip(",")
                prompt_no_style = prompt_no_style.replace(style, "") \
                    .strip().strip(",").strip()
        return sanitize_filename_part(prompt_no_style, replace_spaces=False)

    def prompt_words(self):
        words = [x for x in re_nonletters.split(self.prompt or "") if x]
        if len(words) == 0:
            words = ["empty"]
        max_words = _opt("directories_max_prompt_words", 8)
        return sanitize_filename_part(" ".join(words[0:max_words]),
                                      replace_spaces=False)

    def datetime(self, *args):
        now = datetime.datetime.now()
        time_format = args[0] if (args and args[0] != "") \
            else self.default_time_format
        # time zones: zoneinfo replaces the reference's pytz dependency
        tz = None
        if len(args) > 1:
            try:
                import zoneinfo

                tz = zoneinfo.ZoneInfo(args[1])
            except Exception:
                tz = None
        localized = now.astimezone(tz)
        try:
            formatted = localized.strftime(time_format)
        except (ValueError, TypeError):
            formatted = localized.strftime(self.default_time_format)
        return sanitize_filename_part(formatted, replace_spaces=False)

    def image_hash(self, *args):
        length = int(args[0]) if (args and args[0] != "") else None
        return hashlib.sha256(self.image.tobytes()).hexdigest()[0:length]

    def string_hash(self, text, *args):
        length = int(args[0]) if (args and args[0] != "") else 8
        return hashlib.sha256((text or "").encode()).hexdigest()[0:length]

    def apply(self, x: str) -> str:
        res = ""
        for m in re_pattern.finditer(x):
            text, pattern = m.groups()
            if pattern is None:
                res += text
                continue

            pattern_args = []
            while True:
                m2 = re_pattern_arg.match(pattern)
                if m2 is None:
                    break
                pattern, arg = m2.groups()
                pattern_args.insert(0, arg)

            fun = self.replacements.get(pattern.lower())
            if fun is not None:
                try:
                    replacement = fun(self, *pattern_args)
                except Exception:
                    replacement = None
                if replacement is NOTHING_AND_SKIP_PREVIOUS_TEXT:
                    continue
                elif replacement is not None:
                    res += text + str(replacement)
                    continue
            res += f"{text}[{pattern}]"
        return res


def _opt(key, default=None):
    from sdwebui_tpu.utils.options import opts

    return opts.get(key, default)


def get_next_sequence_number(path: str, basename: str) -> int:
    """Next auto-number for files in `path` (reference images.py:633)."""
    result = -1
    if basename != "":
        basename = f"{basename}-"
    prefix_length = len(basename)
    for p in os.listdir(path):
        if p.startswith(basename):
            parts = os.path.splitext(p[prefix_length:])[0].split("-")
            try:
                result = max(int(parts[0]), result)
            except ValueError:
                pass
    return result + 1
