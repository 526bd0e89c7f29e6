"""Built-in selectable scripts (reference scripts/ dir, SURVEY.md §2.3):
X/Y/Z plot, Prompt matrix, Prompts from file, Loopback, SD upscale."""

from __future__ import annotations

import copy
import dataclasses
from itertools import permutations

import numpy as np
from PIL import Image

from sdwebui_tpu.pipeline.params import GenerationParams, Processed
from sdwebui_tpu.scripts.framework import (Script, ScriptArgError,
                                           register_script)
from sdwebui_tpu.utils import images as images_util


def _clone(p: GenerationParams) -> GenerationParams:
    q = copy.copy(p)
    q.all_prompts, q.all_negative_prompts = [], []
    q.all_seeds, q.all_subseeds = [], []
    return q


# ==========================================================================
# X/Y/Z plot (reference scripts/xyz_grid.py — core axis set)
# ==========================================================================

def _run_cell(engine, q: GenerationParams) -> Processed:
    """Run one script cell: img2img when init images are present, else
    txt2img (the reference scripts call process_images, which dispatches on
    the processing class — scripts work from both tabs)."""
    if getattr(q, "init_images", None):
        return engine.img2img_inner(q)
    return engine.txt2img_inner(q)


def _apply_field(field):
    def fn(p, v):
        setattr(p, field, type(getattr(p, field, v))(v) if getattr(p, field, None) is not None else v)
    fn._field = field  # validation introspects the target param type
    return fn


AXIS_OPTIONS = {
    "Nothing": None,
    "Seed": _apply_field("seed"),
    "Var. seed": _apply_field("subseed"),
    "Var. strength": _apply_field("subseed_strength"),
    "Steps": _apply_field("steps"),
    "CFG Scale": _apply_field("cfg_scale"),
    "Image CFG Scale": _apply_field("image_cfg_scale"),
    "Sampler": _apply_field("sampler_name"),
    "Schedule type": _apply_field("scheduler"),
    "Denoising": _apply_field("denoising_strength"),
    "Clip skip": _apply_field("clip_skip"),
    "Width": _apply_field("width"),
    "Height": _apply_field("height"),
    "Eta": _apply_field("eta"),
    "Sigma Churn": _apply_field("s_churn"),
    "Sigma min": _apply_field("s_tmin"),
    "Sigma max": _apply_field("s_tmax"),
    "Sigma noise": _apply_field("s_noise"),
    "Initial noise multiplier": _apply_field("initial_noise_multiplier"),
    "Negative Guidance minimum sigma": _apply_field("s_min_uncond"),
    "Hires steps": _apply_field("hr_second_pass_steps"),
    "Hires upscaler": _apply_field("hr_upscaler"),
    "Hires sampler": _apply_field("hr_sampler_name"),
    "Hires CFG Scale": _apply_field("hr_cfg_scale"),
    "Hires scale": _apply_field("hr_scale"),
    "Refiner checkpoint": _apply_field("refiner_checkpoint"),
    "Refiner switch at": _apply_field("refiner_switch_at"),
    "Face restore": _apply_field("restore_faces"),
    "Styles": "styles",
    "Prompt S/R": "prompt_sr",   # search/replace: first value is the token
    "Prompt order": "prompt_order",
    "Size": "size",              # "WxH" strings → width+height per cell
}

# axes that sweep a runtime option (applied via override around each cell,
# reference xyz_grid apply_override)
OPTS_AXES = {
    "Checkpoint name": "sd_model_checkpoint",   # engine swaps per cell
    "VAE": "sd_vae",                            # engine re-resolves per cell
    "Token merging ratio": "token_merging_ratio",
    "Token merging ratio high-res": "token_merging_ratio_hr",
    "RNG source": "randn_source",
    "Beta schedule alpha": "beta_dist_alpha",
    "Beta schedule beta": "beta_dist_beta",
    "Emphasis": "emphasis",
    "Eta noise seed delta": "eta_noise_seed_delta",
    "Schedule min sigma": "sigma_min",
    "Schedule max sigma": "sigma_max",
    "Schedule rho": "rho",
    "UniPC Order": "uni_pc_order",
    "UniPC Variant": "uni_pc_variant",
    "Face restore model": "face_restoration_model",
    "Extra noise": "img2img_extra_noise",
    "Always discard next-to-last sigma": "always_discard_next_to_last_sigma",
    "SGM noise multiplier": "sgm_noise_multiplier",
    "Cond. Image Mask Weight": "inpainting_mask_weight",
    "FP8 mode": "fp8_storage",   # accepted; fp8 storage is N/A on TPU bf16
}

# The reference API convention passes axes as INDICES into the per-tab
# filtered axis list (scripts/xyz_grid.py:239-283 axis_options, filtered at
# :420 by AxisOptionTxt2Img/AxisOptionImg2Img), plus a values_dropdown list
# after each values string.  These orders reproduce that filtering so
# index-based clients carry over unchanged.
_REF_AXES_COMMON_HEAD = ["Nothing", "Seed", "Var. seed", "Var. strength",
                         "Steps"]
_REF_AXES_TAIL = [
    "Checkpoint name", "Negative Guidance minimum sigma", "Sigma Churn",
    "Sigma min", "Sigma max", "Sigma noise", "Schedule type",
    "Schedule min sigma", "Schedule max sigma", "Schedule rho",
    "Beta schedule alpha", "Beta schedule beta", "Eta", "Clip skip",
    "Denoising", "Initial noise multiplier", "Extra noise"]
_REF_AXES_TAIL2 = [
    "VAE", "Styles", "UniPC Order", "Face restore", "Token merging ratio",
    "Token merging ratio high-res", "Always discard next-to-last sigma",
    "SGM noise multiplier", "Refiner checkpoint", "Refiner switch at",
    "RNG source", "FP8 mode", "Size"]
REF_AXES_TXT2IMG = (_REF_AXES_COMMON_HEAD + ["Hires steps", "CFG Scale",
                    "Prompt S/R", "Prompt order", "Sampler", "Hires sampler"]
                    + _REF_AXES_TAIL + ["Hires upscaler"] + _REF_AXES_TAIL2)
REF_AXES_IMG2IMG = (_REF_AXES_COMMON_HEAD + ["CFG Scale", "Image CFG Scale",
                    "Prompt S/R", "Prompt order", "Sampler"]
                    + _REF_AXES_TAIL + ["Cond. Image Mask Weight"]
                    + _REF_AXES_TAIL2)


def _axis_field_type(axis: str):
    """Python type of the GenerationParams field an axis sweeps (None for
    Nothing/option/compound axes) — drives range expansion + validation."""
    fn = AXIS_OPTIONS.get(axis)
    field = getattr(fn, "_field", None)
    if field is None:
        return None
    cur = getattr(GenerationParams(prompt=""), field, None)
    if cur is not None:
        return type(cur)
    # None defaults (denoising_strength, eta, ...): use the annotation
    f = GenerationParams.__dataclass_fields__.get(field)
    ann = str(f.type) if f else ""
    return float if "float" in ann else int if "int" in ann else None


_NUM = r"[+-]?\d+(?:\.\d*)?"
# range grammar on numeric axes (reference xyz_grid.py process_axis):
#   "A-B"        inclusive, step 1
#   "A-B (+S)"   arithmetic step S
#   "A-B [N]"    N evenly spaced values
_RANGE_RE = __import__("re").compile(
    rf"({_NUM})\s*-\s*({_NUM})"
    rf"(?:\s*(?:\(\s*({_NUM})\s*\)|\[\s*(\d+)\s*\]))?$")


def _expand_range(v: str, ftype):
    m = _RANGE_RE.fullmatch(v.strip())
    if not m:
        return None
    a, b, step, count = m.groups()
    a, b = float(a), float(b)
    if count is not None:
        pts = np.linspace(a, b, max(int(count), 1))
    else:
        s = float(step) if step is not None else 1.0
        if s == 0:
            return None
        pts = np.arange(a, b + s / 2, s)
    return [int(round(p)) for p in pts] if ftype is int \
        else [float(p) for p in pts]


def parse_axis_values(axis: str, values) -> list:
    if axis == "Nothing" or not values:
        return [None]
    if isinstance(values, (list, tuple)):
        return list(values)
    vals = [v.strip() for v in str(values).split(",") if v.strip() != ""]
    ftype = _axis_field_type(axis)
    out = []
    for v in vals:
        rng = _expand_range(v, ftype) if ftype in (int, float) else None
        if rng is not None:
            out.extend(rng)
        else:
            out.append(v)
    return out


def _ui(name, label, type="text", default="", choices=None):
    d = {"name": name, "label": label, "type": type, "default": default}
    if choices is not None:
        d["choices"] = choices
    return d


_ALL_AXES = list(AXIS_OPTIONS) + list(OPTS_AXES)


@register_script
class XYZPlot(Script):
    name = "X/Y/Z plot"
    ui_params = [
        _ui("x_axis", "X type", "select", "Nothing", _ALL_AXES),
        _ui("x_values", "X values"),
        _ui("y_axis", "Y type", "select", "Nothing", _ALL_AXES),
        _ui("y_values", "Y values"),
        _ui("z_axis", "Z type", "select", "Nothing", _ALL_AXES),
        _ui("z_values", "Z values"),
        _ui("draw_legend", "Draw legend", "checkbox", True),
        _ui("include_sub_grids", "Include Sub Grids", "checkbox", False),
    ]

    def validate_args(self, args):
        """Accept the reference index convention (13 args: 3x(type_index,
        values, values_dropdown) + 4 flags) as an alternate layout; returns
        True when that layout applies (framework then skips the 8-control
        ui_params check).  Named-axis calls fall through to the default."""
        if not args:
            return False
        by_index = isinstance(args[0], (int, float)) \
            and not isinstance(args[0], bool)
        has_dropdown = any(isinstance(v, (list, tuple))
                           for v in list(args)[2:9:3])
        if not (by_index or has_dropdown):
            return False
        if len(args) > 13:
            raise ScriptArgError(
                self.name, 13, "<extra>",
                f"reference-convention XYZ takes at most 13 script_args, "
                f"got {len(args)}")
        n_axes = max(len(REF_AXES_TXT2IMG), len(REF_AXES_IMG2IMG))
        labels = ("X", "Y", "Z")
        for a in range(3):
            base = 3 * a
            if base >= len(args):
                break
            t = args[base]
            if not isinstance(t, (bool, int, float, str, type(None))):
                raise ScriptArgError(self.name, base, f"{labels[a]} type",
                                     f"expected an axis index or name, "
                                     f"got {t!r}")
            if isinstance(t, (int, float)) and not isinstance(t, bool) \
                    and not 0 <= int(t) < n_axes:
                raise ScriptArgError(self.name, base, f"{labels[a]} type",
                                     f"axis index {t} out of range "
                                     f"(0..{n_axes - 1})")
            if base + 2 < len(args):
                d = args[base + 2]
                if d and not isinstance(d, (list, tuple)):
                    raise ScriptArgError(
                        self.name, base + 2,
                        f"{labels[a]} values dropdown",
                        f"expected a list of choices, got {d!r}")
        return True

    def _check_axis_values(self, axis, parsed, slot, label):
        """A value string that cannot coerce to the axis's parameter type
        must 400 naming the axis, not surface as a mid-sweep traceback
        (reference call_queue.py user-facing error contract)."""
        ftype = _axis_field_type(axis)
        if ftype not in (int, float):
            return
        for v in parsed:
            if not isinstance(v, str) or v.strip().lower() in ("true",
                                                               "false"):
                continue
            try:
                float(v)
            except ValueError:
                raise ScriptArgError(
                    self.name, slot, label,
                    f"axis {axis!r} expects numbers, got {v!r}") from None

    def run(self, engine, p: GenerationParams,
            x_axis="Nothing", x_values="", y_axis="Nothing", y_values="",
            z_axis="Nothing", z_values="", draw_legend=True,
            include_sub_grids=False, *rest):
        if isinstance(x_axis, (int, float)) and not isinstance(x_axis, bool) \
                or isinstance(y_axis, (list, tuple)):
            # reference API convention (scripts/xyz_grid.py run signature):
            # (x_type_index, x_values, x_values_dropdown) per axis, then
            # draw_legend, include_lone_images, include_sub_grids, ...
            # Axis indices are per-tab (is_img2img filters the axis list).
            args = [x_axis, x_values, y_axis, y_values, z_axis, z_values,
                    draw_legend, include_sub_grids, *rest]
            args += [None] * (12 - len(args))
            order = REF_AXES_IMG2IMG if getattr(p, "init_images", None) \
                else REF_AXES_TXT2IMG

            def axis_name(i):
                i = int(i or 0)
                return order[i] if 0 <= i < len(order) else "Nothing"

            def vals(text, dropdown, slot):
                if not dropdown:  # None/""/[]/0/False — no dropdown sent
                    return text
                if not isinstance(dropdown, (list, tuple)):
                    raise ScriptArgError(
                        self.name, slot, "values dropdown",
                        f"expected a list of choices, got {dropdown!r}")
                return list(dropdown)

            x_axis, x_values = axis_name(args[0]), vals(args[1], args[2], 2)
            y_axis, y_values = axis_name(args[3]), vals(args[4], args[5], 5)
            z_axis, z_values = axis_name(args[6]), vals(args[7], args[8], 8)
            draw_legend = bool(args[9]) if args[9] is not None else True
            include_sub_grids = bool(args[11])
        xs = parse_axis_values(x_axis, x_values)
        ys = parse_axis_values(y_axis, y_values)
        zs = parse_axis_values(z_axis, z_values)
        for axis, parsed, slot, label in ((x_axis, xs, 1, "X values"),
                                          (y_axis, ys, 3, "Y values"),
                                          (z_axis, zs, 5, "Z values")):
            self._check_axis_values(axis, parsed, slot, label)
        axis_values = {x_axis: xs, y_axis: ys, z_axis: zs}

        def _coerce(v):
            if isinstance(v, str):
                low = v.strip().lower()
                if low in ("true", "false"):
                    return low == "true"
                try:
                    return int(v)
                except ValueError:
                    try:
                        return float(v)
                    except ValueError:
                        return v
            return v

        def apply(q, axis, val):
            if val is None:
                return
            if axis in OPTS_AXES:
                # runtime-option sweep, applied per cell via overrides
                q.override_settings[OPTS_AXES[axis]] = _coerce(val)
                return
            fn = AXIS_OPTIONS.get(axis)
            if fn is None:
                return
            if fn == "prompt_sr":
                token = str(axis_values[axis][0])
                q.prompt = q.prompt.replace(token, str(val))
                q.negative_prompt = q.negative_prompt.replace(token, str(val))
            elif fn == "styles":
                q.styles = [s.strip() for s in str(val).split(";") if s.strip()]
            elif fn == "prompt_order":
                # reference: reorder comma-separated prompt parts to `val`
                parts = [s.strip() for s in str(val).split(";")]
                rest = [s.strip() for s in q.prompt.split(",")
                        if s.strip() not in parts]
                q.prompt = ", ".join(parts + rest)
            elif fn == "size":
                # reference apply_size (scripts/xyz_grid.py:283): "WxH"
                w, _, h = str(val).lower().partition("x")
                q.width, q.height = int(w), int(h)
            else:
                fn(q, _coerce(val))

        from sdwebui_tpu.utils.options import opts as _mp_opts

        # reference xyz_grid.py:635 grid size guard
        grid_mp = round(len(xs) * len(ys) * len(zs)
                        * p.width * p.height / 1_000_000)
        max_mp = float(_mp_opts.get("img_max_size_mp", 200) or 200)
        if grid_mp >= max_mp:
            raise ValueError(
                f"Error: Resulting grid would be too large ({grid_mp} "
                f"MPixels) (max configured size is {int(max_mp)} MPixels)")

        all_images, infotexts = [], []
        cell_rows = []
        first = None
        for zi, zv in enumerate(zs):
            rows = []
            for yi, yv in enumerate(ys):
                row_imgs = []
                for xi, xv in enumerate(xs):
                    q = _clone(p)
                    for axis, val in ((x_axis, xv), (y_axis, yv), (z_axis, zv)):
                        apply(q, axis, val)
                    res = _run_cell(engine, q)
                    if first is None:
                        first = res
                    row_imgs.extend(res.images)
                    all_images.extend(res.images)
                    infotexts.extend(res.infotexts)
                rows.append(row_imgs)
            cell_rows.append(rows)

        # grid assembly: one grid per z, annotated like the reference's
        # draw_xyz_grid (scripts/xyz_grid.py:287-395) — x labels above,
        # y labels left, z titles on the stacked z-grid
        from sdwebui_tpu.utils.grid_annotations import (GridAnnotation,
                                                        draw_grid_annotations)

        def _label(axis, val):
            return "" if axis == "Nothing" else f"{axis}: {val}"

        grids = []
        for rows in cell_rows:
            flat = [im for row in rows for im in row]
            if not flat:
                continue
            grid = images_util.image_grid(flat, rows=len(rows))
            if draw_legend:
                w = max(im.width for im in flat)
                h = max(im.height for im in flat)
                hor = [[GridAnnotation(_label(x_axis, v))] for v in xs]
                ver = [[GridAnnotation(_label(y_axis, v))] for v in ys]
                grid = draw_grid_annotations(grid, w, h, hor, ver)
            grids.append(grid)
        if len(grids) > 1:
            z_grid = images_util.image_grid(grids, rows=1)
            if draw_legend:
                w = max(g.width for g in grids)
                h = max(g.height for g in grids)
                titles = [[GridAnnotation(_label(z_axis, v))] for v in zs]
                z_grid = draw_grid_annotations(z_grid, w, h, titles,
                                               [[GridAnnotation()]])
            grids = [z_grid] + (grids if include_sub_grids else [])
        result_images = grids + all_images
        return Processed(
            images=result_images, params=p,
            seed=first.seed if first else p.seed,
            subseed=first.subseed if first else p.subseed,
            infotexts=([infotexts[0]] * len(grids) + infotexts) if infotexts else [],
            all_seeds=first.all_seeds if first else [],
            all_subseeds=first.all_subseeds if first else [],
            all_prompts=first.all_prompts if first else [],
            width=p.width, height=p.height)


# ==========================================================================
# Prompt matrix (reference scripts/prompt_matrix.py)
# ==========================================================================

@register_script
class PromptMatrix(Script):
    name = "Prompt matrix"
    ui_params = [
        _ui("put_at_start", "Put variable parts at start of prompt",
            "checkbox", False),
    ]

    def run(self, engine, p: GenerationParams, put_at_start=False, *rest):
        parts = [s.strip() for s in p.prompt.split("|")]
        base, variable = parts[0], parts[1:]
        combos = []
        for n in range(2 ** len(variable)):
            selected = [variable[i] for i in range(len(variable)) if n & (1 << i)]
            combos.append(", ".join(([*selected, base] if put_at_start
                                     else [base, *selected])))
        all_images, infotexts = [], []
        first = None
        for prompt in combos:
            q = _clone(p)
            q.prompt = prompt
            q.do_not_save_grid = True  # reference prompt_matrix.py:87
            res = _run_cell(engine, q)
            if first is None:
                first = res
            all_images.extend(res.images)
            infotexts.extend(res.infotexts)
        grid = images_util.image_grid(all_images, rows=1 << (len(variable) // 2))
        # legend: active parts plain, inactive struck through (reference
        # scripts/prompt_matrix.py + modules/images.py:239)
        from sdwebui_tpu.utils.grid_annotations import draw_prompt_matrix

        grid = draw_prompt_matrix(grid, all_images[0].width,
                                  all_images[0].height, parts)
        return Processed(images=[grid] + all_images, params=p,
                         seed=first.seed, subseed=first.subseed,
                         infotexts=infotexts[:1] + infotexts,
                         all_seeds=first.all_seeds, all_subseeds=first.all_subseeds,
                         all_prompts=combos, width=p.width, height=p.height)


# ==========================================================================
# Prompts from file (reference scripts/prompts_from_file.py)
# ==========================================================================

@register_script
class PromptsFromFile(Script):
    name = "Prompts from file or textbox"
    ui_params = [
        _ui("checkbox_iterate", "Iterate seed every line", "checkbox", False),
        _ui("checkbox_iterate_batch", "Use same random seed for all lines",
            "checkbox", False),
        _ui("prompt_txt", "List of prompt inputs", "textarea", ""),
    ]

    def run(self, engine, p: GenerationParams, checkbox_iterate=False,
            checkbox_iterate_batch=False, prompt_txt="", *rest):
        lines = [l.strip() for l in str(prompt_txt).splitlines() if l.strip()]
        all_images, infotexts = [], []
        first = None
        for line in lines:
            q = _clone(p)
            q.prompt = line
            q.do_not_save_grid = True  # reference prompts_from_file.py:133
            res = _run_cell(engine, q)
            if first is None:
                first = res
            if checkbox_iterate:
                p.seed = res.all_seeds[-1] + 1 if res.all_seeds else p.seed
            all_images.extend(res.images)
            infotexts.extend(res.infotexts)
        return Processed(images=all_images, params=p,
                         seed=first.seed if first else p.seed,
                         subseed=first.subseed if first else p.subseed,
                         infotexts=infotexts,
                         all_seeds=first.all_seeds if first else [],
                         all_subseeds=first.all_subseeds if first else [],
                         all_prompts=lines, width=p.width, height=p.height)


# ==========================================================================
# Loopback (reference scripts/loopback.py)
# ==========================================================================

@register_script
class Loopback(Script):
    name = "Loopback"
    ui_params = [
        _ui("loops", "Loops", "number", 4),
        _ui("final_denoising_strength", "Final denoising strength",
            "number", 0.5),
        _ui("denoising_curve", "Denoising strength curve", "select", "Linear",
            ["Aggressive", "Linear", "Lazy"]),
    ]

    def run(self, engine, p: GenerationParams, loops=4,
            final_denoising_strength=0.5, denoising_curve="Linear", *rest):
        loops = int(loops)
        strength = p.denoising_strength or 0.75
        final = float(final_denoising_strength)
        images = []
        infotexts = []
        first = None
        current = p.init_images
        for i in range(loops):
            q = _clone(p)
            q.init_images = current
            ratio = (i + 1) / loops if loops > 1 else 1.0
            if denoising_curve == "Aggressive":
                ratio = np.sin(ratio * np.pi / 2)
            elif denoising_curve == "Lazy":
                ratio = 1 - np.cos(ratio * np.pi / 2)
            q.denoising_strength = strength + (final - strength) * ratio
            q.do_not_save_grid = True  # reference loopback.py:81
            res = engine.img2img_inner(q)
            if first is None:
                first = res
            current = [res.images[0]]
            images.append(res.images[0])
            infotexts.extend(res.infotexts)
        return Processed(images=images, params=p, seed=first.seed,
                         subseed=first.subseed, infotexts=infotexts,
                         all_seeds=first.all_seeds, all_subseeds=first.all_subseeds,
                         all_prompts=first.all_prompts,
                         width=p.width, height=p.height)


# ==========================================================================
# SD upscale (reference scripts/sd_upscale.py — tiled img2img over an
# upscaled image)
# ==========================================================================

@register_script
class SDUpscale(Script):
    name = "SD upscale"
    ui_params = [
        _ui("tile_overlap", "Tile overlap", "number", 64),
        _ui("upscaler_name", "Upscaler", "select", "Lanczos", "upscalers"),
        _ui("scale_factor", "Scale factor", "number", 2.0),
    ]

    def run(self, engine, p: GenerationParams, tile_overlap=64,
            upscaler_name="Lanczos", scale_factor=2.0, *rest):
        from sdwebui_tpu.postprocessing.upscalers import upscale

        assert p.init_images, "SD upscale needs an init image"
        init = p.init_images[0]
        if not isinstance(init, Image.Image):
            init = Image.fromarray(np.asarray(init))
        upscaled = upscale(upscaler_name, init.convert("RGB"), float(scale_factor))

        grid = images_util.split_grid(upscaled, p.width, p.height,
                                      int(tile_overlap))
        # tiles run in batches of p.batch_size like the reference
        # (scripts/sd_upscale.py:60-84) — same-shaped tiles batch into one
        # fused device program here, so this is also the TPU fast path
        slots = [(y_i, idx) for y_i, (_, _, row) in enumerate(grid.tiles)
                 for idx in range(len(row))]
        tiles = [grid.tiles[y_i][2][idx][2] for y_i, idx in slots]
        first = None
        infotexts = []
        outs = []
        bs = max(int(p.batch_size or 1), 1)
        for lo in range(0, len(tiles), bs):
            chunk = tiles[lo: lo + bs]
            q = _clone(p)
            q.init_images = list(chunk)
            q.batch_size = len(chunk)
            q.n_iter = 1
            q.width, q.height = chunk[0].width, chunk[0].height
            q.do_not_save_grid = True  # reference sd_upscale.py:54
            res = engine.img2img_inner(q)
            if first is None:
                first = res
            outs.extend(res.images[res.index_of_first_image:]
                        if res.index_of_first_image else res.images)
            infotexts.extend(res.infotexts)
        for (y_i, idx), img in zip(slots, outs):
            x, w, _ = grid.tiles[y_i][2][idx]
            grid.tiles[y_i][2][idx] = [x, w, img]
        combined = images_util.combine_grid(grid)
        return Processed(images=[combined], params=p, seed=first.seed,
                         subseed=first.subseed, infotexts=infotexts[:1],
                         all_seeds=first.all_seeds, all_subseeds=first.all_subseeds,
                         all_prompts=first.all_prompts,
                         width=combined.width, height=combined.height)


# ==========================================================================
# Outpainting (reference scripts/outpainting_mk_2.py + poor_mans_outpainting)
# ==========================================================================

def _expand_canvas(image, pixels, directions):
    """(expanded_image, mask) — new regions filled + masked for inpaint."""
    from sdwebui_tpu.utils import masking

    left = pixels if "left" in directions else 0
    right = pixels if "right" in directions else 0
    up = pixels if "up" in directions else 0
    down = pixels if "down" in directions else 0

    w, h = image.width + left + right, image.height + up + down
    canvas = Image.new("RGB", (w, h))
    canvas.paste(image, (left, up))
    mask = Image.new("L", (w, h), 255)
    mask.paste(Image.new("L", image.size, 0), (left, up))
    # fill the new area with surrounding colors so the VAE sees coherent input
    filled = masking.fill(canvas, mask)
    canvas = Image.composite(filled, canvas, mask)
    return canvas, mask, (left, up)


@register_script
class PoorMansOutpainting(Script):
    name = "Poor man's outpainting"
    ui_params = [
        _ui("pixels", "Pixels to expand", "number", 64),
        _ui("mask_blur", "Mask blur", "number", 4),
        _ui("inpainting_fill", "Masked content (0 fill/1 original/2 noise/3 nothing)",
            "number", 1),
        _ui("direction", "Outpainting direction (comma separated)", "text",
            "left, right, up, down"),
    ]

    def run(self, engine, p: GenerationParams, pixels=64, mask_blur=4,
            inpainting_fill=1, direction=("left", "right", "up", "down"), *rest):
        assert p.init_images, "outpainting needs an init image"
        init = p.init_images[0]
        if not isinstance(init, Image.Image):
            init = Image.fromarray(np.asarray(init))
        canvas, mask, _ = _expand_canvas(init.convert("RGB"), int(pixels),
                                         direction)
        q = _clone(p)
        q.init_images = [canvas]
        q.mask = mask
        q.mask_blur = int(mask_blur)
        q.inpainting_fill = int(inpainting_fill)
        q.inpaint_full_res = False
        q.width, q.height = canvas.width, canvas.height
        q.denoising_strength = p.denoising_strength or 0.8
        return engine.img2img_inner(q)


@register_script
class OutpaintingMk2(Script):
    name = "Outpainting mk2"
    ui_params = [
        _ui("pixels", "Pixels to expand", "number", 128),
        _ui("mask_blur", "Mask blur", "number", 8),
        _ui("direction", "Outpainting direction (comma separated)", "text",
            "left, right, up, down"),
        _ui("noise_q", "Fall-off exponent (lower=higher detail)", "number", 1.0),
        _ui("color_variation", "Color variation", "number", 0.05),
    ]

    def run(self, engine, p: GenerationParams, pixels=128, mask_blur=8,
            direction=("left", "right", "up", "down"),
            noise_q=1.0, color_variation=0.05, *rest):
        """Noise-matched edge extension: the new border is filled with
        source-spectrum-shaped, histogram-matched noise before the
        inpainting pass (reference scripts/outpainting_mk_2.py
        get_matched_noise; math in postprocessing/noise_match.py)."""
        from sdwebui_tpu.postprocessing.noise_match import matched_noise

        assert p.init_images, "outpainting needs an init image"
        init = p.init_images[0]
        if not isinstance(init, Image.Image):
            init = Image.fromarray(np.asarray(init))
        canvas, mask, _ = _expand_canvas(init.convert("RGB"), int(pixels),
                                         direction)
        arr = np.asarray(canvas, np.float32) / 255.0
        m = np.asarray(mask, np.float32)[..., None] / 255.0
        m3 = np.repeat(m, 3, axis=-1)
        blended = matched_noise(arr, m3, noise_q=float(noise_q),
                                color_variation=float(color_variation))
        canvas = Image.fromarray(
            np.clip(blended * 255.0, 0, 255).astype(np.uint8))

        q = _clone(p)
        q.init_images = [canvas]
        q.mask = mask
        q.mask_blur = int(mask_blur)
        q.inpainting_fill = 1
        q.inpaint_full_res = False
        q.width, q.height = canvas.width, canvas.height
        q.denoising_strength = p.denoising_strength or 0.8
        return engine.img2img_inner(q)


@register_script
class Img2ImgAlternative(Script):
    ui_params = [
        _ui("original_prompt", "Original prompt"),
        _ui("original_negative_prompt", "Original negative prompt"),
        _ui("override_steps", "Override `Sampling Steps` to the same value as `Decode steps`",
            "checkbox", True),
        _ui("st", "Decode steps", "number", 50),
        _ui("cfg", "Decode CFG scale", "number", 2.0),
    ]
    """Reverse-Euler reconstruction img2img (reference
    scripts/img2imgalt.py): recover the noise that would produce the init
    image under the ORIGINAL prompt, then denoise with the new prompt.
    Keeps composition while changing content."""

    name = "img2img alternative test"

    def run(self, engine, p, original_prompt="", original_negative_prompt="",
            override_steps=True, st=50, cfg=2.0, *rest):
        import jax.numpy as jnp
        import numpy as np

        from sdwebui_tpu.pipeline.img2img import _prepare_images_and_mask
        from sdwebui_tpu.pipeline.processing import (_build_conds,
                                                     encode_first_stage,
                                                     invert_noise)
        from sdwebui_tpu.sampling.schedulers import get_schedule

        model = engine.sd_model
        if override_steps:
            p.steps = int(st)
            p.cfg_scale = float(cfg)
        p.sampler_name = "Euler"     # the inversion is Euler-consistent

        image_arr, _ = _prepare_images_and_mask(p)
        init_latent = encode_first_stage(model, jnp.asarray(image_arr))

        orig = _clone(p)
        orig.prompt = original_prompt or p.prompt
        orig.negative_prompt = original_negative_prompt or p.negative_prompt
        orig.batch_size = init_latent.shape[0]
        orig.all_prompts = [orig.prompt] * orig.batch_size
        orig.all_negative_prompts = [orig.negative_prompt] * orig.batch_size
        sched = _build_conds(model, orig, p.steps + 1, prompt=orig.prompt)

        sigmas = get_schedule("Automatic", p.steps, model.disc,
                              is_sdxl=model.is_sdxl)
        noise = invert_noise(model, sched, init_latent, sigmas[::-1].copy())

        p.init_noise_override = np.asarray(noise)
        p.denoising_strength = 1.0
        return engine.img2img_inner(p)


# ==========================================================================
# Custom code (reference scripts/custom_code.py — gated behind --allow-code,
# the same explicit opt-in the reference requires)
# ==========================================================================

@register_script
class CustomCode(Script):
    ui_params = [
        _ui("code", "Python code", "textarea", ""),
        _ui("indent_level", "Shift+Enter indent level", "number", 0),
    ]
    name = "Custom code"

    def run(self, engine, p: GenerationParams, code="", indent_level=0, *rest):
        from types import ModuleType

        from sdwebui_tpu.server.cmd_flags import flag

        if not flag("allow_code"):
            raise RuntimeError(
                "Custom code requires the server to run with --allow-code "
                "(reference scripts/custom_code.py gate)")

        display_data = {"images": None, "seed": None, "info": None}

        def display(imgs, s=None, i=None):
            display_data.update(images=list(imgs), seed=s, info=i)

        module = ModuleType("customcode")
        module.p = p
        module.engine = engine
        module.display = display
        module.GenerationParams = GenerationParams
        module.Processed = Processed

        indent = " " * int(indent_level or 0)
        lines = [indent + line for line in str(code).splitlines()]
        body = "def __webuitemp__():\n" + "\n".join("    " + l for l in lines) \
            + "\n__webuitemp__result__ = __webuitemp__()"
        exec(compile(body, "<custom code>", "exec"), module.__dict__)
        result = module.__dict__.get("__webuitemp__result__")

        if isinstance(result, Processed):
            return result
        if display_data["images"] is None:
            res = _run_cell(engine, p)
            return res
        imgs = display_data["images"]
        return Processed(images=imgs, params=p,
                         seed=display_data["seed"] if display_data["seed"]
                         is not None else p.seed,
                         subseed=p.subseed,
                         infotexts=[display_data["info"] or ""] * len(imgs),
                         all_seeds=[p.seed], all_subseeds=[p.subseed],
                         all_prompts=[p.prompt], width=p.width, height=p.height)


@register_script
class MainUIPostprocessing(Script):
    """Main-UI postprocessing accordion (reference
    opts.postprocessing_enable_in_main_ui, modules/shared_options.py:413):
    when a txt2img/img2img request carries a `postprocessing` dict, the
    named Extras operations run over each generated image via the
    postprocess_image hook — before grid assembly, matching the reference's
    scripts_postproc ordering (modules/processing.py postprocess_image)."""

    name = "postprocessing (main UI)"
    alwayson = True

    def postprocess_image(self, p, image, *args):
        pp = dict(getattr(p, "postprocessing", None) or {})
        if not pp:
            return image
        from sdwebui_tpu.postprocessing.stages import StageArgs, run_stages
        from sdwebui_tpu.utils.options import opts

        enabled = set(pp.pop("enable", None)
                      or opts.get("postprocessing_enable_in_main_ui", [])
                      or [])
        if not enabled:
            return image
        out = run_stages(image, StageArgs.from_obj(pp), enabled=enabled)
        names = ", ".join(sorted(enabled))
        p.extra_generation_params.setdefault("Postprocessing", names)
        return out
