"""Extras postprocessing stage chain (Upscale / GFPGAN / CodeFormer).

One implementation shared by two callers:

* POST /sdapi/v1/extra-single-image and /extra-batch-images (the Extras
  tab path) — all stages run, minus opts.postprocessing_disable_in_extras
  (reference modules/scripts_postprocessing.py:141
  scripts_in_preferred_order).
* The main-UI postprocessing accordion: when
  opts.postprocessing_enable_in_main_ui names operations, txt2img/img2img
  requests may carry a `postprocessing` dict and the named stages run over
  every generated image before grid assembly (reference
  modules/shared_options.py:413 + modules/processing.py postprocess_image
  script hook), wired through the always-on script in scripts/builtin.py.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class StageArgs:
    """Stage knobs; field names/defaults mirror the Extras API request so
    both callers share one argument surface."""

    resize_mode: int = 0          # 0 = scale by, 1 = scale to
    gfpgan_visibility: float = 0.0
    codeformer_visibility: float = 0.0
    codeformer_weight: float = 0.0
    upscaling_resize: float = 2.0
    upscaling_resize_w: int = 512
    upscaling_resize_h: int = 512
    upscaling_crop: bool = True
    upscaler_1: str = "None"
    upscaler_2: str = "None"
    extras_upscaler_2_visibility: float = 0.0
    max_side_length: int = 0
    upscale_first: bool = False

    @classmethod
    def from_obj(cls, obj) -> "StageArgs":
        """Build from any dict / pydantic request / namespace carrying a
        subset of the fields."""
        get = (obj.get if isinstance(obj, dict)
               else lambda k, d=None: getattr(obj, k, d))
        kw = {}
        for f in dataclasses.fields(cls):
            v = get(f.name, None)
            if v is None:
                continue
            want = type(f.default)
            kw[f.name] = v if isinstance(v, want) else want(v)
        return cls(**kw)


def _run_upscaler(args: StageArgs, name: str, im, sc: float):
    """Scale-by mode honors max_side_length: if either output side would
    exceed it, shrink the target so the larger side equals the limit
    (reference scripts/postprocessing_upscale.py:15,94-99)."""
    from sdwebui_tpu.postprocessing.upscalers import upscale

    if (args.resize_mode != 1 and args.max_side_length
            and max(im.size) * sc > args.max_side_length):
        w, h = im.width * sc, im.height * sc
        lim = args.max_side_length
        if h > w and h > lim:
            w, h = lim * w // h, lim
        elif w > lim:
            w, h = lim, lim * h // w
        im = upscale(name, im, max(w / im.width, h / im.height))
        return im.resize((int(w), int(h)))
    return upscale(name, im, sc)


def _stage_upscale(args: StageArgs, im):
    from PIL import Image

    if args.resize_mode == 1:
        scale = max(args.upscaling_resize_w / im.width,
                    args.upscaling_resize_h / im.height)
    else:
        scale = args.upscaling_resize
    out = _run_upscaler(args, args.upscaler_1, im, scale)
    # secondary upscaler blended over the first by visibility
    # (reference scripts/postprocessing_upscale.py:155-160)
    if (args.upscaler_2 not in (None, "", "None")
            and args.extras_upscaler_2_visibility > 0):
        second = _run_upscaler(args, args.upscaler_2, im, scale)
        if second.size != out.size:
            second = second.resize(out.size)
        out = Image.blend(out, second.convert(out.mode),
                          args.extras_upscaler_2_visibility)
    if args.resize_mode == 1 and args.upscaling_crop:
        left = (out.width - args.upscaling_resize_w) // 2
        top = (out.height - args.upscaling_resize_h) // 2
        out = out.crop((left, top, left + args.upscaling_resize_w,
                        top + args.upscaling_resize_h))
    return out


def _stage_gfpgan(args: StageArgs, im):
    if args.gfpgan_visibility > 0:
        from sdwebui_tpu.postprocessing import faces as faces_mod

        im = faces_mod.restore_faces(im, "GFPGAN",
                                     visibility=args.gfpgan_visibility)
    return im


def _stage_codeformer(args: StageArgs, im):
    if args.codeformer_visibility > 0:
        from sdwebui_tpu.postprocessing import faces as faces_mod

        im = faces_mod.restore_faces(
            im, "CodeFormer", weight=args.codeformer_weight,
            visibility=args.codeformer_visibility)
    return im


STAGES = {"Upscale": _stage_upscale, "GFPGAN": _stage_gfpgan,
          "CodeFormer": _stage_codeformer}


def run_stages(img, args: StageArgs, enabled: set | None = None):
    """Run the stage chain over one PIL image.

    enabled=None → Extras-tab semantics: every stage runs minus
    opts.postprocessing_disable_in_extras.  A set → main-UI semantics:
    exactly the named operations run.  Stage order follows
    opts.postprocessing_operation_order first, then the default order.
    """
    from sdwebui_tpu.utils.options import opts

    preferred = list(opts.get("postprocessing_operation_order", []) or [])
    order = [n for n in preferred if n in STAGES] + \
        [n for n in STAGES if n not in preferred]
    if enabled is None:
        disabled = set(opts.get("postprocessing_disable_in_extras", []) or [])
        active = [n for n in order if n not in disabled]
    else:
        active = [n for n in order if n in enabled]
    out = img
    for name in active:
        out = STAGES[name](args, out)
    return out
