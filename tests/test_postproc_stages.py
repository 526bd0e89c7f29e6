"""Unit tests for the shared postprocessing stage chain
(postprocessing/stages.py) and the main-UI always-on hook
(scripts/builtin.py MainUIPostprocessing).  Reference:
modules/scripts_postprocessing.py + shared_options.py:413."""

import numpy as np
from PIL import Image

from sdwebui_tpu.postprocessing.stages import STAGES, StageArgs, run_stages


def _img(size=(32, 32)):
    rng = np.random.default_rng(0)
    return Image.fromarray(
        rng.integers(0, 255, (*size, 3)).astype(np.uint8))


def test_stageargs_from_dict_coerces():
    a = StageArgs.from_obj({"upscaling_resize": 2, "upscaler_1": "Lanczos",
                            "gfpgan_visibility": 1})
    assert a.upscaling_resize == 2.0 and isinstance(a.upscaling_resize, float)
    assert a.gfpgan_visibility == 1.0
    assert a.upscaler_1 == "Lanczos"
    assert a.codeformer_visibility == 0.0  # default


def test_stageargs_from_namespace():
    class Req:
        upscaler_1 = "Nearest"
        upscaling_resize = 3.0

    a = StageArgs.from_obj(Req())
    assert a.upscaler_1 == "Nearest" and a.upscaling_resize == 3.0


def test_run_stages_enabled_set_semantics():
    a = StageArgs(upscaler_1="Lanczos", upscaling_resize=2.0)
    out = run_stages(_img(), a, enabled={"Upscale"})
    assert out.size == (64, 64)
    # empty set -> nothing runs even though args ask for upscale
    assert run_stages(_img(), a, enabled=set()).size == (32, 32)
    # unknown names are ignored
    assert run_stages(_img(), a, enabled={"NotAStage"}).size == (32, 32)


def test_run_stages_extras_semantics_disable(monkeypatch):
    from sdwebui_tpu.utils.options import opts

    a = StageArgs(upscaler_1="Lanczos", upscaling_resize=2.0)
    monkeypatch.setitem(opts.data, "postprocessing_disable_in_extras",
                        ["Upscale"])
    assert run_stages(_img(), a, enabled=None).size == (32, 32)
    # ...but the disable list only applies to Extras semantics
    assert run_stages(_img(), a, enabled={"Upscale"}).size == (64, 64)


def test_run_stages_operation_order(monkeypatch):
    """opts.postprocessing_operation_order reorders the chain (reference
    scripts_in_preferred_order)."""
    from sdwebui_tpu.utils.options import opts

    calls = []
    orig = dict(STAGES)

    def spy(name):
        def f(args, im):
            calls.append(name)
            return orig[name](args, im)
        return f

    monkeypatch.setitem(STAGES, "Upscale", spy("Upscale"))
    monkeypatch.setitem(STAGES, "GFPGAN", spy("GFPGAN"))
    monkeypatch.setitem(STAGES, "CodeFormer", spy("CodeFormer"))
    monkeypatch.setitem(opts.data, "postprocessing_operation_order",
                        ["CodeFormer", "Upscale"])
    run_stages(_img(), StageArgs(), enabled=None)
    assert calls == ["CodeFormer", "Upscale", "GFPGAN"]


def test_main_ui_postprocessing_hook():
    import sdwebui_tpu.scripts.builtin  # noqa: F401  (registers)
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.scripts.framework import get_runner

    runner = get_runner()
    assert any(type(s).__name__ == "MainUIPostprocessing"
               for s in runner.alwayson_scripts)
    p = GenerationParams(prompt="x", postprocessing={
        "enable": ["Upscale"], "upscaler_1": "Lanczos",
        "upscaling_resize": 2.0})
    out = runner.postprocess_image(p, _img())
    assert out.size == (64, 64)
    assert p.extra_generation_params.get("Postprocessing") == "Upscale"
    # empty dict -> pass-through
    p2 = GenerationParams(prompt="x")
    assert runner.postprocess_image(p2, _img()).size == (32, 32)


def test_register_alwayson_idempotent():
    """Re-registering (module re-import patterns) must not duplicate the
    runner entry."""
    from sdwebui_tpu.scripts.builtin import MainUIPostprocessing
    from sdwebui_tpu.scripts.framework import get_runner, register_script

    n_before = len(get_runner().alwayson_scripts)
    register_script(MainUIPostprocessing)
    assert len(get_runner().alwayson_scripts) == n_before
