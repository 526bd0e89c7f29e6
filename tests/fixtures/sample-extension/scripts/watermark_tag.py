# A sample third-party extension script written against the reference's
# script API (modules.scripts / modules.script_callbacks) — exercises the
# compat shim and policy-gated loading (tests/test_extensions.py).
from modules import script_callbacks, scripts, shared


class WatermarkTag(scripts.Script):
    name = "sample watermark tag"

    def title(self):
        return "Sample watermark tag"

    def run(self, engine, p, tag="sampled", *rest):
        from sdwebui_tpu.pipeline.processing import process_txt2img

        p.extra_generation_params["Watermark tag"] = tag
        return process_txt2img(engine.sd_model if hasattr(engine, "sd_model")
                               else engine, p)


SEEN = {"saves": 0, "basedir": scripts.basedir(), "opts": shared.opts}


def _on_image_saved(params):
    SEEN["saves"] += 1


script_callbacks.on_image_saved(_on_image_saved)
