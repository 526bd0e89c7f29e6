from sdwebui_tpu.scripts.framework import (  # noqa: F401
    Script, ScriptRunner, list_selectable_scripts, register_script,
)
