from sdwebui_tpu.ops.attention import attention  # noqa: F401
from sdwebui_tpu.ops.norms import group_norm, layer_norm  # noqa: F401
