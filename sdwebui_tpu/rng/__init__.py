from sdwebui_tpu.rng.philox import PhiloxGenerator  # noqa: F401
from sdwebui_tpu.rng.image_rng import ImageRNG, slerp  # noqa: F401
