from sdwebui_tpu.rng.philox import PhiloxGenerator  # noqa: F401
from sdwebui_tpu.rng.image_rng import (ImageRNG, TorchCPUGenerator,  # noqa: F401
                                       create_rng, slerp)
