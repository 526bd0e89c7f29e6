from sdwebui_tpu.parallel.mesh import MeshRuntime, get_runtime, set_runtime  # noqa: F401
