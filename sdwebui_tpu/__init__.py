"""sdwebui_tpu — a TPU-native Stable Diffusion generation framework.

A from-scratch rebuild of the capabilities of AUTOMATIC1111/stable-diffusion-webui
(reference layout documented in SURVEY.md) designed for TPU hardware:

- compute path: JAX / XLA / Pallas kernels / pjit over `jax.sharding.Mesh`
- functional model cores (pure param pytrees, no monkey-patching)
- sampling as `lax.scan`-able pure solver steps
- host orchestration (HTTP API, image IO, prompt parsing) in Python,
  schema-compatible with the reference's `/sdapi/v1` REST surface.

The importable package name is ``sdwebui_tpu`` (the project name
"stable-diffusion-webui_tpu" is not a legal Python identifier).
"""

__version__ = "0.1.0"
