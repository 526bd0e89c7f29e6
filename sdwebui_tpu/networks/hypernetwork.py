"""Hypernetworks: per-dimension MLP pairs applied to attention k/v context
(reference modules/hypernetworks/hypernetwork.py — module structure,
`apply_single_hypernetwork` :358).

A hypernetwork file stores, per context dim (768/1024/320/640/1280…), a
(k_module, v_module) pair of small MLPs; at runtime the cross-attention
context is transformed: ctx' = ctx + multiplier·MLP(ctx).  Loading parses
the reference .pt layout; params become plain trees consumed inside the
jitted UNet (models/unet.py plumbs `hypernet` through)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _act(name: str):
    return {
        "linear": lambda x: x, "relu": jax.nn.relu, "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
        "elu": jax.nn.elu, "swish": jax.nn.silu, "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid, "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    }.get(name, lambda x: x)


def parse_dropout_structure(layer_structure, use_dropout: bool,
                            last_layer_dropout: bool):
    """Per-layer dropout probabilities from the create-UI booleans (reference
    modules/hypernetworks/hypernetwork.py:129-141): position 0 (the input)
    and the final position never drop; interior hidden layers drop at 0.3;
    the one before the output drops only when last_layer_dropout.
    [1,2,1] → [0,0,0] (off) and [1,2,2,1] → [0,0.3,0.3,0] / [0,0.3,0,0]."""
    layer_structure = list(layer_structure or (1, 2, 1))
    if not use_dropout:
        return [0.0] * len(layer_structure)
    probs = [0.0] + [0.3] * (len(layer_structure) - 3)
    probs.append(0.3 if last_layer_dropout else 0.0)
    probs.append(0.0)
    return probs


def apply_hypernetwork_module(layers, x, activation: str = "linear",
                              multiplier: float = 1.0,
                              activate_output: bool = False,
                              dropout_structure=None, rng=None):
    """layers: list/tuple of {"weight","bias"} array dicts (jit-safe pytree;
    activation/multiplier are static metadata).  ctx' = ctx + mult·MLP(ctx).

    dropout_structure/rng: training-only inverted dropout after each hidden
    layer's activation(+layer-norm), probability dropout_structure[i+1]
    (reference HypernetworkModule composition, hypernetwork.py:67-69).
    Inference callers pass neither, so generation never drops."""
    h = x.astype(jnp.float32)
    act = _act(activation)
    n = len(layers)
    for i, layer in enumerate(layers):
        h = h @ layer["weight"].astype(jnp.float32)
        if "bias" in layer:
            h = h + layer["bias"].astype(jnp.float32)
        if i < n - 1 or activate_output:
            h = act(h)
        if "ln_weight" in layer:     # add_layer_norm (after activation,
            mean = jnp.mean(h, axis=-1, keepdims=True)   # reference order)
            var = jnp.var(h, axis=-1, keepdims=True)
            h = (h - mean) / jnp.sqrt(var + 1e-5)
            h = h * layer["ln_weight"].astype(jnp.float32) \
                + layer["ln_bias"].astype(jnp.float32)
        p = float(dropout_structure[i + 1]) if dropout_structure is not None \
            and rng is not None and i + 1 < len(dropout_structure) else 0.0
        if p > 0.0:
            keep = jax.random.bernoulli(
                jax.random.fold_in(rng, i), 1.0 - p, h.shape)
            h = jnp.where(keep, h / (1.0 - p), 0.0)
    return (x.astype(jnp.float32) + h * multiplier).astype(x.dtype)


def _init_weight(rng, cin: int, cout: int, weight_init: str) -> np.ndarray:
    """Reference HypernetworkModule init variants
    (modules/hypernetworks/hypernetwork.py:54-74)."""
    if weight_init == "Normal" or weight_init == "Default":
        w = rng.standard_normal((cin, cout)) * 0.01
    elif weight_init == "KaimingUniform":
        bound = np.sqrt(6.0 / cin)
        w = rng.uniform(-bound, bound, (cin, cout))
    elif weight_init == "KaimingNormal":
        w = rng.standard_normal((cin, cout)) * np.sqrt(2.0 / cin)
    elif weight_init == "XavierUniform":
        bound = np.sqrt(6.0 / (cin + cout))
        w = rng.uniform(-bound, bound, (cin, cout))
    elif weight_init == "XavierNormal":
        w = rng.standard_normal((cin, cout)) * np.sqrt(2.0 / (cin + cout))
    else:
        raise ValueError(f"unknown weight init {weight_init!r}")
    return w.astype(np.float32)


def init_module(dim: int, layer_structure=(1, 2, 1), seed: int = 0,
                weight_init: str = "Normal",
                add_layer_norm: bool = False) -> list:
    """Random-init MLP layer list (reference HypernetworkModule __init__)."""
    rng = np.random.default_rng(seed)
    dims = [int(dim * m) for m in layer_structure]
    layers = []
    for cin, cout in zip(dims[:-1], dims[1:]):
        layer = {
            "weight": _init_weight(rng, cin, cout, weight_init),
            "bias": np.zeros((cout,), np.float32),
        }
        if add_layer_norm:
            layer["ln_weight"] = np.ones((cout,), np.float32)
            layer["ln_bias"] = np.zeros((cout,), np.float32)
        layers.append(layer)
    return layers


def create_hypernetwork(dims=(768, 320, 640, 1280), layer_structure=(1, 2, 1),
                        seed: int = 0, weight_init: str = "Normal",
                        add_layer_norm: bool = False) -> dict:
    """{dim_str: (k_layers, v_layers)} — arrays-only pytree."""
    out = {}
    for i, d in enumerate(dims):
        out[str(d)] = (init_module(d, layer_structure, seed + 2 * i,
                                   weight_init, add_layer_norm),
                       init_module(d, layer_structure, seed + 2 * i + 1,
                                   weight_init, add_layer_norm))
    return out


# --------------------------------------------------------------------------
# serialization (reference .pt layout: {dim: [k_sd, v_sd], 'layer_structure',
# 'activation_func', 'name', 'step', ...})
# --------------------------------------------------------------------------

def save_hypernetwork(hn: dict, path: str, name: str = "", step: int = 0,
                      layer_structure=(1, 2, 1), activation="linear",
                      dropout_structure=None):
    from sdwebui_tpu.loader.safetensors_io import write_safetensors

    tensors = {}
    for dim, (k_mod, v_mod) in hn.items():
        for tag, mod in (("k", k_mod), ("v", v_mod)):
            for li, layer in enumerate(mod):
                for kind in ("weight", "bias", "ln_weight", "ln_bias"):
                    if kind in layer:
                        tensors[f"{dim}.{tag}.linear.{li}.{kind}"] = \
                            np.asarray(layer[kind])
    meta = {
        "name": name, "step": str(step),
        "layer_structure": ",".join(str(x) for x in layer_structure),
        "activation_func": activation}
    if dropout_structure is not None:
        # training provenance (the reference stores use_dropout/
        # dropout_structure in the .pt, hypernetwork.py:229-231)
        meta["dropout_structure"] = ",".join(
            str(x) for x in dropout_structure)
    write_safetensors(path, tensors, metadata=meta)


def _maybe_print_hn_info(path: str, tree: dict, activation: str):
    """opts.print_hypernet_extra (reference shared_options system section):
    log layer dims + activation when a hypernetwork loads."""
    from sdwebui_tpu.utils.options import opts as _opts

    if _opts.get("print_hypernet_extra", False):
        import os as _os

        dims = ", ".join(sorted(tree.keys(), key=lambda d: int(d)))
        print(f"Hypernetwork {_os.path.basename(path)}: dims=[{dims}] "
              f"activation={activation}", flush=True)


def load_hypernetwork(path: str) -> dict:
    """.safetensors (ours) or .pt (reference layout via restricted
    unpickler)."""
    if path.endswith(".safetensors"):
        from sdwebui_tpu.loader.safetensors_io import SafetensorsFile

        with SafetensorsFile(path) as f:
            meta = f.metadata
            activation = meta.get("activation_func", "linear")
            out: dict = {}
            for key in f.keys():
                dim, tag, _, li, kind = key.split(".")
                mods = out.setdefault(dim, ([], []))
                mod = mods[0] if tag == "k" else mods[1]
                li = int(li)
                while len(mod) <= li:
                    mod.append({})
                mod[li][kind] = np.asarray(f.tensor(key))
            _maybe_print_hn_info(path, out, activation)
            return out, activation

    from sdwebui_tpu.loader.torch_ckpt import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    # reference layout: keys like "768.0.linear.0.weight" after flattening?
    # torch.save of the dict {768: [k_sd, v_sd]} → our unpickler flattens
    # only tensor leaves; reconstruct by key pattern
    out = {}
    for key, v in sd.items():
        parts = str(key).split(".")
        if len(parts) < 4:
            continue
        dim = parts[0].lstrip("(").rstrip(",)")
        tag_idx = parts[1]
        mods = out.setdefault(dim, ([], []))
        mod = mods[0] if tag_idx in ("0", "k") else mods[1]
        li = int(parts[-2])
        while len(mod) <= li:
            mod.append({})
        arr = np.asarray(v)
        if parts[-1] == "weight":
            arr = arr.T  # torch (out,in) → (in,out)
        mod[li][parts[-1]] = arr
    return out, "linear"


class HypernetworkRegistry:
    def __init__(self, dirs=("models/hypernetworks",)):
        self.dirs = list(dirs)
        self.files: dict[str, str] = {}
        self.refresh()

    def refresh(self):
        self.files = {}
        for d in self.dirs:
            if not os.path.isdir(d):
                continue
            for fn in sorted(os.listdir(d)):
                if fn.lower().endswith((".pt", ".safetensors")):
                    self.files[os.path.splitext(fn)[0]] = os.path.join(d, fn)
