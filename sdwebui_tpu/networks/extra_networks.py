"""`<lora:name:mult>` / `<hypernet:name:mult>` prompt-tag parsing + the
per-generation activation registry (reference modules/extra_networks.py).

Tags are stripped from the prompt before tokenization; activation maps to
functional param transforms (networks/lora.py) applied for the duration of
one generation — no global mutation."""

from __future__ import annotations

import dataclasses
import os
import re

_RE_NETWORK = re.compile(r"<(\w+):([^>]+)>")


@dataclasses.dataclass
class ExtraNetworkParams:
    kind: str
    items: list

    @property
    def name(self) -> str:
        return self.items[0] if self.items else ""

    def mult(self, index: int = 1, default: float = 1.0) -> float:
        try:
            return float(self.items[index])
        except (IndexError, ValueError):
            return default


def parse_prompt(prompt: str):
    """prompt → (clean_prompt, [ExtraNetworkParams])."""
    found = []

    def strip(m):
        found.append(ExtraNetworkParams(m.group(1),
                                        [x.strip() for x in m.group(2).split(":")]))
        return ""

    clean = _RE_NETWORK.sub(strip, prompt)
    return clean, found


def parse_prompts(prompts: list):
    """First prompt defines the networks (reference behaviour: one network
    set per batch)."""
    res = []
    nets = None
    for p in prompts:
        clean, found = parse_prompt(p)
        if nets is None:
            nets = found
        res.append(clean)
    return res, nets or []


class LoraRegistry:
    """Available .safetensors/.pt LoRA files (models/Lora)."""

    def __init__(self, dirs=("models/Lora", "models/LyCORIS")):
        self.dirs = [d for d in dirs]
        self.files: dict[str, str] = {}
        self.refresh()

    def refresh(self):
        self.files = {}
        for d in self.dirs:
            if not os.path.isdir(d):
                continue
            for root, _, files in os.walk(d):
                for fn in files:
                    if fn.lower().endswith((".safetensors", ".pt", ".ckpt")):
                        from sdwebui_tpu.utils.fs import visible

                        path = os.path.join(root, fn)
                        if not visible(path):
                            continue   # opts.list_hidden_files
                        name = os.path.splitext(fn)[0]
                        self.files[name] = path

    def load(self, name: str) -> dict:
        path = self.files.get(name)
        if path is None:
            raise FileNotFoundError(f"LoRA {name!r} not found in {self.dirs}")
        if path.endswith(".safetensors"):
            from sdwebui_tpu.loader.safetensors_io import read_state_dict

            return read_state_dict(path)
        from sdwebui_tpu.loader.torch_ckpt import load_torch_checkpoint

        return load_torch_checkpoint(path)


_default_registry: LoraRegistry | None = None
_merge_cache: dict = {}


def default_registry() -> LoraRegistry:
    global _default_registry
    if _default_registry is None:
        _default_registry = LoraRegistry()
    return _default_registry


_hypernet_registry = None


def hypernet_registry():
    global _hypernet_registry
    if _hypernet_registry is None:
        from sdwebui_tpu.networks.hypernetwork import HypernetworkRegistry

        _hypernet_registry = HypernetworkRegistry()
    return _hypernet_registry


def activate(model, prompt: str, registry: LoraRegistry | None = None):
    """Parse tags, strip them, return (clean_prompt, model, hypernet).

    hypernet: None or ((tree, meta)) ready for the jitted UNet.  Merged LoRA
    trees are cached per (model identity, network set) so repeated
    generations with the same LoRAs skip the merge (the reference instead
    mutates weights and tracks 'loaded networks')."""
    from sdwebui_tpu.utils.options import opts as _opts

    clean, nets = parse_prompt(prompt)
    lora_nets = [n for n in nets if n.kind in ("lora", "lyco")]
    hn_nets = [n for n in nets if n.kind == "hypernet"]

    default_mult = float(_opts.get("extra_networks_default_multiplier", 1.0))
    if not hn_nets:
        # opts.sd_hypernetwork "Add hypernetwork to prompt" (reference
        # shared_options extra_networks section): implicit <hypernet:...>
        global_hn = _opts.get("sd_hypernetwork", "None")
        if global_hn and global_hn != "None":
            hn_nets = [ExtraNetworkParams("hypernet",
                                          [str(global_hn)])]

    hypernet = None
    if hn_nets:
        from sdwebui_tpu.networks.hypernetwork import load_hypernetwork

        reg = hypernet_registry()
        net = hn_nets[0]
        path = reg.files.get(net.name)
        if path is None:
            raise FileNotFoundError(f"hypernetwork {net.name!r} not found")
        tree, activation = load_hypernetwork(path)
        hypernet = (tree, (activation, net.mult(1, default_mult), False))

    if not lora_nets:
        return clean, model, hypernet
    key = (id(model), default_mult,
           tuple((n.kind, tuple(n.items)) for n in lora_nets))
    if key in _merge_cache:
        return clean, _merge_cache[key], hypernet
    merged = apply_to_model(model, lora_nets, registry or default_registry())
    if len(_merge_cache) > 4:
        _merge_cache.clear()
    _merge_cache[key] = merged
    return clean, merged, hypernet


def register_bundle_embeddings(model, lora_sd: dict):
    """kohya LoRA files may bundle textual-inversion embeddings under
    `bundle_emb.<name>.<tensor>` keys (reference networks.py
    bundle_embeddings); register them with the loaded conditioner so the
    trigger word works as soon as the LoRA is activated."""
    db = getattr(model.conditioner, "embedding_db", None)
    if db is None:
        return 0
    import numpy as np

    from sdwebui_tpu.networks.textual_inversion import Embedding

    bundles: dict = {}
    for k, v in lora_sd.items():
        if not k.startswith("bundle_emb."):
            continue
        name, tensor_key = k[len("bundle_emb."):].split(".", 1)
        bundles.setdefault(name, {})[tensor_key] = v
    for name, tensors in bundles.items():
        if name in db.embeddings:
            continue
        if "clip_l" in tensors:     # SDXL dual embedding
            emb = Embedding(name,
                            np.atleast_2d(np.asarray(tensors["clip_l"], np.float32)),
                            vec_g=np.atleast_2d(np.asarray(tensors["clip_g"],
                                                           np.float32)))
        else:
            key = "emb_params" if "emb_params" in tensors else \
                ("string_to_param.*" if "string_to_param.*" in tensors
                 else next(iter(tensors)))
            emb = Embedding(name, np.atleast_2d(np.asarray(tensors[key],
                                                           np.float32)))
        db.register(emb)
    return len(bundles)


def apply_to_model(model, nets: list, registry: LoraRegistry):
    """Activate `<lora:...>` tags: returns a model copy with merged UNet and
    text-encoder params (reference network_apply_weights, functionally).

    `<lora:name:te_mult:unet_mult>`: one arg applies to both (reference
    extra_networks_lora.py semantics)."""
    from sdwebui_tpu.networks.lora import apply_loras

    loras_unet, loras_te = [], []
    for net in nets:
        if net.kind not in ("lora", "lyco"):
            continue
        from sdwebui_tpu.utils.options import opts as _opts

        sd = registry.load(net.name)
        register_bundle_embeddings(model, sd)
        te_mult = net.mult(
            1, float(_opts.get("extra_networks_default_multiplier", 1.0)))
        unet_mult = net.mult(2, te_mult)
        loras_unet.append((sd, unet_mult))
        loras_te.append((sd, te_mult))

    if not loras_unet:
        return model

    unet_params, n1, um1 = apply_loras(
        model.unet_params, loras_unet, "lora_unet_",
        hp_flat=getattr(model, "unet_params_hp", None))
    model = model.with_unet_params(unet_params)

    clip_params, n2, _ = apply_loras(model.conditioner.params, loras_te, "lora_te_")
    if n2 == 0:
        clip_params, n2, _ = apply_loras(model.conditioner.params, loras_te,
                                         "lora_te1_")
    if n2:
        import dataclasses as dc
        import copy

        cond = copy.copy(model.conditioner)
        cond.params = clip_params
        model = dc.replace(model, conditioner=cond)

    # SDXL second text encoder (kohya lora_te2_ prefix)
    if model.conditioner2 is not None:
        clip2_params, n3, _ = apply_loras(model.conditioner2.params, loras_te,
                                          "lora_te2_")
        if n3:
            import dataclasses as dc
            import copy

            cond2 = copy.copy(model.conditioner2)
            cond2.params = clip2_params
            model = dc.replace(model, conditioner2=cond2)
    return model
