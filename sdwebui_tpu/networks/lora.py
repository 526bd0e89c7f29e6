"""LoRA / LyCORIS as pure param-tree transformations.

The reference merges LoRA deltas into module weights in-place with CPU
backups (extensions-builtin/Lora/networks.py:411-542).  Here application is
functional: ``apply_loras(params, [(lora_sd, mult), ...]) → new params`` —
deltas are computed on-device (bf16 matmuls) and added to a fresh tree; the
base tree is untouched, so "restore" is dropping a reference and jit never
retraces (params are arguments).

Supported algebras (reference module_types, networks.py:27-36):
  lora (incl. conv), hada, ia3, lokr, full, norm, glora, oft/coft.

Key naming: kohya/compvis ``lora_unet_<path>_<with>_<underscores>`` and
``lora_te_text_model_...``; diffusers-style SDXL names are translated.
Matching against the actual param tree resolves underscore ambiguity.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from sdwebui_tpu.utils.pytree import flatten, unflatten


# --------------------------------------------------------------------------
# key resolution
# --------------------------------------------------------------------------

def build_path_lookup(params: dict) -> dict:
    """underscore-joined module path → dotted tree path (module = node that
    owns a 'weight' leaf)."""
    out = {}
    for path in flatten(params):
        if path.endswith(".weight"):
            module = path[: -len(".weight")]
            out[module.replace(".", "_")] = module
    return out


_DIFFUSERS_UNET = [
    (re.compile(r"^down_blocks_(\d+)_attentions_(\d+)_"),
     lambda m: f"input_blocks_{3 * int(m.group(1)) + int(m.group(2)) + 1}_1_"),
    (re.compile(r"^down_blocks_(\d+)_resnets_(\d+)_"),
     lambda m: f"input_blocks_{3 * int(m.group(1)) + int(m.group(2)) + 1}_0_"),
    (re.compile(r"^mid_block_attentions_0_"), lambda m: "middle_block_1_"),
    (re.compile(r"^mid_block_resnets_(\d+)_"),
     lambda m: f"middle_block_{2 * int(m.group(1))}_"),
    (re.compile(r"^up_blocks_(\d+)_attentions_(\d+)_"),
     lambda m: f"output_blocks_{3 * int(m.group(1)) + int(m.group(2))}_1_"),
    (re.compile(r"^up_blocks_(\d+)_resnets_(\d+)_"),
     lambda m: f"output_blocks_{3 * int(m.group(1)) + int(m.group(2))}_0_"),
    (re.compile(r"^down_blocks_(\d+)_downsamplers_0_conv"),
     lambda m: f"input_blocks_{3 * (int(m.group(1)) + 1)}_0_op"),
    (re.compile(r"^up_blocks_(\d+)_upsamplers_0_conv"),
     lambda m: f"output_blocks_{3 * int(m.group(1)) + 2}_{1 if int(m.group(1)) == 0 else 2}_conv"),
]

_DIFFUSERS_RENAMES = [
    ("_to_out_0", "_to_out_0"), ("proj_in", "proj_in"),
    ("_time_emb_proj", "_emb_layers_1"), ("_conv1", "_in_layers_2"),
    ("_conv2", "_out_layers_3"), ("_conv_shortcut", "_skip_connection"),
]


def normalize_unet_key(key: str) -> str:
    for pat, repl in _DIFFUSERS_UNET:
        m = pat.match(key)
        if m:
            key = pat.sub(repl(m), key, count=1)
            break
    for a, b in _DIFFUSERS_RENAMES:
        key = key.replace(a, b)
    return key


def resolve_module(key: str, lookup: dict) -> str | None:
    """lora module name (underscores) → dotted param-tree path."""
    if key in lookup:
        return lookup[key]
    # kohya text-encoder keys carry the torch module root our trees omit
    if key.startswith("text_model_") and key[len("text_model_"):] in lookup:
        return lookup[key[len("text_model_"):]]
    k2 = normalize_unet_key(key)
    return lookup.get(k2)


# --------------------------------------------------------------------------
# delta computation (torch OIHW/(O,I) layout in, converted at the end)
# --------------------------------------------------------------------------

def _to_2d(w):
    return w.reshape(w.shape[0], -1)


def _compute_delta_torch_layout(mods: dict, weight_shape_torch, mult: float,
                                orig_torch_fn=None):
    """mods: suffix → np array (torch layout). Returns delta in torch layout
    or ("ia3", vector) style special ops. None if unrecognized.
    orig_torch_fn: lazy () → original weight in torch layout (glora/oft)."""
    scale = 1.0

    if all(k in mods for k in ("a1.weight", "a2.weight", "b1.weight", "b2.weight")):
        # GLoRA (reference network_glora.py): ΔW = b2@b1 + (W@a2)@a1
        w = np.asarray(orig_torch_fn(), np.float32).reshape(
            weight_shape_torch[0], -1)
        a1 = np.asarray(mods["a1.weight"], np.float32)
        a2 = np.asarray(mods["a2.weight"], np.float32)
        b1 = np.asarray(mods["b1.weight"], np.float32)
        b2 = np.asarray(mods["b2.weight"], np.float32)
        delta = (b2 @ b1) + (w @ a2) @ a1
        return ("add", (delta * mult).reshape(weight_shape_torch))

    if "oft_blocks" in mods:
        # OFT/COFT (reference network_oft.py, kohya blocks variant):
        # per-output-block Cayley rotation R=(I+Q)(I−Q)⁻¹ of skew Q
        blocks = np.asarray(mods["oft_blocks"], np.float32)  # (k, b, b)
        out_dim = weight_shape_torch[0]
        num_blocks, block_size = blocks.shape[0], blocks.shape[-1]
        q = blocks - np.swapaxes(blocks, -1, -2)
        alpha = mods.get("alpha")
        if alpha is not None and float(alpha) != 0:
            constraint = float(alpha) * out_dim
            norm_q = np.linalg.norm(q)
            q = q * (min(norm_q, constraint) + 1e-8) / (norm_q + 1e-8)
        eye = np.eye(block_size, dtype=np.float32)
        r = np.stack([ (eye + qk) @ np.linalg.inv(eye - qk) for qk in q ])
        w = np.asarray(orig_torch_fn(), np.float32)
        merged = w.reshape(num_blocks, block_size, -1)
        rotated = np.einsum("knm,kn...->km...", r, merged)
        delta = (rotated.reshape(w.shape) - w) * mult
        return ("add", delta.reshape(weight_shape_torch))

    if "lora_up.weight" in mods and "lora_down.weight" in mods:
        up = np.asarray(mods["lora_up.weight"], np.float32)
        down = np.asarray(mods["lora_down.weight"], np.float32)
        rank = down.shape[0]
        alpha = float(mods.get("alpha", rank))
        scale = alpha / rank * mult
        if down.ndim == 4 and down.shape[2:] != (1, 1):
            # conv lora: up (O,r,1,1) @ down (r,I,kh,kw)
            delta = np.einsum("or,rikl->oikl", _to_2d(up), down) * scale
        else:
            delta = (_to_2d(up) @ _to_2d(down)) * scale
            delta = delta.reshape(weight_shape_torch)
        return ("add", delta)

    if "hada_w1_a" in mods:
        w1a = np.asarray(mods["hada_w1_a"], np.float32)
        w1b = np.asarray(mods["hada_w1_b"], np.float32)
        w2a = np.asarray(mods["hada_w2_a"], np.float32)
        w2b = np.asarray(mods["hada_w2_b"], np.float32)
        rank = w1b.shape[0]
        alpha = float(mods.get("alpha", rank))
        scale = alpha / rank * mult
        delta = (_to_2d(w1a) @ _to_2d(w1b)) * (_to_2d(w2a) @ _to_2d(w2b)) * scale
        return ("add", delta.reshape(weight_shape_torch))

    if "lokr_w1" in mods or "lokr_w1_a" in mods:
        w1 = np.asarray(mods["lokr_w1"], np.float32) if "lokr_w1" in mods else \
            np.asarray(mods["lokr_w1_a"], np.float32) @ np.asarray(mods["lokr_w1_b"], np.float32)
        if "lokr_w2" in mods:
            w2 = np.asarray(mods["lokr_w2"], np.float32)
        elif "lokr_t2" in mods:
            t2 = np.asarray(mods["lokr_t2"], np.float32)
            w2 = np.einsum("ijkl,ip,jq->pqkl", t2,
                           np.asarray(mods["lokr_w2_a"], np.float32),
                           np.asarray(mods["lokr_w2_b"], np.float32))
        else:
            w2 = np.asarray(mods["lokr_w2_a"], np.float32) @ \
                np.asarray(mods["lokr_w2_b"], np.float32)
        rank = mods["lokr_w1_b"].shape[0] if "lokr_w1_b" in mods else \
            (mods["lokr_w2_b"].shape[0] if "lokr_w2_b" in mods else w1.shape[1])
        alpha = float(mods.get("alpha", rank))
        scale = alpha / rank * mult
        delta = np.kron(_to_2d(w1), _to_2d(w2)) * scale
        return ("add", delta.reshape(weight_shape_torch))

    if "weight" in mods or "diff" in mods:   # full
        w = np.asarray(mods.get("diff", mods.get("weight")), np.float32)
        return ("add", w * mult)

    if "on_input" in mods or "w" in mods:    # ia3
        w = np.asarray(mods["w"], np.float32)
        on_input = bool(np.asarray(mods.get("on_input", 0)).item())
        return ("ia3", (w, on_input, mult))

    if "w_norm" in mods:                     # norm
        return ("norm", (np.asarray(mods["w_norm"], np.float32),
                         np.asarray(mods["b_norm"], np.float32)
                         if "b_norm" in mods else None, mult))

    return None


def _apply_dora(delta: np.ndarray, orig: np.ndarray,
                dora_scale) -> np.ndarray:
    """Weight decomposition: merged = W+ΔW is renormalized per output row to
    the learned magnitude vector (reference network.py
    apply_weight_decompose).  Returns the equivalent additive delta."""
    orig = np.asarray(orig, np.float32).reshape(delta.shape)
    merged = orig + np.asarray(delta, np.float32)
    norm = np.linalg.norm(merged.reshape(merged.shape[0], -1), axis=1)
    norm = norm.reshape((-1,) + (1,) * (merged.ndim - 1))
    scale = np.asarray(dora_scale, np.float32).reshape(norm.shape)
    return merged / norm * scale - orig


def _torch_shape(jax_weight) -> tuple:
    s = jax_weight.shape
    if len(s) == 4:   # HWIO → OIHW
        return (s[3], s[2], s[0], s[1])
    if len(s) == 2:   # (in, out) → (out, in)
        return (s[1], s[0])
    return s


def _delta_to_jax_layout(delta: np.ndarray, jax_weight):
    if delta.ndim == 4:
        return np.transpose(delta, (2, 3, 1, 0))
    if delta.ndim == 2 and len(jax_weight.shape) == 2:
        return delta.T
    if delta.ndim == 2 and len(jax_weight.shape) == 4:
        # 1x1 conv stored 2D
        o, i = delta.shape
        return delta.T.reshape(1, 1, i, o)
    return delta


# --------------------------------------------------------------------------
# application
# --------------------------------------------------------------------------

def group_lora_keys(lora_sd: dict, prefix: str) -> dict:
    """{module_name: {suffix: array}} for keys starting with prefix
    (lora_unet_ / lora_te_ / lora_te1_ / lora_te2_)."""
    groups: dict = {}
    for k, v in lora_sd.items():
        if not k.startswith(prefix):
            continue
        rest = k[len(prefix):]
        if "." not in rest:
            continue
        module, suffix = rest.split(".", 1)
        groups.setdefault(module, {})[suffix] = v
    return groups


def apply_loras(params: dict, loras: list, prefix: str = "lora_unet_",
                hp_flat: dict | None = None):
    """params + Σ lora deltas → new tree.  loras: [(lora_sd, multiplier)].

    hp_flat: optional flat-path → high-precision host array map for leaves
    stored quantized (fp8 storage + opts.cache_fp16_weight): merges use the
    original values as the base instead of re-quantizing quantized weights.

    Returns (new_params, n_applied, unmatched_keys)."""
    lookup = build_path_lookup(params)
    flat = flatten(params)
    patches: dict = {}
    unmatched = []
    n_applied = 0

    for lora_sd, mult in loras:
        if mult == 0:
            continue
        for module, mods in group_lora_keys(lora_sd, prefix).items():
            path = resolve_module(module, lookup)
            if path is None:
                unmatched.append(module)
                continue
            wkey = path + ".weight"
            w = flat[wkey]
            if hp_flat and wkey in hp_flat:
                w = hp_flat[wkey]

            def orig_torch(w=w):
                arr = np.asarray(w, np.float32)
                if arr.ndim == 4:      # HWIO → OIHW
                    return np.transpose(arr, (3, 2, 0, 1))
                if arr.ndim == 2:
                    return arr.T
                return arr

            if "dora_scale" in mods:
                # DoRA (reference network.py apply_weight_decompose): the
                # alpha-scaled delta is decomposed against the merged-weight
                # row norms, the multiplier interpolates afterwards
                op = _compute_delta_torch_layout(mods, _torch_shape(w), 1.0,
                                                 orig_torch_fn=orig_torch)
                if op is not None and op[0] == "add":
                    op = ("add", _apply_dora(op[1], orig_torch(),
                                             mods["dora_scale"]) * mult)
            else:
                op = _compute_delta_torch_layout(mods, _torch_shape(w), mult,
                                                 orig_torch_fn=orig_torch)
            if op is None:
                unmatched.append(module)
                continue
            kind, payload = op
            patches.setdefault(wkey, []).append((kind, payload, path))
            n_applied += 1

    if not patches:
        return params, 0, unmatched

    new_flat = dict(flat)
    for wkey, ops in patches.items():
        w = jnp.asarray(new_flat[wkey])
        dtype = w.dtype
        if hp_flat and wkey in hp_flat:
            wf = jnp.asarray(hp_flat[wkey], jnp.float32)
        else:
            wf = w.astype(jnp.float32)
        for kind, payload, path in ops:
            if kind == "add":
                delta = _delta_to_jax_layout(np.asarray(payload), w)
                wf = wf + jnp.asarray(delta, jnp.float32)
            elif kind == "ia3":
                vec, on_input, mult = payload
                v = jnp.asarray(vec.reshape(-1), jnp.float32)
                axis_len_in, axis_len_out = (wf.shape[-2], wf.shape[-1]) \
                    if wf.ndim == 2 else (wf.shape[2], wf.shape[3])
                if on_input:
                    scale_vec = 1.0 + (v - 1.0) * mult
                    wf = wf * (scale_vec[:, None] if wf.ndim == 2
                               else scale_vec[None, None, :, None])
                else:
                    scale_vec = 1.0 + (v - 1.0) * mult
                    wf = wf * (scale_vec[None, :] if wf.ndim == 2
                               else scale_vec[None, None, None, :])
            elif kind == "norm":
                wn, bn, mult = payload
                wf = wf + jnp.asarray(wn, jnp.float32) * mult
                if bn is not None:
                    bkey = path + ".bias"
                    if bkey in new_flat:
                        b = jnp.asarray(new_flat[bkey]).astype(jnp.float32)
                        new_flat[bkey] = (b + jnp.asarray(bn) * mult).astype(dtype)
        new_flat[wkey] = wf.astype(dtype)

    return unflatten(new_flat), n_applied, unmatched
