"""CodeFormer face restorer (JAX/NHWC, functional).

The reference loads CodeFormer through spandrel and calls
`net(face, weight=w, adain=True)` (modules/codeformer_model.py:53).
Architecture: a VQ autoencoder (VQGAN encoder/decoder, 1024x256 codebook)
whose low-quality encoder features drive a 9-layer pre-norm transformer that
predicts codebook indices; the decoded high-quality features are fused back
with encoder features through controllable SFT blocks weighted by `w`
(0 = full codebook prior / quality, 1 = full input fidelity).

Param tree mirrors the official checkpoint (`params_ema`):

    encoder.blocks.{i}       flat list: conv_in, ResBlock/AttnBlock/Downsample,
                             mid (res, attn, res), norm, conv_out
    quantize.embedding.weight                 (codebook, emb_dim)
    generator.blocks.{i}     conv_in, mid, ResBlock/AttnBlock/Upsample, norm, conv
    position_emb                              (n_pos, dim_embd)
    feat_emb                                  Linear emb_dim → dim_embd
    ft_layers.{i}            self_attn (fused in_proj) + norm1/2 + linear1/2
    idx_pred_layer.{0,1}     LayerNorm + Linear(dim, codebook, no bias)
    fuse_convs_dict.{res}    encode_enc ResBlock + scale/shift conv stacks

ResBlock = GroupNorm32+swish convs with 1x1 `conv_out` skip; AttnBlock =
single-head QKV attention (1x1 convs).  Everything static-shaped; argmax
code selection stays on device.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CodeFormerConfig:
    img_size: int = 512
    nf: int = 64
    ch_mult: tuple = (1, 2, 2, 4, 4, 8)
    res_blocks: int = 2
    attn_resolutions: tuple = (16,)
    emb_dim: int = 256
    codebook_size: int = 1024
    dim_embd: int = 512
    n_head: int = 8
    n_layers: int = 9
    connect_list: tuple = ("32", "64", "128", "256")

    @property
    def latent_size(self) -> int:
        return self.img_size // 2 ** (len(self.ch_mult) - 1)


# --------------------------------------------------------------------------
# plans: the checkpoint's flat blocks.{i} lists → typed descriptors
# --------------------------------------------------------------------------

def encoder_plan(cfg: CodeFormerConfig):
    """[(kind, cin, cout)], fuse: {resolution: block_index} (captured after
    the LAST ResBlock of each level — reproduces the official
    fuse_encoder_block table for the standard config)."""
    plan = [("conv", 3, cfg.nf)]
    fuse = {}
    mults = (1,) + tuple(cfg.ch_mult)
    res = cfg.img_size
    for i in range(len(cfg.ch_mult)):
        cin, cout = cfg.nf * mults[i], cfg.nf * cfg.ch_mult[i]
        for _ in range(cfg.res_blocks):
            plan.append(("res", cin, cout))
            cin = cout
            fuse[res] = len(plan) - 1
            if res in cfg.attn_resolutions:
                plan.append(("attn", cin, cin))
        if i != len(cfg.ch_mult) - 1:
            plan.append(("down", cin, cin))
            res //= 2
    plan += [("res", cin, cin), ("attn", cin, cin), ("res", cin, cin),
             ("norm", cin, cin), ("conv", cin, cfg.emb_dim)]
    return plan, fuse


def generator_plan(cfg: CodeFormerConfig):
    """[(kind, cin, cout)], fuse: {resolution: block_index} (first-level
    fuses after its LAST ResBlock, later levels after their FIRST —
    reproduces the official fuse_generator_block table)."""
    cin = cfg.nf * cfg.ch_mult[-1]
    res = cfg.latent_size
    plan = [("conv", cfg.emb_dim, cin), ("res", cin, cin),
            ("attn", cin, cin), ("res", cin, cin)]
    fuse = {}
    for i in reversed(range(len(cfg.ch_mult))):
        cout = cfg.nf * cfg.ch_mult[i]
        first_of_level = None
        for _ in range(cfg.res_blocks):
            plan.append(("res", cin, cout))
            cin = cout
            if first_of_level is None:
                first_of_level = len(plan) - 1
            last_of_level = len(plan) - 1
            if res in cfg.attn_resolutions:
                plan.append(("attn", cin, cin))
        fuse[res] = last_of_level if i == len(cfg.ch_mult) - 1 else first_of_level
        if i > 0:
            plan.append(("up", cin, cin))
            res *= 2
    plan += [("norm", cin, cin), ("conv", cin, 3)]
    return plan, fuse


# --------------------------------------------------------------------------
# blocks
# --------------------------------------------------------------------------

def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv(p, x, stride=1, k_pad=None):
    w = p["weight"].astype(x.dtype)
    pad = (w.shape[0] // 2) if k_pad is None else k_pad
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def _gn(p, x, groups=32, eps=1e-6):
    x32 = x.astype(jnp.float32)
    b, h, w, c = x.shape
    groups = min(groups, c)     # tiny test configs; real models use 32
    g = x32.reshape(b, h, w, groups, c // groups)
    mean = g.mean(axis=(1, 2, 4), keepdims=True)
    var = g.var(axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    out = g.reshape(b, h, w, c) * p["weight"].astype(jnp.float32) \
        + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def _vq_resblock(p, x):
    h = _conv(p["conv1"], _swish(_gn(p["norm1"], x)))
    h = _conv(p["conv2"], _swish(_gn(p["norm2"], h)))
    if "conv_out" in p:
        x = _conv(p["conv_out"], x)
    return x + h


def _vq_attn(p, x):
    b, h, w, c = x.shape
    t = _gn(p["norm"], x)
    q = _conv(p["q"], t).reshape(b, h * w, c)
    k = _conv(p["k"], t).reshape(b, h * w, c)
    v = _conv(p["v"], t).reshape(b, h * w, c)
    att = jax.nn.softmax(
        (q.astype(jnp.float32) @ k.astype(jnp.float32).transpose(0, 2, 1))
        * (c ** -0.5), axis=-1)
    out = (att @ v.astype(jnp.float32)).astype(x.dtype).reshape(b, h, w, c)
    return x + _conv(p["proj_out"], out)


def _walk_blocks(params, plan, x, fuse=None, fuse_fn=None):
    for i, (kind, _, _) in enumerate(plan):
        p = params[str(i)]
        if kind == "conv":
            x = _conv(p, x)
        elif kind == "res":
            x = _vq_resblock(p, x)
        elif kind == "attn":
            x = _vq_attn(p, x)
        elif kind == "down":
            # vqgan Downsample: asymmetric pad (0,1,0,1), stride-2 conv
            xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = _conv(p["conv"], xp, stride=2, k_pad=0)
        elif kind == "up":
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            x = _conv(p["conv"], x)
        elif kind == "norm":
            x = _swish(_gn(p, x))
        if fuse_fn is not None and fuse and i in fuse:
            x = fuse_fn(i, x)
    return x


# --------------------------------------------------------------------------
# transformer
# --------------------------------------------------------------------------

def _mha(p, q, k, v, n_head):
    """nn.MultiheadAttention with fused in_proj (batch-first here)."""
    b, s, d = q.shape
    w = p["in_proj_weight"].astype(jnp.float32)     # (3d, d) torch layout
    bias = p["in_proj_bias"].astype(jnp.float32)
    wq, wk, wv = jnp.split(w, 3, axis=0)
    bq, bk, bv = jnp.split(bias, 3, axis=0)
    qh = (q.astype(jnp.float32) @ wq.T + bq).reshape(b, s, n_head, d // n_head)
    kh = (k.astype(jnp.float32) @ wk.T + bk).reshape(b, s, n_head, d // n_head)
    vh = (v.astype(jnp.float32) @ wv.T + bv).reshape(b, s, n_head, d // n_head)
    att = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(d // n_head)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, vh).reshape(b, s, d)
    return out @ p["out_proj"]["weight"].astype(jnp.float32).T \
        + p["out_proj"]["bias"].astype(jnp.float32)


def _ln(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)
            * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32))


def _ft_layer(p, x, pos, n_head):
    t = _ln(p["norm1"], x)
    qk = t + pos
    x = x + _mha(p["self_attn"], qk, qk, t, n_head)
    t = _ln(p["norm2"], x)
    t = jax.nn.gelu(t @ p["linear1"]["weight"].astype(jnp.float32).T
                    + p["linear1"]["bias"].astype(jnp.float32),
                    approximate=False)
    t = t @ p["linear2"]["weight"].astype(jnp.float32).T \
        + p["linear2"]["bias"].astype(jnp.float32)
    return x + t


def _adain(content, style, eps=1e-5):
    """adaptive_instance_normalization over spatial dims (NHWC).
    Variances are unbiased (ddof=1) matching the published calc_mean_std."""
    c32 = content.astype(jnp.float32)
    s32 = style.astype(jnp.float32)
    cm = c32.mean(axis=(1, 2), keepdims=True)
    cs = jnp.sqrt(c32.var(axis=(1, 2), keepdims=True, ddof=1) + eps)
    sm = s32.mean(axis=(1, 2), keepdims=True)
    ss = jnp.sqrt(s32.var(axis=(1, 2), keepdims=True, ddof=1) + eps)
    return ((c32 - cm) / cs * ss + sm).astype(content.dtype)


def _lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, x * slope)


def _fuse_sft(p, enc_feat, dec_feat, w):
    enc = _vq_resblock(p["encode_enc"],
                       jnp.concatenate([enc_feat, dec_feat], axis=-1))
    scale = _conv(p["scale"]["2"], _lrelu(_conv(p["scale"]["0"], enc)))
    shift = _conv(p["shift"]["2"], _lrelu(_conv(p["shift"]["0"], enc)))
    return dec_feat + w * (dec_feat * scale + shift)


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def apply(params, cfg: CodeFormerConfig, x, w: float = 0.5,
          adain: bool = True):
    """x: (B,S,S,3) in [-1,1] → restored (B,S,S,3).

    w ∈ [0,1]: fidelity weight for the SFT fusion (reference passes
    opts.code_former_weight); adain=True matches the reference call."""
    e_plan, e_fuse = encoder_plan(cfg)
    g_plan, g_fuse = generator_plan(cfg)
    connect = {int(r) for r in cfg.connect_list}

    enc_feats = {}

    def capture(i, feat):
        res = feat.shape[1]
        if res in connect:
            enc_feats[res] = feat
        return feat

    lq = _walk_blocks(params["encoder"], e_plan, x,
                      fuse={i: r for r, i in e_fuse.items()},
                      fuse_fn=capture)

    b, hh, ww, c = lq.shape
    tokens = lq.reshape(b, hh * ww, c)
    pos = params["position_emb"].astype(jnp.float32)[None]
    q = tokens.astype(jnp.float32) \
        @ params["feat_emb"]["weight"].astype(jnp.float32).T \
        + params["feat_emb"]["bias"].astype(jnp.float32)
    for li in range(cfg.n_layers):
        q = _ft_layer(params["ft_layers"][str(li)], q, pos, cfg.n_head)

    logits = _ln(params["idx_pred_layer"]["0"], q) \
        @ params["idx_pred_layer"]["1"]["weight"].astype(jnp.float32).T
    idx = jnp.argmax(logits, axis=-1)                       # (B, hw)
    code = params["quantize"]["embedding"]["weight"].astype(jnp.float32)[idx]
    quant = code.reshape(b, hh, ww, cfg.emb_dim).astype(x.dtype)
    if adain:
        quant = _adain(quant, lq)

    def fuse(i, feat):
        res = feat.shape[1]
        if res in connect and res in enc_feats and w > 0:
            return _fuse_sft(params["fuse_convs_dict"][str(res)],
                             enc_feats[res], feat,
                             jnp.asarray(w, jnp.float32).astype(feat.dtype))
        return feat

    return _walk_blocks(params["generator"], g_plan, quant,
                        fuse={i: r for r, i in g_fuse.items()}, fuse_fn=fuse)


# --------------------------------------------------------------------------
# loading / init
# --------------------------------------------------------------------------

def convert_codeformer(sd: dict):
    """checkpoint state dict → (tree, cfg). Conv → HWIO, linear → (in,out)
    kept torch-side (applied as x @ W.T), fused in_proj kept verbatim."""
    from sdwebui_tpu.utils.pytree import unflatten

    if any(k.startswith("params_ema.") for k in sd):
        sd = {k[len("params_ema."):]: v for k, v in sd.items()
              if k.startswith("params_ema.")}
    flat = {}
    for k, v in sd.items():
        arr = np.ascontiguousarray(v)
        if k.endswith(".weight") and arr.ndim == 4:
            arr = np.ascontiguousarray(np.transpose(arr, (2, 3, 1, 0)))
        flat[k] = arr
    tree = unflatten(flat)
    nf = int(tree["encoder"]["blocks"]["0"]["weight"].shape[-1])
    emb_dim = int(tree["quantize"]["embedding"]["weight"].shape[1])
    codebook = int(tree["quantize"]["embedding"]["weight"].shape[0])
    dim_embd = int(tree["position_emb"].shape[-1])
    n_layers = len(tree["ft_layers"])
    n_pos = int(tree["position_emb"].shape[0])
    # blocks are generated from the standard plan; infer img_size from the
    # position count (latent = sqrt(n_pos)) and the level count from fuse keys
    connect = tuple(sorted(tree.get("fuse_convs_dict", {}).keys(), key=int))
    cfg = CodeFormerConfig(img_size=int(np.sqrt(n_pos)) * 2 ** 5
                           if n_pos == 256 else 512,
                           nf=nf, emb_dim=emb_dim, codebook_size=codebook,
                           dim_embd=dim_embd, n_layers=n_layers,
                           connect_list=connect or ("32", "64", "128", "256"))
    # encoder/generator blocks arrive keyed blocks.{i} — reindex under each
    for side in ("encoder", "generator"):
        tree[side] = tree[side]["blocks"]
    return tree, cfg


def init_params(cfg: CodeFormerConfig, seed: int = 0):
    rng = np.random.RandomState(seed)
    f32 = np.float32

    def conv(cin, cout, k):
        return {"weight": (rng.randn(k, k, cin, cout) * 0.08).astype(f32),
                "bias": np.zeros(cout, f32)}

    def norm(c):
        return {"weight": np.ones(c, f32), "bias": np.zeros(c, f32)}

    def res(cin, cout):
        p = {"norm1": norm(cin), "conv1": conv(cin, cout, 3),
             "norm2": norm(cout), "conv2": conv(cout, cout, 3)}
        if cin != cout:
            p["conv_out"] = conv(cin, cout, 1)
        return p

    def attn(c):
        return {"norm": norm(c), "q": conv(c, c, 1), "k": conv(c, c, 1),
                "v": conv(c, c, 1), "proj_out": conv(c, c, 1)}

    def blocks(plan):
        out = {}
        for i, (kind, cin, cout) in enumerate(plan):
            if kind == "conv":
                out[str(i)] = conv(cin, cout, 3)
            elif kind == "res":
                out[str(i)] = res(cin, cout)
            elif kind == "attn":
                out[str(i)] = attn(cin)
            elif kind in ("down", "up"):
                out[str(i)] = {"conv": conv(cin, cout, 3)}
            elif kind == "norm":
                out[str(i)] = norm(cin)
        return out

    def linear(cin, cout, bias=True):
        p = {"weight": (rng.randn(cout, cin) * 0.05).astype(f32)}
        if bias:
            p["bias"] = np.zeros(cout, f32)
        return p

    e_plan, _ = encoder_plan(cfg)
    g_plan, _ = generator_plan(cfg)
    d = cfg.dim_embd
    ft = {}
    for i in range(cfg.n_layers):
        ft[str(i)] = {
            "self_attn": {"in_proj_weight": (rng.randn(3 * d, d) * 0.05).astype(f32),
                          "in_proj_bias": np.zeros(3 * d, f32),
                          "out_proj": linear(d, d)},
            "norm1": norm(d), "norm2": norm(d),
            "linear1": linear(d, d * 2), "linear2": linear(d * 2, d)}
    fuse = {}
    res_map = {}
    rr = cfg.latent_size
    for i in reversed(range(len(cfg.ch_mult))):
        res_map[rr] = cfg.nf * cfg.ch_mult[i]
        rr *= 2
    for r in cfg.connect_list:
        ch = res_map[int(r)]
        fuse[r] = {"encode_enc": res(2 * ch, ch),
                   "scale": {"0": conv(ch, ch, 3), "2": conv(ch, ch, 3)},
                   "shift": {"0": conv(ch, ch, 3), "2": conv(ch, ch, 3)}}
    return {
        "encoder": blocks(e_plan),
        "generator": blocks(g_plan),
        "quantize": {"embedding": {
            "weight": (rng.randn(cfg.codebook_size, cfg.emb_dim) * 0.1).astype(f32)}},
        "position_emb": (rng.randn(cfg.latent_size ** 2, d) * 0.02).astype(f32),
        "feat_emb": linear(cfg.emb_dim, d),
        "ft_layers": ft,
        "idx_pred_layer": {"0": norm(d),
                           "1": linear(d, cfg.codebook_size, bias=False)},
        "fuse_convs_dict": fuse,
    }
