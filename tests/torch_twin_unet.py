"""Reusable torch twin of the tiny LDM UNet (extracted from
test_models.test_unet_parity_with_torch_twin so the end-to-end sampling
golden can drive the same network from the reference's sampler loops)."""

import math

import numpy as np


def make_torch_unet(cfg, params):
    """cfg: UNetConfig shaped like tests' TINY_UNET (channel_mult (1,2),
    transformer at every block).  Returns torch_forward(x_nhwc, tstep,
    ctx_np) -> eps ndarray."""
    import jax
    import torch
    import torch.nn.functional as F

    from sdwebui_tpu.utils.pytree import flatten as flat_tree

    t = {k: torch.from_numpy(np.array(jax.device_get(v)))
         for k, v in flat_tree(params).items()}

    def W(key):          # jax layout → torch layout
        w = t[key]
        if w.ndim == 4:
            return w.permute(3, 2, 0, 1)
        if w.ndim == 2:
            return w.T
        return w

    def conv(pre, x, stride=1, padding=1):
        return F.conv2d(x, W(pre + ".weight"), t[pre + ".bias"],
                        stride=stride, padding=padding)

    def lin(pre, x):
        return F.linear(x, W(pre + ".weight"), t.get(pre + ".bias"))

    def gn(pre, x, eps=1e-5):
        return F.group_norm(x, 32 if x.shape[1] >= 32 else x.shape[1] // 4,
                            t[pre + ".weight"], t[pre + ".bias"], eps)

    def ln(pre, x):
        return F.layer_norm(x, (x.shape[-1],), t[pre + ".weight"],
                            t[pre + ".bias"])

    def resblock(pre, x, emb):
        h = conv(pre + ".in_layers.2", F.silu(gn(pre + ".in_layers.0", x)))
        h = h + lin(pre + ".emb_layers.1", F.silu(emb))[:, :, None, None]
        h = conv(pre + ".out_layers.3", F.silu(gn(pre + ".out_layers.0", h)))
        if (pre + ".skip_connection.weight") in t:
            x = conv(pre + ".skip_connection", x, padding=0)
        return x + h

    def mha(q, k, v, heads):
        b, s, hd = q.shape
        d = hd // heads
        q = q.view(b, s, heads, d).transpose(1, 2)
        k = k.view(b, k.shape[1], heads, d).transpose(1, 2)
        v = v.view(b, v.shape[1], heads, d).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        return o.transpose(1, 2).reshape(b, s, hd)

    def xattn(pre, x, ctx, heads):
        q = lin(pre + ".to_q", x)
        k = lin(pre + ".to_k", ctx)
        v = lin(pre + ".to_v", ctx)
        return lin(pre + ".to_out.0", mha(q, k, v, heads))

    def transformer(pre, x, ctx, heads):
        b, c, hh, ww = x.shape
        res = x
        h = gn(pre + ".norm", x, eps=1e-6)
        h = conv(pre + ".proj_in", h, padding=0)
        h = h.flatten(2).transpose(1, 2)
        blk = pre + ".transformer_blocks.0"
        h = h + xattn(blk + ".attn1", ln(blk + ".norm1", h),
                      ln(blk + ".norm1", h), heads)
        h = h + xattn(blk + ".attn2", ln(blk + ".norm2", h), ctx, heads)
        g = lin(blk + ".ff.net.0.proj", ln(blk + ".norm3", h))
        a, gate = g.chunk(2, dim=-1)
        h = h + lin(blk + ".ff.net.2", a * F.gelu(gate))
        h = h.transpose(1, 2).view(b, c, hh, ww)
        return res + conv(pre + ".proj_out", h, padding=0)

    def torch_forward(x_nhwc, tstep, ctx_np):
        x = torch.from_numpy(np.asarray(x_nhwc, np.float32)) \
            .permute(0, 3, 1, 2)
        ctx = torch.from_numpy(np.asarray(ctx_np, np.float32))
        mc = cfg.model_channels
        half = mc // 2
        freqs = torch.exp(-math.log(10000) * torch.arange(half) / half)
        args = tstep * freqs
        emb = torch.cat([torch.cos(args), torch.sin(args)])[None].float()
        emb = lin("time_embed.2", F.silu(lin("time_embed.0", emb)))

        heads = cfg.num_heads
        hs = []
        h = conv("input_blocks.0.0", x)
        hs.append(h)
        h = resblock("input_blocks.1.0", h, emb)
        h = transformer("input_blocks.1.1", h, ctx, heads)
        hs.append(h)
        h = resblock("input_blocks.2.0", h, emb)
        h = transformer("input_blocks.2.1", h, ctx, heads)
        hs.append(h)
        h = conv("input_blocks.3.0.op", h, stride=2)
        hs.append(h)
        h = resblock("input_blocks.4.0", h, emb)
        h = transformer("input_blocks.4.1", h, ctx, heads)
        hs.append(h)
        h = resblock("input_blocks.5.0", h, emb)
        h = transformer("input_blocks.5.1", h, ctx, heads)
        hs.append(h)

        h = resblock("middle_block.0", h, emb)
        h = transformer("middle_block.1", h, ctx, heads)
        h = resblock("middle_block.2", h, emb)

        for i in range(3):
            h = torch.cat([h, hs.pop()], dim=1)
            h = resblock(f"output_blocks.{i}.0", h, emb)
            h = transformer(f"output_blocks.{i}.1", h, ctx, heads)
            if i == 2:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = conv(f"output_blocks.{i}.2.conv", h)
        for i in range(3, 6):
            h = torch.cat([h, hs.pop()], dim=1)
            h = resblock(f"output_blocks.{i}.0", h, emb)
            h = transformer(f"output_blocks.{i}.1", h, ctx, heads)
        h = conv("out.2", F.silu(gn("out.0", h)))
        return h.permute(0, 2, 3, 1).numpy()

    return torch_forward
