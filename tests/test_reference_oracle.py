"""Parity tests where the oracle is the reference's OWN code, imported
verbatim from /root/reference (see tests/reference_oracle.py for the import
mechanics and the exact stub inventory).

These replace builder-authored torch twins for every subsystem whose
reference implementation runs in-image: Philox RNG, prompt attention +
schedule parsing, the 12 sigma schedulers, the DeepDanbooru graph, SD3's
MMDiT, sub-quadratic attention (the flash-kernel math oracle), and the
in-repo timestep samplers (DDIM/PLMS).  A failure here means real semantic
drift from AUTOMATIC1111/stable-diffusion-webui, not twin-vs-twin agreement.
"""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import reference_oracle as ro  # noqa: E402


# ===========================================================================
# 1. Philox RNG — bit-exact vs reference modules/rng_philox.py
# ===========================================================================

SEEDS = [0, 1, 2, 42, 1234567, 2**31 - 1, 2**31, 2**63 - 1, 0xDEADBEEF]


@pytest.mark.parametrize("seed", SEEDS)
def test_philox_bit_exact(seed):
    ref = ro.load("modules.rng_philox")
    from sdwebui_tpu.rng.philox import PhiloxGenerator

    g_ref = ref.Generator(seed)
    g_our = PhiloxGenerator(seed)
    for shape in [(3, 4), (1,), (2, 3, 5), (64,), (17, 9)]:
        np.testing.assert_array_equal(g_our.randn(shape), g_ref.randn(shape),
                                      err_msg=f"seed={seed} shape={shape}")


def test_philox_batch_matches_sequential_reference():
    ref = ro.load("modules.rng_philox")
    from sdwebui_tpu.rng.philox import PhiloxGenerator

    g_ref = ref.Generator(77)
    expected = np.stack([g_ref.randn((4, 4, 2)) for _ in range(6)])
    got = PhiloxGenerator(77).randn_batch(6, (4, 4, 2))
    np.testing.assert_array_equal(got, expected)


def test_philox_native_kernel_bit_exact():
    """The C++ multithreaded path (large contiguous requests) vs reference."""
    from sdwebui_tpu import native

    if not native.available():  # pragma: no cover
        pytest.skip("native library not built")
    ref = ro.load("modules.rng_philox")
    from sdwebui_tpu.rng.philox import randn_at

    n = 1 << 16  # big enough to route through native.philox_randn
    got = randn_at(9001, np.arange(8, dtype=np.uint32), n)
    g_ref = ref.Generator(9001)
    expected = np.stack([g_ref.randn((n,)) for _ in range(8)])
    np.testing.assert_array_equal(got, expected)


# ===========================================================================
# 2. Prompt parser — attention weights + editing/alternation schedules
# ===========================================================================

ATTENTION_CORPUS = [
    "normal text",
    "an (important) word",
    "(unbalanced",
    r"\(literal\]",
    "(unnecessary)(parens)",
    "a (((house:1.3)) [on] a (hill:0.5), sun, (((sky))).",
    "(a:1.5) ((b)) [[c]] d:2",
    "a BREAK b",
    "x (y:0.0) z",
    "nested ((a (b:1.1) c):0.8) end",
    "[a|b|c] alternating",
    "trailing space ",
    "",
    "colon in (text: stuff)",
    "numbers 1.5 raw (2:2.0)",
    r"escaped \\ backslash \(paren\)",
    "unic(ode): (тест:1.2) 日本語",
]


def _fuzz_prompts(n, seed, scheduling=False):
    rng = np.random.default_rng(seed)
    words = ["cat", "dog", "sky", "a", "masterpiece", "BREAK", "blue,",
             "0.5", "x:1.2", "tree"]
    out = []
    for _ in range(n):
        parts = []
        depth_tokens = []
        for _ in range(rng.integers(1, 14)):
            r = rng.random()
            if r < 0.45:
                parts.append(rng.choice(words))
            elif r < 0.6:
                parts.append(rng.choice(["(", "[", ")", "]"]
                                        if not scheduling else ["[", "]"]))
            elif r < 0.7 and scheduling:
                parts.append(f"[{rng.choice(words)}:{rng.choice(words)}:"
                             f"{rng.choice(['0.3', '0.75', '5', '12', '1'])}]")
            elif r < 0.8 and scheduling:
                parts.append(f"[{rng.choice(words)}|{rng.choice(words)}]")
            elif r < 0.9:
                parts.append(f"({rng.choice(words)}:{rng.uniform(0, 2):.2f})")
            else:
                parts.append(f"[{rng.choice(words)}]")
        out.append(" ".join(parts))
        del depth_tokens
    return out


@pytest.mark.parametrize("text", ATTENTION_CORPUS)
def test_parse_prompt_attention_corpus(text):
    ref = ro.load("modules.prompt_parser")
    from sdwebui_tpu.text.prompt_parser import parse_prompt_attention

    assert parse_prompt_attention(text) == ref.parse_prompt_attention(text)


def test_parse_prompt_attention_fuzz():
    ref = ro.load("modules.prompt_parser")
    from sdwebui_tpu.text.prompt_parser import parse_prompt_attention

    for text in _fuzz_prompts(300, seed=11):
        assert parse_prompt_attention(text) == ref.parse_prompt_attention(text), \
            f"attention mismatch on {text!r}"


SCHEDULE_CORPUS = [
    "test",
    "a [b:3]",
    "a [b: 3]",
    "a [[[b]]:2]",
    "[(a:2):3]",
    "a [b:c:1] d",
    "a [b:c:0.3] d",
    "[a:b:0.5] and [c|d] mix",
    "[a|b]",
    "[a|(b:1.1)]",
    "[a:0.5] fade in",
    "[a::0.5] fade out",
    "nested [x:[y:z:0.7]:0.3]",
    "[unbalanced:0.4",
    "plain (emphasis:1.2) only",
]


@pytest.mark.parametrize("steps", [1, 7, 10, 20])
def test_prompt_schedules_corpus(steps):
    ref = ro.load("modules.prompt_parser")
    from sdwebui_tpu.text.prompt_parser import get_prompt_schedules

    for text in SCHEDULE_CORPUS:
        expected = ref.get_learned_conditioning_prompt_schedules([text], steps)[0]
        got = get_prompt_schedules([text], steps)[0]
        assert got == expected, f"schedule mismatch steps={steps} on {text!r}"


def test_prompt_schedules_fuzz():
    ref = ro.load("modules.prompt_parser")
    from sdwebui_tpu.text.prompt_parser import get_prompt_schedules

    for text in _fuzz_prompts(200, seed=23, scheduling=True):
        for steps in (7, 20):
            expected = ref.get_learned_conditioning_prompt_schedules(
                [text], steps)[0]
            got = get_prompt_schedules([text], steps)[0]
            assert got == expected, \
                f"schedule mismatch steps={steps} on {text!r}"


def test_multicond_weights():
    """AND-composition weight parsing (reference re_AND / re_weight)."""
    ref = ro.load("modules.prompt_parser")
    from sdwebui_tpu.text.prompt_parser import split_multicond

    for text in ["a AND b", "a :1.5 AND b :0.3", "a AND b :2 AND c",
                 "no and here", "x:0.0 AND y", "a (b:1.2) AND (c) :0.7"]:
        res_indexes, flat, _ = ref.get_multicond_prompt_list([text])
        ref_pairs = [(flat[i], w) for i, w in res_indexes[0]]
        got = [(sp.text, sp.weight) for sp in split_multicond(text)]
        assert got == ref_pairs, f"multicond mismatch on {text!r}"


# ===========================================================================
# 3. Sigma schedulers — all 12 vs reference modules/sd_schedulers.py
# ===========================================================================

def _kdiffusion_inner_model(ac):
    """k-diffusion DiscreteSchedule contract (the reference wraps ldm models
    with it; repo cloned at launch — crowsonkb/k-diffusion, sampling.py).
    Only used to satisfy the reference schedulers' `inner_model` argument."""
    import torch

    class _KD:
        def __init__(self, ac):
            ac = torch.as_tensor(ac, dtype=torch.float32)
            self.sigmas = ((1 - ac) / ac) ** 0.5
            self.log_sigmas = self.sigmas.log()

        def get_sigmas(self, n):
            t_max = len(self.sigmas) - 1
            t = torch.linspace(t_max, 0, n)
            return torch.cat([self.t_to_sigma(t), self.sigmas.new_zeros([1])])

        def t_to_sigma(self, t):
            t = t.float()
            low_idx, high_idx, w = t.floor().long(), t.ceil().long(), t.frac()
            log_sigma = ((1 - w) * self.log_sigmas[low_idx]
                         + w * self.log_sigmas[high_idx])
            return log_sigma.exp()

        def sigma_to_t(self, sigma):
            log_sigma = sigma.log()
            dists = log_sigma - self.log_sigmas[:, None]
            low_idx = dists.ge(0).cumsum(dim=0).argmax(dim=0).clamp(
                max=self.log_sigmas.shape[0] - 2)
            high_idx = low_idx + 1
            low, high = self.log_sigmas[low_idx], self.log_sigmas[high_idx]
            w = ((low - log_sigma) / (low - high)).clamp(0, 1)
            t = (1 - w) * low_idx + w * high_idx
            return t.view(sigma.shape)

    return _KD(ac)


@pytest.mark.parametrize("n", [2, 8, 20, 50])
def test_schedulers_vs_reference(n):
    import torch

    ref = ro.load("modules.sd_schedulers")
    from sdwebui_tpu.sampling.discretization import (Discretization,
                                                     make_alphas_cumprod)
    from sdwebui_tpu.sampling.schedulers import get_schedule

    ac = make_alphas_cumprod()
    disc = Discretization(ac)
    inner = _kdiffusion_inner_model(ac)
    smin, smax = float(inner.sigmas[0]), float(inner.sigmas[-1])

    for sched in ref.schedulers:
        if sched.name == "automatic":
            continue
        if sched.need_inner_model:
            expected = sched.function(n, smin, smax, inner, "cpu")
        elif sched.name in ("karras", "exponential", "polyexponential"):
            kw = {"rho": sched.default_rho} if sched.default_rho != -1 else {}
            expected = sched.function(n, smin, smax, device="cpu", **kw)
        else:
            expected = sched.function(n, smin, smax, "cpu")
        expected = np.asarray(torch.as_tensor(expected), np.float64)
        got = get_schedule(sched.name, n, disc)
        # kl_optimal / align_your_steps return n+1 sigmas without a final 0
        # in the reference too — shapes must agree exactly
        assert got.shape == expected.shape, \
            f"{sched.name}: shape {got.shape} != {expected.shape}"
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-6,
                                   err_msg=f"scheduler {sched.name} n={n}")


def test_scheduler_ays_sdxl_table():
    import torch

    ref = ro.load("modules.sd_schedulers")
    shared = ro.install_stubs()
    from sdwebui_tpu.sampling.discretization import (Discretization,
                                                     make_alphas_cumprod)
    from sdwebui_tpu.sampling.schedulers import get_schedule

    disc = Discretization(make_alphas_cumprod())
    try:
        shared.sd_model.is_sdxl = True
        expected = np.asarray(torch.as_tensor(
            ref.get_align_your_steps_sigmas(13, disc.sigma_min,
                                            disc.sigma_max, "cpu")), np.float64)
    finally:
        shared.sd_model.is_sdxl = False
    got = get_schedule("align_your_steps", 13, disc, is_sdxl=True)
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-6)


# ===========================================================================
# 4. Sub-quadratic attention — math oracle for the flash kernel
# ===========================================================================

def _attention_case(bh, sq, skv, d, seed):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((bh, sq, d)).astype(np.float32)
    k = rng.standard_normal((bh, skv, d)).astype(np.float32)
    v = rng.standard_normal((bh, skv, d)).astype(np.float32)
    return q, k, v


@pytest.mark.parametrize("shape", [(4, 256, 256, 40), (2, 333, 77, 64),
                                   (1, 1024, 1024, 40), (3, 100, 500, 8)])
def test_xla_attention_vs_subquadratic(shape):
    import torch

    sq_mod = ro.load("modules.sub_quadratic_attention")
    from sdwebui_tpu.ops.attention import xla_attention

    q, k, v = _attention_case(*shape, seed=5)
    expected = sq_mod.efficient_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        query_chunk_size=64, kv_chunk_size=48, use_checkpoint=False).numpy()
    got = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("shape", [(2, 256, 256, 40), (1, 300, 500, 64)])
def test_flash_kernel_vs_subquadratic(shape):
    """Pallas flash kernel (interpret mode on CPU) vs the reference's
    chunked-softmax implementation — same math, independent code paths."""
    import torch

    sq_mod = ro.load("modules.sub_quadratic_attention")
    from sdwebui_tpu.ops.flash_attention import flash_attention

    q, k, v = _attention_case(*shape, seed=7)
    expected = sq_mod.efficient_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        query_chunk_size=96, kv_chunk_size=128, use_checkpoint=False).numpy()
    got = np.asarray(flash_attention(
        __import__("jax.numpy", fromlist=["asarray"]).asarray(q),
        __import__("jax.numpy", fromlist=["asarray"]).asarray(k),
        __import__("jax.numpy", fromlist=["asarray"]).asarray(v),
        block_q=128, block_kv=128, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


# ===========================================================================
# 5. DeepDanbooru — reference graph state dict → our loader → forward parity
# ===========================================================================

@pytest.mark.slow
def test_deepbooru_reference_state_dict_forward():
    """Instantiate the reference's full 179-conv DeepDanbooru graph
    (modules/deepbooru_model.py), push its randomly-initialized state dict
    through our converter, and compare forwards.  Catches key-mapping and
    wiring bugs a builder-authored twin structurally cannot."""
    import torch

    dm = ro.load("modules.deepbooru_model")
    from sdwebui_tpu.models import deepbooru as db

    torch.manual_seed(0)
    model = dm.DeepDanbooruModel().eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, _tags = db.convert_deepbooru(sd)

    rng = np.random.default_rng(3)
    x = rng.random((1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        expected = model(torch.from_numpy(x)).numpy()
    got = np.asarray(db.apply(params, x))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-4)


# ===========================================================================
# 6. SD3 MMDiT — reference torch model state dict → our loader → forward
# ===========================================================================

@pytest.mark.slow
def test_mmdit_reference_state_dict_forward():
    import torch

    mm = ro.load("modules.models.sd3.mmdit")
    from sdwebui_tpu.loader.convert import convert_mmdit
    from sdwebui_tpu.models import mmdit as our_mmdit

    torch.manual_seed(1)
    depth = 4
    model = mm.MMDiT(
        input_size=None, pos_embed_max_size=16, patch_size=2, in_channels=16,
        depth=depth, num_patches=16 * 16, adm_in_channels=64,
        context_embedder_config={"target": "torch.nn.Linear",
                                 "params": {"in_features": 96,
                                            "out_features": 64 * depth}},
    ).eval()
    sd = {"model.diffusion_model." + k: v.numpy()
          for k, v in model.state_dict().items()}
    params, cfg = convert_mmdit(sd)
    assert cfg.depth == depth and cfg.context_dim == 96 and cfg.pooled_dim == 64

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    t = np.array([999.0, 350.0], np.float32)
    ctx = rng.standard_normal((2, 77, 96)).astype(np.float32)
    y = rng.standard_normal((2, 64)).astype(np.float32)
    with torch.no_grad():
        expected = model(torch.from_numpy(x).permute(0, 3, 1, 2),
                         torch.from_numpy(t),
                         y=torch.from_numpy(y),
                         context=torch.from_numpy(ctx)
                         ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(our_mmdit.apply(params, cfg, x, t, ctx, y))
    np.testing.assert_allclose(got, expected, rtol=5e-4, atol=5e-4)


# ===========================================================================
# 7. Timestep samplers — DDIM / PLMS trajectory parity (VP ↔ VE mapping)
# ===========================================================================

def _eps_np(x, t):
    """Shared analytic 'network': identical formula in torch and jax."""
    return np.sin(x * 1.7) * 0.9 + 0.05 * x * np.cos(t / 100.0)


def _run_reference_timestep_sampler(name, ac, x0, timesteps):
    import torch

    impl = ro.load("modules.sd_samplers_timesteps_impl")

    class _Chain:
        def __init__(self):
            inner2 = type("I2", (), {})()
            inner2.alphas_cumprod = torch.as_tensor(ac, dtype=torch.float32)
            inner = type("I1", (), {})()
            inner.inner_model = inner2
            self.inner_model = inner

        def __call__(self, x, ts, **kw):
            t = ts.view(-1, 1, 1, 1).float()
            return torch.sin(x * 1.7) * 0.9 + 0.05 * x * torch.cos(t / 100.0)

    states = []
    fn = getattr(impl, name)
    out = fn(_Chain(), torch.from_numpy(x0.copy()),
             torch.as_tensor(timesteps), disable=True,
             callback=lambda d: states.append(d["x"].numpy().copy()))
    return out.numpy(), states


def _run_our_timestep_sampler(solver, disc, x0, timesteps):
    import jax.numpy as jnp

    from sdwebui_tpu.sampling.sampler import sample

    t_desc = timesteps[::-1].astype(np.float64)          # [951, 901, ..., 1]
    sigmas = disc.sigmas[t_desc.astype(int)]             # descending σ
    log_sigmas = jnp.asarray(disc.log_sigmas, jnp.float32)

    def model(x, sigma, i):
        a = 1.0 / (1.0 + sigma ** 2)
        t = jnp.argmin(jnp.abs(jnp.log(jnp.maximum(sigma, 1e-12))
                               - log_sigmas)).astype(jnp.float32)
        x_vp = x * jnp.sqrt(a)
        eps = jnp.sin(x_vp * 1.7) * 0.9 + 0.05 * x_vp * jnp.cos(t / 100.0)
        return x - sigma * eps

    states = []
    # VP noise (std-normal start) → VE: divide by sqrt(a(sigma_max))
    a0 = 1.0 / (1.0 + float(sigmas[0]) ** 2)
    x = jnp.asarray(x0 / np.sqrt(a0), jnp.float32)
    out = sample(model, x, sigmas.astype(np.float32), solver=solver,
                 mode="loop", callback=lambda i, xs: states.append(
                     np.asarray(xs) * np.sqrt(1.0 / (1.0 + float(sigmas[i + 1]) ** 2))))
    return np.asarray(out) * np.sqrt(1.0 / (1.0 + float(sigmas[-1]) ** 2)), states


@pytest.mark.parametrize("name,solver", [("ddim", "ddim"), ("plms", "plms")])
def test_timestep_sampler_trajectory_parity(name, solver):
    """The reference's in-repo DDIM/PLMS loops (alphas domain) vs our VE-space
    scan steps: identical ε-network, identical integer-timestep grid, every
    intermediate state must map exactly under x_vp = x_ve·√a(σ)."""
    from sdwebui_tpu.sampling.discretization import (Discretization,
                                                     make_alphas_cumprod)

    ac = make_alphas_cumprod()
    disc = Discretization(ac)
    steps = 20
    timesteps = np.clip(np.arange(0, 1000, 1000 // steps) + 1, 0, 999)

    rng = np.random.default_rng(9)
    x0 = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)

    expected, ref_states = _run_reference_timestep_sampler(
        name, ac, x0, timesteps)
    got, our_states = _run_our_timestep_sampler(solver, disc, x0, timesteps)

    assert len(ref_states) == len(our_states) == steps - 1, \
        (len(ref_states), len(our_states))
    for i, (r, o) in enumerate(zip(ref_states, our_states)):
        np.testing.assert_allclose(o, r, rtol=3e-4, atol=3e-5,
                                   err_msg=f"{name} state {i}")
    np.testing.assert_allclose(got, expected, rtol=3e-4, atol=3e-5)


# ===========================================================================
# 8. Live-preview approximators — reference modules/sd_vae_approx.py and
#    modules/sd_vae_taesd.py classes as oracles (random-init state dicts
#    pushed through our converters; catches key-mapping + wiring bugs)
# ===========================================================================

@pytest.mark.parametrize("latent_channels", [4, 16])
def test_vae_approx_reference_state_dict_forward(latent_channels):
    """Reference VAEApprox (upsample→pad 11→8 valid convs, leaky_relu 0.1)
    vs models/vae_approx.vae_approx_decode on the same random weights."""
    import torch

    sva = ro.load("modules.sd_vae_approx")
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.models.vae_approx import vae_approx_decode
    from sdwebui_tpu.utils.pytree import unflatten

    torch.manual_seed(0)
    net = sva.VAEApprox(latent_channels=latent_channels).eval()
    x = torch.randn(2, latent_channels, 12, 16)
    with torch.no_grad():
        expected = np.clip(net(x).numpy() / 2.0 + 0.5, 0.0, 1.0)
    expected = expected.transpose(0, 2, 3, 1)

    params = unflatten({k: convert_leaf(k, v.numpy())
                        for k, v in net.state_dict().items()})
    got = np.asarray(vae_approx_decode(
        params, x.numpy().transpose(0, 2, 3, 1)))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("latent_channels", [4, 16])
def test_taesd_reference_state_dict_forward(latent_channels):
    """Reference TAESD decoder sequential (modules/sd_vae_taesd.py:37) vs
    models/vae_approx.taesd_decode on the same random weights."""
    import torch

    svt = ro.load("modules.sd_vae_taesd")
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.models.vae_approx import taesd_decode
    from sdwebui_tpu.utils.pytree import unflatten

    torch.manual_seed(1)
    net = svt.decoder(latent_channels=latent_channels).eval()
    x = torch.randn(1, latent_channels, 8, 8)
    with torch.no_grad():
        expected = np.clip(net(x).numpy(), 0.0, 1.0).transpose(0, 2, 3, 1)

    params = unflatten({k: convert_leaf(k, v.numpy())
                        for k, v in net.state_dict().items()})
    got = np.asarray(taesd_decode(params, x.numpy().transpose(0, 2, 3, 1)))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("latent_channels", [4, 16])
def test_taesd_encoder_reference_state_dict_forward(latent_channels):
    """Reference TAESD encoder sequential (modules/sd_vae_taesd.py:47) vs
    models/vae_approx.taesd_encode on the same random weights."""
    import torch

    svt = ro.load("modules.sd_vae_taesd")
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.models.vae_approx import taesd_encode
    from sdwebui_tpu.utils.pytree import unflatten

    torch.manual_seed(2)
    net = svt.encoder(latent_channels=latent_channels).eval()
    x = torch.rand(1, 3, 32, 32)
    with torch.no_grad():
        expected = net(x).numpy().transpose(0, 2, 3, 1)

    params = unflatten({k: convert_leaf(k, v.numpy())
                        for k, v in net.state_dict().items()})
    got = np.asarray(taesd_encode(params, x.numpy().transpose(0, 2, 3, 1)))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


# ===========================================================================
# 9. UniPC — reference modules/models/diffusion/uni_pc (pure torch) as
#    oracle for the scan-fused VE-space UniPC solver
# ===========================================================================

@pytest.mark.parametrize("steps", [8, 20])
def test_unipc_trajectory_parity(steps):
    """Reference UniPCCFG multistep run (variant bh1, order 3,
    time_uniform grid, predict_x0) vs sampling/solvers.py unipc on the SAME
    continuous-time grid, mapped x_vp = x_ve·α(σ).  λ_vp == -log σ_ve, so
    the reference grid converts to VE sigmas exactly."""
    import torch

    impl = ro.load("modules.sd_samplers_timesteps_impl")
    uni_pc = ro.load("modules.models.diffusion.uni_pc.uni_pc")

    from sdwebui_tpu.sampling.discretization import make_alphas_cumprod

    ac = make_alphas_cumprod()
    ns = uni_pc.NoiseScheduleVP(
        "discrete", alphas_cumprod=torch.as_tensor(ac, dtype=torch.float32))

    def eps_torch(x, t_input, **kw):
        # bounded analytic "network" — the trajectory stays O(1) so fp32
        # noise is not amplified by the 14-sigma start
        t = torch.as_tensor(t_input).view(-1, 1, 1, 1).float()
        return torch.tanh(x * 0.3) * 0.9 + 0.05 * torch.cos(t / 100.0)

    rng = np.random.default_rng(11)
    x0_vp = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)

    sampler = impl.UniPCCFG(eps_torch, {}, lambda d: None, ns,
                            predict_x0=True, thresholding=False,
                            variant="bh1")
    with torch.no_grad():
        ref = sampler.sample(torch.from_numpy(x0_vp.copy()), steps=steps,
                             t_start=None, skip_type="time_uniform",
                             method="multistep", order=3,
                             lower_order_final=True).numpy()

    # the reference's continuous grid → VE sigmas (λ_vp == -log σ_ve)
    t_T, t_0 = float(ns.T), 1.0 / ns.total_N
    t_grid = torch.linspace(t_T, t_0, steps + 1)
    lam = ns.marginal_lambda(t_grid).numpy().astype(np.float64)
    sigmas_ve = np.exp(-lam)

    # σ → model-input time mapping (UniPCCFG.get_model_input_time) via a
    # dense inversion table of the SAME discrete noise schedule
    ts_dense = torch.linspace(t_0, t_T, 4001)
    lam_dense = ns.marginal_lambda(ts_dense).numpy().astype(np.float64)
    t_input_dense = (ts_dense.numpy() - 1.0 / ns.total_N) * 1000.0
    order_ix = np.argsort(lam_dense)
    lam_sorted = lam_dense[order_ix]
    t_input_sorted = t_input_dense[order_ix]

    import jax.numpy as jnp

    from sdwebui_tpu.sampling.sampler import sample

    lam_tab = jnp.asarray(lam_sorted, jnp.float32)
    tin_tab = jnp.asarray(t_input_sorted, jnp.float32)

    def model(x_ve, sigma, i):
        lam_x = -jnp.log(jnp.maximum(sigma, 1e-12))
        t_in = jnp.interp(lam_x, lam_tab, tin_tab)
        a = jnp.sqrt(1.0 / (1.0 + sigma ** 2))
        x_vp = x_ve * a
        eps = jnp.tanh(x_vp * 0.3) * 0.9 + 0.05 * jnp.cos(t_in / 100.0)
        return x_ve - sigma * eps

    a0 = np.sqrt(1.0 / (1.0 + sigmas_ve[0] ** 2))
    x_ve = jnp.asarray(x0_vp / a0, jnp.float32)
    out_ve = np.asarray(sample(model, x_ve, sigmas_ve.astype(np.float32),
                               solver="unipc", mode="loop"))
    a_end = np.sqrt(1.0 / (1.0 + sigmas_ve[-1] ** 2))
    got = out_ve * a_end
    # fp32 noise amplified ~150x by the VP x0-prediction at t_T (1/alpha);
    # semantic drift would diverge at O(0.1+)
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


# ===========================================================================
# 10. Masking + styles — reference modules/masking.py / modules/styles.py
#     (pure PIL / pure python) as oracles
# ===========================================================================

def test_masking_crop_region_parity():
    """get_crop_region_v2 + expand_crop_region vs the reference's own
    implementations across random masks and paddings."""
    ref = ro.load("modules.masking")
    from sdwebui_tpu.utils import masking as ours

    rng = np.random.default_rng(7)
    for trial in range(25):
        h, w = int(rng.integers(16, 96)), int(rng.integers(16, 96))
        mask = (rng.random((h, w)) > float(rng.uniform(0.5, 0.999)))
        from PIL import Image

        mask_img = Image.fromarray((mask * 255).astype(np.uint8))
        pad = int(rng.integers(0, 12))
        r_ref = ref.get_crop_region_v2(mask_img, pad)
        r_our = ours.get_crop_region_v2(mask, pad)
        if r_ref is None:
            assert r_our is None
            continue
        assert tuple(r_our) == tuple(r_ref), (trial, r_our, r_ref)

        pw, ph = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        e_ref = ref.expand_crop_region(list(r_ref), pw, ph, w, h)
        e_our = ours.expand_crop_region(tuple(r_our), pw, ph, w, h)
        assert tuple(e_our) == tuple(e_ref), (trial, e_our, e_ref)


def test_styles_extraction_parity():
    """extract_original_prompt behavior vs the reference's
    extract_style_text_from_prompt over template and suffix styles."""
    ref = ro.load("modules.styles")
    from sdwebui_tpu.text.styles import extract_original_prompt

    cases = [
        ("masterpiece, best quality", "a cat, masterpiece, best quality"),
        ("masterpiece, best quality", "a cat"),
        ("photo of {prompt}, 4k", "photo of a dog, 4k"),
        ("photo of {prompt}, 4k", "painting of a dog, 8k"),
        ("", "anything"),
        ("x", "x"),
    ]
    for style_text, prompt in cases:
        ok_ref, ref_prompt = ref.extract_style_text_from_prompt(style_text,
                                                                prompt)
        our_prompt, ok_our = extract_original_prompt(style_text, prompt)
        assert ok_our == ok_ref, (style_text, prompt)
        if ok_ref:
            assert our_prompt.strip() == ref_prompt.strip(), \
                (style_text, prompt, our_prompt, ref_prompt)


# ===========================================================================
# 11. Restart sampler — reference modules/sd_samplers_extra.py (pure torch,
#     k-diffusion deps stubbed with the public 3-line utilities)
# ===========================================================================

@pytest.mark.parametrize("steps", [12, 30, 40])
def test_restart_sampler_trajectory_parity(steps):
    """Whole-run parity incl. the automatic restart-plan construction (the
    ≥20-step karras re-schedule and re-noise segments); s_noise=0 makes the
    reference deterministic, matching our zero pre-generated noise."""
    import torch

    extra = ro.load("modules.sd_samplers_extra")

    def denoised_torch(x, sigma, **kw):
        s = sigma.view(-1, 1, 1, 1)
        return torch.tanh(x * 0.3) + 0.1 * torch.cos(s)

    rng = np.random.default_rng(13)
    sigmas_np = None
    from sdwebui_tpu.sampling.schedulers import karras as karras_schedule

    sigmas_np = karras_schedule(steps, 0.0292, 14.6146).astype(np.float64)
    x0 = (rng.standard_normal((2, 8, 8, 4)) * sigmas_np[0]).astype(np.float32)

    with torch.no_grad():
        ref = extra.restart_sampler(
            denoised_torch, torch.from_numpy(x0.copy()),
            torch.as_tensor(sigmas_np, dtype=torch.float64),
            disable=True, s_noise=0.0).numpy()

    import jax.numpy as jnp

    from sdwebui_tpu.sampling.sampler import sample

    def model(x, sigma, i):
        return jnp.tanh(x * 0.3) + 0.1 * jnp.cos(sigma)

    got = np.asarray(sample(model, jnp.asarray(x0),
                            sigmas_np.astype(np.float32), solver="restart",
                            mode="loop"))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


# ===========================================================================
# 12. ImageRNG — reference modules/rng.py (randn_source=NV path) as the
#     whole-flow oracle: first/next, subseed slerp, seed-resize, ENSD
# ===========================================================================

def _ref_image_rng(**kw):
    rng_mod = ro.load("modules.rng")
    return rng_mod


@pytest.mark.parametrize("case", ["plain", "slerp", "resize", "ensd"])
def test_image_rng_reference_parity(case):
    rng_mod = _ref_image_rng()
    shared = ro.install_stubs()

    kwargs = dict(shape=(4, 8, 10), seeds=[5, 6])
    ours_kwargs = dict(kwargs, channels_last=False)
    if case == "slerp":
        kwargs.update(subseeds=[100, 101], subseed_strength=0.4)
        ours_kwargs.update(subseeds=[100, 101], subseed_strength=0.4)
    if case == "resize":
        kwargs.update(seed_resize_from_h=48, seed_resize_from_w=64)
        ours_kwargs.update(seed_resize_from_h=48, seed_resize_from_w=64)
    old_ensd = shared.opts.eta_noise_seed_delta
    if case == "ensd":
        shared.opts.eta_noise_seed_delta = 31337
        ours_kwargs.update(eta_noise_seed_delta=31337)

    try:
        ref = rng_mod.ImageRNG(**kwargs)
        r1 = ref.first().numpy()
        r2 = ref.next().numpy()

        from sdwebui_tpu.rng import ImageRNG as OurRNG

        ours = OurRNG(**ours_kwargs)
        o1 = np.asarray(ours.first())
        o2 = np.asarray(ours.next())
        # slerp accumulates fp32 rounding differently in torch vs numpy
        # (≤1e-6); every other path is bit-exact
        np.testing.assert_allclose(o1, r1, atol=2e-6, rtol=0,
                                   err_msg=f"{case} first")
        np.testing.assert_allclose(o2, r2, atol=2e-6, rtol=0,
                                   err_msg=f"{case} next")
    finally:
        shared.opts.eta_noise_seed_delta = old_ensd


# ===========================================================================
# 13. DDIM CFG++ — reference sd_samplers_timesteps_impl.ddim_cfgpp as the
#     whole-trajectory oracle (incl. the 1/12.5 cond-scale mapping)
# ===========================================================================

def test_ddim_cfgpp_trajectory_parity():
    import torch

    impl = ro.load("modules.sd_samplers_timesteps_impl")

    from sdwebui_tpu.sampling.discretization import (Discretization,
                                                     make_alphas_cumprod)

    ac = make_alphas_cumprod()
    disc = Discretization(ac)
    steps = 12
    timesteps = np.clip(np.arange(0, 1000, 1000 // steps) + 1, 0, 999)
    cfg_scale = 7.0

    def eps_uncond_t(x, t):
        return torch.sin(x * 1.3) * 0.8

    def eps_cond_t(x, t):
        return torch.cos(x * 0.7) * 0.8 + 0.05 * torch.cos(t / 100.0)

    class _Chain:
        cond_scale_miltiplier = 1.0
        need_last_noise_uncond = False

        def __init__(self):
            inner2 = type("I2", (), {})()
            inner2.alphas_cumprod = torch.as_tensor(ac, dtype=torch.float32)
            inner = type("I1", (), {})()
            inner.inner_model = inner2
            self.inner_model = inner

        def __call__(self, x, ts, **kw):
            t = ts.view(-1, 1, 1, 1).float()
            unc = eps_uncond_t(x, t)
            cond = eps_cond_t(x, t)
            self.last_noise_uncond = unc
            return unc + (cond - unc) * cfg_scale * self.cond_scale_miltiplier

    rng = np.random.default_rng(17)
    x0 = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    with torch.no_grad():
        ref = impl.ddim_cfgpp(_Chain(), torch.from_numpy(x0.copy()),
                              torch.as_tensor(timesteps), disable=True).numpy()

    # ours: VE-space run on the same integer grid; model returns stacked
    # [cfg_denoised, uncond_denoised] with the same 1/12.5 scale mapping
    import jax.numpy as jnp

    from sdwebui_tpu.sampling.sampler import sample

    t_desc = timesteps[::-1].astype(np.float64)
    sigmas = disc.sigmas[t_desc.astype(int)]
    log_sigmas = jnp.asarray(disc.log_sigmas, jnp.float32)

    def model(x, sigma, i):
        a = 1.0 / (1.0 + sigma ** 2)
        t = jnp.argmin(jnp.abs(jnp.log(jnp.maximum(sigma, 1e-12))
                               - log_sigmas)).astype(jnp.float32)
        x_vp = x * jnp.sqrt(a)
        unc = jnp.sin(x_vp * 1.3) * 0.8
        cond = jnp.cos(x_vp * 0.7) * 0.8 + 0.05 * jnp.cos(t / 100.0)
        eps = unc + (cond - unc) * cfg_scale * (1.0 / 12.5)
        return jnp.stack([x - sigma * eps, x - sigma * unc], axis=0)

    a0 = 1.0 / (1.0 + float(sigmas[0]) ** 2)
    x_ve = jnp.asarray(x0 / np.sqrt(a0), jnp.float32)
    out = sample(model, x_ve, sigmas.astype(np.float32),
                 solver="ddim_cfgpp", mode="loop")
    got = np.asarray(out) * np.sqrt(1.0 / (1.0 + float(sigmas[-1]) ** 2))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-5)


# ===========================================================================
# 14. Extra-network tag parsing — reference modules/extra_networks.py
# ===========================================================================

def test_extra_network_tag_parsing_parity():
    """parse_prompt strips the same tags with the same (kind, items) splits
    as the reference's re_extra_net + ExtraNetworkParams."""
    ref = ro.load("modules.extra_networks")
    from sdwebui_tpu.networks.extra_networks import parse_prompt as ours

    cases = [
        "a cat <lora:style:0.8> walking",
        "<hypernet:net:1> <lora:a:0.5:0.7> text",
        "no tags at all",
        "<lora:name with space:1>",
        "<lyco:x>, <lora:y:> end",
        "broken <lora:unclosed and <lora:ok:1>",
        "nested <lora:a<b:1>",
    ]
    for prompt in cases:
        ref_clean, ref_data = ref.parse_prompt(prompt)
        our_clean, our_nets = ours(prompt)
        assert our_clean == ref_clean, prompt
        flat_ref = [(kind, p.items) for kind, params in ref_data.items()
                    for p in params]
        flat_ours = [(n.kind, n.items) for n in our_nets]
        assert sorted(map(str, flat_ours)) == sorted(map(str, flat_ref)), prompt


def test_ddim_eta_trajectory_parity():
    """DDIM with η=1 (stochastic DDPM-like): same precomputed noise fed to
    both the reference loop (via a randn_like intercept) and our scan."""
    import types

    import torch

    impl = ro.load("modules.sd_samplers_timesteps_impl")

    from sdwebui_tpu.sampling.discretization import (Discretization,
                                                     make_alphas_cumprod)

    ac = make_alphas_cumprod()
    disc = Discretization(ac)
    steps = 10
    timesteps = np.clip(np.arange(0, 1000, 1000 // steps) + 1, 0, 999)

    rng = np.random.default_rng(23)
    x0 = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    noises = [rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
              for _ in range(steps)]

    class _Chain:
        def __init__(self):
            inner2 = type("I2", (), {})()
            inner2.alphas_cumprod = torch.as_tensor(ac, dtype=torch.float32)
            inner = type("I1", (), {})()
            inner.inner_model = inner2
            self.inner_model = inner

        def __call__(self, x, ts, **kw):
            t = ts.view(-1, 1, 1, 1).float()
            return torch.sin(x * 1.7) * 0.9 + 0.05 * x * torch.cos(t / 100.0)

    queue = [torch.from_numpy(n.copy()) for n in noises]
    fake_torch = types.SimpleNamespace(randn_like=lambda x: queue.pop(0))
    orig = impl.k_diffusion.sampling.torch
    impl.k_diffusion.sampling.torch = fake_torch
    try:
        with torch.no_grad():
            ref = impl.ddim(_Chain(), torch.from_numpy(x0.copy()),
                            torch.as_tensor(timesteps), disable=True,
                            eta=1.0).numpy()
    finally:
        impl.k_diffusion.sampling.torch = orig

    import jax.numpy as jnp

    from sdwebui_tpu.sampling.sampler import sample

    t_desc = timesteps[::-1].astype(np.float64)
    sigmas = disc.sigmas[t_desc.astype(int)]
    log_sigmas = jnp.asarray(disc.log_sigmas, jnp.float32)

    def model(x, sigma, i):
        a = 1.0 / (1.0 + sigma ** 2)
        t = jnp.argmin(jnp.abs(jnp.log(jnp.maximum(sigma, 1e-12))
                               - log_sigmas)).astype(jnp.float32)
        x_vp = x * jnp.sqrt(a)
        eps = jnp.sin(x_vp * 1.7) * 0.9 + 0.05 * x_vp * jnp.cos(t / 100.0)
        return x - sigma * eps

    a0 = 1.0 / (1.0 + float(sigmas[0]) ** 2)
    x_ve = jnp.asarray(x0 / np.sqrt(a0), jnp.float32)
    noise_arr = np.stack(noises)[:, None]   # (n, 1, B, H, W, C)
    out = sample(model, x_ve, sigmas.astype(np.float32), solver="ddim",
                 noise=jnp.asarray(noise_arr), extra={"eta": 1.0},
                 mode="loop")
    got = np.asarray(out) * np.sqrt(1.0 / (1.0 + float(sigmas[-1]) ** 2))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


# ===========================================================================
# 15. Prompt chunking — reference sd_hijack_clip.TextConditionalModel
#     .tokenize_line (75-token chunks, BREAK, comma backtracking) fuzz
# ===========================================================================

def test_tokenize_line_chunking_parity():
    import random
    import sys
    import types

    hijack_mod = sys.modules.get("modules.sd_hijack")
    ro.install_stubs()
    hijack_mod = sys.modules["modules.sd_hijack"]
    db = types.SimpleNamespace(
        find_embedding_at_position=lambda tokens, pos: (None, None))
    hijack_mod.model_hijack = types.SimpleNamespace(embedding_db=db)

    clip_mod = ro.load("modules.sd_hijack_clip")
    from sdwebui_tpu.text.conditioner import TextConditioner
    from sdwebui_tpu.text.tokenizer import BOS, EOS, get_tokenizer

    tok = get_tokenizer()

    class RefModel(clip_mod.TextConditionalModel):
        def __init__(self):
            super().__init__()
            self.id_start, self.id_end, self.id_pad = BOS, EOS, EOS
            self.comma_token = 267

        def tokenize(self, texts):
            return [tok.encode(t) for t in texts]

    ref = RefModel()
    ours = TextConditioner(None, None, tok)

    words = ["cat", "dog", "tree,", "blue", "sky,", "runs", "masterpiece,",
             "BREAK", "(red:1.3)", "[dark]", "photo", "of,"]
    rng = random.Random(4)
    prompts = ["a cat, a dog", "x " * 90, ("word, " * 40).strip()]
    for _ in range(25):
        prompts.append(" ".join(rng.choice(words)
                                for _ in range(rng.randrange(1, 160))))

    for prompt in prompts:
        ref_chunks, ref_count = ref.tokenize_line(prompt)
        our_chunks, our_count = ours.tokenize_line(prompt)
        assert our_count == ref_count, prompt[:60]
        assert len(our_chunks) == len(ref_chunks), prompt[:60]
        for rc, oc in zip(ref_chunks, our_chunks):
            # ours defers BOS/EOS framing to encode(); strip the
            # reference's frame for comparison
            assert list(oc.tokens) == list(rc.tokens)[1:-1], prompt[:60]
            assert [round(float(m), 5) for m in oc.multipliers] == \
                [round(float(m), 5) for m in rc.multipliers][1:-1], prompt[:60]


# ===========================================================================
# 16. AltDiffusion-m18 — reference modules/xlmr_m18.py as oracle (penultimate
#     hidden + pre_LN + transformation_pre projection)
# ===========================================================================

@pytest.mark.slow
def test_xlmr_m18_reference_state_dict_forward():
    import types

    import torch

    m18 = ro.load("modules.xlmr_m18")
    # __init__ eagerly fetches the xlm-roberta-large tokenizer (network +
    # sentencepiece, both absent); the conditioning math never touches it
    m18.XLMRobertaTokenizer = types.SimpleNamespace(
        from_pretrained=lambda *a, **k: None)
    from sdwebui_tpu.models import xlmr as ours

    cfg = m18.BertSeriesConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, project_dim=40, pad_token_id=1)
    torch.manual_seed(0)
    net = m18.BertSeriesModelWithTransformation(cfg).eval()

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    tree, ocfg = ours.convert_xlmr(sd, prefix="")
    assert ocfg.pre_transformation and ocfg.project_dim == 40

    ids = np.array([[0, 5, 9, 7, 2, 1, 1, 1], [0, 11, 3, 2, 1, 1, 1, 1]],
                   np.int32)
    mask = (ids != 1).astype(np.int32)
    with torch.no_grad():
        ref = net(input_ids=torch.from_numpy(ids.astype(np.int64)),
                  attention_mask=torch.from_numpy(mask.astype(np.int64)))
        expected = ref["projection_state"].numpy()

    import jax.numpy as jnp

    got = np.asarray(ours.apply(tree, ocfg, jnp.asarray(ids),
                                attention_mask=jnp.asarray(mask)))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=3e-4, atol=3e-5)


# ===========================================================================
# 17. Euler-ancestral — independent torch twin (VERDICT r2 item 9)
#
# The k-diffusion repo (the reference's actual sampler implementation) is a
# git-clone dependency absent from this image, so the most-used sampler gets
# an INDEPENDENT oracle instead: the ancestral update below is hand-derived
# in torch from the published equations (Karras et al. 2022 eq. 5-6 /
# k-diffusion sample_euler_ancestral + get_ancestral_step):
#
#   sigma_up   = min(s_to, eta * sqrt(s_to^2 (s_from^2 - s_to^2) / s_from^2))
#   sigma_down = sqrt(s_to^2 - sigma_up^2)
#   d = (x - denoised) / s_from                  (probability-flow derivative)
#   x <- x + d (sigma_down - s_from) + noise * s_noise * sigma_up  (s_to > 0)
#
# It is written WITHOUT looking at sampling/solvers.py and trajectory-tested
# against our scan solver with intercepted noise (same recipe as the DDIM-eta
# oracle above).
# ===========================================================================

def _torch_euler_ancestral_twin(denoiser, x, sigmas, noises, eta, s_noise):
    import torch

    for i in range(len(sigmas) - 1):
        s_from = float(sigmas[i])
        s_to = float(sigmas[i + 1])
        denoised = denoiser(x, s_from)
        if s_to > 0:
            var_up = (s_to ** 2) * (s_from ** 2 - s_to ** 2) / (s_from ** 2)
            sigma_up = min(s_to, eta * var_up ** 0.5)
            sigma_down = (s_to ** 2 - sigma_up ** 2) ** 0.5
        else:
            sigma_up, sigma_down = 0.0, 0.0
        d = (x - denoised) / s_from
        x = x + d * (sigma_down - s_from)
        if s_to > 0:
            x = x + torch.from_numpy(noises[i]) * s_noise * sigma_up
    return x


@pytest.mark.parametrize("eta,s_noise", [(1.0, 1.0), (0.62, 1.1)])
def test_euler_ancestral_twin_trajectory(eta, s_noise):
    import torch

    from sdwebui_tpu.sampling.discretization import (Discretization,
                                                     make_alphas_cumprod)
    from sdwebui_tpu.sampling.sampler import sample

    disc = Discretization(make_alphas_cumprod())
    steps = 12
    # the webui default sigma selection (uniform timestep stride)
    ts = np.linspace(999, 0, steps + 1)[:-1].round().astype(int)
    sigmas = np.concatenate([disc.sigmas[ts], [0.0]]).astype(np.float64)

    rng = np.random.default_rng(41)
    x0 = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    noises = [rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
              for _ in range(steps)]

    def torch_denoiser(x, sigma):
        return torch.sin(x * 1.3) * 0.8 + x * 0.1 / (1.0 + sigma)

    with torch.no_grad():
        ref = _torch_euler_ancestral_twin(
            torch_denoiser, torch.from_numpy(x0 * float(sigmas[0])),
            sigmas, noises, eta, s_noise).numpy()

    import jax.numpy as jnp

    def jax_denoiser(x, sigma, i):
        return jnp.sin(x * 1.3) * 0.8 + x * 0.1 / (1.0 + sigma)

    noise_arr = jnp.asarray(np.stack(noises)[:, None])
    out = sample(jax_denoiser, jnp.asarray(x0 * float(sigmas[0])),
                 sigmas.astype(np.float32), solver="euler_ancestral",
                 noise=noise_arr, extra={"eta": eta, "s_noise": s_noise},
                 mode="loop")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)

    # and the jitted scan path must equal the loop path
    out_scan = sample(jax_denoiser, jnp.asarray(x0 * float(sigmas[0])),
                      sigmas.astype(np.float32), solver="euler_ancestral",
                      noise=noise_arr, extra={"eta": eta, "s_noise": s_noise},
                      mode="scan")
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


# ===========================================================================
# 18. k-diffusion solver family — independent torch twins (VERDICT r3 item 2)
#
# The reference drives k_diffusion.sampling.* directly
# (modules/sd_samplers_kdiffusion.py:11-27) at pinned commit ab527a9.  That
# repo is a git-clone dependency absent from this image, so each solver the
# webui's users live on gets an INDEPENDENT torch twin, hand-written from
# the published algorithms (Karras et al. 2022 Alg. 2; Lu et al. 2022/2023
# DPM-Solver++; k-diffusion's documented update rules at the pinned commit)
# WITHOUT consulting sampling/solvers.py, and trajectory-tested step-by-step
# against our scan solver with intercepted noise.  Unlike the property tests
# in test_sampling.py (perfect-denoiser / linear-ODE), these catch a
# consistently-wrong coefficient: writing them immediately caught the DPM2
# midpoint (old rho-1/3 k-diffusion rule vs the pinned log-sigma lerp).
# ===========================================================================

def _kd_ancestral(sigma_from, sigma_to, eta):
    """get_ancestral_step (k-diffusion sampling.py)."""
    if not eta:
        return sigma_to, 0.0
    var = sigma_to ** 2 * (sigma_from ** 2 - sigma_to ** 2) / sigma_from ** 2
    sigma_up = min(sigma_to, eta * var ** 0.5)
    sigma_down = (sigma_to ** 2 - sigma_up ** 2) ** 0.5
    return sigma_down, sigma_up


def _kd_churn(x, i, sigmas, noises, s_churn, s_tmin, s_tmax, s_noise):
    """Karras stochastic churn preamble shared by euler/heun/dpm_2."""
    import torch

    n = len(sigmas) - 1
    sigma = float(sigmas[i])
    gamma = (min(s_churn / n, 2 ** 0.5 - 1)
             if s_churn > 0 and s_tmin <= sigma <= s_tmax else 0.0)
    sigma_hat = sigma * (gamma + 1)
    if gamma > 0:
        eps = torch.from_numpy(noises[i][0]) * s_noise
        x = x + eps * (sigma_hat ** 2 - sigma ** 2) ** 0.5
    return x, sigma_hat


def _twin_heun(den, x, sigmas, noises, *, s_churn=0.0, s_tmin=0.0,
               s_tmax=float("inf"), s_noise=1.0, **_):
    for i in range(len(sigmas) - 1):
        x, s_hat = _kd_churn(x, i, sigmas, noises, s_churn, s_tmin, s_tmax,
                             s_noise)
        s_next = float(sigmas[i + 1])
        denoised = den(x, s_hat)
        d = (x - denoised) / s_hat
        dt = s_next - s_hat
        if s_next == 0:
            x = x + d * dt
        else:
            x_2 = x + d * dt
            denoised_2 = den(x_2, s_next)
            d_2 = (x_2 - denoised_2) / s_next
            x = x + (d + d_2) / 2 * dt
    return x


def _twin_dpm_2(den, x, sigmas, noises, *, s_churn=0.0, s_tmin=0.0,
                s_tmax=float("inf"), s_noise=1.0, **_):
    import math

    for i in range(len(sigmas) - 1):
        x, s_hat = _kd_churn(x, i, sigmas, noises, s_churn, s_tmin, s_tmax,
                             s_noise)
        s_next = float(sigmas[i + 1])
        denoised = den(x, s_hat)
        d = (x - denoised) / s_hat
        if s_next == 0:
            x = x + d * (s_next - s_hat)
        else:
            s_mid = math.exp((math.log(s_hat) + math.log(s_next)) / 2)
            x_2 = x + d * (s_mid - s_hat)
            denoised_2 = den(x_2, s_mid)
            d_2 = (x_2 - denoised_2) / s_mid
            x = x + d_2 * (s_next - s_hat)
    return x


def _twin_dpm_2_ancestral(den, x, sigmas, noises, *, eta=1.0, s_noise=1.0,
                          **_):
    import math

    import torch

    for i in range(len(sigmas) - 1):
        s = float(sigmas[i])
        denoised = den(x, s)
        sd, su = _kd_ancestral(s, float(sigmas[i + 1]), eta)
        d = (x - denoised) / s
        if sd == 0:
            x = x + d * (sd - s)
        else:
            s_mid = math.exp((math.log(s) + math.log(sd)) / 2)
            x_2 = x + d * (s_mid - s)
            denoised_2 = den(x_2, s_mid)
            d_2 = (x_2 - denoised_2) / s_mid
            x = x + d_2 * (sd - s)
            x = x + torch.from_numpy(noises[i][0]) * s_noise * su
    return x


def _twin_dpmpp_2s_ancestral(den, x, sigmas, noises, *, eta=1.0,
                             s_noise=1.0, **_):
    import math

    import torch

    for i in range(len(sigmas) - 1):
        s = float(sigmas[i])
        denoised = den(x, s)
        sd, su = _kd_ancestral(s, float(sigmas[i + 1]), eta)
        if sd == 0:
            d = (x - denoised) / s
            x = x + d * (sd - s)
        else:
            t, t_next = -math.log(s), -math.log(sd)
            r = 1 / 2
            h = t_next - t
            s_mid = t + r * h
            x_2 = (math.exp(-s_mid) / math.exp(-t)) * x \
                - math.expm1(-h * r) * denoised
            denoised_2 = den(x_2, math.exp(-s_mid))
            x = (math.exp(-t_next) / math.exp(-t)) * x \
                - math.expm1(-h) * denoised_2
        if float(sigmas[i + 1]) > 0:
            x = x + torch.from_numpy(noises[i][0]) * s_noise * su
    return x


def _twin_dpmpp_sde(den, x, sigmas, noises, *, eta=1.0, s_noise=1.0, r=0.5,
                    **_):
    import math

    import torch

    for i in range(len(sigmas) - 1):
        sig, sig_next = float(sigmas[i]), float(sigmas[i + 1])
        denoised = den(x, sig)
        if sig_next == 0:
            d = (x - denoised) / sig
            x = x + d * (sig_next - sig)
        else:
            t, t_next = -math.log(sig), -math.log(sig_next)
            h = t_next - t
            s_mid = t + h * r
            fac = 1 / (2 * r)
            sd_1, su_1 = _kd_ancestral(math.exp(-t), math.exp(-s_mid), eta)
            s_ = -math.log(sd_1)
            x_2 = (math.exp(-s_) / math.exp(-t)) * x \
                - math.expm1(t - s_) * denoised
            x_2 = x_2 + torch.from_numpy(noises[i][0]) * s_noise * su_1
            denoised_2 = den(x_2, math.exp(-s_mid))
            sd_2, su_2 = _kd_ancestral(math.exp(-t), math.exp(-t_next), eta)
            t_next_ = -math.log(sd_2)
            denoised_d = (1 - fac) * denoised + fac * denoised_2
            x = (math.exp(-t_next_) / math.exp(-t)) * x \
                - math.expm1(t - t_next_) * denoised_d
            x = x + torch.from_numpy(noises[i][1]) * s_noise * su_2
    return x


def _twin_dpmpp_2m(den, x, sigmas, noises, **_):
    import math

    old_denoised = None
    for i in range(len(sigmas) - 1):
        sig, sig_next = float(sigmas[i]), float(sigmas[i + 1])
        denoised = den(x, sig)
        t, t_next = -math.log(sig), -math.log(max(sig_next, 1e-12))
        h = t_next - t
        if old_denoised is None or sig_next == 0:
            denoised_d = denoised
        else:
            h_last = t - (-math.log(float(sigmas[i - 1])))
            r = h_last / h
            denoised_d = (1 + 1 / (2 * r)) * denoised \
                - (1 / (2 * r)) * old_denoised
        x = (sig_next / sig) * x - math.expm1(-h) * denoised_d
        old_denoised = denoised
    return x


def _twin_dpmpp_2m_sde(den, x, sigmas, noises, *, eta=1.0, s_noise=1.0,
                       solver_type="midpoint", **_):
    import math

    import torch

    old_denoised, h_last = None, None
    for i in range(len(sigmas) - 1):
        sig, sig_next = float(sigmas[i]), float(sigmas[i + 1])
        denoised = den(x, sig)
        if sig_next == 0:
            x = denoised
        else:
            t, s = -math.log(sig), -math.log(sig_next)
            h = s - t
            eta_h = eta * h
            x = sig_next / sig * math.exp(-eta_h) * x \
                + (-math.expm1(-h - eta_h)) * denoised
            if old_denoised is not None:
                r = h_last / h
                if solver_type == "heun":
                    x = x + ((-math.expm1(-h - eta_h)) / (-h - eta_h) + 1) \
                        * (1 / r) * (denoised - old_denoised)
                else:
                    x = x + 0.5 * (-math.expm1(-h - eta_h)) \
                        * (1 / r) * (denoised - old_denoised)
            if eta:
                x = x + torch.from_numpy(noises[i][0]) * sig_next \
                    * math.sqrt(-math.expm1(-2 * eta_h)) * s_noise
            h_last = h
        old_denoised = denoised
    return x


def _twin_dpmpp_3m_sde(den, x, sigmas, noises, *, eta=1.0, s_noise=1.0, **_):
    import math

    import torch

    denoised_1 = denoised_2 = None
    h_1 = h_2 = None
    for i in range(len(sigmas) - 1):
        sig, sig_next = float(sigmas[i]), float(sigmas[i + 1])
        denoised = den(x, sig)
        if sig_next == 0:
            x = denoised
        else:
            t, s = -math.log(sig), -math.log(sig_next)
            h = s - t
            h_eta = h * (eta + 1)
            x = math.exp(-h_eta) * x + (-math.expm1(-h_eta)) * denoised
            if h_2 is not None:
                r0, r1 = h_1 / h, h_2 / h
                d1_0 = (denoised - denoised_1) / r0
                d1_1 = (denoised_1 - denoised_2) / r1
                d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
                d2 = (d1_0 - d1_1) / (r0 + r1)
                phi_2 = math.expm1(-h_eta) / h_eta + 1
                phi_3 = phi_2 / h_eta - 0.5
                x = x + phi_2 * d1 - phi_3 * d2
            elif h_1 is not None:
                r = h_1 / h
                d = (denoised - denoised_1) / r
                phi_2 = math.expm1(-h_eta) / h_eta + 1
                x = x + phi_2 * d
            if eta:
                x = x + torch.from_numpy(noises[i][0]) * sig_next \
                    * math.sqrt(-math.expm1(-2 * h * eta)) * s_noise
            h_1, h_2 = h, h_1
            denoised_1, denoised_2 = denoised, denoised_1
    return x


def _twin_lms(den, x, sigmas, noises, *, order=4, **_):
    import scipy.integrate

    sigs = np.asarray(sigmas, np.float64)

    def lin_coeff(cur_order, i, j):
        def fn(tau):
            prod = 1.0
            for k in range(cur_order):
                if j == k:
                    continue
                prod *= (tau - sigs[i - k]) / (sigs[i - j] - sigs[i - k])
            return prod

        return scipy.integrate.quad(fn, sigs[i], sigs[i + 1],
                                    epsrel=1e-4)[0]

    ds = []
    for i in range(len(sigmas) - 1):
        sig = float(sigmas[i])
        denoised = den(x, sig)
        d = (x - denoised) / sig
        ds.append(d)
        if len(ds) > order:
            ds.pop(0)
        cur_order = min(i + 1, order)
        coeffs = [lin_coeff(cur_order, i, j) for j in range(cur_order)]
        x = x + sum(c * d for c, d in zip(coeffs, reversed(ds)))
    return x


# (solver key, twin, noises per step, extra passed to both sides)
KDIFF_TWINS = [
    ("heun", _twin_heun, 0, {}),
    ("heun", _twin_heun, 1,
     {"s_churn": 8.0, "s_tmin": 0.05, "s_tmax": 60.0, "s_noise": 1.05}),
    ("dpm_2", _twin_dpm_2, 0, {}),
    ("dpm_2", _twin_dpm_2, 1, {"s_churn": 5.0, "s_noise": 0.97}),
    ("dpm_2_ancestral", _twin_dpm_2_ancestral, 1, {"eta": 1.0}),
    ("dpm_2_ancestral", _twin_dpm_2_ancestral, 1,
     {"eta": 0.7, "s_noise": 1.1}),
    ("dpmpp_2s_ancestral", _twin_dpmpp_2s_ancestral, 1, {"eta": 1.0}),
    ("dpmpp_2s_ancestral", _twin_dpmpp_2s_ancestral, 1, {"eta": 0.55}),
    ("dpmpp_sde", _twin_dpmpp_sde, 2, {"eta": 1.0}),
    ("dpmpp_sde", _twin_dpmpp_sde, 2,
     {"eta": 0.8, "s_noise": 1.05, "r": 0.5}),
    ("dpmpp_2m", _twin_dpmpp_2m, 0, {}),
    ("dpmpp_2m_sde", _twin_dpmpp_2m_sde, 1,
     {"eta": 1.0, "solver_type": "midpoint"}),
    ("dpmpp_2m_sde", _twin_dpmpp_2m_sde, 1,
     {"eta": 1.0, "solver_type": "heun"}),
    ("dpmpp_2m_sde", _twin_dpmpp_2m_sde, 1,
     {"eta": 0.65, "solver_type": "midpoint", "s_noise": 1.1}),
    ("dpmpp_3m_sde", _twin_dpmpp_3m_sde, 1, {"eta": 1.0}),
    ("dpmpp_3m_sde", _twin_dpmpp_3m_sde, 1, {"eta": 0.4, "s_noise": 0.9}),
    ("lms", _twin_lms, 0, {}),
]


@pytest.mark.parametrize(
    "solver,twin,nps,extra", KDIFF_TWINS,
    ids=[f"{s}-{i}" for i, (s, *_) in enumerate(KDIFF_TWINS)])
def test_kdiffusion_twin_trajectory(solver, twin, nps, extra):
    import torch

    from sdwebui_tpu.sampling.discretization import (Discretization,
                                                     make_alphas_cumprod)
    from sdwebui_tpu.sampling.sampler import sample

    disc = Discretization(make_alphas_cumprod())
    steps = 10
    ts = np.linspace(999, 0, steps + 1)[:-1].round().astype(int)
    sigmas = np.concatenate([disc.sigmas[ts], [0.0]]).astype(np.float64)

    rng = np.random.default_rng(hash((solver, nps, str(extra))) % 2**32)
    x0 = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    noises = [[rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
               for _ in range(max(nps, 1))] for _ in range(steps)]

    def torch_denoiser(x, sigma):
        return torch.sin(x * 1.3) * 0.8 + x * 0.1 / (1.0 + sigma)

    with torch.no_grad():
        ref = twin(torch_denoiser, torch.from_numpy(x0 * float(sigmas[0])),
                   sigmas, noises, **extra).numpy()

    import jax.numpy as jnp

    def jax_denoiser(x, sigma, i):
        return jnp.sin(x * 1.3) * 0.8 + x * 0.1 / (1.0 + sigma)

    noise_arr = jnp.asarray(np.stack([np.stack(ns) for ns in noises]))
    out = sample(jax_denoiser, jnp.asarray(x0 * float(sigmas[0])),
                 sigmas.astype(np.float32), solver=solver,
                 noise=noise_arr, extra=dict(extra), mode="loop")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)

    out_scan = sample(jax_denoiser, jnp.asarray(x0 * float(sigmas[0])),
                      sigmas.astype(np.float32), solver=solver,
                      noise=noise_arr, extra=dict(extra), mode="scan")
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out),
                               rtol=2e-5, atol=2e-5)


# ===========================================================================
# 19. LCM — the reference's OWN in-repo sampler module as oracle
# (modules/sd_samplers_lcm.py: LCMCompVisDenoiser 50-entry distillation
# subtable + consistency-model output transform + sample_lcm loop), driven
# through the real tiny UNet twin and compared against the production
# sample_latents path (solver="lcm" + the LCM branch in
# pipeline/processing.py).  Round 4: this caught that LCM previously ran
# with plain CompVis scalings — the CM c_skip/c_out transform and subtable
# σ→t were missing entirely.
# ===========================================================================

def test_lcm_subtable_and_schedule_vs_reference():
    import torch

    lcm_ref = ro.load("modules.sd_samplers_lcm")
    import modules.shared as _shared

    _shared.sd_model.device = "cpu"

    from sdwebui_tpu.sampling.discretization import (Discretization,
                                                     lcm_schedule,
                                                     lcm_subtable,
                                                     make_alphas_cumprod)

    disc = Discretization(make_alphas_cumprod())

    class _Fake:
        device = "cpu"
        alphas_cumprod = torch.as_tensor(
            np.asarray(disc.alphas_cumprod, np.float32))

    den = lcm_ref.LCMCompVisDenoiser(_Fake())
    _t_full, sub = lcm_subtable(disc)
    np.testing.assert_allclose(sub, den.sigmas.numpy(), rtol=1e-5)
    for n in (4, 8, 20):
        ref_sig = den.get_sigmas(n).numpy()
        ours = lcm_schedule(disc, n)
        np.testing.assert_allclose(ours, ref_sig, rtol=1e-5, atol=1e-7,
                                   err_msg=f"n={n}")


def test_lcm_e2e_trajectory_vs_reference():
    import torch

    from torch_twin_unet import make_torch_unet

    lcm_ref = ro.load("modules.sd_samplers_lcm")
    import modules.shared as _shared

    _shared.sd_model.device = "cpu"

    import jax.numpy as jnp

    from sdwebui_tpu.pipeline.processing import sample_latents
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd
    from sdwebui_tpu.sampling.cfg import CondSchedule
    from sdwebui_tpu.sampling.discretization import lcm_schedule
    from sdwebui_tpu.utils import devices as dv

    old = dv.get_policy()
    dv.set_policy(dv.DtypePolicy(jnp.float32, jnp.float32, jnp.float32,
                                 jnp.float32))
    try:
        model = create_tiny_sd(seed=0)
        twin = make_torch_unet(model.unet_cfg, model.unet_params)
        rng = np.random.default_rng(23)
        ctx = rng.standard_normal((1, 7, 64)).astype(np.float32)
        x0 = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
        steps = 6
        noises = [rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
                  for _ in range(steps)]

        class _Fake:
            device = "cpu"
            alphas_cumprod = torch.as_tensor(
                np.asarray(model.disc.alphas_cumprod, np.float32))

            def apply_model(self, x, t, **kw):
                xn = x.numpy().transpose(0, 2, 3, 1)
                eps = twin(xn, float(np.asarray(t).reshape(-1)[0]), ctx)
                return torch.from_numpy(
                    np.ascontiguousarray(eps.transpose(0, 3, 1, 2)))

        den = lcm_ref.LCMCompVisDenoiser(_Fake())
        sigmas = lcm_schedule(model.disc, steps)
        it = iter(noises)
        with torch.no_grad():
            want = lcm_ref.sample_lcm(
                lambda x, sigma, **kw: den(x, sigma),
                torch.from_numpy(
                    (x0.transpose(0, 3, 1, 2) * float(sigmas[0])).copy()),
                torch.as_tensor(sigmas.astype(np.float32)),
                noise_sampler=lambda s, sn: torch.from_numpy(
                    next(it).transpose(0, 3, 1, 2).copy()),
                disable=True).numpy().transpose(0, 2, 3, 1)

        sched = CondSchedule(
            cond_bank=jnp.asarray(ctx)[None],
            cond_idx=jnp.zeros((1, steps), jnp.int32),
            cond_weights=jnp.asarray([1.0], jnp.float32),
            uncond_bank=jnp.asarray(ctx),
            uncond_idx=jnp.zeros((steps,), jnp.int32),
            cond_scale=1.0,
        )
        noise_arr = jnp.asarray(np.stack(noises)[:, None])
        got = np.asarray(sample_latents(
            model, sched, jnp.asarray(x0 * float(sigmas[0])),
            sigmas.astype(np.float32), noise_arr, "lcm"))
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
        assert np.abs(want - x0).max() > 0.05
    finally:
        dv.set_policy(old)
