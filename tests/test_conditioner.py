"""Tokenizer + chunked conditioner tests (reference sd_hijack_clip behavior)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdwebui_tpu.models import clip as clip_model
from sdwebui_tpu.models.configs import CLIPTextConfig
from sdwebui_tpu.text.conditioner import (
    CHUNK_LEN, TextConditioner, apply_emphasis, build_cond_schedule,
)
from sdwebui_tpu.text.tokenizer import (
    BOS, COMMA, EOS, ClipBPETokenizer, FallbackTokenizer, get_tokenizer,
)

TINY_CFG = CLIPTextConfig(vocab_size=49408, width=32, layers=2, heads=4)


def make_conditioner(**kw):
    params = clip_model.init_params(TINY_CFG, 0)
    return TextConditioner(params, TINY_CFG, FallbackTokenizer(), **kw)


# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

def test_fallback_tokenizer_deterministic_and_comma():
    t = FallbackTokenizer()
    ids1 = t.encode("hello, world")
    ids2 = t.encode("hello, world")
    assert ids1 == ids2
    assert COMMA in ids1
    assert all(0 <= i < 49408 for i in ids1)


def test_bpe_tokenizer_merges():
    vocab = {"l": 1, "o": 2, "w": 3, "e": 4, "r": 5, "w</w>": 6,
             "lo": 7, "low</w>": 8, "er</w>": 9, "lower</w>": 10, "r</w>": 11}
    merges = [("l", "o"), ("lo", "w</w>"), ("e", "r</w>")]
    t = ClipBPETokenizer(vocab, merges)
    assert t.encode("low") == [8]          # l+o → lo; lo+w</w> → low</w>
    assert t.encode("lower") == [7, 3, 9]  # lo | w | e+r</w> → er</w>


def test_bpe_unknown_chars_dont_crash():
    t = ClipBPETokenizer({"a</w>": 5}, [])
    ids = t.encode("a ☃")
    assert ids[0] == 5


def test_get_tokenizer_fallback():
    tok = get_tokenizer(None)
    assert tok.encode("test") == tok.encode("test")


# --------------------------------------------------------------------------
# chunking
# --------------------------------------------------------------------------

def test_single_chunk_padding():
    c = make_conditioner()
    chunks, count = c.tokenize_line("hello world")
    assert len(chunks) == 1
    assert len(chunks[0].tokens) == CHUNK_LEN
    assert count < CHUNK_LEN
    assert chunks[0].tokens[count:] == [EOS] * (CHUNK_LEN - count)


def test_break_forces_new_chunk():
    c = make_conditioner()
    chunks, _ = c.tokenize_line("a BREAK b")
    assert len(chunks) == 2


def test_long_prompt_multi_chunk():
    c = make_conditioner()
    long = " ".join(["word"] * 100)  # 400 fallback tokens
    chunks, count = c.tokenize_line(long)
    assert len(chunks) == (count + CHUNK_LEN - 1) // CHUNK_LEN
    assert len(chunks) >= 2


def test_comma_backtracking():
    """A comma shortly before the 75-token boundary pulls the tail into the
    next chunk (reference comma_padding_backtrack=20)."""
    c = make_conditioner()
    # 70 single-token 'words' then comma then 10 more → boundary at 75 is 5
    # tokens after the comma (within backtrack window)
    line = " ".join(["a"] * 70) + " , " + " ".join(["b"] * 10)
    chunks, _ = c.tokenize_line(line)
    assert len(chunks) == 2
    # first chunk: 70 a's + comma, padded with EOS
    assert chunks[0].tokens[70] == COMMA
    assert chunks[0].tokens[71] == EOS
    # second chunk starts with the b's
    assert chunks[1].tokens[0] != EOS

    c2 = make_conditioner(comma_padding_backtrack=0)
    chunks2, _ = c2.tokenize_line(line)
    assert chunks2[0].tokens[74] != EOS  # filled to the brim, no backtrack


def test_weights_assigned_to_tokens():
    c = make_conditioner()
    chunks, _ = c.tokenize_line("plain (weighted:1.5)")
    mults = chunks[0].multipliers
    assert 1.5 in mults and 1.0 in mults


# --------------------------------------------------------------------------
# encoding
# --------------------------------------------------------------------------

def test_encode_shapes_and_chunk_padding():
    c = make_conditioner()
    cond, pooled = c.encode(["short", " ".join(["word"] * 100)])
    n_chunks = cond.shape[1] // 77
    assert n_chunks >= 2               # padded to the longer prompt
    assert cond.shape == (2, n_chunks * 77, 32)
    assert pooled.shape == (2, 32)


def test_encode_target_chunks():
    c = make_conditioner()
    cond, _ = c.encode(["short"], target_chunks=3)
    assert cond.shape[1] == 3 * 77


def test_emphasis_modes():
    z = jnp.ones((1, 4, 8))
    m = jnp.asarray([[1.0, 2.0, 1.0, 1.0]])
    orig = apply_emphasis(z, m, "Original")
    nonorm = apply_emphasis(z, m, "No norm")
    ignore = apply_emphasis(z, m, "Ignore")
    np.testing.assert_allclose(np.asarray(ignore), 1.0)
    np.testing.assert_allclose(np.asarray(nonorm)[0, 1], 2.0)
    # Original renormalizes the global mean back to 1.0
    assert np.mean(np.asarray(orig)) == pytest.approx(1.0, rel=1e-5)


def test_emphasis_changes_output():
    c = make_conditioner()
    plain, _ = c.encode(["a thing"])
    emph, _ = c.encode(["a (thing:1.8)"])
    assert not np.allclose(np.asarray(plain), np.asarray(emph))


# --------------------------------------------------------------------------
# TI embedding splice
# --------------------------------------------------------------------------

class FakeEmb:
    def __init__(self, vectors, width):
        self.vectors = vectors
        self.vec = np.full((vectors, width), 7.0, np.float32)


class FakeDB:
    def __init__(self, trigger_ids, emb):
        self.trigger = trigger_ids
        self.emb = emb

    def find_at(self, ids, pos):
        t = self.trigger
        if ids[pos:pos + len(t)] == t:
            return self.emb, len(t)
        return None, 0


def test_ti_embedding_splice():
    emb = FakeEmb(2, 32)
    tok = FallbackTokenizer()
    db = FakeDB(tok.encode("myembed"), emb)
    params = clip_model.init_params(TINY_CFG, 0)
    c = TextConditioner(params, TINY_CFG, tok, embedding_db=db)
    chunks, _ = c.tokenize_line("a myembed b")
    fixes = chunks[0].fixes
    assert len(fixes) == 1
    pos, got = fixes[0]
    assert got is emb and chunks[0].tokens[pos] == 0
    cond, _ = c.encode(["a myembed b"])
    base, _ = c.encode(["a b"])
    assert not np.allclose(np.asarray(cond), np.asarray(base))


# --------------------------------------------------------------------------
# schedules → banks
# --------------------------------------------------------------------------

def test_build_cond_schedule_indices():
    def fake_encode(texts):
        # each text → unique constant plane keyed by its index
        return jnp.stack([jnp.full((77, 4), float(i)) for i in range(len(texts))])

    sched = build_cond_schedule(fake_encode, "a [b:0.5]", "neg", steps=10,
                                cond_scale=5.0)
    assert sched.cond_bank.shape == (1, 2, 77, 4)
    np.testing.assert_array_equal(np.asarray(sched.cond_idx[0]),
                                  [0] * 5 + [1] * 5)
    assert sched.cond_scale == 5.0
    # uncond single entry, all steps index 0
    np.testing.assert_array_equal(np.asarray(sched.uncond_idx), [0] * 10)


def test_build_cond_schedule_and_weights():
    def fake_encode(texts):
        return jnp.zeros((len(texts), 77, 4))

    sched = build_cond_schedule(fake_encode, "x AND y:0.3", "", steps=4)
    np.testing.assert_allclose(np.asarray(sched.cond_weights), [1.0, 0.3])
    assert sched.cond_bank.shape[0] == 2


def test_emphasis_batch_composition_invariant():
    """Original-mode renorm uses per-item means: an item's output does not
    depend on what else rode the encode batch (the reference's global batch
    mean does — sd_emphasis.py:40 — which made deduped batching unsafe)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    z1 = jnp.asarray(rng.randn(1, 77, 8).astype(np.float32))
    z2 = jnp.asarray(rng.randn(1, 77, 8).astype(np.float32) * 3 + 1)
    m1 = jnp.asarray(1 + rng.rand(1, 77).astype(np.float32))
    m2 = jnp.ones((1, 77), jnp.float32) * 0.5
    joint = apply_emphasis(jnp.concatenate([z1, z2]),
                           jnp.concatenate([m1, m2]), "Original")
    solo = apply_emphasis(z1, m1, "Original")
    np.testing.assert_allclose(np.asarray(joint[0]), np.asarray(solo[0]),
                               rtol=1e-6, atol=1e-6)


def test_hires_schedule_continuation():
    """New-style scheduling: with hires_steps, schedule numbers continue
    past the first pass (reference prompt_parser.py:66-83 +
    opts.use_old_scheduling)."""
    import numpy as np

    from sdwebui_tpu.text.prompt_parser import get_prompt_schedule

    # base pass 16 steps: [a:b:20] never triggers (20 > 16)
    base = get_prompt_schedule("[a:b:20]", 16)
    assert [t for _, t in base] == ["a"]
    # hires pass 8 steps, new scheduling: 20 - 16 = step 4 of the 2nd pass
    cont = get_prompt_schedule("[a:b:20]", 16, hires_steps=8)
    assert cont == [[4, "a"], [8, "b"]]
    # old scheduling: numbers stay absolute within the base pass
    old = get_prompt_schedule("[a:b:20]", 16, hires_steps=8,
                              use_old_scheduling=True)
    assert [t for _, t in old] == ["a"]

    def fake_encode(texts):
        return np.zeros((len(texts), 77, 8), np.float32)

    from sdwebui_tpu.text.conditioner import build_cond_schedule

    sched = build_cond_schedule(fake_encode, "[a:b:20]", "", 16,
                                hires_steps=8)
    assert sched.cond_idx.shape == (1, 8)
    assert list(np.asarray(sched.cond_idx[0])) == [0] * 4 + [1] * 4


def test_old_emphasis_implementation_single_window():
    """opts.use_old_emphasis_implementation (reference
    modules/sd_hijack_clip_old.py): one 75-token window, literal paren
    TOKENS act as nesting multipliers, long prompts truncate (no chunking
    or BREAK)."""
    from sdwebui_tpu.utils.options import opts

    cond = make_conditioner()
    with opts.override({"use_old_emphasis_implementation": True}):
        # parens ride as tokens: the '(' token bumps the running multiplier
        chunks, _count = cond.tokenize_line("a (cat) dog")
        assert len(chunks) == 1
        # truncation instead of chunking for long prompts
        long_line = " ".join(["word"] * 200)
        chunks_l, count_l = cond.tokenize_line(long_line)
        assert len(chunks_l) == 1 and count_l >= 75
        assert len(chunks_l[0].tokens) == 75
        # BREAK is NOT special in the old path
        chunks_b, _ = cond.tokenize_line("x BREAK y")
        assert len(chunks_b) == 1
    # new path still chunks
    chunks_new, _ = cond.tokenize_line(" ".join(["word"] * 200))
    assert len(chunks_new) > 1


def test_old_emphasis_multiplier_applied():
    """The old path's paren-token multipliers reach the chunk multipliers
    (1.1 per '(' nesting level) and emphasis='None' disables them."""
    from sdwebui_tpu.utils.options import opts

    cond = make_conditioner()
    with opts.override({"use_old_emphasis_implementation": True}):
        chunks, _ = cond.tokenize_line("a (cat)")
        mults = chunks[0].multipliers
        assert any(abs(m - 1.1) < 1e-6 for m in mults), mults
        cond.emphasis = "None"
        try:
            chunks2, _ = cond.tokenize_line("a (cat)")
            assert all(m == 1.0 for m in chunks2[0].multipliers)
        finally:
            cond.emphasis = "Original"
