"""BLIP captioner: parity against HF BlipForConditionalGeneration (random
weights), plus original-BLIP key translation and WordPiece round trip."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from sdwebui_tpu.models import blip  # noqa: E402


def _tiny_hf():
    from transformers import (BlipConfig, BlipForConditionalGeneration,
                              BlipTextConfig, BlipVisionConfig)

    torch.manual_seed(0)
    cfg = BlipConfig(
        vision_config=BlipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8).to_dict(),
        text_config=BlipTextConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, encoder_hidden_size=32, vocab_size=100,
            bos_token_id=2, sep_token_id=3, eos_token_id=3,
            pad_token_id=0).to_dict())
    m = BlipForConditionalGeneration(cfg).eval()
    ours_cfg = blip.BlipConfig(
        hidden_size=32, layers=2, heads=2, intermediate=64, image_size=32,
        patch_size=8, text_hidden=32, text_layers=2, text_heads=2,
        text_intermediate=64, vocab_size=100,
        bos_token_id=2, sep_token_id=3, pad_token_id=0)
    return m, ours_cfg


def test_blip_vision_and_decoder_parity():
    m, cfg = _tiny_hf()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    tree, _ = blip.convert_blip(sd)

    rng = np.random.RandomState(0)
    pixels = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        enc_ref = m.vision_model(
            torch.from_numpy(pixels).permute(0, 3, 1, 2)).last_hidden_state
    enc = blip.vision_apply(tree, cfg, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(enc), enc_ref.numpy(),
                               rtol=2e-4, atol=2e-5)

    ids = np.array([[2, 5, 9, 7], [2, 11, 3, 0]], np.int32)
    attn = np.array([[1, 1, 1, 1], [1, 1, 1, 0]], np.int32)
    with torch.no_grad():
        ref = m.text_decoder(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(attn.astype(np.int64)),
            encoder_hidden_states=enc_ref).logits.numpy()
    got = np.asarray(blip.decoder_logits(tree, cfg, jnp.asarray(ids),
                                         jnp.asarray(np.asarray(enc)),
                                         attn_mask=jnp.asarray(attn)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_blip_greedy_generation_matches_hf():
    m, cfg = _tiny_hf()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    tree, _ = blip.convert_blip(sd)

    rng = np.random.RandomState(1)
    pixels = rng.randn(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref_ids = m.generate(
            pixel_values=torch.from_numpy(pixels).permute(0, 3, 1, 2),
            do_sample=False, num_beams=1, max_new_tokens=8)[0].numpy()
    got = blip.generate(tree, cfg, jnp.asarray(pixels), [cfg.bos_token_id],
                        max_new_tokens=8)
    # HF prepends nothing else; arrays must match token-for-token
    np.testing.assert_array_equal(got[: len(ref_ids)], ref_ids)


def test_original_layout_translation():
    m, cfg = _tiny_hf()
    sd = {}
    for k, v in m.state_dict().items():
        arr = v.detach().numpy()
        if k.startswith("vision_model."):
            k = (k.replace("vision_model.embeddings.class_embedding",
                           "visual_encoder.cls_token")
                 .replace("vision_model.embeddings.position_embedding",
                          "visual_encoder.pos_embed")
                 .replace("vision_model.embeddings.patch_embedding.",
                          "visual_encoder.patch_embed.proj.")
                 .replace("vision_model.post_layernorm.",
                          "visual_encoder.norm.")
                 .replace("vision_model.encoder.layers.",
                          "visual_encoder.blocks.")
                 .replace(".layer_norm1.", ".norm1.")
                 .replace(".layer_norm2.", ".norm2.")
                 .replace(".self_attn.qkv.", ".attn.qkv.")
                 .replace(".self_attn.projection.", ".attn.proj."))
        sd[k] = arr
    tree, derived = blip.convert_blip(sd)
    pixels = np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32)
    enc = blip.vision_apply(tree, cfg, jnp.asarray(pixels))
    with torch.no_grad():
        ref = m.vision_model(
            torch.from_numpy(pixels).permute(0, 3, 1, 2)).last_hidden_state
    np.testing.assert_allclose(np.asarray(enc), ref.numpy(),
                               rtol=2e-4, atol=2e-5)
    assert derived.image_size == 32 and derived.vocab_size == 100


def test_wordpiece(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "picture", "of",
             "cat", "##s", "dog"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    tok = blip.WordPiece(str(vp))
    ids = tok.encode("a picture of cats")
    assert ids == [4, 5, 6, 7, 8]
    assert tok.decode(ids + [3]) == "a picture of cats"


def test_blip_captioner_end_to_end(tmp_path):
    from PIL import Image

    from sdwebui_tpu.loader.safetensors_io import write_safetensors
    from sdwebui_tpu.postprocessing.interrogate import BlipCaptioner

    m, cfg = _tiny_hf()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    write_safetensors(str(tmp_path / "blip.safetensors"), sd)
    # tiny vocab: specials + a few pieces (ids must stay within vocab_size)
    vocab = ["[PAD]", "[UNK]", "[DEC]", "[SEP]"] + \
        [f"tok{i}" for i in range(96)]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))

    cap = BlipCaptioner(str(tmp_path / "blip.safetensors"),
                        str(tmp_path / "vocab.txt"))
    # the converted config's special ids default to BERT's — override to the
    # tiny model's
    import dataclasses
    cap.cfg = dataclasses.replace(cap.cfg, bos_token_id=2, sep_token_id=3)
    img = Image.fromarray((np.random.RandomState(3).rand(40, 40, 3) * 255)
                          .astype(np.uint8))
    out = cap.caption(img, max_new_tokens=6)
    assert isinstance(out, str)


def test_blip_beam_search_and_min_length():
    """Beam decode (interrogate_clip_num_beams) and min_new_tokens
    ([SEP] suppression, reference min_length) behaviors."""
    m, cfg = _tiny_hf()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    tree, _ = blip.convert_blip(sd)

    rng = np.random.RandomState(2)
    pixels = rng.randn(1, 32, 32, 3).astype(np.float32)

    greedy = blip.generate(tree, cfg, jnp.asarray(pixels), [cfg.bos_token_id],
                           max_new_tokens=6)
    beam1 = blip.generate(tree, cfg, jnp.asarray(pixels), [cfg.bos_token_id],
                          max_new_tokens=6, num_beams=2)
    # a valid sequence: bounded length, ints from the vocab
    assert 2 <= len(beam1) <= 7
    assert all(0 <= t < 100 for t in beam1)
    assert len(greedy) <= 7

    # min_new_tokens forbids SEP before the floor: generated part (after
    # bos) must be at least 4 tokens with none of the first 4 being SEP
    forced = blip.generate(tree, cfg, jnp.asarray(pixels), [cfg.bos_token_id],
                           max_new_tokens=8, min_new_tokens=4)
    gen = list(forced[1:])
    assert len(gen) >= 4
    assert cfg.sep_token_id not in gen[:3]

    forced_beam = blip.generate(tree, cfg, jnp.asarray(pixels),
                                [cfg.bos_token_id], max_new_tokens=8,
                                min_new_tokens=4, num_beams=3)
    gen_b = list(forced_beam[1:])
    assert len(gen_b) >= 4
    assert cfg.sep_token_id not in gen_b[:3]
