"""Pure-python SentencePiece reader: proto wire parsing, unigram Viterbi
(verified against the `tokenizers` Unigram implementation), byte fallback,
decode round-trip, and the T5/XLM-R wrapper conventions."""

import struct

import numpy as np
import pytest

from sdwebui_tpu.text import sentencepiece as spm


# ---- hand-rolled protobuf writers (test-side only) ------------------------

def _varint(x: int) -> bytes:
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _piece(text: str, score: float, typ: int = spm.NORMAL) -> bytes:
    body = _field(1, 2, _varint(len(text.encode())) + text.encode())
    body += _field(2, 5, struct.pack("<f", score))
    if typ != spm.NORMAL:
        body += _field(3, 0, _varint(typ))
    return _field(1, 2, _varint(len(body)) + body)


def _model_proto(pieces, unk=0, bos=1, eos=2, pad=-1, dummy_prefix=True):
    data = b"".join(_piece(*p) for p in pieces)
    trainer = _field(40, 0, _varint(unk)) + _field(41, 0, _varint(bos)) \
        + _field(42, 0, _varint(eos)) \
        + _field(43, 0, _varint(pad if pad >= 0 else pad + (1 << 64)))
    data += _field(2, 2, _varint(len(trainer)) + trainer)
    norm = _field(3, 0, _varint(1 if dummy_prefix else 0))
    data += _field(3, 2, _varint(len(norm)) + norm)
    return data


VOCAB = [("<unk>", 0.0, spm.UNKNOWN), ("<s>", 0.0, spm.CONTROL),
         ("</s>", 0.0, spm.CONTROL),
         ("▁", -4.0, spm.NORMAL), ("▁the", -1.0, spm.NORMAL),
         ("▁cat", -2.0, spm.NORMAL), ("▁ca", -3.0, spm.NORMAL),
         ("t", -1.5, spm.NORMAL), ("he", -2.5, spm.NORMAL),
         ("c", -3.5, spm.NORMAL), ("a", -3.0, spm.NORMAL),
         ("▁on", -1.2, spm.NORMAL)]


def _write_model(tmp_path):
    p = tmp_path / "test.model"
    p.write_bytes(_model_proto(VOCAB))
    return str(p)


def test_proto_roundtrip(tmp_path):
    tok = spm.SentencePieceUnigram.from_file(_write_model(tmp_path))
    assert tok.pieces[4][0] == "▁the"
    assert tok.unk_id == 0 and tok.bos_id == 1 and tok.eos_id == 2
    assert tok.pad_id == -1
    assert tok.add_dummy_prefix


def test_viterbi_matches_tokenizers_unigram(tmp_path):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

    vocab = [(t, s) for t, s, _ in VOCAB]
    oracle = Tokenizer(models.Unigram(vocab, unk_id=0, byte_fallback=False))
    oracle.normalizer = normalizers.NFKC()
    oracle.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always")

    tok = spm.SentencePieceUnigram.from_file(_write_model(tmp_path))
    for text in ("the cat", "cat on the cat", "the tttt cat", "on a t"):
        got = tok.encode(text)
        want = oracle.encode(text).ids
        assert got == list(want), (text, got, list(want))


def test_unknown_and_decode(tmp_path):
    tok = spm.SentencePieceUnigram.from_file(_write_model(tmp_path))
    ids = tok.encode("the zcat")
    assert tok.unk_id in ids
    assert tok.decode(tok.encode("the cat on the cat")) == "the cat on the cat"
    # bos/eos flags
    full = tok.encode("the cat", add_bos=True, add_eos=True)
    assert full[0] == tok.bos_id and full[-1] == tok.eos_id


def test_byte_fallback(tmp_path):
    pieces = list(VOCAB) + [(f"<0x{b:02X}>", -6.0, spm.BYTE)
                            for b in range(256)]
    p = tmp_path / "bf.model"
    p.write_bytes(_model_proto(pieces))
    tok = spm.SentencePieceUnigram.from_file(str(p))
    ids = tok.encode("the Ω cat")
    assert tok.unk_id not in ids
    assert tok.decode(ids) == "the Ω cat"


def test_t5_and_xlmr_wrappers(tmp_path):
    path = _write_model(tmp_path)
    t5 = spm.make_t5_tokenizer(path, max_length=12)
    row = t5("the cat")
    assert len(row) == 12
    assert 2 in row                      # </s> appended (eos id 2)
    # padding with pad id (pad=-1 → 0 fallback)
    assert row[-1] == 0

    xl = spm.make_xlmr_tokenizer(path)
    raw = spm.SentencePieceUnigram.from_file(path).encode("the cat")
    assert xl("the cat") == [i + 1 for i in raw]    # fairseq shift
