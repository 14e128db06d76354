"""Tokenizer parity vs transformers.CLIPTokenizer on a synthetic vocab.

The real CLIP vocab is not downloadable offline, so we construct a valid
small vocab + merges file pair, load it into HF's slow CLIPTokenizer, and
check id-for-id agreement with ops/tokenizer.py, including padding and
truncation semantics (/root/reference/utils.py:88).
"""

import json

import numpy as np
import pytest

from imatch_tpu.ops.tokenizer import CLIPTokenizer, bytes_to_unicode


def build_synthetic_vocab(tmp_path):
    b2u = bytes_to_unicode()
    vocab = {}
    for ch in b2u.values():
        vocab[ch] = len(vocab)
    for ch in b2u.values():
        vocab[ch + "</w>"] = len(vocab)
    merges = [
        ("h", "e</w>"),
        ("t", "he</w>"),
        ("l", "l"),
        ("he", "ll"),  # requires "he" mid-word
        ("h", "e"),
        ("o", "f</w>"),
        ("a", "n"),
        ("an", "d</w>"),
        ("i", "n"),
        ("in", "g</w>"),
    ]
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(vocab), encoding="utf-8")
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8",
    )
    return str(vocab_file), str(merges_file)


TEXTS = [
    "the helm of the ship",
    "Hello THE world",
    "a red drill on a wooden table",
    "drilling and sanding in the workshop",
    "punctuation, here; (with) [brackets]!?",
    "numbers 123 456",
    "  messy   whitespace\t\teverywhere  ",
    "café naïve résumé",
    "emoji \U0001f600 test",
    "",
    "word " * 400,  # forces truncation at max_length
]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vocab")
    vocab_file, merges_file = build_synthetic_vocab(tmp)
    ours = CLIPTokenizer.from_files(vocab_file, merges_file)
    transformers = pytest.importorskip("transformers")
    theirs = transformers.CLIPTokenizer(
        vocab_file, merges_file, model_max_length=64
    )
    return ours, theirs


@pytest.mark.parametrize("text", TEXTS, ids=range(len(TEXTS)))
def test_encode_matches_hf(pair, text):
    ours, theirs = pair
    ref = theirs(
        [text], padding="max_length", max_length=64, truncation=True
    )["input_ids"][0]
    got = ours.encode_batch([text], max_length=64)[0]
    assert got.tolist() == ref, (text, got.tolist(), ref)


def test_batch_shape_and_padding(pair):
    ours, _ = pair
    out = ours.encode_batch(["the", "hello hello hello"], max_length=16)
    assert out.shape == (2, 16)
    assert out.dtype == np.int32
    # eos-padded tail
    assert (out[0][-5:] == ours.eos_id).all()


def test_byte_fallback_roundtrip():
    tok = CLIPTokenizer.byte_fallback()
    text = "red drill on table"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    batch = tok.encode_batch([text], max_length=248)
    assert batch.shape == (1, 248)
    assert batch[0, 0] == tok.bos_id


def test_nfc_normalization_matches_composed():
    """Decomposed unicode (e + U+0301, macOS-style) must tokenize like
    the composed form — HF's CLIP tokenizer NFC-normalizes first."""
    import unicodedata

    from imatch_tpu.ops.tokenizer import CLIPTokenizer

    tok = CLIPTokenizer.byte_fallback()
    composed = "café résumé"
    decomposed = unicodedata.normalize("NFD", composed)
    assert composed != decomposed  # sanity: genuinely different strings
    assert tok.encode(composed) == tok.encode(decomposed)


def test_special_token_literals_map_to_ids():
    """A literal '<|endoftext|>' in user text is ONE special id (HF
    added-token behavior), not a byte-level BPE expansion."""
    tok = CLIPTokenizer.byte_fallback()
    ids = tok.encode("hello <|endoftext|> world")
    assert tok.eos_id in ids
    assert ids.count(tok.eos_id) == 1
    plain = tok.encode("hello world")
    # removing the special leaves exactly the plain encoding
    stripped = [i for i in ids if i != tok.eos_id]
    assert stripped == plain
    assert tok.encode("<|startoftext|>") == [tok.bos_id]


def test_encode_batch_pad_to_is_exact_row_width():
    tok = CLIPTokenizer.byte_fallback()
    arr = tok.encode_batch(["hi", "word " * 400], max_length=248, pad_to=64)
    assert arr.shape == (2, 64)
    assert arr[0, 0] == tok.bos_id and arr[0, -1] == tok.eos_id
    # pad_to > max_length still truncates content by max_length
    arr2 = tok.encode_batch(["word " * 400], max_length=16, pad_to=32)
    assert arr2.shape == (1, 32)
    assert (arr2[0, 15:] == tok.eos_id).all()


def test_bpe_cache_is_bounded():
    tok = CLIPTokenizer.byte_fallback()
    tok._bpe_cache_cap = 64
    for i in range(500):
        tok.encode(f"uniqueword{i}")
    assert len(tok._bpe_cache) <= 64
