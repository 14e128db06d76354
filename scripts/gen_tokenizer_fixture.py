"""Generate the realistic CLIP-BPE tokenizer fixture (run once, offline).

The real LongCLIP vocab (49,408 entries, /root/reference/utils.py:88) is
not downloadable in this environment, so this script produces the closest
checkable stand-in: a byte-level BPE with CLIP's exact scheme (GPT-2 byte
alphabet, ``</w>`` end-of-word suffix, lowercased NFC input) *trained*
with the HF ``tokenizers`` Rust trainer on a deterministic English+unicode
corpus — real merge-table structure (multi-level merges, cross-byte
unicode merges, punctuation runs), not hand-picked pairs.

Outputs (checked in under tests/fixtures/clip_bpe/):
- vocab.json / merges.txt         — loadable by BOTH our CLIPTokenizer and
                                    transformers.CLIPTokenizer
- expected_ids.json               — transformers.CLIPTokenizer (the slow,
                                    reference Python implementation) ids
                                    for the test battery, precomputed so
                                    the parity test stands alone
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "clip_bpe",
)

# Deterministic training corpus: everyday captions (the app's domain),
# the reference repo's own filter queries, unicode words (multi-byte
# UTF-8 → cross-byte merges), punctuation runs, digits, long words.
CORPUS = (
    [
        "a red drill on a wooden table",
        "a photograph of a power drill with a red handle",
        "the quick brown fox jumps over the lazy dog",
        "wedding photography with people smiling outdoors",
        "is the image well lit and in focus",
        "does the image contain people",
        "a close-up photo of an orange drill bit",
        "cordless screwdriver with battery pack included",
        "professional studio lighting, high resolution",
        "internationalization and localization infrastructure",
        "electroencephalographically monitored measurements",
        "the worker is drilling, sanding, and painting",
        "tools: hammer, wrench, pliers & screwdrivers!",
        "prices range from $10.99 to $1,299.00 (incl. tax)",
        "café crème, naïve résumé, déjà vu, jalapeño",
        "straße münchen köln über größe",
        "smørrebrød på dansk",
        "日本語のテキスト例",
        "emoji 😀 🚀 ❤️ test strings",
        "model v2.4.0-beta+build.7 released 2025/03/28",
        "http://localhost:3000/api/search?query=red+drill&limit=10",
        "CamelCaseWords and snake_case_identifiers mixed",
        "don't can't won't it's we're they'll i'm you've she'd",
        "the picture shows a person holding a tool near a workbench",
        "search results are ranked by cosine similarity score",
        "upload an image and describe what you want to find",
        "background removal keeps the subject and drops the rest",
        "duplicate images are detected by perceptual hashing",
        "filters answer simple yes or no questions about each image",
        "a man wearing a hard hat standing on a construction site",
        "two children playing with a yellow ball in the garden",
        "the mountains were covered with snow in the early morning",
        "she carefully measured the wooden board before cutting it",
        "modern machine learning systems process millions of examples",
        "the restaurant serves breakfast, lunch, and dinner daily",
        "please remember to charge the batteries before leaving",
        "quality control requires consistent and repeatable checks",
        "photographs of products on a clean white background",
        "an orange cat sleeping on a warm windowsill in sunlight",
        "the engineer tested every component twice for reliability",
        "colorful balloons floated above the crowded market square",
        "heavy rain delayed the delivery of the new equipment",
        "the library was quiet except for the sound of turning pages",
    ]
    * 8
)


def main():
    from tokenizers import Regex, Tokenizer, models, normalizers
    from tokenizers import pre_tokenizers, trainers

    from imatch_tpu.ops.tokenizer import bytes_to_unicode

    os.makedirs(OUT, exist_ok=True)

    tok = Tokenizer(models.BPE(end_of_word_suffix="</w>"))
    tok.normalizer = normalizers.Sequence(
        [normalizers.NFC(), normalizers.Lowercase()]
    )
    # CLIP's pre-tokenization: the contraction/word/number/punct regex,
    # then the GPT-2 byte-level alphabet (no prefix space).
    tok.pre_tokenizer = pre_tokenizers.Sequence(
        [
            pre_tokenizers.Split(
                # a bare string is a LITERAL pattern — must wrap in Regex
                pattern=Regex(
                    r"""'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
                ),
                behavior="removed",
                invert=True,
            ),
            pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
        ]
    )
    trainer = trainers.BpeTrainer(
        vocab_size=512 + 1600,  # byte alphabet (x2 for </w>) + real merges
        min_frequency=1,
        end_of_word_suffix="</w>",
        initial_alphabet=sorted(bytes_to_unicode().values()),
        special_tokens=[],
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer=trainer)

    vocab = tok.get_vocab()
    # The REAL CLIP vocab's first 512 entries are every byte symbol in
    # both mid-word and </w> form — no input can ever be OOV. The trainer
    # only emits </w> forms it saw, so guarantee the rest here (ids
    # appended; merges unaffected).
    for ch in bytes_to_unicode().values():
        for t in (ch, ch + "</w>"):
            if t not in vocab:
                vocab[t] = len(vocab)
    # append the CLIP specials last (matching the real vocab layout where
    # <|startoftext|>/<|endoftext|> are the top two ids)
    for sp in ("<|startoftext|>", "<|endoftext|>"):
        if sp not in vocab:
            vocab[sp] = len(vocab)

    # merges out of the trained model: serialize and reload
    state = json.loads(tok.to_str())
    merges = state["model"]["merges"]
    merges = [m if isinstance(m, str) else " ".join(m) for m in merges]

    with open(os.path.join(OUT, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False, indent=0, sort_keys=True)
    with open(os.path.join(OUT, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(merges) + "\n")
    print(f"wrote vocab ({len(vocab)}) + merges ({len(merges)}) to {OUT}")

    # precompute reference ids with the FAST (Rust) tokenizer built on
    # the exact CLIP scheme — this is the implementation the reference
    # actually runs (CLIPProcessor -> tokenizers, utils.py:88). (The
    # transformers SLOW tokenizer is checked live in the test instead;
    # without ftfy installed it falls back to BasicTokenizer and splits
    # CJK per character, a documented slow-path divergence from the
    # fast/runtime behavior.)
    oracle = Tokenizer(
        models.BPE(
            vocab=vocab,
            merges=[tuple(m.split(" ")) for m in merges],
            end_of_word_suffix="</w>",
            fuse_unk=False,
        )
    )
    oracle.normalizer = normalizers.Sequence(
        [
            normalizers.NFC(),
            normalizers.Replace(Regex(r"\s+"), " "),
            normalizers.Lowercase(),
        ]
    )
    oracle.pre_tokenizer = tok.pre_tokenizer

    from tests.test_tokenizer_realvocab import BATTERY  # noqa: the battery lives with the test

    bos, eos = vocab["<|startoftext|>"], vocab["<|endoftext|>"]
    expected = {}
    for text in BATTERY:
        ids = oracle.encode(text.strip()).ids[:62]
        row = [bos] + ids + [eos]
        expected[text] = row + [eos] * (64 - len(row))
    with open(
        os.path.join(OUT, "expected_ids.json"), "w", encoding="utf-8"
    ) as f:
        json.dump(expected, f, ensure_ascii=False, indent=0)
    print(f"wrote expected ids for {len(expected)} battery strings")


if __name__ == "__main__":
    main()
