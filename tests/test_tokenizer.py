"""Tokenizer goldens — values from the reference's only unit test
(reference: src/tokenizer.rs:205-222) plus round-trip properties."""

import pytest

from sdtpu.tokenizer import SimpleTokenizer, SOT_ID, EOT_ID


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer()


def test_vocab_size(tok):
    assert tok.n_vocab == 49408
    assert tok.encoder["<|startoftext|>"] == SOT_ID
    assert tok.encoder["<|endoftext|>"] == EOT_ID


def test_golden_encode_decode(tok):
    # Golden values from src/tokenizer.rs:213-215
    text = "Hello world! <|startoftext|>asdf<|startoftext|>"
    target_encode = [3306, 1002, 256, 49406, 587, 10468, 49406]
    target_decode = "hello world ! <|startoftext|>asdf <|startoftext|>"

    encoded = tok.encode(text)
    assert encoded == target_encode
    assert tok.decode(encoded) == target_decode


def test_prompt_wrapping(tok):
    # Pipeline wraps prompts in SOT/EOT (stablediffusion/mod.rs:200).
    # NB: faithful reference quirk — with a prompt ending in '.', the
    # leftmost-first regex glues ".<|" into one punctuation pre-token, so
    # <|endoftext|> is NOT encoded as the special id (same in Rust's regex
    # crate, tokenizer.rs:105).
    ids = tok.encode_prompt("An ancient mossy stone.")
    assert ids == [49406, 550, 5810, 617, 8661, 2441, 13, 27, 347, 40786, 4160, 91, 285]
    assert ids[0] == SOT_ID
    assert len(ids) < 77

    empty = tok.encode_prompt("")
    assert empty == [SOT_ID, EOT_ID]


def test_whitespace_and_case(tok):
    assert tok.encode("  A   DOG  ") == tok.encode("a dog")


def test_roundtrip(tok):
    for text in ["a photograph of an astronaut riding a horse",
                 "sphinx of black quartz judge my vow"]:
        ids = tok.encode(text)
        assert all(0 <= i < 49408 for i in ids)
        assert tok.decode(ids).strip() == text.lower()
    # digits pre-tokenize one at a time (\p{N}, tokenizer.rs:105)
    assert tok.decode(tok.encode("42")).strip() == "4 2"
