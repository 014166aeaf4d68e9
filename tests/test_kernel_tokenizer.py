"""Tokenizer fixtures (reference: tests/test_linking_evaluation.py:27-33,
commons/grobid_tokenizer.py behavior)."""

from material_parsers_spark.kernel.tokenizer import (
    tokenize,
    tokenize_and_filter,
    tokenize_simple,
)


def test_offsets_cover_text_exactly():
    text = "This is a text I want to tokenize."
    tokens, offsets = tokenize(text)
    assert "".join(tokens) == text
    for tok, (start, end) in zip(tokens, offsets):
        assert text[start:end] == tok


def test_unfiltered_keeps_spaces_sixteen_chunks():
    # reference fixture: tokenize_chunk -> 16 chunks, chunk[2] at offset 5
    text = "This is a text I want to tokenize."
    tokens, offsets = tokenize(text)
    assert len(tokens) == 16
    assert offsets[2][0] == 5
    assert tokens[2] == "is"


def test_filtered_drops_blanks_keeps_offsets():
    text = "This is a text I want to tokenize."
    tokens, offsets = tokenize_and_filter(text)
    assert tokens == ["This", "is", "a", "text", "I", "want", "to", "tokenize", "."]
    assert offsets[1] == (5, 7)
    assert offsets[-1] == (33, 34)


def test_letter_digit_boundary_split():
    assert tokenize_simple("LaFeBO7") == ["LaFeBO", "7"]
    # digit -> non-digit boundary also splits: "37.7" -> 37 | . | 7
    assert tokenize_simple("37.7") == ["37", ".", "7"]


def test_delimiters_are_kept_as_tokens():
    toks = tokenize_simple("a, b-c (d)")
    assert toks == ["a", ",", " ", "b", "-", "c", " ", "(", "d", ")"]


def test_unicode_minus_and_suits_are_delimiters():
    toks = tokenize_simple("x−y ♦ z")
    assert "−" in toks and "♦" in toks


def test_nbsp_is_delimiter():
    toks, offs = tokenize("a b")
    assert toks == ["a", " ", "b"]
    assert offs == [(0, 1), (1, 2), (2, 3)]
