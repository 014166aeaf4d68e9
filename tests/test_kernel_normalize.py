"""Normalization fixtures (reference tests/test_utils.py + the replacement
tables at material_parser_ml.py:12-27)."""

from material_parsers_spark.kernel.normalize import (
    extract_and_filter_variable_values,
    post_process_value,
    post_process_variable,
    replace_with_closest,
    rewrite_comparison_symbol,
)


def test_rewrite_comparison_symbol_should_not_rewrite():
    assert rewrite_comparison_symbol(">10") == ">10"


def test_rewrite_comparison_symbol_should_rewrite():
    assert rewrite_comparison_symbol("0 <") == "> 0"


def test_rewrite_comparison_symbol_should_rewrite_long():
    assert rewrite_comparison_symbol("123231212110 <") == "> 123231212110"


def test_rewrite_comparison_symbol_le_becomes_ge():
    assert rewrite_comparison_symbol("3 ≤") == ">= 3"


def test_replace_with_closest_identity_on_whitelist():
    text = "LaFeBO7(x-0.1)"
    assert replace_with_closest(text) == text


def test_value_split_on_conjunctions():
    assert extract_and_filter_variable_values("0.1, 0.2; 0.3 or 0.4 and 0.5") == [
        "0.1", "0.2", "0.3", "0.4", "0.5",
    ]


def test_value_split_drops_blanks():
    assert extract_and_filter_variable_values("0.1, , 0.2") == ["0.1", "0.2"]


def test_post_process_value_table():
    assert post_process_value("12 ≃ x") == "12 = x"
    assert post_process_value("0.1¼") == "0.1"


def test_post_process_variable_strips_combining_char():
    assert post_process_variable("x ͑") == "x"
