"""Variable substitution / formula expansion fixtures, ported verbatim from
reference tests/test_ml_material_parser.py:56-218 (inputs and expected
outputs only; implementation is ours)."""

import pytest

from material_parsers_spark.kernel.variables import (
    expand_formula,
    generate_permutations,
    replace_variable,
    resolve_variables,
)


@pytest.mark.parametrize(
    "formula,var,value,expected",
    [
        ("Fe1-xCuxO2", "x", "0.8", "Fe0.2Cu0.8O2"),
        ("Fe-xCu1-xO2", "x", "0.8", "Fe-0.8Cu0.2O2"),
        ("FexCuxO2", "x", "0.8", "Fe0.8Cu0.8O2"),
        ("LnFeAs(O1−x Fx)", "Ln", "Pr", "PrFeAs(O1−x Fx)"),
        ("1-x Ru x", "x", "0.2", "0.8 Ru 0.2"),
        ("RE", "RE", "Sc", "Sc"),
    ],
)
def test_replace_variable(formula, var, value, expected):
    assert replace_variable(formula, var, value) == expected


def test_expand_formula_no_expansion():
    assert expand_formula("(TMTTF) 2 PF 6") == ["(TMTTF) 2 PF 6"]


@pytest.mark.parametrize(
    "formula,expected",
    [
        ("(Sr, Na)Fe 2 As 2", ["Sr 1-x Na x Fe 2 As 2"]),
        ("(Sr,K)Fe2As2", ["Sr 1-x K x Fe2As2"]),
        ("(Sr , K ) Fe2As2", ["Sr 1-x K x Fe2As2"]),
        ("(Sr, La) Fe 2 O 7", ["Sr 1-x La x Fe 2 O 7"]),
        ("(Sr, La, Cu, K) Fe 2 O 7", ["Sr 1-x-y-z La x Cu y K z Fe 2 O 7"]),
        ("(Sr,K)-2222", ["Sr-2222", "K-2222"]),
    ],
)
def test_expand_formula(formula, expected):
    assert expand_formula(formula) == expected


def test_resolve_variables_single():
    material = {
        "formula": {"rawValue": "Fe1-xCuxO2"},
        "variables": {"x": ["0.1", "0.2", "0.3"]},
    }
    assert resolve_variables(material) == [
        "Fe0.9Cu0.1O2",
        "Fe0.8Cu0.2O2",
        "Fe0.7Cu0.3O2",
    ]


def test_resolve_variables_two_vars_product():
    material = {
        "formula": {"rawValue": "Fe1-xCuyO2"},
        "variables": {"x": ["0.1", "0.2", "0.3"], "y": ["-1", "-0.2", "0.3", "0.5"]},
    }
    out = resolve_variables(material)
    assert len(out) == 12
    for expected in [
        "Fe0.9Cu-1O2", "Fe0.9Cu-0.2O2", "Fe0.9Cu0.3O2", "Fe0.9Cu0.5O2",
        "Fe0.8Cu-1O2", "Fe0.8Cu-0.2O2", "Fe0.8Cu0.3O2", "Fe0.8Cu0.5O2",
        "Fe0.7Cu-1O2", "Fe0.7Cu-0.2O2", "Fe0.7Cu0.3O2", "Fe0.7Cu0.5O2",
    ]:
        assert expected in out


def test_resolve_variables_three_vars():
    material = {
        "formula": {"rawValue": "Li x (NH 3 ) y Fe 2 (Te z Se 1−z ) 2"},
        "variables": {"x": ["0.1"], "y": ["0.1"], "z": ["0.1"]},
    }
    assert resolve_variables(material) == [
        "Li 0.1 (NH 3 ) 0.1 Fe 2 (Te 0.1 Se 0.9 ) 2"
    ]


def test_resolve_variables_interval_values():
    material = {
        "formula": {"rawValue": "Li x (NH 3 ) 1-x Fe 2 (Te x Se 1−x ) 2"},
        "variables": {"x": ["< 0.1", "> 0.01"]},
    }
    assert resolve_variables(material) == [
        "Li 0.1 (NH 3 ) 0.9 Fe 2 (Te 0.1 Se 0.9 ) 2",
        "Li 0.01 (NH 3 ) 0.99 Fe 2 (Te 0.01 Se 0.99 ) 2",
    ]


def test_generate_permutations_single_combo():
    formula = "Li x (NH 3 ) y Fe 2 (Te z Se 1−z ) 2"
    variables = {"x": ["0.1"], "y": ["0.1"], "z": ["0.1"]}
    result = []
    generate_permutations(variables, list(variables.keys()), result, (0, 0), formula)
    assert result == ["Li 0.1 (NH 3 ) 0.1 Fe 2 (Te 0.1 Se 0.9 ) 2"]


def test_generate_permutations_last_var_fastest():
    formula = "Li x (NH 3 ) y Fe 2 (Te z Se 1−z ) 2"
    variables = {"x": ["0.1", "0.2"], "y": ["0.1", "0.2"], "z": ["0.1"]}
    result = []
    generate_permutations(variables, list(variables.keys()), result, (0, 0), formula)
    assert result == [
        "Li 0.1 (NH 3 ) 0.1 Fe 2 (Te 0.1 Se 0.9 ) 2",
        "Li 0.1 (NH 3 ) 0.2 Fe 2 (Te 0.1 Se 0.9 ) 2",
        "Li 0.2 (NH 3 ) 0.1 Fe 2 (Te 0.1 Se 0.9 ) 2",
        "Li 0.2 (NH 3 ) 0.2 Fe 2 (Te 0.1 Se 0.9 ) 2",
    ]
