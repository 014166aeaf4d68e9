"""Formula->composition / name->formula fixtures, from the reference's
README examples (README.md:25-94) and service semantics
(material_parser_formulas.py:37-116)."""

import pytest

from material_parsers_spark.kernel.formulas import (
    formula_to_composition,
    name_to_formula,
    parse_composition,
)


class TestParseComposition:
    def test_simple(self):
        assert parse_composition("MgB2") == {"Mg": "1", "B": "2"}

    def test_symbolic_amount(self):
        # README: CaBr2-x -> {Ca: "1", Br: "2-x"}
        assert parse_composition("CaBr2-x") == {"Ca": "1", "Br": "2-x"}

    def test_variables_kept_symbolic(self):
        # README: La x Fe 1-x O7 -> {La: x, Fe: 1-x, O: 7}
        assert parse_composition("LaxFe1-xO7") == {
            "La": "x", "Fe": "1-x", "O": "7",
        }

    def test_group_multiplier_distribution(self):
        # README: (Mo 0.96 Zr 0.04 ) 0.85 B x
        assert parse_composition("(Mo0.96Zr0.04)0.85Bx") == {
            "Mo": "0.816", "Zr": "0.034", "B": "x",
        }

    def test_unicode_minus_amount(self):
        assert parse_composition("O1−xFx") == {"O": "1−x", "F": "x"}

    def test_duplicate_element_amounts_add(self):
        assert parse_composition("FeOFe") == {"Fe": "2", "O": "1"}

    def test_unknown_symbol_raises(self):
        with pytest.raises(ValueError):
            parse_composition("Qq2")

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            parse_composition("")

    def test_unbalanced_paren_raises(self):
        with pytest.raises(ValueError):
            parse_composition("(MgB2")


class TestFormulaToComposition:
    def test_spaces_removed(self):
        out = formula_to_composition("La Fe B 7.9")
        assert out["composition"] == {"La": "1", "Fe": "1", "B": "7.9"}

    def test_readme_group_example(self):
        out = formula_to_composition("(Mo 0.96 Zr 0.04 ) 0.85 B x ")
        assert out["composition"] == {"Mo": "0.816", "Zr": "0.034", "B": "x"}

    def test_unparseable_degrades_to_empty(self):
        assert formula_to_composition("???") == {}

    def test_retry_after_char_normalization(self):
        # U+2212 minus is rewritten to '-' on the retry path
        out = formula_to_composition("CaBr2−x")
        assert out["composition"]["Br"] in ("2-x", "2−x")


class TestNameToFormula:
    def test_hydrogen(self):
        # README: {"composition": {"H": "1"}, "name": "Hydrogen", "formula": "H"}
        out = name_to_formula("Hydrogen")
        assert out == {
            "composition": {"H": "1"},
            "name": "Hydrogen",
            "formula": "H",
        }

    def test_lead(self):
        assert name_to_formula("Lead")["formula"] == "Pb"

    def test_unknown_name_returns_empty(self):
        assert name_to_formula("Unobtanium") == {}

    def test_formula_shaped_input_falls_through(self):
        out = name_to_formula("MgB2")
        assert out["composition"] == {"Mg": "1", "B": "2"}
        assert out["formula"] == "MgB2"


class TestMultiPartFormulas:
    """Third retry rung: hydrates, mixtures, phase prefixes. Multi-part
    input returns the FIRST part's composition un-multiplied, mirroring
    the reference's composition[0].elements selection
    (material_parser_formulas.py:72-73)."""

    def test_hydrate_dot(self):
        out = formula_to_composition("CuSO4·5H2O")
        assert out["composition"] == {"Cu": "1", "S": "1", "O": "4"}

    def test_hydrate_star_and_spaces(self):
        out = formula_to_composition("CaCl2 * 2H2O")
        assert out["composition"] == {"Ca": "1", "Cl": "2"}

    def test_coefficient_mixture(self):
        out = formula_to_composition("0.9MgB2-0.1Ti")
        assert out["composition"] == {"Mg": "1", "B": "2"}

    def test_expression_coefficient_mixture(self):
        out = formula_to_composition("(1-x)BiFeO3-xBaTiO3")
        assert out["composition"] == {"Bi": "1", "Fe": "1", "O": "3"}

    def test_plus_mixture(self):
        out = formula_to_composition("MgB2+SiC")
        assert out["composition"] == {"Mg": "1", "B": "2"}

    def test_phase_prefix_greek(self):
        out = formula_to_composition("α-Fe2O3")
        assert out["composition"] == {"Fe": "2", "O": "3"}

    def test_phase_prefix_latin(self):
        out = formula_to_composition("h-BN")
        assert out["composition"] == {"B": "1", "N": "1"}

    def test_single_part_amount_expressions_never_split(self):
        # "2-x" is an amount, not a mixture separator
        assert formula_to_composition("CaBr2-x")["composition"] == \
            {"Ca": "1", "Br": "2-x"}
        assert formula_to_composition("LaO1-xFx")["composition"] == \
            {"La": "1", "O": "1-x", "F": "x"}

    def test_junk_still_degrades_to_empty(self):
        assert formula_to_composition("α-???·junk") == {}

    def test_paren_group_component_mixture(self):
        # component-first parenthesized group after the separator
        out = formula_to_composition("BiFeO3-(K0.5Na0.5)NbO3")
        assert out["composition"] == {"Bi": "1", "Fe": "1", "O": "3"}
