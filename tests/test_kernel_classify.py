"""Classification fixtures, ported from reference
tests/test_material-to-class.py and tests/test_material-to-tags.py."""

from material_parsers_spark.kernel.classify import (
    classify_formula,
    decompose_formula,
    get_class,
    get_classes,
)


class TestMaterial2Class:
    def test_other_oxides(self):
        assert get_class("LaFeO2") == "Other oxides"

    def test_cuprate(self):
        assert get_class("CuFrO2") == "Cuprate"

    def test_carbides(self):
        assert get_class("CO2") == "Carbides"

    def test_chalcogenides(self):
        assert get_class("Te2U1") == "Chalcogenides"

    def test_default_alloy(self):
        assert get_class("SrAu0.2") == "Alloy"


class TestMaterial2Tags:
    def test_oxide(self):
        taxonomy = get_classes("LaFeO2")
        assert list(taxonomy.keys()) == ["Oxides"]
        assert taxonomy["Oxides"] == ["Transition Metal-Oxides"]

    def test_alloys(self):
        taxonomy = get_classes("SrFeCu0.2")
        assert list(taxonomy.keys()) == ["Alloys"]
        assert taxonomy["Alloys"] == []

    def test_mixed_0(self):
        taxonomy = get_classes("CuFrO2")
        assert sorted(taxonomy.keys()) == ["Cuprates", "Oxides"]
        assert len(taxonomy["Oxides"]) == 1
        assert taxonomy["Cuprates"] == []

    def test_mixed_1(self):
        taxonomy = get_classes("CuFrO2C")
        assert sorted(taxonomy.keys()) == ["Carbides", "Cuprates", "Oxides"]
        assert len(taxonomy["Carbides"]) == 1  # Organics (O + C)
        assert taxonomy["Cuprates"] == []
        assert len(taxonomy["Oxides"]) == 1

    def test_mixed_2(self):
        taxonomy = get_classes("CuFrO2H")
        assert sorted(taxonomy.keys()) == ["Cuprates", "Hydrides", "Oxides"]
        assert taxonomy["Hydrides"] == []
        assert len(taxonomy["Oxides"]) == 1

    def test_mixed_3(self):
        taxonomy = get_classes("CuFrO2CH")
        assert sorted(taxonomy.keys()) == [
            "Carbides", "Cuprates", "Hydrides", "Oxides",
        ]
        assert len(taxonomy["Carbides"]) == 1
        assert taxonomy["Hydrides"] == []

    def test_iron_pnictide(self):
        taxonomy = get_classes("CsFe2As2")
        assert sorted(taxonomy.keys()) == ["Iron-pnictides", "Pnictides"]
        assert taxonomy["Iron-pnictides"] == []
        assert taxonomy["Pnictides"] == []

    def test_boron_does_not_exclude_alloys(self):
        # preserved reference quirk: " B" (leading space) in not_compounds
        taxonomy = get_classes("MgB2")
        assert "Alloys" in taxonomy
        assert "Borides" in taxonomy


class TestDecompose:
    def test_two_uppercase_is_two_elements(self):
        assert decompose_formula("CO2") == ["C", "O"]

    def test_two_letter_symbols(self):
        assert decompose_formula("CuFrO2") == ["Cu", "Fr", "O"]
        assert decompose_formula("CsFe2As2") == ["Cs", "Fe", "As"]

    def test_fractional_amounts(self):
        assert decompose_formula("SrFeCu0.2") == ["Sr", "Fe", "Cu"]

    def test_variable_suffix_stripped(self):
        assert decompose_formula("CaBr2-x") == ["Ca", "Br"]

    def test_dummy_symbols_kept_like_pymatgen(self):
        # T and M are legal dummy symbols (no element prefix), F/P real
        assert decompose_formula("(TMTTF) 2 PF 6") == ["T", "M", "F", "P"]

    def test_unparseable_yields_empty(self):
        # README /classify/formula example: trailing " B x" kills the parse
        # and the material classifies as ['Alloys'] via not_compounds
        assert decompose_formula("(Mo 0.96 Zr 0.04 ) 0.85 B x ") == []
        assert classify_formula("(Mo 0.96 Zr 0.04 ) 0.85 B x ") == ["Alloys"]


def test_classify_formula_projection():
    assert sorted(classify_formula("CsFe2As2")) == ["Iron-pnictides", "Pnictides"]


def test_boron_alloy_quirk_on_mgb2():
    taxonomy = get_classes("MgB2")
    assert sorted(taxonomy.keys()) == ["Alloys", "Borides"]
