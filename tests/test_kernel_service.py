"""Service-facade tests: endpoint semantics end-to-end (the reference's
HTTP surface, list-in/list-out)."""

from material_parsers_spark.kernel import service
from tests.fixture_utils import get_tokens_and_spans


def test_process_material_batch():
    out = service.process_material([
        "We synthesized underdoped LaFeBO7 single crystals.",
        "nothing here",
    ])
    assert len(out) == 2
    assert out[0][0]["formula"]["rawValue"] == "LaFeBO7"
    assert out[0][0]["doping"] == "underdoped"
    assert out[1] == []


def test_process_tagged_material_matches_reference_fixture():
    tagged = [[
        ("powderss", "B-<shape>"),
        (" ", "O"),
        ("underdoped", "B-<doping>"),
        (" ", "O"),
        ("LaFeBO", "B-<formula>"),
        ("7", "I-<formula>"),
    ]]
    out = service.process_tagged_material(tagged)
    assert out[0][0]["shape"] == "powderss"
    assert out[0][0]["doping"] == "underdoped"
    assert out[0][0]["formula"]["rawValue"] == "LaFeBO7"


def test_process_link_marks_and_links():
    text = ("The LaFe0.2 Sr 0.4 was discovered to be superconducting at 3K "
            "applying a pressure of 5Gpa.")
    tokens, spans = get_tokens_and_spans(
        text,
        [("LaFe0.2 Sr 0.4", "<material>"), ("superconducting", "<tc>"),
         ("3K", "<tcValue>"), ("5Gpa", "<pressure>")],
    )
    out = service.process_link([
        {"text": text, "tokens": tokens, "spans": spans}])
    spans_out = out[0]["spans"]
    material = next(s for s in spans_out if s["type"] == "<material>")
    tc_value = next(s for s in spans_out if s["type"] == "<tcValue>")
    assert tc_value["linkable"] is True
    assert any(l["targetText"] == "3K" for l in material["links"])
    assert any(l["targetText"] == "LaFe0.2 Sr 0.4"
               for l in tc_value["links"])
    # tcValue also linked to the pressure via the tcValue-pressure config
    assert any(l["targetText"] == "5Gpa" for l in tc_value["links"])


def test_convert_endpoints():
    assert service.convert_formula_to_composition(["CaBr2-x"]) == [
        {"composition": {"Ca": "1", "Br": "2-x"}}]
    assert service.convert_name_to_formula(["Hydrogen"])[0]["formula"] == "H"
    assert service.classify_formulas(["CsFe2As2"]) is not None
    assert service.classify_single("CuFrO2") == "Cuprate"
    assert sorted(service.classify_tags("CsFe2As2")) == [
        "Iron-pnictides", "Pnictides"]


def test_split_batch_input():
    assert service.split_batch_input("a\nb") == ["a", "b"]


def test_link_type_configs_match_reference_orientations():
    """Pin all five (source, destination) orientations against the
    reference's linker wiring (`/root/reference/material_parsers/
    service.py:18-31`). Vicinity resolution is direction-sensitive
    (1xN shortcut + matrix iteration order), so a swapped pair can
    change links on multi-entity sentences."""
    reference = {
        ("<tcValue>", "<material>"),
        ("<pressure>", "<tcValue>"),
        ("<tcValue>", "<me_method>"),
        ("<material>", "<crystal-structure>"),
        ("<material>", "<space-groups>"),
    }
    ours = {(src, dst) for src, dst, _forced in service.LINK_TYPE_CONFIGS}
    assert ours == reference
