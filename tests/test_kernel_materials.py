"""Material-record state-machine fixtures, ported from reference
tests/test_ml_material_parser.py:13-53 (extract_results with injected
tagger output — the reference bypasses the DL model the same way)."""

from material_parsers_spark.kernel.materials import (
    extract_results,
    process_property,
    strip_empty,
)


def _fixture_output():
    return [
        [
            {"text": "powderss", "class": "<shape>"},
            {"text": "underdoped", "class": "<doping>"},
            {"text": "LaFeBO7", "class": "<formula>"},
        ],
        [
            {"text": "La Fe B 8-x", "class": "<formula>"},
            {"text": "x", "class": "<variable>"},
            {"text": "0.1", "class": "<value>"},
            {"text": "0.2", "class": "<value>"},
        ],
        [
            {"text": "underdoped", "class": "<doping>"},
            {"text": "single crystal", "class": "<shape>"},
            {"text": "LaFeB09", "class": "<formula>"},
            {"text": "TLL222", "class": "<name>"},
        ],
    ]


def test_extract_results_reference_fixture():
    entities = extract_results(_fixture_output())

    assert len(entities) == 3

    assert entities[0][0]["shape"] == "powderss"
    assert entities[0][0]["doping"] == "underdoped"
    assert entities[0][0]["formula"]["rawValue"] == "LaFeBO7"

    assert entities[1][0]["formula"]["rawValue"] == "La Fe B 8-x"
    assert entities[1][0]["variables"] == {"x": ["0.1", "0.2"]}
    assert len(entities[1][0]["resolvedFormulas"]) == 2
    assert entities[1][0]["resolvedFormulas"][0]["rawValue"] == "La Fe B 7.9"
    assert entities[1][0]["resolvedFormulas"][1]["rawValue"] == "La Fe B 7.8"

    assert entities[2][0]["doping"] == "underdoped"
    assert entities[2][0]["shape"] == "single crystal"
    assert entities[2][0]["formula"]["rawValue"] == "LaFeB09"
    assert entities[2][0]["name"] == "TLL222"


def test_duplicate_key_starts_new_material():
    out = extract_results([
        [
            {"text": "MgB2", "class": "<formula>"},
            {"text": "NbB2", "class": "<formula>"},
        ]
    ])
    assert len(out[0]) == 2
    assert out[0][0]["formula"]["rawValue"] == "MgB2"
    assert out[0][1]["formula"]["rawValue"] == "NbB2"


def test_prefixed_comparison_value_attaches_to_next_variable():
    out = extract_results([
        [
            {"text": "La Fe B 8-x", "class": "<formula>"},
            {"text": "5 <", "class": "<value>"},  # comparison, no variable yet
            {"text": "x", "class": "<variable>"},
            {"text": "0.1", "class": "<value>"},
        ]
    ])
    mat = out[0][0]
    assert mat["variables"]["x"][0] == "0.1"
    # rewritten comparison value "> 5" arrives as a later value
    assert "> 5" in mat["variables"]["x"]


def test_value_with_equals_sets_variable():
    out = extract_results([
        [
            {"text": "La Fe B 8-x", "class": "<formula>"},
            {"text": "x=0.3", "class": "<value>"},
            {"text": "0.1", "class": "<value>"},
        ]
    ])
    mat = out[0][0]
    assert mat["variables"] == {"x": ["0.1", "0.3"]}
    assert [f["rawValue"] for f in mat["resolvedFormulas"]] == [
        "La Fe B 7.9",
        "La Fe B 7.7",
    ]


def test_multiple_dopings_single_material_fan_out():
    materials = [{"formula": "X"}]
    out = process_property(materials, "doping", ["under", "over"])
    assert len(out) == 3  # original + one per doping
    assert out[1]["doping"] == "under"
    assert out[2]["doping"] == "over"


def test_multiple_dopings_multiple_materials_joined():
    materials = [{"formula": "X"}, {"formula": "Y"}]
    out = process_property(materials, "doping", ["under", "over"])
    assert all(m["doping"] == "under, over" for m in out)


def test_fabrications_joined_with_spaces():
    out = extract_results([
        [
            {"text": "annealed", "class": "<fabrication>"},
            {"text": "quenched", "class": "<fabrication>"},
            {"text": "MgB2", "class": "<formula>"},
        ]
    ])
    assert out[0][0]["fabrication"] == "annealed quenched"


def test_empty_example_yields_empty_dict():
    out = extract_results([[]])
    assert out == [{}]


def test_strip_empty_drops_none_and_blank():
    mats = [{"formula": {"rawValue": "X"}, "name": None, "doping": ""}]
    assert strip_empty(mats) == [{"formula": {"rawValue": "X"}}]


def test_composition_enrichment_is_injectable():
    calls = []

    def fake_compose(f):
        calls.append(f)
        return {"composition": {"Mg": "1", "B": "2"}}

    out = extract_results(
        [[{"text": "MgB2", "class": "<formula>"}]],
        formula_to_composition=fake_compose,
    )
    assert calls == ["MgB2"]
    assert out[0][0]["resolvedFormulas"][0]["formulaComposition"] == {
        "Mg": "1",
        "B": "2",
    }
