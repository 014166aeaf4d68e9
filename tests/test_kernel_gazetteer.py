"""Gazetteer matcher and pattern-generation tests (D1-D3; EntityRuler
semantics: case-insensitive match, original-case output, longest match)."""

from material_parsers_spark.kernel.gazetteer import (
    TokenTrieMatcher,
    crystal_structure_patterns,
    match_structures,
    space_group_patterns,
)


def _matcher():
    patterns = (
        crystal_structure_patterns(["Al B2", "Cu O2"])
        + space_group_patterns([
            {"name": "P6/mmm", "type": "hexagonal"},
            {"name": "Fm_3m", "type": "cubic"},
        ])
    )
    return TokenTrieMatcher(patterns)


def test_case_insensitive_original_case_output():
    matcher = _matcher()
    out = matcher.match("The alb2-type structure was confirmed.")
    assert len(out) == 1
    assert out[0]["text"] == "alb2-type"
    assert out[0]["label"] == "<crystal-structure>"


def test_spacing_variants_match():
    matcher = _matcher()
    for variant in ["AlB2-type", "Al B2 - type", "Al B 2 -type", "B2Al-type"]:
        out = matcher.match(f"known {variant} lattice")
        assert len(out) == 1, variant


def test_char_offsets_cover_surface():
    matcher = _matcher()
    text = "We found P6/mmm symmetry."
    out = matcher.match(text)
    assert len(out) == 1
    ent = out[0]
    assert text[ent["start"]:ent["end"]] == ent["text"] == "P6/mmm"
    assert ent["label"] == "<space-groups>"
    assert ent["type"] == "hexagonal"


def test_space_group_spacing_variants():
    matcher = _matcher()
    assert matcher.match("Fm 3m phase")[0]["text"] == "Fm 3m"
    assert matcher.match("Fm3m phase")[0]["text"] == "Fm3m"


def test_lattice_type_labels_emitted():
    patterns = space_group_patterns([{"name": "P6/mmm", "type": "hexagonal"}])
    labels = {p["label"] for p in patterns}
    assert labels == {"space-groups", "unit-cell-type"}
    matcher = TokenTrieMatcher(patterns)
    out = matcher.match("a hexagonal cell")
    assert out[0]["label"] == "<unit-cell-type>"


def test_longest_match_wins():
    matcher = TokenTrieMatcher([
        {"pattern": "Al B2", "label": "short"},
        {"pattern": "Al B2 structure", "label": "long"},
    ])
    out = matcher.match("the Al B2 structure here")
    assert len(out) == 1
    assert out[0]["label"] == "<long>"


def test_non_overlapping_left_to_right():
    matcher = _matcher()
    out = matcher.match("AlB2-type then P6/mmm and cubic")
    assert [e["label"] for e in out] == [
        "<crystal-structure>", "<space-groups>", "<unit-cell-type>",
    ]


def test_match_structures_batch():
    matcher = _matcher()
    out = match_structures(matcher, ["AlB2-type", "no entities here"])
    assert len(out) == 2
    assert len(out[0]) == 1 and out[1] == []


def test_bracketed_names_skipped():
    assert crystal_structure_patterns(["(weird) name", "Al B2"])
    assert not crystal_structure_patterns(["(weird) name"])


def test_full_dictionary_trie_matches_production_patterns():
    """D1 at production size: the full 5,925-pattern dictionary loaded and
    matched against text exercising multi-token patterns, case
    insensitivity, longest-match, and both label families."""
    from material_parsers_spark.kernel.gazetteer import TokenTrieMatcher
    from material_parsers_spark.pipeline.extraction import load_full_patterns

    matcher = TokenTrieMatcher(load_full_patterns())
    text = ("The AlB2-type structure with P6/mmm symmetry was confirmed, "
            "unlike the NaCl - type phase (space group fm-3m, cubic) "
            "or the Mg Cu2-type Laves phase.")
    ents = matcher.match(text)
    got = {(e["text"], e["label"]) for e in ents}
    assert ("AlB2-type", "<crystal-structure>") in got
    assert ("P6/mmm", "<space-groups>") in got
    assert ("NaCl - type", "<crystal-structure>") in got
    assert ("cubic", "<unit-cell-type>") in got
    assert ("Mg Cu2-type", "<crystal-structure>") in got
