"""BIO clustering fixtures, ported from reference
tests/test_ml_material_parser.py:221-306."""

from material_parsers_spark.kernel.labels import bio_repair, cluster_by_label, extract_label


def test_cluster_counts_single_example():
    results = [[
        ("j", "B-<formula>"),
        ("9", "I-<formula>"),
        ("f", "I-<formula>"),
        ("9", "B-<formula>"),
        ("j", "I-<formula>"),
        ("209", "I-<formula>"),
        (" ", "O"),
        ("underdoped", "O"),
        (" ", "O"),
        ("LaFeBO", "B-<formula>"),
        ("7", "I-<formula>"),
    ]]
    clusters = cluster_by_label(results)
    assert len(clusters) == 1
    assert len(clusters[0]) == 3
    assert clusters[0][0] == {"text": "j9f", "class": "formula"}
    assert clusters[0][2] == {"text": "LaFeBO7", "class": "formula"}


def test_cluster_two_examples():
    results = [
        [
            ("underdoped", "B-<doping>"),
            (" ", "O"),
            ("LaFeBO", "B-<formula>"),
            ("7", "I-<formula>"),
            (" ", "O"),
            ("single", "B-<shape>"),
            ("crystal", "I-<shape>"),
        ],
        [
            ("MgB", "B-<formula>"),
            (" ", "O"),
            ("2", "I-<formula>"),
        ],
    ]
    clusters = cluster_by_label(results)
    assert len(clusters) == 2
    assert len(clusters[0]) == 3
    assert len(clusters[1]) == 1
    # O-labeled whitespace is skipped but does not break the cluster
    assert clusters[1][0] == {"text": "MgB2", "class": "formula"}


def test_cluster_whitespace_inside_entity():
    results = [
        [
            ("under", "B-<doping>"),
            ("-", "I-<doping>"),
            ("doped", "I-<doping>"),
            (" ", "I-<doping>"),
            ("La", "B-<formula>"),
            (" ", "I-<formula>"),
            ("x", "I-<formula>"),
            (" ", "I-<formula>"),
            ("Fe", "I-<formula>"),
            (" ", "I-<formula>"),
            ("8", "I-<formula>"),
            (" ", "I-<formula>"),
            ("O", "I-<formula>"),
            ("7", "I-<formula>"),
            (" ", "I-<formula>"),
            ("single", "B-<shape>"),
            (" ", "I-<shape>"),
            ("crystals", "I-<shape>"),
        ],
        [("MgB", "B-<formula>"), ("2", "I-<formula>")],
        [("Oxygen", "B-<formula>")],
        [("Hydrogen", "B-<name>")],
    ]
    clusters = cluster_by_label(results)
    assert [len(c) for c in clusters] == [3, 1, 1, 1]
    assert clusters[0][1]["text"] == "La x Fe 8 O7"
    assert clusters[3][0] == {"text": "Hydrogen", "class": "name"}


def test_extract_label():
    assert extract_label("B-<formula>") == "formula"
    assert extract_label(("tok", "I-<shape>")) == "shape"
    assert extract_label("O") == "O"


def test_bio_repair_relabels_on_label_change():
    example = [["a", "B-<doping>"], ["b", "I-<formula>"], ["c", "I-<formula>"]]
    repaired = bio_repair(example)
    assert repaired[1][1] == "B-<formula>"
    assert repaired[2][1] == "I-<formula>"


def test_bio_repair_keeps_sequence_initial_i():
    # reference quirk: index-0 `I-` stays (str.replace result discarded there)
    example = [["a", "I-<formula>"], ["b", "I-<formula>"]]
    repaired = bio_repair(example)
    assert repaired[0][1] == "I-<formula>"
    assert repaired[1][1] == "I-<formula>"
