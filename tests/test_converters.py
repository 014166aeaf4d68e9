"""Converter tests (S6, S12, S13)."""

import json

from material_parsers_spark.converters import (
    labelstudio_documents,
    map_sc_comics_entities,
    parse_webanno_tsv,
    sc_comics_to_tei,
    webanno_to_tei,
)
from material_parsers_spark.sinks import webanno_tsv_document
from material_parsers_spark.sources.tei import parse_tei_paragraphs


def test_sc_comics_entity_mapping_rules():
    entities = [
        {"tag": "Element", "start": 0, "end": 2, "surface": "Nb"},
        {"tag": "Main", "start": 3, "end": 8, "surface": "MgB 2"},
        {"tag": "SC", "start": 9, "end": 24, "surface": "superconducting"},
        {"tag": "Property", "start": 25, "end": 36, "surface": "resistivity"},
        {"tag": "Property", "start": 37, "end": 43, "surface": "volume"},
        {"tag": "Value", "start": 44, "end": 48, "surface": "39 K"},
        {"tag": "Value", "start": 49, "end": 54, "surface": "3 GPa"},
        {"tag": "Value", "start": 55, "end": 59, "surface": "7 cm"},
        {"tag": "Doping", "start": 60, "end": 62, "surface": "x"},
    ]
    mapped = {(e["surface"], e["label"])
              for e in map_sc_comics_entities(entities)}
    assert mapped == {
        ("Nb", "material"), ("MgB 2", "material"),
        ("superconducting", "tc"), ("resistivity", "me_method"),
        ("39 K", "tcValue"), ("3 GPa", "pressure"),
    }


def test_sc_comics_to_tei_roundtrip():
    text = "MgB 2 superconducts at 39 K."
    entities = [
        {"tag": "Main", "start": 0, "end": 5, "surface": "MgB 2"},
        {"tag": "Value", "start": 23, "end": 27, "surface": "39 K"},
    ]
    xml = sc_comics_to_tei(text, entities)
    assert '<rs type="material">MgB 2</rs>' in xml
    assert '<rs type="tcValue">39 K</rs>' in xml
    paragraphs, _, _ = parse_tei_paragraphs(xml)
    spans = [s for p in paragraphs for s in p["spans"]]
    assert {(s["type"], s["text"].rstrip()) for s in spans} == {
        ("<material>", "MgB 2"), ("<tcValue>", "39 K")}


def test_labelstudio_documents_shape():
    tasks = labelstudio_documents([{
        "text": "MgB 2 shows 39 K.",
        "spans": [{"offset_start": 0, "offset_end": 5, "text": "MgB 2",
                   "type": "<material>"}],
    }])
    assert len(tasks) == 1
    task = tasks[0]
    assert task["data"] == {"text": "MgB 2 shows 39 K."}
    result = task["predictions"][0]["result"][0]
    assert result["from_name"] == "label" and result["to_name"] == "text"
    assert result["value"] == {
        "start": 0, "end": 5, "text": "MgB 2", "labels": ["material"]}
    json.dumps(tasks)  # serializable


def test_webanno_tsv_roundtrip_to_tei():
    """S6: TEI -> WebAnno TSV (S5 sink) -> parse -> TEI again; spans and
    the link relation survive (modulo the tag-space quirk's trailing
    spaces, which TSV normalizes away)."""
    xml = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body>\n'
        '<p>The <rs type="material" xml:id="m1">MgB 2</rs> shows '
        '<rs type="tcValue" corresp="#m1" xml:id="t1">39 K</rs>.</p>\n'
        '<p>Also <rs type="material" xml:id="m2">NbB 2</rs> here.</p>\n'
        '</body></text></TEI>'
    )
    paragraphs, _, _ = parse_tei_paragraphs(xml)
    tsv = webanno_tsv_document(paragraphs)

    parsed = parse_webanno_tsv(tsv)
    assert [p["text"] for p in parsed] == [
        "The MgB 2 shows 39 K.", "Also NbB 2 here."]
    spans0 = {(s["type"], s["text"]) for s in parsed[0]["spans"]}
    assert spans0 == {("<material>", "MgB 2"), ("<tcValue>", "39 K")}
    # relation: tcValue (source) -> material (destination)
    assert parsed[0]["relations"] == [
        {"name": "tcValue-material", "source_ent": 2, "dest_ent": 1}]

    tei2 = webanno_to_tei(tsv)
    round2, _, _ = parse_tei_paragraphs(tei2)
    bodies = [p for p in round2 if p["section"] == "body"]
    assert bodies[0]["text"] == "The MgB 2 shows 39 K."
    by_type = {s["type"]: s for s in bodies[0]["spans"]}
    # the corresp pointer was rebuilt from the relation row
    assert by_type["<tcValue>"]["corresp"] == "#1"
    assert by_type["<material>"]["id"] == "1"


def test_sc_comics_corpus_distributed(tmp_path):
    from material_parsers_spark.converters import sc_comics_corpus_to_tei
    from material_parsers_spark.pipeline.session import build_session

    corpus = tmp_path / "sc"
    corpus.mkdir()
    (corpus / "doc1.txt").write_text("MgB 2 superconducts at 39 K.")
    (corpus / "doc1.ann").write_text(
        "T1\tMain 0 5\tMgB 2\nT2\tValue 23 27\t39 K\n")
    (corpus / "doc2.txt").write_text("Nothing to see here.")
    (corpus / "doc2.ann").write_text("")

    spark = build_session(app_name="sc-comics-test", master="local[4]",
                          shuffle_partitions=4)
    out = tmp_path / "tei"
    n = sc_comics_corpus_to_tei(spark, str(corpus), str(out))
    assert n == 2
    produced = (out / "doc1.tei.xml").read_text()
    assert '<rs type="material">MgB 2</rs>' in produced
    paragraphs, _, _ = parse_tei_paragraphs(produced)
    assert any(s["type"] == "<tcValue>"
               for p in paragraphs for s in p["spans"])
