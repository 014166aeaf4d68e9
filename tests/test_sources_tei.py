"""TEI reader/writer tests (S3/S4): parse semantics pinned to the
reference's `linking_evaluation.py:read_evaluation_file` and
`xml2tsv.py:processFile` behavior, plus the distributed reader."""

import pytest

from material_parsers_spark.sources.tei import (
    extract_links_same_paragraph,
    parse_tei_paragraphs,
    synthesize_tei_corpus,
    write_tei_document,
)

TEI = """<?xml version="1.0" encoding="UTF-8"?>
<TEI xmlns="http://www.tei-c.org/ns/1.0">
<teiHeader><fileDesc><titleStmt>
<title>Superconductivity of MgB2</title>
</titleStmt></fileDesc></teiHeader>
<text>
<front><abstract>
<p>We study <rs type="material" xml:id="m1">MgB 2</rs> with
<rs type="tc" xml:id="c1">T c</rs> = <rs type="tcValue" xml:id="t1"
corresp="#m1">39 K</rs> at ambient pressure.</p>
</abstract></front>
<body>
<p>The <rs type="material" xml:id="m2">NbB 2</rs> sample shows
<rs type="tcValue" xml:id="t2" corresp="#m2,#m1">9 K</rs> transitions.</p>
<ab type="figureCaption">Resistivity of
<rs type="material" xml:id="m3">MgB 2</rs> films.</ab>
</body>
</text></TEI>
"""


def test_parse_paragraph_structure_and_sections():
    paragraphs, rel_from, rel_to = parse_tei_paragraphs(TEI)
    sections = [p["section"] for p in paragraphs]
    assert sections == ["title", "abstract", "body", "figureCaption"]
    abstract = paragraphs[1]
    assert abstract["text"].startswith("We study MgB 2 with")
    types = [s["type"] for s in abstract["spans"]]
    assert types == ["<material>", "<tc>", "<tcValue>"]


def test_span_offsets_and_tokens_align_with_text():
    paragraphs, _, _ = parse_tei_paragraphs(TEI)
    for paragraph in paragraphs:
        for span in paragraph["spans"]:
            assert paragraph["text"][
                span["offset_start"]:span["offset_end"]] == span["text"]
            covered = paragraph["tokens"][
                span["token_start"]:span["token_end"]]
            assert "".join(t["text"] for t in covered) == span["text"]
        # token offsets are a running char count over the paragraph
        for token in paragraph["tokens"]:
            start = token["offset"]
            assert paragraph["text"][
                start:start + len(token["text"])] == token["text"]


def test_paragraph_local_links_and_doc_level_maps():
    paragraphs, rel_from, rel_to = parse_tei_paragraphs(TEI)
    links = extract_links_same_paragraph(paragraphs)
    # t1->m1 in the abstract; t2->m2 in the body. t2's second pointer
    # (#m1) leaves the paragraph and is dropped from paragraph-local
    # links, exactly like the reference.
    assert ("t1", "m1", "<material-tcValue>") in links
    assert ("t2", "m2", "<material-tcValue>") in links
    assert not any(l[0] == "t2" and l[1] == "m1" for l in links)
    # ... but it IS retained in the document-level pointer maps
    assert "m1" in rel_from["t2"]
    assert set(rel_to["m1"]) == {"t1", "t2"}


def test_tag_space_preprocessing_matches_reference():
    # '</rs> word' becomes ' </rs>word' before parsing — the reference
    # moves the following space INTO the entity ("move the space within
    # the tag - not sure why...", linking_evaluation.py:35-37), so span
    # text gains a trailing space. We replicate the quirk.
    xml = ('<TEI><text><body><p>The <rs type="material">MgB 2</rs> '
           'sample.</p></body></text></TEI>')
    paragraphs, _, _ = parse_tei_paragraphs(xml)
    span = paragraphs[0]["spans"][0]
    assert span["text"] == "MgB 2 "
    assert paragraphs[0]["text"] == "The MgB 2 sample."


def test_roundtrip_write_then_parse():
    source = [{
        "text": "The material CsFe2As2 superconducts at 12 K here.",
        "spans": [
            {"id": "a", "type": "<material>",
             "offset_start": 13, "offset_end": 21},
            {"id": "b", "type": "<tcValue>",
             "offset_start": 39, "offset_end": 43, "corresp": "#a"},
        ],
    }]
    xml = write_tei_document(source, title="t")
    paragraphs, _, _ = parse_tei_paragraphs(xml)
    body = [p for p in paragraphs if p["section"] == "body"][0]
    assert body["text"] == source[0]["text"]
    got = [(s["id"], s["text"], s["type"],
            s["offset_start"], s["offset_end"]) for s in body["spans"]]
    # the reference's tag-space quirk folds the following space into each
    # entity, so round-tripped spans carry a trailing space
    assert got == [("a", "CsFe2As2 ", "<material>", 13, 22),
                   ("b", "12 K ", "<tcValue>", 39, 44)]
    assert extract_links_same_paragraph([body]) == [
        ("b", "a", "<material-tcValue>")]


def test_read_tei_distributed(tmp_path):
    from tests.test_pipeline_spark import spark as _  # noqa: F401 (fixture)
    pytest.importorskip("pyspark")
    from material_parsers_spark.pipeline.session import build_session
    from material_parsers_spark.sources.tei import read_tei

    corpus = str(tmp_path / "tei")
    synthesize_tei_corpus(corpus, n_docs=6, paragraphs_per_doc=3)

    spark = build_session(app_name="tei-test", master="local[4]",
                          shuffle_partitions=4)
    df = read_tei(spark, corpus + "/*.xml").cache()
    rows = df.collect()
    # 6 docs x (1 title + 3 body paragraphs)
    assert len(rows) == 24
    body = [r for r in rows if r.section == "body"]
    assert len(body) == 18
    assert all(len(r.spans) == 2 for r in body)
    assert all(len(r.gold_links) == 1 for r in body)
    link = body[0].gold_links[0]
    assert link.link_type == "<material-tcValue>"
    # span text/offset integrity survives the Arrow round trip
    for row in body:
        for span in row.spans:
            assert row.text[span.offset_start:span.offset_end] == span.text


def test_evaluate_linking_distributed(tmp_path):
    """A2 distributed: non-trivial deterministic metrics — every 4th
    paragraph's gold link targets a decoy material, so the rule-based
    linker scores exactly 0.75 micro and macro on this corpus."""
    from material_parsers_spark.pipeline.evaluation import evaluate_linking
    from material_parsers_spark.pipeline.session import build_session
    from material_parsers_spark.sources.tei import read_tei

    corpus = str(tmp_path / "tei")
    synthesize_tei_corpus(corpus, n_docs=4, paragraphs_per_doc=4)
    spark = build_session(app_name="eval-test", master="local[4]",
                          shuffle_partitions=4)
    row = evaluate_linking(read_tei(spark, corpus + "/*.xml")).collect()[0]
    assert row.n_docs == 4
    assert row.support == 16
    assert row.micro_precision == 0.75
    assert row.micro_recall == 0.75
    assert row.macro_f1 == 0.75


def test_multi_target_corresp_resolves_all_pointers():
    """Documented divergence (SURVEY.md §7.4 item 8): the reference splits
    corresp on ',' WITHOUT stripping, so '#m2,#m1' and '#a, #b' forms drop
    every pointer after the first; we strip and resolve all of them."""
    paragraphs, rel_from, rel_to = parse_tei_paragraphs(TEI)
    body = paragraphs[2]
    # t2 -> both m2 (same paragraph) and m1 (cross-paragraph)
    assert set(rel_to.keys()) == {"m1", "m2"}
    assert rel_to["m2"] == {"t2": "<tcValue>"}
    assert rel_to["m1"] == {"t1": "<tcValue>", "t2": "<tcValue>"}
    # paragraph-local maps drop the cross-paragraph pointer only
    assert body["rel_ptrs_to"]["m1"] == {"t2": "<tcValue>"}
    assert body["rel_ptrs_from"] == {"t2": {"m2": "<material>"}}


def test_doc_level_rel_ptrs_from_guard_and_type():
    """Documented divergence (SURVEY.md §7.4 item 9): the doc-level
    inversion guards on in-corpus targets and stores the TARGET span's
    type (the reference stores the source's type, unguarded)."""
    tei = TEI.replace('corresp="#m1"', 'corresp="#m1,#ghost"')
    _, rel_from, rel_to = parse_tei_paragraphs(tei)
    # the dangling '#ghost' pointer is recorded in rel_ptrs_to but never
    # inverted into rel_ptrs_from (no KeyError, no dangling entry)
    assert "ghost" in rel_to
    assert all("ghost" not in targets for targets in rel_from.values())
    # values are the TARGET's type: t1 points at material m1
    assert rel_from["t1"] == {"m1": "<material>"}
    assert rel_from["t2"] == {"m2": "<material>", "m1": "<material>"}
