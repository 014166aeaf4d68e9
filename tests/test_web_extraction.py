"""HTML boilerplate strip + DOM heuristics (north rule web path): kernel
block classifier semantics, the Spark stage, and the per-turn equality
invariant (HTML wrap -> strip -> extract == direct extract)."""

import pytest

from material_parsers_spark.kernel.web import (
    html_blocks,
    is_content_block,
    main_content,
    strip_tags,
)
from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.pipeline.transcripts import generate_turns
from material_parsers_spark.pipeline.web import (
    extract_main_content,
    extract_materials_from_html,
    wrap_turns_in_html,
)

PAGE = (
    '<html><head><title>t</title><style>p { color: red }</style>'
    '<script>alert("nope")</script></head><body>'
    '<nav><a href="/">Home</a> <a href="/x">Other</a></nav>'
    '<div><a href="/1">link one</a> <a href="/2">link two</a> '
    '<a href="/3">link three</a></div>'
    '<article><p>This is the actual long-form content paragraph that '
    'any reader came to this page for.</p></article>'
    '<footer>All rights reserved forever and ever.</footer></body></html>'
)


class TestKernel:
    def test_script_style_never_contribute_text(self):
        texts = [b["text"] for b in html_blocks(PAGE)]
        assert not any("alert" in t or "color" in t for t in texts)

    def test_chrome_blocks_are_flagged(self):
        blocks = {b["text"]: b for b in html_blocks(PAGE)}
        assert blocks["Home Other"]["in_chrome"]
        assert blocks["All rights reserved forever and ever."]["in_chrome"]
        assert not blocks[
            "This is the actual long-form content paragraph that any "
            "reader came to this page for."]["in_chrome"]

    def test_link_density_rule(self):
        blocks = {b["text"]: b for b in html_blocks(PAGE)}
        linkbar = blocks["link one link two link three"]
        assert linkbar["link_chars"] > 0
        assert not is_content_block(linkbar)

    def test_main_content_keeps_only_the_article(self):
        out = main_content(PAGE)
        assert out["text"] == (
            "This is the actual long-form content paragraph that any "
            "reader came to this page for.")
        assert out["kept_blocks"] == 1
        assert out["n_blocks"] >= 4
        assert out["dropped_chars"] > 0

    def test_plain_text_passes_through(self):
        out = main_content("short plain turn")
        assert out == {"text": "short plain turn", "n_blocks": 1,
                       "kept_blocks": 1, "dropped_chars": 0}

    def test_entities_decoded_and_whitespace_collapsed(self):
        out = main_content(
            "<p>Ba&nbsp;K   doped &amp; annealed at 30&#8201;K sample "
            "with plenty of text</p>")
        assert "&" in out["text"] and "&amp;" not in out["text"]
        assert "   " not in out["text"]

    def test_strip_tags_baseline_keeps_everything(self):
        assert "Home Other" in strip_tags(PAGE)
        assert "actual long-form content" in strip_tags(PAGE)

    def test_empty_and_none(self):
        assert main_content("")["text"] == ""
        assert main_content(None)["kept_blocks"] == 0


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="web-tests", master="local[4]",
                         shuffle_partitions=8)


@pytest.fixture(scope="module")
def turns(spark):
    return generate_turns(spark, 300, partitions=4).cache()


def test_wrap_then_strip_recovers_every_turn_text(spark, turns):
    """The per-turn equality invariant at test scale: main content of the
    wrapped page equals the original text on every row."""
    from pyspark.sql import functions as F

    wrapped = wrap_turns_in_html(turns)
    recovered = extract_main_content(wrapped).select(
        "conv_id", "turn_idx", F.col("main.main_text").alias("rec"))
    joined = turns.select("conv_id", "turn_idx", "text") \
        .join(recovered, ["conv_id", "turn_idx"])
    assert joined.where(F.col("text") != F.col("rec")).count() == 0
    stats = extract_main_content(wrapped).select("main.*").collect()
    assert all(r.kept_blocks == 1 and r.n_blocks >= 5 and
               r.dropped_chars > 0 for r in stats)


def test_web_extraction_equals_direct_extraction(spark, turns):
    """HTML wrap -> boilerplate strip -> extraction must be row-identical
    to the direct pipeline (the invariant the shared golden oracle
    hash-checks at sf0.01)."""
    import json as _json

    from material_parsers_spark.pipeline.extraction import extract_ordered

    direct = extract_ordered(turns, include_tokens=False)
    via_web = extract_materials_from_html(wrap_turns_in_html(turns))
    key = lambda r: (r["conv_id"], r["turn_idx"])
    a = sorted((r.asDict(recursive=True) for r in direct.collect()), key=key)
    b = sorted((r.asDict(recursive=True) for r in via_web.collect()), key=key)
    assert _json.loads(_json.dumps(a)) == _json.loads(_json.dumps(b))


class TestFastScannerDifferential:
    """The compiled-regex scanner must produce byte-identical blocks to
    the html.parser reference implementation."""

    CASES = [
        PAGE,
        '<p>a &amp; b</p><div><a href="x>y">quoted gt</a> trailing text</div>',
        '<!-- comment --><p>text</p><br/><hr/><P>UPPER</P>',
        'no tags at all plain',
        '<script>while(1){"<p>fake</p>"}</script><p>real content block</p>',
        '<ul><li>one</li><li>two</li></ul><nav>chrome</nav>after',
        '<div>unclosed <b>bold',
        '<![CDATA[ignored]]><!DOCTYPE html><p>doc</p>',
        '',
    ]

    def test_matches_reference_parser(self):
        from material_parsers_spark.kernel.web import html_blocks_reference

        for case in self.CASES:
            assert html_blocks(case) == html_blocks_reference(case), case

    def test_matches_reference_on_generated_pages(self):
        from material_parsers_spark.kernel.web import html_blocks_reference
        from material_parsers_spark.pipeline.web import _PAGE_TEMPLATE

        for i in range(50):
            page = _PAGE_TEMPLATE.replace("%%", "%").replace(
                "%s", f"The material MgB {i} superconducts at {i % 90}K.")
            assert html_blocks(page) == html_blocks_reference(page)


class TestScannerFidelity:
    """Regression pins for the html.parser-fidelity fixes: self-closing
    skip tags, CDATA content, lowercase doctype, PIs, and the
    single-block pass-through."""

    def test_self_closing_script_does_not_swallow_page(self):
        from material_parsers_spark.kernel.web import html_blocks_reference
        page = '<script src="x.js"/><p>real content block stays here ok</p>'
        assert html_blocks(page) == html_blocks_reference(page)
        assert main_content(page)["text"] == \
            "real content block stays here ok"

    def test_tag_like_strings_inside_script_are_opaque(self):
        from material_parsers_spark.kernel.web import html_blocks_reference
        page = ('<script>var s = "<a href=/x>"; t = "<nav>";</script>'
                '<p>real content paragraph long enough to keep here</p>')
        assert html_blocks(page) == html_blocks_reference(page)
        out = main_content(page)
        assert out["text"] == \
            "real content paragraph long enough to keep here"

    def test_lowercase_doctype_and_pi_are_discarded(self):
        from material_parsers_spark.kernel.web import html_blocks_reference
        page = ('<?xml version="1.0"?><!doctype html>'
                '<p>the document body text block is right here</p>')
        assert html_blocks(page) == html_blocks_reference(page)
        assert "doctype" not in main_content(page)["text"]

    def test_single_block_fragments_pass_through_however_short(self):
        assert main_content("<p>NaCl</p>")["text"] == "NaCl"
        assert main_content("x < y")["text"] == "x < y"

    def test_unclosed_script_suppresses_tail(self):
        from material_parsers_spark.kernel.web import html_blocks_reference
        page = '<p>kept text block before the break</p><script>tail'
        assert html_blocks(page) == html_blocks_reference(page)


def test_fused_and_staged_web_paths_are_row_identical(spark, turns):
    import json as _json

    wrapped = wrap_turns_in_html(turns)
    fused = extract_materials_from_html(wrapped, fused=True)
    staged = extract_materials_from_html(wrapped, fused=False)
    key = lambda r: (r["conv_id"], r["turn_idx"])
    a = sorted((r.asDict(recursive=True) for r in fused.collect()), key=key)
    b = sorted((r.asDict(recursive=True) for r in staged.collect()), key=key)
    assert _json.loads(_json.dumps(a)) == _json.loads(_json.dumps(b))


def test_fast_scanner_fuzz_differential_structured_markup():
    """Property pin of the fidelity boundary: on structured tag soup
    (valid and common-malformed constructs, balanced quotes) the fast
    scanner is byte-identical to html.parser. Derandomized so CI is
    stable; the EOF-recovery pathologies outside this generator are the
    documented divergence boundary."""
    from hypothesis import given, settings, strategies as st

    from material_parsers_spark.kernel.web import html_blocks_reference

    pieces = st.sampled_from([
        "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>",
        "<nav>", "</nav>", "<script>", "</script>", "<style>", "</style>",
        "<br/>", "<li>", "</li>", "<b>", "</b>", "<footer>", "</footer>",
        "<head>", "</head>", "<ul>", "</ul>", "text one", "&amp;",
        "two &lt; three", " ", "words here and there", "<!-- c -->",
        "<!doctype html>", "<?pi content>", "</>", "</ junk>",
        "<a&junk;=?p>", "<script/>", "<img src=x/>", "<P CLASS='y'>",
        "var s = \"<a href=/x>\";", "</ script>", "</ a>", "</ div>",
        "<a href=/docs/>", "</div junk>", "<nav id=x/>",
    ])
    fragment = st.lists(pieces, min_size=0, max_size=25).map("".join)

    @given(fragment)
    @settings(max_examples=400, deadline=None, derandomize=True)
    def check(html):
        assert html_blocks(html) == html_blocks_reference(html), html

    check()


class TestScannerFidelityRound2:
    """Pins for the second fidelity batch: whitespace end tags, unquoted
    trailing-slash attributes, stray CDATA closes, chrome single-block."""

    def test_whitespace_end_tags_dispatch(self):
        from material_parsers_spark.kernel.web import html_blocks_reference
        cases = [
            '<script>var x = 1;</ script>visible after the space close'
            '<p>paragraph text long enough</p>',
            "<a href='/x'>link text</ a>rest of the line here",
            'a</ div>b',
            '<div>one</div junk>two<p>three</p>',
        ]
        for case in cases:
            assert html_blocks(case) == html_blocks_reference(case), case

    def test_unquoted_trailing_slash_is_not_self_closing(self):
        from material_parsers_spark.kernel.web import html_blocks_reference
        cases = [
            '<a href=/docs/>Docs link text here</a> trailing words',
            '<nav id=x/>chrome text</nav>after',
            '<a href="/x"/>not a link anymore, slash after quote</a>',
            '<br/>line<hr />rule',
        ]
        for case in cases:
            assert html_blocks(case) == html_blocks_reference(case), case

    def test_stray_cdata_close_pops_skip_level(self):
        from material_parsers_spark.kernel.web import html_blocks_reference
        cases = [
            '<head><title>t</title></script>after stray close</head>'
            '<p>body text</p>',
            '<noscript>hidden</script>leaked text</noscript>visible',
        ]
        for case in cases:
            assert html_blocks(case) == html_blocks_reference(case), case

    def test_single_chrome_block_is_still_dropped(self):
        out = main_content('<nav><a href="/">Home</a> '
                           '<a href="/docs">Docs</a></nav>')
        assert out["text"] == ""
        assert out["kept_blocks"] == 0 and out["n_blocks"] == 1


class TestAdversarialCorpus:
    """Round-4 messy-HTML breadth: the wrapper now escapes turn text
    (the no-'<'/'&' contract is gone) and a four-template adversarial
    corpus is golden-pinned corpus-wide (web_adversarial_content)."""

    DOC = "The material MgB 2 superconducts at 39 K & has x < 1 doping."

    def test_templates_differential_against_reference_parser(self):
        import html as H

        from material_parsers_spark.kernel.web import html_blocks_reference
        from material_parsers_spark.pipeline.web import (
            _ADVERSARIAL_TEMPLATES,
        )

        escaped = H.escape(self.DOC, quote=False)
        for template in _ADVERSARIAL_TEMPLATES:
            page = template % escaped
            assert html_blocks(page) == html_blocks_reference(page), template

    def test_templates_round_trip_the_embedded_text(self):
        import html as H

        from material_parsers_spark.pipeline.web import (
            _ADVERSARIAL_TEMPLATES,
        )

        escaped = H.escape(self.DOC, quote=False)
        for template in _ADVERSARIAL_TEMPLATES:
            out = main_content(template % escaped)
            assert out["text"] == self.DOC, template
            assert out["kept_blocks"] == 1

    def test_wrapper_escapes_special_chars_and_round_trips(self, spark):
        """Turn text containing <, > and & (previously outside the
        wrapper contract) must survive wrap -> strip exactly."""
        from material_parsers_spark.pipeline.web import (
            extract_main_content,
            wrap_turns_in_html,
        )

        texts = [
            "comparing x < 1 & y > 2 in the doped LaFeAsO sample run",
            "HTML like <b>bold</b> & entities &amp; stay literal here",
            "a && b << c with MgB 2 superconducting at 39 K as usual",
        ]
        df = spark.createDataFrame(
            [("c", i, t) for i, t in enumerate(texts)],
            "conv_id string, turn_idx int, text string")
        rows = extract_main_content(wrap_turns_in_html(df)) \
            .select("turn_idx", "main.main_text").collect()
        assert len(rows) == len(texts)
        for row in rows:
            assert row.main_text == texts[row.turn_idx]

    def test_adversarial_corpus_recovers_document_text(self, spark):
        """Corpus-scale: every document >= MIN_BLOCK_CHARS comes back
        byte-identical through its adversarial page."""
        from material_parsers_spark.kernel.web import MIN_BLOCK_CHARS
        from material_parsers_spark.queries import SPARK_QUERIES

        out = SPARK_QUERIES["web_adversarial_content"](
            spark, "/root/testdata/sf0.001")
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet") \
            .select("doc_id", "text")
        joined = out.join(docs, "doc_id").collect()
        assert len(joined) == docs.count()
        checked = 0
        for row in joined:
            if len(row.text) >= MIN_BLOCK_CHARS:
                assert row.main_text == row.text, row.doc_id
                checked += 1
        assert checked > 400  # the corpus genuinely exercises the pin
