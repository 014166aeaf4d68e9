"""S14 pseudo-XML eval reader tests, incl. a differential run against the
reference's real 500-paper evaluation file."""

import os

import pytest

from material_parsers_spark.sources.material_eval import (
    parse_material_data,
    read_material_data,
)

REF_EVAL = ("/root/reference/material_parsers/material_parser/resources/"
            "evaluation/500papers.material.tei.xml")


def test_parse_material_data_shapes_and_last_wins():
    xml = """<materials>
    <material><formula>MgB 2</formula> <shape>films</shape></material>
    <!-- a commented-out entry -->
    <material>(<variable>A</variable> = <value>Ba, Sr</value>)</material>
    <material><shape>wire</shape> and <shape>tape</shape></material>
    </materials>"""
    items = parse_material_data(xml)
    assert len(items) == 3
    assert items[0] == {"raw": "MgB 2 films",
                        "entities": {"formula": "MgB 2", "shape": "films"}}
    assert items[1]["raw"] == "(A = Ba, Sr)"
    # duplicate tags: last one wins, like the reference reader
    assert items[2]["entities"] == {"shape": "tape"}


@pytest.mark.skipif(not os.path.exists(REF_EVAL),
                    reason="reference snapshot not available")
def test_reads_the_reference_500papers_file():
    items = read_material_data(REF_EVAL)
    assert len(items) == 157
    assert items[0]["entities"] == {
        "name": "1111", "shape": "epitaxial thin films"}
    assert items[0]["raw"] == '""1111"" epitaxial thin films'
    formulas = [i["entities"].get("formula") for i in items]
    assert "(Ba,K)Fe 2 As 2" in formulas


def test_read_material_eval_distributed(tmp_path):
    from material_parsers_spark.pipeline.session import build_session
    from material_parsers_spark.sources.material_eval import (
        read_material_eval)

    path = tmp_path / "eval.tei.xml"
    path.write_text(
        "<materials><material><formula>NbB 2</formula></material>"
        "<material><name>YBCO</name> <shape>film</shape></material>"
        "</materials>")
    spark = build_session(app_name="s14-test", master="local[4]",
                          shuffle_partitions=4)
    rows = read_material_eval(spark, str(path)).collect()
    assert len(rows) == 2
    assert rows[0].entities == {"formula": "NbB 2"}
    assert rows[1].entities == {"name": "YBCO", "shape": "film"}
