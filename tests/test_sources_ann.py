"""brat .ann source tests (S7): entity lines, relation lines with endpoint
resolution, sibling .txt corpus."""

import shutil
import tempfile

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.sources.ann import (
    read_documents,
    read_entities,
    read_relations,
)

ANN1 = """T1\tMaterial 4 9\tMgB 2
T2\tTcValue 28 32\t39 K
R1\tMaterial-Tc Arg1:T1 Arg2:T2
"""
TXT1 = "The MgB 2 superconducts at 39 K today."

ANN2 = """T1\tMaterial 0 7\tNbSe2
"""
TXT2 = "NbSe2 is layered."


@pytest.fixture(scope="module")
def corpus_dir():
    workdir = tempfile.mkdtemp(prefix="ann-test-")
    for name, ann, txt in [("doc1", ANN1, TXT1), ("doc2", ANN2, TXT2)]:
        with open(f"{workdir}/{name}.ann", "w") as fh:
            fh.write(ann)
        with open(f"{workdir}/{name}.txt", "w") as fh:
            fh.write(txt)
    yield workdir
    shutil.rmtree(workdir, ignore_errors=True)


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="ann-tests", master="local[2]",
                         shuffle_partitions=2)


def test_entities(spark, corpus_dir):
    rows = {(r.file, r.ent_id): r
            for r in read_entities(spark, corpus_dir).collect()}
    assert len(rows) == 3
    ent = rows[("doc1.ann", "T1")]
    assert (ent.tag, ent.start, ent.end, ent.surface) == \
        ("Material", 4, 9, "MgB 2")


def test_relations_resolve_endpoints(spark, corpus_dir):
    rels = read_relations(spark, corpus_dir).collect()
    assert len(rels) == 1
    rel = rels[0]
    assert rel.tag == "Material-Tc"
    assert rel.arg1_surface == "MgB 2"
    assert rel.arg2_surface == "39 K"
    assert rel.arg2_start == 28


def test_documents_keyed_to_ann_file(spark, corpus_dir):
    docs = {r.file: r.text for r in read_documents(spark, corpus_dir).collect()}
    assert docs["doc1.ann"].startswith("The MgB 2")
    assert set(docs) == {"doc1.ann", "doc2.ann"}
