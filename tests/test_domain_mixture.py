"""Planted fixture for the domain-mixture epoch manifest: full epochs
must replicate exactly floor(r) times, the fractional epoch must follow
the deterministic per-(doc, epoch) hash threshold (mirrored in Python),
an exact-integer repeat factor must emit no fractional epoch at all,
unweighted domains must drop, and the DuckDB oracle must agree on the
fixture."""

import duckdb
import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import (
    MIXTURE_BUDGET_FACTOR,
    MIXTURE_MAX_EPOCHS,
    MIXTURE_WEIGHTS,
    ORACLE_SQL,
    SPARK_QUERIES,
)
from tests.conftest import h60
from tools.check_oracles import value_hash

WEIGHTS = dict(MIXTURE_WEIGHTS)


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="mixture-tests", master="local[8]",
                         shuffle_partitions=8)


@pytest.fixture(scope="module")
def mixture_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("mixture")
    text10 = " ".join(f"w{k}" for k in range(10))
    rows = []
    # 10 en docs x 10 tokens and 10 de docs x 10 tokens -> T = 200,
    # budget = 2T = 400: r_en = 0.5*400/100 = 2.0 EXACTLY (integer
    # repeat factor edge), r_de = 0.15*400/100 ~= 0.6 (pure-fractional)
    for i in range(10):
        rows.append((i, text10, "en"))
        rows.append((100 + i, text10, "de"))
    # unweighted domain: must not appear in the manifest (and must not
    # perturb the weighted domains' token totals)
    rows.append((999, text10, "xx"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    df.write.mode("overwrite").parquet(str(base / "documents.parquet"))
    return str(base)


def _python_mirror():
    """Expected (doc_id, epoch) set computed by the documented rule."""
    # the budget totals over WEIGHTED domains only: xx's 10 tokens are
    # out of the recipe and must not inflate the target
    total = 200.0
    expected = set()
    for domain, ids, d_tokens in (("en", range(10), 100.0),
                                  ("de", range(100, 110), 100.0)):
        r = min(WEIGHTS[domain] * MIXTURE_BUDGET_FACTOR * total / d_tokens,
                MIXTURE_MAX_EPOCHS)
        full = int(r // 1)
        thresh = int(((r - full) * 1e6) // 1)
        for doc_id in ids:
            for epoch in range(full):
                expected.add((doc_id, epoch))
            if h60(f"{doc_id}:{full}") % 1_000_000 < thresh:
                expected.add((doc_id, full))
    return expected


def test_epoch_semantics_match_python_mirror(spark, mixture_dir):
    rows = SPARK_QUERIES["domain_mixture"](spark, mixture_dir).collect()
    got = {(r.doc_id, r.epoch) for r in rows}
    assert got == _python_mirror()
    # unweighted domain dropped entirely
    assert not any(r.domain == "xx" for r in rows)
    # every en doc: full epochs 0..full-1 present; the exact-integer
    # repeat factor (if r lands on an integer) emits no fractional epoch
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i in range(10):
        epochs = sorted(e.epoch for e in by_doc[i])
        r = by_doc[i][0].repeat_factor
        assert epochs[: int(r // 1)] == list(range(int(r // 1)))
    # n_tokens carried per manifest row (manifest-only upsampling:
    # the text itself is never replicated)
    assert all(r.n_tokens == 10 for r in rows)


def test_sliver_domain_repeat_factor_is_capped(spark, tmp_path):
    """A weighted domain holding a sliver of the corpus must clamp to
    MIXTURE_MAX_EPOCHS full epochs — never an unbounded per-row epoch
    array (uncapped r here would be 0.5*2000/10 = 100)."""
    text10 = " ".join(f"w{k}" for k in range(10))
    rows = [(0, text10, "en")]
    rows += [(100 + i, text10, "de") for i in range(99)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string")
    base = tmp_path / "sliver"
    docs.write.mode("overwrite").parquet(str(base / "documents.parquet"))
    out = SPARK_QUERIES["domain_mixture"](spark, str(base)).collect()
    en_rows = [r for r in out if r.domain == "en"]
    assert len(en_rows) == int(MIXTURE_MAX_EPOCHS)
    assert sorted(r.epoch for r in en_rows) == \
        list(range(int(MIXTURE_MAX_EPOCHS)))
    assert all(r.repeat_factor == MIXTURE_MAX_EPOCHS for r in en_rows)


def test_fixture_oracle_parity(spark, mixture_dir):
    df = SPARK_QUERIES["domain_mixture"](spark, mixture_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{mixture_dir}/documents.parquet/*.parquet'")
    result = con.execute(ORACLE_SQL["domain_mixture"])
    oracle_rows = result.fetchall()
    oracle_cols = [d[0] for d in result.description]
    assert len(spark_rows) == len(oracle_rows)
    assert sorted(df.columns) == sorted(oracle_cols)
    assert value_hash(spark_rows, df.columns) == \
        value_hash(oracle_rows, oracle_cols)
