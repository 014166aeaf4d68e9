"""Build a LOCAL sf1-shaped replica for optimization measurement only.

The driver benches this round at sf=1.0 with its own generated data
(BENCH_r05.json: sf 1.0). The sandbox only ships sf0.001/0.01/0.1, so this
tool synthesizes a measurement-only sf1 directory matching the observed
row-count scaling of the driver's generator:

    documents  5,000 -> 50,000   (same 31-word vocab, 10-100 words/doc)
    embeddings 2,000 -> 20,000   (unit-norm float32, dim 64, labels 0..9)
    events   100,000 -> 1,000,000
    lineitem/orders/customer/part/supplier 10x replication
    region/nation copied

Deterministic (seed fixed). Output: /root/testdata_local/sf1_replica/.
NOT used by any query or test — measurement harness input only
(SPARK_GRAFT_SF_DIR=/root/testdata_local/sf1_replica).
"""

from __future__ import annotations

import json
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = "/root/testdata_local/sf1_replica"


def documents() -> None:
    src = pq.read_table(f"{SRC}/documents.parquet")
    vocab = sorted({w for t in src["text"].to_pylist() for w in t.split()})
    langs = ["en", "en", "zh", "es", "fr", "de"]  # en-heavy like the source
    rng = random.Random(42_001)
    n = 50_000
    texts, lang_col, source_col, nchars = [], [], [], []
    for _ in range(n):
        k = rng.randint(10, 100)
        t = " ".join(rng.choice(vocab) for _ in range(k))
        texts.append(t)
        lang_col.append(rng.choice(langs))
        source_col.append(f"src{rng.randrange(20)}")
        nchars.append(len(t))
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(lang_col),
        "source": pa.array(source_col),
        "n_chars": pa.array(nchars, pa.int64()),
    })
    pq.write_table(tbl, f"{OUT}/documents.parquet")


def embeddings() -> None:
    rng = np.random.default_rng(42_002)
    n, d = 20_000, 64
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(v.tolist(), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n), pa.int32()),
    })
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")


def events() -> None:
    import pyarrow.compute as pc
    t = pq.read_table(f"{SRC}/events.parquet")
    n_src = t.num_rows
    day_us = 86_400_000_000
    parts = []
    for r in range(10):
        shifted = t.set_column(
            t.schema.get_field_index("event_id"), "event_id",
            pc.add(t["event_id"], r * n_src))
        shifted = shifted.set_column(
            shifted.schema.get_field_index("ts"), "ts",
            pc.add(t["ts"].cast(pa.int64()),
                   r * 40 * day_us).cast(pa.timestamp("us")))
        shifted = shifted.set_column(
            shifted.schema.get_field_index("user_id"), "user_id",
            pc.add(t["user_id"], r * 100_000))
        parts.append(shifted)
    pq.write_table(pa.concat_tables(parts), f"{OUT}/events.parquet")


def replicate(table: str, id_cols: dict) -> None:
    import pyarrow.compute as pc
    t = pq.read_table(f"{SRC}/{table}.parquet")
    parts = []
    for r in range(10):
        s = t
        for col, span in id_cols.items():
            idx = s.schema.get_field_index(col)
            s = s.set_column(idx, col, pc.add(t[col], r * span))
        parts.append(s)
    pq.write_table(pa.concat_tables(parts), f"{OUT}/{table}.parquet")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    documents()
    embeddings()
    events()
    replicate("lineitem", {"l_orderkey": 10_000_000})
    replicate("orders", {"o_orderkey": 10_000_000}
              if "o_orderkey" in pq.read_schema(
                  f"{SRC}/orders.parquet").names else {})
    replicate("customer", {"c_custkey": 1_000_000}
              if "c_custkey" in pq.read_schema(
                  f"{SRC}/customer.parquet").names else {})
    replicate("part", {"p_partkey": 1_000_000}
              if "p_partkey" in pq.read_schema(
                  f"{SRC}/part.parquet").names else {})
    replicate("supplier", {"s_suppkey": 1_000_000}
              if "s_suppkey" in pq.read_schema(
                  f"{SRC}/supplier.parquet").names else {})
    for small in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{small}.parquet"),
                       f"{OUT}/{small}.parquet")
    with open(f"{OUT}/_DONE", "w") as fh:
        fh.write("measurement replica\n")
    print(json.dumps({t: pq.ParquetFile(f"{OUT}/{t}.parquet").metadata.num_rows
                      for t in ("documents", "embeddings", "events",
                                "lineitem", "orders")}))


if __name__ == "__main__":
    main()
