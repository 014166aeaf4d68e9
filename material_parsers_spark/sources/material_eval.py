"""S14: pseudo-XML material-evaluation reader.

Parses ``<materials><material>...<formula>F</formula>...</material>``
evaluation corpora (the reference's 500-paper accuracy set) into
{raw, entities} dicts, mirroring
`material_parser/material_data_commons.py:6-55` — including its
last-wins overwrite when a material has two children with the same tag
name. xml.etree instead of bs4 (not available here).

``read_material_eval`` is the distributed surface: whole-file text scan,
Arrow-batched parse, one row per <material> item.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Iterator, List


def parse_material_data(xml_text: str) -> List[dict]:
    root = ET.fromstring(xml_text)
    items: List[dict] = []
    for element in root:
        if not isinstance(element.tag, str):
            continue  # comments/processing instructions
        item = {"raw": "".join(element.itertext()), "entities": {}}
        for child in element:
            if isinstance(child.tag, str):
                # last one wins on duplicate tags, like the reference
                item["entities"][child.tag] = "".join(child.itertext())
        items.append(item)
    return items


def read_material_data(path: str) -> List[dict]:
    """Driver-side helper with the reference's dir-walk semantics
    (only ``*.tei.xml`` files when given a directory)."""
    if os.path.isdir(path):
        files = [
            os.path.join(root, name)
            for root, _dirs, names in os.walk(path)
            for name in names if name.lower().endswith(".tei.xml")
        ]
    else:
        files = [path]
    items: List[dict] = []
    for file_path in files:
        with open(file_path, encoding="utf-8") as fh:
            items.extend(parse_material_data(fh.read()))
    return items


MATERIAL_EVAL_SCHEMA = (
    "doc_id string, item_idx int, raw string, entities map<string,string>"
)


def read_material_eval(spark, path: str):
    """Distributed S14 reader: one row per <material> evaluation item."""
    import pandas as pd
    from pyspark.sql import functions as F

    raw = (
        spark.read.text(path, wholetext=True)
        .withColumn("doc_id", F.input_file_name())
    )

    def parse_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            rows = []
            for doc_id, xml_text in zip(batch["doc_id"], batch["value"]):
                try:
                    items = parse_material_data(xml_text)
                except ET.ParseError:
                    continue
                for index, item in enumerate(items):
                    rows.append({
                        "doc_id": doc_id,
                        "item_idx": index,
                        "raw": item["raw"],
                        "entities": item["entities"],
                    })
            yield pd.DataFrame(
                rows, columns=["doc_id", "item_idx", "raw", "entities"])

    return raw.mapInPandas(parse_batch, schema=MATERIAL_EVAL_SCHEMA)
