"""material_parsers_spark — a PySpark-native extraction engine.

A from-scratch re-expression of the query/data-processing capabilities of
``lfoppiano/material-parsers`` (reference snapshot at /root/reference) as a
distributed, vectorized Spark pipeline over multi-turn transcript tables:

- ``kernel``   — pure, deterministic Python re-implementations of every
  extraction operator (tokenizer, span post-processing, formula parsing,
  classification, Tc-value rules, entity linking). No Spark imports; this is
  where reference-fixture parity is proven.
- ``pipeline`` — the PySpark layer: schemas, vectorized pandas/Arrow UDF
  wrappers, the end-to-end extraction job, skew handling, checkpoint/resume,
  dedup / similarity / text-quality operators for training-data pipelines.

Design stance: DataFrame-first, Catalyst-optimizable plans; Python only in
Arrow-batched UDFs (never per-row); broadcast dictionaries; explicit
partitioning for the 10^12-turn design scale.
"""

__version__ = "0.1.0"
