"""Fixed StructType schemas for the extraction pipeline (SURVEY.md §1.2).

The reference is schema-dynamic (dicts/JSON); here every optional key
becomes a nullable field declared once. Amounts and variable values stay
STRINGS ("1-x" is legal, `material_parser_formulas.py:72-74`)."""

from __future__ import annotations

from pyspark.sql import types as T

TURNS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])

TOKEN_TYPE = T.StructType([
    T.StructField("text", T.StringType(), False),
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
])

LINK_TYPE = T.StructType([
    T.StructField("targetId", T.StringType(), True),
    T.StructField("targetText", T.StringType(), True),
    T.StructField("targetType", T.StringType(), True),
    T.StructField("type", T.StringType(), True),
])

SPAN_TYPE = T.StructType([
    T.StructField("id", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("type", T.StringType(), True),
    T.StructField("offset_start", T.IntegerType(), True),
    T.StructField("offset_end", T.IntegerType(), True),
    T.StructField("token_start", T.IntegerType(), True),
    T.StructField("token_end", T.IntegerType(), True),
    T.StructField("linkable", T.BooleanType(), True),
    T.StructField("links", T.ArrayType(LINK_TYPE), True),
])

RESOLVED_FORMULA_TYPE = T.StructType([
    T.StructField("rawValue", T.StringType(), True),
    T.StructField("formulaComposition",
                  T.MapType(T.StringType(), T.StringType()), True),
])

MATERIAL_TYPE = T.StructType([
    T.StructField("formula", RESOLVED_FORMULA_TYPE, True),
    T.StructField("name", T.StringType(), True),
    T.StructField("doping", T.StringType(), True),
    T.StructField("shape", T.StringType(), True),
    T.StructField("fabrication", T.StringType(), True),
    T.StructField("substrate", T.StringType(), True),
    T.StructField("variables",
                  T.MapType(T.StringType(), T.ArrayType(T.StringType())), True),
    T.StructField("resolvedFormulas",
                  T.ArrayType(RESOLVED_FORMULA_TYPE), True),
])

EXTRACTION_TYPE = T.StructType([
    T.StructField("tokens", T.ArrayType(TOKEN_TYPE), True),
    T.StructField("spans", T.ArrayType(SPAN_TYPE), True),
    T.StructField("materials", T.ArrayType(MATERIAL_TYPE), True),
])
