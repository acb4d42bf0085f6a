"""Schema conformance (operator P1).

Coerce an arbitrary source DataFrame into a target StructType: recursively
align structs and arrays-of-structs, cast scalars, and insert typed NULLs for
missing fields. This is the single fixed-schema boundary of the engine —
behaviorally equivalent to the reference's ``apply_walden_schema``
(``libraries/dlt_utils/openalex/dlt/transform.py:66-118``), re-implemented
here from its observable contract (SURVEY.md §1.4).

Everything is expressed as column expressions, so Catalyst folds the whole
conformance into the scan projection — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def _conform_column(col: Column, source_type: DataType, target_type: DataType) -> Column:
    """Build an expression turning ``col`` (of source_type) into target_type."""
    if isinstance(target_type, StructType):
        if not isinstance(source_type, StructType):
            return F.lit(None).cast(target_type)
        src_fields = {f.name: f for f in source_type.fields}
        parts = []
        for tf in target_type.fields:
            sf = src_fields.get(tf.name)
            if sf is None:
                parts.append(F.lit(None).cast(tf.dataType).alias(tf.name))
            else:
                parts.append(
                    _conform_column(col.getField(tf.name), sf.dataType, tf.dataType).alias(tf.name)
                )
        # Preserve struct-level NULL (F.struct alone would fabricate a row).
        return F.when(col.isNull(), F.lit(None).cast(target_type)).otherwise(F.struct(*parts))
    if isinstance(target_type, ArrayType):
        if not isinstance(source_type, ArrayType):
            return F.lit(None).cast(target_type)
        return F.transform(
            col, lambda x: _conform_column(x, source_type.elementType, target_type.elementType)
        ).cast(target_type)
    if isinstance(target_type, MapType):
        if not isinstance(source_type, MapType):
            return F.lit(None).cast(target_type)
        return col.cast(target_type)
    return col.cast(target_type)


def conform(df: DataFrame, schema: StructType) -> DataFrame:
    """Project ``df`` onto ``schema``: align/cast/NULL-fill, drop extras.

    Column order follows the target schema exactly (the reference's UNION ALL
    column-order hazard — SURVEY.md §2.7 U1 — is eliminated by construction:
    conformed frames always union cleanly by position AND name).
    """
    src_fields = {f.name: f for f in df.schema.fields}
    cols = []
    for tf in schema.fields:
        sf = src_fields.get(tf.name)
        if sf is None:
            cols.append(F.lit(None).cast(tf.dataType).alias(tf.name))
        else:
            cols.append(_conform_column(F.col(tf.name), sf.dataType, tf.dataType).alias(tf.name))
    return df.select(*cols)


def conform_union(dfs: list[DataFrame], schema: StructType) -> DataFrame:
    """Conform every input to ``schema`` and UNION ALL (U1/U3)."""
    out = conform(dfs[0], schema)
    for d in dfs[1:]:
        out = out.unionByName(conform(d, schema))
    return out
