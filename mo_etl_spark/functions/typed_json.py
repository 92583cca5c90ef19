"""Typed JSON encoding (u, mo_json/typed_encoder.py): store dynamic
JSON in typed stores by nesting every value under a type-suffixed key —

    number  -> {"~n~": 1.5}        string -> {"~s~": "x"}
    boolean -> {"~b~": true}       array  -> {"~a~": [<encoded>...]}
    object  -> {"~e~": 1, "<field>": <encoded>, ...}   (~e~ = exists)

jx-sqlite (u) uses this encoding to evolve its snowflake schema: the
typed key names the column type, so a value changing type lands in a
NEW key instead of corrupting an existing column.

Here both directions are pure Column expressions over a KNOWN
StructType (Spark schemas are static per plan — the dynamic-discovery
step lives in operators/shred.py): ``typed_encode`` emits the typed
JSON string, ``typed_decode`` parses it back into the original struct.
Null fields are omitted by to_json, matching the encoding's
missing-is-absent rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUM = "~n~"
STR = "~s~"
BOOL = "~b~"
ARR = "~a~"
EXISTS = "~e~"


def _encode(col: Column, dt: T.DataType) -> Column:
    # every branch is null-guarded: a MISSING value encodes as NULL so
    # to_json omits the key entirely (missing-is-absent), rather than
    # emitting an empty/existence-marked wrapper for it
    if isinstance(dt, T.StructType):
        parts = [F.lit(1).alias(EXISTS)]
        for f in dt.fields:
            parts.append(_encode(col[f.name], f.dataType).alias(f.name))
        return F.when(col.isNotNull(), F.struct(*parts))
    if isinstance(dt, T.ArrayType):
        return F.when(
            col.isNotNull(),
            F.struct(F.transform(col, lambda x: _encode(x, dt.elementType)).alias(ARR)),
        )
    if isinstance(dt, T.BooleanType):
        return F.when(col.isNotNull(), F.struct(col.alias(BOOL)))
    if isinstance(dt, T.StringType):
        return F.when(col.isNotNull(), F.struct(col.alias(STR)))
    if isinstance(dt, (T.NumericType,)):
        # jx numbers are doubles (SURVEY §1.2)
        return F.when(col.isNotNull(), F.struct(col.cast("double").alias(NUM)))
    raise ValueError(f"typed JSON: unsupported type {dt}")


def _typed_schema(dt: T.DataType) -> T.DataType:
    if isinstance(dt, T.StructType):
        fields = [T.StructField(EXISTS, T.LongType())] + [
            T.StructField(f.name, _typed_schema(f.dataType)) for f in dt.fields
        ]
        return T.StructType(fields)
    if isinstance(dt, T.ArrayType):
        return T.StructType(
            [T.StructField(ARR, T.ArrayType(_typed_schema(dt.elementType)))]
        )
    if isinstance(dt, T.BooleanType):
        return T.StructType([T.StructField(BOOL, T.BooleanType())])
    if isinstance(dt, T.StringType):
        return T.StructType([T.StructField(STR, T.StringType())])
    if isinstance(dt, T.NumericType):
        return T.StructType([T.StructField(NUM, T.DoubleType())])
    raise ValueError(f"typed JSON: unsupported type {dt}")


def _decode(col: Column, dt: T.DataType) -> Column:
    if isinstance(dt, T.StructType):
        # absent object (key omitted at encode) -> NULL, not a struct
        # of all-null fields
        return F.when(
            col.isNotNull(),
            F.struct(
                *[_decode(col[f.name], f.dataType).alias(f.name) for f in dt.fields]
            ),
        )
    if isinstance(dt, T.ArrayType):
        return F.transform(col[ARR], lambda x: _decode(x, dt.elementType))
    if isinstance(dt, T.BooleanType):
        return col[BOOL]
    if isinstance(dt, T.StringType):
        return col[STR]
    if isinstance(dt, T.NumericType):
        return col[NUM].cast(dt)
    raise ValueError(f"typed JSON: unsupported type {dt}")


def typed_encode(col: Column, dt: T.DataType) -> Column:
    """Struct/array/scalar Column -> typed-JSON string."""
    return F.to_json(_encode(col, dt))


def typed_decode(col: Column, dt: T.DataType) -> Column:
    """Typed-JSON string -> Column of the original DataType."""
    return _decode(F.from_json(col, _typed_schema(dt)), dt)
