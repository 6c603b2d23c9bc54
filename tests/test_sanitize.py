"""Generic field-name sanitizer: nested renames + idempotence."""

from __future__ import annotations

from ssn_college_software_architecture_assignments__spark.operators.projections import (
    sanitize_field_names,
)


def _all_names(schema) -> set[str]:
    from pyspark.sql import types as T

    out = set()

    def walk(dtype, prefix=""):
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                out.add(f.name)
                walk(f.dataType, prefix + f.name + "/")
        elif isinstance(dtype, T.ArrayType):
            walk(dtype.elementType, prefix)

    walk(schema)
    return out


def test_sanitize_rewrites_nested_and_is_idempotent(spark):
    df = spark.createDataFrame(
        [(1, {"a.b": 2, "c$d": {"e f": 3}}, [{"x.y": 4}])],
        "`id` BIGINT, `pay.load` STRUCT<`a.b`: BIGINT, `c$d`: STRUCT<`e f`: BIGINT>>, "
        "`arr` ARRAY<STRUCT<`x.y`: BIGINT>>",
    )
    clean = sanitize_field_names(df)
    names = _all_names(clean.schema)
    assert names == {"id", "pay_load", "a_b", "c_d", "e_f", "arr", "x_y"}
    # values survive the rebuild
    row = clean.collect()[0]
    assert row["pay_load"]["a_b"] == 2
    assert row["pay_load"]["c_d"]["e_f"] == 3
    assert row["arr"][0]["x_y"] == 4
    # idempotent: sanitizing clean data changes nothing
    again = sanitize_field_names(clean)
    assert again.schema == clean.schema
    assert again.collect() == clean.collect()
