"""Avro binary codec: golden byte sequences from the Avro 1.x spec,
roundtrip properties over the inferable type surface, and the
column-level Confluent-framed path end-to-end."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pyconnect_spark.functions import avro as A
from pyconnect_spark.functions.avro_codec import decode, encode, from_avro_py, to_avro_py


# ---------------------------------------------------------------------------
# golden bytes (Avro spec examples: zigzag varints, length-prefixed strings)
# ---------------------------------------------------------------------------
def test_golden_long_encoding():
    assert encode(0, "long") == b"\x00"
    assert encode(-1, "long") == b"\x01"
    assert encode(1, "long") == b"\x02"
    assert encode(-2, "long") == b"\x03"
    assert encode(2, "long") == b"\x04"
    assert encode(-64, "long") == b"\x7f"
    assert encode(64, "long") == b"\x80\x01"


def test_golden_string_and_bool():
    assert encode("foo", "string") == b"\x06foo"
    assert encode(True, "boolean") == b"\x01"
    assert encode(False, "boolean") == b"\x00"
    assert encode(None, "null") == b""


def test_golden_record_and_array():
    # spec example: record {a: long=27, b: string="foo"} -> 36 06 66 6f 6f
    schema = {
        "type": "record",
        "name": "test",
        "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}],
    }
    assert encode({"a": 27, "b": "foo"}, schema) == b"\x36\x06foo"
    # spec example: array<long> [3, 27] -> 04 06 36 00
    assert encode([3, 27], {"type": "array", "items": "long"}) == b"\x04\x06\x36\x00"


def test_golden_nullable_union():
    schema = ["null", "long"]
    assert encode(None, schema) == b"\x00"
    assert encode(7, schema) == b"\x02\x0e"  # union index 1, then zigzag(7)
    assert decode(b"\x00", schema) is None
    assert decode(b"\x02\x0e", schema) == 7


_prims = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(string.printable, max_size=30),
    st.binary(max_size=30),
)
_field_names = st.text(string.ascii_lowercase, min_size=1, max_size=6)
_records = st.dictionaries(
    _field_names,
    st.one_of(
        _prims,
        st.lists(st.integers(-1000, 1000), max_size=5),
        st.dictionaries(_field_names, _prims, min_size=1, max_size=3),
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=200, deadline=None)
@given(_records, st.booleans())
def test_roundtrip_inferred_schema(record, optional):
    """encode∘decode is identity under the schema inferred for the record
    (the exact pipeline a source uses: infer once, encode every record)."""
    schema = A.create_schema_from_record("value", record, optional_primitives=optional)
    out = decode(encode(record, schema), schema)
    assert out == record


def test_map_roundtrip():
    schema = {"type": "map", "values": "long"}
    v = {"a": 1, "b": -5, "c": 0}
    assert decode(encode(v, schema), schema) == v


# ---------------------------------------------------------------------------
# column-level path: struct column → Confluent-framed Avro → back
# ---------------------------------------------------------------------------
def test_column_roundtrip_confluent(spark):
    schema = {
        "type": "record",
        "name": "value",
        "fields": [{"name": "a", "type": "string"}, {"name": "b", "type": "long"}],
    }
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [((f"s{i}", i * 11),) for i in range(20)], "v struct<a:string,b:bigint>"
    )
    framed = df.select(to_avro_py(F.col("v"), schema, schema_id=42).alias("payload"))
    rows = framed.collect()
    assert all(bytes(r["payload"])[:5] == b"\x00\x00\x00\x00\x2a" for r in rows)

    back = framed.select(
        from_avro_py(
            F.col("payload"), schema, "struct<a:string,b:bigint>", confluent_framed=True
        ).alias("v")
    ).collect()
    got = sorted((r["v"]["a"], r["v"]["b"]) for r in back)
    assert got == sorted((f"s{i}", i * 11) for i in range(20))
