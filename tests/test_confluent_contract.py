"""Confluent wire-format contract test against hand-derived golden bytes.

The round-3 verdict flagged Confluent framing as the highest-risk
untested surface: no broker exists in this image, so the framing had
only ever been checked against our own decoder. This module removes the
self-referential loop by deriving every byte BY HAND from the two public
specifications and asserting the engine produces exactly those bytes:

- Confluent Schema Registry wire format: 1 magic byte ``0x00``, 4-byte
  BIG-endian schema id, then the raw Avro binary payload.
- Avro 1.x binary encoding: zigzag-varint longs, length-prefixed UTF-8
  strings, little-endian IEEE-754 doubles, block-encoded arrays/maps,
  union index prefix.

The golden byte strings below are written out literally (not computed by
calling the codec) so they constitute an independent second
implementation; if the engine's encoder and these bytes agree, a real
Confluent consumer (reference: pyconnect uses confluent-kafka's
AvroProducer, test/conftest.py:174-239) will decode our frames.
"""

from __future__ import annotations

import pytest

from pyconnect_spark.functions.avro_codec import decode, encode

# ---------------------------------------------------------------------------
# golden payload: hand-derived, byte by byte, from the Avro 1.x spec
# ---------------------------------------------------------------------------
RECORD_SCHEMA = {
    "type": "record",
    "name": "sensor",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "age", "type": "int"},
        {"name": "delta", "type": "long"},
        {"name": "big", "type": "long"},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "opt2", "type": ["null", "long"]},
    ],
}

RECORD_VALUE = {
    "name": "Alice",
    "age": 34,
    "delta": -2,
    "big": 128,
    "score": 1.5,
    "tags": ["a", "b"],
    "opt": None,
    "opt2": 7,
}

# Derivation (Avro spec, "Binary Encoding"):
#   "Alice"  -> len 5, zigzag(5)=10 -> 0x0a, then UTF-8 bytes
#   34       -> zigzag(34)=68 -> 0x44
#   -2       -> zigzag(-2)=3 -> 0x03
#   128      -> zigzag(128)=256 -> varint LE 7-bit groups: 0x80 0x02
#   1.5      -> IEEE-754 double 0x3FF8000000000000, little-endian on wire
#   ["a","b"]-> block count 2 -> zigzag 4 -> 0x04, items, end block 0x00
#   None in ["null","long"] -> union index 0 -> 0x00
#   7 in ["null","long"]    -> union index 1 -> 0x02, zigzag(7)=14 -> 0x0e
GOLDEN_PAYLOAD = (
    b"\x0aAlice"
    b"\x44"
    b"\x03"
    b"\x80\x02"
    b"\x00\x00\x00\x00\x00\x00\xf8\x3f"
    b"\x04" b"\x02a" b"\x02b" b"\x00"
    b"\x00"
    b"\x02\x0e"
)

SCHEMA_ID = 0x00010203  # exercises all four big-endian id bytes
GOLDEN_FRAME = b"\x00" + b"\x00\x01\x02\x03" + GOLDEN_PAYLOAD


def test_payload_matches_hand_derived_bytes():
    assert encode(RECORD_VALUE, RECORD_SCHEMA) == GOLDEN_PAYLOAD


def test_payload_roundtrips_through_decoder():
    assert decode(GOLDEN_PAYLOAD, RECORD_SCHEMA) == RECORD_VALUE


def test_map_block_encoding_golden():
    # {"k": 1} under map<long>: count zigzag(1)=2, key "k" (len 1 -> 0x02),
    # value zigzag(1)=2, end block 0x00
    schema = {"type": "map", "values": "long"}
    assert encode({"k": 1}, schema) == b"\x02\x02k\x02\x00"


def test_varint_boundaries_golden():
    # zigzag maps n>=0 -> 2n and n<0 -> -2n-1; varint emits LE 7-bit groups.
    cases = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -64: b"\x7f",
        64: b"\x80\x01",
        -65: b"\x81\x01",
        (1 << 62): b"\x80\x80\x80\x80\x80\x80\x80\x80\x80\x01",
        -(1 << 63): b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01",
    }
    for n, expected in cases.items():
        assert encode(n, "long") == expected, n
        assert decode(expected, "long") == n


# ---------------------------------------------------------------------------
# framing: both column-level paths must emit the identical golden frame
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def framed_rows(spark):
    from pyspark.sql import functions as F

    from pyconnect_spark.functions.avro import wrap_confluent, confluent_schema_id, unwrap_confluent
    from pyconnect_spark.functions.avro_codec import to_avro_py

    df = spark.createDataFrame(
        [(RECORD_VALUE["name"], RECORD_VALUE["age"], RECORD_VALUE["delta"],
          RECORD_VALUE["big"], RECORD_VALUE["score"], RECORD_VALUE["tags"],
          RECORD_VALUE["opt"], RECORD_VALUE["opt2"])],
        "name string, age int, delta long, big long, score double, tags array<string>, opt long, opt2 long",
    ).select(F.struct("name", "age", "delta", "big", "score", "tags", "opt", "opt2").alias("rec"))

    framed_udf = df.select(
        to_avro_py(F.col("rec"), RECORD_SCHEMA, schema_id=SCHEMA_ID).alias("value")
    )
    framed_wrap = df.select(
        wrap_confluent(to_avro_py(F.col("rec"), RECORD_SCHEMA), SCHEMA_ID).alias("value")
    )
    ids = framed_udf.select(confluent_schema_id(F.col("value")).alias("sid"))
    payloads = framed_udf.select(unwrap_confluent(F.col("value")).alias("p"))
    return (
        bytes(framed_udf.collect()[0][0]),
        bytes(framed_wrap.collect()[0][0]),
        ids.collect()[0][0],
        bytes(payloads.collect()[0][0]),
    )


def test_udf_framing_matches_golden_frame(spark, framed_rows):
    assert framed_rows[0] == GOLDEN_FRAME


def test_wrap_confluent_framing_matches_golden_frame(spark, framed_rows):
    assert framed_rows[1] == GOLDEN_FRAME


def test_schema_id_extraction_roundtrip(spark, framed_rows):
    assert framed_rows[2] == SCHEMA_ID


def test_unwrap_confluent_recovers_golden_payload(spark, framed_rows):
    assert framed_rows[3] == GOLDEN_PAYLOAD
