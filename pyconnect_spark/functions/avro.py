"""Avro schema inference + Confluent wire-format helpers.

Parity surface with the reference's `avroparser.py`
(/root/reference/src/pyconnect/avroparser.py:12-105): infer an Avro schema
from the first Python record produced, with the same type table —

    int → long, float → double, str → string, bytes/bytearray → bytes,
    None → null, dict → nested record, optional_primitives → ["null", T]

— plus one deliberate fix: lists infer their item type from the first
element instead of the reference's hardcoded ``"items": "string"``
(acknowledged broken there: "TODO FIXME", avroparser.py:36).

Also provides:
- Avro JSON schema ↔ Spark ``StructType`` conversion (for wiring inferred
  schemas into ``from_avro``/``to_avro`` when the spark-avro jar is on the
  classpath);
- Confluent wire-format framing (magic byte 0x00 + 4-byte big-endian
  schema id + payload) as pure column expressions — `from_avro` expects
  raw Avro, so Kafka values from Confluent producers must be unwrapped
  first (and wrapped on write);
- a minimal Schema Registry REST client (register/fetch by subject).
"""

from __future__ import annotations

import json
from typing import Any, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PRIMITIVES = {
    bool: "boolean",  # must precede int: bool is an int subclass
    int: "long",
    float: "double",
    str: "string",
    bytes: "bytes",
    bytearray: "bytes",
}


def _infer_field(name: str, value: Any, optional_primitives: bool) -> Any:
    if value is None:
        return "null"
    for py_type, avro_type in _PRIMITIVES.items():
        if isinstance(value, py_type):
            return ["null", avro_type] if optional_primitives else avro_type
    if isinstance(value, dict):
        # nested record reuses the parent field name (reference parity,
        # avroparser.py:39-43)
        return {
            "type": "record",
            "name": name,
            "fields": to_avro_fields(value, optional_primitives),
        }
    if isinstance(value, (list, tuple)):
        item = _infer_field(name, value[0], False) if len(value) else "string"
        return {"type": "array", "items": item}
    raise TypeError(f"cannot infer Avro type for {type(value).__name__}")


def to_avro_fields(record: dict, optional_primitives: bool = False) -> list[dict]:
    return [
        {"name": k, "type": _infer_field(k, v, optional_primitives)}
        for k, v in record.items()
    ]


def create_schema_from_record(
    name: str,
    record: Any,
    namespace: Optional[str] = None,
    optional_primitives: bool = False,
) -> dict:
    """Infer an Avro schema from one Python record (reference parity:
    create_schema_from_record, avroparser.py:59-105). Top-level non-dict
    values produce a bare primitive schema, like the reference."""
    if isinstance(record, dict):
        schema: dict[str, Any] = {
            "type": "record",
            "name": name,
            "fields": to_avro_fields(record, optional_primitives),
        }
    else:
        schema = {"type": _infer_field(name, record, optional_primitives), "name": name}
    if namespace:
        schema["namespace"] = namespace
    return schema


# ---------------------------------------------------------------------------
# Avro JSON ↔ Spark StructType
# ---------------------------------------------------------------------------
_AVRO_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}
_SPARK_TO_AVRO = {
    T.NullType(): "null",
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.BinaryType(): "bytes",
}


def avro_to_spark_type(avro: Any) -> tuple[T.DataType, bool]:
    """Avro type → (Spark type, nullable)."""
    if isinstance(avro, str):
        return _AVRO_TO_SPARK[avro], avro == "null"
    if isinstance(avro, list):  # union — only ["null", T] supported (parity)
        non_null = [a for a in avro if a != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only nullable unions supported, got {avro}")
        inner, _ = avro_to_spark_type(non_null[0])
        return inner, True
    if isinstance(avro, dict):
        kind = avro["type"]
        if kind == "record":
            fields = []
            for f in avro["fields"]:
                dtype, nullable = avro_to_spark_type(f["type"])
                fields.append(T.StructField(f["name"], dtype, nullable))
            return T.StructType(fields), False
        if kind == "array":
            item, item_null = avro_to_spark_type(avro["items"])
            return T.ArrayType(item, containsNull=item_null), False
        if kind == "map":
            val, val_null = avro_to_spark_type(avro["values"])
            return T.MapType(T.StringType(), val, valueContainsNull=val_null), False
        return avro_to_spark_type(kind)
    raise ValueError(f"unsupported Avro schema node: {avro!r}")


def spark_type_to_avro(dtype: T.DataType, nullable: bool = False, name: str = "value") -> Any:
    if isinstance(dtype, T.StructType):
        out: Any = {
            "type": "record",
            "name": name,
            "fields": [
                {
                    "name": f.name,
                    "type": spark_type_to_avro(f.dataType, f.nullable, f.name),
                }
                for f in dtype.fields
            ],
        }
    elif isinstance(dtype, T.ArrayType):
        out = {
            "type": "array",
            "items": spark_type_to_avro(dtype.elementType, dtype.containsNull, name),
        }
    elif isinstance(dtype, T.MapType):
        out = {
            "type": "map",
            "values": spark_type_to_avro(dtype.valueType, dtype.valueContainsNull, name),
        }
    else:
        try:
            out = _SPARK_TO_AVRO[dtype]
        except KeyError:
            raise ValueError(f"no Avro mapping for Spark type {dtype}") from None
    if nullable and out != "null" and not isinstance(out, list):
        return ["null", out]
    return out


# ---------------------------------------------------------------------------
# Confluent wire format: 0x00 magic + 4-byte BE schema id + avro payload
# ---------------------------------------------------------------------------
def unwrap_confluent(value: Column) -> Column:
    """Strip the 5-byte Confluent header → raw Avro payload (binary)."""
    return value.substr(F.lit(6), F.octet_length(value) - 5)


def confluent_schema_id(value: Column) -> Column:
    """Extract the 4-byte big-endian schema id from a framed message."""
    b = lambda i: F.conv(F.hex(value.substr(i, 1)), 16, 10).cast("long")  # noqa: E731
    return (b(2) * 16777216 + b(3) * 65536 + b(4) * 256 + b(5)).alias("schema_id")


def wrap_confluent(payload: Column, schema_id: int) -> Column:
    """Frame a raw Avro payload with magic byte + schema id."""
    header = bytes([0]) + int(schema_id).to_bytes(4, "big")
    return F.concat(F.lit(header), payload)


class SchemaRegistryClient:
    """Minimal Confluent Schema Registry REST client (register/fetch).
    Kept dependency-free (urllib); subjects follow the `<topic>-key` /
    `<topic>-value` convention the reference uses."""

    def __init__(self, url: str):
        self.url = url.rstrip("/")

    def register(self, subject: str, schema: dict) -> int:
        import urllib.request

        req = urllib.request.Request(
            f"{self.url}/subjects/{subject}/versions",
            data=json.dumps({"schema": json.dumps(schema)}).encode(),
            headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
        )
        with urllib.request.urlopen(req) as resp:
            return json.load(resp)["id"]

    def get_latest(self, subject: str) -> tuple[int, dict]:
        import urllib.request

        with urllib.request.urlopen(
            f"{self.url}/subjects/{subject}/versions/latest"
        ) as resp:
            body = json.load(resp)
        return body["id"], json.loads(body["schema"])


def register_record_schemas(
    client: "SchemaRegistryClient",
    topic: str,
    key: Any,
    value: Any,
    namespace: Optional[str] = None,
) -> tuple[int, int]:
    """First-produce schema registration, reference parity
    (pyconnectsource.py:177-196): infer key/value Avro schemas from the
    first record and register them under the Confluent subject convention
    ``<topic>-key`` / ``<topic>-value``. Returns (key_schema_id,
    value_schema_id) — the ids that go into the Confluent wire framing
    (wrap_confluent). Idempotent server-side: registering an identical
    schema returns the existing id."""
    key_schema = create_schema_from_record("key", key, namespace)
    value_schema = create_schema_from_record("value", value, namespace)
    key_id = client.register(f"{topic}-key", key_schema)
    value_id = client.register(f"{topic}-value", value_schema)
    return key_id, value_id
