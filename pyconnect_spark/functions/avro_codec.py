"""Pure-Python Avro binary codec for the inferred-schema type surface.

The reference serializes every record through Confluent's Avro
serializers; Spark's JVM `from_avro`/`to_avro` needs the spark-avro jar,
which this image lacks — so the engine carries its own codec for the
schema subset `functions/avro.py` can infer:

    null · boolean · int/long (zigzag varint) · float/double (LE IEEE) ·
    string/bytes (length-prefixed) · record · array · map ·
    nullable unions ["null", T]

Encoding follows the Avro 1.x binary spec exactly (verified against
golden byte sequences in tests). `to_avro_py` / `from_avro_py` wrap the
codec as Arrow-batched pandas UDFs so streams can produce/consume
Confluent-framed Avro without the JVM package; when the jar is present,
`streaming/kafka.py`'s JVM path is the fast road.
"""

from __future__ import annotations

import io
import struct
from typing import Any, Callable

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------
def _encode_long(buf: io.BytesIO, n: int) -> None:
    # zigzag then varint (little-endian 7-bit groups)
    z = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _decode_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _encode_bytes(buf: io.BytesIO, b: bytes) -> None:
    _encode_long(buf, len(b))
    buf.write(b)


def _decode_bytes(buf: io.BytesIO) -> bytes:
    n = _decode_long(buf)
    return buf.read(n)


# ---------------------------------------------------------------------------
# schema-directed encode/decode
# ---------------------------------------------------------------------------
def _unwrap(schema: Any) -> Any:
    """{"type": "string", "name": ...} wrapper form → bare "string"
    (create_schema_from_record emits this for scalar top-level schemas)."""
    if (
        isinstance(schema, dict)
        and isinstance(schema.get("type"), (str, list))
        and schema["type"] not in ("record", "array", "map")
    ):
        return schema["type"]
    return schema


def encode(value: Any, schema: Any, buf: io.BytesIO | None = None) -> bytes:
    """Encode a Python value under an Avro schema (JSON-object form)."""
    schema = _unwrap(schema)
    out = buf or io.BytesIO()
    if isinstance(schema, list):  # union — nullable only, like inference
        # pandas renders a null in a numeric struct field as NaN (int64 →
        # float64 coercion inside the Arrow batch), so NaN in a union
        # position means SQL NULL, not the IEEE value.
        if value is None or (isinstance(value, float) and value != value):
            idx = schema.index("null")
            _encode_long(out, idx)
        else:
            idx = next(i for i, s in enumerate(schema) if s != "null")
            _encode_long(out, idx)
            encode(value, schema[idx], out)
    elif schema == "null":
        pass
    elif schema == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif schema in ("int", "long"):
        _encode_long(out, int(value))
    elif schema == "float":
        out.write(struct.pack("<f", float(value)))
    elif schema == "double":
        out.write(struct.pack("<d", float(value)))
    elif schema == "string":
        _encode_bytes(out, str(value).encode("utf-8"))
    elif schema == "bytes":
        _encode_bytes(out, bytes(value))
    elif isinstance(schema, dict) and schema["type"] == "record":
        for field in schema["fields"]:
            encode(value[field["name"]], field["type"], out)
    elif isinstance(schema, dict) and schema["type"] == "array":
        items = list(value)
        if items:
            _encode_long(out, len(items))
            for item in items:
                encode(item, schema["items"], out)
        _encode_long(out, 0)
    elif isinstance(schema, dict) and schema["type"] == "map":
        entries = dict(value)
        if entries:
            _encode_long(out, len(entries))
            for k, v in entries.items():
                _encode_bytes(out, str(k).encode("utf-8"))
                encode(v, schema["values"], out)
        _encode_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro schema node: {schema!r}")
    if buf is None:
        return out.getvalue()
    return b""


def decode(data: bytes | io.BytesIO, schema: Any) -> Any:
    schema = _unwrap(schema)
    buf = data if isinstance(data, io.BytesIO) else io.BytesIO(data)
    if isinstance(schema, list):
        idx = _decode_long(buf)
        return decode(buf, schema[idx])
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _decode_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "string":
        return _decode_bytes(buf).decode("utf-8")
    if schema == "bytes":
        return _decode_bytes(buf)
    if isinstance(schema, dict) and schema["type"] == "record":
        return {f["name"]: decode(buf, f["type"]) for f in schema["fields"]}
    if isinstance(schema, dict) and schema["type"] == "array":
        out = []
        while True:
            n = _decode_long(buf)
            if n == 0:
                return out
            if n < 0:  # negative count: a byte-size prefix follows
                _decode_long(buf)
                n = -n
            for _ in range(n):
                out.append(decode(buf, schema["items"]))
    if isinstance(schema, dict) and schema["type"] == "map":
        out = {}
        while True:
            n = _decode_long(buf)
            if n == 0:
                return out
            if n < 0:
                _decode_long(buf)
                n = -n
            for _ in range(n):
                k = _decode_bytes(buf).decode("utf-8")
                out[k] = decode(buf, schema["values"])
    raise ValueError(f"unsupported Avro schema node: {schema!r}")


# ---------------------------------------------------------------------------
# column-level wrappers (Arrow-batched; Confluent framing optional)
# ---------------------------------------------------------------------------
def to_avro_py(col: Column, schema: dict, *, schema_id: int | None = None) -> Column:
    """struct/primitive column → Avro binary (optionally Confluent-framed).
    Rows arrive as pandas objects (dict-shaped for structs)."""
    header = b"" if schema_id is None else bytes([0]) + int(schema_id).to_bytes(4, "big")

    @F.pandas_udf("binary")
    def enc(s: pd.Series) -> pd.Series:  # struct input still arrives as a DataFrame
        # a struct column arrives as a pandas DataFrame (one column per
        # field); primitives arrive as a Series
        if isinstance(s, pd.DataFrame):
            rows = s.to_dict("records")
        else:
            rows = s.tolist()
        return pd.Series([header + encode(v, schema) for v in rows])

    return enc(col)


def from_avro_py(
    col: Column, schema: dict, spark_type: str, *, confluent_framed: bool = False
) -> Column:
    """Avro binary column → typed column (``spark_type`` is the DDL string
    for the decoded shape, e.g. ``"struct<a:string,b:bigint>"``)."""

    returns_struct = spark_type.strip().lower().startswith("struct")

    @F.pandas_udf(spark_type)
    def dec(s: pd.Series) -> pd.Series:  # runtime returns a DataFrame for structs
        values = [
            decode(bytes(b)[5:] if confluent_framed else bytes(b), schema) for b in s
        ]
        if returns_struct:
            return pd.DataFrame(values)  # struct output = DataFrame of fields
        return pd.Series(values)

    return dec(col)
