"""Config-layer and Avro-inference parity tests.

Mirrors the reference's test coverage: env-var loading
(test/test_config.py:11-24), sanity checks (:112-160), secret hashing
(test/test_core.py:7-33), and the all-types Avro schema golden record
(test/test_avroparser.py:7-85)."""

from __future__ import annotations

import json

import pytest

from pyconnect_spark.config import (
    BaseConfig,
    SinkConfig,
    SourceConfig,
    csv_list,
    hide_sensitive_values,
    parse_timedelta,
)
from pyconnect_spark.functions import avro as A


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------
def test_parse_timedelta():
    td = parse_timedelta("1h 30m")
    assert td.total_seconds() == 5400
    assert parse_timedelta("2d").days == 2
    assert parse_timedelta(90).total_seconds() == 90
    with pytest.raises(ValueError):
        parse_timedelta("soon")


def test_csv_list():
    assert csv_list("a, b ,c") == ["a", "b", "c"]
    assert csv_list(["x"]) == ["x"]


def test_base_config_defaults_and_sanity():
    cfg = BaseConfig(bootstrap_servers="broker1:9092,broker2:9092")
    assert cfg.bootstrap_servers == ["broker1:9092", "broker2:9092"]
    assert cfg.offset_commit_interval.total_seconds() == 1800  # 30m default
    assert cfg.sink_commit_retry_count == 2
    with pytest.raises(ValueError):
        BaseConfig(bootstrap_servers="b:9092", offset_commit_interval="0s")
    with pytest.raises(ValueError):
        BaseConfig(bootstrap_servers="b:9092", schema_registry="not-a-url")


def test_env_loading(monkeypatch):
    monkeypatch.setenv("PYCONNECT_BOOTSTRAP_SERVERS", "env:9092")
    monkeypatch.setenv("PYCONNECT_SINK_COMMIT_RETRY_COUNT", "5")
    cfg = BaseConfig.from_env_variables()
    assert cfg.bootstrap_servers == ["env:9092"]
    assert cfg.sink_commit_retry_count == 5


def test_json_yaml_loading(tmp_path):
    data = {"bootstrap_servers": "j:9092", "offset_commit_interval": "15m"}
    jf = tmp_path / "c.json"
    jf.write_text(json.dumps(data))
    assert BaseConfig.from_json_file(str(jf)).offset_commit_interval.total_seconds() == 900
    yf = tmp_path / "c.yaml"
    yf.write_text("bootstrap_servers: y:9092\noffset_commit_interval: 45m\n")
    assert BaseConfig.from_yaml_file(str(yf)).bootstrap_servers == ["y:9092"]
    assert BaseConfig.from_json_string(json.dumps(data)).bootstrap_servers == ["j:9092"]


def test_sink_source_configs():
    sink = SinkConfig(bootstrap_servers="b:9092", topics="t1,t2", poll_timeout="5s")
    assert sink.topics == ["t1", "t2"]
    assert sink.poll_timeout.total_seconds() == 5
    src = SourceConfig(bootstrap_servers="b:9092", topic="t", offset_topic="t-off")
    assert src.offset_topic == "t-off"


def test_secret_redaction():
    """Mirrors the reference's hide_sensitive_values contract
    (test_core.py:7-33): the hashed form is self-verifiable (the logged
    string carries algo/salt/iterations and recomputing PBKDF2 matches),
    the salt is per-call (equal secrets differ across calls — no
    cross-log correlation), and the non-hash mode yields '****'."""
    import hashlib
    import re

    cfg = {"sasl.password": "hunter2", "other": "keep"}
    red = hide_sensitive_values(cfg)
    assert red["other"] == "keep"
    assert "hunter2" not in str(red["sasl.password"])
    m = re.match(
        r"\$pbkdf2-(?P<algo>[^:]+):(?P<salt>[0-9a-f]+):(?P<iters>\d+)\$(?P<hash>[0-9a-f]+)",
        red["sasl.password"],
    )
    assert m, red["sasl.password"]
    recomputed = hashlib.pbkdf2_hmac(
        m["algo"], b"hunter2", bytes.fromhex(m["salt"]), int(m["iters"])
    )
    assert recomputed.hex() == m["hash"]
    # per-call salt: a second call must NOT produce the same digest
    assert hide_sensitive_values(cfg)["sasl.password"] != red["sasl.password"]
    # obfuscation mode
    hidden = hide_sensitive_values(cfg, hash_sensitive_values=False)
    assert hidden["sasl.password"] == "****" and hidden["other"] == "keep"
    # non-sensitive-only config passes through untouched
    plain = {"regular": "value"}
    assert hide_sensitive_values(plain) == plain


def test_csv_line_reader_quotes_escapes_strips():
    """Reference parity for the quote/escape/strip line parser
    (config.py:235-280 doctest semantics)."""
    from pyconnect_spark.config import csv_line_reader

    reader = csv_line_reader()
    line = r'"quoted,field",escaped\,field, stripped field ," quoted \" escaped field"'
    assert reader(line) == [
        "quoted,field",
        "escaped,field",
        "stripped field",
        'quoted " escaped field',
    ]
    assert reader("") == []
    assert reader("a,,b") == ["a", "", "b"]
    assert reader("trailing\\") == ["trailing"]  # dangling escaper swallowed
    # quoting does not protect from stripping (documented caveat)
    assert reader('" here I ",am') == ["here I", "am"]
    # custom separator/quoter
    assert csv_line_reader(separator=";", quoter="'")("'a;b';c") == ["a;b", "c"]


def test_csv_list_is_quote_aware():
    assert csv_list('"a,b",c') == ["a,b", "c"]
    assert csv_list("a, b ,c,") == ["a", "b", "c"]


# ---------------------------------------------------------------------------
# avro inference — golden record parity (test_avroparser.py fixture)
# ---------------------------------------------------------------------------
ALL_FIELD_RECORD = {
    "fint": 1,
    "fnull": None,
    "ffloat": 1.0,
    "flong": 123456789101112131415,
    "fdouble": 2.0,
    "fstring": "hi there",
    "fobj": {"fobjint": 2, "fobjstr": "hello there"},
}


def test_infer_all_types():
    schema = A.create_schema_from_record("value", ALL_FIELD_RECORD)
    fields = {f["name"]: f["type"] for f in schema["fields"]}
    assert fields["fint"] == "long"
    assert fields["fnull"] == "null"
    assert fields["ffloat"] == "double"
    assert fields["flong"] == "long"
    assert fields["fstring"] == "string"
    assert fields["fobj"]["type"] == "record"
    assert fields["fobj"]["name"] == "fobj"  # child record reuses field name
    nested = {f["name"]: f["type"] for f in fields["fobj"]["fields"]}
    assert nested == {"fobjint": "long", "fobjstr": "string"}


def test_infer_optional_primitives():
    schema = A.create_schema_from_record("value", ALL_FIELD_RECORD, optional_primitives=True)
    fields = {f["name"]: f["type"] for f in schema["fields"]}
    assert fields["fint"] == ["null", "long"]
    assert fields["fstring"] == ["null", "string"]
    assert fields["fnull"] == "null"  # null stays bare
    # nested primitives optional too (reference behavior)
    nested = {f["name"]: f["type"] for f in fields["fobj"]["fields"]}
    assert nested["fobjint"] == ["null", "long"]


def test_infer_scalar_and_namespace():
    s = A.create_schema_from_record("key", "some-key", namespace="ns")
    assert s["type"] == "string" and s["namespace"] == "ns"
    assert A.create_schema_from_record("key", 7)["type"] == "long"
    assert A.create_schema_from_record("key", b"x")["type"] == "bytes"


def test_infer_list_items():
    # deliberate fix vs the reference's hardcoded string items
    s = A.create_schema_from_record("value", {"xs": [1, 2, 3]})
    assert s["fields"][0]["type"] == {"type": "array", "items": "long"}
    s2 = A.create_schema_from_record("value", {"xs": []})
    assert s2["fields"][0]["type"] == {"type": "array", "items": "string"}


def test_avro_spark_roundtrip():
    schema = A.create_schema_from_record("value", ALL_FIELD_RECORD, optional_primitives=True)
    dtype, _ = A.avro_to_spark_type(schema)
    back = A.spark_type_to_avro(dtype, name="value")
    dtype2, _ = A.avro_to_spark_type(back)
    assert dtype == dtype2


# ---------------------------------------------------------------------------
# confluent wire format (column-level, checked via a tiny DataFrame)
# ---------------------------------------------------------------------------
def test_confluent_framing(spark):
    from pyspark.sql import functions as F

    payload = b"\x10avro-bytes"
    df = spark.createDataFrame([(payload,)], "payload binary")
    framed = df.select(A.wrap_confluent(F.col("payload"), 1234).alias("v"))
    [row] = framed.collect()
    assert row["v"][:1] == b"\x00"
    assert int.from_bytes(row["v"][1:5], "big") == 1234
    back = framed.select(
        A.unwrap_confluent(F.col("v")).alias("p"),
        A.confluent_schema_id(F.col("v")).alias("sid"),
    ).collect()[0]
    assert bytes(back["p"]) == payload
    assert back["sid"] == 1234


# ---------------------------------------------------------------------------
# logging unification (R22 parity)
# ---------------------------------------------------------------------------
def test_configure_logging_json(capsys):
    import json as _json
    import logging

    from pyconnect_spark.logging_util import configure_logging

    root = configure_logging(json_output=True, capture_excepthook=False)
    logging.getLogger("pc.test").info("hello %s", "world")
    err = capsys.readouterr().err.strip().splitlines()[-1]
    payload = _json.loads(err)
    assert payload["message"] == "hello world"
    assert payload["level"] == "INFO"
    for h in list(root.handlers):
        root.removeHandler(h)


# ---------------------------------------------------------------------------
# sanity mini-expressions (whitelisted-AST eval; reference test_config.py:44-160)
# ---------------------------------------------------------------------------
def test_sanity_expressions():
    from pyconnect_spark.config import check_sanity

    assert check_sanity("{x} > 0 and {x} < 10", {"x": 5})
    assert not check_sanity("{x} > 0", {"x": -1})
    assert check_sanity("{t} >= 1800", {"t": __import__("datetime").timedelta(minutes=30)})
    assert check_sanity("{name} == 'abc'", {"name": "abc"})


def test_sanity_eval_injection_resistance():
    """Mirror of the reference's eval-injection tests: code-bearing
    expressions must be rejected before evaluation."""
    from pyconnect_spark.config import SanityError, check_sanity

    hostile = [
        "__import__('os').system('id')",
        "(1).__class__.__mro__",
        "open('/etc/passwd')",
        "[x for x in (1,)]",
        "(lambda: 1)()",
        "a if True else b",
        "{x}.__class__",
    ]
    for expr in hostile:
        with pytest.raises(SanityError):
            check_sanity(expr, {"x": 1})


def test_sanity_check_in_sink_config():
    with pytest.raises(ValueError):
        SinkConfig(bootstrap_servers="b:9092", topics="t", poll_timeout="0s")


def test_csv_line_reader_reference_golden():
    """The reference's own csv_line_reader and host-splitting cases
    (test_config.py:78-112), verbatim inputs."""
    from pyconnect_spark.config import SinkConfig, csv_line_reader

    line = (
        'localhost,otherhost:1234/asdf, "yetanotherhost/blubb",'
        " there-is-more/where/that/came%20/from "
    )
    assert csv_line_reader()(line) == [
        "localhost",
        "otherhost:1234/asdf",
        "yetanotherhost/blubb",
        "there-is-more/where/that/came%20/from",
    ]
    servers = (
        'localhost,otherhost:1234/asdf, "user:pw@yetanotherhost/blubb",'
        " there-is-more/where/that/came%20/from?blah=blubb&foo=bar "
    )
    cfg = SinkConfig(
        bootstrap_servers=servers, topic="topics", group_id="groupid"
    )
    assert cfg.bootstrap_servers == [
        "localhost",
        "otherhost:1234/asdf",
        "user:pw@yetanotherhost/blubb",
        "there-is-more/where/that/came%20/from?blah=blubb&foo=bar",
    ]
