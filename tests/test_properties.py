"""Property-based tests (hypothesis) for the pure-Python layers: Avro
inference totality/validity, config parsers, and wire framing."""

from __future__ import annotations

import datetime
import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pyconnect_spark.config import csv_list, parse_timedelta
from pyconnect_spark.functions import avro as A

# JSON-ish records: primitives, nested dicts, homogeneous-ish lists
_prims = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(string.printable, max_size=20),
    st.binary(max_size="20".__len__() * 10),
)
_field_names = st.text(string.ascii_lowercase, min_size=1, max_size=8)
_records = st.recursive(
    _prims,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(_field_names, inner, min_size=1, max_size=4),
    ),
    max_leaves=10,
)


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(_field_names, _records, min_size=1, max_size=5), st.booleans())
def test_inference_total_and_json_serializable(record, optional):
    """Inference never crashes on JSON-shaped records and always yields a
    JSON-serializable schema whose field set matches the record."""
    schema = A.create_schema_from_record("value", record, optional_primitives=optional)
    json.dumps(schema)
    assert schema["type"] == "record"
    assert [f["name"] for f in schema["fields"]] == list(record.keys())


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(_field_names, _prims, min_size=1, max_size=5))
def test_inference_roundtrips_through_spark_types(record):
    """primitive records: Avro → StructType → Avro is a fixed point."""
    schema = A.create_schema_from_record("value", record, optional_primitives=True)
    dtype, _ = A.avro_to_spark_type(schema)
    back = A.spark_type_to_avro(dtype, name="value")
    dtype2, _ = A.avro_to_spark_type(back)
    assert dtype == dtype2


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.sampled_from(["d", "h", "m", "s", "ms"])),
        min_size=1,
        max_size=4,
    )
)
def test_timedelta_parser_additive(parts):
    s = " ".join(f"{n}{u}" for n, u in parts)
    # exact datetime.timedelta arithmetic — float total_seconds() loses
    # sub-ms precision once the total passes ~1e10 s
    kw = {"d": "days", "h": "hours", "m": "minutes", "s": "seconds", "ms": "milliseconds"}
    expect = sum(
        (datetime.timedelta(**{kw[u]: n}) for n, u in parts), datetime.timedelta()
    )
    assert parse_timedelta(s) == expect


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(string.ascii_letters + string.digits, min_size=1, max_size=8), max_size=6))
def test_csv_list_roundtrip(items):
    assert csv_list(",".join(items)) == items


@given(
    st.lists(
        st.text(string.printable.strip() + " ", min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_csv_line_reader_escape_roundtrip(fields):
    """Encoding ANY field by escaping every escaper/quoter/separator char
    and parsing the joined line recovers the stripped fields — the
    escape mechanism is complete, not just demo-deep."""
    from pyconnect_spark.config import csv_line_reader

    def enc(f: str) -> str:
        out = []
        for ch in f:
            if ch in ('\\', '"', ','):
                out.append('\\')
            out.append(ch)
        return "".join(out)

    line = ",".join(enc(f) for f in fields)
    if line == "":
        # a lone empty field is indistinguishable from an empty line —
        # the format's (and the upstream parser's) documented ambiguity
        assert csv_line_reader()(line) == []
        return
    assert csv_line_reader()(line) == [f.strip("\r\t\n ") for f in fields]


@given(
    st.lists(
        st.tuples(st.booleans(), st.integers(min_value=1, max_value=20)),
        min_size=1,
        max_size=30,
    )
)
def test_fifo_interval_overlap_identity(rows):
    """x71's load-bearing math: 'matched quantity between supply layer i
    and return j = overlap width of their cumulative-coordinate
    intervals' must equal the sequential FIFO consumption loop, for ANY
    interleaving of supplies and returns (clamped to available supply —
    returns beyond total supply are unmatched overhang in both views)."""
    supplies = [q for is_ret, q in rows if not is_ret]
    returns = [q for is_ret, q in rows if is_ret]

    # interval-algebra view (what x71's join computes)
    s_hi, s_intervals = 0, []
    for q in supplies:
        s_intervals.append((s_hi, s_hi + q))
        s_hi += q
    r_hi, r_intervals = 0, []
    for q in returns:
        r_intervals.append((r_hi, r_hi + q))
        r_hi += q
    algebra = {}
    for i, (slo, shi) in enumerate(s_intervals):
        for j, (rlo, rhi) in enumerate(r_intervals):
            w = min(shi, rhi) - max(slo, rlo)
            if w > 0:
                algebra[(i, j)] = w

    # sequential FIFO loop (what a row-at-a-time engine runs)
    seq = {}
    li, left_in_layer = 0, (supplies[0] if supplies else 0)
    for j, need in enumerate(returns):
        while need > 0 and li < len(supplies):
            take = min(need, left_in_layer)
            if take > 0:
                seq[(li, j)] = seq.get((li, j), 0) + take
                need -= take
                left_in_layer -= take
            if left_in_layer == 0:
                li += 1
                left_in_layer = supplies[li] if li < len(supplies) else 0

    assert algebra == seq
