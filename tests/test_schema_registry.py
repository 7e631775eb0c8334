"""Schema Registry round-trip:

1. loopback suite (always runs): an in-process HTTP server implements the
   two Confluent endpoints the client uses, so the REAL urllib request
   path — headers, JSON envelope, subject naming, id round-trip — is
   exercised without any external service;
2. real-registry suite (opt-in): set PYCONNECT_SCHEMA_REGISTRY to a live
   registry URL (the reference's docker-compose.yml brings one up) and
   the same scenarios run against it, mirroring the reference's
   first-produce registration (pyconnectsource.py:177-196).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from pyconnect_spark.functions.avro import (
    SchemaRegistryClient,
    create_schema_from_record,
    register_record_schemas,
)

REAL_URL = os.environ.get("PYCONNECT_SCHEMA_REGISTRY", "")


class _FakeRegistryHandler(BaseHTTPRequestHandler):
    """Minimal Confluent registry: register returns a stable id per unique
    schema; latest returns the last registered version for the subject."""

    store: dict[str, list[tuple[int, str]]] = {}
    ids: dict[str, int] = {}

    def log_message(self, *a):  # silence
        pass

    def do_POST(self):
        # /subjects/<subject>/versions
        subject = self.path.split("/")[2]
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        schema_str = body["schema"]
        if self.headers["Content-Type"] != "application/vnd.schemaregistry.v1+json":
            self.send_response(415)
            self.end_headers()
            return
        if schema_str not in self.ids:
            self.ids[schema_str] = len(self.ids) + 1
        sid = self.ids[schema_str]
        self.store.setdefault(subject, [])
        if not any(s == schema_str for _, s in self.store[subject]):
            self.store[subject].append((sid, schema_str))
        self.send_response(200)
        self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
        self.end_headers()
        self.wfile.write(json.dumps({"id": sid}).encode())

    def do_GET(self):
        # /subjects/<subject>/versions/latest
        subject = self.path.split("/")[2]
        versions = self.store.get(subject)
        if not versions:
            self.send_response(404)
            self.end_headers()
            return
        sid, schema_str = versions[-1]
        self.send_response(200)
        self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
        self.end_headers()
        self.wfile.write(
            json.dumps({"id": sid, "version": len(versions), "schema": schema_str}).encode()
        )


@pytest.fixture()
def loopback_registry():
    _FakeRegistryHandler.store = {}
    _FakeRegistryHandler.ids = {}
    srv = HTTPServer(("127.0.0.1", 0), _FakeRegistryHandler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()


RECORD_KEY = "K0001"
RECORD_VALUE = {"a": "hello", "b": 42, "nested": {"x": 1.5}}


def _roundtrip_scenarios(url):
    client = SchemaRegistryClient(url)
    # 1. first-produce registration: key + value subjects, inferred schemas
    key_id, value_id = register_record_schemas(client, "pc-topic", RECORD_KEY, RECORD_VALUE)
    assert key_id > 0 and value_id > 0 and key_id != value_id

    # 2. fetch-latest returns what registration inferred
    got_key_id, key_schema = client.get_latest("pc-topic-key")
    got_value_id, value_schema = client.get_latest("pc-topic-value")
    assert (got_key_id, got_value_id) == (key_id, value_id)
    assert key_schema == create_schema_from_record("key", RECORD_KEY)
    assert value_schema == create_schema_from_record("value", RECORD_VALUE)
    assert value_schema["type"] == "record"
    assert {f["name"] for f in value_schema["fields"]} == {"a", "b", "nested"}

    # 3. idempotent re-registration: same schema → same id
    again_key, again_value = register_record_schemas(client, "pc-topic", RECORD_KEY, RECORD_VALUE)
    assert (again_key, again_value) == (key_id, value_id)

    # 4. schema evolution: a new field gets a NEW id, latest moves forward
    evolved = dict(RECORD_VALUE, extra="new-field")
    _, evolved_id = register_record_schemas(client, "pc-topic", RECORD_KEY, evolved)
    assert evolved_id != value_id
    latest_id, latest_schema = client.get_latest("pc-topic-value")
    assert latest_id == evolved_id
    assert {f["name"] for f in latest_schema["fields"]} >= {"a", "b", "nested", "extra"}


def test_registry_roundtrip_loopback(loopback_registry):
    _roundtrip_scenarios(loopback_registry)


@pytest.mark.integration
def test_registry_roundtrip_real():
    if not REAL_URL:
        pytest.skip("no registry: set PYCONNECT_SCHEMA_REGISTRY=http://host:8081")
    _roundtrip_scenarios(REAL_URL)
