"""$schema-driven entry point (src/json-schema.lisp:20-38) and the
remote-$ref fetch branch (src/reference.lisp:43-56, 349-380) — the
latter against a localhost HTTP fixture, the pytest analogue of the
reference's Flask fixture server (.travis.yml:30-38)."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from json_schema_spark.metaschema import (
    DEFAULT_DRAFT,
    draft_for_uri,
    metaschema_validator,
    validate,
)
from json_schema_spark.pyvalidator import Validator
from json_schema_spark.spec import SpecError, SpecRegistry

# ---------------------------------------------------------------------------
# $schema auto-resolution
# ---------------------------------------------------------------------------

URI_CASES = [
    ("http://json-schema.org/draft-04/schema#", "draft4"),
    ("http://json-schema.org/draft-06/schema#", "draft6"),
    ("http://json-schema.org/draft-07/schema#", "draft7"),
    ("https://json-schema.org/draft/2019-09/schema", "draft2019-09"),
    ("http://json-schema.org/draft-03/schema#", "draft3"),
    # scheme and trailing-slash insensitive
    ("https://json-schema.org/draft-07/schema", "draft7"),
]


@pytest.mark.parametrize("uri,draft", URI_CASES)
def test_schema_uri_to_draft(uri, draft):
    assert draft_for_uri(uri) == draft


def test_unknown_schema_uri_rejected():
    with pytest.raises(SpecError):
        draft_for_uri("https://example.com/my-schema")


@pytest.mark.parametrize("uri,draft", URI_CASES[:4])
def test_document_self_validates_against_its_metaschema(uri, draft):
    """validate(data) with only a $schema key: the document is checked
    against the vendored meta-schema for that draft."""
    ok, errs = validate({"$schema": uri, "type": "string", "minLength": 1})
    assert ok, [e.pretty() for e in errs]
    # structurally invalid schema documents are rejected
    ok_bad, errs_bad = validate({"$schema": uri, "type": 123})
    assert not ok_bad and errs_bad


def test_metaschema_2019_vocab_refs_resolve_locally():
    """The 2019-09 meta-schema $refs its meta/* vocabulary documents;
    all are vendored and pre-registered — no network."""
    v = metaschema_validator("draft2019-09")
    ok, _ = v.validate({"minLength": 1})
    assert ok
    ok2, _ = v.validate({"minLength": -1})  # validation vocab: >= 0
    assert not ok2


def test_explicit_draft_overrides_schema_uri():
    # draft4-only boolean exclusiveMinimum: valid under draft4 table,
    # schema-form under draft6+ would ignore the boolean
    schema = {"$schema": "http://json-schema.org/draft-06/schema#",
              "minimum": 1, "exclusiveMinimum": True}
    ok_d4, _ = validate(1, schema=schema, draft="draft4")
    assert not ok_d4  # boundary excluded under draft4 semantics
    ok_d6, _ = validate(1, schema=schema)  # draft inferred = draft6
    assert ok_d6  # bool exclusiveMinimum not in draft6 numeric form -> ignored


def test_validate_requires_schema_or_schema_key():
    with pytest.raises(SpecError):
        validate({"type": "string"})  # no $schema, no schema argument
    assert DEFAULT_DRAFT == "draft7"  # *schema-version* default


# ---------------------------------------------------------------------------
# remote $ref fixture (fetch branch + cache + kill switch)
# ---------------------------------------------------------------------------

REMOTE_DOC = {"$id": "http://localhost:0/pos.json", "minimum": 0}


class _Handler(http.server.BaseHTTPRequestHandler):
    hits = 0

    def do_GET(self):  # noqa: N802 (stdlib naming)
        type(self).hits += 1
        body = json.dumps({"minimum": 0}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def fixture_server():
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _Handler.hits = 0
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_remote_ref_disabled_by_default(fixture_server):
    """Kill-switch parity: *resolve-remote-references* defaults nil
    (src/reference.lisp:43-56) — a remote $ref must error, not fetch."""
    reg = SpecRegistry(root={"draft": "draft7"})
    with pytest.raises(SpecError, match="remote resolution disabled"):
        reg.resolve(f"{fixture_server}/pos.json")
    assert _Handler.hits == 0


def test_remote_ref_fetches_and_caches_when_enabled(fixture_server):
    reg = SpecRegistry(root={"draft": "draft7"}, resolve_remote=True)
    doc = reg.resolve(f"{fixture_server}/pos.json")
    assert doc == {"minimum": 0}
    assert _Handler.hits == 1
    # second resolve hits the registry cache, not the network
    doc2 = reg.resolve(f"{fixture_server}/pos.json")
    assert doc2 == {"minimum": 0}
    assert _Handler.hits == 1


def test_remote_ref_through_validator(fixture_server):
    """End-to-end: a schema whose $ref crosses documents over HTTP."""
    schema = {"$ref": f"{fixture_server}/pos.json"}
    reg = SpecRegistry(root=schema, resolve_remote=True)
    v = Validator(schema, draft="draft7", registry=reg)
    assert v.is_valid(3)
    assert not v.is_valid(-3)
