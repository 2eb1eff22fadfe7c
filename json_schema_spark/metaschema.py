"""$schema-driven validation entry point (src/json-schema.lisp:20-38).

The reference's top-level ``validate`` resolves a document's own
``$schema`` URI — fetching the meta-schema remotely — and validates the
document against it with the draft that URI implies.  Here the four
supported meta-schemas (plus draft3, the reference's format-only draft)
are VENDORED under ``resources/metaschemas/`` (sourced from the public
jsonschema-specifications distribution), so resolution is purely local:
remote fetch stays off, matching the ``*resolve-remote-references*``
nil default (src/reference.lisp:43-56).

Draft enum mirrors json-schema.utils:schema-version
(src/utils.lisp:22-27): draft2019-09 / draft7 / draft6 / draft4 /
draft3.
"""

from __future__ import annotations

import json
import urllib.parse
from functools import lru_cache
from pathlib import Path
from typing import Any

from json_schema_spark.pyvalidator import ValidationError, Validator
from json_schema_spark.spec import SpecError, SpecRegistry

_RES = Path(__file__).resolve().parent / "resources" / "metaschemas"

DEFAULT_DRAFT = "draft7"  # *schema-version* default (json-schema.lisp:17)

# canonical meta-schema URI -> draft (normalized: scheme-insensitive,
# fragment-stripped). Mirrors the reference's mapping of $schema values
# onto its schema-version enum.
_URI_DRAFTS = {
    "json-schema.org/draft-03/schema": "draft3",
    "json-schema.org/draft-04/schema": "draft4",
    "json-schema.org/draft-06/schema": "draft6",
    "json-schema.org/draft-07/schema": "draft7",
    "json-schema.org/draft/2019-09/schema": "draft2019-09",
}


def draft_for_uri(uri: str) -> str:
    """Map a ``$schema`` URI to a draft name (src/utils.lisp:22-27
    enum). Raises SpecError for URIs outside the supported set."""
    split = urllib.parse.urlsplit(uri.strip())
    key = (split.netloc + split.path).rstrip("/")
    draft = _URI_DRAFTS.get(key)
    if draft is None:
        raise SpecError(f"unsupported $schema URI {uri!r}")
    return draft


@lru_cache(maxsize=None)
def metaschema(draft: str) -> dict:
    """The vendored meta-schema document for a draft."""
    path = _RES / f"{draft}.json"
    if not path.exists():
        raise SpecError(f"no vendored meta-schema for draft {draft!r}")
    return json.loads(path.read_text())


@lru_cache(maxsize=None)
def metaschema_validator(draft: str) -> Validator:
    """A Validator for 'is this document a valid <draft> schema?' —
    the meta-schema compiled with all its vocabulary documents
    pre-registered (2019-09 splits itself across meta/* docs)."""
    doc = metaschema(draft)
    v = Validator(doc, draft=draft)
    if draft == "draft2019-09":
        vocab_dir = _RES / "draft2019-09-vocab"
        for f in sorted(vocab_dir.iterdir()):
            vocab = json.loads(f.read_text())
            v.registry.add_document(vocab["$id"], vocab)
    return v


def validate(
    data: Any,
    schema: Any = None,
    draft: str | None = None,
) -> tuple[bool, list[ValidationError]]:
    """Primary validation entry point, mirroring json-schema:validate
    (src/json-schema.lisp:20-38):

    * ``schema`` given: validate ``data`` against it.  The draft comes
      from (in order) the explicit ``draft`` argument, the schema's own
      ``$schema`` URI, or the draft7 default.
    * no ``schema``: the document's own top-level ``$schema`` picks the
      meta-schema — i.e. ``data`` is itself a schema being checked for
      validity — resolved from the vendored local copies (remote fetch
      stays off).
    """
    if schema is not None:
        if draft is None and isinstance(schema, dict) and "$schema" in schema:
            draft = draft_for_uri(schema["$schema"])
        return Validator(schema, draft=draft or DEFAULT_DRAFT).validate(data)

    if not (isinstance(data, dict) and "$schema" in data):
        raise SpecError(
            "no schema given and the document has no $schema key "
            "(json-schema.lisp:26-31 requires one or the other)"
        )
    meta_draft = draft or draft_for_uri(data["$schema"])
    return metaschema_validator(meta_draft).validate(data)
