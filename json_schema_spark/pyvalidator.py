"""Reference-parity JSON Schema validator (pure Python) + Arrow UDFs.

This module reproduces the OBSERVABLE semantics of the reference's
recursive core (/root/reference/src/validators.lisp:79-138) for
dynamic-shape JSON documents — the case a typed Spark column cannot
express. It is used in two places only:

1. the pytest conformance suite (JSON-Schema-Test-Suite-format vectors,
   cf. t/json-schema-test-case-helper.lisp:57-96);
2. ``validate_json_udf`` — a vectorized, Arrow-batched pandas UDF that
   validates a JSON-string column per batch. This is the sanctioned
   slow path of SURVEY.md §2.5 ("vectorized pandas_udf for the few
   non-SQL-expressible checks"); the hot path on typed columns stays in
   :mod:`json_schema_spark.compiler`.

Reference semantics preserved (all citations /root/reference/):

* type-gating: inapplicable keywords pass vacuously
  (require-type, src/validators.lisp:35-37);
* error accumulation across ALL keywords (:105-108), nested via
  sub-errors (:16-22, 46-53);
* boolean schemas (:86-91) and empty-schema-valid (:93-94);
* deep equality with numeric ``1 == 1.0`` but ``true != 1``
  (json-equal-p, src/utils.lisp:69-96);
* "anything without a fractional part is an integer" — 1.0 IS an
  integer (src/types.lisp:41-44);
* unknown keywords are skipped (no-validator-condition, :132-135);
* per-draft dispatch tables (:657-808);
* anyOf short-circuits on first success (:281-282).

Known reference NON-conformances we intentionally mirror (so parity is
with the reference, not the abstract spec — FIXTURES.md §4):
* unevaluatedProperties only diffs against direct `properties`
  (:606-629; suite skip t/draft2019-09.lisp:83-87);
* $ref does NOT override sibling keywords in draft<=7 (sibling keywords
  are still applied; suite skip t/draft7.lisp:69-70).
  EXCEPT: we fix the minimum-draft4 exclusiveMinimum bug (:460), which
  the reference's own suite skips (t/draft4.lisp:34-35).
"""

from __future__ import annotations

import functools
import ipaddress
import json
import math
import re
import urllib.parse
from dataclasses import dataclass, field
from typing import Any

from json_schema_spark.spec import SpecRegistry, _id_key

_SENTINEL = object()  # "absent" marker (object-get 2nd value, src/utils.lisp:57-62)


@dataclass
class ValidationError:
    """Mirror of validation-failed-error (src/validators.lisp:15-22)."""

    message: str
    keyword: str = ""
    path: str = ""
    sub_errors: list["ValidationError"] = field(default_factory=list)

    def pretty(self, indent: int = 0) -> str:
        """Nested "Additionally:" rendering (README.rst:70-79)."""
        pad = "  " * indent
        out = f"{pad}{self.message}"
        if self.sub_errors:
            out += f"\n{pad}Additionally:"
            for sub in self.sub_errors:
                out += "\n" + sub.pretty(indent + 1)
        return out

    def to_dict(self) -> dict:
        return {
            "message": self.message,
            "keyword": self.keyword,
            "path": self.path,
            "sub_errors": [s.to_dict() for s in self.sub_errors],
        }


# ---------------------------------------------------------------------------
# JSON type model (src/types.lisp)
# ---------------------------------------------------------------------------

def is_object(v: Any) -> bool:
    return isinstance(v, dict)


def is_array(v: Any) -> bool:
    return isinstance(v, list)


def is_string(v: Any) -> bool:
    return isinstance(v, str)


def is_boolean(v: Any) -> bool:
    return isinstance(v, bool)


def is_number(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def is_integer(v: Any) -> bool:
    """1.0 IS an integer (src/types.lisp:41-44)."""
    if isinstance(v, bool):
        return False
    if isinstance(v, int):
        return True
    if isinstance(v, float):
        return not (math.isnan(v) or math.isinf(v)) and v == int(v)
    return False


_TYPE_PREDICATES = {
    "object": is_object,
    "array": is_array,
    "string": is_string,
    "boolean": is_boolean,
    "number": is_number,
    "integer": is_integer,
    "null": lambda v: v is None,
    "any": lambda v: True,  # draft3
}


def json_equal(a: Any, b: Any) -> bool:
    """Deep equality (json-equal-p, src/utils.lisp:69-96): numeric =
    across int/float, bools only equal bools, recursive for
    arrays/objects."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if is_number(a) and is_number(b):
        return a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(json_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):  # object-equal-p :99-112
        return a.keys() == b.keys() and all(json_equal(a[k], b[k]) for k in a)
    return False


# ---------------------------------------------------------------------------
# format checkers (src/formats.lisp) — python twins of functions/formats.py
# ---------------------------------------------------------------------------

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_TIME_RE = re.compile(r"^(\d{2}):(\d{2}):(\d{2})(\.\d+)?([Zz]|[+-]\d{2}:\d{2})$")
_DATETIME_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[Tt ](\d{2}):(\d{2}):(\d{2})(\.\d+)?([Zz]|[+-]\d{2}:\d{2})$"
)
_DURATION_RE = re.compile(
    r"^P(?!$)(\d+Y)?(\d+M)?(\d+W)?(\d+D)?(T(?=\d)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?$"
)
_HOSTNAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9.\-]{0,254}$")
_URI_REF_RE = re.compile(r"^[A-Za-z0-9\-._~:/?#\[\]@!$&'()*+,;=%]*$")


def _fmt_date(s: str) -> bool:
    if not _DATE_RE.match(s):
        return False
    y, m, d = int(s[0:4]), int(s[5:7]), int(s[8:10])
    try:
        import datetime

        datetime.date(y, m, d)
        return True
    except ValueError:
        return False


def _fmt_time_parts(h: str, mi: str, sec: str) -> bool:
    return int(h) <= 23 and int(mi) <= 59 and int(sec) <= 60


_OFFSET_RE = re.compile(r"[+-](\d{2}):(\d{2})$")


def _fmt_offset_ok(s: str) -> bool:
    # ADVICE r4: the numeric UTC offset is a time-of-day too — RFC 3339
    # time-numoffset is hour<=23 / minute<=59, and the reference's
    # local-time parse rejects out-of-range offsets ('+99:99')
    m = _OFFSET_RE.search(s)
    return m is None or (int(m.group(1)) <= 23 and int(m.group(2)) <= 59)


def _fmt_time(s: str) -> bool:
    m = _TIME_RE.match(s)
    return (bool(m) and _fmt_time_parts(m.group(1), m.group(2), m.group(3))
            and _fmt_offset_ok(s))


def _fmt_date_time(s: str) -> bool:
    m = _DATETIME_RE.match(s)
    if not m or not _fmt_time_parts(m.group(1), m.group(2), m.group(3)):
        return False
    return _fmt_date(s[:10]) and _fmt_offset_ok(s)


def _fmt_hostname(s: str) -> bool:
    # regex + dot-label < 64 + no trailing '-' (src/formats.lisp:48-53)
    return bool(
        _HOSTNAME_RE.match(s)
        and all(len(lbl) < 64 for lbl in s.split("."))
        and not s.endswith("-")
    )


def _fmt_ipv4(s: str) -> bool:
    try:
        ipaddress.IPv4Address(s)
        return True
    except ValueError:
        return False


def _fmt_ipv6(s: str) -> bool:
    # reference's split-parts guard (src/formats.lisp:61-65, the quri
    # PR#34 workaround): '::2:3:4:5:6:7:8' (9 parts) is rejected even
    # though RFC-valid; zone ids ('%eth0') are rejected — quri never
    # accepted them, while Python's ipaddress does
    if len(s.split(":")) > 8 or "%" in s:
        return False
    try:
        ipaddress.IPv6Address(s)
        return True
    except ValueError:
        return False


def _fmt_json_pointer(s: str) -> bool:
    if re.search(r"~(?![01])", s):
        return False
    return s == "" or s.startswith("/")


def _fmt_uri(s: str) -> bool:
    # parses + non-empty scheme (src/formats.lisp:108-113)
    try:
        parts = urllib.parse.urlsplit(s)
    except ValueError:
        return False
    return bool(parts.scheme)


def _fmt_uri_reference(s: str) -> bool:
    return bool(_URI_REF_RE.match(s)) and "\\" not in s


def _fmt_regex(s: str) -> bool:
    try:
        re.compile(s)
        return True
    except re.error:
        return False


def _fmt_time_draft3(s: str) -> bool:
    """Loose draft3 time (src/formats.lisp:87-98): an unanchored
    hh:mm:ss match with hour <= 24."""
    m = re.search(r"([0-2]?\d):([0-5]\d):([0-5]\d)", s)
    return bool(m) and int(m.group(1)) <= 24


_COMMON_FORMATS = {
    "date-time": _fmt_date_time,
    "email": lambda s: "@" in s,  # deliberately loose :43-45
    "idn-email": lambda s: "@" in s,  # alias of emailp (formats.lisp:143,156,172,184,197)
    "hostname": _fmt_hostname,
    "ipv4": _fmt_ipv4,
    "ipv6": _fmt_ipv6,
    "uri": _fmt_uri,
    "regex": _fmt_regex,
}

FORMAT_TABLES = {
    "draft2019-09": {
        **_COMMON_FORMATS,
        "date": _fmt_date,
        "time": _fmt_time,
        "duration": lambda s: bool(_DURATION_RE.match(s)),
        "json-pointer": _fmt_json_pointer,
        "uri-reference": _fmt_uri_reference,
    },
    "draft7": {
        **_COMMON_FORMATS,
        "date": _fmt_date,
        "time": _fmt_time,
        "json-pointer": _fmt_json_pointer,
        "uri-reference": _fmt_uri_reference,
    },
    "draft6": {
        **_COMMON_FORMATS,
        "json-pointer": _fmt_json_pointer,
        "uri-reference": _fmt_uri_reference,
    },
    "draft4": {
        **_COMMON_FORMATS,
        "json-pointer": _fmt_json_pointer,  # formats.lisp:180-189
    },
    # draft3 (formats.lisp:192-204): host-name spelling, loose time,
    # json-pointer + idn-email aliases
    "draft3": {
        "date-time": _fmt_date_time,
        "date": _fmt_date,
        "email": lambda s: "@" in s,
        "idn-email": lambda s: "@" in s,
        "host-name": _fmt_hostname,
        "ipv4": _fmt_ipv4,
        "ipv6": _fmt_ipv6,
        "json-pointer": _fmt_json_pointer,
        "regex": _fmt_regex,
        "time": _fmt_time_draft3,
        "uri": _fmt_uri,
    },
}


# ---------------------------------------------------------------------------
# validator core
# ---------------------------------------------------------------------------

class Validator:
    """Document-x-schema co-recursion (src/validators.lisp:79-138),
    compile-once / validate-many: build one Validator per spec (the
    reference's reusable ``context``) and call :meth:`validate` per
    document."""

    def __init__(self, schema: Any, draft: str = "draft7",
                 registry: SpecRegistry | None = None,
                 strict_unevaluated: bool = False):
        self.schema = schema
        self.draft = draft
        # opt-in full 2019-09 unevaluated* annotation tracking (engine
        # extension; default False = reference parity)
        self.strict_unevaluated = strict_unevaluated
        self.registry = registry or SpecRegistry(root=schema, draft=draft)
        self._base_stack: list[str] = [""]
        if isinstance(schema, dict):
            root_id = _id_key(schema, draft)
            if isinstance(root_id, str):
                self._base_stack = [urllib.parse.urldefrag(root_id)[0]]

    # public API mirroring json-schema:validate (src/json-schema.lisp:20-38)
    def validate(self, data: Any) -> tuple[bool, list[ValidationError]]:
        errors = self._validate(self.schema, data, path="", depth=0)
        return (not errors, errors)

    def is_valid(self, data: Any) -> bool:
        return self.validate(data)[0]

    # ---- core recursion -------------------------------------------------
    def _validate(self, schema: Any, data: Any, path: str, depth: int) -> list[ValidationError]:
        if depth > 100:  # depth cap (src/reference.lisp:35-36,59-66)
            return [ValidationError("$ref/schema recursion depth cap exceeded", "$ref", path)]
        # boolean schema short-circuit (:86-91)
        if schema is True:
            return []
        if schema is False:
            return [ValidationError("schema is false", "false-schema", path)]
        if not isinstance(schema, dict):
            return [ValidationError(f"invalid schema {schema!r}", "schema", path)]
        if not schema:  # empty object always valid (:93-94)
            return []

        # $id context push (:96-103)
        sid = _id_key(schema, self.draft)
        pushed = False
        if isinstance(sid, str) and sid and schema is not self.schema:
            merged = urllib.parse.urljoin(self._base_stack[-1], sid)
            self._base_stack.append(urllib.parse.urldefrag(merged)[0])
            pushed = True
        try:
            errors: list[ValidationError] = []
            for kw, val in schema.items():
                handler = _DISPATCH.get(self.draft, _DISPATCH["draft7"]).get(kw)
                if handler is None:
                    continue  # unknown keyword: warn+skip (:132-135)
                errs = handler(self, schema, val, data, path, depth)
                errors.extend(errs)  # accumulate, don't short-circuit (:107-108)
            return errors
        finally:
            if pushed:
                self._base_stack.pop()

    def _resolve_ref(self, ref: str) -> Any:
        return self.registry.resolve(ref, base=self._base_stack[-1])


def _err(msg: str, kw: str, path: str, subs: list | None = None) -> list[ValidationError]:
    return [ValidationError(msg, kw, path, subs or [])]


# ---- keyword handlers: (validator, schema, val, data, path, depth) -> errors
# Each begins with its require-type gate (vacuous pass when inapplicable).

def _k_type(v, schema, val, data, path, depth):
    names = val if isinstance(val, list) else [val]
    for name in names:
        pred = _TYPE_PREDICATES.get(name)
        if pred and pred(data):
            return []
    return _err(f"{data!r} is not of type {val!r}", "type", path)


def _k_enum(v, schema, val, data, path, depth):
    if any(json_equal(data, member) for member in val):
        return []
    return _err(f"{data!r} not in enum {val!r}", "enum", path)


def _k_const(v, schema, val, data, path, depth):
    if json_equal(data, val):
        return []
    return _err(f"{data!r} != const {val!r}", "const", path)


@functools.lru_cache(maxsize=1024)
def _compile_pcre(pattern: str):
    """Compiled matcher with PCRE fallback: Python `re` first; on
    constructs it lacks (\\p{..}, \\h/\\v, possessive quantifiers) or
    that it silently mis-parses (POSIX [[:alpha:]]), the PCRE-
    compatible `regex` module — the reference runs cl-ppcre
    (src/validators.lisp:586-591), so PCRE semantics are the parity
    target. Mirrors the compiler path's _PCRE_FALLBACK routing."""
    from json_schema_spark.compiler import _PCRE_FALLBACK, _pcre_module

    rx = _pcre_module()
    if rx is not None and _PCRE_FALLBACK.search(pattern):
        return rx.compile(pattern)
    try:
        return re.compile(pattern)
    except re.error:
        if rx is None:
            raise
        return rx.compile(pattern)


def _k_pattern(v, schema, val, data, path, depth):
    if not is_string(data):
        return []
    # unanchored SEARCH (ppcre:scan, src/validators.lisp:586-591)
    return [] if _compile_pcre(val).search(data) else _err(
        f"{data!r} does not match pattern {val!r}", "pattern", path)


def _k_min_length(v, schema, val, data, path, depth):
    if not is_string(data):
        return []
    return [] if len(data) >= val else _err(
        f"length {len(data)} < minLength {val}", "minLength", path)


def _k_max_length(v, schema, val, data, path, depth):
    if not is_string(data):
        return []
    return [] if len(data) <= val else _err(
        f"length {len(data)} > maxLength {val}", "maxLength", path)


def _k_minimum(v, schema, val, data, path, depth):
    if not is_number(data):
        return []
    return [] if data >= val else _err(f"{data} < minimum {val}", "minimum", path)


def _k_maximum(v, schema, val, data, path, depth):
    if not is_number(data):
        return []
    return [] if data <= val else _err(f"{data} > maximum {val}", "maximum", path)


def _k_excl_minimum(v, schema, val, data, path, depth):
    if not is_number(data) or isinstance(val, bool):
        return []
    return [] if data > val else _err(
        f"{data} <= exclusiveMinimum {val}", "exclusiveMinimum", path)


def _k_excl_maximum(v, schema, val, data, path, depth):
    if not is_number(data) or isinstance(val, bool):
        return []
    return [] if data < val else _err(
        f"{data} >= exclusiveMaximum {val}", "exclusiveMaximum", path)


def _k_minimum_d4(v, schema, val, data, path, depth):
    """draft4 form with boolean sibling (src/validators.lisp:457-467).
    We read the CORRECT sibling (exclusiveMinimum) — the reference reads
    exclusiveMaximum by mistake at :460 and skips the affected case."""
    if not is_number(data):
        return []
    if schema.get("exclusiveMinimum", False):
        return [] if data > val else _err(f"{data} <= minimum {val} (exclusive)", "minimum", path)
    return [] if data >= val else _err(f"{data} < minimum {val}", "minimum", path)


def _k_maximum_d4(v, schema, val, data, path, depth):
    if not is_number(data):
        return []
    if schema.get("exclusiveMaximum", False):
        return [] if data < val else _err(f"{data} >= maximum {val} (exclusive)", "maximum", path)
    return [] if data <= val else _err(f"{data} > maximum {val}", "maximum", path)


def _k_multiple_of(v, schema, val, data, path, depth):
    """src/validators.lisp:501-516 — int divisor via mod; real divisor
    via exact check (we use Fraction where Lisp uses rationals)."""
    if not is_number(data):
        return []
    if isinstance(val, int) and not isinstance(val, bool) and is_integer(data):
        ok = int(data) % val == 0
    else:
        from fractions import Fraction

        try:
            q = Fraction(str(data)) / Fraction(str(val))
            ok = q.denominator == 1
        except (ZeroDivisionError, ValueError):
            ok = False
    return [] if ok else _err(f"{data} not a multiple of {val}", "multipleOf", path)


def _k_format(v, schema, val, data, path, depth):
    if not is_string(data):
        return []
    table = FORMAT_TABLES.get(v.draft, FORMAT_TABLES["draft7"])
    checker = table.get(val)
    if checker is None:
        return []  # unknown format -> vacuous (dispatcher :364-366)
    return [] if checker(data) else _err(
        f"{data!r} is not a valid {val!r}", "format", path)


def _k_required(v, schema, val, data, path, depth):
    if not is_object(data):
        return []
    missing = [k for k in val if k not in data]
    if not missing:
        return []
    return _err(f"missing required properties {missing!r}", "required", path)


def _k_properties(v, schema, val, data, path, depth):
    if not is_object(data):
        return []
    errors = []
    for k, sub in val.items():
        if k in data:  # found-p gate (src/validators.lisp:569-571)
            subs = v._validate(sub, data[k], f"{path}/{k}", depth + 1)
            if subs:
                errors.append(ValidationError(
                    f"property {k!r} invalid", "properties", f"{path}/{k}", subs))
    return errors


def _k_pattern_properties(v, schema, val, data, path, depth):
    if not is_object(data):
        return []
    errors = []
    for pat, sub in val.items():
        for k, dv in data.items():
            if _compile_pcre(pat).search(k):
                subs = v._validate(sub, dv, f"{path}/{k}", depth + 1)
                if subs:
                    errors.append(ValidationError(
                        f"patternProperty {k!r} invalid", "patternProperties",
                        f"{path}/{k}", subs))
    return errors


def _matched_keys(schema: dict, data: dict) -> set:
    known = set(schema.get("properties", {}).keys())
    for pat in schema.get("patternProperties", {}).keys():
        known |= {k for k in data if _compile_pcre(pat).search(k)}
    return known


def _k_additional_properties(v, schema, val, data, path, depth):
    """src/validators.lisp:221-264 — keys not matched by properties /
    patternProperties."""
    if not is_object(data):
        return []
    extra = [k for k in data if k not in _matched_keys(schema, data)]
    if val is False:  # false form (:233-248)
        if extra:
            return _err(f"additional properties {extra!r} not allowed",
                        "additionalProperties", path)
        return []
    if val is True:
        return []
    errors = []
    for k in extra:  # schema form (:250-264)
        subs = v._validate(val, data[k], f"{path}/{k}", depth + 1)
        if subs:
            errors.append(ValidationError(
                f"additional property {k!r} invalid", "additionalProperties",
                f"{path}/{k}", subs))
    return errors


# ---- full in-place-applicator annotation tracking (round-3 DOCUMENTED
# ENGINE EXTENSION, opt-in via Validator(strict_unevaluated=True); the
# default stays reference parity — the reference implements
# unevaluatedProperties only against direct `properties`,
# src/validators.lisp:606-629, and skips unevaluatedItems entirely,
# t/draft2019-09.lisp:83-87) ------------------------------------------

def _evaluated_prop_keys(v, schema, data, depth) -> set:
    """Keys 'evaluated' per 2019-09 annotation semantics: direct
    properties / patternProperties / additionalProperties plus keys
    evaluated by SUCCESSFUL in-place applicator branches (allOf always
    — a failing branch fails the whole schema anyway — anyOf/oneOf
    only where the branch validates, if/then/else as applied,
    dependentSchemas for present keys, $ref targets)."""
    if depth > 100 or not isinstance(schema, dict):
        return set()
    keys = set()
    keys |= {k for k in schema.get("properties", {}) if k in data}
    for pat in schema.get("patternProperties", {}):
        keys |= {k for k in data if _compile_pcre(pat).search(k)}
    if "additionalProperties" in schema:
        keys |= set(data)
    for sub in schema.get("allOf", []):
        keys |= _evaluated_prop_keys(v, sub, data, depth + 1)
    for comb in ("anyOf", "oneOf"):
        for sub in schema.get(comb, []):
            if not v._validate(sub, data, "", depth + 1):
                keys |= _evaluated_prop_keys(v, sub, data, depth + 1)
    if "if" in schema:
        if not v._validate(schema["if"], data, "", depth + 1):
            keys |= _evaluated_prop_keys(v, schema["if"], data, depth + 1)
            if "then" in schema:
                keys |= _evaluated_prop_keys(v, schema["then"], data, depth + 1)
        elif "else" in schema:
            keys |= _evaluated_prop_keys(v, schema["else"], data, depth + 1)
    for k, sub in schema.get("dependentSchemas", {}).items():
        if k in data:
            keys |= _evaluated_prop_keys(v, sub, data, depth + 1)
    if "$ref" in schema:
        try:
            keys |= _evaluated_prop_keys(
                v, v._resolve_ref(schema["$ref"]), data, depth + 1)
        except Exception:
            pass
    return keys


def _evaluated_item_prefix(v, schema, data, depth) -> int:
    """Largest evaluated prefix length per 2019-09 annotation
    semantics: uniform `items` evaluates everything, tuple `items`
    its length (all, with `additionalItems` present), merged as max
    across successful in-place applicator branches. (`contains` does
    NOT evaluate items in 2019-09 — that arrived in 2020-12.)"""
    if depth > 100 or not isinstance(schema, dict):
        return 0
    n = 0
    items = schema.get("items", _SENTINEL)
    if items is not _SENTINEL:
        if isinstance(items, list):
            n = len(data) if "additionalItems" in schema \
                else min(len(items), len(data))
        else:
            n = len(data)
    for sub in schema.get("allOf", []):
        n = max(n, _evaluated_item_prefix(v, sub, data, depth + 1))
    for comb in ("anyOf", "oneOf"):
        for sub in schema.get(comb, []):
            if not v._validate(sub, data, "", depth + 1):
                n = max(n, _evaluated_item_prefix(v, sub, data, depth + 1))
    if "if" in schema:
        if not v._validate(schema["if"], data, "", depth + 1):
            n = max(n, _evaluated_item_prefix(v, schema["if"], data, depth + 1))
            if "then" in schema:
                n = max(n, _evaluated_item_prefix(v, schema["then"], data, depth + 1))
        elif "else" in schema:
            n = max(n, _evaluated_item_prefix(v, schema["else"], data, depth + 1))
    if "$ref" in schema:
        try:
            n = max(n, _evaluated_item_prefix(
                v, v._resolve_ref(schema["$ref"]), data, depth + 1))
        except Exception:
            pass
    return n


def _k_unevaluated_items(v, schema, val, data, path, depth):
    """2019-09 unevaluatedItems — ONLY active in strict mode (the
    reference skips the keyword, t/draft2019-09.lisp:83-87; in parity
    mode it is an annotation no-op like the reference's skip list)."""
    if not getattr(v, "strict_unevaluated", False) or not is_array(data):
        return []
    start = _evaluated_item_prefix(v, schema, data, depth)
    extra = list(range(start, len(data)))
    if val is False:
        return _err(f"unevaluated items at {extra!r} not allowed",
                    "unevaluatedItems", path) if extra else []
    if val is True:
        return []
    errors = []
    for i in extra:
        subs = v._validate(val, data[i], f"{path}/{i}", depth + 1)
        if subs:
            errors.append(ValidationError(
                f"unevaluated item {i} invalid", "unevaluatedItems",
                f"{path}/{i}", subs))
    return errors


def _k_unevaluated_properties(v, schema, val, data, path, depth):
    """PARTIAL like the reference (src/validators.lisp:606-629): only
    diffs against direct `properties`. With
    ``Validator(strict_unevaluated=True)`` (documented engine
    extension), full in-place-applicator annotation tracking."""
    if not is_object(data):
        return []
    if getattr(v, "strict_unevaluated", False):
        known = _evaluated_prop_keys(v, schema, data, depth)
    else:
        known = set(schema.get("properties", {}).keys())
    extra = [k for k in data if k not in known]
    if val is False:
        return _err(f"unevaluated properties {extra!r} not allowed",
                    "unevaluatedProperties", path) if extra else []
    if val is True:
        return []
    errors = []
    for k in extra:
        subs = v._validate(val, data[k], f"{path}/{k}", depth + 1)
        if subs:
            errors.append(ValidationError(
                f"unevaluated property {k!r} invalid", "unevaluatedProperties",
                f"{path}/{k}", subs))
    return errors


def _k_property_names(v, schema, val, data, path, depth):
    if not is_object(data):
        return []
    errors = []
    for k in data:
        subs = v._validate(val, k, f"{path}/{k}", depth + 1)
        if subs:
            errors.append(ValidationError(
                f"property name {k!r} invalid", "propertyNames", path, subs))
    return errors


def _k_min_properties(v, schema, val, data, path, depth):
    if not is_object(data):
        return []
    return [] if len(data) >= val else _err(
        f"{len(data)} properties < minProperties {val}", "minProperties", path)


def _k_max_properties(v, schema, val, data, path, depth):
    if not is_object(data):
        return []
    return [] if len(data) <= val else _err(
        f"{len(data)} properties > maxProperties {val}", "maxProperties", path)


def _dep_entry(v, key, dep, data, path, depth):
    """check-dependencies (src/validators.lisp:142-186)."""
    if key not in data:
        return []
    if isinstance(dep, list):
        missing = [d for d in dep if d not in data]
        if missing:
            return _err(f"dependency of {key!r} missing {missing!r}",
                        "dependencies", path)
        return []
    subs = v._validate(dep, data, path, depth + 1)
    if subs:
        return [ValidationError(f"dependency schema of {key!r} failed",
                                "dependencies", path, subs)]
    return []


def _k_dependencies(v, schema, val, data, path, depth):
    if not is_object(data):
        return []
    errors = []
    for key, dep in val.items():
        errors.extend(_dep_entry(v, key, dep, data, path, depth))
    return errors


def _k_dependent_required(v, schema, val, data, path, depth):
    if not is_object(data):
        return []
    errors = []
    for key, dep in val.items():
        if isinstance(dep, list):
            errors.extend(_dep_entry(v, key, dep, data, path, depth))
    return errors


def _k_dependent_schemas(v, schema, val, data, path, depth):
    if not is_object(data):
        return []
    errors = []
    for key, dep in val.items():
        errors.extend(_dep_entry(v, key, dep, data, path, depth))
    return errors


def _k_items(v, schema, val, data, path, depth):
    if not is_array(data):
        return []
    errors = []
    if isinstance(val, list):  # tuple form: zip, extras ignored (:389-394)
        for i, (sub, item) in enumerate(zip(val, data)):
            subs = v._validate(sub, item, f"{path}/{i}", depth + 1)
            if subs:
                errors.append(ValidationError(
                    f"item {i} invalid", "items", f"{path}/{i}", subs))
    else:  # uniform form (:395-399)
        for i, item in enumerate(data):
            subs = v._validate(val, item, f"{path}/{i}", depth + 1)
            if subs:
                errors.append(ValidationError(
                    f"item {i} invalid", "items", f"{path}/{i}", subs))
    return errors


def _k_additional_items(v, schema, val, data, path, depth):
    """src/validators.lisp:205-218: only applies past a tuple `items`."""
    if not is_array(data):
        return []
    items = schema.get("items")
    if not isinstance(items, list):
        return []
    errors = []
    for i, item in enumerate(data[len(items):], start=len(items)):
        if val is False:
            return _err(f"additional item {i} not allowed", "additionalItems", path)
        if val is True:
            continue
        subs = v._validate(val, item, f"{path}/{i}", depth + 1)
        if subs:
            errors.append(ValidationError(
                f"additional item {i} invalid", "additionalItems",
                f"{path}/{i}", subs))
    return errors


def _k_contains(v, schema, val, data, path, depth):
    if not is_array(data):
        return []
    for item in data:
        if not v._validate(val, item, path, depth + 1):
            return []
    return _err("no array element satisfies `contains`", "contains", path)


def _k_contains_2019(v, schema, val, data, path, depth):
    """2019-09 `contains` counts matches against minContains (default
    1; 0 makes `contains` vacuous) and maxContains.

    ENGINE EXTENSION BEYOND REFERENCE PARITY: the reference's 2019-09
    table (src/validators.lisp:657-695) has no minContains/maxContains
    entries and keeps the >=1 semantics; this engine implements the
    spec'd count semantics (the keywords only activate when a schema
    uses them, so reference-suite parity is unaffected)."""
    if not is_array(data):
        return []
    n = sum(1 for item in data if not v._validate(val, item, path, depth + 1))
    lo = schema.get("minContains", 1)
    hi = schema.get("maxContains")
    errs = []
    if n < lo:
        errs += _err(f"{n} matching elements < minContains {lo}",
                     "contains", path)
    if hi is not None and n > hi:
        errs += _err(f"{n} matching elements > maxContains {hi}",
                     "maxContains", path)
    return errs


def _k_min_items(v, schema, val, data, path, depth):
    if not is_array(data):
        return []
    return [] if len(data) >= val else _err(
        f"{len(data)} items < minItems {val}", "minItems", path)


def _k_max_items(v, schema, val, data, path, depth):
    if not is_array(data):
        return []
    return [] if len(data) <= val else _err(
        f"{len(data)} items > maxItems {val}", "maxItems", path)


def _k_unique_items(v, schema, val, data, path, depth):
    """O(n^2) deep-distinct like remove-duplicates (:632-639)."""
    if not is_array(data) or not val:
        return []
    for i in range(len(data)):
        for j in range(i + 1, len(data)):
            if json_equal(data[i], data[j]):
                return _err(f"items {i} and {j} are equal", "uniqueItems", path)
    return []


def _k_all_of(v, schema, val, data, path, depth):
    errors = []
    for i, sub in enumerate(val):  # collects EVERY branch (:267-273)
        subs = v._validate(sub, data, path, depth + 1)
        if subs:
            errors.append(ValidationError(
                f"allOf branch {i} failed", "allOf", path, subs))
    return errors


def _k_any_of(v, schema, val, data, path, depth):
    collected = []
    for sub in val:  # short-circuit on first success (:281-282)
        subs = v._validate(sub, data, path, depth + 1)
        if not subs:
            return []
        collected.extend(subs)
    return [ValidationError("no anyOf branch matched", "anyOf", path, collected)]


def _k_one_of(v, schema, val, data, path, depth):
    n_valid = sum(
        1 for sub in val if not v._validate(sub, data, path, depth + 1)
    )
    if n_valid == 1:  # exactly one (:525-541)
        return []
    return _err(f"{n_valid} oneOf branches matched (need exactly 1)", "oneOf", path)


def _k_not(v, schema, val, data, path, depth):
    if v._validate(val, data, path, depth + 1):
        return []
    return _err("`not` subschema matched", "not", path)


def _k_if(v, schema, val, data, path, depth):
    """if/then/else — then/else are noops in the dispatch tables,
    driven from here (src/validators.lisp:376-383)."""
    cond_ok = not v._validate(val, data, path, depth + 1)
    branch = schema.get("then") if cond_ok else schema.get("else")
    if branch is None:
        return []
    subs = v._validate(branch, data, path, depth + 1)
    if subs:
        kw = "then" if cond_ok else "else"
        return [ValidationError(f"`{kw}` branch failed", kw, path, subs)]
    return []


def _k_ref(v, schema, val, data, path, depth):
    """$ref (src/validators.lisp:198-202 -> reference.lisp). NOTE:
    reference parity — sibling keywords are NOT suppressed."""
    try:
        target = v._resolve_ref(val)
    except Exception as exc:  # lookup miss -> error row, not crash
        return _err(f"unresolvable $ref {val!r}: {exc}", "$ref", path)
    subs = v._validate(target, data, path, depth + 1)
    if subs:
        return [ValidationError(f"$ref {val!r} failed", "$ref", path, subs)]
    return []


def _k_description(v, schema, val, data, path, depth):
    # annotation value must be a string (src/validators.lisp:307-309)
    if isinstance(val, str):
        return []
    return _err("description must be a string", "description", path)


# ---- per-draft dispatch tables (src/validators.lisp:657-808) --------------

_CORE = {
    "type": _k_type, "enum": _k_enum, "pattern": _k_pattern,
    "minLength": _k_min_length, "maxLength": _k_max_length,
    "multipleOf": _k_multiple_of, "format": _k_format,
    "required": _k_required, "properties": _k_properties,
    "patternProperties": _k_pattern_properties,
    "additionalProperties": _k_additional_properties,
    "minProperties": _k_min_properties, "maxProperties": _k_max_properties,
    "items": _k_items, "additionalItems": _k_additional_items,
    "minItems": _k_min_items, "maxItems": _k_max_items,
    "uniqueItems": _k_unique_items,
    "allOf": _k_all_of, "anyOf": _k_any_of, "oneOf": _k_one_of,
    "not": _k_not, "$ref": _k_ref, "description": _k_description,
    "dependencies": _k_dependencies,
}

_MODERN_NUM = {
    "minimum": _k_minimum, "maximum": _k_maximum,
    "exclusiveMinimum": _k_excl_minimum, "exclusiveMaximum": _k_excl_maximum,
}

_DISPATCH: dict[str, dict] = {
    # draft2019-09 (:657-695): 2019 keywords + partial unevaluatedProperties
    "draft2019-09": {
        **{k: v for k, v in _CORE.items() if k != "dependencies"},
        **_MODERN_NUM,
        # "dependencies" was split into dependentRequired/dependentSchemas
        # in 2019-09; the reference's table (src/validators.lisp:657-695)
        # has no "dependencies" entry, so it is ignored here too.
        "const": _k_const, "contains": _k_contains_2019,
        "propertyNames": _k_property_names,
        "dependentRequired": _k_dependent_required,
        "dependentSchemas": _k_dependent_schemas,
        "unevaluatedProperties": _k_unevaluated_properties,
        "unevaluatedItems": _k_unevaluated_items,
        "if": _k_if,
    },
    # draft7 (:698-736)
    "draft7": {
        **_CORE, **_MODERN_NUM,
        "const": _k_const, "contains": _k_contains,
        "propertyNames": _k_property_names, "if": _k_if,
    },
    # draft6 (:739-773): no if/then/else
    "draft6": {
        **_CORE, **_MODERN_NUM,
        "const": _k_const, "contains": _k_contains,
        "propertyNames": _k_property_names,
    },
    # draft4 (:776-808): boolean-exclusive bounds, no const/contains
    "draft4": {
        **_CORE,
        "minimum": _k_minimum_d4, "maximum": _k_maximum_d4,
    },
}


# ---------------------------------------------------------------------------
# Arrow-batched Spark UDFs (the ONLY Python that ever runs on executors)
# ---------------------------------------------------------------------------

def validate_json_udf(schema: dict | bool, draft: str = "draft7"):
    """Build a vectorized pandas UDF ``json_string -> struct<valid:
    boolean, errors: array<string>>`` for dynamic-shape JSON columns.

    The schema is captured in the closure (compile-once on the driver,
    serialized with the task — the engine twin of the reference's
    reusable context, README.rst:93-144); each executor builds ONE
    Validator per python worker and streams Arrow batches through it.
    """
    import pandas as pd  # noqa: F401 (resolved via module globals below)
    from pyspark.sql.functions import pandas_udf

    globals()["pd"] = pd  # type-hint resolution needs module-level pd
    # (PEP 563 string annotations + function-local imports don't mix)

    schema_json = json.dumps(schema)

    @pandas_udf("struct<valid:boolean,errors:array<string>>")
    def _validate(col: pd.Series) -> pd.DataFrame:
        validator = Validator(json.loads(schema_json), draft=draft)
        valids, errs = [], []
        for raw in col:
            if raw is None:
                valids.append(None)
                errs.append(None)
                continue
            try:
                doc = json.loads(raw)
            except (ValueError, TypeError):
                valids.append(False)
                errs.append(["<parse>: not valid JSON"])
                continue
            ok, errors = validator.validate(doc)
            valids.append(ok)
            errs.append([e.pretty() for e in errors])
        return pd.DataFrame({"valid": valids, "errors": errs})

    return _validate


def regex_compiles_udf(col):
    """``format: regex`` fallback — value compiles as a regex
    (src/formats.lisp:101-105). Arrow-batched; never row-at-a-time in
    the JVM pipeline."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    globals()["pd"] = pd  # see validate_json_udf

    @pandas_udf("boolean")
    def _compiles(s: pd.Series) -> pd.Series:
        return s.map(lambda x: _fmt_regex(x) if isinstance(x, str) else None)

    return _compiles(col)
