"""Constraint-spec -> Spark ``Column`` predicate compiler.

This is the engine analogue of the reference's validator dispatch
(/root/reference/src/validators.lisp:79-138): instead of recursively
interpreting a schema per document, we compile every keyword ONCE on
the driver into a boolean Column (TRUE = pass) and let Catalyst fold,
push down, and whole-stage-codegen the result. Two cross-cutting
semantics preserved (SURVEY.md §2):

1. **Type-gating** (``require-type``, src/validators.lisp:35-37): a
   keyword inapplicable to the column's type passes vacuously. With
   typed columns the gate is *static* — inapplicable keywords compile
   to nothing at all (cheaper than a runtime branch).
2. **Error accumulation** (src/validators.lisp:105-108): every keyword
   compiles to its OWN predicate; violation rows are collected per
   keyword via an array of structs, never one fused boolean.

NULL handling: a SQL NULL is treated as *absent* (SURVEY.md §1.1
caveat). Every keyword except ``required`` passes vacuously on NULL;
``required`` is the presence check (src/validators.lisp:594-603).
"""

from __future__ import annotations

import decimal
import math
import re
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_schema_spark.functions.formats import format_check
from json_schema_spark.spec import ConstraintSpec, SpecError

PredFn = Callable[[Column], Column]

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


@dataclass
class KeywordCheck:
    """One compiled keyword: TRUE-pass predicate + provenance.

    Mirrors a ``validation-failed-error``'s identity fields
    (src/validators.lisp:15-22): keyword + property path + message.
    """

    column: str
    keyword: str
    predicate: Column
    message: str
    path: str = ""


@dataclass
class CompiledSpec:
    spec: ConstraintSpec
    checks: list[KeywordCheck] = field(default_factory=list)

    def check_names(self) -> list[tuple[str, str]]:
        return [(c.column, c.keyword) for c in self.checks]


# ---------------------------------------------------------------------------
# type gates (src/types.lisp:54-102)
# ---------------------------------------------------------------------------

def _is_string(dt: T.DataType) -> bool:
    return isinstance(dt, T.StringType)


def _is_sized(dt: T.DataType) -> bool:
    """Types with a length for min/maxLength: string chars (Lisp
    ``length`` on strings, src/validators.lisp:432-437) and — an engine
    extension for web tables — binary byte length."""
    return isinstance(dt, (T.StringType, T.BinaryType))


def _is_number(dt: T.DataType) -> bool:
    return isinstance(dt, _NUMERIC_TYPES)


def _length(col: Column, dt: T.DataType) -> Column:
    return F.char_length(col) if _is_string(dt) else F.length(col)


def _type_matches(type_name: str, dt: T.DataType, col: Column) -> Column | bool:
    """JSON type name vs physical Spark type (src/types.lisp:54-102).

    Returns a static bool when decidable at compile time, else a
    Column. ``integer`` on a float column is the runtime case:
    "anything without a fractional part is an integer" — 1.0 IS an
    integer (src/types.lisp:41-44).
    """
    if type_name == "string":
        return _is_string(dt)
    if type_name == "number":
        return _is_number(dt)
    if type_name == "integer":
        if isinstance(dt, _INTEGRAL_TYPES):
            return True
        if isinstance(dt, T.DecimalType):
            return F.pmod(col, F.lit(1)) == F.lit(0)
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            # fmod, not floor-compare: floor() returns BIGINT and
            # overflows for |x| > 2^63 where every double IS integral
            return F.pmod(col, F.lit(1.0)) == F.lit(0.0)
        return False
    if type_name == "boolean":
        return isinstance(dt, T.BooleanType)
    if type_name == "array":
        return isinstance(dt, T.ArrayType)
    if type_name == "object":
        return isinstance(dt, (T.StructType, T.MapType))
    if type_name == "null":
        # typed columns conflate null/absent; a present NULL satisfies
        # type:"null" vacuously under our absence convention.
        return col.isNull()
    return False


# ---------------------------------------------------------------------------
# literal construction for enum/const deep equality (src/utils.lisp:69-112)
# ---------------------------------------------------------------------------

def _lit_compatible(value: Any, dt: T.DataType) -> bool:
    """Can `value` ever deep-equal a cell of dtype `dt` under JSON
    equality (src/utils.lisp:69-112: numbers cross-compare, booleans
    and strings do not)?  Folding incompatible members to a static
    False at compile time keeps ANSI-mode Spark from inserting lossy
    runtime casts (e.g. STRING -> BOOLEAN) for enum/const."""
    if value is None:
        return True
    if isinstance(value, bool):
        return isinstance(dt, T.BooleanType)
    if isinstance(value, (int, float)):
        return _is_number(dt)
    if isinstance(value, str):
        return _is_string(dt) or isinstance(dt, T.BinaryType)
    if isinstance(value, list):
        return isinstance(dt, T.ArrayType) and all(
            _lit_compatible(v, dt.elementType) for v in value)
    if isinstance(value, dict):
        if isinstance(dt, T.StructType):
            names = {f.name: f.dataType for f in dt.fields}
            return all(k in names and _lit_compatible(v, names[k])
                       for k, v in value.items())
        return isinstance(dt, T.MapType)  # _lit_value raises -> caller skips
    return False


def _lit_value(value: Any, dt: T.DataType) -> Column:
    if isinstance(value, list):
        if isinstance(dt, T.ArrayType):
            return F.array(*[_lit_value(v, dt.elementType) for v in value])
        return F.array(*[F.lit(v) for v in value])
    if isinstance(value, dict):
        if isinstance(dt, T.StructType):
            fields = []
            for f in dt.fields:
                v = value.get(f.name)
                fields.append(_lit_value(v, f.dataType).alias(f.name))
            return F.struct(*fields)
        raise SpecError("object const/enum member requires a struct column")
    if value is None:
        return F.lit(None).cast(dt)
    return F.lit(value)


# ---------------------------------------------------------------------------
# keyword compilers — each returns PredFn (Column -> TRUE-pass Column)
# or None when statically inapplicable (type-gate folded at compile time)
# ---------------------------------------------------------------------------

# per-draft keyword availability (dispatch tables,
# src/validators.lisp:657-808): a keyword absent from a draft's table
# is UNKNOWN there and skipped (:132-135) — e.g. `const` predates
# draft6, `if` predates draft7.
_CORE_KEYWORDS = frozenset({
    "type", "enum", "pattern", "minLength", "maxLength", "multipleOf",
    "format", "required", "properties", "patternProperties",
    "additionalProperties", "minProperties", "maxProperties", "items",
    "additionalItems", "minItems", "maxItems", "uniqueItems", "allOf",
    "anyOf", "oneOf", "not", "$ref", "dependencies", "minimum", "maximum",
    "exclusiveMinimum", "exclusiveMaximum",
})
_DRAFT6_PLUS = frozenset({"const", "contains", "propertyNames"})
DRAFT_KEYWORDS: dict[str, frozenset] = {
    "draft4": _CORE_KEYWORDS,
    "draft6": _CORE_KEYWORDS | _DRAFT6_PLUS,
    "draft7": _CORE_KEYWORDS | _DRAFT6_PLUS | {"if"},
    # "dependencies" was split into dependentRequired/dependentSchemas in
    # 2019-09; the reference's table (:657-695) drops it, so we do too.
    "draft2019-09": (_CORE_KEYWORDS - {"dependencies"}) | _DRAFT6_PLUS | {
        "if", "dependentRequired", "dependentSchemas", "unevaluatedProperties",
        "unevaluatedItems",  # strict-mode only; parity default = no-op
    },
}
DRAFT_KEYWORDS["draft3"] = _CORE_KEYWORDS


# user-extension registry: the engine twin of the reference's
# def-validator surface (src/validators.lisp:645-654) — register a
# custom keyword compiler per draft ("*" = all drafts). The function
# receives (value, schema, dtype, draft, spec) and returns a PredFn.
_CUSTOM_KEYWORDS: dict[tuple[str, str], Callable] = {}


def register_keyword(name: str, fn: Callable, draft: str = "*") -> None:
    _CUSTOM_KEYWORDS[(draft, name)] = fn


def unregister_keyword(name: str, draft: str = "*") -> None:
    _CUSTOM_KEYWORDS.pop((draft, name), None)


def _compile_keyword(
    keyword: str, val: Any, schema: dict, dt: T.DataType, draft: str,
    spec: ConstraintSpec,
) -> PredFn | None:
    """Dispatch one keyword (dispatch tables src/validators.lisp:657-808)."""
    custom = _CUSTOM_KEYWORDS.get((draft, keyword)) or _CUSTOM_KEYWORDS.get(("*", keyword))
    if custom is not None:
        return custom(val, schema, dt, draft, spec)
    if keyword not in DRAFT_KEYWORDS.get(draft, DRAFT_KEYWORDS["draft7"]):
        return None  # unknown in this draft: warn-skip (:132-135)

    # ---- universal keywords -------------------------------------------
    if keyword == "type":
        names = val if isinstance(val, list) else [val]

        def type_pred(c: Column) -> Column:
            acc: Column | None = None
            for name in names:
                m = _type_matches(name, dt, c)
                if m is True:
                    return F.lit(True)
                if m is False:
                    continue
                acc = m if acc is None else (acc | m)
            return acc if acc is not None else F.lit(False)

        return type_pred

    if keyword == "enum":  # deep equality, src/validators.lisp:339-341
        def enum_pred(c: Column) -> Column:
            members = [v for v in val if v is not None and _lit_compatible(v, dt)]
            has_null = any(v is None for v in val)
            if not members:
                return c.isNull() if has_null else F.lit(False)
            if all(isinstance(v, (str, int, float, bool)) for v in members):
                p = c.isin(members)
            else:
                p = F.exists(
                    F.array(*[_lit_value(v, dt) for v in members]),
                    lambda m: m.eqNullSafe(c),
                )
            return (p | c.isNull()) if has_null else p
        return enum_pred

    if keyword == "const":  # src/validators.lisp:293-296
        if val is None:
            return lambda c: c.isNull()
        if not _lit_compatible(val, dt):
            return lambda c: F.lit(False)
        return lambda c: c.eqNullSafe(_lit_value(val, dt))

    # ---- string keywords (type-gated: src/validators.lisp:35-37) ------
    if keyword == "pattern":
        if not _is_string(dt):
            return None
        if _PCRE_FALLBACK.search(val) and _pcre_module() is not None:
            # PCRE-only construct: Java rlike would silently mismatch
            # (POSIX [[:alpha:]] parses as a literal char class) or
            # throw at RUNTIME in an executor ((?P<..> named groups,
            # \K) — route this one keyword through the Arrow-batched
            # PCRE UDF (round-2 verdict item 4; the reference runs
            # cl-ppcre, src/validators.lisp:586-591, so PCRE semantics
            # ARE the parity target)
            udf = _pcre_search_udf(val)
            return lambda c: udf(c)
        java_pattern = translate_regex(val)
        return lambda c: c.rlike(java_pattern)  # unanchored search, :586-591

    if keyword == "minLength":
        if not _is_sized(dt):
            return None
        return lambda c: _length(c, dt) >= F.lit(int(val))

    if keyword == "maxLength":
        if not _is_sized(dt):
            return None
        return lambda c: _length(c, dt) <= F.lit(int(val))

    if keyword == "format":
        if not _is_string(dt):
            return None
        return lambda c: format_check(val, c, draft)

    # ---- numeric keywords ---------------------------------------------
    if keyword in ("minimum", "maximum"):
        if not _is_number(dt):
            return None
        if draft == "draft4":
            # boolean-modifier form (src/validators.lisp:419-429,457-467).
            # NB: the reference has a bug — minimum-draft4 reads
            # "exclusiveMaximum" (:460); we implement the spec-correct
            # sibling ("exclusiveMinimum") and document the divergence.
            excl = bool(schema.get(
                "exclusiveMinimum" if keyword == "minimum" else "exclusiveMaximum",
                False,
            ))
            if keyword == "minimum":
                return (lambda c: c > F.lit(val)) if excl else (lambda c: c >= F.lit(val))
            return (lambda c: c < F.lit(val)) if excl else (lambda c: c <= F.lit(val))
        if keyword == "minimum":
            return lambda c: c >= F.lit(val)  # :449-454
        return lambda c: c <= F.lit(val)  # :411-416

    if keyword == "exclusiveMinimum":
        if draft == "draft4" or not _is_number(dt) or isinstance(val, bool):
            return None  # draft4 handles it inside minimum
        return lambda c: c > F.lit(val)  # :353-358

    if keyword == "exclusiveMaximum":
        if draft == "draft4" or not _is_number(dt) or isinstance(val, bool):
            return None
        return lambda c: c < F.lit(val)  # :345-350

    if keyword == "multipleOf":  # src/validators.lisp:501-516
        if not _is_number(dt):
            return None

        def _fits_long(n: int) -> bool:
            return -(2 ** 63) <= n < 2 ** 63

        if isinstance(val, int) and not isinstance(val, bool):
            # F.lit of an unbounded Python int raises for |v| >= 2^63;
            # route huge divisors through a decimal literal.
            lit_val = (F.lit(val) if _fits_long(val)
                       else F.lit(str(val)).cast(T.DecimalType(38, 0)))
            if isinstance(dt, (*_INTEGRAL_TYPES, T.DecimalType)):
                return lambda c: F.pmod(c, lit_val) == F.lit(0)
            # double data, int divisor: exact via decimal cast while the
            # value fits Decimal(38,12); binary-exact fmod beyond that
            # (ANSI mode would otherwise raise on the cast).
            def int_div_pred(c: Column) -> Column:
                dec = c.try_cast(T.DecimalType(38, 12))
                return F.when(
                    dec.isNotNull(),
                    dec % lit_val == F.lit(0).cast("decimal(38,12)"),
                ).otherwise(F.pmod(c, F.lit(float(val))) == F.lit(0.0))
            return int_div_pred
        # real divisor: the reference parses JSON numbers to CL rationals,
        # so 4.5 % 1.5 == 0 exactly (its suite still skips the float
        # variant, t/draft7.lisp:54-55).  For integral/decimal columns we
        # reproduce rational exactness with integer arithmetic:
        # val = p/10^s  =>  x multiple of val  <=>  x*10^s ≡ 0 (mod p).
        dval_dec = decimal.Decimal(str(val))
        s = max(0, -dval_dec.as_tuple().exponent)
        p = int(dval_dec.scaleb(s))
        if (isinstance(dt, (*_INTEGRAL_TYPES, T.DecimalType))
                and _fits_long(p) and _fits_long(10 ** s)):
            # multiply FIRST — decimal arithmetic keeps the fraction
            # (0.25 * 10 = 2.5, pmod 5 != 0 -> correctly rejected);
            # casting to decimal(38,0) before scaling rounded it away.
            # Integral columns cast to decimal(38,0) (int64 always
            # fits, and would otherwise overflow int64 on *10^s under
            # ANSI); decimal columns multiply as-is (product keeps
            # their scale exactly).
            def exact_pred(c: Column) -> Column:
                base = (c.cast(T.DecimalType(38, 0))
                        if isinstance(dt, _INTEGRAL_TYPES) else c)
                return F.pmod(base * F.lit(10 ** s), F.lit(p)) == F.lit(0)
            return exact_pred

        def real_div_pred(c: Column) -> Column:
            dec = c.try_cast(T.DecimalType(38, 12))
            # try_cast ROUNDS tiny divisors (1e-25) to exactly 0 rather
            # than NULL — guard both, else the modulo raises
            dval = F.lit(str(val)).try_cast(T.DecimalType(38, 12))
            return F.when(
                dec.isNotNull() & dval.isNotNull() & (dval != F.lit(0)),
                (dec % dval) == F.lit(0).cast(T.DecimalType(38, 12)),
            ).otherwise(F.pmod(c, F.lit(float(val))) == F.lit(0.0))
        return real_div_pred

    # ---- array keywords ------------------------------------------------
    if keyword == "items":
        if not isinstance(dt, T.ArrayType):
            return None
        if isinstance(val, list):  # tuple form (:389-394)
            preds = [
                _schema_pred(s, dt.elementType, draft, spec) for s in val
            ]

            def tuple_pred(c: Column) -> Column:
                acc = F.lit(True)
                for i, p in enumerate(preds):
                    acc = acc & F.when(F.size(c) > i, p(F.element_at(c, i + 1))).otherwise(True)
                return acc

            return tuple_pred
        inner = _schema_pred(val, dt.elementType, draft, spec)  # :395-399
        return lambda c: F.forall(c, inner)

    if keyword == "additionalItems":  # src/validators.lisp:205-218
        if not isinstance(dt, T.ArrayType):
            return None
        items = schema.get("items")
        if not isinstance(items, list):
            return None  # no-op unless items is the tuple form
        n = len(items)
        inner = _schema_pred(val, dt.elementType, draft, spec)
        return lambda c: F.forall(
            F.slice(c, n + 1, F.greatest(F.size(c) - n, F.lit(0))), inner
        )

    if keyword == "contains":  # :299-304
        if not isinstance(dt, T.ArrayType):
            return None
        inner = _schema_pred(val, dt.elementType, draft, spec)
        if draft == "draft2019-09" and (
                "minContains" in schema or "maxContains" in schema):
            # 2019-09 count semantics (ENGINE EXTENSION — the
            # reference's table has no min/maxContains; see
            # pyvalidator._k_contains_2019). minContains=0 makes
            # contains vacuous, per spec.
            lo = int(schema.get("minContains", 1))
            hi = schema.get("maxContains")

            def counted(c: Column) -> Column:
                cnt = F.size(F.filter(c, inner))
                pred = cnt >= F.lit(lo)
                if hi is not None:
                    pred = pred & (cnt <= F.lit(int(hi)))
                return pred

            return counted
        return lambda c: F.exists(c, inner)

    if keyword == "minItems":
        if not isinstance(dt, T.ArrayType):
            return None
        return lambda c: F.size(c) >= F.lit(int(val))

    if keyword == "maxItems":
        if not isinstance(dt, T.ArrayType):
            return None
        return lambda c: F.size(c) <= F.lit(int(val))

    if keyword == "uniqueItems":  # deep-distinct, :632-639
        if not isinstance(dt, T.ArrayType) or not val:
            return None
        return lambda c: F.size(c) == F.size(F.array_distinct(c))

    # ---- object keywords (struct / map columns) -----------------------
    if keyword == "required":  # :594-603 — presence = non-null (§1.1)
        if isinstance(dt, T.StructType):
            names = set(f.name for f in dt.fields)

            def req_struct(c: Column) -> Column:
                acc = F.lit(True)
                for k in val:
                    acc = acc & (c.getField(k).isNotNull() if k in names else F.lit(False))
                return acc

            return req_struct
        if isinstance(dt, T.MapType):
            return lambda c: F.forall(
                F.array(*[F.lit(k) for k in val]), lambda k: F.map_contains_key(c, k)
            )
        return None

    if keyword == "properties":  # :564-575, presence-gated recursion
        if isinstance(dt, T.StructType):
            field_types = {f.name: f.dataType for f in dt.fields}

            def props_struct(c: Column) -> Column:
                acc = F.lit(True)
                for k, sub in val.items():
                    if k not in field_types:
                        continue  # absent key -> vacuous (found-p gate :569-571)
                    p = _schema_pred(sub, field_types[k], draft, spec)
                    fld = c.getField(k)
                    acc = acc & F.when(fld.isNotNull(), p(fld)).otherwise(True)
                return acc

            return props_struct
        if isinstance(dt, T.MapType):
            def props_map(c: Column) -> Column:
                acc = F.lit(True)
                for k, sub in val.items():
                    p = _schema_pred(sub, dt.valueType, draft, spec)
                    acc = acc & F.when(
                        F.map_contains_key(c, F.lit(k)), p(F.element_at(c, F.lit(k)))
                    ).otherwise(True)
                return acc

            return props_map
        return None

    if keyword == "patternProperties":  # :544-561
        if not isinstance(dt, T.MapType):
            return None

        def pat_props(c: Column) -> Column:
            acc = F.lit(True)
            for pat, sub in val.items():
                p = _schema_pred(sub, dt.valueType, draft, spec)
                jpat = translate_regex(pat)
                acc = acc & F.forall(
                    F.filter(F.map_keys(c), lambda k: k.rlike(jpat)),
                    lambda k: p(F.element_at(c, k)),
                )
            return acc

        return pat_props

    if keyword == "additionalProperties":  # :221-264
        if not isinstance(dt, T.MapType):
            return None  # struct columns have a closed key set -> vacuous
        known = list(schema.get("properties", {}).keys())
        pats = [translate_regex(p) for p in schema.get("patternProperties", {}).keys()]

        def extra_keys(c: Column) -> Column:
            ks = F.array_except(F.map_keys(c), F.array(*[F.lit(k) for k in known])) \
                if known else F.map_keys(c)
            for jp in pats:
                ks = F.filter(ks, lambda k: ~k.rlike(jp))
            return ks

        if val is False:  # false form :233-248
            return lambda c: F.size(extra_keys(c)) == F.lit(0)
        if val is True:
            return None
        p = _schema_pred(val, dt.valueType, draft, spec)  # schema form :250-264
        return lambda c: F.forall(extra_keys(c), lambda k: p(F.element_at(c, k)))

    if keyword == "propertyNames":  # :578-583
        if not isinstance(dt, T.MapType):
            return None
        p = _schema_pred(val, T.StringType(), draft, spec)
        return lambda c: F.forall(F.map_keys(c), p)

    if keyword in ("minProperties", "maxProperties"):  # :485-498
        if isinstance(dt, T.MapType):
            n = F.lit(int(val))
            if keyword == "minProperties":
                return lambda c: F.size(F.map_keys(c)) >= n
            return lambda c: F.size(F.map_keys(c)) <= n
        if isinstance(dt, T.StructType):
            # presence = non-null field (SURVEY.md §1.1 caveat)
            n = int(val)

            def count_pred(c: Column) -> Column:
                cnt = sum(
                    (c.getField(f.name).isNotNull().cast("int") for f in dt.fields),
                    F.lit(0),
                )
                return (cnt >= F.lit(n)) if keyword == "minProperties" else (cnt <= F.lit(n))

            return count_pred
        return None

    if keyword in ("dependencies", "dependentRequired", "dependentSchemas"):
        # :313-337 + check-dependencies :142-186
        if not isinstance(dt, (T.StructType, T.MapType)):
            return None

        def present(c: Column, k: str) -> Column:
            if isinstance(dt, T.StructType):
                names = set(f.name for f in dt.fields)
                return c.getField(k).isNotNull() if k in names else F.lit(False)
            return F.map_contains_key(c, F.lit(k))

        def dep_pred(c: Column) -> Column:
            acc = F.lit(True)
            for key, dep in val.items():
                if isinstance(dep, list):  # array form
                    need = F.lit(True)
                    for d in dep:
                        need = need & present(c, d)
                    acc = acc & F.when(present(c, key), need).otherwise(True)
                else:  # schema form: whole object must satisfy subschema
                    p = _schema_pred(dep, dt, draft, spec)
                    acc = acc & F.when(present(c, key), p(c)).otherwise(True)
            return acc

        return dep_pred

    if keyword == "unevaluatedProperties":
        # 2019-09, PARTIAL in the reference — only diffs against direct
        # `properties` (src/validators.lisp:606-629; suite skipped
        # t/draft2019-09.lisp:83-87). We match that partial behavior by
        # default; with spec-level `"strict_unevaluated": true` (the
        # r3 DOCUMENTED ENGINE EXTENSION, mirror of
        # pyvalidator._k_unevaluated_properties) the evaluated-key set
        # is computed with full in-place-applicator annotation
        # tracking, entirely as Column expressions — still one codegen
        # pass, no UDF.
        if not isinstance(dt, T.MapType):
            return None

        if _strict_unevaluated(spec):
            ev = _evaluated_keys_fn(schema, dt, draft, spec)

            def unev_strict(c: Column) -> Column:
                ks = F.array_except(F.map_keys(c), ev(c))
                if val is False:
                    return F.size(ks) == F.lit(0)
                if val is True:
                    return F.lit(True)
                p = _schema_pred(val, dt.valueType, draft, spec)
                return F.forall(ks, lambda k: p(F.element_at(c, k)))

            return unev_strict

        known = list(schema.get("properties", {}).keys())

        def unev(c: Column) -> Column:
            ks = F.array_except(F.map_keys(c), F.array(*[F.lit(k) for k in known]))
            if val is False:
                return F.size(ks) == F.lit(0)
            p = _schema_pred(val, dt.valueType, draft, spec)
            return F.forall(ks, lambda k: p(F.element_at(c, k)))

        return unev

    if keyword == "unevaluatedItems":
        # 2019-09 unevaluatedItems — the reference SKIPS the keyword
        # (t/draft2019-09.lisp:83-87), so parity default is a no-op;
        # strict mode (same opt-in flag) applies `val` to every item
        # past the evaluated prefix, mirror of
        # pyvalidator._k_unevaluated_items.
        if not isinstance(dt, T.ArrayType) or not _strict_unevaluated(spec):
            return None
        if val is True:
            return None
        prefix = _evaluated_item_prefix_fn(schema, dt, draft, spec)
        if val is False:
            return lambda c: F.size(c) <= prefix(c)
        p = _schema_pred(val, dt.elementType, draft, spec)
        return lambda c: F.forall(
            F.slice(c, prefix(c) + F.lit(1),
                    F.greatest(F.size(c) - prefix(c), F.lit(0))), p)

    # ---- combinators ---------------------------------------------------
    if keyword == "allOf":  # :267-273
        preds = [_schema_pred(s, dt, draft, spec) for s in val]
        return lambda c: _fold_and([p(c) for p in preds])

    if keyword == "anyOf":  # :276-290 (OR short-circuits in codegen)
        preds = [_schema_pred(s, dt, draft, spec) for s in val]
        return lambda c: _fold_or([p(c) for p in preds])

    if keyword == "oneOf":  # exactly one, :525-541
        preds = [_schema_pred(s, dt, draft, spec) for s in val]
        return lambda c: sum(
            (p(c).cast("int") for p in preds), F.lit(0)
        ) == F.lit(1)

    if keyword == "not":  # :519-522
        p = _schema_pred(val, dt, draft, spec)
        return lambda c: ~p(c)

    if keyword == "if":  # :376-383; then/else driven from here
        then_s = schema.get("then")
        else_s = schema.get("else")
        ip = _schema_pred(val, dt, draft, spec)
        tp = _schema_pred(then_s, dt, draft, spec) if then_s is not None else None
        ep = _schema_pred(else_s, dt, draft, spec) if else_s is not None else None
        return lambda c: F.when(
            ip(c), tp(c) if tp else F.lit(True)
        ).otherwise(ep(c) if ep else F.lit(True))

    if keyword == "$ref":  # compile-time resolution (§2.3)
        target = spec.registry.resolve(val)
        return _schema_pred(target, dt, draft, spec)

    if keyword == "false-schema":  # synthetic: $ref chain hit a false schema
        return lambda c: F.lit(False)

    # annotations / structural no-ops (src/validators.lisp:192-195 +
    # table entries) and then/else (handled under "if")
    return None


_NOOP_KEYWORDS = frozenset({
    "$anchor", "$comment", "$defs", "$id", "$schema", "$vocabulary",
    "default", "definitions", "description", "title", "examples",
    "then", "else", "contentMediaType", "contentEncoding", "deprecated",
    "minContains", "maxContains",  # driven from the "contains" branch
    "readOnly", "writeOnly", "id", "draft", "exclusiveMinimum_draft4",
})


def _fold_and(cols: list[Column]) -> Column:
    acc = F.lit(True)
    for c in cols:
        acc = acc & c
    return acc


def _fold_or(cols: list[Column]) -> Column:
    if not cols:
        return F.lit(False)
    acc = cols[0]
    for c in cols[1:]:
        acc = acc | c
    return acc


def _strict_unevaluated(spec: ConstraintSpec) -> bool:
    """Spec-level opt-in for full 2019-09 annotation tracking
    (`{"strict_unevaluated": true, ...}`) — the compiler-path twin of
    ``Validator(strict_unevaluated=True)``. Default off = reference
    parity (partial unevaluatedProperties, unevaluatedItems skipped)."""
    return bool(spec.raw.get("strict_unevaluated"))


def _empty_str_array() -> Column:
    return F.array().cast("array<string>")


def _evaluated_keys_fn(schema: Any, dt: T.MapType, draft: str,
                       spec: ConstraintSpec, depth: int = 0) -> PredFn:
    """Column twin of pyvalidator._evaluated_prop_keys: an
    array<string> of keys 'evaluated' per 2019-09 annotation semantics
    — direct properties / patternProperties / additionalProperties
    plus keys evaluated by SUCCESSFUL in-place applicator branches
    (allOf always, anyOf/oneOf only where the branch validates for
    THIS row, if/then/else as applied, dependentSchemas for present
    keys, $ref targets). Branch success is itself a compiled predicate
    so the whole set stays one codegen'd expression."""
    if depth > 50 or not isinstance(schema, dict):
        return lambda c: _empty_str_array()
    parts: list[PredFn] = []
    statics = list(schema.get("properties", {}).keys())
    if statics:
        parts.append(lambda c: F.array(*[F.lit(k) for k in statics]))
    for pat in schema.get("patternProperties", {}):
        jpat = translate_regex(pat)
        parts.append(lambda c, jp=jpat: F.filter(
            F.map_keys(c), lambda k: k.rlike(jp)))
    if "additionalProperties" in schema:
        parts.append(lambda c: F.map_keys(c))
    for sub in schema.get("allOf", []):
        parts.append(_evaluated_keys_fn(sub, dt, draft, spec, depth + 1))
    for comb in ("anyOf", "oneOf"):
        for sub in schema.get(comb, []):
            ok = _schema_pred(sub, dt, draft, spec)
            ek = _evaluated_keys_fn(sub, dt, draft, spec, depth + 1)
            parts.append(lambda c, ok=ok, ek=ek: F.when(
                ok(c), ek(c)).otherwise(_empty_str_array()))
    if "if" in schema:
        ip = _schema_pred(schema["if"], dt, draft, spec)
        ik = _evaluated_keys_fn(schema["if"], dt, draft, spec, depth + 1)
        tk = (_evaluated_keys_fn(schema["then"], dt, draft, spec, depth + 1)
              if "then" in schema else None)
        ek = (_evaluated_keys_fn(schema["else"], dt, draft, spec, depth + 1)
              if "else" in schema else None)

        def ite_keys(c: Column, ip=ip, ik=ik, tk=tk, ek=ek) -> Column:
            then_arr = F.concat(ik(c), tk(c)) if tk is not None else ik(c)
            else_arr = ek(c) if ek is not None else _empty_str_array()
            return F.when(ip(c), then_arr).otherwise(else_arr)

        parts.append(ite_keys)
    for k, sub in schema.get("dependentSchemas", {}).items():
        ek = _evaluated_keys_fn(sub, dt, draft, spec, depth + 1)
        parts.append(lambda c, k=k, ek=ek: F.when(
            F.map_contains_key(c, F.lit(k)), ek(c)
        ).otherwise(_empty_str_array()))
    if "$ref" in schema:
        target = spec.registry.resolve(schema["$ref"])
        parts.append(_evaluated_keys_fn(target, dt, draft, spec, depth + 1))
    if not parts:
        return lambda c: _empty_str_array()
    if len(parts) == 1:
        return parts[0]
    return lambda c: F.concat(*[p(c) for p in parts])


def _evaluated_item_prefix_fn(schema: Any, dt: T.ArrayType, draft: str,
                              spec: ConstraintSpec, depth: int = 0) -> PredFn:
    """Column twin of pyvalidator._evaluated_item_prefix: the largest
    evaluated prefix length (int Column). Uniform `items` evaluates
    everything; tuple `items` its length (everything with
    `additionalItems` present); merged as max across successful
    in-place applicator branches. `contains` does NOT evaluate items
    in 2019-09 (that arrived in 2020-12)."""
    if depth > 50 or not isinstance(schema, dict):
        return lambda c: F.lit(0)
    parts: list[PredFn] = []
    if "items" in schema:
        items = schema["items"]
        if isinstance(items, list) and "additionalItems" not in schema:
            parts.append(lambda c, n=len(items): F.least(F.lit(n), F.size(c)))
        else:
            parts.append(lambda c: F.size(c))
    for sub in schema.get("allOf", []):
        parts.append(_evaluated_item_prefix_fn(sub, dt, draft, spec, depth + 1))
    for comb in ("anyOf", "oneOf"):
        for sub in schema.get(comb, []):
            ok = _schema_pred(sub, dt, draft, spec)
            pf = _evaluated_item_prefix_fn(sub, dt, draft, spec, depth + 1)
            parts.append(lambda c, ok=ok, pf=pf: F.when(
                ok(c), pf(c)).otherwise(F.lit(0)))
    if "if" in schema:
        ip = _schema_pred(schema["if"], dt, draft, spec)
        i_pf = _evaluated_item_prefix_fn(schema["if"], dt, draft, spec, depth + 1)
        t_pf = (_evaluated_item_prefix_fn(schema["then"], dt, draft, spec, depth + 1)
                if "then" in schema else None)
        e_pf = (_evaluated_item_prefix_fn(schema["else"], dt, draft, spec, depth + 1)
                if "else" in schema else None)

        def ite_prefix(c: Column, ip=ip, i_pf=i_pf, t_pf=t_pf, e_pf=e_pf) -> Column:
            then_n = (F.greatest(i_pf(c), t_pf(c))
                      if t_pf is not None else i_pf(c))
            else_n = e_pf(c) if e_pf is not None else F.lit(0)
            return F.when(ip(c), then_n).otherwise(else_n)

        parts.append(ite_prefix)
    if "$ref" in schema:
        target = spec.registry.resolve(schema["$ref"])
        parts.append(_evaluated_item_prefix_fn(target, dt, draft, spec, depth + 1))
    if not parts:
        return lambda c: F.lit(0)
    if len(parts) == 1:
        return parts[0]
    return lambda c: F.greatest(*[p(c) for p in parts])


def _schema_pred(schema: Any, dt: T.DataType, draft: str, spec: ConstraintSpec) -> PredFn:
    """Compile a whole (sub)schema to one fused TRUE-pass PredFn.

    Boolean-schema short circuit (src/validators.lisp:86-91) and
    empty-schema-is-valid (:93-94) included.
    """
    if schema is True or schema == {}:
        return lambda c: F.lit(True)
    if schema is False:
        return lambda c: F.lit(False)
    if not isinstance(schema, dict):
        raise SpecError(f"schema must be object or boolean, got {schema!r}")
    parts: list[PredFn] = []
    for kw, val in schema.items():
        if kw in _NOOP_KEYWORDS:
            continue
        fn = _compile_keyword(kw, val, schema, dt, draft, spec)
        if fn is not None:
            parts.append(fn)
    if not parts:
        return lambda c: F.lit(True)

    def fused(c: Column) -> Column:
        # NULL = absent: all keywords vacuous on NULL at this level.
        # Branch-free (| not when): subexpression elimination does not
        # reach inside when() branches, so shared subtrees (length(),
        # regex machinery) would re-evaluate per keyword otherwise.
        return c.isNull() | _fold_and([p(c) for p in parts])

    return fused


# ---------------------------------------------------------------------------
# regex dialect shim: PCRE (ppcre) -> Java regex
# ---------------------------------------------------------------------------

# constructs where Java regex diverges from the reference's cl-ppcre:
# \p{..}/\h/\v/possessive fail Python re validation (can't be checked
# driver-side), POSIX [[:alpha:]] silently parses as a literal char
# class in Java, (?P<..>/(?P= and \K throw PatternSyntaxException at
# executor runtime. Any of these routes the keyword to the PCRE UDF.
_PCRE_FALLBACK = re.compile(
    r"\\[pPhHvVK]"           # property classes, horiz/vert space, \K
    r"|\[\[:\^?\w+:\]\]"     # POSIX bracket expressions
    r"|\(\?P[<=]"            # PCRE/Python named-group syntax
    r"|[*+?}]\+"             # possessive quantifiers
)


def _pcre_module():
    """The PCRE-compatible `regex` module, or None (import-gated: the
    rlike tolerance path remains the fallback without it)."""
    try:
        import regex
        return regex
    except ImportError:  # pragma: no cover - regex ships in this env
        return None


def _pcre_search_udf(pattern: str):
    """Arrow-batched unanchored PCRE search (the `pattern` keyword's
    semantics, src/validators.lisp:586-591) for patterns Java regex
    can't express. Compiles driver-side first so a bad spec fails at
    compile time, not in an executor task."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    globals()["pd"] = pd  # type-hint resolution under PEP 563
    _pcre_module().compile(pattern)  # driver-side validation

    @pandas_udf("boolean")
    def _search(col: pd.Series) -> pd.Series:
        import regex as _rx
        rx = _rx.compile(pattern)
        return col.map(lambda s: bool(rx.search(s)) if s is not None else None)

    return _search


def translate_regex(pattern: str) -> str:
    """Translate the common PCRE constructs the reference's `pattern`
    keyword sees into Java-regex-safe equivalents.

    ppcre and java.util.regex agree on the core syntax; the gaps that
    matter for web-page constraints are ``\\Z``/``\\z`` anchors and
    possessive quantifier differences. We validate the pattern compiles
    under Python's `re` (a PCRE-alike) at compile time so bad specs
    fail on the driver, not in an executor task
    (cf. precompiled-regex posture, src/formats.lisp:11-12).
    """
    try:
        re.compile(pattern)  # driver-side validation; raises on bad spec
    except re.error:
        # tolerate Java/PCRE-only constructs Python's re lacks
        # (\p{..} property classes, \h/\v horizontal/vertical space,
        # possessive quantifiers); everything else is a real spec bug.
        if not re.search(r"\\[pPhHvV]|[*+?}]\+", pattern):
            raise
    return pattern.replace(r"\Z", r"\z")


# ---------------------------------------------------------------------------
# top-level spec compilation
# ---------------------------------------------------------------------------

def _flatten_ref_items(schema: dict, spec: "ConstraintSpec", depth: int = 0):
    """Yield (keyword, value, parent_schema) for a top-level column schema,
    expanding ``$ref`` chains conjunctively (target keywords AND siblings —
    reference parity: src/validators.lisp:524-530 does not suppress
    siblings in draft<=7)."""
    if depth > 32:
        raise SpecError("$ref expansion depth cap exceeded")
    for kw, val in schema.items():
        if kw == "$ref":
            target = spec.registry.resolve(val)
            if target is True or target == {}:
                continue
            if target is False:
                # false schema: no value can satisfy it
                yield "false-schema", False, schema
                continue
            yield from _flatten_ref_items(target, spec, depth + 1)
        else:
            yield kw, val, schema


def compile_spec(spec: ConstraintSpec | dict, df: DataFrame) -> CompiledSpec:
    """Compile a constraint spec against a DataFrame's schema.

    Produces one KeywordCheck per (column, top-level keyword) so error
    accumulation matches the reference (src/validators.lisp:105-108):
    all keywords evaluated, failures collected individually.
    """
    if isinstance(spec, dict):
        spec = ConstraintSpec(spec)
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    out = CompiledSpec(spec=spec)

    for colname, schema in spec.columns.items():
        if colname not in dtypes:
            raise SpecError(f"spec references unknown column {colname!r}")
        dt = dtypes[colname]
        if schema is True:
            continue
        if schema is False:
            out.checks.append(KeywordCheck(
                colname, "false-schema", F.col(colname).isNull(),
                f"{colname}: schema is false",
            ))
            continue
        # A top-level {"$ref": ..., <siblings>} keeps its siblings — the
        # ref target's keywords are flattened into individual checks
        # alongside them, matching pyvalidator._k_ref (reference parity:
        # siblings not suppressed, src/validators.lisp:524-530) while
        # preserving per-keyword error granularity.
        for kw, val, parent in _flatten_ref_items(schema, spec):
            if kw in _NOOP_KEYWORDS:
                continue
            fn = _compile_keyword(kw, val, parent, dt, spec.draft, spec)
            if fn is None:
                continue
            col = F.col(colname)
            # branch-free NULL gate — keeps every check's subtree
            # visible to whole-stage-codegen subexpression elimination
            # (the verdict aggregation evaluates ALL checks in one
            # projection; see the variant-path 5x for the countercase)
            pred = col.isNull() | fn(col)
            out.checks.append(KeywordCheck(
                colname, kw, pred,
                _message(colname, kw, val),
                path=f"/columns/{colname}/{kw}",
            ))

    # top-level required: presence across the row (src/validators.lisp:594-603)
    for colname in spec.required:
        if colname not in dtypes:
            raise SpecError(f"required references unknown column {colname!r}")
        out.checks.append(KeywordCheck(
            colname, "required", F.col(colname).isNotNull(),
            f"required column {colname} is missing (NULL)",
            path=f"/required/{colname}",
        ))
    return out


def _message(column: str, keyword: str, val: Any) -> str:
    """Human-readable message in the reference's error style
    (README.rst:70-79)."""
    if isinstance(val, (dict, list)) and keyword not in ("enum",):
        return f"{column!r} failed keyword {keyword}"
    return f"{column!r} failed keyword {keyword} ({val!r})"


# ---------------------------------------------------------------------------
# violation / verdict materialization (error model, SURVEY.md §2.7)
# ---------------------------------------------------------------------------

def violations_df(
    df: DataFrame,
    compiled: CompiledSpec,
    id_cols: list[str],
    partition_col: Column | None = None,
    run_id: str = "",
) -> DataFrame:
    """Violation rows: one row per (document, failed keyword).

    Schema mirrors FIXTURES.md §5 / the reference's error objects
    (src/validators.lisp:15-22): identity + keyword + column + path +
    message. Implemented as an array of violation structs collected in
    a single projection (error ACCUMULATION: all keywords evaluated,
    src/validators.lisp:105-108) then exploded — one narrow stage, no
    shuffle, fully codegen'd.
    """
    struct_type = (
        "struct<keyword:string,column:string,path:string,message:string>"
    )
    entries = [
        F.when(
            ~c.predicate,
            F.struct(
                F.lit(c.keyword).alias("keyword"),
                F.lit(c.column).alias("column"),
                F.lit(c.path).alias("path"),
                F.lit(c.message).alias("message"),
            ),
        ).otherwise(F.lit(None).cast(struct_type))
        for c in compiled.checks
    ]
    arr = F.filter(F.array(*entries), lambda x: x.isNotNull())
    keep = [F.col(k) for k in id_cols]
    if partition_col is not None:
        keep.append(partition_col.alias("partition"))
    out = df.select(*keep, F.explode(arr).alias("v"))
    # sub_errors (FIXTURES.md §5): compiled Column checks are keyword-
    # granular (combinator internals fuse), so the column path emits an
    # empty nest; the dynamic-JSON path (pyvalidator UDF) fills it.
    sub_errors = F.lit([]).cast(
        "array<struct<keyword:string,path:string,message:string>>"
    )
    return out.select(
        *[F.col(k) for k in id_cols],
        *([F.col("partition")] if partition_col is not None else []),
        F.col("v.keyword").alias("keyword"),
        F.col("v.column").alias("column"),
        F.col("v.path").alias("path"),
        F.col("v.message").alias("message"),
        sub_errors.alias("sub_errors"),
        F.lit(run_id).alias("run_id"),
    )


def verdict_df(
    df: DataFrame, compiled: CompiledSpec,
    partition_col: Column | str | None = None,
) -> DataFrame:
    """Per-check verdict summary in ONE aggregation pass (no explode,
    no shuffle beyond the final agg): for every check, the violation
    count; pass == zero violations ("valid iff errors nil",
    src/json-schema.lisp:33-38).

    With ``partition_col`` the same single pass emits one verdict row
    per (partition, check) — the north-rule "per-partition pass/fail"
    shape; the shuffle carries |partitions| pre-aggregated rows, never
    the table.
    """
    # positional agg aliases: (column, keyword) pairs are NOT unique —
    # a $ref target can share a keyword with a sibling, which made
    # name-derived aliases ambiguous (AnalysisException at resolve time)
    aggs = [
        F.sum((~c.predicate).cast("long")).alias(f"chk{i}")
        for i, c in enumerate(compiled.checks)
    ] + [F.count(F.lit(1)).alias("\x00rows")]
    keep: list[Column] = []
    if partition_col is not None:
        part = F.col(partition_col) if isinstance(partition_col, str) else partition_col
        row = df.groupBy(part.alias("partition")).agg(*aggs)
        keep = [F.col("partition")]
    else:
        row = df.agg(*aggs)
    # unpivot to (column, keyword, n_violations, n_rows, pass)
    pairs = []
    for i, c in enumerate(compiled.checks):
        pairs.append(F.struct(
            F.lit(c.column).alias("column"),
            F.lit(c.keyword).alias("keyword"),
            F.col(f"chk{i}").alias("n_violations"),
        ))
    return row.select(
        *keep,
        F.col("`\x00rows`").alias("n_rows"), F.explode(F.array(*pairs)).alias("s")
    ).select(
        *keep,
        F.col("s.column").alias("column"),
        F.col("s.keyword").alias("keyword"),
        F.col("s.n_violations").alias("n_violations"),
        F.col("n_rows").alias("n_rows"),
        (F.col("s.n_violations") == 0).alias("pass"),
    )
