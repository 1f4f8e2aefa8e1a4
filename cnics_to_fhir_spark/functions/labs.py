"""Lab result value typing — the variant value[x] operator (F11-F13).

The reference re-types a stringly lab ``Result`` per row into one of five
FHIR value[x] shapes (cnics_to_fhir.py:799-827). Spark columns are
homogeneous, so the engine models the union as a TAGGED STRUCT: a
``value_type`` tag plus one typed field per variant; downstream assembly
(assembly/observation.py) turns the tag back into the heterogeneous JSON key.

Branch order is load-bearing and matches the reference exactly:
  1. integer      ``^([0]|[-+]?\\s*[1-9][0-9]*)$``          → valueInteger
  2. int-range    ``^ int \\s*-\\s* int $``                  → valueRange
  3. decimal      ``^(-?(0|[1-9][0-9]*)(\\.\\d+)?([eE][+-]?\\d+)?)$`` → valueQuantity
  4. comparator   ``^(<|<=|>=|>) decimal$``                  → valueQuantity + comparator
  5. else                                                    → valueString

Sharp edges preserved (SURVEY.md §7.4): integer allows '+ 3' (sign, spaces);
'00' and '-0' are NOT integers (fall through to decimal/string); decimal
allows scientific notation but only a bare '-' sign; range is
integer-integer only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Translations of the reference regexes (cnics_to_fhir.py:804-807). Python's
# re and Java's regex agree on every construct used here.
INTEGER_RE = r"([0]|[-+]?\s*[1-9][0-9]*)"
DECIMAL_RE = r"(-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?)"
RANGE_RE = INTEGER_RE + r"\s*-\s*" + INTEGER_RE
COMPARATOR_RE = r"(<|<=|>=|>)"

_INT_FULL = "^" + INTEGER_RE + "$"
_RANGE_FULL = "^" + RANGE_RE + "$"
_DEC_FULL = "^" + DECIMAL_RE + "$"
_CMP_FULL = "^" + COMPARATOR_RE + DECIMAL_RE + "$"

UCUM_SYSTEM = "http://unitsofmeasure.org"
DEFAULT_UNIT = "%"


def _strip_sign_spaces(col: Column) -> Column:
    # Python int('+ 3') fails — but the reference regex permits spaces after
    # the sign and then calls int(value_val)... int(' + 3') raises. In
    # practice int() tolerates leading/trailing whitespace but NOT an inner
    # space ('+ 3' → ValueError). The reference would crash on such input, so
    # real data never exercises it; we normalize by removing spaces, which is
    # the only total extension of the reference's partial function.
    return F.regexp_replace(col, r"\s+", "")


def value_type(result: Column) -> Column:
    """The tag: valueInteger | valueRange | valueQuantity | valueString."""
    return (
        F.when(result.rlike(_INT_FULL), F.lit("valueInteger"))
        .when(result.rlike(_RANGE_FULL), F.lit("valueRange"))
        .when(result.rlike(_DEC_FULL), F.lit("valueQuantity"))
        .when(result.rlike(_CMP_FULL), F.lit("valueQuantity"))
        .otherwise(F.lit("valueString"))
    )


def value_integer(result: Column) -> Column:
    return F.when(result.rlike(_INT_FULL), _strip_sign_spaces(result).cast("int"))


def value_range_low(result: Column) -> Column:
    return F.when(
        ~result.rlike(_INT_FULL) & result.rlike(_RANGE_FULL),
        _strip_sign_spaces(F.regexp_extract(result, _RANGE_FULL, 1)).cast("double"),
    )


def value_range_high(result: Column) -> Column:
    return F.when(
        ~result.rlike(_INT_FULL) & result.rlike(_RANGE_FULL),
        _strip_sign_spaces(F.regexp_extract(result, _RANGE_FULL, 2)).cast("double"),
    )


def value_quantity(result: Column) -> Column:
    prior = result.rlike(_INT_FULL) | result.rlike(_RANGE_FULL)
    return (
        F.when(~prior & result.rlike(_DEC_FULL), result.cast("double"))
        .when(~prior & result.rlike(_CMP_FULL), F.regexp_extract(result, _CMP_FULL, 2).cast("double"))
    )


def value_comparator(result: Column) -> Column:
    prior = result.rlike(_INT_FULL) | result.rlike(_RANGE_FULL) | result.rlike(_DEC_FULL)
    return F.when(~prior & result.rlike(_CMP_FULL), F.regexp_extract(result, _CMP_FULL, 1))


def value_string(result: Column) -> Column:
    any_typed = (
        result.rlike(_INT_FULL)
        | result.rlike(_RANGE_FULL)
        | result.rlike(_DEC_FULL)
        | result.rlike(_CMP_FULL)
    )
    return F.when(~any_typed, result)


def typed_value_struct(result: Column) -> Column:
    """The full tagged union in one struct column."""
    return F.struct(
        value_type(result).alias("value_type"),
        value_integer(result).alias("value_integer"),
        value_quantity(result).alias("value_quantity"),
        value_comparator(result).alias("value_comparator"),
        value_range_low(result).alias("value_range_low"),
        value_range_high(result).alias("value_range_high"),
        value_string(result).alias("value_string"),
    )


def effective_unit(units: Column) -> Column:
    """F12 — unit defaulting (cnics_to_fhir.py:836-855): '%' unless Units set."""
    return F.coalesce(units, F.lit(DEFAULT_UNIT))


def is_decimal_text(col: Column) -> Column:
    """F13 gate — referenceRange emitted only if low/high match decimal_re
    (cnics_to_fhir.py:856-886). NULL input → false (reference str()'s None,
    'None' doesn't match)."""
    return F.coalesce(col.rlike(_DEC_FULL), F.lit(False))


def ref_range_value(col: Column) -> Column:
    return F.when(is_decimal_text(col), col.cast("double"))
