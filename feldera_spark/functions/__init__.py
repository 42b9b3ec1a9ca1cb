"""Scalar function dialect layer — the gaps between the reference's SQL
dialect (``crates/sqllib``, ``docs/sql/function-index.md``) and built-in
Spark functions (SURVEY §2.9: everything else maps 1:1 to
``pyspark.sql.functions``).

All shims are pure Column expressions (JVM-side, codegen-friendly),
with ONE exception: ``gunzip`` is an Arrow-batched pandas UDF — byte
decompression has no Spark built-in (and is never in a relational hot
path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- portable deterministic hashing -----------------------------------------

def md5_i64(col) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT.

    Portable across engines (DuckDB: ``('0x'||substr(md5(x),1,15))::BIGINT``);
    used by dedup/LSH operators so oracles can reproduce signatures exactly.
    """
    return F.conv(F.substring(F.md5(F.encode(_c(col), "UTF-8")), 1, 15), 16, 10).cast(
        "long"
    )


MD5_I64_SQL = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"  # DuckDB twin


# --- numeric gaps (float.rs trig/misc not in Spark) -------------------------

def sec(col) -> Column:
    return F.lit(1.0) / F.cos(_c(col))


def csc(col) -> Column:
    return F.lit(1.0) / F.sin(_c(col))


def coth(col) -> Column:
    return F.cosh(_c(col)) / F.sinh(_c(col))


def sech(col) -> Column:
    return F.lit(1.0) / F.cosh(_c(col))


def csch(col) -> Column:
    return F.lit(1.0) / F.sinh(_c(col))


def div_null(a, b) -> Column:
    """DIV_NULL: NULL on division by zero (sqllib operators.rs)."""
    return F.try_divide(_c(a), _c(b))


def is_inf(col) -> Column:
    return _c(col).isin(float("inf"), float("-inf"))


def finite_or_null(col) -> Column:
    c = _c(col)
    return F.when(~(F.isnan(c) | is_inf(c)), c)


# --- timestamp gaps ---------------------------------------------------------

def floor_ts(col, unit: str) -> Column:
    """FLOOR(ts TO unit) / *_TRUNC (timestamp.rs floor_*/trunc families),
    session-timezone-independent on TIMESTAMP_NTZ (Spark's date_trunc is
    NOT — it coerces NTZ through the session zone)."""
    c = _c(col)
    unit = unit.lower()
    if unit in ("year", "month"):
        return F.trunc(c.cast("date"), unit).cast("timestamp_ntz")
    if unit == "day":
        return c.cast("date").cast("timestamp_ntz")
    if unit in ("hour", "minute"):
        parts = [F.year(c), F.month(c), F.dayofmonth(c), F.hour(c)]
        parts.append(F.minute(c) if unit == "minute" else F.lit(0))
        parts.append(F.lit(0).cast("decimal(16,6)"))
        return F.make_timestamp_ntz(*parts)
    raise ValueError(f"unsupported unit {unit}")


def ceil_ts(col, unit: str) -> Column:
    """CEIL(ts TO unit) (timestamp.rs ceil_* family): round a timestamp up
    to the unit boundary (identity when already on the boundary)."""
    c = _c(col)
    truncated = floor_ts(c, unit)
    one = F.expr(f"INTERVAL 1 {unit}")
    return F.when(truncated == c, c).otherwise(truncated + one)


def ms_to_timestamp(col) -> Column:
    """Feldera CAST(int AS TIMESTAMP) treats the int as MILLISECONDS
    (docs/sql/ad-hoc.md:36-39); Spark's cast uses seconds. Explicit shim."""
    return F.timestamp_millis(_c(col).cast("long"))


def timestamp_to_ms(col) -> Column:
    return F.unix_millis(_c(col).cast("timestamp"))


# --- misc -------------------------------------------------------------------

def gunzip(col) -> Column:
    """GUNZIP(binary) → VARCHAR (``sqllib`` ``binary.rs`` ``gunzip``):
    decompress a gzip-compressed byte string. No Spark built-in exists,
    so this is the one legitimate pandas-UDF scalar in the dialect
    layer — Arrow-batched, zlib (stdlib) per batch, NULL for NULL input
    and for malformed streams (the reference's SAFE flavor returns NULL;
    its plain flavor errors — callers wanting errors can wrap with an
    assert). wbits=47 accepts both gzip and zlib headers."""
    from pyspark.sql.functions import pandas_udf

    def _gunzip(s):
        import zlib

        def one(v):
            if v is None:
                return None
            try:
                return zlib.decompress(bytes(v), 47).decode("utf-8")
            except Exception:
                return None

        return s.map(one)

    # no type hints: module uses `from __future__ import annotations`,
    # which stringifies them beyond pandas_udf's resolver
    return pandas_udf(_gunzip, "string")(_c(col))


def to_unsigned(col, bits: int) -> Column:
    """Unsigned-int gap shim (program_schema.rs:474-481): widen to the
    next signed type + range CHECK; out-of-range → NULL (SAFE_CAST
    flavor — the reference errors on plain CAST, returns NULL on
    SAFE_CAST)."""
    c = _c(col).cast("long")
    hi = (1 << bits) - 1
    return F.when((c >= 0) & (c <= hi), c)


def time_of_day(col) -> Column:
    """TIME-type gap shim (SURVEY §1.2): Spark has no TIME type; the
    engine-portable representation is the 'HH:mm:ss' string (lossless to
    second precision, orderable, castable back via to_timestamp)."""
    return F.date_format(_c(col), "HH:mm:ss")


# --- JSON_EACH_<type> family (sqllib variant.rs; docs/sql/json.md) ----------

def _json_each(col, schemas: tuple[str, ...], target: str) -> Column:
    """Shared core of the ``JSON_EACH_<type>`` family
    (``docs/sql/json.md#json_each``): from a JSON object, the fields
    whose RUNTIME type matches — selected by the value's variant schema,
    never parsed from strings (a field holding ``"7"`` is not a BIGINT
    field; ``2.5`` is not truncated into one). Pure Catalyst: VariantType
    map + ``schema_of_variant`` dispatch + ``variant_get`` extraction."""
    m = F.from_json(_c(col).cast("string"), "map<string, variant>")
    keep = F.map_filter(
        m, lambda k, v: F.schema_of_variant(v).isin(*schemas)
    )
    return F.transform_values(
        keep, lambda k, v: F.try_variant_get(v, "$", target)
    )


def json_each_bigint(col) -> Column:
    """JSON_EACH_BIGINT: MAP<VARCHAR, BIGINT> of the integer-valued
    fields (no fractional truncation, no string parsing)."""
    return _json_each(col, ("BIGINT", "INT", "SMALLINT", "TINYINT"), "bigint")


def json_each_string(col) -> Column:
    """JSON_EACH_STRING: MAP<VARCHAR, VARCHAR> of the string-valued
    fields (numbers are NOT stringified)."""
    return _json_each(col, ("STRING",), "string")


def json_each_boolean(col) -> Column:
    """JSON_EACH_BOOLEAN: MAP<VARCHAR, BOOLEAN> of the boolean fields."""
    return _json_each(col, ("BOOLEAN",), "boolean")
