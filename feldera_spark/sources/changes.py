"""Change-stream encoding: the ``insert_delete`` JSON envelope.

Reference: the connectors' canonical update format
(``crates/adapters/src/format/`` — JSON lines like
``{"insert": {...}}`` / ``{"delete": {...}}``; SURVEY §2.7). We normalize
it to Z-set weights (+1/−1) on ingest and can emit it back on egress, so
any Kafka/file source speaking the reference's wire format plugs straight
into the incremental evaluator.

Both directions are pure Catalyst expressions (from_json/to_json) — no
Python in the parse path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feldera_spark.zset import WEIGHT, data_columns


def decode_insert_delete(raw: DataFrame, payload_schema: T.StructType, json_col: str = "value") -> DataFrame:
    """Parse insert_delete JSON lines into weighted rows.

    ``raw`` has one string column of envelope JSON; output has the payload
    columns + ``__weight`` (+1 insert, −1 delete). Rows that are neither
    are dropped (malformed input), matching the reference's
    fail-soft decoder behavior.
    """
    env_schema = T.StructType(
        [
            T.StructField("insert", payload_schema),
            T.StructField("delete", payload_schema),
        ]
    )
    parsed = raw.select(F.from_json(F.col(json_col), env_schema).alias("e"))
    return (
        parsed.withColumn(
            WEIGHT,
            F.when(F.col("e.insert").isNotNull(), F.lit(1).cast("long")).when(
                F.col("e.delete").isNotNull(), F.lit(-1).cast("long")
            ),
        )
        .filter(F.col(WEIGHT).isNotNull())
        .withColumn("__payload", F.coalesce(F.col("e.insert"), F.col("e.delete")))
        .select("__payload.*", WEIGHT)
    )


def decode_debezium(raw: DataFrame, payload_schema: T.StructType, json_col: str = "value") -> DataFrame:
    """Parse Debezium CDC envelopes into weighted rows.

    Reference: the Debezium source connector
    (``docs/connectors/sources/debezium.md``) — ops ``c``(reate)/``r``(ead
    snapshot) → insert ``after``; ``d``(elete) → retract ``before``;
    ``u``(pdate) → retract ``before`` AND insert ``after`` (two Z-set rows,
    the upsert→delta conversion of ``input_upsert.rs``). Pure Catalyst:
    from_json + a 2-element struct array exploded JVM-side.
    """
    env_schema = T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("op", T.StringType()),
                        T.StructField("before", payload_schema),
                        T.StructField("after", payload_schema),
                    ]
                ),
            )
        ]
    )
    p = raw.select(F.from_json(F.col(json_col), env_schema).alias("e")).select("e.payload.*")
    pair = F.array(
        F.struct(F.col("before").alias("row"), F.lit(-1).cast("long").alias(WEIGHT)),
        F.struct(F.col("after").alias("row"), F.lit(1).cast("long").alias(WEIGHT)),
    )
    exploded = (
        p.withColumn(
            "__parts",
            F.when(F.col("op").isin("c", "r"), F.slice(pair, 2, 1))
            .when(F.col("op") == "d", F.slice(pair, 1, 1))
            .when(F.col("op") == "u", pair),
        )
        .filter(F.col("__parts").isNotNull())
        .select(F.explode("__parts").alias("x"))
    )
    return exploded.select("x.row.*", F.col(f"x.{WEIGHT}").alias(WEIGHT))


def decode_csv(
    raw: DataFrame,
    payload_schema: T.StructType,
    csv_col: str = "value",
    options: dict | None = None,
) -> DataFrame:
    """Parse plain CSV lines into +1-weighted rows.

    Reference CSV ingress (``crates/adapters/src/format/csv.rs``,
    ``docs/formats/csv.md``): each line is one INSERT in table-column
    order; trailing unexpected columns are discarded; unparseable
    fields become NULL / the row is dropped fail-soft. Pure Catalyst
    (``from_csv``), no Python in the parse path. Pass ``options`` for
    delimiter/quote/escape (same knobs as the reference's
    ``CsvParserConfig``)."""
    opts = {"mode": "PERMISSIVE", **(options or {})}
    parsed = raw.select(
        F.from_csv(F.col(csv_col), payload_schema.simpleString(), opts).alias(
            "r"
        )
    )
    # blank/unparseable lines come back as an all-NULL struct, not a
    # NULL struct — drop rows with no parsed field at all (fail-soft)
    any_field = F.coalesce(
        *[F.col(f"r.{f.name}").cast("string") for f in payload_schema.fields]
    )
    return (
        parsed.filter(F.col("r").isNotNull() & any_field.isNotNull())
        .select("r.*")
        .withColumn(WEIGHT, F.lit(1).cast("long"))
    )


def encode_csv(changes: DataFrame) -> DataFrame:
    """Emit weighted rows as the reference's CSV egress: the payload
    columns in order, then the weight as the trailing column
    (``csv.rs`` ``serialize_key_weight``). One line per (row, weight)
    pair — weights keep their sign, consumers apply them as deltas."""
    cols = data_columns(changes)
    return changes.filter(F.col(WEIGHT) != 0).select(
        F.to_csv(
            F.struct(*[F.col(c) for c in cols], F.col(WEIGHT))
        ).alias("value")
    )


def decode_weighted_csv(
    raw: DataFrame,
    payload_schema: T.StructType,
    csv_col: str = "value",
    options: dict | None = None,
) -> DataFrame:
    """Parse the weighted CSV egress format back into a Z-set (payload
    columns + trailing integer weight) — the round-trip consumer of
    ``encode_csv``, used when chaining pipelines over a CSV transport."""
    schema_with_w = T.StructType(
        list(payload_schema.fields) + [T.StructField(WEIGHT, T.LongType())]
    )
    opts = {"mode": "PERMISSIVE", **(options or {})}
    parsed = raw.select(
        F.from_csv(F.col(csv_col), schema_with_w.simpleString(), opts).alias("r")
    )
    return (
        parsed.filter(F.col("r").isNotNull())
        .select("r.*")
        .filter(F.col(WEIGHT).isNotNull() & (F.col(WEIGHT) != 0))
    )


def avro_available(spark) -> bool:
    """True if the spark-avro module is loaded in this session. The
    pip-distributed PySpark does not bundle it; a cluster submit adds
    ``--packages org.apache.spark:spark-avro_2.13:<ver>``."""
    try:
        from pyspark.sql.avro.functions import from_avro

        df = spark.createDataFrame([(bytearray(b"\x00"),)], "value BINARY")
        df.select(
            from_avro(
                "value",
                '{"type":"record","name":"r","fields":'
                '[{"name":"a","type":"int"}]}',
            )
        ).collect()
        return True
    except Exception:
        return False


def decode_avro(
    raw: DataFrame,
    avro_json_schema: str,
    update_format: str = "raw",
    value_col: str = "value",
) -> DataFrame:
    """Parse Avro-encoded change events into weighted rows.

    Reference Avro ingress (``crates/adapters/src/format/avro.rs``,
    ``docs/formats/avro.md``): ``update_format="raw"`` treats each
    record as an insert; ``"debezium"`` expects the Debezium envelope
    (op/before/after) and emits retract+insert pairs for updates.
    ``avro_json_schema`` is the writer schema as a JSON string (the
    schema-registry path resolves to the same thing). Requires the
    spark-avro module — probe with ``avro_available(spark)``; raises
    RuntimeError when it is not loaded (it is not bundled with
    pip-installed PySpark; clusters add the spark-avro package)."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("spark-avro module not available") from e
    if update_format not in ("raw", "debezium"):
        raise ValueError(f"unknown avro update_format: {update_format}")
    opts = {"mode": "PERMISSIVE"}
    decoded = raw.select(
        from_avro(F.col(value_col), avro_json_schema, opts).alias("r")
    )
    if update_format == "raw":
        return (
            decoded.filter(F.col("r").isNotNull())
            .select("r.*")
            .withColumn(WEIGHT, F.lit(1).cast("long"))
        )
    # debezium over avro: same op/before/after algebra as the JSON path
    p = decoded.select("r.*")
    pair = F.array(
        F.struct(F.col("before").alias("row"), F.lit(-1).cast("long").alias(WEIGHT)),
        F.struct(F.col("after").alias("row"), F.lit(1).cast("long").alias(WEIGHT)),
    )
    exploded = (
        p.withColumn(
            "__parts",
            F.when(F.col("op").isin("c", "r"), F.slice(pair, 2, 1))
            .when(F.col("op") == "d", F.slice(pair, 1, 1))
            .when(F.col("op") == "u", pair),
        )
        .filter(F.col("__parts").isNotNull())
        .select(F.explode("__parts").alias("x"))
    )
    return exploded.select("x.row.*", F.col(f"x.{WEIGHT}").alias(WEIGHT))


def encode_insert_delete(changes: DataFrame) -> DataFrame:
    """Emit weighted rows as insert_delete envelope JSON lines.

    Weights with |w| > 1 are emitted as repeated envelopes (explode —
    stays JVM-side), matching multiset semantics on the wire.
    """
    cols = data_columns(changes)
    payload = F.struct(*[F.col(c) for c in cols])
    return (
        changes.filter(F.col(WEIGHT) != 0)
        .withColumn(
            "__rep", F.explode(F.expr(f"sequence(1, abs({WEIGHT}))"))
        )
        .select(
            F.when(
                F.col(WEIGHT) > 0,
                F.to_json(F.struct(payload.alias("insert"))),
            )
            .otherwise(F.to_json(F.struct(payload.alias("delete"))))
            .alias("value")
        )
    )
