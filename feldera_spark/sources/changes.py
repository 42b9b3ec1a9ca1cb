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
