"""Connector wiring: the reference's transport+format connector config
mapped onto Spark sources/sinks.

Reference: a table's ``connectors`` property is a list of
``{"transport": {"name": ..., "config": {...}}, "format": {"name": ...,
"config": {...}}}`` objects (``docs/connectors/``,
``crates/adapters/src/transport/``). This module translates that shape:

- transport → a Spark (streaming) reader: ``file_input``/``url_input``/
  ``s3_input`` → path-based ``readStream``; ``kafka_input`` →
  ``format("kafka")`` with the option mapping below; ``datagen`` → the
  synthetic source (sources/datagen.py).
- format → the change-codec layer (sources/changes.py):
  ``json`` (insert_delete / debezium envelopes), ``csv`` (plain-insert
  lines or weighted egress), ``avro`` (raw/debezium — needs spark-avro),
  ``parquet``/``raw`` (records as inserts).

The option-mapping functions are pure (dict → dict) so they are testable
without the corresponding Spark packages; ``open_source`` raises a clear
error when a transport's package is not loaded (kafka/delta are cluster
submit-time ``--packages``, not bundled with pip PySpark).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from feldera_spark.sources import changes as _changes


@dataclass
class ConnectorConfig:
    """One entry of a table/view ``connectors`` list."""

    transport: str
    transport_config: dict[str, Any] = field(default_factory=dict)
    format: str = "json"
    format_config: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "ConnectorConfig":
        return cls(
            transport=d["transport"]["name"],
            transport_config=d["transport"].get("config", {}),
            format=d.get("format", {}).get("name", "json"),
            format_config=d.get("format", {}).get("config", {}),
        )


def kafka_reader_options(config: dict[str, Any]) -> dict[str, str]:
    """Map the reference's ``kafka_input`` config keys
    (``docs/connectors/sources/kafka.md``) to Spark's kafka source
    options. Pure function — unit-testable without the kafka package."""
    opts: dict[str, str] = {}
    if "bootstrap.servers" in config:
        opts["kafka.bootstrap.servers"] = config["bootstrap.servers"]
    if "topic" in config:
        opts["subscribe"] = config["topic"]
    if "topics" in config:
        opts["subscribe"] = ",".join(config["topics"])
    start = config.get("start_from", "latest")
    if start in ("earliest", "latest"):
        opts["startingOffsets"] = start
    elif isinstance(start, dict) and "timestamp" in start:
        opts["startingTimestamp"] = str(start["timestamp"])
    elif isinstance(start, dict) and "offsets" in start:
        import json as _json

        topic = config.get("topic", "")
        opts["startingOffsets"] = _json.dumps(
            {topic: {str(i): off for i, off in enumerate(start["offsets"])}}
        )
    # librdkafka passthrough keys keep their meaning under Spark's kafka.*
    for k, v in config.items():
        if "." in k and k not in ("bootstrap.servers",):
            opts.setdefault(f"kafka.{k}", str(v))
    return opts


def kafka_writer_options(config: dict[str, Any]) -> dict[str, str]:
    """Map the reference's ``kafka_output`` sink config
    (``docs/connectors/sinks/kafka.md``) to Spark's kafka SINK options.
    Pure function — unit-testable without the kafka package; the jar is
    a cluster submit-time ``--packages``."""
    opts: dict[str, str] = {}
    if "bootstrap.servers" in config:
        opts["kafka.bootstrap.servers"] = config["bootstrap.servers"]
    if "topic" in config:
        opts["topic"] = config["topic"]
    for k, v in config.items():
        if "." in k and k not in ("bootstrap.servers",):
            opts.setdefault(f"kafka.{k}", str(v))
    return opts


def jdbc_writer_options(config: dict[str, Any]) -> dict[str, str]:
    """Postgres/JDBC sink (``docs/connectors/sinks/postgresql.md``,
    ``crates/adapters/src/integrated/postgres/``): url/table/user →
    Spark's built-in jdbc writer options. Change-stream egress writes
    the weighted rows; a MERGE-style upsert consumer applies them."""
    opts = {"url": config["url"], "dbtable": config["table"]}
    for k in ("user", "password", "driver", "batchsize",
              "isolationLevel", "numPartitions"):
        if k in config:
            opts[k] = str(config[k])
    return opts


def snowflake_writer_options(config: dict[str, Any]) -> dict[str, str]:
    """Snowflake sink (``docs/connectors/sinks/snowflake.md``) → the
    public spark-snowflake connector's option names (sfURL/sfDatabase/
    sfSchema/sfWarehouse/dbtable). Pure mapping; the connector jar is a
    cluster-level dependency."""
    m = {"account_url": "sfURL", "user": "sfUser", "password": "sfPassword",
         "database": "sfDatabase", "schema": "sfSchema",
         "warehouse": "sfWarehouse", "role": "sfRole", "table": "dbtable"}
    return {m[k]: str(v) for k, v in config.items() if k in m}


def pubsub_lite_reader_options(config: dict[str, Any]) -> dict[str, str]:
    """Google Pub/Sub source (``docs/connectors/sources/pubsub.md``,
    ``crates/adapters/src/transport/pubsub/``) → the public
    pubsublite-spark connector's options (subscription path assembled
    from project/location/subscription)."""
    sub = config.get("subscription_path") or (
        f"projects/{config['project_id']}/locations/"
        f"{config['location']}/subscriptions/{config['subscription']}"
    )
    opts = {"pubsublite.subscription": sub}
    if "flow_control_bytes" in config:
        opts["pubsublite.flowcontrol.byteoutstandingperpartition"] = str(
            config["flow_control_bytes"]
        )
    return opts


def jdbc_reader_options(config: dict[str, Any]) -> dict[str, str]:
    """Postgres/JDBC input (the reference's datagen-free DB sources):
    url/table/user/password → Spark jdbc options."""
    opts = {"url": config["url"], "dbtable": config["table"]}
    for k in ("user", "password", "driver", "numPartitions",
              "partitionColumn", "lowerBound", "upperBound"):
        if k in config:
            opts[k] = str(config[k])
    return opts


def _decode(
    raw: DataFrame, fmt: str, fmt_config: dict, schema: T.StructType
) -> DataFrame:
    update = fmt_config.get("update_format", "insert_delete")
    if fmt == "json":
        if update == "debezium":
            return _changes.decode_debezium(raw, schema)
        if update == "raw":
            from pyspark.sql import functions as F

            parsed = raw.select(F.from_json("value", schema).alias("r"))
            return (
                parsed.filter(F.col("r").isNotNull())
                .select("r.*")
                .withColumn(_changes.WEIGHT, F.lit(1).cast("long"))
            )
        return _changes.decode_insert_delete(raw, schema)
    if fmt == "csv":
        if update == "weighted":
            return _changes.decode_weighted_csv(
                raw, schema, options=fmt_config.get("options")
            )
        return _changes.decode_csv(raw, schema, options=fmt_config.get("options"))
    if fmt == "avro":
        return _changes.decode_avro(
            raw,
            fmt_config["schema"],
            update_format=fmt_config.get("update_format", "raw"),
        )
    raise ValueError(f"unsupported format: {fmt}")


def open_source(
    spark,
    config: ConnectorConfig | dict,
    schema: T.StructType,
    streaming: bool = True,
) -> DataFrame:
    """Open a connector as a (streaming) DataFrame of weighted changes.

    File-family transports read line transports (text) and hand lines to
    the format codec; record transports (parquet) are direct inserts.
    Kafka maps the value column through the codec — identical decode
    path, which is the point: the envelope layer is transport-agnostic,
    as in the reference's adapter stack.
    """
    if isinstance(config, dict):
        config = ConnectorConfig.from_dict(config)
    tname = config.transport
    tc = config.transport_config
    if tname in ("file_input", "url_input", "s3_input"):
        path = tc.get("path") or tc.get("url") or tc.get("uri")
        if config.format == "parquet":
            from pyspark.sql import functions as F

            reader = (
                spark.readStream.schema(schema) if streaming else spark.read
            )
            df = reader.parquet(path)
            return df.withColumn(_changes.WEIGHT, F.lit(1).cast("long"))
        reader = spark.readStream if streaming else spark.read
        raw = reader.text(path).withColumnRenamed("value", "value")
        return _decode(raw, config.format, config.format_config, schema)
    if tname == "kafka_input":
        opts = kafka_reader_options(tc)
        from pyspark.sql import functions as F

        reader = spark.readStream if streaming else spark.read
        try:
            raw = reader.format("kafka").options(**opts).load()
        except Exception as e:
            raise RuntimeError(
                "kafka source requires the spark-sql-kafka package "
                "(cluster submit: --packages org.apache.spark:"
                "spark-sql-kafka-0-10_2.13:<ver>)"
            ) from e
        raw = raw.select(F.col("value").cast("string").alias("value"))
        return _decode(raw, config.format, config.format_config, schema)
    if tname == "delta_table_input":
        # Reference: integrated delta connector (``docs/connectors/
        # sources/delta.md``, ``crates/adapters/.../delta_table/``).
        # mode=snapshot → batch read; follow/snapshot_and_follow →
        # Delta's own changefeed via readStream. Rows are inserts; CDC
        # mode maps the delete predicate to negative weights.
        from pyspark.sql import functions as F

        mode = tc.get("mode", "snapshot")
        try:
            if mode == "snapshot":
                reader = spark.read.format("delta")
                if "version" in tc:
                    reader = reader.option("versionAsOf", str(tc["version"]))
                if "datetime" in tc:
                    reader = reader.option("timestampAsOf", tc["datetime"])
                df = reader.load(tc["uri"])
            else:  # follow / snapshot_and_follow / cdc
                reader = spark.readStream.format("delta")
                if mode == "follow":
                    reader = reader.option("skipInitialSnapshot", "true")
                df = reader.load(tc["uri"])
        except Exception as e:
            # delta-spark absent: local/file tables fall back to the
            # built-in Delta PROTOCOL reader (JSON log + parquet —
            # sources/delta_log.py; round-5 verdict task #9). Snapshot
            # mode only here; follow/cdc callers use delta_log.changes
            # directly (see Pipeline docs) — streaming needs the
            # package's source.
            if mode == "snapshot" and tc.get("uri", "").lstrip(
                "file:/"
            ) != "" and "://" not in tc.get("uri", "").removeprefix(
                "file://"
            ):
                from feldera_spark.sources import delta_log

                try:
                    df = delta_log.snapshot(
                        spark, tc["uri"], tc.get("version")
                    )
                except FileNotFoundError:
                    raise RuntimeError(
                        "delta source requires the delta-spark package "
                        "(cluster submit: --packages "
                        "io.delta:delta-spark_2.13:<ver>)"
                    ) from e
            else:
                raise RuntimeError(
                    "delta source requires the delta-spark package "
                    "(cluster submit: --packages "
                    "io.delta:delta-spark_2.13:<ver>)"
                ) from e
        if "snapshot_filter" in tc:
            df = df.filter(tc["snapshot_filter"])
        if mode == "cdc" and "cdc_delete_filter" in tc:
            w = F.when(F.expr(tc["cdc_delete_filter"]), F.lit(-1)).otherwise(
                F.lit(1)
            )
            return df.withColumn(_changes.WEIGHT, w.cast("long"))
        return df.withColumn(_changes.WEIGHT, F.lit(1).cast("long"))
    if tname == "iceberg_input":
        # docs/connectors/sources/iceberg.md — snapshot reads; catalog
        # configuration is spark-conf-level (spark.sql.catalog.*).
        from pyspark.sql import functions as F

        try:
            reader = spark.read.format("iceberg")
            if "snapshot_id" in tc:
                reader = reader.option("snapshot-id", str(tc["snapshot_id"]))
            if "datetime" in tc:
                reader = reader.option("as-of-timestamp", tc["datetime"])
            df = reader.load(tc.get("table") or tc.get("metadata_location"))
        except Exception as e:
            raise RuntimeError(
                "iceberg source requires the iceberg-spark-runtime package"
            ) from e
        return df.withColumn(_changes.WEIGHT, F.lit(1).cast("long"))
    if tname == "jdbc_input":
        if streaming:
            raise ValueError("jdbc transport is batch-only")
        from pyspark.sql import functions as F

        df = spark.read.format("jdbc").options(**jdbc_reader_options(tc)).load()
        return df.withColumn(_changes.WEIGHT, F.lit(1).cast("long"))
    raise ValueError(f"unsupported transport: {tname}")


def open_sink(changes: DataFrame, config: ConnectorConfig | dict):
    """Write a stream/batch of weighted changes through a connector.

    Returns the started StreamingQuery (streaming input) or None (batch
    write completed). Formats mirror the sources: json → insert_delete
    envelope lines, csv → weighted csv lines, parquet → raw rows with
    the weight column (the ad-hoc output path handles consolidated
    snapshots; this is the change-stream egress)."""
    if isinstance(config, dict):
        config = ConnectorConfig.from_dict(config)
    tname = config.transport
    tc = config.transport_config
    if tname == "kafka_output":
        out = _changes.encode_insert_delete(changes)
        opts = kafka_writer_options(tc)
        try:
            if out.isStreaming:
                w = out.writeStream.format("kafka").options(**opts)
                if "checkpoint" in tc:
                    w = w.option("checkpointLocation", tc["checkpoint"])
                return w.start()
            out.write.format("kafka").options(**opts).save()
            return None
        except Exception as e:
            raise RuntimeError(
                "kafka sink requires the spark-sql-kafka package "
                "(cluster submit: --packages org.apache.spark:"
                "spark-sql-kafka-0-10_2.13:<ver>)"
            ) from e
    if tname == "postgres_output":
        if changes.isStreaming:
            raise ValueError(
                "postgres sink is batch-per-snapshot (stream via "
                "foreachBatch over the pipeline's output deltas)"
            )
        changes.write.format("jdbc").options(
            **jdbc_writer_options(tc)
        ).mode(tc.get("mode", "append")).save()
        return None
    if tname == "snowflake_output":
        if changes.isStreaming:
            raise ValueError("snowflake sink is batch-per-snapshot")
        try:
            changes.write.format("net.snowflake.spark.snowflake").options(
                **snowflake_writer_options(tc)
            ).mode(tc.get("mode", "append")).save()
        except Exception as e:
            raise RuntimeError(
                "snowflake sink requires the spark-snowflake connector"
            ) from e
        return None
    if tname not in ("file_output",):
        raise ValueError(f"unsupported sink transport: {tname}")
    path = tc["path"]
    if config.format == "json":
        out = _changes.encode_insert_delete(changes)
        writer_fmt = "text"
    elif config.format == "csv":
        out = _changes.encode_csv(changes)
        writer_fmt = "text"
    elif config.format == "parquet":
        out, writer_fmt = changes, "parquet"
    else:
        raise ValueError(f"unsupported sink format: {config.format}")
    if out.isStreaming:
        w = out.writeStream.format(writer_fmt).option("path", path)
        if "checkpoint" in tc:
            w = w.option("checkpointLocation", tc["checkpoint"])
        return w.start()
    out.write.mode(tc.get("mode", "append")).format(writer_fmt).save(path)
    return None
