"""Sink adapters: Iceberg when a catalog is configured, parquet otherwise.

The production contract (north rule) writes each route's stream to an
Iceberg table partitioned by days(ts) + bucket(conv_id) — atomic snapshot
commits give the transactional exactly-once the reference's exporter
sending-queues approximate with retries (exporter/fileexporter,
exporterhelper queued_retry). In-sandbox there is no Iceberg runtime jar,
so the same interface degrades to Hive-layout parquet + the JSON lineage
manifest (plans/lineage.py), which implements the identical
resume contract.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath + configured."""
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:  # noqa: BLE001
        return False
    confs = spark.conf
    try:
        return any(
            confs.get(f"spark.sql.catalog.{name}", None) is not None for name in ("iceberg", "spark_catalog", "local")
        )
    except Exception:  # noqa: BLE001
        return False


def write_sink(
    df: DataFrame,
    target: str,
    mode: str = "append",
    partition_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> str:
    """Write one sink. `target` = Iceberg table name (catalog.db.table) when
    Iceberg is available and the name has no '/', else a filesystem path.

    Iceberg path: `writeTo(target).append()` — snapshot-atomic; partitioning
    comes from the table's partition spec (days(ts), bucket(conv_id)) set at
    table creation, so writers need no layout knowledge.
    Parquet path: Hive layout via partitionBy, directory-atomic per task
    commit + lineage manifest for resume.

    Rotation/compression (fileexporter/config.go:55-96 equivalence):
    `rotation.max_megabytes` caps output file size — columnar analogue is
    `max_records_per_file` (spark maxRecordsPerFile: a task rolls to a new
    file at N records); `compression: zstd` maps to the parquet codec, which
    compresses inside the format instead of wrapping the file."""
    spark = df.sparkSession
    if "/" not in target and iceberg_available(spark):
        writer = df.writeTo(target)
        if mode == "overwrite":
            writer.replace()
        else:
            writer.append()
        return target
    w = df.write.mode("overwrite" if mode == "overwrite" else "append")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if compression is not None:
        w = w.option("compression", compression)
    w.parquet(target)
    return target


# --- kafka exporter (exporter/kafkaexporter) ---------------------------------


def kafka_sink_frame(
    df: DataFrame,
    key_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
):
    """Shape a DataFrame into the Kafka sink contract: `key` (bytes) +
    `value` (JSON bytes). The key drives the broker-side partitioner —
    keying on conv_id reproduces kafkaexporter/partitioner.go's
    partition-by-trace-id co-location (all of a conversation's records land
    in one Kafka partition, preserving intra-conv order)."""
    from pyspark.sql import functions as F

    value_src = df.select(*value_cols) if value_cols else df
    value = F.to_json(F.struct(*[F.col(c) for c in value_src.columns]))
    out = df.select(
        (
            F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols]).cast("binary")
            if key_cols
            else F.lit(None).cast("binary")
        ).alias("key"),
        value.cast("binary").alias("value"),
    )
    return out


def write_kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
) -> None:
    """Kafka exporter write path: format('kafka') batch write of the
    key/value frame. Gated the same way as the Kafka source — no broker
    exists in-sandbox, so tests cover the frame contract and option
    validation; on a cluster this call is the complete writer."""
    if not bootstrap_servers:
        raise ValueError("kafka sink requires bootstrap_servers")
    if not topic:
        raise ValueError("kafka sink requires a topic")
    frame = kafka_sink_frame(df, key_cols, value_cols)
    (
        frame.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


# --- failover connector (connector/failoverconnector/failover.go) ------------


def failover_write(
    df: DataFrame,
    targets: list[str],
    write=write_sink,
    **write_kwargs,
) -> dict:
    """Priority failover between sinks (failoverconnector README
    `priority_levels`; failover.go:60 builds one consumer per level and the
    pipeline selector moves to the next level on consume error).

    Batch analogue: attempt the write at each priority level in order; the
    first level that commits wins and the result records which level served
    the batch plus the per-level errors. The reference's `retry_interval`
    re-probing of higher levels maps to batch cadence — every new batch
    starts again at priority 0, so a recovered primary is retried on the
    next run without extra machinery.
    """
    errors: dict[str, str] = {}
    for level, target in enumerate(targets):
        try:
            path = write(df, target, **write_kwargs)
            return {"level": level, "target": target, "path": path, "errors": errors}
        except Exception as e:  # noqa: BLE001 — any sink failure falls through
            errors[target] = f"{type(e).__name__}: {e}"
    raise RuntimeError(f"all {len(targets)} failover levels failed: {errors}")


# --- exporterhelper retry/queue analogue (round 4) ---------------------------


def retry_write(
    df: DataFrame,
    target: str,
    batch_id: str,
    write=write_sink,
    max_retries: int = 4,
    initial_interval_s: float = 5.0,
    multiplier: float = 1.5,
    max_interval_s: float = 30.0,
    ledger_dir: str | None = None,
    dlq_dir: str | None = None,
    sleep=None,
    **write_kwargs,
) -> dict:
    """Bounded-retry delivery with exponential backoff and a persistent
    ledger — the batch analogue of the collector's exporterhelper
    sending-queue + configretry contract (public semantics: retry the
    batch at initial_interval × multiplier^n capped at max_interval;
    exhaustion drops the batch — except here the drop is NEVER silent: the
    rows land in a parquet quarantine with the failure reason, the DLQ
    discipline the rest of this repo's contracts use).

    The JSON ledger (one file per batch_id under ``ledger_dir``) is the
    persistent-queue half: a rerun that finds the batch recorded as
    ``committed`` is a no-op (idempotent resume, same contract as the
    lineage manifest), a ``quarantined`` batch is not re-attempted, and
    anything else retries from scratch. ``sleep`` is injectable for tests;
    the backoff schedule is deterministic (no randomization_factor jitter —
    batch reruns want reproducibility, and jitter exists to de-thunder
    herds of streaming senders, not batch jobs)."""
    import json
    import os
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep
    ledger_path = None
    if ledger_dir:
        os.makedirs(ledger_dir, exist_ok=True)
        ledger_path = os.path.join(ledger_dir, f"retry_{batch_id}.json")
        if os.path.exists(ledger_path):
            with open(ledger_path) as f:
                prior = json.load(f)
            if prior.get("status") in ("committed", "quarantined"):
                return {**prior, "skipped": True}

    def record(entry: dict) -> dict:
        if ledger_path:
            tmp = ledger_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(entry, f)
            os.replace(tmp, ledger_path)
        return entry

    errors: list[str] = []
    interval = initial_interval_s
    for attempt in range(max_retries + 1):
        if attempt > 0:
            do_sleep(interval)
            interval = min(interval * multiplier, max_interval_s)
        try:
            path = write(df, target, **write_kwargs)
            return record(
                {
                    "status": "committed",
                    "batch_id": batch_id,
                    "target": target,
                    "path": path,
                    "attempts": attempt + 1,
                    "errors": errors,
                }
            )
        except Exception as e:  # noqa: BLE001 — every sink failure is retryable here
            errors.append(f"{type(e).__name__}: {e}")
    reason = errors[-1] if errors else "unknown"
    dlq_path = None
    if dlq_dir:
        from pyspark.sql import functions as F

        dlq_path = os.path.join(dlq_dir, f"batch_{batch_id}")
        (
            df.withColumn("dlq_reason", F.lit(f"retry_exhausted: {reason}"))
            .withColumn("dlq_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(dlq_path)
        )
    return record(
        {
            "status": "quarantined",
            "batch_id": batch_id,
            "target": target,
            "path": dlq_path,
            "attempts": max_retries + 1,
            "errors": errors,
        }
    )


# --- kafka partitioner algebra (exporter/kafkaexporter/partitioner.go) -------
# The broker is out of reach in-sandbox; the partition ASSIGNMENT — the part
# that decides co-location and ordering — is pure algebra and implemented
# exactly: sticky_key with the sarama-compat hasher (FNV-1a 32,
# internal/kafka/franz_client.go:463-473, abs-value sign convention) or
# Kafka's Java-default murmur2 (& 0x7fffffff mask), plus round_robin.


def fnv1a32(data: bytes) -> int:
    h = 0x811C9DC5
    for b in data:
        h ^= b
        h = (h * 0x01000193) & 0xFFFFFFFF
    return h


def murmur2_kafka(data: bytes) -> int:
    """Kafka's Utils.murmur2 (seed 0x9747b28c, m=0x5bd1e995, r=24) — the
    Java client's default sticky-key hash."""
    m = 0x5BD1E995
    length = len(data)
    h = (0x9747B28C ^ length) & 0xFFFFFFFF
    i = 0
    while length - i >= 4:
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> 24
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
        i += 4
    rest = length - i
    if rest >= 3:
        h ^= data[i + 2] << 16
    if rest >= 2:
        h ^= data[i + 1] << 8
    if rest >= 1:
        h ^= data[i]
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def kafka_partition_for(key: bytes, n_partitions: int, hasher: str = "murmur2") -> int:
    if hasher == "murmur2":
        return (murmur2_kafka(key) & 0x7FFFFFFF) % n_partitions
    if hasher == "sarama_compat":
        # sarama's sign convention: interpret FNV-1a as int32, negate if < 0
        h = fnv1a32(key)
        signed = h - (1 << 32) if h >= (1 << 31) else h
        p = signed % n_partitions if signed >= 0 else -((-signed) % n_partitions)
        return -p if p < 0 else p
    raise ValueError(f"unknown sticky key hasher type {hasher!r}")


def kafka_partitions(df, key_col: str, n_partitions: int, hasher: str = "murmur2"):
    """Add the `kafka_partition` each row's key lands on — the exporter's
    sticky_key routing as a column, so a write can `repartition` on it and
    produce exactly the broker-side co-location the reference's producer
    would. Arrow-batched (the hashes are byte-loop algorithms with no
    native Spark expression)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("int")
    def part(keys: pd.Series) -> pd.Series:
        return keys.map(
            lambda k: kafka_partition_for(
                k if isinstance(k, bytes) else str(k).encode("utf-8"), n_partitions, hasher
            )
            if k is not None
            else None
        )

    return df.withColumn("kafka_partition", part(F.col(key_col)))
