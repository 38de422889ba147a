"""Kafka tail configuration (≈ KafkaSource offset semantics,
gobblin-modules/gobblin-kafka-common/.../kafka/KafkaSource.java:544-683).

Spark's Kafka source implements the reference's whole offset state machine —
bootstrap-with-earliest/latest, out-of-range reset, per-partition resume —
as options; this module maps the reference's knobs onto them. No Kafka
broker exists in the sandbox, so only the option construction is tested;
``stream`` is the production path:

    df = spark.readStream.format("kafka").options(**kafka_stream_options(...)).load()

and the payload feeds the SAME foreachBatch body as the file tail
(streaming.tail_changelog) — the engine is source-agnostic past the plan.
"""

from __future__ import annotations

import json


def kafka_stream_options(
    brokers: str,
    topics: str | list[str],
    starting_offsets: str | dict = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Map reference semantics to Spark Kafka-source options:

    - bootstrap earliest/latest (KafkaSource.java:594-614) →
      ``startingOffsets``; per-partition resume (committed watermarks) →
      the same option as a {topic: {partition: offset}} JSON;
    - out-of-range reset nearest/earliest (:624-683) → ``failOnDataLoss``
      false (skip-and-continue) or true (abort, ≈ reset-to-nearest absent);
    - work-unit size cap (packer capacity) → ``maxOffsetsPerTrigger``.
    """
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": ",".join(topics) if isinstance(topics, list) else topics,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if isinstance(starting_offsets, dict):
        opts["startingOffsets"] = json.dumps(starting_offsets)
    else:
        if starting_offsets not in ("earliest", "latest"):
            raise ValueError("starting_offsets must be earliest/latest or a dict")
        opts["startingOffsets"] = starting_offsets
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts
