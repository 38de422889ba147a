"""Source connectors: incremental planning + reading, re-expressing the
reference's Source/Extractor contract (gobblin-api/.../source/Source.java:44)
as planner functions + ``spark.read``/``spark.readStream`` invocations."""

from .filebased import FileSnapshotSource  # noqa: F401
from .jdbc import plan_query_partitions, watermark_predicates  # noqa: F401
from .kafka import (  # noqa: F401
    KAFKA_WIRE_SCHEMA,
    kafka_stream_options,
    kafka_wire_to_changelog,
    starting_offsets_from_watermarks,
    tail_kafka,
)
