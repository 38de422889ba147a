"""Gobblin ``.pull`` job-file compatibility: parse the reference's job spec
format and run it on this engine.

The reference's user interface is a java-properties job file (``.pull`` /
``.job``; loaded by gobblin-utility PullFileLoader.java:70 via
commons-configuration) whose well-known keys are the constants in
gobblin-api ConfigurationKeys.java. This module honors those exact keys —
``source.class``, ``converter.classes``, ``qualitychecker.row.policies``,
``bootstrap.with.offset``, ``state.store.dir``, ``data.publisher.final.dir``,
``writer.staging.dir`` … — so a reference user's existing job file drives
this engine unchanged where the semantics map:

- ``source.class`` ending in a Kafka source class selects the CDC ingest
  path (CdcEngine over a changelog; on a real cluster ``kafka.brokers`` +
  ``topic.whitelist`` feed ``sources.kafka.tail_kafka``, in this sandbox the
  broker-less stand-in is a changelog parquet directory via the extension
  key ``gobblin_spark.changelog.dir``).
- file-based source classes (``SimpleJsonSource``, ``FileBasedSource``)
  select the incremental snapshot-diff file job (FileSnapshotSource →
  converter chain → row-policy divert → staged publish).
- converter class names map to the converter registry below using the SAME
  config keys the Java classes read (e.g. StringSplitterConverter reads
  ``converter.string.splitter.delimiter``, StringSplitterConverter.java:46;
  AvroFilterConverter reads ``converter.filter.field``/``.value``,
  AvroFilterConverter.java:57-59).

Keys with no meaning off-JVM (``fs.uri``, ``mr.job.*``, ``task.*``) are
accepted and recorded, never errors — a pull file written for the reference
parses as-is. Engine-specific extensions live under the ``gobblin_spark.*``
prefix so they can never collide with reference keys.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import converters as C
from .engine import CdcEngine
from .lake import SnapshotTable
from .sources.filebased import FileSnapshotSource
from .state import StateStore


# ----------------------------------------------------------- properties file
def parse_properties(text: str) -> dict[str, str]:
    """java.util.Properties subset that covers the reference's pull files:
    ``#``/``!`` comments, blank lines, ``\\`` line continuation, ``=`` or
    ``:`` separators (first unescaped occurrence), surrounding whitespace
    stripped, later keys win."""
    props: dict[str, str] = {}
    logical: list[str] = []
    pending = ""
    for raw in text.splitlines():
        line = pending + raw.strip() if pending else raw.strip()
        if not pending and (not line or line[0] in "#!"):
            continue
        if line.endswith("\\") and not line.endswith("\\\\"):
            pending = line[:-1]
            continue
        pending = ""
        logical.append(line)
    if pending:
        logical.append(pending)
    for line in logical:
        sep = -1
        for i, ch in enumerate(line):
            if ch in "=:" and (i == 0 or line[i - 1] != "\\"):
                sep = i
                break
        if sep < 0:
            props[line] = ""
        else:
            props[line[:sep].strip().replace("\\=", "=").replace("\\:", ":")] = line[
                sep + 1 :
            ].strip()
    return props


def load_pull_file(path: str) -> dict[str, str]:
    with open(path, encoding="utf-8") as f:
        return parse_properties(f.read())


# ----------------------------------------------------------- schema mapping
_AVRO_TO_SPARK = {
    "string": "STRING",
    "int": "INT",
    "long": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "boolean": "BOOLEAN",
    "bytes": "BINARY",
}


def avro_schema_to_ddl(schema_json: str) -> str:
    """Flat Avro record schema (the shape ``source.schema`` carries in the
    reference's pull files, e.g. simplejson.pull) → Spark DDL string.
    Nullable unions (``["string","null"]``) map to the type itself (Spark
    DDL fields are nullable); nested records/arrays/maps raise — same scope
    boundary as avro_codec."""
    sch = json.loads(schema_json)
    if sch.get("type") != "record":
        raise ValueError(f"expected a record schema, got {sch.get('type')!r}")
    cols = []
    for f in sch["fields"]:
        t = f["type"]
        if isinstance(t, list):  # nullable union
            non_null = [x for x in t if x != "null"]
            if len(non_null) != 1 or not isinstance(non_null[0], str):
                raise ValueError(f"unsupported union for field {f['name']}: {t}")
            t = non_null[0]
        if not isinstance(t, str) or t not in _AVRO_TO_SPARK:
            raise ValueError(f"unsupported avro type for field {f['name']}: {t}")
        cols.append(f"`{f['name']}` {_AVRO_TO_SPARK[t]}")
    return ", ".join(cols)


# -------------------------------------------------------- converter registry
def _record_column(props: dict[str, str]) -> str:
    # Gobblin converters see the whole record; this engine's are columnar —
    # the raw-payload column name (extension key; "value" matches both the
    # Kafka wire shape and spark.read.text)
    return props.get("gobblin_spark.record.column", "value")


def _build_json_decode(props):
    schema = props.get("source.schema")
    if not schema:
        raise ValueError("SimpleJsonConverter requires source.schema")
    return C.json_decode(_record_column(props), avro_schema_to_ddl(schema))


_CONVERTERS = {
    # reference class (simple name) → builder(props) -> Converter
    "SimpleJsonConverter": _build_json_decode,
    "JsonIntermediateToAvroConverter": _build_json_decode,
    "CsvToJsonConverter": lambda p: C.csv_decode(
        _record_column(p),
        avro_schema_to_ddl(p["source.schema"]),
        sep=p.get("converter.csv.to.json.delimiter", ","),
    ),
    "AvroFilterConverter": lambda p: C.filter_equals(
        p["converter.filter.field"], p["converter.filter.value"]
    ),
    "StringFilterConverter": lambda p: C.filter_regex(
        _record_column(p), p["converter.string.filter.pattern"]
    ),
    # Gobblin splits on a LITERAL delimiter and omits empty strings
    # (Splitter.on(...).omitEmptyStrings(), StringSplitterConverter.java:46);
    # string_split takes a Java regex, so quote the literal and add the
    # empty-token filter for exact parity
    "StringSplitterConverter": lambda p: (
        lambda conv: lambda df: conv(df).filter(F.col("token") != "")
    )(
        C.string_split(
            _record_column(p),
            "\\Q" + p["converter.string.splitter.delimiter"] + "\\E",
        )
    ),
    "AvroFieldsPickConverter": lambda p: C.fields_pick(
        *[s.strip() for s in p["converter.avro.fields"].split(",")]
    ),
    "AvroFieldRetrieverConverter": lambda p: C.field_retriever(
        p["converter.avro.extractor.field.path"]
    ),
    "ObjectToStringConverter": lambda p: C.object_to_string(_record_column(p)),
}


def build_converters(props: dict[str, str]) -> list:
    """``converter.classes`` (comma-separated FQNs, ConfigurationKeys.java:217)
    → this engine's converter chain, matched on the simple class name."""
    out = []
    for fqn in filter(None, (s.strip() for s in props.get("converter.classes", "").split(","))):
        simple = fqn.rsplit(".", 1)[-1]
        builder = _CONVERTERS.get(simple)
        if builder is None:
            raise ValueError(f"no converter mapping for {fqn}")
        out.append(builder(props))
    return out


def build_row_policy_predicate(props: dict[str, str]):
    """``qualitychecker.row.policies`` → one combined Spark predicate (rows
    failing it divert to ``qualitychecker.row.err.file``, the reference's
    ERR_FILE semantics). SchemaRowCheckPolicy = "record conforms to the
    declared schema", which after from_json IS ``decoded IS NOT NULL``
    (from_json yields null on malformed input). Task-level policies
    (RowCountPolicy, SchemaCompatibilityPolicy) are enforced by the engine
    at commit time, so they parse here but add no row predicate.

    Spark gotcha: PERMISSIVE from_json yields a struct of NULL FIELDS for
    malformed input, never a null struct — so ``decoded IS NOT NULL`` cannot
    detect corruption. The conformance probe re-parses with a
    columnNameOfCorruptRecord field: malformed ⇒ that field carries the raw
    text, valid ⇒ it is null."""
    preds = []
    for fqn in filter(
        None, (s.strip() for s in props.get("qualitychecker.row.policies", "").split(","))
    ):
        simple = fqn.rsplit(".", 1)[-1]
        if simple == "SchemaRowCheckPolicy":
            ddl = avro_schema_to_ddl(props["source.schema"])
            probe = F.from_json(
                F.col(_record_column(props)),
                ddl + ", `_corrupt_record` STRING",
                {"columnNameOfCorruptRecord": "_corrupt_record"},
            )
            preds.append(probe["_corrupt_record"].isNull())
        elif simple in ("RowCountPolicy", "SchemaCompatibilityPolicy"):
            continue  # task-level: engine commit gates
        else:
            raise ValueError(f"no row-policy mapping for {fqn}")
    if not preds:
        return None
    combined = preds[0]
    for p in preds[1:]:
        combined = combined & p
    return combined


# ------------------------------------------------------------------ job spec
class JobSpec:
    """Typed view over a parsed pull file. ``mode`` is derived from
    ``source.class`` exactly as the reference dispatches on it."""

    def __init__(self, props: dict[str, str]):
        self.props = props
        self.job_name = props.get("job.name", "job")
        self.job_group = props.get("job.group", "")
        self.source_class = props.get("source.class", "")
        simple = self.source_class.rsplit(".", 1)[-1]
        if "Kafka" in simple:
            self.mode = "kafka"
        elif simple in ("SimpleJsonSource", "FileBasedSource") or "FileBased" in simple:
            self.mode = "file"
        else:
            raise ValueError(f"unsupported source.class: {self.source_class or '(unset)'}")
        self.state_store_dir = props.get("state.store.dir")
        self.final_dir = props.get("data.publisher.final.dir")
        self.staging_dir = props.get("writer.staging.dir")
        self.err_file = props.get("qualitychecker.row.err.file")
        self.table_name = props.get("extract.table.name", self.job_name)
        # bootstrap.with.offset (kafka-hdfs.pull): where to start with no
        # committed watermark / out-of-range resume — engine reset_policy
        self.reset_policy = {"earliest": "earliest", "latest": "latest", "nearest": "nearest"}.get(
            props.get("bootstrap.with.offset", "earliest"), "earliest"
        )
        self.max_mappers = int(props.get("mr.job.max.mappers", 0)) or None
        # extension keys (gobblin_spark.* namespace; never reference keys)
        self.changelog_dir = props.get("gobblin_spark.changelog.dir")
        self.merge_mode = props.get("gobblin_spark.merge.mode", "rewrite")
        self.n_buckets = int(props.get("gobblin_spark.table.buckets", "16"))
        self.file_format = props.get("gobblin_spark.file.format", "text")
        self.files_pattern = props.get("source.filebased.files.to.pull") or (
            os.path.join(props["source.filebased.data.directory"], "*")
            if "source.filebased.data.directory" in props
            else None
        )

    @classmethod
    def from_file(cls, path: str) -> "JobSpec":
        return cls(load_pull_file(path))

    # ------------------------------------------------------------------ run
    def run(self, spark: SparkSession, changelog_schema=None) -> list[dict]:
        if self.mode == "kafka":
            return self._run_cdc(spark, changelog_schema)
        return self._run_file(spark)

    def _table_root(self) -> str:
        if not self.final_dir:
            raise ValueError("data.publisher.final.dir is required")
        return os.path.join(self.final_dir, self.table_name)

    def _run_cdc(self, spark: SparkSession, changelog_schema) -> list[dict]:
        """The Kafka-source job: plan → LWW → fenced MERGE, resumable. The
        table is created on first run from the changelog's visible columns
        (op/log bookkeeping stripped) unless it already exists."""
        if not self.changelog_dir:
            raise ValueError(
                "kafka job needs gobblin_spark.changelog.dir in this sandbox "
                "(no broker; on a cluster wire kafka.brokers via sources.kafka.tail_kafka)"
            )
        root = self._table_root()
        changelog = spark.read.parquet(self.changelog_dir)
        if os.path.exists(os.path.join(root, "meta")):
            table = SnapshotTable(spark, root)
        else:
            import pyspark.sql.types as T

            drop = {"op", "log_partition", "log_offset"}
            visible = T.StructType(
                [f for f in changelog.schema.fields if f.name not in drop]
            )
            if "text" not in [f.name for f in visible.fields]:
                visible = visible.add("text", T.StringType())
            table = SnapshotTable.create(
                spark, root, changelog_schema or visible, key="url", n_buckets=self.n_buckets
            )
        engine = CdcEngine(
            spark,
            table,
            StateStore(self.state_store_dir) if self.state_store_dir else None,
            job_id=self.job_name,
            errors_path=self.err_file,
            reset_policy=self.reset_policy,
            merge_mode=self.merge_mode,
        )
        return engine.run(self.changelog_dir)

    def _run_file(self, spark: SparkSession) -> list[dict]:
        """The file-based job: snapshot-diff listing → converter chain →
        row-policy divert → staged publish (write to writer.staging.dir,
        atomic rename into data.publisher.final.dir — BaseDataPublisher's
        staging→final move)."""
        if not self.files_pattern:
            raise ValueError("file job needs source.filebased.files.to.pull or .data.directory")
        if not self.state_store_dir:
            raise ValueError("state.store.dir is required for incremental file jobs")
        state = StateStore(self.state_store_dir)
        source = FileSnapshotSource(state, store_name=self.job_name)
        if "," in self.files_pattern:  # explicit comma-separated URI list
            files = []
            for pat in (p.strip() for p in self.files_pattern.split(",")):
                if pat:
                    files.extend(source.plan(pat))
        else:
            files = source.plan(self.files_pattern)
        if not files:
            return [{"skipped": True, "n_files": 0}]
        df = source.read(spark, files, fmt=self.file_format)
        df = C.chain(df, build_converters(self.props))
        pred = build_row_policy_predicate(self.props)
        n_errors = 0
        if pred is not None:
            df = df.persist()
            errors = df.filter(~pred)
            n_errors = errors.count()
            if n_errors and self.err_file:
                errors.write.mode("append").parquet(self.err_file)
            df = df.filter(pred)
        out_dir = self._table_root()
        # uuid suffix: two publishes inside the same wall-clock second must not
        # collide on the staging->final rename (publish dirs are enumerated by
        # listing, never reconstructed by name)
        batch = f"batch-{time.strftime('%Y%m%dT%H%M%S')}-{len(files)}-{uuid.uuid4().hex[:6]}"
        staging = os.path.join(self.staging_dir or out_dir + ".staging", batch)
        df.write.mode("overwrite").parquet(staging)
        os.makedirs(out_dir, exist_ok=True)
        final = os.path.join(out_dir, batch)
        os.rename(staging, final)  # the staging→final publish move
        source.commit(files)
        n_rows = spark.read.parquet(final).count()
        return [
            {
                "skipped": False,
                "n_files": len(files),
                "n_rows": n_rows,
                "quality_errors": n_errors,
                "published": final,
            }
        ]
