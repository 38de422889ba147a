"""Gobblin .pull job-file compatibility: the reference's job spec format
drives this engine with the reference's own config keys
(ConfigurationKeys.java constants; pull-file shapes modeled on
gobblin-example/src/main/resources/{kafka-hdfs,simplejson}.pull)."""

import json
import os

from gobblin_spark.engine import CdcEngine
from gobblin_spark.fixtures import make_changelog, write_changelog
from gobblin_spark.jobspec import (
    JobSpec,
    avro_schema_to_ddl,
    build_converters,
    parse_properties,
)
from gobblin_spark.lake import SnapshotTable
from gobblin_spark.state import StateStore

import pytest
from conftest import table_fingerprint
from helpers import PAGES_SCHEMA, visible_with_offset


def test_parse_properties_java_subset():
    text = """
# comment
! also a comment
job.name=MyJob
job.group: demo
long.value=a,\\
b,\\
c
spaced.key   =   value with spaces
escaped\\=key=v
empty.key=
bare.flag
"""
    p = parse_properties(text)
    assert p["job.name"] == "MyJob"
    assert p["job.group"] == "demo"
    assert p["long.value"] == "a,b,c"  # backslash continuation
    assert p["spaced.key"] == "value with spaces"
    assert p["escaped=key"] == "v"
    assert p["empty.key"] == "" and p["bare.flag"] == ""


def test_avro_schema_to_ddl_simplejson_shape():
    # the EXACT schema string simplejson.pull carries (source.schema)
    schema = (
        '{"namespace":"example.avro", "type":"record", "name":"User", '
        '"fields":[{"name":"name", "type":"string"}, '
        '{"name":"favorite_number",  "type":"int"}, '
        '{"name":"favorite_color", "type":"string"}]}'
    )
    assert (
        avro_schema_to_ddl(schema)
        == "`name` STRING, `favorite_number` INT, `favorite_color` STRING"
    )
    nullable = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "revid", "type": ["double", "null"]}],
        }
    )
    assert avro_schema_to_ddl(nullable) == "`revid` DOUBLE"
    with pytest.raises(ValueError):
        avro_schema_to_ddl(
            json.dumps(
                {
                    "type": "record",
                    "name": "r",
                    "fields": [{"name": "x", "type": {"type": "array", "items": "int"}}],
                }
            )
        )


def test_converter_registry_uses_reference_keys(spark):
    props = {
        "converter.classes": (
            "org.apache.gobblin.converter.string.StringSplitterConverter"
        ),
        "converter.string.splitter.delimiter": "|",
    }
    (conv,) = build_converters(props)
    df = spark.createDataFrame([("a|b|c",)], "value string")
    got = sorted(r["token"] for r in conv(df).collect())
    assert got == ["a", "b", "c"]
    with pytest.raises(ValueError):
        build_converters({"converter.classes": "com.example.UnknownConverter"})


def _write_pull(path: str, text: str) -> str:
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)
    return path


def test_kafka_pull_job_equals_direct_engine(spark, tmp_path):
    """A kafka-hdfs.pull-shaped job file produces byte-identical final table
    state to a directly-constructed CdcEngine run, and re-running resumes
    idempotently from the committed watermarks."""
    tmp = str(tmp_path)
    clog = make_changelog(300, n_urls=30, n_partitions=4, seed=7)
    write_changelog(clog, os.path.join(tmp, "changelog"))

    pull = _write_pull(
        os.path.join(tmp, "job.pull"),
        f"""
# modeled on gobblin-example kafka-hdfs.pull
job.name=GobblinKafkaQuickStart
job.group=GobblinKafka
job.lock.enabled=false
source.class=org.apache.gobblin.source.extractor.extract.kafka.KafkaSimpleSource
extract.namespace=org.apache.gobblin.extract.kafka
extract.table.name=pages
writer.destination.type=HDFS
data.publisher.type=org.apache.gobblin.publisher.BaseDataPublisher
bootstrap.with.offset=earliest
mr.job.max.mappers=4
state.store.dir={tmp}/state
data.publisher.final.dir={tmp}/out
qualitychecker.row.err.file={tmp}/errors
gobblin_spark.changelog.dir={tmp}/changelog
gobblin_spark.table.buckets=8
""",
    )
    spec = JobSpec.from_file(pull)
    assert spec.mode == "kafka" and spec.reset_policy == "earliest"
    results = spec.run(spark)
    assert results and not any(r.get("failed") for r in results)

    # reference run: direct engine construction, same inputs
    direct = SnapshotTable.create(
        spark, os.path.join(tmp, "direct"), PAGES_SCHEMA, key="url", n_buckets=8
    )
    CdcEngine(spark, direct, StateStore(os.path.join(tmp, "dstate")), job_id="d").run(
        os.path.join(tmp, "changelog")
    )
    via_pull = SnapshotTable(spark, os.path.join(tmp, "out", "pages"))
    assert table_fingerprint(visible_with_offset(via_pull)) == table_fingerprint(
        visible_with_offset(direct)
    )

    # idempotent re-run: everything fenced by the committed watermarks
    rerun = JobSpec.from_file(pull).run(spark)
    assert all(r.get("skipped") for r in rerun)


def test_simplejson_pull_job_incremental_with_divert(spark, tmp_path):
    """A simplejson.pull-shaped file job: json-lines → schema-decoded parquet
    via staged publish; malformed rows divert to the err file
    (SchemaRowCheckPolicy); a second run ingests ONLY files added since."""
    tmp = str(tmp_path)
    data = os.path.join(tmp, "in")
    os.makedirs(data)
    with open(os.path.join(data, "a.json"), "w") as f:
        f.write('{"name":"ada","favorite_number":1,"favorite_color":"red"}\n')
        f.write("THIS IS NOT JSON\n")
    schema = (
        '{"namespace":"example.avro","type":"record","name":"User","fields":'
        '[{"name":"name","type":"string"},{"name":"favorite_number","type":"int"},'
        '{"name":"favorite_color","type":"string"}]}'
    )
    pull = _write_pull(
        os.path.join(tmp, "job.pull"),
        f"""
# modeled on gobblin-example simplejson.pull
job.name=GobblinDemo
job.group=demo
source.class=org.apache.gobblin.example.simplejson.SimpleJsonSource
converter.classes=org.apache.gobblin.example.simplejson.SimpleJsonConverter
source.schema={schema}
source.filebased.data.directory={data}
qualitychecker.row.policies=org.apache.gobblin.policies.schema.SchemaRowCheckPolicy
qualitychecker.row.err.file={tmp}/errors
data.publisher.type=org.apache.gobblin.publisher.BaseDataPublisher
state.store.dir={tmp}/state
data.publisher.final.dir={tmp}/out
writer.staging.dir={tmp}/staging
""",
    )
    spec = JobSpec.from_file(pull)
    assert spec.mode == "file"
    (res,) = spec.run(spark)
    assert res["n_files"] == 1 and res["n_rows"] == 1 and res["quality_errors"] == 1
    out = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(tmp, "out", "GobblinDemo")
    )
    row = out.select("decoded.name", "decoded.favorite_number").collect()[0]
    assert (row[0], row[1]) == ("ada", 1)
    errs = spark.read.parquet(os.path.join(tmp, "errors")).collect()
    assert len(errs) == 1 and "NOT JSON" in errs[0]["value"]

    # nothing new → skip; add a file → only it is ingested
    (res2,) = JobSpec.from_file(pull).run(spark)
    assert res2["skipped"] and res2["n_files"] == 0
    with open(os.path.join(data, "b.json"), "w") as f:
        f.write('{"name":"bob","favorite_number":2,"favorite_color":"blue"}\n')
    (res3,) = JobSpec.from_file(pull).run(spark)
    assert res3["n_files"] == 1 and res3["n_rows"] == 1
    again = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(tmp, "out", "GobblinDemo")
    )
    assert out.count() + 1 == again.count()


def test_reference_pull_files_parse_as_is():
    """The reference's own example pull files parse without modification
    (key compatibility; running them needs their live endpoints)."""
    ref = "/root/reference/gobblin-example/src/main/resources"
    if not os.path.isdir(ref):
        pytest.skip("reference tree not present")
    for name in ("kafka-hdfs.pull", "simplejson.pull", "wikipedia.pull"):
        props = parse_properties(open(os.path.join(ref, name)).read())
        assert props.get("job.name")
        assert "source.class" in props
    # and the kafka one builds a spec (source dispatch works on its keys)
    props = parse_properties(open(os.path.join(ref, "kafka-hdfs.pull")).read())
    props["data.publisher.final.dir"] = "/tmp/x"
    spec = JobSpec(props)
    assert spec.mode == "kafka" and spec.reset_policy == "earliest"
