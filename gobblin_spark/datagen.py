"""Distributed deterministic changelog synthesis — the 10^10-event scale path.

``fixtures.make_changelog`` builds small driver-side pandas fixtures for
correctness tests; this module builds the SAME shape of binlog-style change
events as pure Spark column expressions over ``spark.range(n)``, so generation
is embarrassingly parallel, shuffle-free, and byte-identical at any
parallelism (every column is a pure function of the row id and the seed).
That determinism is what lets the scaling bench replay the identical input at
N and 4N cores.

Reference semantics mirrored (SURVEY §2.1): events are keyed by url, a url
maps to exactly one log partition (Kafka keyed-topic invariant,
gobblin-modules/gobblin-kafka-common/.../kafka/KafkaSource.java:544), offsets
are strictly increasing within a partition, ~20% of events hit 3 hot urls
(skew scenario), ops are I/U/D ≈ 60/30/10, and ~15% of warc_ts are late
(out-of-order event time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2026-01-01 00:00:00"

# pseudo-word pool shared with fixtures._VOCAB so extraction sees similar text
_VOCAB = (
    "web crawl page data spark merge upsert lake table stream change event "
    "offset partition watermark schema column text html extract dedup key "
    "batch commit snapshot replay state lineage metric skew salt bucket"
).split()


def _h(seed: int, *cols):
    """Deterministic 64-bit hash stream: pure function of (seed, id, tag)."""
    return F.xxhash64(F.lit(seed), *cols)


def _paragraph(seed: int, tag: int, n_words: int):
    """A deterministic pseudo-paragraph: n_words picks from the vocab, chosen
    by per-(row, tag, position) hashes. All JVM-side concat — no UDF."""
    words = [
        F.element_at(
            F.array(*[F.lit(w) for w in _VOCAB]),
            (F.pmod(_h(seed, F.col("id"), F.lit(tag * 1000 + j)), F.lit(len(_VOCAB))) + 1).cast(
                "int"
            ),
        )
        for j in range(n_words)
    ]
    return F.concat_ws(" ", *words)


def synth_changelog(
    spark: SparkSession,
    n_events: int,
    n_urls: int | None = None,
    n_partitions: int = 32,
    seed: int = 42,
    n_hosts: int = 20,
    hot_fraction_pct: int = 20,
    n_hot: int = 3,
) -> DataFrame:
    """Build an n_events-row changelog DataFrame lazily; O(1) driver state.

    Columns: log_partition:int, log_offset:long, op:string, url:string,
    warc_ts:timestamp, html:binary, lang:string, content_length:int —
    the input_hint shape plus changelog bookkeeping.
    """
    n_urls = n_urls or max(1, n_events // 4)
    df = spark.range(n_events)

    pick = F.pmod(_h(seed, F.col("id"), F.lit(1)), F.lit(100))
    url_id = F.when(
        pick < F.lit(hot_fraction_pct), F.pmod(_h(seed, F.col("id"), F.lit(2)), F.lit(n_hot))
    ).otherwise(F.pmod(_h(seed, F.col("id"), F.lit(3)), F.lit(n_urls)))
    df = df.withColumn("url_id", url_id)
    df = df.withColumn(
        "url",
        F.concat(
            F.lit("https://site"),
            F.pmod(F.col("url_id"), F.lit(n_hosts)).cast("string"),
            F.lit(".example/p/"),
            F.col("url_id").cast("string"),
        ),
    )
    # url → partition (keyed-topic invariant); offsets dense & strictly
    # increasing within each partition (binlog order). The window shuffle here
    # is generation-time only — real binlogs arrive with dense offsets.
    from pyspark.sql import Window

    df = df.withColumn(
        "log_partition", F.pmod(F.xxhash64(F.lit(seed), F.col("url_id")), F.lit(n_partitions)).cast("int")
    ).withColumn(
        "log_offset",
        F.row_number().over(Window.partitionBy("log_partition").orderBy("id")).cast("long") - 1,
    )

    op_pick = F.pmod(_h(seed, F.col("id"), F.lit(4)), F.lit(10))
    df = df.withColumn(
        "op", F.when(op_pick < 6, "I").when(op_pick < 9, "U").otherwise("D")
    )

    # event time: advancing ~1 event/ms with jitter; ~15% late by 1-120 min
    late = F.pmod(_h(seed, F.col("id"), F.lit(5)), F.lit(100)) < 15
    lateness = F.pmod(_h(seed, F.col("id"), F.lit(6)), F.lit(7_140)) + 60
    ts_ms = F.col("id") + F.pmod(_h(seed, F.col("id"), F.lit(7)), F.lit(997))
    ts = F.timestamp_add("MILLISECOND", ts_ms.cast("long"), F.lit(BASE_TS).cast("timestamp"))
    df = df.withColumn(
        "warc_ts", F.when(late, F.timestamp_add("SECOND", -lateness.cast("long"), ts)).otherwise(ts)
    )

    paras = [
        F.concat(F.lit("<p>"), _paragraph(seed, t, 10), F.lit("</p>")) for t in range(3)
    ]
    html_str = F.concat(
        F.lit("<html><head><title>"),
        F.col("url"),
        F.lit(" v"),
        F.col("id").cast("string"),
        F.lit(
            "</title><script>var t = 1 &amp;&amp; 2;</script><style>.m{color:red}</style>"
            "</head><body><nav><ul><li>Home</li><li>Docs</li><li>About</li></ul></nav>"
            '<div id="main"><h1>Page &quot;snapshot&quot;</h1>'
        ),
        *paras,
        F.lit("</div><footer>contact &lt;ops&gt; &amp; legal</footer></body></html>"),
    )
    is_del = F.col("op") == "D"
    df = df.withColumn("html", F.when(~is_del, F.encode(html_str, "utf-8")))
    langs = F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"), F.lit("zh"))
    df = df.withColumn(
        "lang",
        F.when(~is_del, F.element_at(langs, (F.pmod(_h(seed, F.col("id"), F.lit(8)), F.lit(7)) + 1).cast("int"))),
    )
    df = df.withColumn("content_length", F.octet_length(F.col("html")).cast("int"))
    return df.select(
        "log_partition", "log_offset", "op", "url", "warc_ts", "html", "lang", "content_length"
    )


def write_changelog(df: DataFrame, path: str) -> None:
    """Hive-partition by log_partition so planned range scans prune."""
    df.write.mode("overwrite").partitionBy("log_partition").parquet(path)
