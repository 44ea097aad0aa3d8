"""Sources: canonical DataFrame readers.

The reference reads text CSV-ish rows (``CovRunner.scala:97-99``), libsvm
(``DTRunner.scala:201-216``), Mahout SequenceFile (``KMeansRunner.scala:119-124``),
Spark objectFile (``ALSRunner.scala:125``), ORC (``IDFRunner.scala:102``), and
Hive tables (``PageRankHiveRunner.scala:39-40``). This engine standardizes on
**Parquet + DataFrame readers**: every adapter lands in a canonical schema so
downstream operators never care about the wire format. SequenceFile is
supported for primitive-Writable K/V (``read_sequencefile`` /
``write_sequencefile``, incl. the LZ4-codec sink); decoding Mahout
``VectorWritable`` payloads specifically needs the Mahout jar on the JVM
classpath and stays waived — text-encoded vectors round-trip through
``read_sequencefile_vectors`` instead. The objectFile role (reload
pre-serialized rating/corpus RDDs) lands through the pickle-SequenceFile
pair ``read_object_rows``/``write_object_rows`` — Java-serialized Scala
objectFiles themselves are JVM-only by design. ORC is supported natively
(``read_orc``/``write_orc``), and table sinks land through the session
catalog (``save_as_table``/``insert_into_table``).

All readers return plain DataFrames; columns feeding spark.ml estimators are
converted to ``VectorUDT`` at the estimator boundary (``operators/ml``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Parquet scan → Catalyst gets column pruning
    and predicate pushdown for free; callers filter/select on the result and
    the plan shows ``PushedFilters``/``ReadSchema`` trimmed accordingly.

    ``events.ts`` has shipped as both TIMESTAMP(NANOS) parquet (which
    Spark's vectorized reader rejects — read as long via ``nanosAsLong``
    and floor-divide to microseconds, the same ns→µs truncation DuckDB
    applies) and as plain µs TIMESTAMP (usable as-is). Normalize on dtype,
    not fixture vintage, so both generations of the fixture scan clean."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return normalize_event_ts(df)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """µs TIMESTAMP (LTZ) ``ts`` regardless of the parquet physical type:
    ns-as-long gets the DuckDB-matching ns→µs floor division; TIMESTAMP_NTZ
    is cast to TIMESTAMP — a pure relabel under the session's pinned UTC
    timezone (``session.py``), and required because event-time operations
    (``withWatermark``) reject NTZ."""
    dt = dict(df.dtypes)["ts"]
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if dt != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    Small fixture tables arrive as a single parquet split, which serializes
    compute-heavy per-row pipelines (minhash, simhash, cosine) onto one
    core. A repartition before such compute costs one tiny shuffle of the
    raw rows and buys full-cluster parallelism — the same reasoning as the
    reference's ubiquitous ``repartition(pt)`` after load
    (``KMeansRunner.scala:124``). At real scale the scan already yields many
    splits, and the shuffle stays negligible relative to the per-row work."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


class Catalog:
    """Lazy handle to the fixture star schema at one scale-factor dir.

    Accessing ``cat.lineitem`` etc. returns the DataFrame; nothing is cached
    or materialized here — plans stay fully declarative so Catalyst can push
    filters into each scan independently per query.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return load_table(self.spark, self.sf_dir, name)
        raise AttributeError(name)

    def view(self, name: str) -> DataFrame:
        df = load_table(self.spark, self.sf_dir, name)
        df.createOrReplaceTempView(name)
        return df

    def register_all(self) -> None:
        """Register every fixture table as a temp view for spark.sql use
        (mirrors the reference's Hive-table entry path,
        ``PageRankHiveRunner.scala:39-40``)."""
        for t in TABLES:
            self.view(t)


def read_libsvm(
    spark: SparkSession, path: str, num_features: int | None = None
) -> DataFrame:
    """libsvm reader → (label double, features vector).

    Mirrors ``spark.read.format("libsvm").option("numFeatures", …)`` in the
    reference (``DTRunner.scala:201-216``; per-dataset numFeatures: mnist8m=784,
    higgs=28, epsilon=2000, rcv=47236)."""
    reader = spark.read.format("libsvm")
    if num_features is not None:
        reader = reader.option("numFeatures", str(num_features))
    return reader.load(path)


def read_features_csv(
    spark: SparkSession, path: str, sep: str = ",", comment: str = "#"
) -> DataFrame:
    """Dense feature rows from delimited text → (features array<double>).

    Reference shape: ``sc.textFile`` + split + toDouble (``CovRunner.scala:97-99``,
    ``DBSCANRunner.scala:48``). Comment lines are filtered like
    ``graph/Util.scala:21,43``. Stays JVM-side: split + cast via builtins, no
    Python row loop."""
    lines = spark.read.text(path)
    rows = lines.filter(~F.col("value").startswith(comment))
    return rows.select(
        F.transform(F.split(F.col("value"), sep), lambda x: x.cast("double")).alias(
            "features"
        )
    )


def read_labeled_text(
    spark: SparkSession, path: str, label_sep: str = ",", feat_sep: str = " "
) -> DataFrame:
    """'label,f1 f2 f3 …' text → (label double, features array<double>).

    Reference: SVM input parse at ``SVMRunner.scala:106-109``."""
    lines = spark.read.text(path)
    parts = lines.select(
        F.split(F.col("value"), label_sep, 2).alias("p")
    )
    return parts.select(
        F.element_at("p", 1).cast("double").alias("label"),
        F.transform(
            F.split(F.element_at("p", 2), feat_sep), lambda x: x.cast("double")
        ).alias("features"),
    )


EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)


def read_edge_list(
    spark: SparkSession,
    path: str,
    sep: str = r"\s+",
    comment: str = "#",
    default_weight: float = 1.0,
    drop_self_loops: bool = True,
) -> DataFrame:
    """Edge-list text → (src long, dst long, weight double).

    Reference: ``graph/Util.scala:106-136`` (``loadLines2EdgesT``) — comment
    lines skipped, self-loops dropped, optional third weight column."""
    lines = spark.read.text(path).filter(~F.col("value").startswith(comment))
    toks = lines.select(F.split(F.trim("value"), sep).alias("t"))
    # F.get is null-safe on short rows (ANSI mode makes element_at throw
    # on out-of-bounds — optional weight columns need the null path)
    edges = toks.select(
        F.get("t", 0).cast("long").alias("src"),
        F.get("t", 1).cast("long").alias("dst"),
        F.coalesce(
            F.get("t", 2).cast("double"), F.lit(float(default_weight))
        ).alias("weight"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if drop_self_loops:
        edges = edges.where(F.col("src") != F.col("dst"))
    return edges


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan → DataFrame. Reference inputs that arrive as ORC:
    ``IDFRunner.scala:102`` (``spark.read.orc(inputPath)``),
    ``IncPageRankRunner.scala:102-110``. Spark's native vectorized ORC
    reader gives the same pushdown/pruning story as parquet, so operators
    stay format-agnostic — land the scan here and feed the canonical
    column shapes downstream."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (round-trip partner of ``read_orc``)."""
    df.write.mode(mode).orc(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSON-Lines scan → DataFrame (one JSON object per line; .gz part
    files transparently decoded by Spark's codec chain). THE interchange
    format of LLM training-data pipelines — beyond the reference's
    source list (like the streaming family), included so a corpus can
    enter the engine without a parquet conversion hop.

    Pass ``schema`` (DDL string) in production: schemaless reads run a
    whole-extra inference PASS over the data and silently widen mixed
    types — at 100 TB that is both a 2× read and a correctness hazard.
    Corrupt-line handling (PERMISSIVE default): a malformed line never
    fails the job, but it surfaces in ``_corrupt_record`` ONLY if that
    column is part of the supplied schema (append
    ``, _corrupt_record string``) — with a schema that omits it, Spark
    silently emits an all-NULL row instead, indistinguishable from real
    nulls. Crawl loaders that must audit bad lines include the column."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None
) -> None:
    """JSON-Lines sink (round-trip partner of ``read_jsonl``) — one
    object per line, optionally compressed for the export-to-training-run
    handoff. Codec availability is Spark's text-source list (gzip, lz4,
    snappy, bzip2, deflate on this build); zstd needs native libhadoop
    zstd and is NOT available here — verified, so not advertised."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_sequencefile(
    spark: SparkSession, path: str, schema: str = "key long, value string"
) -> DataFrame:
    """Hadoop SequenceFile scan → DataFrame.

    The reference's most-used KMeans input is SequenceFile
    (``KMeansRunner.scala:119-124``: Mahout ``VectorWritable`` values).
    ``sc.sequenceFile`` auto-converts primitive Writables
    (Long/Int/Double/Text…) via the built-in converters — that covers
    K/V-shaped inputs end-to-end. Mahout ``VectorWritable`` needs the
    Mahout jar on the executor classpath; without it the scan raises the
    underlying ClassNotFound, and the portable path is text-encoded
    vectors via ``read_sequencefile_vectors``."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, schema)


def write_sequencefile(
    df: DataFrame, path: str, compression_codec: str | None = None
) -> None:
    """SequenceFile sink for a 2-column (key, value) DataFrame.

    ``compression_codec="org.apache.hadoop.io.compress.Lz4Codec"`` is the
    LZ4-SequenceFile sink of ``PrefixSpanRunner.scala:183-184``
    (``saveAsSequenceFile(path, Some(classOf[Lz4Codec]))``); the codec is
    bundled with Hadoop/Spark (lz4-java), no native lib needed."""
    rdd = df.rdd.map(lambda r: (r[0], r[1]))
    rdd.saveAsSequenceFile(path, compressionCodecClass=compression_codec)


def read_sequencefile_vectors(
    spark: SparkSession, path: str, sep: str = ","
) -> DataFrame:
    """SequenceFile of (id, text-encoded vector) → (key long,
    features array<double>) — the portable stand-in for the Mahout
    ``VectorWritable`` corpus shape (``KMeansRunner.scala:119-124``): same
    (id → dense vector) contract, JVM-side split+cast, no Python row
    loop after the Writable conversion."""
    kv = read_sequencefile(spark, path)
    return kv.select(
        "key",
        F.transform(F.split(F.col("value"), sep), lambda x: x.cast("double")).alias(
            "features"
        ),
    )


def read_object_rows(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Serialized-object scan → DataFrame (the ``sc.objectFile`` role:
    ``ALSRunner.scala:125``, ``LDARunner.scala:144``,
    ``SimRankRunner.scala:110`` load pre-serialized rating/corpus RDDs).

    Scala ``objectFile`` is Java serialization of arbitrary JVM classes —
    unreadable outside the JVM by design; the Python-native equivalent is
    the pickle SequenceFile (``sc.pickleFile``), which this reader lands
    into a typed DataFrame. Same lifecycle (dump prepared objects once,
    reload per run), portable serialization."""
    return spark.createDataFrame(spark.sparkContext.pickleFile(path), schema)


def write_object_rows(df: DataFrame, path: str) -> None:
    """Pickle-SequenceFile sink: round-trip partner of
    ``read_object_rows`` (the ``saveAsObjectFile`` role)."""
    df.rdd.map(tuple).saveAsPickleFile(path)


def save_as_table(df: DataFrame, name: str, mode: str = "overwrite") -> None:
    """Persistent-table sink: ``saveAsTable`` into the session catalog —
    the Hive-runner output path (``PageRankHiveRunner.scala:60-66``:
    ``CREATE TABLE … / INSERT INTO`` via a temp view). Without a Hive
    metastore the session catalog is in-memory + spark-warehouse parquet;
    with ``enableHiveSupport()`` the identical call lands in the
    metastore, so this is the one-liner the cluster deployment uses."""
    df.write.mode(mode).saveAsTable(name)


def insert_into_table(df: DataFrame, name: str) -> None:
    """Append into an existing catalog table by position — the
    ``INSERT INTO t SELECT …`` arm of ``PageRankHiveRunner.scala:60-66``."""
    df.write.insertInto(name)


def read_coo_text(spark: SparkSession, path: str, sep: str = ",") -> DataFrame:
    """COO sparse-matrix text 'row,col,value' → (row long, col long, value double).

    Reference: sparse PCA input assembly at ``PCARunner.scala:133-149``.
    Row vectors are assembled downstream by groupBy(row) + sparse-vector
    construction (``operators/ml/features.py``)."""
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    toks = lines.select(F.split(F.trim("value"), sep).alias("t"))
    return toks.select(
        F.element_at("t", 1).cast("long").alias("row"),
        F.element_at("t", 2).cast("long").alias("col"),
        F.element_at("t", 3).cast("double").alias("value"),
    )
