"""Schema-declared sources (SURVEY.md §2.1 S1–S3).

The reference reads two SQLite tables wholesale (`analyse.py:12-15`) or with
a column projection pushed into the SQL string (`analyse.py:158-164`,
`370-375`). Here the at-rest format is Parquet; column pruning and predicate
pushdown are Catalyst's job once the plan is declarative — ``read_table(...)
.select(...)`` reaches the scan as ``ReadSchema``/``PushedFilters``, so S2
needs no hand-rolled projection pushdown.

Schemas are **explicit**: the reference's implicit driver-default typing plus
defensive coercion (SURVEY.md §1.2) is reproduced by declaring the at-rest
types and funnelling every possibly-dirty column through
``functions.cleaning`` (``try_cast``-based), never through inference.

For a real SQLite ingest edge the reference's source maps to Spark's JDBC
reader (needs the xerial sqlite-jdbc jar on the classpath):

    spark.read.format("jdbc")
        .option("url", "jdbc:sqlite:/path/monitoring.db")
        .option("dbtable", "monitor_records").load()

The jar is not in this image, so ``read_sqlite`` gates behind a runtime
error; everything downstream is format-agnostic DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
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

# Reference-shaped schemas (SURVEY.md §1.3). Dirty columns arrive as strings
# (SQLite is dynamically typed); cleaning casts them with try_* downstream.
MONITOR_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ad_unique_id", T.StringType()),
        T.StructField("push_counter", T.IntegerType()),
        T.StructField("track_time", T.StringType()),
        T.StructField("ad_age_in_minutes", T.StringType()),
        T.StructField("views", T.StringType()),
    ]
)

PROFILES_SCHEMA = T.StructType(
    [
        T.StructField("ad_unique_id", T.StringType()),
        T.StructField("push_counter", T.IntegerType()),
        T.StructField("age", T.StringType()),
        T.StructField("profile_url", T.StringType()),
        T.StructField("posting_time", T.StringType()),
        T.StructField("city", T.StringType()),
    ]
)


def ensure_engine_conf(spark: SparkSession) -> None:
    """Set the two runtime confs the engine's semantics depend on, so
    every entry point works on ANY caller-provided SparkSession (the
    driver contract hands us one we didn't build):

    - ``nanosAsLong``: TIMESTAMP(NANOS) parquet (the events table) is
      unreadable in Spark 4 without it — reads throw PARQUET_TYPE_ILLEGAL;
    - UTC session timezone: hour/day extractions and timestamp collection
      must agree with the UTC-naive at-rest data and external oracles.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one at-rest Parquet table (S1). Projection after this call is
    pruned into the scan by Catalyst (S2).

    Columns stored as TIMESTAMP(NANOS) arrive as nanosecond longs (see
    session.py nanosAsLong) and are converted here to microsecond
    timestamps with integer division — exact for the full int64 range and
    identical to the truncation µs-precision engines apply.
    """
    ensure_engine_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name in ("ts",) and field.dataType.typeName() == "long":
            df = df.withColumn(field.name, F.expr(f"timestamp_micros({field.name} DIV 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for name in TESTDATA_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_sqlite(spark: SparkSession, db_path: str, table: str) -> DataFrame:
    """Ingest edge for the reference's native format (analyse.py:8,12-15).

    Requires the sqlite-jdbc driver jar on the Spark classpath; raises a
    clear error when absent rather than failing deep inside the JVM.
    """
    try:
        return (
            spark.read.format("jdbc")
            .option("url", f"jdbc:sqlite:{db_path}")
            .option("dbtable", table)
            .option("driver", "org.sqlite.JDBC")
            .load()
        )
    except Exception as exc:  # pragma: no cover - jar not in test image
        raise RuntimeError(
            "SQLite JDBC driver not on classpath; add sqlite-jdbc jar via "
            "spark.jars to use read_sqlite"
        ) from exc


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSONL (one JSON document per line) source with an EXPLICIT schema —
    the standard interchange format for document/training-data pipelines.

    Schema inference over JSON costs a full extra pass of the input and
    can silently widen types between runs; at 100 TB both are
    unacceptable, so the schema argument is mandatory. Corrupt lines land
    in ``_corrupt_record`` (PERMISSIVE mode) instead of failing the job —
    the reference's errors='coerce' philosophy applied to the source
    boundary.
    """
    full_schema = schema.add("_corrupt_record", T.StringType())
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
