package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Reads go through `spark.read.parquet` so Catalyst's parquet source gives
  * us vectorized scans, predicate pushdown, and column pruning for free —
  * every query should show `PushedFilters`/narrow `ReadSchema` in
  * `.explain("formatted")`.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has shipped in two physical shapes across driver testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read as a raw nanosecond long via
    * `spark.sql.legacy.parquet.nanosAsLong` and floor-divide to micros;
    * `div`, not `/`, because epoch-nanos ~1.7e18 exceed double's 53-bit
    * mantissa) and plain timestamp[us] without timezone (read as
    * TIMESTAMP_NTZ). Normalize BOTH to TimestampType: all sessions here run
    * with `spark.sql.session.timeZone=UTC`, so the NTZ wall clock maps to
    * the same epoch micros DuckDB's `epoch_us(ts)` reports — the oracle
    * contract every events query depends on.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
