package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Schemas

class SchemasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("validated read accepts matching schemas") {
    val df = Schemas.validated(
      spark,
      "/root/testdata/sf0.001/documents.parquet",
      Schemas.documents
    )
    assert(df.count() > 0)
    val emb = Schemas.validated(
      spark,
      "/root/testdata/sf0.001/embeddings.parquet",
      Schemas.embeddings
    )
    assert(emb.count() > 0)
  }

  test("validated read fails fast with a readable diff on mismatch") {
    val err = intercept[IllegalArgumentException] {
      Schemas.validated(
        spark,
        "/root/testdata/sf0.001/documents.parquet",
        Schemas.embeddings
      )
    }
    assert(err.getMessage.contains("missing column vec_id"))
  }

  test("events loader normalizes a timestamp_ntz ts to UTC TimestampType") {
    // The driver's testdata has shipped events.ts as both TIMESTAMP(NANOS)
    // and plain timestamp[us] (TIMESTAMP_NTZ) across generations; the
    // loader contract is ONE logical shape regardless — TimestampType
    // whose epoch micros equal the stored wall clock read as UTC (what
    // every oracle's epoch_us(ts) reports). Pin the NTZ branch by
    // writing that physical shape and reading it back through the loader.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.TimestampType
    val dir = java.nio.file.Files.createTempDirectory("graft-evntz").toString
    graft.sources.Tables
      .events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType.typeName == "timestamp_ntz",
      s"fixture did not produce the NTZ physical shape: ${raw.schema("ts").dataType}")
    val loaded = graft.sources.Tables.events(spark, dir)
    assert(loaded.schema("ts").dataType == TimestampType)
    // round trip is lossless: micros agree row-for-row with the source
    val src = graft.sources.Tables
      .events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val back = loaded.select(col("event_id"), unix_micros(col("ts")).as("us"))
    assert(src.except(back).isEmpty && back.except(src).isEmpty)
  }
}
