package graft.export

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name}

/** JSONL corpus interchange — the sink/source pair for the format
  * training pipelines actually ship (one JSON object per line, gzip
  * text shards, split directories). Parquet is this engine's working
  * format (columnar pruning, pushdown — `ShardStore`); JSONL is the
  * EDGE format: what tokenizer workers, external curation tools, and
  * dataset releases consume and produce. The reference's JSON writer
  * family (`public_data_report/hardware_report/hardware_report.py:
  * 337-358`) ships whole documents as one JSON value; JSONL is its
  * row-per-line sibling, declared here as a first-class boundary with
  * a round-trip contract instead of ad-hoc `spark.read.json` calls.
  *
  * Layout and scale choices:
  *   - `partitionBy(split)` — split selection stays directory pruning
  *     even at the text edge (an eval exporter never reads train
  *     shards);
  *   - gzip codec — the interchange default (line-splittable formats
  *     lose to parquet anyway for analytics; these files exist to be
  *     STREAMED once by a consumer, where gzip's ratio wins);
  *   - explicit schema on read — `spark.read.json` schema inference
  *     scans the data twice and types drift with content (an
  *     all-digits text shard would infer numbers); the contract is the
  *     documents schema, enforced, with `mode=FAILFAST` so a corrupt
  *     line fails loudly instead of becoming a silent null row.
  */
object JsonlCorpus {

  /** Write documents (must carry `split`) as gzip JSONL, one directory
    * per split. Overwrite = whole-corpus replace, the truncate-then-load
    * convention. */
  def write(documents: DataFrame, dir: String): Unit =
    documents.write
      .mode("overwrite")
      .partitionBy("split")
      .option("compression", "gzip")
      .json(dir)

  /** Read a JSONL corpus back under the enforced documents schema.
    * `split` comes back as the partition column; a malformed line is a
    * job failure, never a null row. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG, split STRING")
      .option("mode", "FAILFAST")
      .json(dir)
      .select("doc_id", "text", "lang", "source", "n_chars", "split")

  /** Read ONE split — must prune to that split's directory, not filter
    * post-scan (pinned in the spec via the scanned file list). */
  def readSplit(spark: SparkSession, dir: String, split: String): DataFrame =
    read(spark, dir).filter(col("split") === split)

  /** The file names a frame's scan actually touched — the spec's pruning
    * evidence. */
  private[graft] def scannedFiles(df: DataFrame): Seq[String] = {
    import df.sparkSession.implicits._
    df.select(input_file_name()).distinct().as[String].collect().toSeq
  }
}
