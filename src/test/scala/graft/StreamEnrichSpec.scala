package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamEnrich

class StreamEnrichSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dim = Seq(
    ("click", "engagement", 1.0),
    ("view", "reach", 0.5)
  ).toDF("event_type", "category", "weight")

  private val events = Seq(
    Ev(Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0),
    Ev(Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "view", 2.0),
    Ev(Timestamp.valueOf("2024-01-01 12:00:00"), 3L, "purchase", 4.0) // no dim row
  )

  test("stream-static enrichment joins per micro-batch, keeps misses, holds no state") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(events: _*)
    val q = StreamEnrich
      .enrich(stream.toDF(), dim, "event_type")
      .writeStream
      .format("memory")
      .queryName("enrich_test")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // append mode worked at all => the join is stateless; assert it
      // explicitly: no state store operators were instantiated
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
    val out = spark
      .table("enrich_test")
      .orderBy("user_id")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), Option(r.getAs[String]("category"))))
      .toSeq
    assert(
      out == Seq(
        (1L, Some("engagement")),
        (2L, Some("reach")),
        (3L, None) // left join: unmatched events survive with NULL enrichment
      )
    )
  }

  test("the static side is broadcast in the equivalent batch plan") {
    val plan = StreamEnrich
      .enrich(events.toDF(), dim, "event_type")
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
