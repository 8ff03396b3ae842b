package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamJoin

case class Signup(user_id: Long, signup_ts: Timestamp)
case class Purchase(p_user_id: Long, purchase_ts: Timestamp, amount: Double)

class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val signups = Seq(
    Signup(1L, Timestamp.valueOf("2024-01-01 10:00:00")),
    Signup(2L, Timestamp.valueOf("2024-01-02 10:00:00"))
  )
  private val purchases = Seq(
    Purchase(1L, Timestamp.valueOf("2024-01-01 11:00:00"), 5.0), // in horizon
    Purchase(1L, Timestamp.valueOf("2024-01-09 11:00:00"), 7.0), // past 7 days
    Purchase(2L, Timestamp.valueOf("2024-01-01 09:00:00"), 9.0), // before signup
    Purchase(3L, Timestamp.valueOf("2024-01-02 12:00:00"), 3.0)  // never signed up
  )
  private val expected = Seq((1L, 5.0))

  test("stream-stream interval join attributes in-horizon purchases, append mode") {
    implicit val sqlCtx = spark.sqlContext
    val s = MemoryStream[Signup]
    val p = MemoryStream[Purchase]
    s.addData(signups: _*)
    p.addData(purchases: _*)
    val q = StreamJoin
      .attributePurchases(s.toDF(), p.toDF())
      .writeStream
      .format("memory")
      .queryName("attr_test")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // the interval + watermarks make the join state bounded — the state
      // operator exists (stream-stream joins buffer) but append ran
      assert(q.lastProgress.stateOperators.nonEmpty)
    } finally q.stop()
    val out = spark
      .table("attr_test")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("amount")))
      .toSeq
      .sorted
    assert(out == expected)
  }

  test("batch parity: the same call over batch frames gives the same result") {
    val out = StreamJoin
      .attributePurchases(signups.toDF(), purchases.toDF())
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("amount")))
      .toSeq
      .sorted
    assert(out == expected)
  }
}
