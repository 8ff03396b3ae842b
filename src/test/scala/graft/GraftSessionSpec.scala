package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("SQL surface: tables + native functions usable from spark.sql") {
    GraftSession.registerAll(spark, "/root/testdata/sf0.001")
    val agg = spark
      .sql("""SELECT l_returnflag, sum(CAST(l_quantity AS BIGINT)) AS q
              FROM lineitem GROUP BY 1 ORDER BY 1""")
      .collect()
    assert(agg.length == 3)
    val dot = spark
      .sql("""SELECT graft_dot(embedding, embedding) AS n2
              FROM embeddings WHERE vec_id = 0""")
      .head()
      .getDouble(0)
    assert(dot > 0.0)
    val q8 = spark
      .sql("""SELECT graft_quantize_int8(embedding) AS q
              FROM embeddings WHERE vec_id = 0""")
      .head()
      .getSeq[Byte](0)
    assert(q8.length == 64 && q8.exists(_ != 0))
    // joined SQL across registered views
    val n = spark
      .sql("""SELECT count(*) FROM orders JOIN customer ON o_custkey = c_custkey""")
      .head()
      .getLong(0)
    assert(n > 0)
  }
}
