package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** v39's selection frontier against the properties that make it usable
  * as a decision surface (round-13 verdict ask #6): within each family
  * the knob must buy monotone recall at monotone cost (nested candidate
  * sets + exact rerank — a violation is a bug, not noise), and the
  * graph arm can never fall below the IVF config it seeds from.
  */
class IndexFrontierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("v39: recall and cost are monotone in the knob within each family") {
    val rows = VectorOps
      .queries("v39_index_frontier")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r =>
        (r.getAs[String]("family"), r.getAs[Long]("knob"),
          r.getAs[Long]("n_cost"), r.getAs[Double]("recall")))
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq("graph", "ivf"))
    rows.groupBy(_._1).foreach { case (family, arm) =>
      val byKnob = arm.sortBy(_._2)
      byKnob.sliding(2).foreach {
        case Array((_, k1, c1, r1), (_, k2, c2, r2)) =>
          assert(r2 >= r1, s"$family recall fell $r1 -> $r2 from knob $k1 to $k2")
          assert(c2 >= c1, s"$family cost fell $c1 -> $c2 from knob $k1 to $k2")
        case _ =>
      }
    }
  }

  test("v39: the graph arm at any budget >= the IVF config it seeds from") {
    // seeds are exactly ivf@4's served top-5, budget >= 5 always covers
    // them, and an exact-top-5 member inside any candidate set survives
    // an exact rerank of it - so graph recall >= ivf@4 recall, provably
    val rows = VectorOps
      .queries("v39_index_frontier")(spark, "/root/testdata/sf0.001")
      .collect()
    val ivf4 = rows
      .find(r => r.getAs[String]("family") == "ivf" && r.getAs[Long]("knob") == 4L)
      .get
      .getAs[Double]("recall")
    rows.filter(_.getAs[String]("family") == "graph").foreach { r =>
      assert(r.getAs[Double]("recall") >= ivf4,
        s"graph@${r.getAs[Long]("knob")} fell below its seed config")
    }
  }
}
