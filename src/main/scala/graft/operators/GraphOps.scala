package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives shared by the dedup-cluster operators
  * (t16 over the n-gram pair graph, v12 over the embedding-cosine pair
  * graph).
  */
object GraphOps {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Connected components by iterative min-label propagation.
    *
    * `edges` must hold BOTH directions of every undirected edge as
    * (`id`, `nbr`) and should be cached by the caller (it is scanned once
    * per round). Returns (`id`, `lbl`) for every id present in `edges`,
    * where lbl = min id reachable — the deterministic canonical label.
    *
    * Scale shape: mutable state is only the ids that appear in an edge
    * (near-dup members are a tiny fraction of a 100 TB corpus); each round
    * is one keyed join + aggregation over that small table, lineage cut
    * with localCheckpoint. Rounds are bounded by component diameter
    * (shallow for near-dup graphs by nature; the adversarial-chain upgrade
    * path is large-star/small-star alternation at O(log n) rounds).
    * Convergence is checked via sum(lbl): propagation is monotone
    * non-increasing per member, so a stationary sum IS the fixpoint.
    */
  /** One min-label propagation round: each member's label drops to the
    * minimum of its own and its neighbors' labels. Factored out so the
    * per-round PLAN is pinnable in PlanAuditSpec — the loop's cost per
    * round is exactly this plan's, repeated; nothing else accumulates
    * (lineage is cut with localCheckpoint between rounds). */
  def propagationRound(edges: DataFrame, labels: DataFrame): DataFrame = {
    val nbrMin = edges
      .join(labels.select(col("id").as("nbr"), col("lbl").as("nbr_lbl")), "nbr")
      .groupBy("id")
      .agg(min("nbr_lbl").as("min_nbr"))
    labels
      .join(nbrMin, Seq("id"))
      .select(col("id"), least(col("lbl"), col("min_nbr")).as("lbl"))
  }

  /** Seed labels: lbl0 = min(id, min direct neighbor) — round 1 fused into
    * the member-discovery aggregation (same cost as a distinct over edge
    * endpoints, one propagation round saved). */
  def seedLabels(edges: DataFrame): DataFrame =
    edges.groupBy("id").agg(least(col("id"), min("nbr")).as("lbl"))

  def connectedComponents(edges: DataFrame): DataFrame =
    connectedComponentsWithRounds(edges)._1

  /** [[connectedComponents]] plus the round count it took — the
    * convergence-speed contract (pointer-jumping turns long chains from
    * O(diameter) into ~8 + O(log n) rounds) is assertable, not just
    * logged. */
  def connectedComponentsWithRounds(edges: DataFrame): (DataFrame, Int) = {
    def lblSum(df: DataFrame): Long = {
      val v = df.agg(sum("lbl")).first().get(0)
      if (v == null) 0L else v.asInstanceOf[Long]
    }
    // LAZY localCheckpoint throughout the loop: the eager form ran two
    // driver-blocking jobs per round (checkpoint materialization, then
    // the convergence sum over the checkpointed blocks); lazily, the
    // lblSum action materializes the checkpoint AND reads the sum in ONE
    // job — half the serial job count of every CC consumer
    // (v12/v12b/v12c/t16/t28/t59), identical labels and lineage cut.
    var labels = seedLabels(edges).localCheckpoint(false)
    var curSum = lblSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 64) {
      val prop = propagationRound(edges, labels)
      // near-dup graphs converge in 2-3 plain rounds (shallow by nature);
      // if one is still moving after 8, add pointer-jumping
      // (lbl <- lbl(lbl)) to those rounds — shortcutting turns long-chain
      // convergence from O(diameter) into O(log n) at the cost of one
      // extra self-join, paid only when needed. Labels are always member
      // ids (mins of member ids), so the self-lookup is total.
      val next =
        if (rounds < 8) prop
        else
          prop
            .join(
              prop.select(col("id").as("lbl"), col("lbl").as("lbl2")),
              Seq("lbl"),
              "left"
            )
            .select(
              col("id"),
              least(col("lbl"), coalesce(col("lbl2"), col("lbl"))).as("lbl")
            )
      labels = next.localCheckpoint(false)
      val nextSum = lblSum(labels)
      converged = nextSum == curSum
      curSum = nextSum
      rounds += 1
    }
    require(converged, s"label propagation did not converge in $rounds rounds")
    log.warn(s"connectedComponents converged in $rounds rounds")
    (labels, rounds)
  }

  /** Both edge directions from a one-directional pair table, via a single
    * evaluation of the (possibly expensive) pair pipeline. */
  def bidirectional(pairs: DataFrame, a: String, b: String): DataFrame =
    pairs
      .select(
        explode(
          array(
            struct(col(a).as("id"), col(b).as("nbr")),
            struct(col(b).as("id"), col(a).as("nbr"))
          )
        ).as("e")
      )
      .select("e.id", "e.nbr")
}
