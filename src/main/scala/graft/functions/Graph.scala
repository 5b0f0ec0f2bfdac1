package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}

/** Graph analytics over id-pair edge lists — the authority/centrality tier
  * a curation pipeline runs on top of its duplicate-candidate graph (which
  * documents sit at the center of big near-dup families, which are
  * peripheral one-off matches).
  *
  * All arithmetic is integer parts-per-million so results are
  * deterministic and oracle-checkable cell-exact: rank mass starts at
  * 1e6 ppm spread over the nodes and every division floors, identically
  * in Spark (`DIV`) and DuckDB (`//`) on the non-negative values used
  * here.
  */
object Graph {

  /** Damped PageRank over an UNDIRECTED pair list (each input pair `(a,b)`
    * becomes edges both ways), fixed iteration count, integer-ppm
    * arithmetic.
    *
    * Per iteration: `rank'(v) = (1e6-damp) DIV n  +  damp * Σ_{u~v}
    * (rank(u) DIV deg(u)) DIV 1e6`. Floored shares lose a little mass per
    * round (deterministically — both engines floor the same way), which is
    * the price of cell-exact reproducibility; relative ordering is what the
    * operator is for. Nodes are exactly the endpoints of the pair list, so
    * every node has `deg >= 1` and the directed-graph dangling-mass case
    * cannot arise.
    *
    * Scale shape (100 TB): the edge list and degree table are built once
    * and lineage-cut; each iteration is ONE shuffle — the (dst, share)
    * contributions hash-aggregate by node. Ranks/degrees are ids+longs
    * only (text never enters). On a cluster, pre-partition `edges` by
    * `src` and ranks by `node` so the share join is co-located, leaving
    * the contribution aggregation as the only per-round exchange. Lineage
    * is cut every round, so plan depth is O(1) per iteration, not
    * O(2^iters). `reliableCheckpoint = true` swaps localCheckpoint for the
    * HDFS-backed variant (same discipline as
    * [[Dedup.duplicateClusters]]).
    *
    * Returns one row per node: (node, deg, rank_ppm).
    */
  def pageRankPpm(pairs: DataFrame, aCol: String, bCol: String,
      iters: Int = 3, dampPpm: Long = 850000L,
      reliableCheckpoint: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampPpm >= 0L && dampPpm <= 1000000L,
      s"dampPpm must be in [0, 1e6], got $dampPpm")
    def cut(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(true) else df.localCheckpoint(true)
    val fwd = pairs.select(F.col(aCol).as("src"), F.col(bCol).as("dst"))
    val edges = cut(fwd
      .union(fwd.select(F.col("dst").as("src"), F.col("src").as("dst")))
      .distinct())
    val deg = cut(edges.groupBy("src").agg(F.count(F.lit(1)).as("deg")))
    val n = deg.count() // one scalar to the driver; the node count
    require(n > 0L, "pageRankPpm: empty edge list")
    val telePpm = (1000000L - dampPpm) / n
    var ranks = cut(deg.select(F.col("src").as("node"),
      F.lit(1000000L / n).as("rank_ppm")))
    for (_ <- 1 to iters) {
      // share = rank(u) DIV deg(u); contributions aggregate by destination
      val share = ranks
        .join(deg.withColumnRenamed("src", "node"), "node")
        .select(F.col("node").as("src"), F.expr("rank_ppm DIV deg").as("__s"))
      val sums = edges.join(share, "src")
        .groupBy(F.col("dst").as("node"))
        .agg(F.sum("__s").as("__c"))
      // damp * c <= 8.5e5 * 1e6 — far inside BIGINT, no widening needed
      ranks = cut(deg.select(F.col("src").as("node"))
        .join(sums, Seq("node"), "left")
        .select(F.col("node"), F.expr(
          s"CAST($telePpm AS BIGINT) + $dampPpm * coalesce(__c, CAST(0 AS BIGINT)) DIV 1000000")
          .as("rank_ppm")))
    }
    ranks.join(deg.withColumnRenamed("src", "node"), "node")
      .select("node", "deg", "rank_ppm")
  }
}
