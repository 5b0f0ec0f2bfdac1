package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Graph

/** PageRank-over-pairs tests: one hand-computed iteration on a path graph,
  * centrality ordering on a star, and input-orientation invariance. */
class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("pageRankPpm: one iteration on a path graph, hand-computed") {
    // path 1-2-3: deg 1/2/1, n=3, init 333333 each, teleport 50000.
    // shares: 1->333333, 2->166666, 3->333333
    // sums:   node1=166666, node2=666666, node3=166666
    // ranks:  1,3: 50000 + (850000*166666) DIV 1e6 = 191666
    //         2:   50000 + (850000*666666) DIV 1e6 = 616666
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r = Graph.pageRankPpm(pairs, "a", "b", iters = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted
    assert(r.toSeq == Seq((1L, 1L, 191666L), (2L, 2L, 616666L),
      (3L, 1L, 191666L)))
  }

  test("pageRankPpm: star center dominates leaves after 3 iterations") {
    val pairs = (2L to 6L).map(l => (1L, l)).toDF("a", "b")
    val rows = Graph.pageRankPpm(pairs, "a", "b", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(rows(1L) > rows(2L))
    assert((2L to 6L).map(rows).toSet.size == 1) // leaves identical
  }

  test("pageRankPpm: exact match against a driver-side integer reference on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 4 + rnd.nextInt(8)
      val raw = (for (_ <- 1 to n * 2)
        yield (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(p => p._1 != p._2)
      if (raw.nonEmpty) {
        val iters = 1 + rnd.nextInt(3)
        // reference: same integer-ppm recurrence, plain Scala maps
        val edges = raw.flatMap(p => Seq(p, p.swap)).distinct
        val nodes = edges.map(_._1).distinct.sorted
        val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val nn = nodes.size.toLong
        var rank = nodes.map(_ -> 1000000L / nn).toMap
        for (_ <- 1 to iters) {
          val contrib = edges.groupBy(_._2).view.mapValues(
            _.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
          rank = nodes.map(v =>
            v -> (150000L / nn + 850000L * contrib.getOrElse(v, 0L) / 1000000L)).toMap
        }
        val got = Graph.pageRankPpm(raw.toDF("a", "b"), "a", "b", iters)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        assert(got == rank, s"trial $trial (n=$n iters=$iters): $got vs $rank")
      }
    }
  }

  test("pageRankPpm: pair orientation doesn't matter (undirected edges)") {
    val fwd = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val mixed = Seq((2L, 1L), (2L, 3L), (4L, 3L)).toDF("a", "b")
    val a = Graph.pageRankPpm(fwd, "a", "b", iters = 2)
      .collect().map(x => (x.getLong(0), x.getLong(2))).sorted.toSeq
    val b = Graph.pageRankPpm(mixed, "a", "b", iters = 2)
      .collect().map(x => (x.getLong(0), x.getLong(2))).sorted.toSeq
    assert(a == b)
  }
}
