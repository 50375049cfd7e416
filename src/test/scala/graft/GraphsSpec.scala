package graft

import graft.ops.Graphs

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toDF("src", "dst")

  test("pageRank matches the closed-form chain a-b-c after two iterations") {
    // symmetric chain: outdeg a=1, b=2, c=1; r0 = 1
    // iter1: r(a)=r(c)=0.15+0.85·0.5=0.575, r(b)=0.15+0.85·(1+1)=1.85
    // iter2: r(a)=r(c)=0.15+0.85·0.925=0.93625, r(b)=0.15+0.85·(0.575+0.575)=1.1275
    val e = edges(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L)
    val r = Graphs.pageRank(e, "src", "dst", iterations = 2)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r(1L) - 0.93625) < 1e-9)
    assert(math.abs(r(2L) - 1.1275) < 1e-9)
    assert(math.abs(r(3L) - 0.93625) < 1e-9)
  }

  test("pageRank on a symmetric cycle is uniform and mass-conserving") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 1L, 3L -> 2L, 1L -> 3L)
    val r = Graphs.pageRank(e, "src", "dst", iterations = 5)
      .as[(Long, Double)].collect().toMap
    // every node: outdeg 2, in-contrib 2·(r/2) = r → fixpoint at 1 exactly
    assert(r.values.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("pageRank drops self-loops and collapses duplicate edges") {
    // with the self-loop dropped and dup (1,2) collapsed this is the
    // 2-node symmetric pair → both ranks sit at the fixpoint 1
    val e = edges(1L -> 1L, 1L -> 2L, 1L -> 2L, 2L -> 1L)
    val r = Graphs.pageRank(e, "src", "dst", iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(r.size == 2)
    assert(math.abs(r(1L) - 1.0) < 1e-9 && math.abs(r(2L) - 1.0) < 1e-9)
  }

  test("pageRank sinks keep only teleport mass on a directed star") {
    // hub 1 → leaves 2,3 (no back-edges): leaves have no out-edges in the
    // edge frame... they DO appear as nodes. hub has no in-edges.
    // iter1: r(hub)=0.15; r(leaf)=0.15+0.85·(1/2)=0.575
    // iter2: r(leaf)=0.15+0.85·(0.15/2)=0.21375
    val e = edges(1L -> 2L, 1L -> 3L)
    val r = Graphs.pageRank(e, "src", "dst", iterations = 2)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r(1L) - 0.15) < 1e-9)
    assert(math.abs(r(2L) - 0.21375) < 1e-9)
    assert(math.abs(r(3L) - 0.21375) < 1e-9)
  }

  test("hopDistance caps at maxHops and keeps unreached nodes absent") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val seeds = Seq(1L).toDF("node")
    val d = Graphs.hopDistance(e, "src", "dst", seeds, maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L)) // 4 is beyond the cap
  }

  test("hopDistance takes the shortest path when a shortcut exists") {
    val e = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L)
    val seeds = Seq(1L).toDF("node")
    val d = Graphs.hopDistance(e, "src", "dst", seeds, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("hopDistance keeps isolated seeds and merges multi-seed fronts") {
    val e = edges(1L -> 2L, 5L -> 2L)
    val seeds = Seq(1L, 5L, 99L).toDF("node")
    val d = Graphs.hopDistance(e, "src", "dst", seeds, maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 5L -> 0L, 99L -> 0L, 2L -> 1L))
  }

  test("hits separates hub and authority roles on a bipartite star") {
    // suppliers {1,2} → customers {10,11,12}; supplier 1 ships to all,
    // supplier 2 only to 10. One iteration, mean-normalized:
    // a_raw = (2,1,1), mean 4/3 → a = (1.5, .75, .75)
    // h_raw = (3.0, 1.5), mean 2.25 → h = (1.333333, 0.666667) after q6
    val e = edges(1L -> 10L, 1L -> 11L, 1L -> 12L, 2L -> 10L)
    val out = Graphs.hits(e, "src", "dst", iterations = 1)
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(out(("hub", 1L)) - 1.333333) < 1e-9)
    assert(math.abs(out(("hub", 2L)) - 0.666667) < 1e-9)
    assert(math.abs(out(("authority", 10L)) - 1.5) < 1e-9)
    assert(math.abs(out(("authority", 11L)) - 0.75) < 1e-9)
    assert(math.abs(out(("authority", 12L)) - 0.75) < 1e-9)
    assert(out.size == 5)
  }

  test("hits is stable on a uniform bipartite graph (fixpoint at 1)") {
    val e = edges(1L -> 10L, 1L -> 11L, 2L -> 10L, 2L -> 11L)
    val out = Graphs.hits(e, "src", "dst", iterations = 3)
      .as[(String, Long, Double)].collect()
    assert(out.forall(r => math.abs(r._3 - 1.0) < 1e-9))
  }

  test("triangleCounts on K4 gives every node 3 triangles") {
    val e = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val t = Graphs.triangleCounts(e, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(t == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts collapses reversed/duplicate edges and drops loops") {
    // triangle 1-2-3 written with mixed directions + noise
    val e = edges(1L -> 2L, 2L -> 1L, 3L -> 2L, 1L -> 3L, 3L -> 3L, 1L -> 2L,
      4L -> 1L) // pendant edge: no triangle for 4
    val t = Graphs.triangleCounts(e, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(t == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts handles a hub: star has none, fan closes some") {
    // hub 1 connected to 2..5; extra edge 2-3 closes exactly one triangle
    val e = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L, 2L -> 3L)
    val t = Graphs.triangleCounts(e, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(t == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
