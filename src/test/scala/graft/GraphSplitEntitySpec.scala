package graft

import graft.ml.GroupSplit
import graft.operators.EntityResolution
import graft.proximity.Graph
import org.apache.spark.sql.functions._

/** Wave-12 kernels: group-aware split, k-core, degree stats, entity
  * resolution. */
class GraphSplitEntitySpec extends SparkSpec {
  import spark.implicits._

  test("groupSplit: no group straddles the split; assignment is stable") {
    val df = (1 to 5000).map(i => (i.toLong % 97, i)).toDF("g", "v")
    val s = GroupSplit.groupSplit(df, "g", 0.3)
    val straddlers = s.groupBy("g").agg(countDistinct("split").as("k"))
      .filter(col("k") > 1)
    assert(straddlers.count() === 0)
    // both sides populated, and a re-run assigns identically
    val summary = GroupSplit.splitSummary(df, "g", 0.3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(summary("test") > 0 && summary("train") > 0)
    assert(summary("test") + summary("train") === 97L)
    val again = GroupSplit.groupSplit(df, "g", 0.3)
    assert(s.exceptAll(again).isEmpty)
  }

  test("kcorePeel: tail nodes peel, the triangle core survives") {
    // triangle 1-2-3 plus a tail 3-4-5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core = Graph.kcorePeel(edges, k = 2, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(core === Map(1L -> 2, 2L -> 2, 3L -> 2))
    // k=3: nothing in this graph has degree 3 after any peel
    assert(Graph.kcorePeel(edges, k = 3, rounds = 5).count() === 0)
  }

  test("degreeStats: path graph has perfectly disassortative endpoints") {
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.degreeStats(path).head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(r.getLong(3) === 2L) // max degree (middle node)
    // degree pairs (1,2),(2,1),(2,1),(1,2) → corr = −1
    assert(r.getDouble(4) === -1.0)
  }

  test("goldenRecords: chains merge transitively, singleton stays itself") {
    val df = Seq("kate", "kale", "kite", "zebra").toDF("name0")
    val out = EntityResolution.goldenRecords(df, "name0", maxDist = 2)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // kate-kale (1), kate-kite (1), kale-kite (2): one cluster, min name
    assert(out("kate") === (("kale", 3L)))
    assert(out("kale") === (("kale", 3L)))
    assert(out("kite") === (("kale", 3L)))
    assert(out("zebra") === (("zebra", 1L)))
  }
}
