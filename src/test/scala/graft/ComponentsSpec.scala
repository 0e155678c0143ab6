package graft

import graft.dedup.Components
import org.apache.spark.sql.functions._

/** Big-star/small-star connected components (VERDICT r1 item 3): same
  * labels as the propagation baseline, but O(log n) rounds on
  * large-diameter graphs where propagation is O(n). */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("star CC: 1024-node path graph converges in O(log n) rounds") {
    // a path 0-1-2-…-1023 has diameter 1023: min-label propagation needs
    // ~1023 rounds (its 25-round default throws); the star algorithm must
    // land every vertex on component 0 in ≤16 alternating rounds
    val chain = (0L until 1023L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Components.starIterate(chain, maxIterations = 50)
    assert(rounds <= 16, s"expected O(log n) rounds, took $rounds")
    val out = labels.collect()
    assert(out.length == 1024)
    assert(out.forall(_.getLong(1) == 0L))
  }

  test("star CC matches propagation baseline on a multi-cluster graph") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain → comp 1
      (10L, 11L), (11L, 10L),       // dup edges → comp 10
      (20L, 21L), (22L, 21L), (20L, 22L), // triangle → comp 20
      (30L, 31L)).toDF("id_a", "id_b")
    val star = Components.connectedComponentsStar(pairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val prop = Components.connectedComponents(pairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(star == prop)
    assert(star.filter(_._1 >= 20L).filter(_._1 <= 22L).forall(_._2 == 20L))
  }

  test("star CC: dirty input — self loops, nulls, empty") {
    val dirty = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 1L), (null, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val out = Components.connectedComponentsStar(dirty).orderBy("id").collect()
    // self-loop and null edges dropped; only the 3-4 edge survives
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 4L))
    assert(out.forall(_.getLong(1) == 3L))
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Components.connectedComponentsStar(empty).count() == 0)
  }
}
