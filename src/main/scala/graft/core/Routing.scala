package graft.core

import scala.jdk.CollectionConverters._

/** In-JVM record of adaptive path decisions (exact↔bucketed switches in
  * Proximity.knnJoinAdaptive, Dedup.cosineNearDup, Metrics.rankedScores).
  *
  * The switches are already surfaced per-call via warn logs; this queue
  * exists so a harness (Bench's scale ladder) can attribute decisions to
  * the query that triggered them and report WHICH queries changed path
  * between data scales — the recall-relevant fact a log stream buries.
  * Decisions are construction-time and rare (one per operator call), so
  * an always-on concurrent queue costs nothing on the data path.
  */
object Routing {
  private val q = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Record one routing decision, e.g. record("knn", "bucketed-euclidean", n). */
  def record(op: String, path: String, n: Long): Unit = q.add(s"$op=$path")

  /** Drain and return the distinct decisions since the last drain. */
  def drain(): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    var v = q.poll()
    while (v != null) { out += v; v = q.poll() }
    out.toSeq
  }
}
