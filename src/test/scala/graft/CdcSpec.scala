package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

/** CDC merge-apply (operators/Cdc.scala): latest-change-wins fold of an
  * I/U/D log into a keyed snapshot. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "v")

  test("upsert, delete, insert, and untouched rows in one merge") {
    val changes = Seq(
      (2L, "U", 1L, "b2", 22.0),  // update existing
      (3L, "D", 1L, "c", 30.0),   // delete existing
      (9L, "I", 1L, "i", 90.0))   // brand-new key
      .toDF("k", "op", "seq", "name", "v")
    val out = Cdc.mergeChanges(base, changes, "k", "op", "seq")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 22.0), (9L, "i", 90.0)))
  }

  test("latest sequence wins per key; delete-then-reinsert lands inserted") {
    val changes = Seq(
      (1L, "U", 1L, "a1", 11.0),
      (1L, "U", 2L, "a2", 12.0),   // later update wins
      (2L, "D", 1L, "b", 20.0),
      (2L, "I", 2L, "b-new", 99.0)) // reinsert after delete
      .toDF("k", "op", "seq", "name", "v")
    val out = Cdc.mergeChanges(base, changes, "k", "op", "seq")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a2", 12.0), (2L, "b-new", 99.0), (3L, "c", 30.0)))
  }

  test("same-sequence tie breaks by op precedence I > U > D") {
    val changes = Seq(
      (1L, "D", 5L, "a", 10.0),
      (1L, "I", 5L, "a-ins", 77.0))
      .toDF("k", "op", "seq", "name", "v")
    val out = Cdc.mergeChanges(base, changes, "k", "op", "seq")
      .filter(col("k") === 1L).collect()
    assert(out.length == 1 && out.head.getString(1) == "a-ins")
  }

  test("merge is idempotent on an empty change log and validates schema") {
    val empty = Seq.empty[(Long, String, Long, String, Double)]
      .toDF("k", "op", "seq", "name", "v")
    val out = Cdc.mergeChanges(base, empty, "k", "op", "seq")
    assert(out.orderBy("k").collect().toSeq ==
      base.orderBy("k").collect().toSeq)
    val bad = Seq((1L, "U", 1L)).toDF("k", "op", "seq") // missing payload
    val e = intercept[IllegalArgumentException] {
      Cdc.mergeChanges(base, bad, "k", "op", "seq")
    }
    assert(e.getMessage.contains("missing base columns"))
  }

  test("plan: one keyed window on the CHANGE log only, base never sorted") {
    val changes = Seq((2L, "U", 1L, "b2", 22.0)).toDF("k", "op", "seq", "name", "v")
    val plan = Cdc.mergeChanges(base, changes, "k", "op", "seq")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    // the only windows are the change-log keep-last, keyed on k (the
    // latest frame feeds two branches, so the plan may repeat it; what
    // matters is that every occurrence is key-partitioned and the BASE
    // side stays a bare scan + anti-join)
    val windows = "Window \\[row_number[^\n]*".r.findAllIn(plan).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("windowspecdefinition(k#")), plan)
  }
}
