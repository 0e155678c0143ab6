package graft.stores

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** One artifact's catalog row — the persistent analogue of the
  * reference's Artifact metadata (tags / health tags / owner / status /
  * input / timestamps / free-form meta), which the reference stores as
  * AWS resource tags + Glue table Parameters
  * (reference: src/workbench/core/artifacts/artifact.py:238-417).
  */
case class ArtifactRow(
    name: String,
    artifact_type: String,
    owner: String,
    status: String,
    input: String,
    created: java.sql.Timestamp,
    modified: java.sql.Timestamp,
    tags: Seq[String],
    health_tags: Seq[String],
    meta: Map[String, String])

/** Persistent artifact registry: a small parquet-backed catalog table,
  * one row per artifact. This plays the role of the Glue catalog +
  * resource tags in the reference — every mutation is a read-modify-write
  * of driver-side metadata (bounded: one row per artifact, like Glue),
  * swapped in atomically-enough via the write-new / rotate / rename
  * pattern shared with [[ParameterStore]].
  *
  * Semantics matched to `artifact.py`:
  *  - tags are ordered and duplicate-free on add (`add_tag`, :308-321)
  *  - health tags are a parallel list (`get_health_tags`, :333-345)
  *  - owner / status / input live in metadata (`:349-393`)
  *  - `health_check` returns `["needs_onboard"]` until the artifact is
  *    ready (`:395-409`)
  *  - `summary` merges the basic fields with the free-form meta (`:411-425`)
  */
class Registry(spark: SparkSession, root: String) {
  import spark.implicits._

  private val path = root + "/_registry"
  private def hPath(s: String) = new org.apache.hadoop.fs.Path(s)
  private def fs = hPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def now() = new java.sql.Timestamp(System.currentTimeMillis())

  private def rows(): Seq[ArtifactRow] = {
    // READ-SIDE RACE GUARD: swapIn renames path→_bak before installing
    // the new copy, so a reader can win exists(path) and lose the file
    // before the parquet read lands. Every on-disk copy is COMPLETE
    // (write-new/rotate/rename), so a loser just retries against
    // whichever copy exists — reads are never torn, only briefly stale
    // (the reference's own Glue reads have the same read-committed
    // semantics under its DDL retry, athena_source.py:253-288).
    var attempt = 0
    while (attempt < 8) {
      val candidates = Seq(path, path + "_bak").filter(p => fs.exists(hPath(p)))
      if (candidates.isEmpty) return Seq.empty
      try return spark.read.parquet(candidates.head).as[ArtifactRow].collect().toSeq
      catch { case _: Exception => attempt += 1; Thread.sleep(20) }
    }
    spark.read.parquet(path).as[ArtifactRow].collect().toSeq // last try, loud
  }

  private def swapIn(updated: Seq[ArtifactRow]): Unit = {
    val tmp = path + "_tmp"; val bak = path + "_bak"
    updated.toDS().coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    // only clear a stale _bak when the primary exists — if a prior crash
    // left _bak as the sole readable copy (rows() falls back to it),
    // deleting it before tmp→path installs would leave no recoverable
    // registry at all
    if (fs.exists(hPath(path))) {
      fs.delete(hPath(bak), true)
      fs.rename(hPath(path), hPath(bak))
    }
    fs.rename(hPath(tmp), hPath(path))
    fs.delete(hPath(bak), true)
  }

  /** Mutual exclusion for the read-modify-write cycle: an atomic
    * create-if-absent lockfile (the filesystem analogue of the
    * reference's Glue DDL retry/backoff — athena_source.py:253-288).
    * A lock older than `staleMs` is treated as a crashed writer's
    * leftover and broken. */
  private def tryAcquire(lock: org.apache.hadoop.fs.Path, token: String): Boolean = {
    val scheme = lock.toUri.getScheme
    if (scheme == null || scheme == "file") {
      // Hadoop's RawLocalFileSystem.createNewFile is check-then-act;
      // java.nio Files.createFile is the actually-atomic local primitive
      try {
        val p = java.nio.file.Paths.get(lock.toUri.getPath)
        java.nio.file.Files.createFile(p)
        java.nio.file.Files.write(p, token.getBytes("UTF-8"))
        true
      } catch { case _: java.io.IOException => false }
    } else // HDFS/object stores: create(overwrite=false) is atomic server-side
      try {
        val out = fs.create(lock, false)
        out.write(token.getBytes("UTF-8")); out.close(); true
      } catch { case _: Exception => false }
  }

  private def lockToken(lock: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val in = fs.open(lock)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8"))
      } finally in.close()
    } catch { case _: Exception => None }

  private def withLock[T](staleMs: Long = 60000L, timeoutMs: Long = 30000L)(f: => T): T = {
    val lock = hPath(path + "_lock")
    // a unique token identifies THIS acquisition: after breaking a stale
    // lock, the (possibly still-live) previous holder's release must not
    // free the lock out from under the new holder — each writer deletes
    // only the lockfile carrying its own token
    val token = java.util.UUID.randomUUID().toString
    fs.mkdirs(lock.getParent) // first-ever write: the root may not exist yet
    val deadline = System.currentTimeMillis() + timeoutMs
    var acquired = false
    while (!acquired) {
      acquired = tryAcquire(lock, token)
      if (!acquired) {
        val stale = try {
          System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime > staleMs
        } catch { case _: Exception => false } // holder released between checks
        // break a stale lock by atomic RENAME, not delete: two waiters
        // that both judged it stale would otherwise both delete — the
        // second delete landing AFTER the first waiter re-acquired,
        // destroying a live lock and letting both enter the critical
        // section. Rename succeeds for exactly one breaker; the loser
        // just loops back to tryAcquire.
        if (stale) {
          val broken = hPath(lock.toString + ".stale-" + token)
          try { if (fs.rename(lock, broken)) fs.delete(broken, false) }
          catch { case _: Exception => () }
        }
        else if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"registry lock at $lock not released within ${timeoutMs}ms")
        else Thread.sleep(20)
      }
    }
    try f finally {
      if (lockToken(lock).contains(token)) fs.delete(lock, false)
    }
  }

  private def update(name: String)(f: ArtifactRow => ArtifactRow): Unit =
    withLock() {
      val existing = rows()
      val row = existing.find(_.name == name).getOrElse(
        ArtifactRow(name, "unknown", "unknown", "unknown", "unknown",
          now(), now(), Seq.empty, Seq.empty, Map.empty))
      swapIn(existing.filterNot(_.name == name) :+ f(row).copy(modified = now()))
    }

  /** Create-or-touch the registry row (`created` is set once). */
  def upsert(name: String, artifactType: String, input: String = "unknown"): Unit =
    update(name)(r => r.copy(artifact_type = artifactType, input = input))

  /** Full onboarding row in ONE read-modify-write (type, input, owner,
    * status ready, health tags cleared, extra meta merged) — callers
    * must not observe a half-initialized artifact between separate
    * setter calls. */
  def onboardRow(name: String, artifactType: String, input: String,
                 owner: String, meta: Map[String, String] = Map.empty): Unit =
    update(name)(r => r.copy(artifact_type = artifactType, input = input,
      owner = owner, status = "ready", health_tags = Seq.empty,
      meta = r.meta ++ meta))

  def get(name: String): Option[ArtifactRow] = rows().find(_.name == name)
  def listNames(): Seq[String] = rows().map(_.name).sorted
  def list(): DataFrame =
    rows().sortBy(_.name).toDS().toDF()
  def delete(name: String): Unit =
    withLock() { swapIn(rows().filterNot(_.name == name)) }

  /** Merge new keys into the artifact's free-form metadata
    * (reference: `upsert_workbench_meta`, artifact.py:238-276). */
  def upsertMeta(name: String, newMeta: Map[String, String]): Unit =
    update(name)(r => r.copy(meta = r.meta ++ newMeta))
  /** Atomic append to a comma-list meta value: the read-modify-write of
    * the current list happens INSIDE the registry lock. Two concurrent
    * appenders both land (an unlocked get-then-upsertMeta would lose
    * one — the lock only serializes writes, not stale reads). */
  def appendMetaList(name: String, key: String, value: String): Unit =
    update(name) { r =>
      val cur = r.meta.get(key).map(_.split(",").toSeq.filter(_.nonEmpty))
        .getOrElse(Nil)
      r.copy(meta = r.meta + (key -> (cur :+ value).distinct.mkString(",")))
    }
  def deleteMetaKey(name: String, key: String): Unit =
    update(name)(r => r.copy(meta = r.meta - key))
  /** Replace a whole key NAMESPACE in one locked read-modify-write:
    * every existing key under any of `prefixes` is dropped, then
    * `newMeta` merges in. One registry write regardless of how many
    * keys move — per-key deleteMetaKey cycles cost a full lock + parquet
    * swap each. */
  def replaceMetaPrefixes(name: String, prefixes: Seq[String],
                          newMeta: Map[String, String]): Unit =
    update(name)(r => r.copy(meta =
      r.meta.filterNot { case (k, _) => prefixes.exists(k.startsWith) } ++ newMeta))
  def getMeta(name: String): Map[String, String] =
    get(name).map(_.meta).getOrElse(Map.empty)

  // ── tags (ordered, duplicate-free — artifact.py:278-345) ──
  def getTags(name: String): Seq[String] = get(name).map(_.tags).getOrElse(Seq.empty)
  def setTags(name: String, tags: Seq[String]): Unit =
    update(name)(_.copy(tags = tags.distinct))
  def addTag(name: String, tag: String): Unit =
    update(name)(r => r.copy(tags = (r.tags :+ tag).distinct))
  def removeTag(name: String, tag: String): Unit =
    update(name)(r => r.copy(tags = r.tags.filterNot(_ == tag)))

  def getHealthTags(name: String): Seq[String] =
    get(name).map(_.health_tags).getOrElse(Seq.empty)
  def setHealthTags(name: String, tags: Seq[String]): Unit =
    update(name)(_.copy(health_tags = tags.distinct))
  def addHealthTag(name: String, tag: String): Unit =
    update(name)(r => r.copy(health_tags = (r.health_tags :+ tag).distinct))
  def removeHealthTag(name: String, tag: String): Unit =
    update(name)(r => r.copy(health_tags = r.health_tags.filterNot(_ == tag)))

  // ── owner / status / input (artifact.py:349-393) ──
  def getOwner(name: String): String = get(name).map(_.owner).getOrElse("unknown")
  def setOwner(name: String, owner: String): Unit = update(name)(_.copy(owner = owner))
  def getStatus(name: String): String = get(name).map(_.status).getOrElse("unknown")
  def setStatus(name: String, status: String): Unit = update(name)(_.copy(status = status))
  def getInput(name: String): String = get(name).map(_.input).getOrElse("unknown")
  def setInput(name: String, input: String): Unit = update(name)(_.copy(input = input))

  /** `["needs_onboard"]` until the artifact reaches `ready`
    * (reference: artifact.py:395-409); the computed issues are also
    * persisted as health tags like `set_health_tags`. */
  def healthCheck(name: String): Seq[String] = {
    val issues = if (getStatus(name) != "ready") Seq("needs_onboard") else Seq.empty
    setHealthTags(name, issues)
    issues
  }

  /** Basic fields + free-form meta in one map
    * (reference: artifact.py:411-425). */
  def summary(name: String): Map[String, String] =
    get(name).map { r =>
      Map(
        "name" -> r.name, "artifact_type" -> r.artifact_type,
        "owner" -> r.owner, "status" -> r.status, "input" -> r.input,
        "created" -> r.created.toString, "modified" -> r.modified.toString,
        "tags" -> r.tags.mkString(":"),
        "health_tags" -> r.health_tags.mkString(":")) ++ r.meta
    }.getOrElse(Map.empty)
}
