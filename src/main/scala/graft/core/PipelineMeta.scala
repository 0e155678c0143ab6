package graft.core

/** PipelineMeta: resolves pipeline node configuration from the
  * `PIPELINE_META` environment variable (JSON object) — the reference's
  * env-config resolver (core/pipelines/pipeline_meta.py:1-174). Fails
  * hard on a missing variable, invalid JSON, or a `get` without a
  * default — a pipeline node running with half a config is worse than
  * one that dies loudly.
  *
  * `env` is injectable for tests (sys.env by default). JSON parsing
  * rides Spark's bundled json4s — no extra dependency.
  */
class PipelineMeta(env: Map[String, String] = sys.env) {
  import org.json4s._

  private def fail(msg: String): Nothing =
    throw new RuntimeException(s"PipelineMeta: $msg")

  private def toScala(v: JValue): Any = v match {
    case JString(s) => s
    case JBool(b) => b
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JArray(xs) => xs.map(toScala)
    case JObject(fs) => fs.map { case JField(k, x) => k -> toScala(x) }.toMap
    case _ => null
  }

  private val meta: Map[String, Any] = {
    val raw = env.getOrElse("PIPELINE_META",
      fail("PIPELINE_META environment variable not set"))
    val parsed =
      try org.json4s.jackson.JsonMethods.parse(raw)
      catch { case e: Exception => fail(s"Failed to parse PIPELINE_META: ${e.getMessage}") }
    val m = parsed match {
      case o: JObject => toScala(o).asInstanceOf[Map[String, Any]]
      case _ => fail("PIPELINE_META must be a JSON object")
    }
    // mode defaults to null (modeless nodes have none — don't fabricate
    // one; a KNOWN key so mode and get("mode") agree); serverless
    // defaults to true (pipeline_meta.py:140-143)
    Map[String, Any]("mode" -> null, "serverless" -> true) ++ m
  }

  private val Missing = new Object
  /** Fail-hard lookup: no default → RuntimeException on a missing key
    * (pipeline_meta.py:47-64). */
  def get(key: String, default: Any = Missing): Any =
    meta.getOrElse(key,
      if (default.asInstanceOf[AnyRef] ne Missing) default
      else fail(s"Key '$key' not found in PIPELINE_META"))

  def modelName: String = get("model_name").asInstanceOf[String]
  def endpointName: String = get("endpoint_name").asInstanceOf[String]
  /** Challenger model names for a promote node (its model inputs). */
  def challengers: Seq[String] =
    get("challengers").asInstanceOf[Seq[Any]].map(_.toString)
  def mode: Option[String] = Option(meta("mode")).map(_.toString)
  def serverless: Boolean = get("serverless").asInstanceOf[Boolean]

  private var owner: String = "test"
  def setOwner(o: String): Unit = owner = o
  /** Mode-appropriate owner string (pipeline_meta.py:96-117):
    * dt/ts → "DT"; promote → "Pro-{owner}"; else the owner as set. */
  def dynamicOwner: String = mode match {
    case Some("dt") | Some("ts") => "DT"
    case Some("promote") => s"Pro-$owner"
    case _ => owner
  }

  override def toString: String =
    s"PipelineMeta(mode=${mode.orNull}, model=${meta.get("model_name").orNull}, " +
      s"endpoint=${meta.get("endpoint_name").orNull}, serverless=${meta.get("serverless").orNull})"
}
