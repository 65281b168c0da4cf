package graft.config

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** JSON task model, capability-parity with the reference CLI config
  * (reference: datacooker-dist-cli/.../Configuration.java:89-107).
  *
  * Shape:
  * {{{
  * { "directionName": [
  *     { "source": {"adapter": "hadoopColumnar", "path": "...",
  *                  "part_count": 4, "name": "optional",
  *                  "params": {"delimiter": ",", ...}},
  *       "dest":   {"adapter": "parquet", "path": "...", "params": {}} } ] }
  * }}}
  *
  * Params stay loosely typed (`Map[String, Any]`) exactly like the
  * reference's `Map<String, Object>`; each adapter validates and coerces
  * them against its declared [[graft.adapters.ParamDef]]s.
  */
final case class DistLocation(
    adapter: String,
    path: String,
    partCount: Int = 0,
    subName: Option[String] = None,
    params: Map[String, Any] = Map.empty)

/** One pipeline task: load → optional SQL transform → save. `transform`
  * is a SQL statement run against the loaded stream, which is bound as
  * the temp view `_input` (applied per stream on multi-stream loads).
  * The reference delegates SQL processing to its sibling ETL tool
  * (README.md:1 "to supplement Data Cooker ETL"); this engine carries
  * the SQL surface natively, so the pipeline can use it in place.
  *
  * `"verify": true` turns the task into a post-copy integrity check
  * instead of a copy: BOTH locations are loaded and their order-free
  * row fingerprints compared; a mismatch fails the direction.
  * `verify_columns` restricts the fingerprint to named columns
  * (default: every column the two sides share, in source order).
  *
  * `"ingest"` (streaming tasks only) names a registered streaming
  * ingest operator — [[graft.streaming.Ingest.ops]] is the single
  * source of truth for the registry (score / dedup_claim /
  * gate_contaminated / encode_ivfadc / apply_claims / media_dedup) —
  * applied to the
  * stream after the optional `transform`; `"model_dir"` points at the
  * corpus the operator's offline models train from (required with
  * `ingest`). A direction of chained ingest tasks runs the whole
  * tier.
  *
  * `"horizon_ms"` (claim-op ingest tasks only, round 19) bounds the
  * dedup HORIZON: the input must carry an event-time `ts` column, and
  * claim state evicts once the watermark passes keeper claim time +
  * horizon ([[graft.streaming.Streams]] horizoned folds), so a
  * months-long direction's state store is bounded by the horizon, not
  * the corpus. `"lateness"` (default "0 seconds") is the watermark
  * delay for out-of-order arrivals. Without `horizon_ms` the claim
  * state is unbounded — the whole-corpus dedup semantics.
  *
  * `"model_export": true` (round 20) turns the task into an offline
  * model-training export: every model family the ingest tier applies
  * online is trained ONCE from the `source` corpus and persisted as a
  * small parquet table under the `dest` artifact directory (manifest
  * last — [[graft.io.ModelStore]]). An ingest task whose `model_dir`
  * points at an exported directory LOADS the artifact instead of
  * retraining (train-once / apply-everywhere); re-running the export
  * against the same corpus is a no-op. `"model_families"` restricts
  * the export (default: every family in
  * `graft.io.ModelStore.Families` — restrict when the corpus lacks a
  * family's inputs, e.g. no embeddings table for `ivfadc`). */
final case class DistTask(
    source: DistLocation,
    dest: DistLocation,
    transform: Option[String] = None,
    streaming: Boolean = false,
    verify: Boolean = false,
    verifyColumns: Seq[String] = Seq.empty,
    ingest: Option[String] = None,
    modelDir: Option[String] = None,
    horizonMs: Option[Long] = None,
    lateness: String = "0 seconds",
    modelExport: Boolean = false,
    modelFamilies: Seq[String] = Seq.empty)

final case class DistConfig(directions: Map[String, Seq[DistTask]]) {
  def direction(name: String): Seq[DistTask] =
    directions.getOrElse(
      name,
      throw new IllegalArgumentException(
        s"Direction '$name' not found; configured: ${directions.keys.mkString(", ")}"))
}

object DistConfig {
  private val om = new ObjectMapper()

  def parse(json: String): DistConfig = {
    val root = om.readTree(json)
    require(root.isObject, "Config root must be a JSON object of directions")
    val dirs = root.properties().asScala.map { e =>
      val tasks = e.getValue.elements().asScala.map { t =>
        val task = DistTask(
          location(t, "source"),
          location(t, "dest"),
          Option(t.get("transform")).map(_.asText()),
          Option(t.get("streaming")).exists(_.asBoolean()),
          Option(t.get("verify")).exists(_.asBoolean()),
          Option(t.get("verify_columns"))
            .map(_.elements().asScala.map(_.asText()).toSeq)
            .getOrElse(Seq.empty),
          Option(t.get("ingest")).map(_.asText()),
          Option(t.get("model_dir")).map(_.asText()),
          Option(t.get("horizon_ms")).map(_.asLong()),
          Option(t.get("lateness")).map(_.asText()).getOrElse("0 seconds"),
          Option(t.get("model_export")).exists(_.asBoolean()),
          Option(t.get("model_families"))
            .map(_.elements().asScala.map(_.asText()).toSeq)
            .getOrElse(Seq.empty))
        // model_export is a self-contained batch verb (source = the
        // training corpus, dest = the artifact dir): combining it with
        // streaming/ingest/verify/transform would silently apply only
        // one of the two semantics
        require(!task.modelExport || (!task.streaming && !task.verify &&
            task.ingest.isEmpty && task.transform.isEmpty),
          s"task in direction '${e.getKey}': 'model_export' is a standalone " +
            "batch task and cannot combine with streaming/ingest/verify/transform")
        require(task.modelFamilies.isEmpty || task.modelExport,
          s"task in direction '${e.getKey}': 'model_families' only applies " +
            "to a 'model_export' task")
        // exact op set, not a substring test: apply_claims CONSUMES a
        // ledger and would silently ignore a horizon
        require(task.horizonMs.isEmpty || task.ingest.exists(
            Set("dedup_claim", "dedup_simhash_claim", "media_dedup",
              "url_dedup_claim").contains),
          s"task in direction '${e.getKey}': 'horizon_ms' only applies to " +
            "claim-op ingest tasks (dedup_claim / dedup_simhash_claim / " +
            "media_dedup / url_dedup_claim)")
        // fail loudly, at parse time: a batch task with `ingest` set
        // would otherwise copy the data verbatim — the quality/
        // contamination gate silently never runs and the output looks
        // plausible (ADVICE r16). Matches the streaming path's
        // model_dir check in posture.
        require(task.ingest.isEmpty || task.streaming,
          s"task in direction '${e.getKey}': 'ingest' (${task.ingest.get}) " +
            "requires '\"streaming\": true' — a batch task would ignore it " +
            "and copy the data unprocessed")
        task
      }.toSeq
      e.getKey -> tasks
    }.toMap
    DistConfig(dirs)
  }

  private def location(task: JsonNode, field: String): DistLocation = {
    val n = Option(task.get(field)).getOrElse(
      throw new IllegalArgumentException(s"Task is missing required '$field'"))
    def req(k: String): String = Option(n.get(k)).map(_.asText()).getOrElse(
      throw new IllegalArgumentException(s"'$field' is missing required '$k'"))
    DistLocation(
      adapter = req("adapter"),
      path = req("path"),
      partCount = Option(n.get("part_count")).map(_.asInt()).getOrElse(0),
      subName = Option(n.get("name")).map(_.asText()),
      params = Option(n.get("params")).map(any(_).asInstanceOf[Map[String, Any]])
        .getOrElse(Map.empty))
  }

  /** JsonNode → plain Scala values (String/Boolean/Long/Double/Seq/Map). */
  private def any(n: JsonNode): Any = n match {
    case _ if n.isTextual => n.asText()
    case _ if n.isBoolean => n.asBoolean()
    case _ if n.isIntegralNumber => n.asLong()
    case _ if n.isFloatingPointNumber => n.asDouble()
    case _ if n.isArray => n.elements().asScala.map(any).toSeq
    case _ if n.isObject =>
      n.properties().asScala.map(e => e.getKey -> any(e.getValue)).toMap
    case _ if n.isNull => null
    case other => other.asText()
  }
}
