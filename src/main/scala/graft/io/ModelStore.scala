package graft.io

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable trained-model artifacts (round 20, VERDICT r19 #1 — the
  * production gap the on-demand trainers left open).
  *
  * Every model the ingest tier applies online (classifier weights,
  * langid perceptrons, DSIR log-ratio table, unigram-LM pieces, eval
  * bloom, IVFADC coarse centroids + residual PQ codebook, URL
  * blocklist) is a BOUNDED artifact — a few KB to a few MB — trained
  * from a corpus-scale job. A production deployment trains ONCE
  * offline and ships the artifact; retraining at every stream start
  * (the pre-r20 shape, `streaming/Ingest.scala`) re-runs the
  * corpus-scale job per restart and lets two deployments silently
  * train on different corpus snapshots.
  *
  * This store is the hand-off: [[export]] (the `model_export` batch
  * task in [[graft.runner.DistMain]]) persists each family as one
  * small parquet table under an artifact directory and stamps a
  * manifest; the trainers' memoized entry points
  * (`TextAnalysis.trainedWeights`, `LangId.trainedModel`,
  * `Curation.dsirModel`, `Bpe.unigramModel`,
  * `TextAnalysis.evalBloomBytes`, `Similarity.ivfadcModel`,
  * `Url.blocklistFrame`) probe [[manifest]] first, so a `model_dir`
  * pointing at an exported directory LOADS instead of training — no
  * ingest-op or config change, and the fallback (model_dir = a raw
  * corpus) keeps the on-demand behavior.
  *
  * Bit-identity contract: every table carries an explicit `idx`
  * column capturing the trained Seq order, and loads sort by it — a
  * loaded model is the SAME Scala value the trainer produced
  * (weights/log-probs are exact integers by the determinism rules;
  * float vectors round-trip parquet exactly), so artifact-loaded
  * stream output is bit-identical to on-demand-trained output
  * (DistPipelineSpec round-trip gate).
  *
  * Idempotence: the manifest is written LAST (manifest present =
  * export complete), records the source corpus path, and a re-run
  * against the same corpus with no new families is a no-op; new
  * families export incrementally and merge into the manifest. A
  * different corpus path re-exports everything (two snapshots must
  * never mix in one artifact dir).
  *
  * Scale: export reads the corpus once per family through the same
  * trainers the queries use (each bounded-output by design — SURVEY
  * §8 per-family proofs); the artifact itself is model-sized, so the
  * writes are driver-cheap single-file tables. At 100 TB the
  * training cost lives in the corpus jobs, which is exactly why the
  * artifact exists: pay it once, not per restart. */
object ModelStore {

  /** Exportable families — the single source of truth for the
    * `model_families` config param and the export loop. `ivfadc`
    * writes two tables (coarse centroids + residual codebook) under
    * one family name because they are one model (trained jointly,
    * consumed jointly by `encode_ivfadc`). */
  final val Families: Seq[String] =
    Seq("classifier", "langid", "dsir", "unigram", "bloom", "ivfadc", "blocklist")

  final val ManifestName = "_graft_models.json"

  private final case class Manifest(corpus: String, families: Set[String])

  private val om = new ObjectMapper()

  // positive-only manifest memo per (session, dir): an export later in
  // the same session must become visible, so "no manifest" is never
  // cached; a present manifest is immutable for a given corpus
  private val manifests =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Manifest]]()
  private def manifestMap(s: SparkSession) = manifests.synchronized {
    var m = manifests.get(s)
    if (m == null) { m = scala.collection.concurrent.TrieMap.empty; manifests.put(s, m) }
    m
  }

  private def fsOf(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def readManifest(s: SparkSession, dir: String): Option[Manifest] = {
    val p = new Path(dir, ManifestName)
    val fs = fsOf(s, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      val root = om.readTree(txt)
      require(root.get("format").asInt() == 1,
        s"model artifact manifest $p has format ${root.get("format")}; this build reads 1")
      Some(Manifest(
        root.get("corpus").asText(),
        root.get("families").elements().asScala.map(_.asText()).toSet))
    }
  }

  /** The artifact manifest at `dir`, if one exists (memoized once
    * seen). This is the artifact-vs-corpus detector: trainers load
    * when it is present, train when it is not. */
  private def manifest(s: SparkSession, dir: String): Option[Manifest] = {
    val m = manifestMap(s)
    m.get(dir).orElse {
      val r = readManifest(s, dir)
      r.foreach(m.put(dir, _))
      r
    }
  }

  private[graft] def isArtifactDir(s: SparkSession, dir: String): Boolean =
    manifest(s, dir).isDefined

  /** Artifact presence gate shared by every loader: None when `dir`
    * is a raw corpus (caller trains); a loud failure when `dir` IS an
    * artifact directory but lacks the requested family — falling
    * through to training would read corpus tables that do not exist
    * there and fail far from the cause. */
  private def gate(s: SparkSession, dir: String, family: String): Boolean =
    manifest(s, dir) match {
      case None => false
      case Some(man) =>
        require(man.families.contains(family),
          s"model artifact dir $dir (corpus ${man.corpus}) has no '$family' " +
            s"family; exported: ${man.families.toSeq.sorted.mkString(", ")} — " +
            s"re-run model_export with model_families including '$family'")
        true
    }

  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(new Path(dir, name).toString)

  // ---- loaders (Option = None when dir is a raw corpus) -------------------

  private[graft] def loadClassifier(s: SparkSession, dir: String): Option[Array[Long]] =
    if (!gate(s, dir, "classifier")) None
    else Some(table(s, dir, "classifier").collect()
      .sortBy(_.getInt(0)).map(_.getLong(1)))

  private[graft] def loadLangid(
      s: SparkSession, dir: String): Option[(Seq[String], Array[Array[Long]])] =
    if (!gate(s, dir, "langid")) None
    else {
      val rows = table(s, dir, "langid").collect().sortBy(_.getInt(0))
      Some((rows.map(_.getString(1)).toSeq,
        rows.map(_.getSeq[Long](2).toArray)))
    }

  private[graft] def loadDsir(s: SparkSession, dir: String): Option[Array[Long]] =
    if (!gate(s, dir, "dsir")) None
    else Some(table(s, dir, "dsir").collect()
      .sortBy(_.getInt(0)).map(_.getLong(1)))

  private[graft] def loadUnigram(
      s: SparkSession, dir: String): Option[Seq[(String, Long)]] =
    if (!gate(s, dir, "unigram")) None
    else Some(table(s, dir, "unigram").collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getLong(2))).toSeq)

  private[graft] def loadBloom(s: SparkSession, dir: String): Option[Array[Byte]] =
    if (!gate(s, dir, "bloom")) None
    else Some(table(s, dir, "bloom").collect().sortBy(_.getInt(0))
      .flatMap(_.getAs[Array[Byte]](1)))

  private[graft] def loadIvfadc(s: SparkSession, dir: String)
      : Option[(Seq[(Long, Seq[Float])], Seq[(Int, Int, Seq[Float])])] =
    if (!gate(s, dir, "ivfadc")) None
    else {
      val cents = table(s, dir, "ivf_centroids").collect().sortBy(_.getInt(0))
        .map(r => (r.getLong(1), r.getSeq[Float](2))).toSeq
      val cb = table(s, dir, "pq_codebook").collect().sortBy(_.getInt(0))
        .map(r => (r.getInt(1), r.getInt(2), r.getSeq[Float](3))).toSeq
      Some((cents, cb))
    }

  private[graft] def loadBlocklist(s: SparkSession, dir: String): Option[DataFrame] =
    if (!gate(s, dir, "blocklist")) None
    else Some(table(s, dir, "blocklist").select("bhost"))

  // ---- export ---------------------------------------------------------------

  private def writeTable(df: DataFrame, dir: String, name: String): Unit =
    // model-sized by construction: one file, overwrite (a family
    // re-export against a new corpus replaces, never appends)
    df.coalesce(1).write.mode("overwrite")
      .parquet(new Path(dir, name).toString)

  private def writeManifest(s: SparkSession, dir: String, man: Manifest): Unit = {
    val node = om.createObjectNode()
    node.put("format", 1)
    node.put("corpus", man.corpus)
    val arr = node.putArray("families")
    man.families.toSeq.sorted.foreach(arr.add)
    val p = new Path(dir, ManifestName)
    val out = fsOf(s, p).create(p, true)
    try out.write(om.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    finally out.close()
    manifestMap(s).put(dir, man)
  }

  private def exportOne(
      s: SparkSession, corpus: String, outDir: String, family: String): Unit = {
    import s.implicits._
    family match {
      case "classifier" =>
        val w = graft.queries.TextAnalysis.trainedWeights(s, corpus)
        writeTable(w.toSeq.zipWithIndex.map { case (wt, i) => (i, wt) }
          .toDF("idx", "wt"), outDir, "classifier")
      case "langid" =>
        val langs = graft.queries.LangId.langsOf(s, corpus)
        val model = graft.queries.LangId.trainedModel(s, corpus)
        writeTable(langs.zipWithIndex.map { case (l, ci) => (ci, l, model(ci).toSeq) }
          .toDF("idx", "lang", "wt"), outDir, "langid")
      case "dsir" =>
        val lr = graft.queries.Curation.dsirModel(s, corpus)
        writeTable(lr.toSeq.zipWithIndex.map { case (v, b) => (b, v) }
          .toDF("idx", "lr"), outDir, "dsir")
      case "unigram" =>
        val pieces = graft.queries.Bpe.unigramModel(s, corpus)
        writeTable(pieces.zipWithIndex.map { case ((p, lp), i) => (i, p, lp) }
          .toDF("idx", "piece", "logp"), outDir, "unigram")
      case "bloom" =>
        val bytes = graft.queries.TextAnalysis.evalBloomBytes(s, corpus)
        writeTable(Seq((0, bytes)).toDF("idx", "bytes"), outDir, "bloom")
      case "ivfadc" =>
        val (cents, cb) = graft.queries.Similarity.ivfadcModel(s, corpus)
        writeTable(cents.zipWithIndex.map { case ((c, e), i) => (i, c, e) }
          .toDF("idx", "cell", "c_emb"), outDir, "ivf_centroids")
        writeTable(cb.zipWithIndex.map { case ((m, k, v), i) => (i, m, k, v) }
          .toDF("idx", "m", "k", "cb"), outDir, "pq_codebook")
      case "blocklist" =>
        // distinct here: the live gate distincts at probe build, so the
        // compacted artifact is gate-equivalent (and blocklistRows —
        // the broadcast/bloom branch switch — counts distinct hosts on
        // both shapes)
        writeTable(graft.queries.Url.blocklistFrame(s, corpus).distinct(),
          outDir, "blocklist")
      case other =>
        throw new IllegalArgumentException(
          s"unknown model family '$other'; exportable: ${Families.mkString(", ")}")
    }
  }

  /** Train-and-persist the requested families from `corpus` into
    * `outDir`. Returns the families actually exported this call:
    * empty = the artifact was already complete for this corpus (the
    * incremental-no-op contract); a corpus CHANGE re-exports every
    * requested family (stale families from the old corpus are
    * dropped from the manifest — one artifact dir, one snapshot). */
  private[graft] def exportModels(
      s: SparkSession, corpus: String, outDir: String,
      families: Seq[String] = Families): Seq[String] = {
    val bad = families.filterNot(Families.contains)
    require(bad.isEmpty,
      s"unknown model families ${bad.mkString(", ")}; exportable: ${Families.mkString(", ")}")
    require(families.nonEmpty, "model_export: empty model_families")
    val prior = readManifest(s, outDir)
    val priorFams = prior match {
      case Some(man) if man.corpus == corpus => man.families
      case _ => Set.empty[String]
    }
    val todo = families.filterNot(priorFams.contains)
    todo.foreach(exportOne(s, corpus, outDir, _))
    if (todo.nonEmpty || prior.forall(_.corpus != corpus))
      writeManifest(s, outDir, Manifest(corpus, priorFams ++ todo))
    graft.io.CacheScope.releaseAll()
    todo
  }
}

