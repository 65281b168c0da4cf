package graft.adapters

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-task S3 credentials/endpoint/region for the s3direct verbs.
  *
  * The reference's whole point with "direct" S3 adapters is that EACH task
  * location carries its own `access_key`/`secret_key`/`endpoint`/`region`
  * (S3DirectStorage.java:14-17, S3DirectInput.java:41-44), so one run can
  * copy between buckets living on different endpoints with different
  * credentials. Spark-first re-expression: S3A's per-bucket configuration
  * (`fs.s3a.bucket.<bucket>.endpoint` / `.access.key` / `.secret.key` /
  * `.endpoint.region`) scopes each task's settings to that task's bucket,
  * then the scan/write itself stays the ordinary Hadoop adapter — listing,
  * split planning, multipart upload and the committer all come from S3A
  * instead of the reference's hand-rolled driver-side listObjects loop
  * (S3DirectInput.java:56-66), which at 100 TB is the difference between
  * distributed split planning and a single-threaded driver listing.
  *
  * Paths use the reference's `s3d://bucket/key` scheme
  * (S3DirectStorage.PATH_PATTERN, S3DirectStorage.java:19) and rewrite to
  * `s3a://` for the actual I/O; plain `s3a://` (or any other scheme, e.g.
  * `file:` under test) passes through untouched.
  *
  * Scoping caveat (documented in docs/adapters.md): settings are per
  * BUCKET, so two tasks naming the same bucket with different credentials
  * in one run conflict — last writer wins. The reference has the same
  * practical shape (one S3 client per task, but tasks race on nothing
  * because each owns its bucket).
  */
object S3Direct {
  /** The reference's per-task S3 knobs (S3DirectStorage.java:14-18). */
  val params: Seq[ParamDef] = Seq(
    ParamDef("access_key", "Per-task S3 access key, scoped to this task's bucket"),
    ParamDef("secret_key", "Per-task S3 secret key, scoped to this task's bucket"),
    ParamDef("endpoint", "Per-task S3 endpoint (heterogeneous endpoints in one run)"),
    ParamDef("region", "Per-task S3 region"),
    ParamDef("content_type",
      "Content-Type set on every object written to this task's bucket " +
        "(S3DirectStorage.java:18, applied per object in " +
        "S3DirectTextOutputFunction.java:63). Mapped to S3A's create-time " +
        "object headers (fs.s3a.bucket.<bucket>.create.header.Content-Type, " +
        "Hadoop 3.3.5+), so the multipart committer stamps it on upload"))

  private[adapters] val paramNames: Set[String] = params.map(_.name).toSet

  private val S3dPath = "^s3d://([^/]+)(?:/(.*))?$".r
  private val S3aPath = "^s3a://([^/]+).*$".r

  /** `s3d://bucket[/key]` → (`s3a://bucket[/key]`, Some(bucket)); a plain
    * `s3a://bucket/...` keeps its path but still yields the bucket scope,
    * so per-task credentials apply to it too (they would otherwise be
    * validated and then silently unused). Non-S3 schemes (file:, hdfs: —
    * e.g. under test) pass through with no scope. */
  def rewrite(path: String): (String, Option[String]) = path match {
    case S3dPath(bucket, key) =>
      val suffix = Option(key).filter(_.nonEmpty).map("/" + _).getOrElse("")
      (s"s3a://$bucket$suffix", Some(bucket))
    case S3aPath(bucket) => (path, Some(bucket))
    case other => (other, None)
  }

  /** Apply this task's S3 settings under the bucket's own conf namespace.
    * S3A merges `fs.s3a.bucket.<bucket>.*` over the global `fs.s3a.*`
    * defaults when it opens that bucket, so concurrent tasks on other
    * buckets are unaffected. */
  def applyConf(spark: SparkSession, bucket: String, conf: AdapterConf): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    def set(suffix: String, param: String): Unit =
      conf.str(param).foreach(v => hc.set(s"fs.s3a.bucket.$bucket.$suffix", v))
    set("access.key", "access_key")
    set("secret.key", "secret_key")
    set("endpoint", "endpoint")
    set("endpoint.region", "region")
    // per-object Content-Type on upload (reference
    // S3DirectTextOutputFunction.java:63): S3A applies
    // `create.header.<Name>` headers to every object it creates in the
    // bucket — the committer's MPU completion carries them, so copied
    // objects served over HTTP get the configured type instead of
    // binary/octet-stream. Harmless on input tasks (no creates).
    set("create.header.Content-Type", "content_type")
  }

  private[adapters] def scopedMeta(verb: String, inner: AdapterMeta): AdapterMeta =
    AdapterMeta(
      verb,
      s"${inner.descr} — direct S3 with per-task credentials/endpoint/region",
      Seq("s3d://bucket/prefix") ++ inner.pathExamples.filterNot(_.startsWith("s3")),
      inner.params ++ params)

  /** The inner adapter must not see the S3-only params (its conf
    * validation would reject them as unknown). */
  private[adapters] def innerConf(inner: AdapterMeta, conf: AdapterConf): AdapterConf =
    AdapterConf(inner, conf.raw -- paramNames)
}

final class S3DirectInputAdapter(verb: String, inner: InputAdapter)
    extends InputAdapter {
  val meta: AdapterMeta = S3Direct.scopedMeta(verb, inner.meta)

  def load(
      spark: SparkSession,
      path: String,
      name: String,
      partCount: Int,
      conf: AdapterConf): ListMap[String, DataFrame] = {
    val (ioPath, bucket) = S3Direct.rewrite(path)
    bucket.foreach(S3Direct.applyConf(spark, _, conf))
    inner.load(spark, ioPath, name, partCount, S3Direct.innerConf(inner.meta, conf))
  }
}

final class S3DirectOutputAdapter(verb: String, inner: OutputAdapter)
    extends OutputAdapter {
  val meta: AdapterMeta = S3Direct.scopedMeta(verb, inner.meta)

  def save(subName: String, df: DataFrame, path: String, conf: AdapterConf): Unit = {
    val (ioPath, bucket) = S3Direct.rewrite(path)
    bucket.foreach(S3Direct.applyConf(df.sparkSession, _, conf))
    inner.save(subName, df, ioPath, S3Direct.innerConf(inner.meta, conf))
  }
}
