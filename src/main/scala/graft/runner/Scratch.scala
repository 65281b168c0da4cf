package graft.runner

import org.apache.spark.sql.functions._
import graft.io.{Sessions, Tables}
import graft.io.CacheScope.Persisted

/** Throwaway measurement probe — NOT part of the engine; never committed
  * with content. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.local("scratch")
    graft.functions.GraftRuntime.ensure(s)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def clean(): Unit = {
      graft.io.CacheScope.releaseAll()
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    import graft.queries.Html
    def oldQ = Html.htmlLines(s, dir)
      .groupBy(col("source"), col("fp"))
      .agg(min(col("line")).as("line"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 3)
      .select(col("source"), col("fp"), col("line"), col("n_docs"))
    def newQ = {
      val lines = Html.htmlLines(s, dir)
        .select(col("doc_id"), col("source"), col("line"), col("fp"))
        .persistScoped()
      val boiler = lines
        .groupBy(col("source"), col("fp"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 3)
      lines.select(col("source"), col("fp"), col("line"))
        .join(boiler, Seq("source", "fp"))
        .groupBy(col("source"), col("fp"))
        .agg(min(col("line")).as("line"), max(col("n_docs")).as("n_docs"))
        .select(col("source"), col("fp"), col("line"), col("n_docs"))
    }
    val variants = Seq("old" -> (() => oldQ), "new" -> (() => newQ))
    // warm both once
    variants.foreach { case (_, f) => clean(); noop(f()) }
    val samples = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to 4; (tag, f) <- variants) {
      clean()
      val t0 = System.nanoTime(); noop(f())
      samples(tag) ::= (System.nanoTime() - t0) / 1e9
    }
    for ((tag, xs) <- samples.toSeq.sortBy(_._1))
      println(f"[scratch] $tag%-6s min=${xs.min}%6.3f  samples=${xs.map(x => f"$x%5.3f").mkString(",")}")
    Sessions.stop(s)
  }
}
