package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-category modules under
  * [[graft.queries]]; each entry pairs a Spark-first implementation with a
  * DuckDB oracle (in `oracleSql`) where the semantics are SQL-expressible.
  */
object SparkEntry {

  /** All registered capability queries, in declaration order. */
  def allQueries: Seq[Q] =
    Relational.queries ++ Breadth.queries ++ TpchShapes.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Events.queries ++ Multimodal.queries ++ Sampling.queries ++
      Bpe.queries ++ Curation.queries ++ Html.queries ++ LangId.queries ++
      Url.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    graft.functions.GraftRuntime.ensure(spark)
    allQueries.head.fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. Every entry
    * self-installs the engine extensions so the queries run on any
    * session, not just ones built by [[graft.io.Sessions]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map { q =>
      q.name -> { (s: SparkSession, dir: String) =>
        graft.functions.GraftRuntime.ensure(s)
        q.fn(s, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
