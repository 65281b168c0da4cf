package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.CrossHash.{duck, h}
import graft.io.Tables

/** Deterministic sampling operators — the reproducible way to sample at
  * 100 TB. `df.sample()` is seed-stable only per partitioning, so a
  * training pipeline that must reproduce its corpus split across runs
  * (and across engines) keys the decision on a content hash instead:
  * every row carries its own sampling verdict, independent of partition
  * layout, executor count, or engine. All three operators are pure
  * map-stage filters — no shuffle beyond their final reporting
  * aggregation, and the filter composes with scan pushdown of every
  * other predicate.
  */
object Sampling {

  val queries: Seq[Q] = Seq(

    // ---- 5% deterministic sample (hash-gated filter) -----------------------
    Q(
      "q_sample_hash",
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE ${duck("o_orderkey::VARCHAR")} % 100 < 5""") { (s, dir) =>
      Tables(s, dir, "orders")
        .filter(expr(s"${h("cast(o_orderkey as string)")} % 100 < 5"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // ---- 80/10/10 train/val/test split -------------------------------------
    // the split is a pure function of doc_id: adding machines, re-running,
    // or re-partitioning never moves a document between splits
    Q(
      "q_train_test_split",
      s"""SELECT split, count(*) AS cnt, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM (SELECT doc_id,
        |        CASE WHEN ${duck("doc_id::VARCHAR")} % 100 < 80 THEN 'train'
        |             WHEN ${duck("doc_id::VARCHAR")} % 100 < 90 THEN 'val'
        |             ELSE 'test' END AS split
        |      FROM documents)
        |GROUP BY split""") { (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          expr(s"""CASE WHEN ${h("cast(doc_id as string)")} % 100 < 80 THEN 'train'
                  |     WHEN ${h("cast(doc_id as string)")} % 100 < 90 THEN 'val'
                  |     ELSE 'test' END""".stripMargin).as("split"))
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("cnt"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
    },

    // ---- stratified sample: per-language 10% with per-stratum report -------
    Q(
      "q_stratified_sample",
      s"""SELECT lang, count(*) AS sampled, min(doc_id) AS min_id
        |FROM documents
        |WHERE ${duck("lang || '/' || doc_id::VARCHAR")} % 100 < 10
        |GROUP BY lang""") { (s, dir) =>
      Tables(s, dir, "documents")
        .filter(expr(s"${h("concat(lang, '/', cast(doc_id as string))")} % 100 < 10"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("sampled"), min(col("doc_id")).as("min_id"))
    })
}
