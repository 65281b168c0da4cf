package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** The r20 zero-exchange Lloyd assignment (graft.functions.BestCell)
  * must replicate the pinned two-phase argmax value-for-value:
  * double prefilter (dot_f semantics, survivors within 1e-9 of the
  * max) + exact-DECIMAL re-rank (dot_dec, ties to lowest cell). The
  * DuckDB oracle gates every consumer end-to-end; this spec pins the
  * kernel against an INDEPENDENT Scala reference (string-path decimal
  * rounding, no DecimalDotOps code shared) on the fixture corpus, and
  * asserts the native path actually engages for LocalRelation models
  * (a silent fallback to the window formulation would make the oracle
  * gate vacuously green while the optimization quietly disappears). */
class BestCellSpec extends SparkSpec {

  /** Reference best cell: the q_kmeans_train contract in plain Scala.
    * Decimal terms via the r10 string formulation (BigDecimal.valueOf
    * = shortest repr, HALF_UP at scale 12) — independent of the
    * term12 fast path under test. */
  private def referenceBest(
      v: Seq[Float], cents: Seq[(Long, Seq[Float])]): Option[Long] = {
    if (cents.isEmpty) return None
    val dd = cents.map { case (_, c) =>
      val n = math.min(v.length, c.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v(i).toDouble * c(i).toDouble; i += 1 }
      s
    }
    val thr = dd.max - 1e-9
    val survivors = cents.zip(dd).filter(_._2 >= thr).map(_._1)
    def cdOf(c: Seq[Float]): JBD = {
      val n = math.min(v.length, c.length)
      var acc = JBD.ZERO
      var i = 0
      while (i < n) {
        acc = acc.add(JBD.valueOf(v(i).toDouble * c(i).toDouble)
          .setScale(12, RoundingMode.HALF_UP))
        i += 1
      }
      acc
    }
    Some(survivors
      .map { case (cell, c) => (cdOf(c), cell) }
      .minBy { case (cd, cell) => (cd.negate, cell) }(
        Ordering.Tuple2(Ordering.ordered[JBD], Ordering.Long))
      ._2)
  }

  private def centsDf(cents: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    cents.toDF("cell", "c_emb")
  }

  test("kmAssign native path engages for a LocalRelation model and matches the reference") {
    val e = graft.io.Tables(spark, sf(), "embeddings")
    val vecs = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    // a deliberately adversarial model: real embeddings (so decimal
    // re-ranks actually tie-break) + one duplicated centroid under two
    // cell ids (exact cd tie -> lowest cell must win)
    val cents: Seq[(Long, Seq[Float])] =
      vecs.take(12).map { case (id, emb) => (id, emb) }.toSeq :+
        (999999L, vecs.head._2)
    val assign = Similarity.kmAssign(spark, sf(), centsDf(cents))
    // the native path must be IN the executed plan (no window argmax)
    val plan = assign.queryExecution.executedPlan.toString
    assert(plan.contains("best_cell"), s"native argmax not engaged:\n$plan")
    assert(!plan.contains("Window"), s"window argmax still present:\n$plan")
    val got = assign.select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == vecs.length)
    for ((id, emb) <- vecs) {
      val want = referenceBest(emb, cents).get
      assert(got(id) == want, s"vec $id: native ${got(id)} != reference $want")
    }
  }

  test("carry variant returns prev_cell and identical cells") {
    val e = graft.io.Tables(spark, sf(), "embeddings")
    val cents = e.select(col("vec_id"), col("embedding")).limit(7).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val base = Similarity.kmAssign(spark, sf(), centsDf(cents))
    val carried = Similarity.kmAssign(spark, sf(), centsDf(cents),
      carry = Some(base.withColumn("cell", col("cell") + 1)))
    val rows = carried.collect()
    assert(rows.nonEmpty)
    val baseMap = base.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(r.schema.fieldNames.toSeq ==
        Seq("vec_id", "embedding", "cell", "prev_cell"))
      assert(r.getLong(2) == baseMap(r.getLong(0)), "cell must not depend on carry")
      assert(r.getLong(3) == baseMap(r.getLong(0)) + 1, "prev_cell must pass through")
    }
  }

  test("non-LocalRelation centroid frames fall back to the window formulation") {
    val e = graft.io.Tables(spark, sf(), "embeddings")
    val pipelineCents = e.select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
      .limit(5)
    val assign = Similarity.kmAssign(spark, sf(), pipelineCents)
    val plan = assign.queryExecution.executedPlan.toString
    assert(!plan.contains("best_cell"), "pipeline frame must not take the native path")
    assert(plan.contains("Window"))
  }
}
