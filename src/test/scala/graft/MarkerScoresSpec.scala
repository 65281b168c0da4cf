package graft

import org.apache.spark.sql.functions._

/** Native marker_scores expression: value parity with the interpreted
  * HOF formulation it replaced, multi-set membership, null elements,
  * and the single-tokenization plan property of its consumer queries. */
class MarkerScoresSpec extends SparkSpec {

  test("marker_scores matches size(filter(...)) per set on real documents") {
    val sets = Seq(
      "en" -> Seq("the", "a", "of", "and", "is"),
      "de" -> Seq("der", "die", "das", "und", "ist"),
      "fr" -> Seq("le", "la", "les", "et", "est"),
      "es" -> Seq("el", "los", "las", "y", "es"))
    val call = s"marker_scores(w, ${sets.map(s => "'" + s._2.mkString(",") + "'").mkString(", ")})"
    val d = graft.io.Tables(spark, sf(), "documents")
      .select(expr("split(trim(text), '\\\\s+')").as("w"))
    val rows = sets.zipWithIndex.foldLeft(d.select(col("w"), expr(call).as("ms"))) {
      case (df, ((l, ws), i)) =>
        df.withColumn(s"hof_$l",
          expr(s"size(filter(w, t -> t in (${ws.map("'" + _ + "'").mkString(",")})))").cast("long"))
          .withColumn(s"native_$l", col(s"ms.c$i"))
    }.collect()
    assert(rows.nonEmpty)
    for (r <- rows; (l, _) <- sets) {
      assert(r.getAs[Long](s"hof_$l") == r.getAs[Long](s"native_$l"), s"set $l differs")
    }
    // total == size(w)
    val t = d.select(expr(call).as("ms"), size(col("w")).cast("long").as("n"))
      .filter(expr("ms.total <> n")).count()
    assert(t == 0L)
  }

  test("marker_scores: word in several sets counts in each; null tokens skipped") {
    import spark.implicits._
    val df = Seq(Seq("es", "the", "es", null, "x")).toDF("w")
    val r = df.selectExpr("marker_scores(w, 'the,es', 'es,y')").collect()(0).getStruct(0)
    assert(r.getLong(0) == 5L) // total counts nulls as elements (= size(w))
    assert(r.getLong(1) == 3L) // 'the' + 2x'es'
    assert(r.getLong(2) == 2L) // 2x'es'
  }

  test("marker_scores runs inside WholeStageCodegen") {
    val plan = graft.io.Tables(spark, sf(), "documents").limit(10)
      .selectExpr("marker_scores(split(trim(text), '\\\\s+'), 'the,a')")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("marker_scores") && l.contains("*(")))
  }

  test("non-literal / null word-set arguments fail with a usable message, not an NPE") {
    val df = graft.io.Tables(spark, sf(), "documents").limit(1)
    for (bad <- Seq("cast(null as string)", "text")) {
      val e = intercept[Exception] {
        df.selectExpr(s"marker_scores(split(trim(text), '\\\\s+'), $bad)").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("non-null string literals")),
        s"unhelpful error for $bad: $e")
    }
  }

  test("langid/quality/modal/reasons: ONE tokenization per row, no interpreted HOF") {
    for (q <- Seq("q_text_langid", "q_text_quality", "q_modal_consistency", "q_filter_reasons")) {
      val plan = SparkEntry.queries(q)(spark, sf()).queryExecution.optimizedPlan
      val s = plan.toString
      assert(!s.contains("lambdafunction"), s"$q still evaluates an interpreted HOF:\n$s")
      // the split feeding marker_scores must not be duplicated into
      // multiple consumers (the round-8 ~6-tokenizations-per-row bug).
      // Counted PER ARGUMENT: a derived-fixture decoration may
      // legitimately tokenize the RAW text once to size its padding
      // (q_filter_reasons' symbol-ratio arm, r19) — that is a different
      // column from the operator's tokenization, not a duplication; the
      // bug class is the SAME attribute split twice
      val splitArgs = "split\\(trim\\((\\w+#\\d+)".r
        .findAllMatchIn(s).map(_.group(1)).toSeq
      assert(splitArgs.size == splitArgs.distinct.size,
        s"$q re-tokenizes a column (${splitArgs.mkString(", ")}):\n$s")
    }
  }
}
