package graft

import org.apache.spark.sql.functions._

import graft.ops.SkewJoin

/** Salted skew join: result parity with the plain join, deterministic
  * salting, and the plan property it exists for — the shuffle key is
  * (key, salt), not the narrow key alone. */
class SkewJoinSpec extends SparkSpec {

  private def events = graft.io.Tables(spark, sf(), "events")

  private def dim = {
    import spark.implicits._
    Seq(("click", 1.0), ("view", 0.5), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0))
      .toDF("event_type", "weight")
  }

  test("salted join equals the plain join, any salt count") {
    val plain = events.join(dim, Seq("event_type"))
      .select(col("event_id"), col("weight"))
    for (salts <- Seq(1, 8)) {
      val salted = SkewJoin.salted(events, dim, Seq("event_type"), col("event_id"), salts)
        .select(col("event_id"), col("weight"))
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"salted($salts) result diverged")
    }
  }

  test("salting is deterministic across runs") {
    val a = SkewJoin.salted(events, dim, Seq("event_type"), col("event_id"), 8)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = SkewJoin.salted(events, dim, Seq("event_type"), col("event_id"), 8)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("shuffle runs on (key, salt): hot keys spread over salt buckets") {
    val plan = SkewJoin.salted(events, dim, Seq("event_type"), col("event_id"), 8)
      .queryExecution.executedPlan.toString
    // the join's exchange must carry the salt column alongside the key
    assert(plan.contains("__salt"), s"salt column missing from the plan:\n$plan")
    val exchangeLine = plan.linesIterator.find(_.contains("Exchange hashpartitioning"))
    exchangeLine.foreach(l => assert(l.contains("__salt"), s"exchange not salted: $l"))
  }
}
