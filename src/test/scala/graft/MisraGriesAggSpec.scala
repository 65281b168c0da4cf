package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[graft.functions.MisraGriesAgg]]: the Misra–Gries guarantees that make
  * `q_heavy_hitters`' two-pass plan EXACT —
  *  (1) superset: every token with true freq > n/(k+1) is in the summary,
  *      across arbitrary repartitionings (i.e. arbitrary merge trees);
  *  (2) lower bound: every surviving weight is ≤ the true count, with
  *      undercount ≤ n/(k+1);
  *  (3) capacity: the summary never exceeds k entries.
  * The generators push far past k distinct tokens so partition-local
  * eviction AND the merge-time (k+1)-th-largest prune both fire — the
  * harness corpus (~31 distinct tokens vs k=64) never exercises either.
  * Raw ScalaCheck generators with fixed seeds (the scalatest bridge is
  * not on the offline classpath), same pattern as [[PropertySpec]].
  */
class MisraGriesAggSpec extends SparkSpec {

  graft.functions.GraftRuntime.ensure(spark)
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(1042L + i)))

  // skewed stream: a few hot tokens + a long tail of rare ones
  private val caseGen: Gen[(List[String], Int, Int)] = for {
    nHot <- Gen.choose(1, 4)
    hotReps <- Gen.choose(30, 80)
    tailSize <- Gen.choose(50, 300)
    tail <- Gen.listOfN(tailSize, Gen.choose(0, 999).map(i => s"t$i"))
    k <- Gen.choose(4, 12)
    parts <- Gen.choose(1, 7)
  } yield (
    (0 until nHot).toList.flatMap(i => List.fill(hotReps)(s"hot$i")) ++ tail,
    k, parts)

  private def summary(stream: List[String], k: Int, parts: Int): Map[String, Long] =
    stream.toDF("t").repartition(parts)
      .agg(expr(s"mg_agg(t, $k)").as("mg"))
      .select(explode($"mg").as("e")).select($"e.t", $"e.lb")
      .as[(String, Long)].collect().toMap

  test("superset + lower-bound + capacity hold under skew and repartitioning") {
    cases(caseGen, 10).foreach { case (stream, k, parts) =>
      val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val n = stream.size.toLong
      val mg = summary(stream, k, parts)
      assert(mg.size <= k, s"capacity: ${mg.size} > $k")
      exact.filter { case (_, c) => c * (k + 1) > n }.foreach { case (t, c) =>
        assert(mg.contains(t), s"item $t freq $c > n/(k+1) (n=$n, k=$k) missing")
      }
      mg.foreach { case (t, lb) =>
        val c = exact.getOrElse(t, 0L)
        assert(lb <= c, s"weight $lb for $t exceeds true count $c")
        assert(c - lb <= n / (k + 1) + 1, s"undercount ${c - lb} beyond bound")
      }
    }
  }

  test("distinct-tokens <= k degenerates to exact counts") {
    val stream = List.fill(7)("a") ++ List.fill(3)("b") ++ List("c")
    val mg = summary(stream, k = 8, parts = 3)
    assert(mg == Map("a" -> 7L, "b" -> 3L, "c" -> 1L))
  }

  test("nulls are skipped") {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("t")
    val mg = df.agg(expr("mg_agg(t, 4)").as("mg"))
      .select(explode($"mg").as("e")).select($"e.t", $"e.lb")
      .as[(String, Long)].collect().toMap
    assert(mg == Map("x" -> 2L))
  }
}
