package graft

import graft.queries.Dedup

/** Prefix filtering (SSJoin/PPJoin): candidate generation restricted to
  * each doc's (n − ⌈θn⌉ + 1)-prefix under the global (df, hash) order is
  * recall-LOSSLESS by theorem — unlike the df cap, whose identity is
  * corpus-dependent. These tests drive the kernel against the uncapped
  * inverted-index truth and check that the prefix actually prunes. */
class PrefixFilterSpec extends SparkSpec {

  private def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e9) / 1e9))
      .toSet

  test("prefix-filtered pair set == uncapped inverted-index pair set (theorem)") {
    val truth = norm(
      Dedup.ngramJaccardPairs(spark, sf(), minJaccard = 0.5, maxDf = 0))
    val prefix = norm(Dedup.prefixJoinPairs(spark, sf(), minJaccard = 0.5))
    assert(truth.nonEmpty, "corpus must contain j >= 0.5 pairs")
    assert(prefix == truth)
  }

  test("identity holds on a heavy-duplication corpus (every shingle hot)") {
    // the corpus shape that breaks df capping pre-escape: a clique of 8
    // near-identical docs whose ENTIRE shared shingle set is corpus-hot.
    // Prefix filtering needs no escape hatch — the prefix of each clique
    // member still contains shared shingles by construction.
    import spark.implicits._
    val core = (1 to 31).map(i => s"w$i").mkString(" ")
    val docs = (1 to 8).map(i => (i.toLong, "en", s"$core uniq$i")) ++
      Seq((100L, "en", (1 to 40).map(i => s"x${i}a").mkString(" ")))
    val dir = tmpDir("prefixclq")
    docs.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val truth = norm(Dedup.ngramJaccardPairs(spark, dir, minJaccard = 0.5, maxDf = 0))
    val prefix = norm(Dedup.prefixJoinPairs(spark, dir, minJaccard = 0.5))
    assert(truth.size == 28, "8-clique should yield C(8,2) pairs")
    assert(prefix == truth)
  }

  test("the prefix really prunes: the kernel's ACTUAL prefix postings are ~half") {
    import org.apache.spark.sql.functions._
    val sh = Dedup.shingleFrame(spark, sf())
    val full = sh.select(explode(col("shingles"))).count()
    val nDocs = sh.count()
    // count the rows the kernel's own prefix frame emits — a regression
    // that widens (or disables) the rk filter fails HERE, where the
    // pair-set identity tests cannot catch it (longer prefixes only add
    // candidates, never pairs)
    val actual = Dedup.prefixPostings(sh).count()
    assert(actual <= full / 2 + nDocs,
      s"prefix frame has $actual of $full postings — filter not pruning")
    assert(actual > 0)
  }
}
