package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Hot-shingle cap (SURVEY §8.4): dropping corpus-hot shingles from
  * candidate generation must bound the worst postings list WITHOUT
  * changing the near-dup pair set — the capped run verifies Jaccard on
  * the full shingle sets of each candidate pair. */
class DedupCapSpec extends SparkSpec {

  private def pairs(maxDf: Int): Set[(Long, Long, Double)] =
    Dedup.ngramJaccardPairs(spark, sf(), minJaccard = 0.3, maxDf = maxDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9))
      .toSet

  test("capped candidate generation yields the identical pair set") {
    val uncapped = pairs(0)
    val capped = pairs(2)
    assert(uncapped.nonEmpty, "corpus must contain near-dup pairs")
    assert(capped == uncapped)
  }

  test("no-lang capped truth matches the uncapped inverted-index truth") {
    // the recall harness's ground truth pairs ACROSS languages at
    // j >= 0.5 through the capped kernel — identity vs the uncapped
    // join must hold for that variant too
    def noLang(maxDf: Int): Set[(Long, Long)] =
      Dedup.ngramJaccardPairs(
          spark, sf(), minJaccard = 0.5, maxDf = maxDf, blockByLang = false)
        .select("id_a", "id_b")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
    val uncapped = noLang(0)
    assert(uncapped.nonEmpty, "corpus must contain j >= 0.5 pairs")
    assert(noLang(4) == uncapped)
  }

  test("cap escape: all-hot-overlap clusters survive the cap") {
    // ADVICE r10: a cluster of > maxDf near-identical docs pushes its
    // ENTIRE shared shingle set over the df cap — pre-escape, the
    // capped kernel produced ZERO truth pairs for exactly the pairs a
    // dedup recall harness needs most. Build that corpus: 8 docs
    // sharing a 31-token core (every shared shingle df = 8 > cap) plus
    // a decoy, and require capped == uncapped identity to still hold.
    import spark.implicits._
    val core = (1 to 31).map(i => s"w$i").mkString(" ")
    val docs = (1 to 8).map(i => (i.toLong, "en", s"$core uniq$i")) ++
      Seq((100L, "en", (1 to 40).map(i => s"x${i}a").mkString(" ")))
    val dir = tmpDir("capesc")
    docs.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run(maxDf: Int): Set[(Long, Long)] =
      Dedup.ngramJaccardPairs(spark, dir, minJaccard = 0.5, maxDf = maxDf,
          blockByLang = false)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = run(0)
    assert(uncapped.size == 28, s"expected the 8-doc cluster's 28 pairs, got ${uncapped.size}")
    assert(run(4) == uncapped,
      "capped kernel dropped all-hot-overlap pairs — the cap escape is broken")
  }

  test("the cap is non-vacuous: hot shingles exist and are dropped") {
    val df = graft.io.Tables(spark, sf(), "documents")
      .select(expr("split(trim(text), '\\\\s+')").as("w"), col("lang"))
      .filter(expr("size(w) >= 3"))
      .select(col("lang"), explode(expr("shingles(w, 3)")).as("s"))
      .groupBy(col("lang"), xxhash64(col("s")).as("v"))
      .agg(count(lit(1)).as("df"))
      .agg(max(col("df")))
      .head().getLong(0)
    // this corpus has shingles hotter than the cap used above, so the
    // equality test actually exercised the capped code path
    assert(df > 2, s"max df $df; cap test is vacuous")
  }
}
