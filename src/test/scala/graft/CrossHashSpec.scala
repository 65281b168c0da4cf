package graft

import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** Both CrossHash profiles must agree between their SQL fragment and
  * the driver-side evaluation (plan-time constants such as MinHash
  * seeds are derived driver-side and MUST match what the executors
  * compute), and the cluster profile must stay in the md5 profile's
  * non-negative 60-bit range so every downstream band/bucket/modulus
  * derivation is profile-independent in SHAPE. */
class CrossHashSpec extends SparkSpec {

  private val samples = Seq("", "a", "seed#7", "q#12345", "пример", "emoji ☃",
    "a longer string with spaces and 1234567890 digits")

  private def sqlHash(fragment: String => String, s: String): Long = {
    import spark.implicits._
    Seq(s).toDF("s").selectExpr(fragment("s")).head().getLong(0)
  }

  test("md5 profile: SQL fragment == driver local") {
    for (s <- samples)
      assert(sqlHash(CrossHash.hMd5, s) == CrossHash.localMd5(s), s"md5 mismatch for '$s'")
  }

  test("xxhash64 profile: SQL fragment == driver local") {
    for (s <- samples)
      assert(sqlHash(CrossHash.hXx, s) == CrossHash.localXx(s), s"xx mismatch for '$s'")
  }

  test("both profiles land in the non-negative 60-bit range") {
    for (s <- samples; v <- Seq(CrossHash.localMd5(s), CrossHash.localXx(s))) {
      assert(v >= 0L)
      assert(v <= (1L << 60) - 1)
    }
  }

  test("default profile is the oracle-mirrorable md5") {
    assert(CrossHash.h("s") == CrossHash.hMd5("s"))
    assert(CrossHash.local("x") == CrossHash.localMd5("x"))
  }
}
