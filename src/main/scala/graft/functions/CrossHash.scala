package graft.functions

/** Deterministic 60-bit hash computable identically in Spark and DuckDB —
  * the primitive under every hash-based operator that is oracle-checked
  * cross-engine (fingerprinting, MinHash, SimHash, LSH).
  *
  * Spark:  `cast(conv(substring(md5(cast(s as binary)),1,15),16,10) as bigint)`
  * DuckDB: `('0x' || substr(md5(s),1,15))::BIGINT`
  *
  * 15 hex digits = 60 bits, always non-negative, fits BIGINT in both
  * engines. md5 of the UTF-8 bytes produces the same lowercase hex on
  * both sides.
  *
  * At 100 TB scale md5 is not the cheapest hash (xxhash64 is ~5× faster
  * and is what [[graft.queries]] would switch to on a real cluster where
  * no cross-engine oracle is needed) — but it is branch-free, codegen'd,
  * and stays inside WholeStageCodegen, so the plan shape is identical.
  */
object CrossHash {

  /** Spark SQL fragment hashing the string expression `inner`. */
  def h(inner: String): String =
    s"cast(conv(substring(md5(cast(($inner) as binary)),1,15),16,10) as bigint)"

  /** DuckDB SQL fragment with identical semantics. */
  def duck(inner: String): String =
    s"('0x' || substr(md5($inner), 1, 15))::BIGINT"

  /** Same hash evaluated driver-side (for plan-time constants such as
    * MinHash permutation seeds). */
  def local(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}
