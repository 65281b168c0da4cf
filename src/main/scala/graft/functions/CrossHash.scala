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
  * CLUSTER PROFILE (round-12): md5 exists for the cross-engine oracle;
  * on a real cluster, where no DuckDB twin runs, `GRAFT_HASH=xxhash64`
  * (env var, or `-Dgraft.hash=xxhash64`) swaps every Spark-side call
  * site to codegen'd xxhash64 masked to the same non-negative 60-bit
  * range — several times cheaper per row and branch-free inside
  * WholeStageCodegen, with the identical plan shape. The DuckDB
  * fragment [[duck]] intentionally keeps md5: the profile is for
  * production/bench runs ONLY, and the correctness gate must run with
  * the default profile (hash VALUES differ across profiles by design;
  * every derived artifact — signatures, bands, buckets, fingerprints —
  * is internally consistent under either). `docs/hash_profile.md`
  * records the measured delta.
  */
object CrossHash {

  /** 2^60 - 1: keeps both profiles in the same non-negative range. */
  private final val Mask60 = (1L << 60) - 1

  /** Latched ONCE at first use and immutable for the JVM lifetime
    * (ADVICE r12): flipping `graft.hash` mid-JVM would mix md5-derived
    * plan-time constants (MinHash seeds, sem-plane weights, memoized
    * kernel frames) with xxhash64 fragments in later queries — an
    * internally inconsistent artifact with no error. Pick the profile
    * before the first query of the JVM. */
  private lazy val clusterProfile: Boolean =
    sys.env.get("GRAFT_HASH").orElse(sys.props.get("graft.hash"))
      .contains("xxhash64")

  /** Spark SQL fragment hashing the string expression `inner` under the
    * active profile. */
  def h(inner: String): String = if (clusterProfile) hXx(inner) else hMd5(inner)

  /** The oracle-mirrorable md5 fragment (default profile). */
  def hMd5(inner: String): String =
    s"cast(conv(substring(md5(cast(($inner) as binary)),1,15),16,10) as bigint)"

  /** The cluster-profile fragment: codegen'd xxhash64 (seed 42, Spark's
    * builtin) masked to the non-negative 60-bit range. */
  def hXx(inner: String): String =
    s"(xxhash64($inner) & $Mask60)"

  /** DuckDB SQL fragment with semantics identical to [[hMd5]] — the
    * oracle side never switches profile. */
  def duck(inner: String): String =
    s"('0x' || substr(md5($inner), 1, 15))::BIGINT"

  /** Same hash evaluated driver-side (for plan-time constants such as
    * MinHash permutation seeds), following the active profile. */
  def local(s: String): Long = if (clusterProfile) localXx(s) else localMd5(s)

  def localMd5(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Driver-side twin of [[hXx]]: Spark's own interpreted XXH64 on the
    * UTF-8 string with the builtin seed 42, masked to 60 bits —
    * CrossHashSpec asserts SQL/driver agreement for both profiles. */
  def localXx(s: String): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType, 42L)
    h & Mask60
  }

  private val md5Local = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Executor-side per-ROW twin of [[h]] on a UTF8String, for native
    * expressions ([[MinHashBands]]) that hash many strings per row: no
    * String round-trip, no hex formatting (the first 15 hex digits of
    * an md5 are the big-endian first-8-bytes value >>> 4), digest
    * instance reused per thread. CrossHashSpec pins equality with
    * [[local]] under both profiles. */
  def localUtf8(u: org.apache.spark.unsafe.types.UTF8String): Long =
    if (clusterProfile) {
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        u, org.apache.spark.sql.types.StringType, 42L) & Mask60
    } else {
      val md = md5Local.get()
      md.reset()
      val d = md.digest(u.getBytes)
      val be =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      be >>> 4
    }
}
