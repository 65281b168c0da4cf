package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native per-row PQ encode ([[graft.functions.PqCodes]], round 15)
  * replaced the r14 relational kernel (corpus × broadcast codebook
  * crossJoin → packed-BIGINT max HashAggregate). Its contract is
  * bit-identical code selection — per-term double→DECIMAL(28,12)
  * rounding, 2·dotInt − ccInt integer scoring, ties to the LOWEST code
  * — which this spec pins by running BOTH formulations over the real
  * corpus with the real trained codebook, plus the edge semantics
  * (ties, null elements, short vectors) the corpus never exercises. */
class PqEncodeSpec extends SparkSpec {

  private def dir = sf("sf0.01")

  /** The r14 relational encode, verbatim — kept here as the reference
    * formulation the native loop must agree with row-for-row. */
  private def relationalCodes(vecs: DataFrame, cbDf: DataFrame): DataFrame = {
    val cbc = cbDf.withColumn("cc_int",
      expr("cast(dot_dec(cb, cb) * 1000000000000 as bigint)"))
    vecs.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cbc))
      .select(col("vec_id"), col("m"),
        expr("""(2 * cast(dot_dec(slice(embedding, m * 8 + 1, 8), cb)
                 * 1000000000000 as bigint) - cc_int) * 16 + (15 - k)""").as("pack"))
      .groupBy(col("vec_id"), col("m"))
      .agg(max(col("pack")).as("mp"))
      .select(col("vec_id"), col("m").cast("int").as("m"),
        (lit(15) - pmod(col("mp"), lit(16))).cast("int").as("code"))
  }

  test("native pq_codes agrees with the relational kernel on the full corpus, trained codebook") {
    import spark.implicits._
    val cb = graft.queries.Similarity.pqModel(spark, dir).cb
    val e = graft.io.Tables(spark, dir, "embeddings")
    val native = e.select(col("vec_id"),
      posexplode(expr(graft.queries.Similarity.pqCodesSql("embedding", cb)))
        .as(Seq("m", "code")))
      .select(col("vec_id"), col("m").cast("int").as("m"), col("code").cast("int").as("code"))
    val relational = relationalCodes(e, cb.toDF("m", "k", "cb"))
    val (f0, x0) = (graft.functions.PqCodes.fastSubspaces.sum(),
      graft.functions.PqCodes.exactSubspaces.sum())
    assert(native.count() == relational.count())
    assert(native.exceptAll(relational).isEmpty && relational.exceptAll(native).isEmpty,
      "native and relational PQ encodes disagree")
    // prefilter coverage on the REAL corpus/codebook: the margin proof
    // makes codes correct either way, but an all-exact run would mean
    // the two-phase optimization silently stopped covering anything
    val (fd, xd) = (graft.functions.PqCodes.fastSubspaces.sum() - f0,
      graft.functions.PqCodes.exactSubspaces.sum() - x0)
    assert(fd > 0, "no subspace took the double prefilter")
    assert(fd.toDouble / (fd + xd) > 0.9,
      s"prefilter coverage collapsed: fast=$fd exact=$xd")
    info(s"prefilter coverage on the corpus: fast=$fd exact=$xd")
  }

  test("near-tie codebooks: the double prefilter's fallback agrees with the relational kernel") {
    // a codebook of DUPLICATED entries (pairs (c, c)) makes the top-2
    // scores tie EXACTLY for every vector — zero clears no positive
    // margin, so every subspace must take the exact fallback, whose
    // lowest-code tie-break must reproduce the relational argmax at
    // scale (400 vectors × 2 subspaces, not just the single-row tie
    // case below). A float perturbation cannot produce this regime:
    // one float ulp already moves the score ~1e-8, three decades above
    // the 2e-11 margin — gaps inside (0, margin] require adversarially
    // crafted vector/entry pairs, and the margin PROOF covers them.
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    def vec(): Seq[Float] = Seq.fill(16)((rnd.nextFloat() * 2 - 1))
    val base = Seq.fill(8)(Seq.fill(8)(rnd.nextFloat() * 2 - 1).map(_.toFloat))
    val cbRows: Seq[(Int, Int, Seq[Float])] =
      for (m <- 0 until 2; k <- 0 until 16) yield (m, k, base(k / 2))
    val vecs = (0 until 400).map(i => (i.toLong, vec())).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val native = vecs.select(col("vec_id"),
      posexplode(expr(graft.queries.Similarity.pqCodesSql("embedding", cbRows)))
        .as(Seq("m", "code")))
      .select(col("vec_id"), col("m").cast("int").as("m"), col("code").cast("int").as("code"))
    // the relational reference at this geometry: DS = 8, K = 16
    val cbDf = cbRows.toDF("m", "k", "cb")
      .select(col("m"), col("k"), col("cb").cast("array<float>").as("cb"))
    val x0 = graft.functions.PqCodes.exactSubspaces.sum()
    val relational = relationalCodes(vecs, cbDf)
    assert(native.exceptAll(relational).isEmpty && relational.exceptAll(native).isEmpty,
      "near-tie fallback disagrees with the relational kernel")
    assert(graft.functions.PqCodes.exactSubspaces.sum() > x0,
      "the near-tie codebook never exercised the exact fallback")
  }

  test("ties break to the lowest code (duplicate codebook entries)") {
    // two identical entries per subspace: the argmax sees equal scores
    // and must keep k=0 — the relational pack's (15 - k) under max
    val codes = spark.sql(
      """SELECT pq_codes(array(cast('1.5' as float), cast('-2.0' as float)),
        |  array(array(array(cast('1.5' as float), cast('-2.0' as float)),
        |              array(cast('1.5' as float), cast('-2.0' as float)),
        |              array(cast('9.0' as float), cast('9.0' as float))))) AS c""".stripMargin)
      .head().getSeq[Int](0)
    assert(codes == Seq(0), s"tie must keep the lowest code, got $codes")
  }

  test("null elements and short vectors skip terms exactly like dot_dec") {
    // vector covers subspace 0 fully, subspace 1 only partially (one
    // element, one NULL): the dot for (m=1) must use only the present
    // pairs — the dot_dec min-length/skip-null rule — so the best code
    // is decided by 2*(partial dot) - cc
    val row = spark.sql(
      """SELECT pq_codes(
        |    array(cast('1.0' as float), cast('1.0' as float),
        |          cast('3.0' as float), cast(null as float)),
        |    array(array(array(cast('1.0' as float), cast('1.0' as float)),
        |                array(cast('-1.0' as float), cast('-1.0' as float))),
        |          array(array(cast('4.0' as float), cast('100.0' as float)),
        |                array(cast('3.0' as float), cast('-100.0' as float))))) AS c
        |""".stripMargin).head().getSeq[Int](0)
    // m=0: full dot; entry 0 scores 2*2-2=2, entry 1 scores -2-2=-4 -> 0
    // m=1: only element 0 present (3.0); entry0: 2*12-(16+10000)=-9992,
    //      entry1: 2*9-(9+10000)=-9991 -> code 1 (the null skipped the
    //      100-weight term on BOTH the dot and nothing else)
    assert(row == Seq(0, 1), s"expected codes [0, 1], got $row")
  }

  test("NULL embedding yields one NULL code per subspace, not a dropped row") {
    // the r15 edge: callers posexplode, so a NULL array result would
    // silently drop the row — the contract is an array of M NULL codes
    // (the old aggregate's carry-a-null behavior), never a NULL array
    val rows = spark.sql(
      """SELECT pos, code FROM (SELECT pq_codes(cast(null as array<float>),
        |    array(array(array(cast('1.0' as float)), array(cast('2.0' as float))),
        |          array(array(cast('3.0' as float)), array(cast('4.0' as float))))) AS c)
        |LATERAL VIEW posexplode(c) t AS pos, code""".stripMargin)
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getInt(1)))
    assert(rows.toSeq == Seq((0, null), (1, null)),
      s"NULL embedding must posexplode to M null-code rows, got ${rows.toSeq}")
  }

  test("vectors shorter than the subspace offset score only cc (lowest-|c| entry wins)") {
    val row = spark.sql(
      """SELECT pq_codes(array(cast('1.0' as float)),
        |    array(array(array(cast('5.0' as float)), array(cast('1.0' as float))),
        |          array(array(cast('7.0' as float)), array(cast('2.0' as float))))) AS c
        |""".stripMargin).head().getSeq[Int](0)
    // m=0: dots 5 and 1 -> scores 2*5-25=-15 vs 2*1-1=1 -> code 1
    // m=1: no elements -> dot 0 -> scores -49 vs -4 -> code 1
    assert(row == Seq(1, 1), s"expected codes [1, 1], got $row")
  }
}
