package graft

import graft.config.DistConfig
import graft.runner.DistMain

/** JDBC round trip through embedded Derby: parquet → jdbcColumnar output
  * (batched INSERTs) → jdbcColumnar partitioned input → parquet. */
class JdbcAdapterSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  test("jdbc output writes and partitioned input reads back") {
    val base = tmpDir("jdbc")
    // create the table up front (Derby needs DDL; Spark's jdbc writer
    // would create TEXT columns for strings, fine for this round trip)
    val conf = DistConfig.parse(s"""{
      "toDb": [{
        "source": {"adapter": "hadoopParquet", "path": "file:${sf()}/region.parquet"},
        "dest":   {"adapter": "jdbcColumnar", "path": "$url",
                   "params": {"driver": "$driver", "table": "region",
                              "mode": "overwrite", "batch_size": 2}}}],
      "fromDb": [{
        "source": {"adapter": "jdbcColumnar", "path": "$url", "part_count": 2,
                   "params": {"driver": "$driver", "table": "region",
                              "partition_column": "r_regionkey",
                              "lower_bound": "0", "upper_bound": "5"}},
        "dest":   {"adapter": "hadoopParquet", "path": "file:$base/out"}}]
    }""")
    DistMain.runDirection(spark, conf.direction("toDb"), "toDb")
    DistMain.runDirection(spark, conf.direction("fromDb"), "fromDb")
    val out = spark.read.parquet(s"file:$base/out")
    val orig = spark.read.parquet(s"${sf()}/region.parquet")
    assert(out.count() == orig.count())
    assert(out.select("r_name").collect().map(_.getString(0)).sorted.sameElements(
      orig.select("r_name").collect().map(_.getString(0)).sorted))
  }

  test("jdbc placeholder query: one partition per part index, same rows") {
    // reference semantics (JdbcColumnarInput.java:62-77 via JdbcRDD): the
    // query's two ? bind each partition's (start, end) sub-range of
    // [0, part_count]. Split region's 5 rows across 3 parts by
    // r_regionkey % 3.
    def in(q: String, parts: Int) = new graft.adapters.JdbcColumnarInput().load(
      spark, url, "q", parts,
      graft.adapters.AdapterConf(
        new graft.adapters.JdbcColumnarInput().meta,
        Map("driver" -> driver, "query" -> q)))("q")
    val part = in(
      "SELECT \"r_regionkey\", \"r_name\" FROM region WHERE MOD(\"r_regionkey\", 3) BETWEEN ? AND ?", 3)
    assert(part.rdd.getNumPartitions == 3, "one Spark partition per part index")
    val whole = in("SELECT \"r_regionkey\", \"r_name\" FROM region", 0)
    assert(part.collect().map(_.toSeq).toSet == whole.collect().map(_.toSeq).toSet)
    // a query with the wrong placeholder count is rejected up front
    assertThrows[IllegalArgumentException](in("SELECT * FROM region WHERE ? = 1", 2))
    // '?' inside a SQL string literal is text, not a placeholder (the
    // CAST is a Derby-ism: it stores StringType as CLOB, which can't
    // compare to a CHAR literal directly)
    val lit = in(
      "SELECT \"r_regionkey\" FROM region " +
        "WHERE CAST(\"r_name\" AS VARCHAR(64)) <> 'why?'", 2)
    assert(lit.count() == 5)
  }

  test("placeholder split and JdbcRDD bound arithmetic") {
    import graft.adapters.JdbcPlaceholders._
    assert(split("a ? b ? c") == Seq("a ", " b ", " c"))
    assert(split("x = 'q?' AND y BETWEEN ? AND ?") ==
      Seq("x = 'q?' AND y BETWEEN ", " AND ", ""))
    assert(split("tag = 'it''s ?'") == Seq("tag = 'it''s ?'"))
    // double-quoted identifiers and -- line comments hide '?' too
    assert(split("SELECT \"flag?\" FROM t WHERE k BETWEEN ? AND ?") ==
      Seq("SELECT \"flag?\" FROM t WHERE k BETWEEN ", " AND ", ""))
    assert(split("SELECT a -- really?\nFROM t WHERE b = ?") ==
      Seq("SELECT a -- really?\nFROM t WHERE b = ", ""))
    // /* */ block comments hide '?' too, including across lines and
    // nested (standard SQL) — and text after the close is live again
    assert(split("SELECT /* what? */ a FROM t WHERE b = ?") ==
      Seq("SELECT /* what? */ a FROM t WHERE b = ", ""))
    assert(split("SELECT /* line1?\nline2? */ a WHERE b = ?") ==
      Seq("SELECT /* line1?\nline2? */ a WHERE b = ", ""))
    // DEFAULT is non-nesting (MySQL/SQL Server/Oracle/SQLite): the
    // comment ends at the FIRST */ and the following '?' is live
    assert(split("a /* outer /* inner? */ still? */ = ?") ==
      Seq("a /* outer /* inner? */ still", " */ = ", ""))
    // PostgreSQL-style nesting behind the flag
    assert(split("a /* outer /* inner? */ still? */ = ?", nestComments = true) ==
      Seq("a /* outer /* inner? */ still? */ = ", ""))
    // '/*' inside a string literal does not open a comment
    assert(split("a = '/*' AND b = ?") == Seq("a = '/*' AND b = ", ""))
    // an unterminated-looking '/*/' stays inside the comment
    assert(split("a /*/ ? */ = ?") == Seq("a /*/ ? */ = ", ""))
    // reconstruction invariant: split only ever REMOVES live '?'s, so
    // rejoining with '?' reproduces any input byte-for-byte — fuzzed
    // over the state-machine alphabet (quotes, comment openers, ?)
    val alphabet = "?'\"-/*\n ab".toCharArray
    val rnd = new scala.util.Random(8)
    for (_ <- 1 to 2000) {
      val q = Array.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(split(q).mkString("?") == q, s"reconstruction failed for: $q")
    }
    // parts=3 over [0,3]: JdbcRDD yields (0,0) (1,1) (2,3)
    assert((0 until 3).map(bounds(_, 3, 3)) == Seq((0L, 0L), (1L, 1L), (2L, 3L)))
    // parts=4 over [0,4]: (0,0) (1,1) (2,2) (3,4)
    assert((0 until 4).map(bounds(_, 4, 4)) ==
      Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 4L)))
  }

  test("jdbc input via query param wraps as derived table") {
    val streams = new graft.adapters.JdbcColumnarInput().load(
      spark, url, "q", 0,
      graft.adapters.AdapterConf(
        new graft.adapters.JdbcColumnarInput().meta,
        Map("driver" -> driver, "query" -> "SELECT \"r_regionkey\" FROM region WHERE \"r_regionkey\" < 3")))
    assert(streams("q").count() == 3)
  }

  test("keyed upsert: replayed and updated rows land exactly once (portable dialect)") {
    import spark.implicits._
    val out = new graft.adapters.JdbcColumnarOutput()
    def conf(m: Map[String, Any]) = graft.adapters.AdapterConf(out.meta, m)
    val base = Map[String, Any](
      "driver" -> driver, "table" -> "kv", "upsert_keys" -> "k", "batch_size" -> 2)
    // seed the table via plain INSERT mode (an upsert needs an existing
    // table — it has no schema-create path)
    out.save("kv", Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "v", "x"),
      url, conf(Map("driver" -> driver, "table" -> "kv", "mode" -> "overwrite")))
    // upsert: key 2 updated, key 3 new
    val up = Seq((2L, "b2", 2.5), (3L, "c", 3.0)).toDF("k", "v", "x")
    out.save("kv", up, url, conf(base))
    def state() = new graft.adapters.JdbcColumnarInput()
      .load(spark, url, "q", 0, graft.adapters.AdapterConf(
        new graft.adapters.JdbcColumnarInput().meta,
        Map("driver" -> driver, "table" -> "kv")))("q")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    val expected = Seq((1L, "a", 1.0), (2L, "b2", 2.5), (3L, "c", 3.0))
    assert(state() == expected)
    // at-least-once delivery: the SAME upsert replayed must be a no-op
    out.save("kv", up, url, conf(base))
    assert(state() == expected, "replayed upsert must be idempotent")
  }

  test("upsert SQL generation covers all three dialects") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val merge = graft.adapters.JdbcColumnarOutput.upsertSql("t", schema, Seq("k"), "merge")
    assert(merge.contains("MERGE INTO t ") && merge.contains("CAST(? AS BIGINT)")
      && merge.contains("WHEN MATCHED THEN UPDATE SET \"v\" = s.\"v\"")
      && merge.contains("WHEN NOT MATCHED THEN INSERT"))
    val oc = graft.adapters.JdbcColumnarOutput.upsertSql("t", schema, Seq("k"), "on_conflict")
    assert(oc.contains("ON CONFLICT (\"k\") DO UPDATE SET \"v\" = excluded.\"v\""))
    val dk = graft.adapters.JdbcColumnarOutput.upsertSql("t", schema, Seq("k"), "duplicate_key")
    assert(dk.contains("ON DUPLICATE KEY UPDATE `v` = VALUES(`v`)"))
    // all-keys rows: merge must drop the matched clause, on_conflict -> DO NOTHING
    val keysOnly = StructType(Seq(StructField("k", LongType)))
    assert(!graft.adapters.JdbcColumnarOutput.upsertSql("t", keysOnly, Seq("k"), "merge")
      .contains("WHEN MATCHED"))
    assert(graft.adapters.JdbcColumnarOutput.upsertSql("t", keysOnly, Seq("k"), "on_conflict")
      .contains("DO NOTHING"))
    intercept[IllegalArgumentException] {
      graft.adapters.JdbcColumnarOutput.upsertSql("t", schema, Seq("missing"), "merge")
    }
    // portable pair: UPDATE binds non-keys then keys, INSERT binds all;
    // all-key rows probe with a no-op SET
    val (upd, updOrder, ins, insOrder) =
      graft.adapters.JdbcColumnarOutput.updateInsertSql("t", schema, Seq("k"))
    assert(upd == "UPDATE t SET \"v\" = ? WHERE \"k\" = ?" && updOrder == Seq(1, 0))
    assert(ins == "INSERT INTO t (\"k\", \"v\") VALUES (?, ?)" && insOrder == Seq(0, 1))
    val (probeSql, probeOrder, _, _) =
      graft.adapters.JdbcColumnarOutput.updateInsertSql("t", keysOnly, Seq("k"))
    assert(probeSql == "UPDATE t SET \"k\" = \"k\" WHERE \"k\" = ?" && probeOrder == Seq(0))
  }
}
