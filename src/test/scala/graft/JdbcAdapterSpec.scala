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

  test("jdbc input via query param wraps as derived table") {
    val streams = new graft.adapters.JdbcColumnarInput().load(
      spark, url, "q", 0,
      graft.adapters.AdapterConf(
        new graft.adapters.JdbcColumnarInput().meta,
        Map("driver" -> driver, "query" -> "SELECT \"r_regionkey\" FROM region WHERE \"r_regionkey\" < 3")))
    assert(streams("q").count() == 3)
  }
}
