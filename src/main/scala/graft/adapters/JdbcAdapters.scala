package graft.adapters

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC columnar adapters, capability-parity with the reference
  * `jdbcColumnar` verbs (datacooker-jdbc/.../JdbcColumnarInput.java:27-77,
  * JdbcColumnarOutput.java:26-148), re-expressed on `spark.read.jdbc` /
  * `df.write.jdbc` so Spark generates per-partition range predicates,
  * pushes projection into the remote query, and batches inserts.
  *
  * Parallel-read semantics, both of them:
  *  - the reference's own mode (JdbcColumnarInput.java:62-77): the user
  *    query carries two `?` placeholders and each of `part_count`
  *    partitions binds them to its part index — supported here when the
  *    `query` contains `?`s, as one single-partition derived-table scan
  *    per part index, unioned (the union keeps one Spark partition per
  *    part, so the N remote SELECTs run concurrently in one stage);
  *  - Spark's native `partitionColumn/lowerBound/upperBound/numPartitions`
  *    range split on a numeric column — declared as
  *    `partition_column`/`lower_bound`/`upper_bound` (no placeholders
  *    needed, and the remote DB sees sargable range predicates).
  * Without either the read is single-partition (same as the reference
  * with part_count=1).
  */
final class JdbcColumnarInput extends InputAdapter {
  val meta: AdapterMeta = AdapterMeta(
    "jdbcColumnar",
    "Parallel SELECT from a JDBC source, one range-predicate per partition",
    Seq("jdbc:postgresql://host:5432/db", "jdbc:derby:memory:db"),
    Seq(
      ParamDef("driver", "JDBC driver class FQN", required = true),
      ParamDef("user", "Connection user"),
      ParamDef("password", "Connection password"),
      ParamDef("query",
        "SELECT to execute (wrapped as a derived table); two ? placeholders " +
          "bind each partition's part index, 0 to part_count-1"),
      ParamDef("table", "Table to read (alternative to query)"),
      ParamDef("partition_column", "Numeric column to range-split on"),
      ParamDef("lower_bound", "Partitioning lower bound"),
      ParamDef("upper_bound", "Partitioning upper bound")))

  def load(
      spark: SparkSession,
      path: String,
      name: String,
      partCount: Int,
      conf: AdapterConf): ListMap[String, DataFrame] = {
    def reader(table: String) = {
      var r = spark.read.format("jdbc")
        .option("url", path)
        .option("driver", conf.str("driver").get)
        .option("dbtable", table)
      conf.str("user").foreach(u => r = r.option("user", u))
      conf.str("password").foreach(p => r = r.option("password", p))
      r
    }
    val df = (conf.str("query"), conf.str("table")) match {
      case (Some(q), _) if q.contains("?") =>
        // reference placeholder mode (JdbcColumnarInput.java:62-77): two ?
        // per partition, bound to the part index. Textual substitution of
        // an integer literal is value-equivalent to the reference's
        // PreparedStatement.setLong on the same spot.
        val pieces = q.split("\\?", -1)
        require(pieces.length == 3,
          s"jdbcColumnar: a placeholder query needs exactly two ?, got ${pieces.length - 1}")
        val parts = math.max(partCount, 1)
        (0 until parts)
          .map(i => reader(s"(${pieces(0)}$i${pieces(1)}$i${pieces(2)}) graft_part_$i").load())
          .reduce(_.union(_))
      case (q, t) if q.orElse(t).isDefined =>
        var r = reader(q.map(s => s"($s) graft_src").getOrElse(t.get))
        (conf.str("partition_column"), conf.str("lower_bound"), conf.str("upper_bound")) match {
          case (Some(c), Some(lo), Some(hi)) if partCount > 0 =>
            r = r.option("partitionColumn", c)
              .option("lowerBound", lo)
              .option("upperBound", hi)
              .option("numPartitions", partCount)
          case _ => ()
        }
        r.load()
      case _ => throw new IllegalArgumentException("jdbcColumnar needs 'query' or 'table'")
    }
    ListMap(name -> df)
  }
}

final class JdbcColumnarOutput extends OutputAdapter {
  val meta: AdapterMeta = AdapterMeta(
    "jdbcColumnar",
    "Batched INSERTs into a JDBC table, one connection per partition",
    Seq("jdbc:postgresql://host:5432/db", "jdbc:derby:memory:db"),
    Seq(
      ParamDef("driver", "JDBC driver class FQN", required = true),
      ParamDef("user", "Connection user"),
      ParamDef("password", "Connection password"),
      ParamDef("table", "Destination table (defaults to the stream sub-name)"),
      ParamDef("batch_size", "INSERT batch size", Some(500)),
      ParamDef("mode", "SaveMode: append/overwrite/errorifexists", Some("append")),
      ParamDef("columns", "Columns to write; '_' skips a column")))

  def save(subName: String, df: DataFrame, path: String, conf: AdapterConf): Unit = {
    val table = conf.str("table").orElse(Option(subName).filter(_.nonEmpty)).getOrElse(
      throw new IllegalArgumentException("jdbcColumnar output needs 'table' or a stream name"))
    var writer = HadoopFiles.selectColumns(df, conf).write.format("jdbc")
      .option("url", path)
      .option("driver", conf.str("driver").get)
      .option("dbtable", table)
      // reference default batch size 500 (JdbcColumnarOutput.java:49-50)
      .option("batchsize", conf.int("batch_size", 500))
      .mode(SaveMode.valueOf(conf.str("mode", "append").toLowerCase.capitalize match {
        case "Errorifexists" => "ErrorIfExists"
        case m => m
      }))
    conf.str("user").foreach(u => writer = writer.option("user", u))
    conf.str("password").foreach(p => writer = writer.option("password", p))
    writer.save()
  }
}
