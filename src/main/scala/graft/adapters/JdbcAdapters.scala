package graft.adapters

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC columnar adapters, capability-parity with the reference
  * `jdbcColumnar` verbs (datacooker-jdbc/.../JdbcColumnarInput.java:27-77,
  * JdbcColumnarOutput.java:26-148), re-expressed on `spark.read.jdbc` /
  * `df.write.jdbc` so Spark generates per-partition range predicates,
  * pushes projection into the remote query, and batches inserts.
  *
  * Parallel-read semantics: the reference binds two `?` placeholders per
  * partition to `[i, partCount)` ranges of a user query. Spark's native
  * equivalent is `partitionColumn/lowerBound/upperBound/numPartitions`
  * (range split on a numeric column) — declared here as
  * `partition_column`/`lower_bound`/`upper_bound`. Without them the read
  * is single-partition (same as the reference with part_count=1).
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
      ParamDef("query", "SELECT to execute (wrapped as a derived table)"),
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
    val table = (conf.str("query"), conf.str("table")) match {
      case (Some(q), _) => s"($q) graft_src"
      case (_, Some(t)) => t
      case _ => throw new IllegalArgumentException("jdbcColumnar needs 'query' or 'table'")
    }
    var reader = spark.read.format("jdbc")
      .option("url", path)
      .option("driver", conf.str("driver").get)
      .option("dbtable", table)
    conf.str("user").foreach(u => reader = reader.option("user", u))
    conf.str("password").foreach(p => reader = reader.option("password", p))
    (conf.str("partition_column"), conf.str("lower_bound"), conf.str("upper_bound")) match {
      case (Some(c), Some(lo), Some(hi)) if partCount > 0 =>
        reader = reader
          .option("partitionColumn", c)
          .option("lowerBound", lo)
          .option("upperBound", hi)
          .option("numPartitions", partCount)
      case _ => ()
    }
    ListMap(name -> reader.load())
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
