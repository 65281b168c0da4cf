package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed or low-cardinality keys — the pattern the
  * dedup/similarity self-joins use inline
  * ([[graft.queries.Dedup]] embedding near-dup blocks on ~10 labels),
  * exposed as a reusable operator.
  *
  * A plain shuffle join on a key with few distinct values (or a few hot
  * ones) lands each key's entire volume on one reducer: parallelism is
  * capped at the key cardinality no matter the cluster size. Salting
  * splits the left side into `salts` deterministic buckets and
  * replicates the right side into all of them, so the shuffle key
  * `(key, salt)` spreads every hot key over `salts` reducers. Cost:
  * `salts`× replication of the right side — use with the smaller side
  * right, and prefer AQE's skew-join handling when only a FEW keys are
  * hot (it splits post-hoc without replication); salting is the tool
  * when the WHOLE key space is narrow.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `keys`, salted `salts`
    * ways. `saltOn` must be a left-side column expression that varies
    * within a key group (a unique id is ideal): the salt is
    * `pmod(hash(saltOn), salts)`, so the split is deterministic across
    * runs and partitionings. */
  def salted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltOn: Column,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val l = left.withColumn("__salt", pmod(hash(saltOn), lit(salts)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
