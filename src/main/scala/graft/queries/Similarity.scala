package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossHash.{duck, h}
import graft.io.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, 64-dim, ~unit-norm so dot ≈ cosine).
  *
  *  - `q_ann_topk`: brute-force top-k — the correctness baseline. The
  *    small query set is broadcast against the full candidate scan (no
  *    shuffle of the big side); ranking uses an exact DECIMAL dot product
  *    so cross-engine hashes match. At 100 TB the scan parallelizes
  *    per-partition and the per-query top-k is a windowed shuffle on
  *    query_id only.
  *  - `q_ann_lsh`: the scale path — 4 random-hyperplane sign bits
  *    (hash-derived, deterministic) bucket the vectors; top-k runs within
  *    the query's bucket only, turning the all-pairs scan into a
  *    bucket-equi-join. Recall is probabilistic; the baseline above
  *    measures it.
  *
  * Hyperplane weights are pseudo-random doubles derived from
  * [[graft.functions.CrossHash]]: w(j,i) = ((h(j#i) % 2001) - 1000)/1000.0,
  * identical in both engines, so even the LSH variant is hash-verified.
  */
object Similarity {

  /** Spark SQL: exact decimal dot product of two float arrays, via the
    * native codegen'd [[graft.functions.DecimalDot]] (bit-identical to
    * the HOF formulation — DecimalDotSpec — but one static loop instead
    * of interpreted per-element lambdas). */
  private def dot(a: String, b: String): String = s"dot_dec($a, $b)"

  private def duckDot(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, 64),
       |  i -> CAST(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) AS DECIMAL(28,12))))""".stripMargin

  /** Spark SQL: 4-bit random-hyperplane LSH bucket of `v`. */
  private def bucket(v: String): String =
    s"""aggregate(sequence(0, 3), 0, (acc, j) ->
       |  acc + (CASE WHEN aggregate(sequence(1, 64), cast(0 as double), (a2, i) ->
       |      a2 + (((${h("concat(cast(j as string), '#', cast(i as string))")} % 2001) - 1000) / 1000.0)
       |        * cast(element_at($v, i) as double)) >= 0
       |    THEN shiftleft(1, j) ELSE 0 END))""".stripMargin

  private def duckBucket(v: String): String =
    s"""list_sum(list_transform(generate_series(0, 3), j ->
       |  CASE WHEN list_reduce(list_transform(generate_series(1, 64),
       |      i -> (((${duck("j::VARCHAR || '#' || i::VARCHAR")} % 2001) - 1000) / 1000.0)
       |        * CAST($v[i] AS DOUBLE)), (x, y) -> x + y) >= 0
       |  THEN (1 << j) ELSE 0 END))::INT""".stripMargin

  val queries: Seq[Q] = Seq(

    // ---- brute-force top-10 by exact decimal dot ---------------------------
    Q(
      "q_ann_topk",
      s"""SELECT query_id, cand_id, rn, CAST(dot AS DOUBLE) AS dot FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    ${duckDot("q.embedding", "c.embedding")} AS dot,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY ${duckDot("q.embedding", "c.embedding")} DESC, c.vec_id) AS rn
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
        |) WHERE rn <= 10""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val scored = e.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
        .join(broadcast(q), col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"), expr(dot("q_emb", "c_emb")).as("dot"))
      scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("cand_id"))))
        .filter(col("rn") <= 10)
        .select(col("query_id"), col("cand_id"), col("rn"), col("dot").cast("double").as("dot"))
    },

    // ---- LSH-bucketed top-3 (the scale path) -------------------------------
    Q(
      "q_ann_lsh",
      s"""WITH bucketed AS (
        |  SELECT vec_id, embedding, ${duckBucket("embedding")} AS bucket FROM embeddings
        |)
        |SELECT query_id, cand_id, bucket, rn, CAST(dot AS DOUBLE) AS dot FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.bucket AS bucket,
        |    ${duckDot("q.embedding", "c.embedding")} AS dot,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY ${duckDot("q.embedding", "c.embedding")} DESC, c.vec_id) AS rn
        |  FROM bucketed q JOIN bucketed c
        |    ON q.bucket = c.bucket AND q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
        |) WHERE rn <= 3""".stripMargin) { (s, dir) =>
      // persist: the bucketed frame feeds both the query and candidate
      // sides, and the bucket HOF (4x64 hash-weights per row) is the
      // expensive part
      val bucketed = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), expr(bucket("embedding")).cast("int").as("bucket"))
        .persist()
      val q = bucketed.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("bucket"))
      val c = bucketed
        .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"), col("bucket").as("c_bucket"))
      c.join(broadcast(q), col("bucket") === col("c_bucket") && col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"), col("bucket"), expr(dot("q_emb", "c_emb")).as("dot"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("cand_id"))))
        .filter(col("rn") <= 3)
        .select(col("query_id"), col("cand_id"), col("bucket"), col("rn"), col("dot").cast("double").as("dot"))
    },

    // ---- IVF-style ANN: inverted file by nearest centroid ------------------
    // Deterministic "training-free" IVF: a fixed centroid subset
    // (vec_id % 50 == 7), every vector assigned to its nearest centroid
    // (exact decimal dot, ties to the lowest centroid id) — the
    // inverted-file cells. Queries probe only their own cell. At scale
    // the assignment is one broadcast-centroids map stage and the probe
    // a cell-equi-join — same shapes as production IVF with trained
    // centroids.
    Q(
      "q_ann_ivf",
      s"""WITH cents AS (
        |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id % 50 = 7
        |), assign AS (
        |  SELECT vec_id, embedding, c_id AS cell FROM (
        |    SELECT v.vec_id, v.embedding, c.c_id,
        |      row_number() OVER (PARTITION BY v.vec_id
        |        ORDER BY ${duckDot("v.embedding", "c.c_emb")} DESC, c.c_id) AS crn
        |    FROM embeddings v CROSS JOIN cents c
        |  ) WHERE crn = 1
        |)
        |SELECT query_id, cand_id, cell, rn, CAST(dot AS DOUBLE) AS dot FROM (
        |  SELECT q.vec_id AS query_id, x.vec_id AS cand_id, q.cell,
        |    ${duckDot("q.embedding", "x.embedding")} AS dot,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY ${duckDot("q.embedding", "x.embedding")} DESC, x.vec_id) AS rn
        |  FROM assign q JOIN assign x
        |    ON q.cell = x.cell AND q.vec_id % 100 = 0 AND q.vec_id <> x.vec_id
        |) WHERE rn <= 5""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val cents = e.filter(col("vec_id") % 50 === 7)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val assign = e
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("c_id"),
          expr(dot("embedding", "c_emb")).as("cdot"))
        .withColumn("crn", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("cdot").desc, col("c_id"))))
        .filter(col("crn") === 1)
        .select(col("vec_id"), col("embedding"), col("c_id").as("cell"))
        .persist() // assignment feeds both probe sides
      val q = assign.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cell"))
      assign
        .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb2"), col("cell").as("x_cell"))
        .join(broadcast(q), col("cell") === col("x_cell") && col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"), col("cell"),
          expr(dot("q_emb", "c_emb2")).as("dot"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("cand_id"))))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("cand_id"), col("cell"), col("rn"), col("dot").cast("double").as("dot"))
    },

    // ---- per-label embedding centroids (element-wise DECIMAL sums) ---------
    // vector aggregation without float-sum nondeterminism: posexplode
    // the vectors, sum each (label, dim) in DECIMAL — one shuffle on
    // (label, dim), map-side combined. Divide by cnt downstream for the
    // mean when needed.
    Q(
      "q_label_centroids",
      """SELECT label, dim,
        |  CAST(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,8))) AS DECIMAL(28,8)) AS DOUBLE) AS csum,
        |  count(*) AS cnt
        |FROM (SELECT label, i - 1 AS dim, embedding[i] AS x
        |      FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i))
        |GROUP BY label, dim""".stripMargin) { (s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim"))
        .agg(
          // float->decimal via double: Spark's direct float cast goes
          // through the float's short toString and rounds differently
          sum(col("x").cast("double").cast("decimal(18,8)")).cast("decimal(28,8)").cast("double").as("csum"),
          count(lit(1)).as("cnt"))
    })
}
