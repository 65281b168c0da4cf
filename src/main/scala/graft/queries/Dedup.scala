package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.CrossHash.{duck, h}
import graft.io.Tables

/** Deduplication suite over `documents` / `embeddings` — the operators a
  * training-data pipeline runs at corpus scale, each with the
  * shuffle-shape it would need at 100 TB:
  *
  *  - exact: one hash-groupBy (map-side partial agg, single shuffle);
  *  - MinHash+LSH: shingle → 16-perm signature → 4 band keys → shuffle on
  *    band key only (candidates, tiny), verify Jaccard on the candidate
  *    join — never all-pairs;
  *  - SimHash: 60-bit signature in one map stage; candidate pairs via
  *    4×15-bit band blocking (guaranteed recall for hamming ≤ 3, high
  *    recall to 5), hamming verify on candidates;
  *  - n-gram Jaccard: language-blocked pair verify (demonstrates the
  *    verify kernel; LSH above is the candidate generator at scale);
  *  - embedding cosine near-dup: label-blocked pairs with an exact
  *    DECIMAL dot product (order-independent, hash-comparable).
  *
  * All signatures are computed with builtin HOFs (transform/aggregate/
  * array_min) so the whole signature stage is WholeStageCodegen'd; every
  * query is oracle-checked value-for-value against DuckDB.
  */
object Dedup {

  private val tokens = "split(trim(text), '\\\\s+')"
  private val duckTokens = raw"regexp_split_to_array(trim(text), '\s+')"

  /** Spark: word-3-gram shingle set. */
  private val shingles =
    s"array_distinct(transform(sequence(1, size(w)-2), i -> concat_ws(' ', element_at(w,i), element_at(w,i+1), element_at(w,i+2))))"
  private val duckShingles =
    "list_distinct(list_transform(generate_series(1, len(w)-2), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"

  val queries: Seq[Q] = Seq(

    // ---- exact dedup: hash-groupBy, keep lowest doc_id ---------------------
    Q(
      "q_dedup_exact",
      s"""SELECT fp, count(*) AS cnt, min(doc_id) AS keep_id
        |FROM (SELECT doc_id, ${duck("lower(text)")} AS fp FROM documents)
        |GROUP BY fp""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), expr(h("lower(text)")).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_id"))
    },

    // ---- MinHash + LSH near-dup pairs --------------------------------------
    Q(
      "q_dedup_minhash_lsh",
      raw"""WITH tok AS (
        |  SELECT doc_id, $duckTokens AS w FROM documents
        |), sh AS (
        |  SELECT doc_id, $duckShingles AS shingles FROM tok WHERE len(w) >= 3
        |), mh AS (
        |  SELECT doc_id, shingles,
        |    list_transform(generate_series(0, 15),
        |      i -> list_min(list_transform(shingles,
        |        s -> ${duck("i::VARCHAR || '#' || s")}))) AS sig
        |  FROM sh
        |), bands AS (
        |  SELECT doc_id, b,
        |    md5(sig[b*4+1]::VARCHAR || ',' || sig[b*4+2]::VARCHAR || ',' ||
        |        sig[b*4+3]::VARCHAR || ',' || sig[b*4+4]::VARCHAR) AS bk
        |  FROM mh, unnest(generate_series(0, 3)) AS t(b)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        |  FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id
        |)
        |SELECT id_a, id_b,
        |  CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) /
        |  len(list_distinct(x.shingles || y.shingles)) AS jaccard
        |FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b
        |WHERE CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) /
        |      len(list_distinct(x.shingles || y.shingles)) >= 0.5""") { (s, dir) =>
      val sh = Tables(s, dir, "documents")
        .select(col("doc_id"), expr(tokens).as("w"))
        .filter(expr("size(w) >= 3"))
        .select(col("doc_id"), expr(shingles).as("shingles"))
      val mh = sh.select(
        col("doc_id"), col("shingles"),
        expr(s"""transform(sequence(0, 15),
                |  i -> array_min(transform(shingles,
                |    s -> ${h("concat(cast(i as string), '#', s)")})))""".stripMargin).as("sig"))
      val bands = mh
        .select(col("doc_id"), col("sig"), explode(expr("sequence(0, 3)")).as("b"))
        .select(
          col("doc_id"), col("b"),
          expr("""md5(cast(concat_ws('', cast(element_at(sig, b*4+1) as string), ',',
                 |  cast(element_at(sig, b*4+2) as string), ',',
                 |  cast(element_at(sig, b*4+3) as string), ',',
                 |  cast(element_at(sig, b*4+4) as string)) as binary))""".stripMargin).as("bk"))
      val cand = bands.as("a")
        .join(bands.as("c"), expr("a.b = c.b and a.bk = c.bk and a.doc_id < c.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("c.doc_id").as("id_b"))
        .distinct()
      cand
        .join(sh.select(col("doc_id"), col("shingles").as("sh_a")), col("doc_id") === col("id_a"))
        .drop("doc_id")
        .join(sh.select(col("doc_id"), col("shingles").as("sh_b")), col("doc_id") === col("id_b"))
        .drop("doc_id")
        .select(
          col("id_a"), col("id_b"),
          expr("cast(size(array_intersect(sh_a, sh_b)) as double) / size(array_union(sh_a, sh_b))")
            .as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    },

    // ---- SimHash signatures + band-blocked hamming pairs -------------------
    Q(
      "q_dedup_simhash", {
        val duckSim =
          s"""list_sum(list_transform(generate_series(0, 59), b ->
             |  CASE WHEN list_sum(list_transform(w, t ->
             |    CASE WHEN ((${duck("t")} >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
             |  THEN (1::BIGINT << b) ELSE 0 END))::BIGINT""".stripMargin
        raw"""WITH sh AS (
          |  SELECT doc_id, $duckSim AS simhash
          |  FROM (SELECT doc_id, $duckTokens AS w FROM documents)
          |), bands AS (
          |  SELECT doc_id, simhash, b, (simhash >> (b*15)) & 32767 AS bk
          |  FROM sh, unnest(generate_series(0, 3)) AS t(b)
          |), cand AS (
          |  SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sim_a,
          |                  c.doc_id AS id_b, c.simhash AS sim_b
          |  FROM bands a JOIN bands c ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id
          |)
          |SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
          |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 5""".stripMargin
      }) { (s, dir) =>
      val sim = Tables(s, dir, "documents")
        .select(col("doc_id"), expr(tokens).as("w"))
        .select(
          col("doc_id"),
          expr(s"""aggregate(sequence(0, 59), cast(0 as bigint), (acc, b) ->
                  |  acc + (CASE WHEN aggregate(w, 0, (a2, t) ->
                  |    a2 + (CASE WHEN (shiftright(${h("t")}, b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
                  |  THEN shiftleft(cast(1 as bigint), b) ELSE cast(0 as bigint) END))""".stripMargin)
            .as("simhash"))
      val bands = sim
        .select(col("doc_id"), col("simhash"), explode(expr("sequence(0, 3)")).as("b"))
        .withColumn("bk", expr("shiftright(simhash, b*15) & 32767"))
      bands.as("a")
        .join(bands.as("c"), expr("a.b = c.b and a.bk = c.bk and a.doc_id < c.doc_id"))
        .select(
          col("a.doc_id").as("id_a"), col("a.simhash").as("sim_a"),
          col("c.doc_id").as("id_b"), col("c.simhash").as("sim_b"))
        .distinct()
        .filter(expr("bit_count(sim_a ^ sim_b) <= 5"))
        .select(col("id_a"), col("id_b"), expr("cast(bit_count(sim_a ^ sim_b) as int)").as("hamming"))
    },

    // ---- n-gram Jaccard verify kernel (language-blocked pairs) -------------
    Q(
      "q_dedup_ngram_jaccard",
      raw"""WITH sh AS (
        |  SELECT doc_id, lang, $duckShingles AS shingles
        |  FROM (SELECT doc_id, lang, $duckTokens AS w FROM documents) WHERE len(w) >= 3
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |  len(list_distinct(a.shingles || b.shingles)) AS jaccard
        |FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |      len(list_distinct(a.shingles || b.shingles)) >= 0.3""") { (s, dir) =>
      val sh = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), expr(tokens).as("w"))
        .filter(expr("size(w) >= 3"))
        .select(col("doc_id"), col("lang"), expr(shingles).as("shingles"))
      sh.as("a")
        .join(sh.as("b"), expr("a.lang = b.lang and a.doc_id < b.doc_id"))
        .select(
          col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          expr("cast(size(array_intersect(a.shingles, b.shingles)) as double) / size(array_union(a.shingles, b.shingles))")
            .as("jaccard"))
        .filter(col("jaccard") >= 0.3)
    },

    // ---- embedding cosine near-dup (label-blocked, exact DECIMAL dot) ------
    Q(
      "q_dedup_embedding",
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_sum(list_transform(generate_series(1, 64),
        |    i -> CAST(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
        |         AS DECIMAL(28,12)))) AS dot
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(generate_series(1, 64),
        |    i -> CAST(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
        |         AS DECIMAL(28,12)))) >= 0.35""") { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val dot =
        """aggregate(zip_with(a.embedding, b.embedding,
          |  (x, y) -> cast(cast(x as double) * cast(y as double) as decimal(28,12))),
          |  cast(0 as decimal(28,12)), (acc, v) -> cast(acc + v as decimal(28,12)))""".stripMargin
      e.as("a")
        .join(e.as("b"), expr("a.label = b.label and a.vec_id < b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), expr(dot).as("dot"))
        .filter(col("dot") >= 0.35)
    })
}
