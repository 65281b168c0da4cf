package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.io.{CacheScope, Sessions}

/** Scale-slope harness (VERDICT r12 #2): every green number in the
  * correctness/bench gates is a single scale factor, which is exactly
  * how the round-10 fixed-16-cell O(N²) SemDeDup bug stayed invisible —
  * at one SF a quadratic kernel just looks "a bit slow". This harness
  * measures the heaviest candidate-generation kernels at 1×/4×/16× of a
  * base corpus and asserts the log-log runtime slope between 4× and 16×
  * is sub-quadratic.
  *
  * Corpus construction (under `target/`, never touching the test data):
  * scale k = k perturbed copies of the base `documents`/`embeddings`.
  * Copies must NOT be near-duplicates of each other — identical copies
  * would grow every duplicate cluster k-fold and the PAIR OUTPUT itself
  * would be quadratic in k, drowning the implementation slope in data
  * slope. Texts get a copy-suffix on every token (cross-copy Jaccard 0,
  * within-copy structure identical to the base corpus); embeddings get
  * a copy-keyed pseudo-random sign flip per dimension (norms and
  * within-copy geometry preserved, cross-copy cosine ~0). The dup/near-
  * dup RATE is therefore constant across scales — the corpus grows the
  * way a real crawl grows.
  *
  * Usage: `runMain graft.runner.ScaleSlope [baseDir] [workDir]`
  * (defaults /root/testdata/sf0.1, target/scale_slope). Prints one JSON
  * line per kernel plus a summary, writes `docs/scale_slope.json`, and
  * exits non-zero if any kernel's high-end slope ≥ [[MaxSlope]].
  */
object ScaleSlope {

  /** Gate: slope log(t16/t4)/log(4) must stay below this. Quadratic
    * work shows as ~2.0; linear-with-constant-overhead lands well under
    * 1.5. 1.9 leaves room for ambient load noise on a shared box. */
  final val MaxSlope = 1.9

  /** The heaviest candidate-generation / iterative kernels — the ones
    * whose asymptotics an SF change could silently break. */
  final val Kernels: Seq[String] = Seq(
    "q_dedup_ngram_capped",
    "q_dedup_prefix_join",
    "q_dedup_substring",
    "q_dedup_semantic_clusters",
    "q_dedup_minhash_lsh",
    "q_dedup_embedding",
    "q_ivf_pruned_assign",
    "q_ann_ivf", // the production corpus-derived switch path (flat below |C|=8192)
    "q_classifier_train")

  final val Scales = Seq(1, 4, 16)

  private def buildScaled(s: SparkSession, base: String, dir: String, k: Int): Unit = {
    val docs = s.read.parquet(s"$base/documents.parquet")
    val embs = s.read.parquet(s"$base/embeddings.parquet")
    val docCopies = (0 until k).map { c =>
      val text =
        if (c == 0) col("text")
        // suffix every token: within-copy token statistics identical to
        // the base corpus, cross-copy shingle/token overlap zero
        else regexp_replace(col("text"), "(\\S+)", "$1_" + c)
      docs.select(
        (col("doc_id") + lit(c * 1_000_000_000L)).as("doc_id"),
        text.as("text"), col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }
    docCopies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val embCopies = (0 until k).map { c =>
      val emb =
        if (c == 0) col("embedding")
        // copy-keyed pseudo-random sign flip per dim: norms and
        // within-copy angles unchanged, cross-copy cosine ~0
        else expr(s"transform(embedding, (x, i) -> case when " +
          s"pmod((cast(i as bigint) + 1) * 2654435761 * $c, 97) < 48 then -x else x end)")
      embs.select(
        (col("vec_id") + lit(c * 1_000_000_000L)).as("vec_id"),
        emb.cast("array<float>").as("embedding"), col("label"))
    }
    embCopies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def timeOnce(s: SparkSession, q: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(s, dir).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    CacheScope.releaseAll()
    sec
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "target/scale_slope"
    val spark = Sessions.local("graft-scale-slope",
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors().toString))

    for (k <- Scales) {
      System.err.println(s"[scale-slope] building ${k}x corpus")
      buildScaled(spark, base, s"$work/x$k", k)
    }
    // one cheap warmup per scale dir to absorb codegen/JIT and register
    // the table frames before anything is timed
    for (k <- Scales)
      SparkEntry.queries("q_text_stats")(spark, s"$work/x$k")
        .write.format("noop").mode("overwrite").save()

    val results = Kernels.map { q =>
      val times = Scales.map { k =>
        val sec = timeOnce(spark, q, s"$work/x$k")
        System.err.println(f"[scale-slope] $q ${k}x: $sec%.2fs")
        k -> sec
      }.toMap
      val slopeFull = math.log(times(16) / times(1)) / math.log(16.0)
      val slopeHi = math.log(times(16) / times(4)) / math.log(4.0)
      (q, times, slopeFull, slopeHi)
    }

    val sb = new StringBuilder
    sb.append("{\"base\":\"").append(base).append("\",\"max_slope\":")
      .append(MaxSlope).append(",\"kernels\":{")
    sb.append(results.map { case (q, t, sf, sh) =>
      f""""$q":{"t1":${t(1)}%.3f,"t4":${t(4)}%.3f,"t16":${t(16)}%.3f,""" +
        f""""slope_full":$sf%.3f,"slope_hi":$sh%.3f,"ok":${sh < MaxSlope}}"""
    }.mkString(","))
    val bad = results.filter(_._4 >= MaxSlope).map(_._1)
    sb.append("},\"failed\":[").append(bad.map("\"" + _ + "\"").mkString(",")).append("]}")
    val json = sb.toString
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("docs/scale_slope.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (bad.nonEmpty) {
      System.err.println(s"[scale-slope] SUPER-LINEAR-SQUARED kernels: ${bad.mkString(", ")}")
      sys.exit(1)
    }
  }
}
