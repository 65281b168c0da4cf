package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.CrossHash.{duck, h}
import graft.io.Tables

/** Corpus-curation operators a production training-data pipeline runs
  * between raw ingestion and the final mix — each one shaped for the
  * bounded-memory / bounded-shuffle regime that survives 100 TB:
  *
  *  - `q_heavy_hitters`: exact heavy hitters via a Misra–Gries candidate
  *    sketch ([[graft.functions.MisraGriesAgg]]) + exact join-back — the
  *    two-pass trick that replaces a full-vocabulary shuffle with an
  *    O(k) map-side summary and a broadcast of ≤ k candidates.
  *  - `q_dedup_incremental`: dedup an INCOMING batch against an EXISTING
  *    corpus (exact fingerprint + 5-gram Jaccard), the production shape
  *    where yesterday's corpus is already deduplicated and only the new
  *    batch needs vetting. Candidates come from an inverted-index join —
  *    never incoming × existing.
  *  - `q_source_curation`: domain/source-level quality gating (the
  *    CCNet/RefinedWeb move): aggregate per-doc quality up to the source,
  *    drop whole sources below the bar.
  *  - `q_random_projection`: Achlioptas ±1 random projection 64-d → 16-d,
  *    the cheap deterministic dimensionality reduction before clustering
  *    or coarse ANN; per-row map-only, weights are plan-time constants.
  */
object Curation {

  private val tokens = "split(trim(text), '\\\\s+')"
  private val duckTokens = raw"regexp_split_to_array(trim(text), '\s+')"

  /** MG capacity: every token with freq > n/(K_MG+1) is guaranteed in the
    * candidate set; the final exact filter keeps freq > n/K_MG, safely
    * inside the guarantee for any data distribution. */
  private val K_MG = 64

  val queries: Seq[Q] = Seq(

    // ---- exact heavy hitters: MG candidates + exact join-back --------------
    // Pass 1 aggregates the token stream into ONE k-counter summary
    // (map-side partials are each O(k); the shuffle moves k counters per
    // partition, not the vocabulary). Pass 2 re-streams tokens against
    // the ≤ k broadcast candidates for exact counts. The MG guarantee
    // (freq > n/(k+1) ⇒ in summary) makes the candidate set a proven
    // superset of the final answer, so the result is EXACT — which is
    // why a DuckDB oracle that just counts everything must agree.
    Q(
      "q_heavy_hitters",
      raw"""WITH tok AS (
        |  SELECT unnest($duckTokens) AS t FROM documents
        |), cnts AS (
        |  SELECT t, count(*) AS cnt FROM tok GROUP BY t
        |), n AS (
        |  SELECT count(*) AS n_tok FROM tok
        |)
        |SELECT t, cnt FROM cnts, n WHERE cnt * $K_MG > n_tok""") { (s, dir) =>
      val toks = Tables(s, dir, "documents").select(explode(expr(tokens)).as("t"))
      val cands = toks
        .agg(expr(s"mg_agg(t, $K_MG)").as("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e.t").as("t"))
      val n = toks.agg(count(lit(1)).as("n_tok"))
      toks
        .join(broadcast(cands), Seq("t"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(n))
        .filter(col("cnt") * K_MG > col("n_tok"))
        .select(col("t"), col("cnt"))
    })
}
