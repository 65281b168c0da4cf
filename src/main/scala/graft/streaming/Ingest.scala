package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed streaming INGEST tier as a config-addressable registry
  * (round 16): the four individually batch-twin-gated ingest operators
  * — quality score → near-dedup claim → contamination gate → IVFADC
  * encode — exposed by NAME so a `"streaming": true` [[graft.config
  * .DistTask]] chain can run the whole tier through
  * [[graft.runner.DistMain]] (files in → gated/encoded parquet out via
  * `Trigger.AvailableNow`, each stage incrementally checkpointed).
  *
  * Stage contracts (a direction chains them through directories — the
  * production shape, where every tier persists its ledger):
  *
  *  - `score`: input (doc_id, text, ...) — adds `score`/`cls_flag`
  *    under the TRAINED hashed-linear model ([[Streams.scoreDocs]])
  *    and KEEPS only `cls_flag = 'keep'` rows, all columns passed
  *    through — the quality gate.
  *  - `dedup_claim`: input (doc_id, text, ...) — emits the near-dup
  *    claim LEDGER (bucket, doc_id, keeper_id) via [[Streams
  *    .nearDedup]]; a doc with any `keeper_id != doc_id` claim is a
  *    candidate for the batch confirm join (the prefilter/confirm
  *    split — the ledger is the stage output, by design).
  *  - `gate_contaminated`: input (doc_id, text, ...) — probes the
  *    offline-trained eval bloom ([[Streams.contaminationHits]]),
  *    adds `n_candidates`, and KEEPS only clean rows (flagged docs go
  *    to the batch confirm join), all columns passed through.
  *  - `encode_ivfadc`: input (doc_id | vec_id, embedding, ...) — the
  *    serving-tier add() path ([[Streams.encodeIvfadc]]): one
  *    (vec_id, cell, m, code) row per (vector, subspace).
  *  - `apply_claims`: the composition the dedup_claim split implies
  *    (round 17): input (doc_id, ...) — the stage's `model_dir` points
  *    at the CLAIMS LEDGER directory a dedup_claim stage wrote, and
  *    every doc the ledger marks a loser (any claim with
  *    `keeper_id != doc_id`) is dropped via a stream-static LEFT ANTI
  *    join, all other columns passed through — so a 5-stage direction
  *    (score → dedup_claim → gate → apply_claims → encode) yields the
  *    DEDUPLICATED stream from config alone. The static side is read
  *    at query start; under `Trigger.AvailableNow` the direction runs
  *    stages in order, so the ledger is complete before this stage
  *    starts. Prefilter semantics by design (the candidate tier's
  *    keep/drop — exact confirm stays a batch concern).
  *  - `dedup_simhash_claim`: input (doc_id, text, ...) — the
  *    EXACT-recall twin of `dedup_claim` (round 17): the claim ledger
  *    comes from [[Streams.simhashBlocksDedup]] (block-combination
  *    keys, can never miss a hamming-≤5 pair where the banded MinHash
  *    prefilter is probabilistic); same (bucket, doc_id, keeper_id)
  *    schema, so `apply_claims` consumes either ledger unchanged. No
  *    offline model (the media_dedup rule).
  *  - `dsir_score`: input (doc_id, text, ...) — adds
  *    `n_feats`/`dsir_weight` under the TRAINED per-bucket DSIR
  *    log-ratio table ([[graft.queries.Curation.dsirModel]]),
  *    annotate-only (selection is a GLOBAL Gumbel top-k rank — a batch
  *    concern by design), all columns passed through.
  *  - `encode_unigram`: input (doc_id, text, ...) — adds
  *    `n_words`/`n_pieces`/`n_chars_alpha` under the TRAINED
  *    unigram-LM piece table ([[graft.queries.Bpe.unigramModel]]) —
  *    the online tokenizer-encode tier; annotate-only, all columns
  *    passed through.
  *  - `extract_html`: input (doc_id, html, ...) — the crawl FRONT
  *    END (round 18): the q_html_extract tag-strip chain replaces
  *    `html` with the extracted `text` (+ `n_tags`), so a direction
  *    can start from raw markup (extract_html → langid → score → ...).
  *    Stateless map; boilerplate-line removal stays a batch concern
  *    (corpus-wide line df). No offline model.
  *  - `langid`: input (doc_id, text, ...) — adds `lang_predicted`
  *    under the TRAINED character-trigram model
  *    ([[graft.queries.LangId.trainedModel]]); annotate-only, one
  *    native loop per row.
  *  - `url_dedup_claim`: input (doc_id, url | norm, ...) — the exact
  *    URL dedup claim LEDGER on the CrossHash of the normalized url
  *    (round 20, VERDICT r19 #2): the stage between url_filter and
  *    extract_html, so refetches are flagged before the content tier
  *    runs; same (bucket, doc_id, keeper_id) schema, so apply_claims
  *    consumes it unchanged. `horizon_ms` bounds state and re-admits
  *    a url once per horizon (recrawl). No offline model (the
  *    media_dedup rule).
  *  - `media_dedup`: input the MediaRecord schema (media_id, kind,
  *    payload, meta) — real decode + dHash + hamming-ball probe-key
  *    claims ([[Streams.mediaDedup]]), the q_media_dedup candidate
  *    tier (exact at radius 2); no offline model (the perceptual hash
  *    is the model, `model_dir` is unused but still required by the
  *    task shape).
  *
  * Models resolve from the task's `model_dir` in two ways (round 20,
  * [[graft.io.ModelStore]]): an EXPORTED ARTIFACT directory (stamped
  * by the `model_export` batch task) loads the persisted model —
  * train once offline, ship the artifact, restart without retraining,
  * bit-identical output (DistPipelineSpec round-trip gate) — while a
  * raw corpus directory trains on demand as before. Either way the
  * trainers cache per (session, dir), so a multi-stage chain resolves
  * each model once. */
object Ingest {

  val ops: Seq[String] =
    Seq("score", "dedup_claim", "gate_contaminated", "encode_ivfadc",
      "apply_claims", "media_dedup", "dedup_simhash_claim", "dsir_score",
      "encode_unigram", "extract_html", "langid", "url_filter",
      "url_dedup_claim")

  def apply(
      spark: SparkSession, op: String, modelDir: String, df: DataFrame,
      horizonMs: Option[Long] = None, lateness: String = "0 seconds"): DataFrame =
    op match {
      case "score" =>
        Streams.scoreDocs(df, graft.queries.TextAnalysis.trainedWeights(spark, modelDir))
          .filter(col("cls_flag") === "keep")
      case "dedup_claim" =>
        Streams.nearDedup(df, horizonMs, lateness).toDF()
      case "dedup_simhash_claim" =>
        // the EXACT-recall (hamming <= 5) claim ledger — same schema
        // and downstream contract as dedup_claim, so apply_claims
        // consumes either ledger unchanged; no offline model (B is the
        // horizon constant, model_dir unused but required by the task
        // shape, the media_dedup rule)
        Streams.simhashBlocksDedup(df, horizonMs = horizonMs, lateness = lateness).toDF()
      case "encode_unigram" =>
        // online tokenizer encode under the offline-trained unigram-LM
        // piece table — annotate-only, all columns pass through
        Streams.unigramEncode(df, graft.queries.Bpe.unigramModel(spark, modelDir))
      case "url_dedup_claim" =>
        // exact URL dedup claim ledger on the NORMALIZED url (round
        // 20, VERDICT r19 #2) — the stage between url_filter and
        // extract_html that stops refetches reaching the expensive
        // content tier; consumes url_filter's stamped `norm` (or
        // re-parses a raw `url` column), same ledger schema as
        // dedup_claim so apply_claims composes unchanged. No offline
        // model (the media_dedup rule: model_dir required by the task
        // shape, unused).
        Streams.urlDedup(df, horizonMs, lateness).toDF()
      case "url_filter" =>
        // the crawl tier BEFORE extract_html: normalize + gate on the
        // URL string. The blocklist is DATA (round 20, VERDICT r19
        // #3): the task's `model_dir` corpus derives the host frame
        // (production points it at a real blocklist table), probed
        // stream-static. URL dedup composes as the downstream
        // url_dedup_claim stage on the stamped `norm` column.
        Streams.urlFilter(df,
          graft.queries.Url.blocklistFrame(spark, modelDir),
          graft.queries.Url.blocklistRows(spark, modelDir))
      case "extract_html" =>
        // the crawl FRONT END: tag-strip the html column to text (the
        // q_html_extract chain — a pure codegen'd map stage); no
        // offline model (the media_dedup rule: model_dir required by
        // the task shape, unused)
        Streams.extractHtml(df)
      case "langid" =>
        // annotate-only language ID under the TRAINED char-trigram
        // model (train offline from model_dir, score the stream online
        // through one native loop per row)
        Streams.langidAnnotate(df, graft.queries.LangId.trainedModel(spark, modelDir),
          graft.queries.LangId.langsOf(spark, modelDir))
      case "dsir_score" =>
        // annotate-only: DSIR selection is a GLOBAL rank (Gumbel
        // top-k), which a stream cannot do — the scorer stamps
        // n_feats/dsir_weight and the batch sampler downstream cuts
        Streams.dsirScore(df, graft.queries.Curation.dsirModel(spark, modelDir))
      case "gate_contaminated" =>
        df.withColumn("n_candidates",
            Streams.contaminationHits(spark,
              graft.queries.TextAnalysis.evalBloomBytes(spark, modelDir)))
          .filter(col("n_candidates") === 0)
      case "encode_ivfadc" =>
        val (cents, cb) = graft.queries.Similarity.ivfadcModel(spark, modelDir)
        val vecs =
          if (df.columns.contains("vec_id")) df
          else df.withColumnRenamed("doc_id", "vec_id")
        Streams.encodeIvfadc(vecs.select(col("vec_id"), col("embedding")), cents, cb)
      case "apply_claims" =>
        // model_dir = the dedup_claim ledger directory, read through
        // the first-arrival-wins merge-on-read view (claimView — one
        // row per claim key whether the ledger is freshly appended,
        // compacted, or legacy-flat); losers (any claim with an
        // earlier keeper) drop via a stream-static left anti join —
        // the static loser set is bounded by the claim ledger and
        // Spark broadcasts it when small
        val losers = Streams.claimView(spark, modelDir)
          .filter(col("keeper_id") =!= col("doc_id"))
          .select(col("doc_id")).distinct()
        df.join(losers, Seq("doc_id"), "left_anti")
      case "media_dedup" =>
        // input: the MediaRecord schema (media_id, kind, payload, meta);
        // no offline model — the perceptual hash is the model. Output is
        // the ball-key claim ledger (bucket, item_key, keeper_key), the
        // q_media_dedup candidate tier.
        import spark.implicits._
        horizonMs match {
          case Some(h) =>
            Streams.mediaDedupHorizon(
              df.select(col("media_id"), col("kind"), col("payload"),
                col("meta"), col("ts")), h, lateness).toDF()
          case None =>
            Streams.mediaDedup(
              df.select(col("media_id"), col("kind"), col("payload"), col("meta"))
                .as[graft.multimodal.Media.MediaRecord]).toDF()
        }
      case other =>
        throw new IllegalArgumentException(
          s"unknown ingest op '$other'; registered: ${ops.mkString(", ")}")
    }
}
