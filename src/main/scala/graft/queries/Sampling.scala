package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.CrossHash.{duck, h}
import graft.io.Tables

/** Deterministic sampling operators — the reproducible way to sample at
  * 100 TB. `df.sample()` is seed-stable only per partitioning, so a
  * training pipeline that must reproduce its corpus split across runs
  * (and across engines) keys the decision on a content hash instead:
  * every row carries its own sampling verdict, independent of partition
  * layout, executor count, or engine. All three operators are pure
  * map-stage filters — no shuffle beyond their final reporting
  * aggregation, and the filter composes with scan pushdown of every
  * other predicate.
  */
object Sampling {

  private val tokens = "split(trim(text), '\\\\s+')"
  private val duckTokens = raw"regexp_split_to_array(trim(text), '\s+')"

  val queries: Seq[Q] = Seq(

    // ---- 5% deterministic sample (hash-gated filter) -----------------------
    Q(
      "q_sample_hash",
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE ${duck("o_orderkey::VARCHAR")} % 100 < 5""") { (s, dir) =>
      Tables(s, dir, "orders")
        .filter(expr(s"${h("cast(o_orderkey as string)")} % 100 < 5"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // ---- 80/10/10 train/val/test split -------------------------------------
    // the split is a pure function of doc_id: adding machines, re-running,
    // or re-partitioning never moves a document between splits
    Q(
      "q_train_test_split",
      s"""SELECT split, count(*) AS cnt, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM (SELECT doc_id,
        |        CASE WHEN ${duck("doc_id::VARCHAR")} % 100 < 80 THEN 'train'
        |             WHEN ${duck("doc_id::VARCHAR")} % 100 < 90 THEN 'val'
        |             ELSE 'test' END AS split
        |      FROM documents)
        |GROUP BY split""") { (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          expr(s"""CASE WHEN ${h("cast(doc_id as string)")} % 100 < 80 THEN 'train'
                  |     WHEN ${h("cast(doc_id as string)")} % 100 < 90 THEN 'val'
                  |     ELSE 'test' END""".stripMargin).as("split"))
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("cnt"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
    },

    // ---- stratified sample: per-language 10% with per-stratum report -------
    Q(
      "q_stratified_sample",
      s"""SELECT lang, count(*) AS sampled, min(doc_id) AS min_id
        |FROM documents
        |WHERE ${duck("lang || '/' || doc_id::VARCHAR")} % 100 < 10
        |GROUP BY lang""") { (s, dir) =>
      Tables(s, dir, "documents")
        .filter(expr(s"${h("concat(lang, '/', cast(doc_id as string))")} % 100 < 10"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("sampled"), min(col("doc_id")).as("min_id"))
    },

    // ---- group-aware (leakage-free) split ----------------------------------
    // q_train_test_split keys the split on doc_id, which lets two
    // near-identical docs from the same domain land in train AND test —
    // the classic eval-leakage path. Keying the hash on the GROUP
    // (source/domain) puts every doc of a group in the same split BY
    // CONSTRUCTION: no cross-split leakage via intra-domain duplication,
    // still a pure map-stage decision reproducible on any engine.
    Q(
      "q_group_split",
      s"""SELECT split, count(DISTINCT source) AS n_sources, count(*) AS n_docs
        |FROM (SELECT source,
        |        CASE WHEN ${duck("'g#' || source")} % 100 < 80 THEN 'train'
        |             WHEN ${duck("'g#' || source")} % 100 < 90 THEN 'val'
        |             ELSE 'test' END AS split
        |      FROM documents)
        |GROUP BY split""") { (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          col("source"),
          expr(s"""CASE WHEN ${h("concat('g#', source)")} % 100 < 80 THEN 'train'
                  |     WHEN ${h("concat('g#', source)")} % 100 < 90 THEN 'val'
                  |     ELSE 'test' END""".stripMargin).as("split"))
        .groupBy(col("split"))
        .agg(
          countDistinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"))
    },

    // ---- data mixing: exact per-source quotas ------------------------------
    // The mixture-recipe operator: take EXACTLY n docs from each source,
    // chosen by content-hash rank so the pick is reproducible across
    // runs, partitionings, and engines (rate-based sampling above gives
    // binomial counts; recipes need exact ones). Per-source quota here
    // via a hash-ordered rank; at 100 TB compute the quota-th smallest
    // hash per source first (percentile/exact-rank pass) and filter —
    // two map stages, no giant per-source window.
    Q(
      "q_data_mix",
      s"""WITH ranked AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY ${duck("source || '#' || doc_id::VARCHAR")}, doc_id) AS rn
        |  FROM documents
        |), quota AS (
        |  SELECT * FROM (VALUES ('src0', 10), ('src1', 5), ('src2', 20)) q(src, n)
        |)
        |SELECT source, count(*) AS picked, min(doc_id) AS first_pick, max(doc_id) AS last_pick
        |FROM ranked JOIN quota ON source = quota.src AND rn <= quota.n
        |GROUP BY source""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val quotas = Seq(("src0", 10), ("src1", 5), ("src2", 20)).toDF("src", "n")
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          expr(h("concat(source, '#', cast(doc_id as string))")).as("hv"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("hv"), col("doc_id"))))
        .join(broadcast(quotas), col("source") === col("src") && col("rn") <= col("n"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("picked"),
          min(col("doc_id")).as("first_pick"), max(col("doc_id")).as("last_pick"))
    },

    // ---- token-budget source mixture ----------------------------------------
    // q_data_mix fills DOCUMENT quotas; real training mixes are specified
    // in TOKENS (a 30B-token recipe says "2B from web, 0.5B from code"),
    // and doc counts are a bad proxy when length distributions differ by
    // source. Same deterministic content-hash rank order, but the keep
    // rule is a running token cumsum ≤ the source's token budget: the
    // first doc that would overflow ends the prefix (budget-sized holes
    // are never backfilled with later shorter docs — the rank order IS
    // the reproducibility contract, so the prefix must be contiguous).
    // One window cumsum per source partition over exact integer token
    // counts; utilization is a single int/int division.
    Q(
      "q_token_budget_mix",
      s"""WITH ranked AS (
        |  SELECT source, doc_id, len($duckTokens) AS n_tok,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY ${duck("source || '#' || doc_id::VARCHAR")}, doc_id) AS rn
        |  FROM documents
        |), cum AS (
        |  SELECT source, doc_id, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY rn
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ctok
        |  FROM ranked
        |), budget AS (
        |  SELECT * FROM (VALUES ('src0', 2000), ('src1', 500), ('src3', 1500)) b(src, tok_budget)
        |)
        |SELECT source, count(*) AS picked_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS picked_tokens,
        |  any_value(tok_budget) AS tok_budget,
        |  CAST(CAST(sum(n_tok) AS BIGINT) AS DOUBLE) / any_value(tok_budget) AS utilization,
        |  min(doc_id) AS first_pick
        |FROM cum JOIN budget ON source = budget.src AND ctok <= tok_budget
        |GROUP BY source""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val budgets = Seq(("src0", 2000), ("src1", 500), ("src3", 1500))
        .toDF("src", "tok_budget")
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          expr(s"size($tokens)").cast("long").as("n_tok"),
          expr(h("concat(source, '#', cast(doc_id as string))")).as("hv"))
        .withColumn("ctok", sum(col("n_tok")).over(
          Window.partitionBy(col("source")).orderBy(col("hv"), col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("bigint"))
        .join(broadcast(budgets), col("source") === col("src") && col("ctok") <= col("tok_budget"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("picked_docs"),
          sum(col("n_tok")).cast("bigint").as("picked_tokens"),
          first(col("tok_budget")).as("tok_budget"),
          (sum(col("n_tok")).cast("bigint").cast("double") / first(col("tok_budget")))
            .as("utilization"),
          min(col("doc_id")).as("first_pick"))
    },

    // ---- output-shard balance audit ----------------------------------------
    // The pre-write layout check before sharding a corpus into N output
    // files/partitions: assign every doc its content-hash shard
    // (deterministic — the same doc lands in the same shard on every
    // run and engine) and report per-shard doc/token volume plus each
    // shard's share of the corpus. A skewed share here means the shard
    // count or the hash key is wrong BEFORE the write pays for it
    // (uneven output files are the straggler source at 100 TB read
    // time). One map projection + one 32-group aggregate; the share
    // derives from a window over the BOUNDED shard frame (the crosstab
    // rule — never a second corpus pass).
    Q(
      "q_shard_balance",
      s"""WITH s AS (
        |  SELECT ${duck("'shard#' || doc_id::VARCHAR")} % 32 AS shard,
        |    len($duckTokens) AS n_tok
        |  FROM documents
        |)
        |SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS doc_share
        |FROM s GROUP BY shard""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          (expr(h("concat('shard#', cast(doc_id as string))")) % 32).as("shard"),
          expr(s"size($tokens)").cast("long").as("n_tok"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("bigint").as("n_tokens"))
        .withColumn("doc_share",
          col("n_docs").cast("double") /
            sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window
              .partitionBy(lit(1))))
    },

    // ---- temperature-scaled source mixture ---------------------------------
    // The multilingual/multi-source rebalancing rule (sample share
    // proportional to count^alpha, here alpha = 0.5): raw proportional
    // sampling drowns low-resource sources, uniform over-weights them —
    // the sqrt temperature is the standard compromise. Per-source
    // quotas derive from EXACT counts: sqrt runs on the aggregated
    // count (correctly-rounded IEEE, identical both engines), each term
    // snaps through dec_cast before the 3-term total so the sum order
    // can't flip a ulp, and the final share is one double division +
    // floor on identical inputs. Selection inside a source is the same
    // content-hash rank gate as q_data_mix — reproducible across runs,
    // partitionings, and engines.
    Q(
      "q_temperature_mix",
      s"""WITH cnts AS (
        |  SELECT source, count(*) AS cnt FROM documents GROUP BY source
        |), w AS (
        |  SELECT source, cnt,
        |    CAST(CAST(sqrt(cnt) AS DECIMAL(18,9)) AS DOUBLE) AS sw,
        |    CAST(sum(CAST(sqrt(cnt) AS DECIMAL(18,9))) OVER () AS DOUBLE) AS tw
        |  FROM cnts
        |), quota AS (
        |  SELECT source, cnt, CAST(floor(100 * sw / tw) AS BIGINT) AS n FROM w
        |), ranked AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY ${duck("source || '#' || doc_id::VARCHAR")}, doc_id) AS rn
        |  FROM documents
        |)
        |SELECT r.source, any_value(q.cnt) AS source_total, any_value(q.n) AS quota,
        |  count(*) AS picked, min(doc_id) AS first_pick
        |FROM ranked r JOIN quota q ON r.source = q.source AND r.rn <= q.n
        |GROUP BY r.source""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val cnts = Tables(s, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      val w = cnts.select(col("source"), col("cnt"),
        expr("cast(dec_cast(sqrt(cnt), 18, 9) as double)").as("sw"),
        expr("cast(sum(dec_cast(sqrt(cnt), 18, 9)) over () as double)").as("tw"))
      // the per-source frame is |sources| rows — the unpartitioned
      // window total is a scalar over a bounded frame, not corpus data
      val quota = w.select(col("source").as("q_src"), col("cnt").as("source_total"),
        expr("cast(floor(100 * sw / tw) as bigint)").as("n"))
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          expr(h("concat(source, '#', cast(doc_id as string))")).as("hv"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("hv"), col("doc_id"))))
        .join(broadcast(quota), col("source") === col("q_src") && col("rn") <= col("n"))
        .groupBy(col("source"))
        .agg(
          first(col("source_total")).as("source_total"),
          first(col("n")).as("quota"),
          count(lit(1)).as("picked"),
          min(col("doc_id")).as("first_pick"))
    },

    // ---- weighted priority sample (Efraimidis-Spirakis top-k) --------------
    // Weighted sampling without replacement as a priority top-k: each row
    // draws u from its content hash (deterministic, partition-layout
    // independent) and ranks by ln(u)/w — the E-S key in log space, with
    // w = n_chars. Top-100 via orderBy+limit = TakeOrderedAndProject
    // (distributed bounded heaps, never a global sort). ln goes through
    // dec_cast(18,12) before ranking (libm last-ulp differs per engine);
    // the cutoff tie-breaks on doc_id, so the selected set is exact.
    Q(
      "q_weighted_sample",
      s"""SELECT doc_id, n_chars,
        |  CAST(CAST(ln((${duck("doc_id::VARCHAR")} % 1000000 + 1) / 1000001.0)
        |       / n_chars AS DECIMAL(18,12)) AS DOUBLE) AS priority
        |FROM documents WHERE n_chars > 0
        |ORDER BY priority DESC, doc_id LIMIT 100""") { (s, dir) =>
      Tables(s, dir, "documents")
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars"),
          call_function("dec_cast",
            log((expr(h("cast(doc_id as string)")) % 1000000 + 1) / lit(1000001.0))
              / col("n_chars"),
            lit(18), lit(12)).cast("double").as("priority"))
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(100)
    },

    // ---- sequence packing (concat-and-chunk into 512-token windows) --------
    // The training-example assembly step: concatenate documents in a
    // deterministic order and cut every 512 tokens; each document lands
    // in windows [first_bin, last_bin] of its shard. Strict GLOBAL
    // concat order is inherently sequential, so packing is per shard —
    // (lang, doc_id div 100) here — which is exactly how a 100 TB run
    // packs: bounded shards in parallel, a window cumsum within each,
    // shard id baked into the example key. Everything is integer
    // arithmetic on exact longs (hash-safe, engine-identical).
    Q(
      "q_pack_sequences",
      raw"""WITH t AS (
        |  SELECT doc_id, lang, doc_id // 100 AS shard,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, shard, n_tok,
        |    sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id) AS cum
        |  FROM t
        |)
        |SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard, n_tok,
        |  CAST((cum - n_tok) // 512 AS BIGINT) AS first_bin,
        |  CAST((cum - 1) // 512 AS BIGINT) AS last_bin,
        |  CAST((cum - 1) // 512 - (cum - n_tok) // 512 + 1 AS BIGINT) AS n_bins
        |FROM c""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      Tables(s, dir, "documents")
        .select(
          col("doc_id"), col("lang"),
          expr("doc_id div 100").as("shard"),
          expr(s"cast(size(split(trim(text), '\\\\s+')) as bigint)").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .select(
          col("doc_id"), col("lang"), col("shard"), col("n_tok"),
          expr("(cum - n_tok) div 512").as("first_bin"),
          expr("(cum - 1) div 512").as("last_bin"),
          expr("(cum - 1) div 512 - (cum - n_tok) div 512 + 1").as("n_bins"))
    },

    // ---- overlapping document chunking (RAG / context-window prep) ---------
    // Per-document 32-token windows with stride 16 (50% overlap) — the
    // retrieval-corpus twin of q_pack_sequences' training packing: a doc
    // with n tokens yields max(1, (n-1) div 16) chunks, the window
    // clamps at the document end, and each chunk ships with its content
    // fingerprint (downstream chunk-level dedup). Pure map + explode —
    // no shuffle at any scale; chunk arithmetic is exact integers and
    // the chunk text is hash-verified byte-for-byte cross-engine.
    // (Window/stride are sized to the synthetic corpus — ~54-token docs
    // — so multi-chunk overlap is actually exercised; a production run
    // uses e.g. 512/256 with the identical plan.)
    Q(
      "q_chunk_overlap",
      raw"""WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |)
        |SELECT doc_id, i AS chunk_id,
        |  CAST(len(w[i*16+1 : i*16+32]) AS BIGINT) AS n_tok,
        |  ${duck("array_to_string(w[i*16+1 : i*16+32], ' ')")} AS chunk_fp
        |FROM tok, unnest(generate_series(0, greatest(1, (len(w)-1) // 16) - 1)) AS t(i)""") { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("w"))
        .select(col("doc_id"), col("w"),
          explode(expr("sequence(0, greatest(1, (size(w) - 1) div 16) - 1)")).as("chunk_id"))
        .select(
          col("doc_id"),
          col("chunk_id").cast("long").as("chunk_id"),
          expr("cast(size(slice(w, chunk_id * 16 + 1, 32)) as bigint)").as("n_tok"),
          expr(h("concat_ws(' ', slice(w, chunk_id * 16 + 1, 32))")).as("chunk_fp"))
    })
}
