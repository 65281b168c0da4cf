package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash.{duck, h}
import graft.io.CacheScope.Persisted
import graft.io.Tables

/** URL-tier curation — the step BEFORE `extract_html` in every real
  * crawl pipeline (round 19, VERDICT r18 #3; the C4/RefinedWeb URL
  * filtering + URL dedup stage, public knowledge): a crawl frontier
  * yields (url, payload) pairs, and the cheapest quality wins come
  * from the URL STRING alone — scheme/blocklist/extension gates drop
  * fetches before a byte of HTML parses, and exact URL dedup collapses
  * mirror/tracking-decorated refetches before the content tier ever
  * runs. All three operators are map-only or one-HashAggregate — the
  * shape that runs at frontier scale (billions of URLs) with zero pair
  * joins.
  *
  * The corpus carries no URL column, so the fixture derives one
  * deterministically (the HTML/newline-corpus precedent): per doc ONE
  * CrossHash drives scheme (ftp 1-in-20 — the non-http reject), an
  * optional 'www.' prefix and upper-cased host (normalization work),
  * host from `source` (so the blocklist gate has real targets), an
  * optional default port, a 12-slot path with a weighted extension
  * pick (.jpg/.css/.zip are the asset rejects), and a query string
  * that is tracking-only, content-bearing (`id=`), or absent —
  * duplicate normalized URLs arise from slot/extension collisions
  * within a source, exactly the refetch shape URL dedup exists for.
  *
  * NORMALIZATION (shared by dedup and the funnel; the standard
  * canonicalization steps): lowercase host, strip a leading 'www.',
  * strip an explicit port, drop the fragment, drop tracking query
  * params (utm_ prefix / ref) keeping content-bearing ones, and fold the
  * scheme away (http/https mirrors collapse; ftp never reaches the
  * dedup tier — the filter precedes it).
  *
  * Reference scope note: the reference (PastorGL/datacooker-dist) has
  * no URL operators — LLM-pipeline extension surface (SURVEY §2.2). */
object Url {

  /** Blocklist row budget for the broadcast arm (VERDICT r19 #3 — the
    * blocklist is DATA now, not literals): ~4M hosts × ~30 bytes ≈ a
    * bounded broadcast relation, far above real host-granular
    * blocklists (UT1/StevenBlack-class lists are 10⁴–10⁶ hosts). Past
    * it the gate takes the bloom-prefilter + exact-confirm path (the
    * decontaminateGate switch): both branches compute the IDENTICAL
    * blocked set — the bloom is a prefilter, never a verdict — so ONE
    * oracle text covers every branch. */
  private[graft] final val UrlBlockRowBudget = 4_000_000L

  /** The derived blocklist fixture (the derived-corpus rule: the
    * corpus carries no blocklist, so one is derived deterministically
    * on BOTH engines): every 5th real corpus host by CrossHash — so
    * the gate provably fires on real rows — plus 50 synthetic junk
    * hosts that never match, giving the list a few dozen entries at
    * every SF. Host granularity, normalized form (the gate compares
    * post-normalization hosts). */
  private[graft] def blocklistFrame(s: SparkSession, dir: String): DataFrame =
    // exported artifact dir (round 20): the persisted host table (the
    // production shape — a real deployment points model_dir at its
    // blocklist artifact); raw corpus → the derived fixture below
    graft.io.ModelStore.loadBlocklist(s, dir).getOrElse {
    // no distinct here: the gate DISTINCTs the blocklist once at probe
    // build (one bounded exchange total — the q_url_filter plan gate)
    val corpusArm = Tables(s, dir, "documents")
      .select(concat(lower(col("source")), lit(".example.com")).as("bhost"))
      .filter(expr(s"${h("concat('blk#', bhost)")} % 5 = 0"))
    val junkArm = s.range(50)
      .select(concat(lit("spam"), col("id").cast("string"),
        lit(".junk.example")).as("bhost"))
    corpusArm.unionByName(junkArm)
  }

  /** Blocklist cardinality, memoized per (session, dir) — the branch
    * switch input (a production deployment reads this from its
    * catalog stats; the fixture counts its bounded frame once, the
    * langsOf bounded-collect rule). */
  private val blkCounts =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Long]]()
  private[graft] def blocklistRows(s: SparkSession, dir: String): Long =
    blkCounts.synchronized {
      var m = blkCounts.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty; blkCounts.put(s, m)
      }
      m
    }.getOrElseUpdate(dir, blocklistFrame(s, dir).distinct().count())

  // ---- the derived URL fixture --------------------------------------------

  private val extArms =
    Seq(".jpg", ".css", ".zip", ".html", ".html", ".html", ".html", ".html",
      ".php", ".php", ".php", "")

  /** Spark SQL fragment over (ud BIGINT, source): the derived URL. */
  private[graft] val urlSql: String = {
    val exts = extArms.map("'" + _ + "'").mkString("array(", ", ", ")")
    s"""concat(
       |  case when ud % 20 = 0 then 'ftp' when ud % 20 < 8 then 'http' else 'https' end,
       |  '://',
       |  case when (ud div 20) % 4 = 0 then 'www.' else '' end,
       |  case when (ud div 80) % 5 = 0 then upper(source) else source end,
       |  '.example.com',
       |  case when (ud div 57600) % 7 = 0 then
       |    case when ud % 20 = 0 then ':21' when ud % 20 < 8 then ':80' else ':443' end
       |  else '' end,
       |  '/p/', cast((ud div 400) % 12 as string),
       |  element_at($exts, cast((ud div 4800) % 12 as int) + 1),
       |  case when (ud div 403200) % 3 = 0 then concat('?utm_source=feed&ref=r', cast(ud % 7 as string))
       |       when (ud div 403200) % 3 = 1 then concat('?id=', cast(ud % 3 as string))
       |       else '' end,
       |  case when (ud div 1209600) % 5 = 0 then concat('#sec', cast(ud % 4 as string)) else '' end)"""
      .stripMargin
  }

  /** DuckDB twin of [[urlSql]], rendered from the same arm table (one
    * line: the oracle text is stripMargin'd again downstream, and a
    * line-leading '||' would lose a pipe to the margin strip). */
  private val duckUrl: String = {
    val exts = extArms.map("'" + _ + "'").mkString("[", ", ", "]")
    Seq(
      "(CASE WHEN ud % 20 = 0 THEN 'ftp' WHEN ud % 20 < 8 THEN 'http' ELSE 'https' END)",
      "'://'",
      "(CASE WHEN (ud // 20) % 4 = 0 THEN 'www.' ELSE '' END)",
      "(CASE WHEN (ud // 80) % 5 = 0 THEN upper(source) ELSE source END)",
      "'.example.com'",
      "(CASE WHEN (ud // 57600) % 7 = 0 THEN " +
        "CASE WHEN ud % 20 = 0 THEN ':21' WHEN ud % 20 < 8 THEN ':80' ELSE ':443' END " +
        "ELSE '' END)",
      "'/p/'",
      "CAST((ud // 400) % 12 AS VARCHAR)",
      s"($exts)[CAST((ud // 4800) % 12 AS INT) + 1]",
      "(CASE WHEN (ud // 403200) % 3 = 0 THEN '?utm_source=feed&ref=r' || CAST(ud % 7 AS VARCHAR) " +
        "WHEN (ud // 403200) % 3 = 1 THEN '?id=' || CAST(ud % 3 AS VARCHAR) ELSE '' END)",
      "(CASE WHEN (ud // 1209600) % 5 = 0 THEN '#sec' || CAST(ud % 4 AS VARCHAR) ELSE '' END)"
    ).mkString(" || ")
  }

  // ---- parsing + normalization (one rule, both engines) --------------------

  /** Spark SQL fragments over a `url` column. Every step is a
    * codegen'd regexp/string op except the query-param filter (a tiny
    * per-row lambda over ≤ a handful of params). */
  // coalesce: a NULL/schemeless url must yield scheme '' (→ a loud
  // 'non_http' reject), not a NULL that nulls the whole verdict CASE
  // into a reasonless drop
  private[graft] def schemeSql(u: String) =
    s"coalesce(regexp_extract($u, '^([a-z]+)://', 1), '')"
  private[graft] def hostSql(u: String) =
    s"""regexp_replace(regexp_replace(lower(regexp_extract($u, '^[a-z]+://([^/?#]*)', 1)),
       | ':[0-9]+$$', ''), '^www\\\\.', '')""".stripMargin.replace("\n", "")
  private[graft] def pathSql(u: String) =
    s"regexp_extract($u, '^[a-z]+://[^/?#]*(/[^?#]*)', 1)"
  private[graft] def keptQsSql(u: String) =
    s"""array_join(filter(split(regexp_extract($u, '\\\\?([^#]*)', 1), '&'),
       | p -> p != '' and not (p like 'utm_%' or p like 'ref=%')), '&')"""
      .stripMargin.replace("\n", "")
  private[graft] def normSql(host: String, path: String, kq: String) =
    s"concat($host, $path, case when $kq != '' then concat('?', $kq) else '' end)"

  private def duckScheme(u: String) =
    s"coalesce(regexp_extract($u, '^([a-z]+)://', 1), '')"
  private def duckHost(u: String) =
    raw"""regexp_replace(regexp_replace(lower(regexp_extract($u, '^[a-z]+://([^/?#]*)', 1)),
       | ':[0-9]+$$', ''), '^www\.', '')""".stripMargin.replace("\n", "")
  private def duckPath(u: String) =
    s"regexp_extract($u, '^[a-z]+://[^/?#]*(/[^?#]*)', 1)"
  private def duckKeptQs(u: String) =
    raw"""array_to_string(list_filter(string_split(regexp_extract($u, '\?([^#]*)', 1), '&'),
       | p -> p != '' AND NOT (p LIKE 'utm_%' OR p LIKE 'ref=%')), '&')"""
      .stripMargin.replace("\n", "")
  private def duckNorm(host: String, path: String, kq: String) =
    s"$host || $path || (CASE WHEN $kq != '' THEN '?' || $kq ELSE '' END)"

  /** Oracle CTE chain: derived urls → parsed fields → gate verdict.
    * Ends in `ugate(doc_id, lang, url, scheme, host, path, kq, norm,
    * reasons, verdict)` — shared by all three oracles. */
  private def duckUrlCtes: String = {
    s"""ublk AS (
       |  SELECT lower(source) || '.example.com' AS bhost
       |  FROM (SELECT DISTINCT source FROM documents)
       |  WHERE ${duck("'blk#' || lower(source) || '.example.com'")} % 5 = 0
       |  UNION ALL
       |  SELECT 'spam' || CAST(range AS VARCHAR) || '.junk.example' FROM range(50)
       |), usrc AS (
       |  SELECT doc_id, lang, source, ${duck("'url#' || doc_id::VARCHAR")} AS ud
       |  FROM documents
       |), urls AS (
       |  SELECT doc_id, lang, $duckUrl AS url FROM usrc
       |), uparse AS (
       |  SELECT doc_id, lang, url,
       |    ${duckScheme("url")} AS scheme,
       |    ${duckHost("url")} AS host,
       |    ${duckPath("url")} AS path,
       |    ${duckKeptQs("url")} AS kq
       |  FROM urls
       |), ugate AS (
       |  SELECT doc_id, lang, url, scheme, host, path, kq,
       |    ${duckNorm("host", "path", "kq")} AS norm,
       |    concat_ws(',',
       |      CASE WHEN scheme NOT IN ('http', 'https') THEN 'non_http' END,
       |      CASE WHEN host IN (SELECT bhost FROM ublk) THEN 'blocked_domain' END,
       |      CASE WHEN regexp_matches(path, '\\.(jpg|css|zip)$$') THEN 'bad_extension' END)
       |      AS reasons,
       |    CASE WHEN scheme IN ('http', 'https')
       |          AND host NOT IN (SELECT bhost FROM ublk)
       |          AND NOT regexp_matches(path, '\\.(jpg|css|zip)$$')
       |         THEN 'keep' ELSE 'drop' END AS verdict
       |  FROM uparse
       |)""".stripMargin
  }

  /** The Spark gate frame: (doc_id, lang, url, scheme, host, path, kq,
    * norm, reasons, verdict). The parse/normalize chain stays one
    * codegen'd projection; the blocklist probe adds exactly one
    * bounded broadcast join under the budget (the extract_html plan
    * rule otherwise — zero shuffles on the corpus side). Shared by all
    * URL queries and the streaming `url_filter` op. `rowBudget` is
    * parameterized so the plan gates and the forced-path query can pin
    * the scale branch (the decontaminateGate rule). */
  private[graft] def urlGate(
      s: SparkSession, dir: String,
      rowBudget: Long = UrlBlockRowBudget): DataFrame =
    urlGateOf(
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("ud", expr(h("concat('url#', cast(doc_id as string))")))
        .withColumn("url", expr(urlSql))
        .drop("ud", "source"),
      blocklistFrame(s, dir), blocklistRows(s, dir), rowBudget)

  /** The gate over ANY frame carrying a `url` column (the streaming
    * ingest op applies it to real frontier rows; the batch fixture
    * derives `url` first), against a host-granular blocklist FRAME
    * (VERDICT r19 #3). Pass-through of every input column.
    *
    * Branch switch: at or under `rowBudget` hosts the blocklist
    * broadcasts into ONE left join (flag = matched). Past it the
    * blocklist collapses to a bloom (bounded bytes whatever the list
    * size, the [[graft.functions.BloomHits]] reference-object rule),
    * the stream is prefiltered map-side, and only bloom CANDIDATES
    * take the exact confirm join (UNHINTED — AQE sizes it) while the
    * misses stream through a pure map arm — the corpus is read by two
    * filter arms rather than shuffled once (the decontaminate trade),
    * and false positives cost confirm input, never verdicts. Both
    * branches flag the IDENTICAL blocked set, so one oracle text
    * covers them. */
  /** The parse/normalize projection — stamps (scheme, host, path, kq,
    * norm) onto any frame carrying a `url` column. ONE formulation
    * (the SimhashBlockKeys.masks single-source rule) shared by the
    * batch gate, the streaming `url_filter` op, and the
    * `url_dedup_claim` key derivation (round 20, VERDICT r19 #2) —
    * the claim tier and q_url_dedup can never disagree on what
    * "the normalized url" means. */
  private[graft] def parseNorm(urls: DataFrame): DataFrame =
    urls
      .withColumn("scheme", expr(schemeSql("url")))
      .withColumn("host", expr(hostSql("url")))
      .withColumn("path", expr(pathSql("url")))
      .withColumn("kq", expr(keptQsSql("url")))
      .withColumn("norm", expr(normSql("host", "path", "kq")))

  private[graft] def urlGateOf(
      urls: DataFrame, blocklist: DataFrame, blkRows: Long,
      rowBudget: Long = UrlBlockRowBudget): DataFrame = {
    val parsed = parseNorm(urls)
    val blk = blocklist.select(col("bhost")).distinct()
    val flagged =
      if (blkRows <= rowBudget)
        parsed.join(broadcast(blk), col("host") === col("bhost"), "left")
          .withColumn("is_blocked", col("bhost").isNotNull)
          .drop("bhost")
      else {
        val spark = urls.sparkSession
        graft.functions.GraftRuntime.ensure(spark)
        import org.apache.spark.sql.graft.ColumnBridge
        // bounded model artifact: the bloom bytes, sized like the
        // decontamination bloom (conf-clamped, 8 bits/item ~ 2% FP)
        val maxItems = spark.conf.get(
          "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
        val maxBits = spark.conf.get(
          "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
        val estItems = math.min(maxItems, math.max(100_000L, blkRows))
        val estBits = math.min(maxBits, 8L * estItems)
        val bytes = blk
          .selectExpr(s"bloom_agg(xxhash64(bhost), ${estItems}L, ${estBits}L) AS b")
          .head().getAs[Array[Byte]](0)
        val cand = parsed.withColumn("bcand",
          ColumnBridge.column(graft.functions.BloomHits(
            ColumnBridge.expression(array(col("host"))),
            java.util.Base64.getEncoder.encodeToString(bytes))) > 0)
        val missArm = cand.filter(!col("bcand"))
          .withColumn("is_blocked", lit(false)).drop("bcand")
        val hitArm = cand.filter(col("bcand"))
          .join(blk, col("host") === col("bhost"), "left")
          .withColumn("is_blocked", col("bhost").isNotNull)
          .drop("bhost", "bcand")
        missArm.unionByName(hitArm)
      }
    flagged
      .withColumn("reasons", expr(
        """concat_ws(',',
          |  case when scheme not in ('http', 'https') then 'non_http' end,
          |  case when is_blocked then 'blocked_domain' end,
          |  case when path rlike '\\.(jpg|css|zip)$' then 'bad_extension' end)"""
          .stripMargin))
      .withColumn("verdict", expr(
        """case when scheme in ('http', 'https')
          |      and not is_blocked
          |      and not path rlike '\\.(jpg|css|zip)$'
          |     then 'keep' else 'drop' end""".stripMargin))
      .drop("is_blocked")
  }

  val queries: Seq[Q] = Seq(

    // ---- URL filter: per-URL drop reasons (the q_filter_reasons shape) -----
    Q(
      "q_url_filter",
      s"""WITH $duckUrlCtes
         |SELECT doc_id, url, scheme, host, reasons, verdict FROM ugate""".stripMargin) {
      (s, dir) =>
        urlGate(s, dir)
          .select(col("doc_id"), col("url"), col("scheme"), col("host"),
            col("reasons"), col("verdict"))
    },

    // The gate FORCED past the blocklist row budget (budget 0 → the
    // bloom-prefilter + exact-confirm scale branch) so the arm that
    // runs against production-size blocklists stays hash-gate-verified
    // at every SF — both branches flag the identical blocked set, so
    // the oracle text is shared verbatim (the decontaminate_bloom
    // rule).
    Q(
      "q_url_filter_bloom",
      s"""WITH $duckUrlCtes
         |SELECT doc_id, url, scheme, host, reasons, verdict FROM ugate""".stripMargin) {
      (s, dir) =>
        urlGate(s, dir, rowBudget = 0L)
          .select(col("doc_id"), col("url"), col("scheme"), col("host"),
            col("reasons"), col("verdict"))
    },

    // ---- URL dedup: first-arrival exact dedup on the normalized URL --------
    // Among gate survivors only (the pipeline order: a blocked fetch
    // never reaches the dedup tier). ONE HashAggregate over the
    // normalized key, O(N), join-back flags every loser — the
    // q_dedup_lines kernel at URL granularity. keep_id = min(doc_id)
    // (first arrival under the batch's deterministic order).
    Q(
      "q_url_dedup",
      s"""WITH $duckUrlCtes,
         |udf AS (
         |  SELECT norm, CAST(min(doc_id) AS BIGINT) AS keep_id,
         |    CAST(count(*) AS BIGINT) AS df
         |  FROM ugate WHERE verdict = 'keep' GROUP BY norm
         |)
         |SELECT g.doc_id, g.norm AS url_norm, u.keep_id, u.df
         |FROM ugate g JOIN udf u ON g.norm = u.norm
         |WHERE g.verdict = 'keep' AND u.df >= 2""".stripMargin) { (s, dir) =>
      val keeps = urlGate(s, dir)
        .filter(col("verdict") === "keep")
        .select(col("doc_id"), col("norm"))
        .persistScoped() // feeds the key aggregate and the join-back
      val dfTab = keeps.groupBy(col("norm"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("df"))
        .filter(col("df") >= 2)
      keeps.join(dfTab, Seq("norm"))
        .select(col("doc_id"), col("norm").as("url_norm"), col("keep_id"), col("df"))
    },

    // ---- the composed crawl funnel: URL gate → URL dedup → extract → QA ----
    // The numbers a crawl operator reads per language: fetched, passed
    // the URL gate, survived URL dedup (first arrivals), and passed
    // the content-tier quality gate on the EXTRACTED html (the
    // q_html_extract chain + TextAnalysis' shared token-floor/stopword
    // rule) — i.e. the whole front end composed, URL tier first, so
    // the expensive extraction only conceptually runs on URL-unique
    // fetches (the funnel counts make the saving visible).
    Q(
      "q_crawl_funnel",
      s"""WITH $duckUrlCtes,
         |udf AS (
         |  SELECT norm, min(doc_id) AS keep_id FROM ugate
         |  WHERE verdict = 'keep' GROUP BY norm
         |), hsrc AS (
         |  SELECT doc_id, lang, source, ${Html.duckHtml} AS html FROM documents
         |), hqual AS (
         |  SELECT doc_id,
         |    trim(${Html.duckExtract("html")}) AS qt,
         |    regexp_split_to_array(trim(${Html.duckExtract("html")}), '\\s+') AS w
         |  FROM hsrc
         |)
         |SELECT g.lang, CAST(count(*) AS BIGINT) AS n_fetched,
         |  CAST(sum(CASE WHEN g.verdict = 'keep' THEN 1 ELSE 0 END) AS BIGINT) AS url_kept,
         |  CAST(sum(CASE WHEN u.keep_id = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS url_unique,
         |  CAST(sum(CASE WHEN u.keep_id = g.doc_id
         |                 AND ${TextAnalysis.duckExtQuality("q.qt", "q.w")}
         |            THEN 1 ELSE 0 END) AS BIGINT) AS text_kept
         |FROM ugate g
         |LEFT JOIN udf u ON g.norm = u.norm AND g.verdict = 'keep'
         |LEFT JOIN hqual q ON q.doc_id = g.doc_id
         |GROUP BY g.lang""".stripMargin) { (s, dir) =>
      val gate = urlGate(s, dir).persistScoped() // feeds keys + the funnel
      val firsts = gate.filter(col("verdict") === "keep")
        .groupBy(col("norm")).agg(min(col("doc_id")).as("keep_id"))
      val qual = Tables(s, dir, "documents")
        .select(col("doc_id"),
          expr(s"trim(${Html.extractSql(Html.htmlSql)})").as("qt"),
          expr(s"split(trim(${Html.extractSql(Html.htmlSql)}), '\\\\s+')").as("w"))
        // the extended content gate (round 20, VERDICT r19 #4): token
        // floor + stopwords + the Gopher surface rules, one shared
        // fragment with q_html_pipeline / q_filter_reasons
        .select(col("doc_id"),
          expr(TextAnalysis.extQualitySql("qt", "w")).as("ok"))
      gate
        .join(firsts.withColumnRenamed("norm", "f_norm"),
          col("norm") === col("f_norm") && col("verdict") === "keep", "left")
        .join(qual, Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_fetched"),
          sum(when(col("verdict") === "keep", 1L).otherwise(0L)).as("url_kept"),
          sum(when(col("keep_id") === col("doc_id"), 1L).otherwise(0L)).as("url_unique"),
          sum(when(col("keep_id") === col("doc_id") && col("ok"), 1L).otherwise(0L))
            .as("text_kept"))
    })
}
