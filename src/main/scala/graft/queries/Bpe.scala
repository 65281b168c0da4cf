package graft.queries

import org.apache.spark.sql.functions._

import graft.io.CacheScope.Persisted
import graft.io.Tables

/** Byte-pair-encoding merge training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-vocabulary operator a training-data pipeline runs after
  * dedup/filtering. BPE trains on the WORD-FREQUENCY table, not the raw
  * corpus: the corpus collapses to a Heap's-law-bounded vocab in one
  * hash-groupBy, and every subsequent round touches only that bounded
  * frame — the same iterative-over-a-bounded-subset shape as the
  * connected-components loop.
  *
  * Each round:
  *  1. adjacent symbol pairs exploded from the vocab, counted weighted
  *     by word frequency (HashAggregate, map-side partials);
  *  2. the single top pair (count desc, then lexicographic — fully
  *     deterministic) collected as the round's SCALAR decision, like the
  *     CC loop's convergence count — never row data;
  *  3. the pair merged into every word's symbol array with a greedy
  *     left-to-right non-overlapping fold (a just-merged symbol is
  *     strictly longer than `lhs`, so it can never re-match as the left
  *     element within the same pass — exactly Sennrich's semantics).
  *
  * The merge fold is an interpreted HOF, acceptable here because it runs
  * over the bounded vocab, never the corpus. The DuckDB oracle unrolls
  * the same K rounds with a positional formulation (windowed
  * run-parity), which is equivalent to the greedy fold: candidate runs
  * with lhs != rhs are singletons, and for lhs == rhs greedy merges at
  * even offsets within each run.
  */
object Bpe {

  private val tokens = "split(trim(text), '\\\\s+')"
  private val duckTokens = raw"regexp_split_to_array(trim(text), '\s+')"

  /** Merge rounds — a fixed model constant, like |C| centroids. */
  private val K = 6

  /** Unigram-LM geometry (Kudo 2018 / the SentencePiece default):
    * max candidate piece length, seed-vocabulary cut (top pieces by
    * weighted substring frequency — single chars are ALWAYS kept so
    * segmentation can never fail), and the trained-table slice the
    * gate hashes. All fixed model constants. */
  private val ULEN = 4
  private val UTOP = 64
  private val UOUT = 32

  /** Shared CTE prefix: w0 (vocab) through w`K` (merged vocab) plus the
    * per-round m{r} top-pair frames. */
  private def duckCtes: String = {
    val base =
      raw"""w0 AS MATERIALIZED (
        |  SELECT word, freq, list_transform(generate_series(1, len(word)), i -> word[i]) AS syms
        |  FROM (
        |    SELECT lower(t) AS word, count(*) AS freq
        |    FROM (SELECT unnest($duckTokens) AS t FROM documents)
        |    WHERE regexp_matches(lower(t), '^[a-z]+$$')
        |    GROUP BY 1))""".stripMargin
    val rounds = (1 to K).map { r =>
      val p = r - 1
      s"""p$r AS MATERIALIZED (
         |  SELECT syms[i] AS lhs, syms[i+1] AS rhs, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM w$p, unnest(generate_series(1, len(syms)-1)) AS t(i)
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p$r ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |e$r AS MATERIALIZED (
         |  SELECT word, freq, i, syms[i] AS sym,
         |    (i < len(syms) AND syms[i] = m.lhs AND syms[i+1] = m.rhs) AS cand
         |  FROM w$p, m$r m, unnest(generate_series(1, len(syms))) AS t(i)),
         |st$r AS MATERIALIZED (
         |  SELECT word, i, (i - min(i) OVER (PARTITION BY word, isl)) % 2 = 0 AS is_start
         |  FROM (SELECT word, i, i - row_number() OVER (PARTITION BY word ORDER BY i) AS isl
         |        FROM e$r WHERE cand)),
         |w$r AS MATERIALIZED (
         |  SELECT e.word, any_value(e.freq) AS freq,
         |    list(CASE WHEN coalesce(s.is_start, false) THEN m.lhs || m.rhs ELSE e.sym END ORDER BY e.i) AS syms
         |  FROM e$r e
         |  CROSS JOIN m$r m
         |  LEFT JOIN st$r s ON s.word = e.word AND s.i = e.i
         |  LEFT JOIN st$r sp ON sp.word = e.word AND sp.i = e.i - 1 AND sp.is_start
         |  WHERE sp.i IS NULL
         |  GROUP BY e.word)""".stripMargin
    }
    "WITH " + (base +: rounds).mkString(",\n")
  }

  private def duckOracle: String =
    duckCtes + "\n" + (1 to K)
      .map(r => s"SELECT $r AS round, lhs, rhs, lhs || rhs AS merged, cnt FROM m$r")
      .mkString(" UNION ALL ")

  private def duckEncodeOracle: String =
    duckCtes +
      raw""",
         |tok AS (
         |  SELECT doc_id, lower(t) AS word
         |  FROM (SELECT doc_id, unnest($duckTokens) AS t FROM documents)
         |)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(len(w$K.syms)) AS BIGINT) AS n_tokens,
         |  CAST(sum(length(word)) AS BIGINT) AS n_chars
         |FROM tok JOIN w$K USING (word)
         |WHERE regexp_matches(word, '^[a-z]+$$')
         |GROUP BY doc_id""".stripMargin

  /** DuckDB twin of Spark's dec_cast at scale 9 — the VARCHAR path
    * (the Curation.duckSnap rule: a direct double→DECIMAL cast in
    * DuckDB rounds the exact binary value where Spark rounds the
    * shortest repr). */
  private def uSnap(x: String): String =
    s"CAST(CAST($x AS VARCHAR) AS DECIMAL(18,9))"

  /** The shared unigram-LM oracle chain, ending in `sc2` (the trained
    * piece table) and `seg2` (the final per-word Viterbi segmentation).
    * The Viterbi itself is mirrored by ENUMERATION: a recursive CTE
    * walks every segmentation of every vocab word over the kept piece
    * table (bounded — compositions of ≤ max-word-length with pieces
    * ≤ ULEN, over the Heap's-law vocab), then picks per word by
    * (total DESC, length-string DESC) — exactly the native DP's
    * exact-integer total with ties toward the longer piece decided
    * right-to-left (two complete length strings can never be
    * prefix-related: their digit sums both equal the word length).
    * Totals accumulate in exact DECIMAL(18,9); scores are the same
    * VARCHAR-path snapped ln values the Spark model collects. */
  private def duckUniCtes: String = {
    def paths(n: Int, sc: String) =
      s"""paths$n AS (
         |  SELECT word, freq, 0 AS pos, CAST(0 AS DECIMAL(18,9)) AS total,
         |    '' AS lens, CAST([] AS VARCHAR[]) AS pcs
         |  FROM uv
         |  UNION ALL
         |  SELECT p.word, p.freq, p.pos + s.plen,
         |    CAST(p.total + s.lp AS DECIMAL(18,9)),
         |    p.lens || chr(48 + s.plen), list_append(p.pcs, s.piece)
         |  FROM paths$n p JOIN $sc s ON s.piece = substr(p.word, p.pos + 1, s.plen)
         |  WHERE p.pos < length(p.word)
         |), seg$n AS MATERIALIZED (
         |  SELECT word, freq, pcs FROM (
         |    SELECT word, freq, pcs,
         |      row_number() OVER (PARTITION BY word ORDER BY total DESC, lens DESC) AS rn
         |    FROM paths$n WHERE pos = length(word)
         |  ) WHERE rn = 1
         |)""".stripMargin
    s"""uv AS MATERIALIZED (
       |  SELECT lower(t) AS word, count(*) AS freq
       |  FROM (SELECT unnest($duckTokens) AS t FROM documents)
       |  WHERE regexp_matches(lower(t), '^[a-z]+$$')
       |  GROUP BY 1
       |), usub AS MATERIALIZED (
       |  SELECT substr(word, i, l) AS piece, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM uv,
       |    unnest(generate_series(1, length(word))) AS t(i),
       |    unnest(generate_series(1, $ULEN)) AS t2(l)
       |  WHERE i + l - 1 <= length(word)
       |  GROUP BY 1
       |), ukept AS MATERIALIZED (
       |  -- NOT a UNION: inside WITH RECURSIVE, DuckDB gives a two-arm
       |  -- UNION recursive-iteration semantics and ships DUPLICATE
       |  -- rows for pieces in both arms (measured: single chars
       |  -- doubled in the usage join); usub is unique by piece, so
       |  -- one SELECT with an OR membership test is the same set
       |  SELECT piece, cnt FROM usub
       |  WHERE length(piece) = 1 OR piece IN (
       |    SELECT piece FROM usub ORDER BY cnt DESC, piece LIMIT $UTOP)
       |), sc1 AS MATERIALIZED (
       |  SELECT piece, CAST(length(piece) AS INT) AS plen,
       |    ${uSnap("ln(CAST(cnt AS DOUBLE) / " +
                    "CAST((SELECT sum(cnt) FROM ukept) AS BIGINT))")} AS lp
       |  FROM ukept
       |), ${paths(1, "sc1")}, uu1 AS MATERIALIZED (
       |  SELECT k.piece, CAST(coalesce(sum(s.freq), 0) AS BIGINT) AS u
       |  FROM ukept k LEFT JOIN (
       |    SELECT unnest(pcs) AS piece, freq FROM seg1) s USING (piece)
       |  GROUP BY 1
       |), sc2 AS MATERIALIZED (
       |  SELECT piece, CAST(length(piece) AS INT) AS plen, u,
       |    ${uSnap("ln(CAST(u + 1 AS DOUBLE) / " +
                    "(CAST((SELECT sum(u) FROM uu1) AS BIGINT) + (SELECT count(*) FROM uu1)))")} AS lp
       |  FROM uu1
       |), ${paths(2, "sc2")}""".stripMargin
  }

  private val uniModels =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.concurrent.TrieMap[String, Seq[(String, Long)]]]()
  private def uniModelMap(s: org.apache.spark.sql.SparkSession) =
    uniModels.synchronized {
      var m = uniModels.get(s)
      if (m == null) { m = scala.collection.concurrent.TrieMap.empty; uniModels.put(s, m) }
      m
    }

  /** Trained unigram-LM piece table for (session, dir) as (piece,
    * SCALE-9 UNSCALED log-prob) pairs, training on demand — the model
    * hand-off to the streaming encoder
    * ([[graft.streaming.Streams.unigramEncode]]). */
  private[graft] def unigramModel(
      s: org.apache.spark.sql.SparkSession, dir: String): Seq[(String, Long)] =
    uniModelMap(s).getOrElseUpdate(dir,
      // exported artifact dir → load the persisted piece table in its
      // trained order (round 20); raw corpus → train on demand
      graft.io.ModelStore.loadUnigram(s, dir).getOrElse {
        val (_, sc2) = uniTrain(s, dir)
        sc2.map(r => (r._1, r._3.movePointRight(9).longValueExact()))
      })

  /** Hard-EM unigram-LM training (one Viterbi re-estimation round):
    * seed scores from weighted substring frequencies over the kept
    * piece table, segment the vocab, re-estimate Laplace-smoothed
    * scores from usage, segment again. Returns the final segmentation
    * frame (word, freq, pcs) and the trained (piece, usage, logprob)
    * table (model-sized — ≤ UTOP + 26 rows at any corpus). Both
    * Viterbi passes run the native [[graft.functions.UnigramSegment]]
    * expression over the BOUNDED vocab frame; the model rides as a
    * reference object via ColumnBridge. */
  private def uniTrain(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, Seq[(String, Long, java.math.BigDecimal)]) = {
    import org.apache.spark.sql.graft.ColumnBridge
    graft.functions.GraftRuntime.ensure(s)
    val v = Tables(s, dir, "documents")
      .select(explode(expr(tokens)).as("t"))
      .select(lower(col("t")).as("word"))
      .filter(expr("word rlike '^[a-z]+$'"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .persistScoped() // feeds the substring counts AND both Viterbi passes
    val subs = v
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(1, least($ULEN, length(word) - i + 1)),
           |    l -> substring(word, i, l))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .persistScoped() // the top slice AND the single-char floor
    val kept = subs.orderBy(col("cnt").desc, col("piece")).limit(UTOP)
      .union(subs.filter(length(col("piece")) === 1))
      .distinct()
    val t1 = kept.agg(sum(col("cnt")).as("tc"))
    val sc1 = kept.crossJoin(broadcast(t1))
      .select(col("piece"),
        expr("dec_cast(ln(cast(cnt as double) / tc), 18, 9)").as("lp"))
      .collect() // model-sized: <= UTOP + 26 rows
      .map(r => (r.getString(0), r.getDecimal(1)))
    def segCol(model: Seq[(String, java.math.BigDecimal)]) =
      ColumnBridge.column(graft.functions.UnigramSegment(
        ColumnBridge.expression(col("word")),
        model.map(_._1),
        model.map(_._2.movePointRight(9).longValueExact())))
    val usage1 = v.withColumn("pcs", segCol(sc1.toSeq))
      .select(explode(col("pcs")).as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("uc"))
    import s.implicits._
    val spine = sc1.map(_._1).toSeq.toDF("piece")
    val u1 = spine.join(usage1, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("uc"), lit(0L)).as("u"))
    val tot2 = u1.agg(sum(col("u")).as("uu"), count(lit(1)).as("p"))
    val sc2 = u1.crossJoin(broadcast(tot2))
      .select(col("piece"), col("u"),
        expr("dec_cast(ln(cast(u + 1 as double) / (uu + p)), 18, 9)").as("lp"))
      .collect() // model-sized again
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    val seg2 = v.withColumn("pcs", segCol(sc2.toSeq.map(r => (r._1, r._3))))
    (seg2, scala.collection.immutable.ArraySeq.unsafeWrapArray(sc2))
  }

  /** Run the K training rounds; returns the merge decisions and the
    * final vocab frame (word, freq, syms) — scoped-persisted, released
    * by the materialization site like every other scoped cache. */
  private def train(
      s: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[(Int, String, String, String, Long)], org.apache.spark.sql.DataFrame) = {
    // vocab: one corpus-wide hash-groupBy; everything after is bounded
    var words = Tables(s, dir, "documents")
      .select(explode(expr(tokens)).as("t"))
      .select(lower(col("t")).as("word"))
      .filter(expr("word rlike '^[a-z]+$'"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))").as("syms"))
      .persistScoped()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    // grandparent release: round r's top-pair collect materializes
    // frame r-1's cache, after which frame r-2 has no live consumer —
    // releasing THEN (instead of force-materializing each new frame
    // with a count) saves one job per round
    var grandparent: org.apache.spark.sql.DataFrame = null
    for (r <- 1 to K) {
      // guard size >= 2 BEFORE the pair sequence: Spark's
      // sequence(1, 0) runs DESCENDING ([1, 0]), it is not empty
      val top = words
        .filter(expr("size(syms) >= 2"))
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) as lhs, element_at(syms, i + 1) as rhs))")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect()(0) // ONE aggregated decision row per round, not row data
      if (grandparent != null) grandparent.unpersist()
      val (lhs, rhs, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((r, lhs, rhs, lhs + rhs, cnt))
      // symbols are ^[a-z]+$ by construction (single chars of filtered
      // words, closed under concatenation), so literal embedding is safe
      val next = words
        .withColumn("syms", expr(
          s"""aggregate(syms, cast(array() as array<string>), (acc, x) ->
             |  case when size(acc) > 0 and element_at(acc, -1) = '$lhs' and x = '$rhs'
             |    then concat(slice(acc, 1, size(acc) - 1), array('$lhs$rhs'))
             |    else concat(acc, array(x)) end)""".stripMargin))
        .persistScoped()
      grandparent = words
      words = next
    }
    (merges.result(), words)
  }

  /** The TRAINED BPE vocab frame (word, freq, syms) under the
    * [[graft.io.KernelMemo]] protocol — builder: q_bpe_merges (always
    * re-runs the K training rounds, the honest bench cost; the merges
    * themselves are its output, so training can never be skipped
    * there); reusers: q_bpe_encode (and everything composing it —
    * fertility, the tokenizer head-to-head), whose honest cost is the
    * corpus join, not a retrain. Heap's-law bounded — the memo's
    * bounded-frame contract. */
  private def bpeVocabMemo(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graft.io.KernelMemo.reuse(s, dir, "bpe_vocab")(train(s, dir)._2)

  val queries: Seq[Q] = Seq(

    Q("q_bpe_merges", duckOracle) { (s, dir) =>
      import s.implicits._
      val (merges, words) = train(s, dir)
      graft.io.KernelMemo.rebuild(s, dir, "bpe_vocab")(words)
      words.unpersist()
      merges.toDF("round", "lhs", "rhs", "merged", "cnt")
    },

    // ---- apply the trained tokenizer to the corpus -------------------------
    // Encoding never touches the corpus with the interpreted merge fold:
    // documents join the BOUNDED trained vocab (word -> subword count)
    // and aggregate per doc — explode, one broadcast-ish join (AQE
    // decides; the vocab is Heap's-law bounded), one groupBy on doc_id.
    // The per-word segmentation cost was paid once at training time.
    Q(
      "q_bpe_encode",
      duckEncodeOracle) { (s, dir) =>
      val words = bpeVocabMemo(s, dir)
      val wordLens = words.select(col("word"), expr("size(syms)").as("n_sub"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(expr(tokens)).as("t"))
        .select(col("doc_id"), lower(col("t")).as("word"))
        .filter(expr("word rlike '^[a-z]+$'"))
        .join(wordLens, Seq("word"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_words"),
          sum(col("n_sub")).cast("long").as("n_tokens"),
          sum(length(col("word"))).cast("long").as("n_chars"))
    },

    // ---- tokenizer fertility by language -----------------------------------
    // THE standard tokenizer-evaluation metric: how many subword tokens
    // the trained BPE spends per word and per character in each
    // language. High fertility on a language means its text is
    // expensive to train on and under-served by the vocab — the number
    // that drives vocab-size and data-mix decisions in multilingual
    // setups. Composes the REGISTERED encode query (one formulation)
    // with the documents' lang column; all aggregates exact integers,
    // ratios single int/int divisions.
    Q(
      "q_tokenizer_fertility",
      s"""SELECT lang, count(*) AS n_docs,
        |  CAST(sum(e.n_words) AS BIGINT) AS n_words,
        |  CAST(sum(e.n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(e.n_chars) AS BIGINT) AS n_chars,
        |  CAST(sum(e.n_tokens) AS DOUBLE) / CAST(sum(e.n_words) AS BIGINT) AS tokens_per_word,
        |  CAST(sum(e.n_chars) AS DOUBLE) / CAST(sum(e.n_tokens) AS BIGINT) AS chars_per_token
        |FROM ($duckEncodeOracle) e
        |JOIN documents d USING (doc_id)
        |GROUP BY lang""".stripMargin) { (s, dir) =>
      val enc = graft.SparkEntry.queries("q_bpe_encode")(s, dir)
      enc
        .join(Tables(s, dir, "documents").select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).cast("long").as("n_words"),
          sum(col("n_tokens")).cast("long").as("n_tokens"),
          sum(col("n_chars")).cast("long").as("n_chars"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"), col("n_chars"),
          (col("n_tokens").cast("double") / col("n_words")).as("tokens_per_word"),
          (col("n_chars").cast("double") / col("n_tokens")).as("chars_per_token"))
    },

    // ---- unigram-LM tokenizer training (Kudo 2018, SentencePiece) ----------
    // The OTHER standard subword tokenizer: seed a piece vocabulary
    // from weighted substring frequencies (top UTOP + every single
    // char, so coverage is total), Viterbi-segment the Heap's-law
    // vocab under exact-INTEGER scale-9 log-prob scores (the native
    // unigram_segment DP — ties break toward the longer piece, decided
    // right to left), re-estimate Laplace-smoothed scores from usage
    // (hard EM), segment again. Gates the trained table's top UOUT
    // pieces by final usage. The oracle replays the DP by ENUMERATING
    // segmentations with a recursive CTE and sorting (total DESC,
    // length-string DESC) — the orders coincide by the
    // greedy-longest-suffix argument in duckUniCtes' doc. Corpus-scale
    // cost: ONE vocab hash-aggregate + one bounded substring explode;
    // every EM step touches only model-sized or vocab-sized frames.
    Q(
      "q_unigram_lm_train",
      s"""WITH RECURSIVE $duckUniCtes
        |SELECT rank, piece, cnt, logprob FROM (
        |  SELECT u2.piece, u2.cnt, CAST(s.lp AS DOUBLE) AS logprob,
        |    CAST(row_number() OVER (ORDER BY u2.cnt DESC, u2.piece) AS INT) AS rank
        |  FROM (
        |    SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
        |    FROM (SELECT unnest(pcs) AS piece, freq FROM seg2) GROUP BY 1) u2
        |  JOIN sc2 s USING (piece)
        |) WHERE rank <= $UOUT""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val (trained, sc2) = uniTrain(s, dir)
      // builder side of the uni_seg2 memo (the bpe_vocab protocol):
      // this query's bench time stays the honest full-EM cost
      val seg2 = graft.io.KernelMemo.rebuild(s, dir, "uni_seg2")(trained)
      val usage2 = seg2
        .select(explode(col("pcs")).as("piece"), col("freq"))
        .groupBy(col("piece")).agg(sum(col("freq")).cast("long").as("cnt"))
      val lpDf = sc2.map(r => (r._1, r._3.doubleValue)).toDF("piece", "logprob")
      usage2.join(broadcast(lpDf), "piece")
        .orderBy(col("cnt").desc, col("piece")).limit(UOUT)
        // rank re-derived over the bounded slice (the q_dsir_select rule)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("piece"))))
        .select(col("rank"), col("piece"), col("cnt"), col("logprob"))
    },

    // ---- BPE vs unigram-LM head-to-head -------------------------------------
    // The eval that actually picks a tokenizer: both trained encoders
    // over the same corpus, per-language token spend side by side
    // (tokens/word each, and the unigram/BPE token ratio — below 1.0
    // the unigram model compresses better on that language). Composes
    // the two REGISTERED encode queries (the q_tokenizer_fertility
    // pattern, twice) — the encoders under comparison are exactly the
    // shipped ones, nothing re-derived. Both restrict to the same
    // alpha-word set, so the doc frames join 1:1; all aggregates exact
    // integers, ratios single int/int double divisions.
    Q(
      "q_tokenizer_compare",
      s"""SELECT d.lang, count(*) AS n_docs,
        |  CAST(sum(b.n_words) AS BIGINT) AS n_words,
        |  CAST(sum(b.n_tokens) AS BIGINT) AS bpe_tokens,
        |  CAST(sum(u.n_pieces) AS BIGINT) AS uni_tokens,
        |  CAST(sum(b.n_tokens) AS DOUBLE) / CAST(sum(b.n_words) AS BIGINT) AS bpe_tokens_per_word,
        |  CAST(sum(u.n_pieces) AS DOUBLE) / CAST(sum(b.n_words) AS BIGINT) AS uni_tokens_per_word,
        |  CAST(sum(u.n_pieces) AS DOUBLE) / CAST(sum(b.n_tokens) AS BIGINT) AS uni_over_bpe
        |FROM ($duckEncodeOracle) b
        |JOIN (WITH RECURSIVE $duckUniCtes
        |      SELECT doc_id, CAST(sum(len(pcs)) AS BIGINT) AS n_pieces
        |      FROM (
        |        SELECT doc_id, lower(t) AS word
        |        FROM (SELECT doc_id, unnest($duckTokens) AS t FROM documents)
        |        WHERE regexp_matches(lower(t), '^[a-z]+$$'))
        |      JOIN (SELECT word, pcs FROM seg2) USING (word)
        |      GROUP BY doc_id) u USING (doc_id)
        |JOIN documents d USING (doc_id)
        |GROUP BY d.lang""".stripMargin) { (s, dir) =>
      val b = graft.SparkEntry.queries("q_bpe_encode")(s, dir)
        .select(col("doc_id"), col("n_words"), col("n_tokens"))
      val u = graft.SparkEntry.queries("q_unigram_encode")(s, dir)
        .select(col("doc_id"), col("n_pieces"))
      b.join(u, "doc_id")
        .join(Tables(s, dir, "documents").select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).cast("long").as("n_words"),
          sum(col("n_tokens")).cast("long").as("bpe_tokens"),
          sum(col("n_pieces")).cast("long").as("uni_tokens"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("bpe_tokens"),
          col("uni_tokens"),
          (col("bpe_tokens").cast("double") / col("n_words")).as("bpe_tokens_per_word"),
          (col("uni_tokens").cast("double") / col("n_words")).as("uni_tokens_per_word"),
          (col("uni_tokens").cast("double") / col("bpe_tokens")).as("uni_over_bpe"))
    },

    // ---- apply the trained unigram tokenizer to the corpus -----------------
    // Same shape as q_bpe_encode: the corpus joins the BOUNDED trained
    // (word -> piece count) table; the per-word DP cost was paid at
    // training time, the corpus pass is explode + join + groupBy.
    Q(
      "q_unigram_encode",
      s"""WITH RECURSIVE $duckUniCtes
        |SELECT doc_id, count(*) AS n_words,
        |  CAST(sum(np) AS BIGINT) AS n_pieces,
        |  CAST(sum(length(word)) AS BIGINT) AS n_chars
        |FROM (
        |  SELECT doc_id, lower(t) AS word
        |  FROM (SELECT doc_id, unnest($duckTokens) AS t FROM documents)
        |  WHERE regexp_matches(lower(t), '^[a-z]+$$'))
        |JOIN (SELECT word, len(pcs) AS np FROM seg2) USING (word)
        |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val seg2 = graft.io.KernelMemo.reuse(s, dir, "uni_seg2")(uniTrain(s, dir)._1)
      val np = seg2.select(col("word"), expr("size(pcs)").as("np"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(expr(tokens)).as("t"))
        .select(col("doc_id"), lower(col("t")).as("word"))
        .filter(expr("word rlike '^[a-z]+$'"))
        .join(np, Seq("word"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_words"),
          sum(col("np")).cast("long").as("n_pieces"),
          sum(length(col("word"))).cast("long").as("n_chars"))
    })
}
