package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, explode, expr, max, min, split, struct, trim, xxhash64}
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams
import graft.streaming.Streams.{Event, Session}

/** Structured Streaming specs driven by MemoryStream: windowed agg
  * emission under watermark advance, and sessionization equivalence with
  * the batch q_sessionize logic. */
class StreamingSpec extends SparkSpec {

  // day-1 offset: an event exactly at the initial watermark (epoch 0)
  // is treated as late and dropped, so keep test times off epoch
  private def ts(minutes: Long): Timestamp = new Timestamp((1440 + minutes) * 60000L)

  test("idempotentSink: foreachBatch upsert survives a replayed micro-batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-fb").toString
    val mem = MemoryStream[Event]
    val q = Streams.idempotentSink(mem.toDF(), s"$base/out", s"$base/ckpt")
    try {
      // batch 0: a duplicate event_id inside the batch merges to the
      // earliest-ts row
      mem.addData(
        Event(1, ts(5), 1, "click", 1.5),
        Event(1, ts(9), 7, "view", 9.9),
        Event(2, ts(20), 2, "click", 2.5))
      q.processAllAvailable()
      // batch 1: new keys land in their own partition; a pair sharing
      // (event_id, ts) must resolve by the lexicographic total order,
      // not an arbitrary min_by tie-break
      mem.addData(
        Event(3, ts(70), 1, "view", 3.0),
        Event(4, ts(80), 9, "b", 2.0),
        Event(4, ts(80), 3, "a", 1.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
      assert(out.count() == 4)
      assert(out.filter(col("event_id") === 1).select("user_id", "value")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 1.5)))
      assert(out.filter(col("event_id") === 4).select("user_id", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((3L, "a")))
      // crash replay: the SAME batch delivered again must overwrite its
      // own partition, not double-append
      val replay = Seq(
        Event(1, ts(5), 1, "click", 1.5),
        Event(1, ts(9), 7, "view", 9.9),
        Event(2, ts(20), 2, "click", 2.5)).toDF()
      Streams.upsertBatch(replay, 0L, s"$base/out")
      val after = spark.read.parquet(s"$base/out")
      assert(after.count() == 4, "replayed batch must be idempotent")
      assert(after.filter(col("batch_id") === 1).count() == 2,
        "dynamic overwrite must not touch other batches' partitions")
    } finally q.stop()
  }

  test("keyedView + compact: a key updated across batches lands exactly once, through crash-replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-kv").toString
    val mem = MemoryStream[Event]
    val q = Streams.idempotentSink(mem.toDF(), s"$base/out", s"$base/ckpt")
    try {
      // batch 0: keys 1 and 2
      mem.addData(Event(1, ts(5), 1, "click", 1.5), Event(2, ts(20), 2, "click", 2.5))
      q.processAllAvailable()
      // batch 1: key 1 REDELIVERED with an updated value + new key 3
      mem.addData(Event(1, ts(50), 1, "update", 7.5), Event(3, ts(70), 3, "view", 3.0))
      q.processAllAvailable()
      // physically two rows for key 1 (one per batch partition)...
      assert(spark.read.parquet(s"$base/out").filter(col("event_id") === 1).count() == 2)
      // ...but the keyed view collapses to the LATEST batch's row
      def viewRows() = Streams.keyedView(spark, s"$base/out")
        .collect().map(r => (r.getLong(0), r.getString(3), r.getDouble(4))).sortBy(_._1).toSeq
      val expected = Seq((1L, "update", 7.5), (2L, "click", 2.5), (3L, "view", 3.0))
      assert(viewRows() == expected)
      // crash replay of batch 1 (its key also lives in batch 0): the
      // partition overwrites itself, the view still yields ONE row per
      // key with the batch-1 value
      val replay = Seq(
        Event(1, ts(50), 1, "update", 7.5), Event(3, ts(70), 3, "view", 3.0)).toDF()
      Streams.upsertBatch(replay, 1L, s"$base/out")
      assert(viewRows() == expected, "replayed batch must not duplicate or regress keys")
      // compaction folds both partitions into batch_id=1 and prunes the
      // old one; the view is unchanged
      Streams.compact(spark, s"$base/out", 1L)
      val dirs = new java.io.File(s"$base/out").listFiles()
        .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted.toSeq
      assert(dirs == Seq("batch_id=1"), s"stale partitions must be pruned: $dirs")
      assert(viewRows() == expected, "compaction must preserve the keyed view")
      // a LATER batch keeps winning over the compacted partition
      mem.addData(Event(1, ts(90), 1, "final", 9.0))
      q.processAllAvailable()
      assert(viewRows() == Seq((1L, "final", 9.0), (2L, "click", 2.5), (3L, "view", 3.0)))
    } finally q.stop()
  }

  test("windowedAgg: tumbling hourly counts emitted after watermark passes") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val query = Streams.windowedAgg(mem.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // two events in hour 0, one in hour 1; then advance watermark far
      mem.addData(
        Event(1, ts(5), 1, "click", 1.5),
        Event(2, ts(20), 2, "click", 2.5),
        Event(3, ts(70), 1, "view", 3.0))
      query.processAllAvailable()
      mem.addData(Event(4, ts(500), 9, "view", 0.0)) // watermark -> 500m-120m
      query.processAllAvailable()
      val rows = spark.table("win_out")
        .selectExpr("cast(hour as long) h", "event_type", "cnt", "cast(sum_value as string)")
        .collect().map(r => (r.getLong(0) / 3600 - 24, r.getString(1), r.getLong(2), r.getString(3)))
        .toSet
      assert(rows.contains((0L, "click", 2L, "4.00")))
      assert(rows.contains((1L, "view", 1L, "3.00")))
    } finally query.stop()
  }

  test("sessionize: 30-min gap closes sessions; counts/sums match batch rule") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val query = Streams.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: events at 0,10,20 (one session), then 60 (new session)
      mem.addData(
        Event(1, ts(0), 1, "c", 1.0),
        Event(2, ts(10), 1, "c", 2.0),
        Event(3, ts(20), 1, "c", 3.0),
        Event(4, ts(60), 1, "c", 4.0))
      query.processAllAvailable()
      // advance watermark way past all timeouts to flush state
      mem.addData(Event(99, ts(10000), 2, "c", 0.0))
      query.processAllAvailable()
      val sessions = spark.table("sess_out").as[Session].collect()
        .filter(_.user_id == 1).sortBy(_.session_start.getTime)
      assert(sessions.length == 2)
      assert(sessions(0).n_events == 3 && sessions(0).sum_value == 6.0)
      assert(sessions(0).session_start == ts(0) && sessions(0).session_end == ts(20))
      assert(sessions(1).n_events == 1 && sessions(1).sum_value == 4.0)
    } finally query.stop()
  }

  test("session_window builtin: native gap sessions agree with sessionize") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val query = Streams.sessionWindowAgg(mem.toDF())
      .writeStream.format("memory").queryName("sw_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "c", 1.0),
        Event(2, ts(10), 1, "c", 2.0),
        Event(3, ts(20), 1, "c", 3.0),
        Event(4, ts(60), 1, "c", 4.0))
      query.processAllAvailable()
      mem.addData(Event(99, ts(10000), 2, "c", 0.0)) // flush watermark
      query.processAllAvailable()
      val rows = spark.table("sw_out")
        .filter($"user_id" === 1).orderBy($"session_start")
        .selectExpr("session_start", "session_end", "n_events", "cast(sum_value as string)")
        .collect()
      assert(rows.length == 2)
      // window end is exclusive: last event + 30-min gap
      assert(rows(0).getTimestamp(0) == ts(0) && rows(0).getTimestamp(1) == ts(50))
      assert(rows(0).getLong(2) == 3 && rows(0).getString(3) == "6.00")
      assert(rows(1).getTimestamp(0) == ts(60) && rows(1).getLong(2) == 1)
    } finally query.stop()
  }

  test("dedup drops duplicate event_ids within the watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = Streams.dedup(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "c", 1.0),
        Event(1, ts(0), 1, "c", 1.0), // exact dup, same batch
        Event(2, ts(1), 1, "c", 2.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(2), 1, "c", 1.0)) // dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(1L, 2L)))
    } finally q.stop()
  }

  test("stream-stream join pairs clicks with purchases within the hour") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = Streams.clickToPurchase(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(Event(1, ts(0), 1, "click", 0), Event(2, ts(10), 2, "click", 0))
      purchases.addData(
        Event(10, ts(30), 1, "purchase", 9.99), // 30 min after click 1 -> match
        Event(11, ts(90), 2, "purchase", 5.0)) // 80 min after click 2 -> no match
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 10L)))
    } finally q.stop()
  }

  test("outer stream-stream join emits non-converting clicks after eviction") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = Streams.clickToPurchaseOuter(clicks.toDF(), purchases.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("ss_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(Event(1, ts(0), 1, "click", 0), Event(2, ts(10), 2, "click", 0))
      purchases.addData(Event(10, ts(30), 1, "purchase", 9.99)) // matches click 1
      q.processAllAvailable()
      // push the GLOBAL watermark (min of both inputs) past click 2's
      // match-window end (t+70min) + the 10-min horizon: only then can
      // the engine PROVE no purchase will ever pair with it and emit
      // the null row from evicted state
      clicks.addData(Event(3, ts(300), 9, "click", 0))
      purchases.addData(Event(11, ts(300), 9, "noise", 0))
      q.processAllAvailable()
      val rows = spark.table("ss_outer")
        .selectExpr("click_id", "coalesce(purchase_id, -1)").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.contains((1L, 10L)), s"converting click lost: $rows")
      assert(rows.contains((2L, -1L)), s"non-converting click never emitted: $rows")
    } finally q.stop()
  }

  test("enrichStatic: stream-static broadcast join, stateless, batch-equivalent") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[Event]
    val query = Streams.enrichStatic(mem.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "c", 1.0),
        Event(2, ts(1), 2, "c", 2.0),
        Event(3, ts(2), 9, "c", 3.0)) // no dim row -> tier null
      query.processAllAvailable()
      val rows = spark.table("enrich_out")
        .selectExpr("event_id", "coalesce(tier, '-')").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((1L, "gold"), (2L, "silver"), (3L, "-")))
    } finally query.stop()
  }

  test("decontaminate: stateless 5-gram gate drops eval-overlapping docs") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val evalText = "alpha beta gamma delta epsilon zeta"
    // eval 5-gram shingles, computed with the same expression batch-side
    val evalShingles = Seq(evalText).toDF("text")
      .selectExpr("explode(shingles(split(trim(text), '\\\\s+'), 5)) s")
      .collect().map(_.getString(0)).toSeq
    val mem = MemoryStream[(Long, String)]
    val query = Streams.decontaminate(
      mem.toDF().toDF("doc_id", "text"), evalShingles)
      .writeStream.format("memory").queryName("decon_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, "alpha beta gamma delta epsilon tail words"), // shares a 5-gram
        (2L, "completely different words in this one here"),
        (3L, "short doc")) // under 5 tokens -> kept
      query.processAllAvailable()
      mem.addData((4L, null.asInstanceOf[String])) // NULL text -> kept, not dropped
      query.processAllAvailable()
      val kept = spark.table("decon_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(2L, 3L, 4L))
    } finally query.stop()
  }

  test("transformWithState runningStats: per-user ValueState across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val q = Streams.runningStats(mem.toDS())
      .writeStream.format("memory").queryName("tws_out")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(Event(1, ts(0), 1, "c", 1.0), Event(2, ts(1), 1, "c", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(2), 1, "c", 4.0), Event(4, ts(2), 2, "c", 10.0))
      q.processAllAvailable()
      // Update mode: latest row per user carries the running totals
      val last = spark.table("tws_out").groupBy("user_id")
        .agg(max(struct($"n_events", $"sum_value")).as("m"))
        .select($"user_id", $"m.n_events", $"m.sum_value")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(last(1L) == ((3L, 7.0)))
      assert(last(2L) == ((1L, 10.0)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("hotTokens: sharded streaming MG keeps the per-shard guarantee across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val k = 4
    val mem = MemoryStream[String]
    // foreachBatch collector: the memory sink in Update mode accumulates
    // every batch's re-emission, which would let a token evicted by the
    // final batch pass the "final summary" assertions on its stale row
    val perBatch = new java.util.concurrent.ConcurrentHashMap[Long, Array[Streams.HotToken]]()
    val q = Streams.hotTokens(mem.toDF().withColumnRenamed("value", "text"), k = k)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Streams.HotToken], id: Long) =>
        perBatch.put(id, df.collect()); ()
      }
      .outputMode(OutputMode.Update()).start()
    try {
      // two batches; the hot token repeats far past any shard's n/(k+1)
      val batch1 = Seq("hot hot hot cold t1 t2 t3", "hot hot t4 t5 t6 t7")
      val batch2 = Seq("hot hot hot hot t8 t9 t10 t11 t12", "hot cold t13")
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val lastId = perBatch.keySet().toArray(Array.empty[java.lang.Long]).map(_.longValue).max
      val finalRows = perBatch.get(lastId)
      // exact shard assignment + counts over the WHOLE stream, computed
      // with the same xxhash64 expression the operator uses
      val exact = (batch1 ++ batch2).toDF("text")
        .select(explode(split(trim(col("text")), "\\s+")).as("t"))
        .select((((xxhash64(col("t")) % 8) + 8) % 8).cast("int").as("shard"), col("t"))
        .groupBy("shard", "t").count()
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
      val shardTotals = exact.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
      // per-shard MG guarantee on the cumulative stream: freq > n_s/(k+1)
      // must be present in that shard's FINAL summary. A shard silent in
      // the final batch keeps its previous summary — fall back to its
      // latest emission.
      val latestByShard: Map[Int, Array[Streams.HotToken]] =
        perBatch.entrySet().toArray(Array.empty[java.util.Map.Entry[Long, Array[Streams.HotToken]]])
          .sortBy(_.getKey)
          .flatMap(e => e.getValue.groupBy(_.shard).toSeq)
          .groupBy(_._1).map { case (s, vs) => s -> vs.last._2 }
      for (((s, t), c) <- exact if c * (k + 1) > shardTotals(s))
        assert(latestByShard(s).exists(_.t == t), s"hot token $t missing from shard $s")
      // lower-bound property on the final-batch weights vs true counts
      for (h <- finalRows)
        assert(h.lb <= exact((h.shard, h.t)), s"weight ${h.lb} exceeds true count for ${h.t}")
      // the hot token must be found (sanity: the generator made it hot)
      assert(latestByShard.values.flatten.exists(_.t == "hot"))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("dedupThenWindow: two stateful operators chained in one query") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = Streams.dedupThenWindow(mem.toDF())
      .writeStream.format("memory").queryName("chain_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(1, ts(5), 1, "click", 1.0), // dup dropped before the window agg
        Event(2, ts(20), 2, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(9, ts(10000), 9, "view", 0.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("chain_out")
        .filter($"event_type" === "click")
        .select($"cnt", $"sum_value".cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.sameElements(Array((2L, "3.00"))), rows.mkString(","))
    } finally q.stop()
  }

  test("nearDedup: LSH band claims flag near-dups across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val q = Streams.nearDedup(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again today"
      mem.addData(
        (1L, base),
        (3L, "completely different words about parquet shuffles and broadcast joins here"))
      q.processAllAvailable()
      // batch 2: doc 7 is a light edit of doc 1 (shares most shingles)
      mem.addData((7L, base + " ok"))
      q.processAllAvailable()
      val claims = spark.table("neardup_out").as[Streams.BandClaim].collect()
      def dupOfOther(id: Long) =
        claims.filter(_.doc_id == id).exists(c => c.keeper_id != id)
      assert(!dupOfOther(1L), "first doc must keep all its buckets")
      assert(!dupOfOther(3L), "unrelated doc must not be flagged")
      assert(dupOfOther(7L), "near-identical doc must hit an earlier keeper's bucket")
      assert(claims.filter(_.doc_id == 7L).exists(_.keeper_id == 1L))
    } finally q.stop()
  }

  test("semanticDedup: cell exemplars flag embedding near-dups across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def vec(hot: Int, eps: Float = 0f): Seq[Float] = {
      val a = Array.fill(64)(0f)
      a(hot) = 1f
      if (eps != 0f) a((hot + 1) % 64) = eps
      a.toSeq
    }
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = Streams.semanticDedup(mem.toDF().toDF("vec_id", "embedding"), bits = 4)
      .writeStream.format("memory").queryName("semdedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: an exemplar and an orthogonal vector (dot = 0 < 0.35)
      mem.addData((1L, vec(0)), (3L, vec(7)))
      q.processAllAvailable()
      // batch 2: a light perturbation of vec 1 — dot ≈ 1 ≥ 0.35, and the
      // tiny epsilon cannot flip any 64-term plane sum's sign, so it
      // lands in exemplar 1's cell and must claim it ACROSS batches
      mem.addData((7L, vec(0, eps = 0.01f)))
      q.processAllAvailable()
      val claims = spark.table("semdedup_out").as[Streams.CellClaim].collect()
      val byId = claims.map(c => c.vec_id -> c).toMap
      assert(byId(1L).keeper_id == 1L, "first arrival is its cell's exemplar")
      assert(byId(3L).keeper_id == 3L, "dissimilar vector must become its own exemplar")
      assert(byId(7L).keeper_id == 1L, "near-dup must claim the cross-batch exemplar")
      assert(byId(7L).dot >= 0.35 && byId(7L).dot <= 1.01)
    } finally q.stop()
  }

  test("semanticDedup contract: exemplar state is permanent — bits picks the horizon, not time") {
    // VERDICT r19 #6, closed by CONTRACT: semanticDedup's state is the
    // exemplar set (a MODEL), not a claim ledger — evicting an exemplar
    // would change the ANSWER (a later near-dup would mint a fresh
    // exemplar instead of claiming the original), not just bound
    // memory. So unlike the claim folds (firstClaimHorizon, where state
    // expires at claimTime + horizon), exemplars live forever
    // (GroupStateTimeout.NoTimeout) and the dedup horizon is picked by
    // `bits` — cell geometry: more planes, smaller cells, shorter
    // exemplar lists. This pins the design: an exemplar from batch 1
    // must still win arbitrarily many batches later.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def vec(hot: Int, eps: Float = 0f): Seq[Float] = {
      val a = Array.fill(64)(0f)
      a(hot) = 1f
      if (eps != 0f) a((hot + 1) % 64) = eps
      a.toSeq
    }
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = Streams.semanticDedup(mem.toDF().toDF("vec_id", "embedding"), bits = 4)
      .writeStream.format("memory").queryName("semdedup_contract")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, vec(0)))
      q.processAllAvailable()
      // six intervening batches of unrelated traffic (orthogonal hots)
      (1 to 6).foreach { b =>
        mem.addData((100L + b, vec(8 + b)))
        q.processAllAvailable()
      }
      // a near-dup of the batch-1 exemplar arrives long after: the
      // ORIGINAL exemplar claims it — no TTL ever fires on model state
      mem.addData((999L, vec(0, eps = 0.01f)))
      q.processAllAvailable()
      val byId = spark.table("semdedup_contract").as[Streams.CellClaim]
        .collect().map(c => c.vec_id -> c).toMap
      assert(byId(999L).cell == byId(1L).cell,
        "the epsilon perturbation must not flip any plane sign")
      assert(byId(999L).keeper_id == 1L,
        "exemplar state must survive arbitrarily many batches — " +
          "bits, not time, is semanticDedup's dedup horizon")
    } finally q.stop()
  }

  test("mediaDedup batch-twin: streaming claims equal the batch ball-candidate loser set") {
    // the q_media_dedup candidate tier run incrementally over the REAL
    // media corpus (genuine PNG/container payloads, real decode in the
    // stream): an item is a streaming candidate iff an earlier item
    // claimed one of its 57 hamming-ball probe keys — with key-order
    // arrival that is exactly "some item with a lower ikey sits at
    // hamming <= 2 (or equal hash)"
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val media = graft.multimodal.Media.synthesize(spark, sf())
      .collect().sortBy(_.media_id)
    val mem = MemoryStream[graft.multimodal.Media.MediaRecord]
    val q = Streams.mediaDedup(mem.toDS())
      .writeStream.format("memory").queryName("mediadedup_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = media.splitAt(media.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val claims = spark.table("mediadedup_twin").as[Streams.ItemClaim].collect()
      val streamingDups =
        claims.filter(c => c.keeper_key != c.item_key).map(_.item_key).toSet
      val buckets = graft.multimodal.Media
        .dHashItems(graft.multimodal.Media.synthesize(spark, sf()))
        .selectExpr(s"${graft.multimodal.Media.ikeySql} AS ikey", "dhash")
        .select(col("ikey"), col("dhash"),
          org.apache.spark.sql.functions.explode(expr("sequence(0, 56)")).as("b"))
        .selectExpr("ikey", s"${graft.multimodal.Media.BALL_FLIP_SQL} AS bucket")
      val batchDups = buckets.groupBy(col("bucket")).agg(min(col("ikey")).as("mk"))
        .join(buckets, Seq("bucket"))
        .filter(col("ikey") > col("mk"))
        .select(col("ikey")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(batchDups.nonEmpty, "corpus must contain ball-probe media candidates")
      assert(streamingDups == batchDups,
        s"stream-only: ${(streamingDups -- batchDups).toSeq.sorted.take(5)}, " +
        s"batch-only: ${(batchDups -- streamingDups).toSeq.sorted.take(5)}")
    } finally q.stop()
  }

  test("nearDedup batch-twin: streaming dup set equals the batch band-candidate loser set") {
    // VERDICT r11 #7: not just internal consistency — the streaming
    // operator fed the REAL corpus slice in id order must reproduce the
    // batch kernel's answer. A doc is a streaming near-dup candidate
    // iff an earlier doc claimed one of its band buckets; with id-order
    // arrival that is exactly "d appears as id_b of a batch band-blocked
    // candidate pair" (same shingles, signatures and band slots — the
    // bucket key hash differs but partitions identically).
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = graft.io.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = Streams.nearDedup(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("neardup_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val claims = spark.table("neardup_twin").as[Streams.BandClaim].collect()
      val streamingDups = claims.filter(c => c.keeper_id != c.doc_id).map(_.doc_id).toSet
      val batchDups = graft.queries.Dedup.minhashCandidates(spark, sf())._3
        .select(col("id_b")).distinct().collect().map(_.getLong(0)).toSet
      graft.io.CacheScope.releaseAll()
      assert(streamingDups == batchDups,
        s"stream-only: ${(streamingDups -- batchDups).toSeq.sorted.take(5)}, " +
        s"batch-only: ${(batchDups -- streamingDups).toSeq.sorted.take(5)}")
      assert(batchDups.nonEmpty, "corpus must contain banded near-dup candidates")
    } finally q.stop()
  }

  test("claim protocol: a lower id arriving LATER is a loser, never a keeper steal") {
    // round-17 review finding: with the old fold, a lower doc_id in a
    // later micro-batch replaced the stored keeper and claimed itself —
    // Append mode cannot re-emit the earlier doc's claims, so a true
    // duplicate pair ended with NEITHER side flagged. The shared
    // firstClaim fold pins first-ARRIVAL-wins: the stored keeper never
    // changes, so the late arrival is flagged as its loser. Gate both
    // text claim tiers (mediaDedup shares the same fold).
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    for ((name, mk) <- Seq[(String,
        org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[Streams.BandClaim])](
        ("neardup_ooo", df => Streams.nearDedup(df)),
        ("simblocks_ooo", df => Streams.simhashBlocksDedup(df, bB = 10)))) {
      val mem = MemoryStream[(Long, String)]
      val q = mk(mem.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData((100L, text)); q.processAllAvailable()
        mem.addData((5L, text)); q.processAllAvailable() // identical doc, LOWER id, later batch
        val claims = spark.table(name).as[Streams.BandClaim].collect()
        assert(claims.filter(_.doc_id == 100L).forall(_.keeper_id == 100L),
          s"$name: the first arrival must have claimed every bucket")
        assert(claims.filter(_.doc_id == 5L).forall(_.keeper_id == 100L),
          s"$name: the late lower id must lose to the stored keeper, not steal it")
      } finally q.stop()
    }
  }

  test("mediaDedup two-level claims: exact dups probe once, out-of-order stays first-arrival-wins") {
    // the two-level tier's contracts: (1) a later exact-dup item emits
    // ONE raw-hash probe claim (not 57) and loses to the stored first
    // arrival; (2) a LOWER item key arriving later is still a loser
    // (the firstClaim protocol holds through stage 1's collapse)
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val sample = graft.multimodal.Media.synthesize(spark, sf())
      .filter(col("kind") === "image").as[graft.multimodal.Media.MediaRecord]
      .head()
    val hi = sample.copy(media_id = 100L)
    val lo = sample.copy(media_id = 5L) // identical payload -> identical dhash
    val ikeys = graft.multimodal.Media
      .dHashItems(spark.createDataset(Seq(hi, lo)))
      .selectExpr("media_id", s"${graft.multimodal.Media.ikeySql} AS ikey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mem = MemoryStream[graft.multimodal.Media.MediaRecord]
    val q = Streams.mediaDedup(mem.toDS())
      .writeStream.format("memory").queryName("media_two_level")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(hi); q.processAllAvailable()
      mem.addData(lo); q.processAllAvailable() // same payload, LOWER key, later batch
      val claims = spark.table("media_two_level").as[Streams.ItemClaim].collect()
      val hiClaims = claims.filter(_.item_key == ikeys(100L))
      val loClaims = claims.filter(_.item_key == ikeys(5L))
      assert(hiClaims.length == 57 && hiClaims.forall(_.keeper_key == ikeys(100L)),
        "the first arrival must fan out all 57 ball claims and keep them")
      assert(loClaims.length == 1,
        s"a later exact dup must emit ONE probe claim, got ${loClaims.length}")
      assert(loClaims.head.keeper_key == ikeys(100L),
        "the late lower key must lose to the stored first arrival")
    } finally q.stop()
  }

  test("simhashBlocksDedup batch-twin: streaming dup set equals the batch masked-key loser set") {
    // the exact-recall twin of the nearDedup gate (round 17): a doc is
    // a streaming candidate iff an earlier doc claimed one of its
    // C(B,5) block-combination keys; with id-order arrival that is
    // exactly "an earlier doc's simhash agrees on some mask" — the
    // q_dedup_simhash_blocks candidate tier (the streaming key is a
    // 64-bit mix of (mask index, masked signature), which partitions
    // identically to the batch join's (mask, bkey) pair)
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = graft.io.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = Streams.simhashBlocksDedup(mem.toDF().toDF("doc_id", "text"), bB = 10)
      .writeStream.format("memory").queryName("simblocks_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val claims = spark.table("simblocks_twin").as[Streams.BandClaim].collect()
      assert(claims.length == docs.length * 252, "C(10,5) claims per doc")
      val streamingDups = claims.filter(c => c.keeper_id != c.doc_id).map(_.doc_id).toSet
      // batch reference: the q_dedup_simhash_blocks candidate tier at
      // doc granularity — an earlier doc shares some masked key
      graft.functions.GraftRuntime.ensure(spark)
      val sim = graft.io.Tables(spark, sf(), "documents")
        .select(col("doc_id"), explode(expr("split(trim(text), '\\\\s+')")).as("t"))
        .select(col("doc_id"), expr(graft.functions.CrossHash.h("t")).as("v"))
        .groupBy(col("doc_id"))
        .agg(expr("simhash_agg(v)").as("simhash"))
      val masksDf = graft.functions.SimhashBlockKeys.masks(10).toSeq.toDF("mask")
      val probes = sim.crossJoin(org.apache.spark.sql.functions.broadcast(masksDf))
        .select(col("doc_id"), col("mask"), expr("simhash & mask").as("bkey"))
      val batchDups = probes.as("a")
        .join(probes.as("b"),
          expr("a.mask = b.mask and a.bkey = b.bkey and a.doc_id < b.doc_id"))
        .select(col("b.doc_id")).distinct().collect().map(_.getLong(0)).toSet
      assert(streamingDups == batchDups,
        s"stream-only: ${(streamingDups -- batchDups).toSeq.sorted.take(5)}, " +
        s"batch-only: ${(batchDups -- streamingDups).toSeq.sorted.take(5)}")
      assert(batchDups.nonEmpty, "corpus must contain masked-key candidates")
    } finally q.stop()
  }

  test("url_filter batch-twin: streaming keeps and stamped norms equal the batch gate") {
    // the stateless URL tier (round 19): the stream must reproduce the
    // batch q_url_filter verdicts and the normalized keys exactly —
    // same parse, same blocklist, same precedence
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val batch = graft.queries.Url.urlGate(spark, sf())
      .select(col("doc_id"), col("url"), col("norm"), col("verdict"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val mem = MemoryStream[(Long, String)]
    val q = Streams.urlFilter(mem.toDF().toDF("doc_id", "url"),
        graft.queries.Url.blocklistFrame(spark, sf()),
        graft.queries.Url.blocklistRows(spark, sf()))
      .select(col("doc_id"), col("norm"))
      .writeStream.format("memory").queryName("urlfilter_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = batch.map(r => (r._1, r._2)).splitAt(batch.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val streamed = spark.table("urlfilter_twin")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val batchKeeps = batch.filter(_._4 == "keep").map(r => r._1 -> r._3).toMap
      assert(batchKeeps.nonEmpty && batchKeeps.size < batch.length,
        "the gate must both keep and drop on this corpus")
      assert(streamed == batchKeeps,
        s"stream-only: ${(streamed.keySet -- batchKeeps.keySet).toSeq.sorted.take(5)}, " +
        s"batch-only: ${(batchKeeps.keySet -- streamed.keySet).toSeq.sorted.take(5)}")
    } finally q.stop()
  }

  test("url_filter bloom arm batch-twin: forced budget 0 keeps the identical set") {
    // VERDICT r19 #3: the bloom is a PREFILTER, never a verdict — the
    // scale branch (blocklist past the row budget) must keep exactly
    // the broadcast branch's rows, in streaming too
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val batch = graft.queries.Url.urlGate(spark, sf())
      .select(col("doc_id"), col("url"), col("verdict"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val mem = MemoryStream[(Long, String)]
    val q = Streams.urlFilter(mem.toDF().toDF("doc_id", "url"),
        graft.queries.Url.blocklistFrame(spark, sf()),
        graft.queries.Url.blocklistRows(spark, sf()), rowBudget = 0L)
      .select(col("doc_id"))
      .writeStream.format("memory").queryName("urlfilter_bloom_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batch.map(r => (r._1, r._2)).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("urlfilter_bloom_twin")
        .collect().map(_.getLong(0)).toSet
      val batchKeeps = batch.filter(_._3 == "keep").map(_._1).toSet
      assert(streamed == batchKeeps,
        s"stream-only: ${(streamed -- batchKeeps).toSeq.sorted.take(5)}, " +
        s"batch-only: ${(batchKeeps -- streamed).toSeq.sorted.take(5)}")
    } finally q.stop()
  }

  test("url_dedup batch-twin: streaming losers equal q_url_dedup's df>=2 losers") {
    // round 20 (VERDICT r19 #2): the claim tier and the batch query
    // share ONE normalization (Url.parseNorm), so feeding the gate
    // survivors in id order must flag exactly the batch loser set
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val keeps = graft.queries.Url.urlGate(spark, sf())
      .filter(col("verdict") === "keep")
      .select(col("doc_id"), col("url"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = Streams.urlDedup(mem.toDF().toDF("doc_id", "url"))
      .writeStream.format("memory").queryName("urldedup_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = keeps.splitAt(keeps.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val claims = spark.table("urldedup_twin").as[Streams.BandClaim].collect()
      val streamLosers = claims.filter(c => c.keeper_id != c.doc_id).map(_.doc_id).toSet
      val batch = SparkEntry.queries("q_url_dedup")(spark, sf())
        .select(col("doc_id"), col("keep_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      graft.io.CacheScope.releaseAll()
      val batchLosers = batch.filter(r => r._1 != r._2).map(_._1).toSet
      assert(batchLosers.nonEmpty, "the derived URL corpus must contain refetches")
      assert(streamLosers == batchLosers,
        s"stream-only: ${(streamLosers -- batchLosers).toSeq.sorted.take(5)}, " +
        s"batch-only: ${(batchLosers -- streamLosers).toSeq.sorted.take(5)}")
    } finally q.stop()
  }

  test("url_dedup out-of-order: a later lower id is a loser, never a keeper steal") {
    // first-arrival-wins (the shared firstClaim fold): both urls
    // normalize to site.example.com/p/1, the higher id arrives first
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val q = Streams.urlDedup(mem.toDF().toDF("doc_id", "url"))
      .writeStream.format("memory").queryName("urldedup_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((200L, "https://www.Site.example.com/p/1")); q.processAllAvailable()
      mem.addData((7L, "http://site.example.com:80/p/1#frag")); q.processAllAvailable()
      val claims = spark.table("urldedup_ooo").as[Streams.BandClaim].collect()
      assert(claims.length == 2 && claims.map(_.bucket).distinct.length == 1,
        "mirror/port/fragment variants must share one normalized claim key")
      assert(claims.forall(_.keeper_id == 200L),
        "the stored keeper must never be stolen by a later lower id")
    } finally q.stop()
  }

  test("url_dedup horizon: a refetch past the horizon is admitted once per window") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.urlDedup(
        mem.toDF().toDF("doc_id", "url", "ts"),
        horizonMs = Some(60L * 60000))
      .writeStream.format("memory").queryName("urldedup_hz")
      .outputMode(OutputMode.Append()).start()
    try {
      val u = "https://site.example.com/p/1"
      mem.addData((100L, u, ts(0))); q.processAllAvailable()
      // within the horizon: the refetch loses
      mem.addData((150L, u, ts(30))); q.processAllAvailable()
      // advance the watermark past the horizon with a different url
      mem.addData((300L, "https://other.example.com/p/9", ts(180)))
      q.processAllAvailable()
      // past the horizon: the same url claims fresh
      mem.addData((7L, u, ts(185))); q.processAllAvailable()
      val claims = spark.table("urldedup_hz").as[Streams.BandClaim].collect()
      assert(claims.find(_.doc_id == 150L).get.keeper_id == 100L)
      assert(claims.find(_.doc_id == 7L).get.keeper_id == 7L,
        "an expired url claim must be re-admitted as a fresh keeper")
    } finally q.stop()
  }

  test("dedup horizon: within-horizon batch-twin unchanged (nearDedup)") {
    // VERDICT r18 #1, done-criterion (a): with every arrival inside the
    // horizon, the horizoned fold must reproduce the unbounded fold —
    // i.e. the batch band-candidate loser set — exactly
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = graft.io.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.nearDedup(
        mem.toDF().toDF("doc_id", "text", "ts"),
        horizonMs = Some(10L * 24 * 3600 * 1000))
      .writeStream.format("memory").queryName("neardup_hz_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      mem.addData(b1.map { case (id, t) => (id, t, ts(0)) }.toSeq: _*)
      q.processAllAvailable()
      mem.addData(b2.map { case (id, t) => (id, t, ts(1)) }.toSeq: _*)
      q.processAllAvailable()
      val claims = spark.table("neardup_hz_twin").as[Streams.BandClaim].collect()
      val streamingDups = claims.filter(c => c.keeper_id != c.doc_id).map(_.doc_id).toSet
      val batchDups = graft.queries.Dedup.minhashCandidates(spark, sf())._3
        .select(col("id_b")).distinct().collect().map(_.getLong(0)).toSet
      graft.io.CacheScope.releaseAll()
      assert(batchDups.nonEmpty, "corpus must contain banded near-dup candidates")
      assert(streamingDups == batchDups,
        s"stream-only: ${(streamingDups -- batchDups).toSeq.sorted.take(5)}, " +
        s"batch-only: ${(batchDups -- streamingDups).toSeq.sorted.take(5)}")
    } finally q.stop()
  }

  test("dedup horizon: out-of-horizon duplicate admitted once; state stays bounded") {
    // done-criteria (b): a duplicate arriving past the horizon claims
    // itself (admitted exactly once — no stale keeper flags it), and
    // the state store holds only the horizon's live buckets (the
    // timed-out buckets are GC'd), asserted on state-store metrics
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "unrelated words about broadcast joins and shuffle partitions mostly"
    val third = "third corpus chunk speaking of parquet footers and column chunks"
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.nearDedup(
        mem.toDF().toDF("doc_id", "text", "ts"),
        horizonMs = Some(60L * 60000)) // 1 hour
      .writeStream.format("memory").queryName("neardup_hz_evict")
      .outputMode(OutputMode.Append()).start()
    def stateRows: Long =
      q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
    try {
      mem.addData((100L, text, ts(0))); q.processAllAvailable()
      // watermark jumps 3 h past doc 100's claims (horizon 1 h)
      mem.addData((200L, other, ts(180))); q.processAllAvailable()
      // doc 100's 4 buckets time out HERE (no data for them this batch)
      mem.addData((300L, third, ts(190))); q.processAllAvailable()
      assert(stateRows == 8L,
        s"expired buckets must be GC'd: want 4+4 live bucket rows, got $stateRows")
      // the out-of-horizon duplicate: same text as doc 100, 3+ h later
      mem.addData((7L, text, ts(195))); q.processAllAvailable()
      val claims = spark.table("neardup_hz_evict").as[Streams.BandClaim].collect()
      assert(claims.filter(_.doc_id == 7L).forall(_.keeper_id == 7L),
        "a duplicate past the horizon must be admitted as a fresh keeper")
      assert(claims.filter(_.doc_id == 100L).forall(_.keeper_id == 100L))
      assert(stateRows == 12L, s"3 live docs x 4 buckets, got $stateRows")
    } finally q.stop()
  }

  test("dedup horizon: out-of-order arrival within the horizon still first-arrival-wins") {
    // done-criterion (c): the r17 keeper-steal protocol holds under the
    // horizoned fold — a LOWER id with an EARLIER event time arriving
    // in a later micro-batch (inside lateness + horizon) is a loser
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    for ((name, mk) <- Seq[(String,
        org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[Streams.BandClaim])](
        ("neardup_hz_ooo", df =>
          Streams.nearDedup(df, horizonMs = Some(24L * 3600 * 1000), lateness = "2 hours")),
        ("simblocks_hz_ooo", df =>
          Streams.simhashBlocksDedup(df, bB = 10,
            horizonMs = Some(24L * 3600 * 1000), lateness = "2 hours")))) {
      val mem = MemoryStream[(Long, String, Timestamp)]
      val q = mk(mem.toDF().toDF("doc_id", "text", "ts"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData((100L, text, ts(60))); q.processAllAvailable()
        // same doc, LOWER id, EARLIER event time, later batch — inside
        // the 2 h lateness so the watermark filter keeps it
        mem.addData((5L, text, ts(30))); q.processAllAvailable()
        val claims = spark.table(name).as[Streams.BandClaim].collect()
        assert(claims.filter(_.doc_id == 100L).forall(_.keeper_id == 100L),
          s"$name: the first arrival must have claimed every bucket")
        assert(claims.filter(_.doc_id == 5L).nonEmpty &&
          claims.filter(_.doc_id == 5L).forall(_.keeper_id == 100L),
          s"$name: the late lower id must lose to the stored keeper, not steal it")
      } finally q.stop()
    }
  }

  test("dedup horizon: simhashBlocksDedup evicts and re-admits past the horizon") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = Streams.simhashBlocksDedup(
        mem.toDF().toDF("doc_id", "text", "ts"),
        bB = 10, horizonMs = Some(60L * 60000))
      .writeStream.format("memory").queryName("simblocks_hz_evict")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((100L, text, ts(0))); q.processAllAvailable()
      mem.addData((200L, "different words entirely about joins", ts(180)))
      q.processAllAvailable()
      mem.addData((7L, text, ts(185))); q.processAllAvailable()
      val claims = spark.table("simblocks_hz_evict").as[Streams.BandClaim].collect()
      assert(claims.filter(_.doc_id == 7L).forall(_.keeper_id == 7L),
        "an identical doc past the horizon must claim all its C(10,5) keys")
      assert(claims.count(_.doc_id == 7L) == 252)
    } finally q.stop()
  }

  test("dedup horizon: mediaDedup two-level tiers evict consistently") {
    // both state tiers (exact-collapse by dhash, ball-key claims) expire
    // at the horizon: a within-horizon exact dup probes ONCE and loses;
    // the same payload past the horizon re-fans-out all 57 ball claims
    // and keeps them (stage 1 and stage 2 expire together)
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val samples = graft.multimodal.Media.synthesize(spark, sf())
      .filter(col("kind") === "image").as[graft.multimodal.Media.MediaRecord]
      .head(2)
    def rec(id: Long) = samples(0).copy(media_id = id)
    val advance = samples(1).copy(media_id = 500L) // distinct payload/dhash
    val ikeys = graft.multimodal.Media
      .dHashItems(spark.createDataset(Seq(rec(100L), rec(7L), rec(9L))))
      .selectExpr("media_id", s"${graft.multimodal.Media.ikeySql} AS ikey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mem = MemoryStream[(graft.multimodal.Media.MediaRecord, Timestamp)]
    val q = Streams.relaxedStatefulCheck(spark) {
      Streams.mediaDedupHorizon(
          mem.toDF().select(
            col("_1.media_id").as("media_id"), col("_1.kind").as("kind"),
            col("_1.payload").as("payload"), col("_1.meta").as("meta"),
            col("_2").as("ts")),
          horizonMs = 60L * 60000)
        .writeStream.format("memory").queryName("media_hz")
        .outputMode(OutputMode.Append()).start()
    }
    // the override is scoped to the start (ADVICE r19): the shared
    // session's analyzer check must be back on while the query runs
    assert(spark.conf.get(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled") != "false")
    try {
      mem.addData((rec(100L), ts(0))); q.processAllAvailable()
      // within horizon: an exact dup probes once and loses
      mem.addData((rec(9L), ts(30))); q.processAllAvailable()
      // a distinct payload 3 h out advances the watermark past the
      // horizon (eviction is watermark-visible, so it needs a batch
      // boundary — the standard lateness model)
      mem.addData((advance, ts(180))); q.processAllAvailable()
      // past the horizon: the same payload is fresh again
      mem.addData((rec(7L), ts(185))); q.processAllAvailable()
      val claims = spark.table("media_hz").as[Streams.ItemClaim].collect()
      val first = claims.filter(_.item_key == ikeys(100L))
      val in = claims.filter(_.item_key == ikeys(9L))
      val past = claims.filter(_.item_key == ikeys(7L))
      assert(first.length == 57 && first.forall(_.keeper_key == ikeys(100L)))
      assert(in.length == 1 && in.head.keeper_key == ikeys(100L),
        "a within-horizon exact dup must emit one losing probe")
      assert(past.length == 57 && past.forall(_.keeper_key == ikeys(7L)),
        s"past the horizon the payload must re-fan-out and keep: got " +
        s"${past.length} claims, keepers ${past.map(_.keeper_key).distinct.toSeq}")
    } finally q.stop()
  }

  test("semanticDedup batch-twin: claims are batch pairs and keeps bracket batch keeps") {
    // The streaming exemplar rule is greedier than the batch
    // any-lower-id rule: a streaming drop (v claims exemplar u < v,
    // dot >= 0.35, same cell) is by definition a batch sempair, so
    // batch keeps ⊆ streaming keeps, with equality exactly when the
    // corpus has no similarity CHAINS (v similar to a dropped doc but
    // to no exemplar). Both directions are asserted against the real
    // sf0.001 embeddings slice fed in vec_id order.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val bits = graft.queries.Similarity.semBits(spark, sf())
    val vecs = graft.io.Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = Streams.semanticDedup(mem.toDF().toDF("vec_id", "embedding"), bits = bits)
      .writeStream.format("memory").queryName("semdedup_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = vecs.splitAt(vecs.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val claims = spark.table("semdedup_twin").as[Streams.CellClaim].collect()
      val streamKeeps = claims.filter(c => c.keeper_id == c.vec_id).map(_.vec_id).toSet
      val batchKeeps = SparkEntry.queries("q_dedup_semantic")(spark, sf())
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val batchPairs = graft.queries.Similarity.semanticCellsAndPairs(spark, sf())._2
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.io.CacheScope.releaseAll()
      assert(batchKeeps.subsetOf(streamKeeps),
        s"batch keeps missing from stream: ${(batchKeeps -- streamKeeps).toSeq.sorted.take(5)}")
      for (c <- claims if c.keeper_id != c.vec_id)
        assert(batchPairs.contains((c.keeper_id, c.vec_id)),
          s"streaming claim (${c.keeper_id} -> ${c.vec_id}) is not a batch sempair")
      info(s"streaming keeps ${streamKeeps.size}, batch keeps ${batchKeeps.size} " +
        s"(equal: ${streamKeeps == batchKeeps})")
      assert(claims.exists(c => c.keeper_id != c.vec_id),
        "corpus must contain semantic near-dups")
    } finally q.stop()
  }

  test("runOnce: AvailableNow catch-up is incremental across invocations") {
    import spark.implicits._
    val base = tmpDir("stream_once")
    val batch = graft.io.Tables(spark, sf(), "events")
      .select(col("ts").cast("timestamp").as("ts"), $"event_type", $"value")
    batch.write.parquet(s"$base/in")
    Streams.runOnce(spark, s"$base/in", s"$base/out", s"$base/ckpt")
    val first = spark.read.parquet(s"$base/out").count()
    assert(first > 0)
    // no new files -> a second catch-up run emits nothing new
    Streams.runOnce(spark, s"$base/in", s"$base/out", s"$base/ckpt")
    assert(spark.read.parquet(s"$base/out").count() == first)
  }

  test("file-source streaming matches batch windowedAgg on the events table") {
    import spark.implicits._
    val base = tmpDir("stream")
    // batch result over the harness events (ts as timestamp)
    val batch = graft.io.Tables(spark, sf(), "events")
      .select(col("ts").cast("timestamp").as("ts"), $"event_type", $"value")
    val expect = Streams.windowedAgg(batch).count()
    // same data through the streaming path (one file = one micro-batch)
    batch.write.parquet(s"$base/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$base/in").schema).parquet(s"$base/in")
    val q = Streams.windowedAgg(stream).writeStream
      .format("memory").queryName("file_win").outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("file_win").count() == expect)
    } finally q.stop()
  }

  test("scoreDocs batch-twin: stream scores equal q_classifier_score on real docs") {
    // train offline, score the stream online — the curation deployment
    // shape. The stateless per-row fold must reproduce the batch
    // explode+groupBy scores BIT-IDENTICALLY (same integer multiset
    // summed), so every (score, flag) is compared, not just counts.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val w = graft.queries.TextAnalysis.trainedWeights(spark, sf())
    val docs = graft.io.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = Streams.scoreDocs(mem.toDF().toDF("doc_id", "text"), w)
      .select(col("doc_id"), col("score"), col("cls_flag"))
      .writeStream.format("memory").queryName("score_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val stream = spark.table("score_twin").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      val batch = SparkEntry.queries("q_classifier_score")(spark, sf())
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      graft.io.CacheScope.releaseAll()
      assert(stream.keySet == batch.keySet)
      val diff = batch.keys.filter(k => stream(k) != batch(k))
      assert(diff.isEmpty,
        s"stream/batch score mismatch on ${diff.take(5).toSeq}: " +
          diff.take(3).map(k => s"$k stream=${stream(k)} batch=${batch(k)}").mkString(", "))
      assert(batch.values.map(_._2).toSet == Set("keep", "drop"),
        "corpus must exercise both decisions")
    } finally q.stop()
  }

  test("dsirScore batch-twin: stream weights equal q_dsir_weights on real docs") {
    // train the bucket log-ratio table offline, score the stream online
    // (the DSIR deployment shape). The native per-row loop must
    // reproduce the batch explode + DECIMAL aggregate BIT-IDENTICALLY:
    // n_feats is the same distinct-gram count and weight the same
    // decimal double image, so every pair is compared exactly.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val lr = graft.queries.Curation.dsirModel(spark, sf())
    assert(lr.length == graft.queries.Curation.DSIR_B)
    val docs = graft.io.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = Streams.dsirScore(mem.toDF().toDF("doc_id", "text"), lr)
      .select(col("doc_id"), col("n_feats"), col("dsir_weight"))
      .writeStream.format("memory").queryName("dsir_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val stream = spark.table("dsir_twin").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val batch = SparkEntry.queries("q_dsir_weights")(spark, sf())
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
      graft.io.CacheScope.releaseAll()
      // every corpus doc has >= 1 token, so the batch inner join keeps
      // them all — the stream's empty-doc widening never fires here
      assert(stream.keySet == batch.keySet)
      val diff = batch.keys.filter(k => stream(k) != batch(k))
      assert(diff.isEmpty,
        s"stream/batch dsir mismatch on ${diff.take(5).toSeq}: " +
          diff.take(3).map(k => s"$k stream=${stream(k)} batch=${batch(k)}").mkString(", "))
      assert(batch.values.exists(_._2 > 0) && batch.values.exists(_._2 < 0),
        "corpus must exercise both weight signs")
    } finally q.stop()
  }

  test("unigramEncode batch-twin: stream stats equal q_unigram_encode on real docs") {
    // train the piece table offline, tokenize the stream online. The
    // native per-doc loop shares the batch trainer's Viterbi DP core
    // (UnigramDp), so every (n_words, n_pieces, n_chars) triple must
    // be bit-identical to the batch explode + vocab-join aggregate.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val model = graft.queries.Bpe.unigramModel(spark, sf())
    assert(model.nonEmpty)
    val docs = graft.io.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = Streams.unigramEncode(mem.toDF().toDF("doc_id", "text"), model)
      .select(col("doc_id"), col("n_words"), col("n_pieces"), col("n_chars_alpha"))
      .writeStream.format("memory").queryName("unigram_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val stream = spark.table("unigram_twin").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val batch = SparkEntry.queries("q_unigram_encode")(spark, sf())
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      graft.io.CacheScope.releaseAll()
      // batch drops docs with zero alpha words (inner join); the stream
      // emits them with zeros — compare on the batch's key set and pin
      // the widening rows to all-zero
      assert(batch.keySet.subsetOf(stream.keySet))
      val diff = batch.keys.filter(k => stream(k) != batch(k))
      assert(diff.isEmpty,
        s"stream/batch unigram mismatch on ${diff.take(5).toSeq}: " +
          diff.take(3).map(k => s"$k stream=${stream(k)} batch=${batch(k)}").mkString(", "))
      (stream.keySet -- batch.keySet).foreach { k =>
        assert(stream(k) == ((0L, 0L, 0L)), s"widening row $k must be all-zero")
      }
    } finally q.stop()
  }

  test("encodePq batch-twin: stream codes equal q_pq_encode on real vectors") {
    // train offline, encode the stream online — the IVF-PQ serving
    // shape. The stateless per-row loop IS the batch kernel's
    // expression, so every (vec_id, m) -> code must match exactly.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val cb = graft.queries.Similarity.pqModel(spark, sf("sf0.01")).cb
    val vecs = graft.io.Tables(spark, sf("sf0.01"), "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = Streams.encodePq(mem.toDF().toDF("vec_id", "embedding"), cb)
      .writeStream.format("memory").queryName("encode_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = vecs.splitAt(vecs.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val stream = spark.table("encode_twin").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
      val batch = SparkEntry.queries("q_pq_encode")(spark, sf("sf0.01"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
      graft.io.CacheScope.releaseAll()
      assert(stream.keySet == batch.keySet)
      val diff = batch.keys.filter(k => stream(k) != batch(k))
      assert(diff.isEmpty,
        s"stream/batch code mismatch on ${diff.take(5).toSeq}")
      assert(batch.values.toSet.size > 1, "corpus must exercise multiple codes")
    } finally q.stop()
  }

  test("encodeIvfadc batch-twin: stream (cell, codes) equal the batch residual pipeline") {
    // the IVFADC add() path: route to the trained coarse centroid,
    // subtract, quantize the residual — all in one stateless native
    // expression. Cell AND every (m -> code) must match the batch
    // kmAssign + zip_with + pq_codes pipeline exactly.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.queries.Similarity
    val dir = sf("sf0.01")
    val (cents, cb) = Similarity.ivfadcModel(spark, dir)
    val vecs = graft.io.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = Streams.encodeIvfadc(mem.toDF().toDF("vec_id", "embedding"), cents, cb)
      .writeStream.format("memory").queryName("ivfadc_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = vecs.splitAt(vecs.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val stream = spark.table("ivfadc_twin").collect()
        .map(r => (r.getLong(0), r.getInt(2)) -> ((r.getLong(1), r.getInt(3)))).toMap
      // batch: the q_ann_ivfadc residual pipeline's own frames
      val centsDf = cents.toDF("cell", "c_emb")
      val assign = Similarity.kmAssign(spark, dir, centsDf)
      val res = Similarity.adcResiduals(assign, centsDf)
      val (_, codes) = Similarity.adcCodebookAndCodes(spark, dir, res, rebuildMemo = false)
      val batch = codes
        .join(assign.select(col("vec_id"), col("cell")), "vec_id")
        .collect()
        .map(r => (r.getLong(0), r.get(1).asInstanceOf[Number].intValue()) ->
          ((r.getLong(3), r.get(2).asInstanceOf[Number].intValue()))).toMap
      graft.io.CacheScope.releaseAll()
      assert(stream.keySet == batch.keySet)
      val diff = batch.keys.filter(k => stream(k) != batch(k))
      assert(diff.isEmpty,
        s"stream/batch (cell, code) mismatch on ${diff.take(5).toSeq}: " +
          diff.take(3).map(k => s"$k stream=${stream(k)} batch=${batch(k)}").mkString(", "))
      assert(batch.values.map(_._1).toSet.size > 1, "corpus must exercise multiple cells")
    } finally q.stop()
  }

  test("gateContaminated batch-twin: stream hits equal the batch bloom prefilter") {
    // train the eval bloom offline, gate the stream online — the
    // decontamination prefilter/confirm split with the prefilter moved
    // to ingest. Same bloom bytes on both sides: per-doc hit counts
    // must match the relational might_contain formulation exactly, and
    // eval-slice docs can never pass unflagged (no false negatives).
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = sf("sf0.01")
    val bloom = graft.queries.TextAnalysis.evalBloomBytes(spark, dir)
    val docs = graft.io.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = Streams.gateContaminated(mem.toDF().toDF("doc_id", "text"), bloom)
      .writeStream.format("memory").queryName("decon_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val stream = spark.table("decon_twin").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stream.size == docs.length, "one gate row per arriving doc")
      val b64 = java.util.Base64.getEncoder.encodeToString(bloom)
      graft.io.Tables.registerAll(spark, dir)
      val batch = spark.sql(s"""
        |SELECT doc_id, count(*) AS n FROM (
        |  SELECT doc_id, xxhash64(sv) AS v
        |  FROM (SELECT doc_id, explode(shingles(${graft.queries.TextAnalysis.tokens}, 5)) AS sv
        |        FROM documents))
        |WHERE might_contain(unbase64('$b64'), v)
        |GROUP BY doc_id""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val streamHits = stream.filter(_._2 > 0)
      assert(streamHits == batch,
        s"stream/batch prefilter mismatch: ${
          (streamHits.toSet diff batch.toSet).take(3)} / ${
          (batch.toSet diff streamHits.toSet).take(3)}")
      // no false negatives: every eval-slice doc with >= 5 tokens is flagged
      val evalDocs = docs.filter(d => d._1 % 29 == 0 &&
        d._2.trim.split("\\s+").length >= 5).map(_._1)
      val unflagged = evalDocs.filterNot(id => stream.getOrElse(id, 0L) > 0)
      assert(unflagged.isEmpty, s"eval docs passed unflagged: ${unflagged.take(5).toSeq}")
    } finally q.stop()
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
