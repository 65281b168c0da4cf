package graft

/** Plan-shape regressions: the physical plans the engine is designed to
  * produce must stay that way — filters reaching the parquet scan,
  * pruned read schemas, broadcast dims, no cartesian products, bounded
  * exchange counts. A change that silently turns a broadcast join into
  * a shuffle or un-pushes a filter fails here, not in a 100 TB run. */
class PlanShapeSpec extends SparkSpec {

  // plans are extracted under KernelMemo.bypassed: the memoized kernel
  // queries must be gated on their REAL pipeline plans, not the
  // checkpoint-backed scan the memo returns (and an eager checkpoint
  // per inspected query would turn plan extraction into execution)
  private def planOf(q: String): String = graft.io.KernelMemo.bypassed {
    SparkEntry.queries(q)(spark, sf()).queryExecution.executedPlan.toString
  }

  test("q_filter_pushdown: all predicates reach the parquet scan; schema pruned") {
    val p = planOf("q_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity)") ||
      p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate"))
  }

  test("q_join_nation_revenue: dims broadcast, partial aggregation present") {
    val p = planOf("q_join_nation_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("Cartesian"))
    // partial + final HashAggregate around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q_agg_pricing: filter pushed, only needed columns read") {
    val p = planOf("q_agg_pricing")
    assert(p.contains("LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_partkey"), "reads columns the query never uses")
  }

  test("q_sessionize: single exchange feeds both window and final groupBy") {
    val p = planOf("q_sessionize")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"sessionize should shuffle exactly once:\n$p")
  }

  test("q_vocab_topk: distributed TakeOrdered, no global-order window") {
    val p = planOf("q_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Window"), "global-order window funnels all rows to one partition")
  }

  test("q_url_filter: corpus side stays map-only; blocklist probes via one broadcast") {
    // the URL gate must stay the shape that runs at frontier scale:
    // parse/normalize/verdict as one codegen'd projection, the
    // blocklist FRAME (round 20, VERDICT r19 #3) joined as exactly one
    // bounded broadcast — never a corpus shuffle
    val p = planOf("q_url_filter")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus side of the URL gate must never shuffle-join:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 1,
      s"expected exactly one blocklist broadcast join:\n$p")
    // the only hash exchange allowed is the bounded blocklist DISTINCT
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"a corpus shuffle crept into the URL gate:\n$p")
  }

  test("url gate scale branch (budget 0): bloom prefilter arms, no forced broadcast") {
    // VERDICT r19 #3 done-criterion: forcing the blocklist row budget
    // to 0 must flip the gate to the bloom-prefilter + exact-confirm
    // shape — the map-only miss arm unions the candidate confirm join,
    // and no broadcast HINT survives (AQE sizes the confirm join)
    val p = graft.io.KernelMemo.bypassed {
      graft.queries.Url.urlGate(spark, sf(), rowBudget = 0L)
        .queryExecution.executedPlan.toString
    }
    assert(p.contains("bloom_hits"), s"expected the bloom prefilter:\n$p")
    assert(p.contains("Union"), s"expected the miss/candidate union arms:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the candidate confirm join must stay hash-based at fixture scale:\n$p")
  }

  test("q_source_overlap: the corpus aggregate keeps fixed-width HashAggregate buffers") {
    // the multi-word mask fold (round 19) must stay W bit_or longs per
    // shingle key — a sid-LIST aggregate would hit ObjectHashAggregate's
    // 128-key sort fallback on the high-cardinality shingle key, and an
    // array-typed BUFFER would demote to SortAggregate (SURVEY §8.4 aggregate-buffer rule)
    val p = planOf("q_source_overlap_many") // the forced multi-word path
    assert(!p.contains("ObjectHashAggregate"),
      s"the shingle fold must be a plain HashAggregate:\n$p")
    assert(!p.contains("SortAggregate"),
      s"a SortAggregate crept into the overlap plan:\n$p")
    assert(p.contains("HashAggregate"))
  }

  test("q_source_overlap_cooc: the scale arm never nested-loop joins the histogram") {
    // VERDICT r19 #5: past the grid budget the co-occurrence table
    // comes from the per-mask set-bit pair explode — the plan must
    // carry NO BroadcastNestedLoopJoin at all (the old pair-grid ×
    // mask-histogram join was quadratic in |S| through a frame bounded
    // only by membership-pattern diversity)
    val p = planOf("q_source_overlap_cooc")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the forced scale arm must not nested-loop join:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Generate"), s"expected the mask_sids explode:\n$p")
  }

  test("no query plan contains a cartesian product or nested-loop join") {
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian product")
    }
  }

  test("memo consumers read the checkpointed kernel, never the corpus (diagnostic-tier rule)") {
    // SURVEY §8.4 round-13 rule: a diagnostic/composition query names
    // its builder kernel and adds ZERO new corpus scans. Gate: after
    // the designated builders run, the consumer's plan — extracted
    // WITHOUT KernelMemo.bypassed, i.e. what actually executes — must
    // scan the memoized checkpoint (a LogicalRDD) and must contain no
    // documents/embeddings parquet relation.
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    for (b <- Seq("q_ivf_pruned_assign", "q_dedup_ngram_capped", "q_ann_pq"))
      SparkEntry.queries(b)(spark, sf()).write.format("noop").mode("overwrite").save()
    graft.io.CacheScope.releaseAll()
    for (c <- Seq("q_ivf_cell_balance", "q_dedup_graph_degree", "q_pq_code_balance")) {
      val plan = SparkEntry.queries(c)(spark, sf()).queryExecution.optimizedPlan
      val rddScans = plan.collect { case l: LogicalRDD => l }
      assert(rddScans.nonEmpty,
        s"$c must read its memoized kernel (LogicalRDD checkpoint scan)")
      val corpusScans = plan.collect {
        case lr: LogicalRelation
            if lr.relation.toString.contains("documents.parquet") ||
              lr.relation.toString.contains("embeddings.parquet") => lr
      }
      assert(corpusScans.isEmpty,
        s"$c re-scans the corpus instead of consuming its builder kernel:\n$plan")
    }
  }

  test("dedup signature stages are map-side: no shuffle before partial aggregation") {
    val p = planOf("q_dedup_simhash")
    // the explode -> hash -> partial agg must appear below the first
    // exchange (map-side combine on doc_id); the signature is ONE
    // imperative aggregate (ObjectHashAggregate), not 60 builtin sums
    val firstExchange = p.indexOf("Exchange hashpartitioning")
    val firstAgg = p.indexOf("ObjectHashAggregate")
    assert(firstAgg >= 0 && firstExchange >= 0)
    assert(p.contains("simhash_agg"))
  }

  test("q_tpch_q5: dims broadcast; only the two fact joins shuffle") {
    val p = planOf("q_tpch_q5")
    assert(p.contains("BroadcastHashJoin"))
    // exchanges: lineitem|orders on orderkey, +customer on custkey, and
    // the final single-group aggregation — never one per join
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 4, p)
  }

  test("q_sample_hash: pure map-stage filter, no exchange at all") {
    val p = planOf("q_sample_hash")
    assert(!p.contains("Exchange hashpartitioning"), s"sampling must not shuffle:\n$p")
  }

  test("q_ann_topk: threshold via bounded-heap aggregate, no full sort of the score stream") {
    val p = planOf("q_ann_topk")
    assert(p.contains("ObjectHashAggregate"), "TopK threshold aggregate missing")
    // threshold agg + unhinted threshold/survivor joins (AQE collapses
    // the small sides at runtime) + final per-query rank — bounded even
    // in the pre-AQE plan
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 6, p)
  }

  test("q_ann_ivf: window argmax assignment — no broadcast of a per-vector frame") {
    val p = planOf("q_ann_ivf")
    assert(p.contains("BroadcastHashJoin")) // the centroid dims broadcast
    assert(p.contains("Window"), "per-vector argmax must be a window, not groupBy+join-back")
    // score-stream window + assignment join + probe join + ranks — never
    // an extra exchange for a groupBy-max rejoin
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 6, p)
  }

  test("ANN/pipeline: no forced broadcast of a frame that grows with the corpus") {
    // Round-6 defect class: broadcast() on per-vector/per-doc argmax or
    // keeper frames — kilobytes at sf0.1, multi-GB pinned into every
    // executor at 100 TB. Gate: in the ANN + pipeline-filter + capped-
    // dedup queries, every broadcast HINT must wrap a frame bounded BY
    // CONSTRUCTION — a fixed-k LIMIT (the hash-ordered query/centroid
    // samples: k is a model/workload parameter, not a fraction of the
    // corpus) or the k-means trained centroids (an Aggregate grouped
    // exactly on the cell id — one row per cell). A bare Filter slice
    // does NOT qualify: round 7 blessed %-of-corpus filters as
    // "bounded", and those grow linearly with the data. AQE may still
    // broadcast unhinted frames at runtime from observed sizes; that is
    // the point — the HINT is what must never pin an O(corpus) frame.
    import org.apache.spark.sql.catalyst.plans.logical._
    def stripTop(pl: LogicalPlan): LogicalPlan = pl match {
      case Project(_, c)       => stripTop(c)
      case SubqueryAlias(_, c) => stripTop(c)
      case f: Filter           => stripTop(f.child)
      case g: Generate         => stripTop(g.child) // explode of a bounded array
      case other               => other
    }
    // VERDICT r13 #6 widened the audit to the TPC-H shapes: the forced
    // part/supplier-slice hints (O(SF) frames) are gone, so every hint
    // left must classify bounded — which for TPC-H means the
    // fixed-cardinality dims (nation = 25 rows, region = 5 at EVERY
    // scale factor; column prefixes n_/r_ identify the leaf) or a
    // one-row global aggregate (the scalar max/avg/total frames)
    val gated = Seq("q_ann_topk", "q_ann_lsh", "q_ann_ivf", "q_ann_kmeans",
      "q_ann_ivf_multiprobe", "q_pipeline_filter", "q_dedup_ngram_capped",
      "q_heavy_hitters",
      "q_ann_ivfpq",
      "q_tpch_q2", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q11",
      "q_tpch_q15", "q_tpch_q22")
    for (name <- gated) {
      val plan = graft.io.KernelMemo.bypassed {
        SparkEntry.queries(name)(spark, sf()).queryExecution.analyzed
      }
      val hinted = plan.collect { case h: ResolvedHint if h.hints.strategy.isDefined => h.child }
      // non-vacuity: the ANN queries DO hint their sample/centroid frames
      if (name != "q_pipeline_filter" && name != "q_dedup_ngram_capped")
        assert(hinted.nonEmpty, s"$name: expected the sample/centroid broadcast hints")
      for (sub <- hinted) {
        // a LocalRelation is a driver-materialized bounded model frame
        // (the localizedModel centroid pattern — |C| rows by
        // construction); GlobalLimit is the hash-ordered fixed-k sample
        val fixedK = sub.collectFirst {
          case _: GlobalLimit => ()
          case _: LocalRelation => ()
        }.isDefined
        val trainedCentroids = stripTop(sub) match {
          case a: Aggregate =>
            a.groupingExpressions.flatMap(_.references.map(_.name)) == Seq("cell")
          case _ => false
        }
        // a GLOBAL aggregate (no grouping keys) is one row by
        // construction, and exploding its bounded array output keeps it
        // bounded — the MG candidate set (<= k entries) is this shape;
        // stripTop (not collect) so a corpus-sized frame that merely
        // CONTAINS a global agg somewhere beneath does not sneak
        // through, and collect_list/collect_set are rejected: their
        // single "row" is an array that GROWS with the corpus, which
        // would re-open the loophole through the Generate above it
        val globalAgg = stripTop(sub) match {
          case a: Aggregate =>
            a.groupingExpressions.isEmpty && !a.aggregateExpressions.exists(_.collectFirst {
              case c: org.apache.spark.sql.catalyst.expressions.aggregate.Collect[_] => c
            }.isDefined)
          case _ => false
        }
        // fixed-cardinality dimension tables: nation (25 rows) and
        // region (5 rows) are constant at every TPC-H scale factor —
        // their exclusive n_/r_ column prefixes identify the leaves
        val fixedDim = {
          val leaves = stripTop(sub).collectLeaves()
          leaves.nonEmpty && leaves.forall(_.output.forall(a =>
            a.name.startsWith("n_") || a.name.startsWith("r_") ||
              a.name.startsWith("n1_") || a.name.startsWith("n2_")))
        }
        // budget-gated O(SF) dim slices (TpchShapes.hintIfSmall): the
        // hint exists ONLY while the slice's SOURCE table clears the
        // row budget — re-derive the same test here, so a hint on an
        // over-budget table fails even if someone bypasses the helper.
        // Leaves are part/supplier scans (p_/s_ prefixes) possibly
        // joined with fixed dims (n_/r_).
        val gatedSlice = {
          val leaves = stripTop(sub) match {
            case j: Join => j.collectLeaves()
            case other   => other.collectLeaves()
          }
          def tableOf(prefix: String): Option[String] = prefix match {
            case "p_" => Some("part"); case "s_" => Some("supplier"); case _ => None
          }
          val slices = leaves.flatMap(l =>
            l.output.headOption.map(_.name.take(2)).flatMap(tableOf))
          leaves.nonEmpty && slices.nonEmpty &&
            leaves.forall(l => l.output.forall(a =>
              a.name.startsWith("p_") || a.name.startsWith("s_") ||
                a.name.startsWith("n_") || a.name.startsWith("r_"))) &&
            slices.forall(tbl =>
              graft.io.Tables.rowCount(spark, sf(), tbl) <=
                graft.queries.TpchShapes.DimHintBudgetRows)
        }
        assert(fixedK || trainedCentroids || globalAgg || fixedDim || gatedSlice,
          s"$name force-broadcasts a frame that grows with the corpus:\n$sub")
      }
    }
  }

  test("pruned centroid assignment: probe-cell equi-join feeds every IVF/k-means scan") {
    // round-12: the N x |C| crossJoin(broadcast(cents)) assignment scan
    // became a probe-cell equi-join (SRP cells at semBits(|C|)) plus a
    // bounded 8-centroid anchor cross — this gate pins the equi-join so
    // a refactor can't silently regress to the full scan (O(N*sqrt(N))
    // flops at scale)
    // the production IVF/k-means queries take the corpus-derived switch
    // (flat below PRUNE_SWITCH_C — optimal at test |C|), so the pruned
    // probe equi-join is gated on the FORCED coverage query, which runs
    // the two-level rule unconditionally (q_kmeans_train's registered
    // output is driver-collected telemetry — no plan to gate there)
    val p = planOf("q_ivf_pruned_assign")
    assert("BroadcastHashJoin \\[vpcell".r.findFirstIn(p).isDefined ||
           "BroadcastHashJoin \\[cast\\(vpcell".r.findFirstIn(p).isDefined,
      s"q_ivf_pruned_assign: pruned probe equi-join missing:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q_ivf_pruned_assign: assignment regressed to a cartesian:\n$p")
  }

  test("q_dedup_ngram_capped: Tungsten df count — no window sort, list aggs only on per-doc keys") {
    val p = planOf("q_dedup_ngram_capped")
    // the cap's df must be a plain count HashAggregate (fixed-width
    // buffers, graceful spill), never a window count — a window
    // sort-shuffles the full postings stream and still needs a self-join
    assert(!p.contains("Window"), s"hot-shingle cap must not window-sort the postings:\n$p")
    // the only list-collecting aggregate allowed is the per-doc hot
    // shingle set (tiny groups); a list aggregate keyed on the SHINGLE
    // would hit ObjectHashAggregate's 128-key sort fallback — a silent
    // full sort of the postings plus O(df) buffers on hot keys
    val objKeys = "ObjectHashAggregate\\(keys=\\[(\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(objKeys.subsetOf(Set("doc_id", "h_doc")), s"list aggregate on a non-doc key: $objKeys\n$p")
    // and nothing may demote to a SortAggregate (array-typed agg
    // buffers do that silently — the df count, the pair aggregate and
    // the hot-set collection must all stay hash-based)
    assert(!p.contains("SortAggregate"), s"a SortAggregate crept into the capped plan:\n$p")
    // pre-AQE count; the duplicated docHot/self-join subtrees (two
    // pair-attach joins + the r11 cap-escape branch, which reuses the
    // docHot aggregate and adds the min-hot self-join and the final
    // pair-dedup groupBy) collapse to ReusedExchange at runtime — the
    // companion test below pins that reuse
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 12, p)
  }

  test("q_dedup_ngram_capped: postings exchange is REUSED at runtime, not recomputed") {
    // the plan comment in Dedup.scala promises the kept/hot vocab
    // branches descend from ONE materialized df aggregate — gate it on
    // the EXECUTED adaptive plan, so a Spark upgrade that silently
    // doubles the postings shuffle fails here instead of only showing
    // up as a bench regression. Start from a clean cache: a live cache
    // of the UNCAPPED kernel's shingle frame (same subtree) would be
    // auto-substituted into this plan and break exchange reuse — the
    // bench/verify sites release caches between queries for the same
    // reason.
    graft.io.CacheScope.releaseAll()
    spark.catalog.clearCache()
    val df = graft.io.KernelMemo.bypassed {
      SparkEntry.queries("q_dedup_ngram_capped")(spark, sf())
    }
    df.collect() // drives AQE to its final plan on df's own QueryExecution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"no runtime exchange reuse in the capped dedup plan:\n$p")
  }

  test("q_dedup_lsh_recall: truth side runs through the capped kernel") {
    val p = planOf("q_dedup_lsh_recall")
    // the ground-truth pair join must be the maxDf kernel — its
    // kept-vocab (df between 2 and cap) and hot-vocab (df > cap)
    // slices both show up as df filters; an uncapped postings
    // self-join has neither and explodes df-squared on hot shingles
    assert("df#\\d+L? >= 2".r.findFirstIn(p).isDefined,
      s"kept-vocab cap filter missing from the recall truth plan:\n$p")
    assert("df#\\d+L? <= 4".r.findFirstIn(p).isDefined,
      s"cap threshold filter missing from the recall truth plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"recall plan regressed to all-pairs or a window sort:\n$p")
  }

  test("q_ann_pq: bounded codebook/LUT broadcast; Tungsten ADC aggregate") {
    val p = planOf("q_ann_pq")
    // the codebook and per-query LUT must reach the corpus via
    // broadcast (they are bounded M*K / |Q|*M*K frames); the ADC sum
    // is a plain decimal HashAggregate
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"PQ codebook/LUT not broadcast:\n$p")
    assert(!p.contains("SortAggregate"), s"ADC aggregate fell off Tungsten:\n$p")
  }

  test("q_dedup_substring: bucketed window-fingerprint join — no window sort, hash aggregates only") {
    val p = planOf("q_dedup_substring")
    // candidates must come from the inverted index on the window hash,
    // capped by the df filter — never an all-pairs or windowed plan
    assert(!p.contains("CartesianProduct"), s"substring dedup went all-pairs:\n$p")
    assert(!p.contains("Window"), s"window-function sort in the fingerprint plan:\n$p")
    // per-doc distinct, df count and the pair count are all plain
    // HashAggregates — no list buffers anywhere in this kernel
    assert(!p.contains("SortAggregate") && !p.contains("ObjectHashAggregate"),
      s"non-Tungsten aggregate in the substring plan:\n$p")
  }

  test("substring family + graded decontamination: hash-only aggregates, no window sorts") {
    for (name <- Seq("q_text_dup_fraction", "q_dedup_spans", "q_decontaminate_frac")) {
      val p = planOf(name)
      assert(!p.contains("Window"), s"$name window-sorts a corpus stream:\n$p")
      assert(!p.contains("SortAggregate") && !p.contains("ObjectHashAggregate"),
        s"$name has a non-Tungsten aggregate:\n$p")
    }
    // span removal: its one list aggregate (window starts) must key on
    // the doc over the bounded SPANS subset — and the mask stage
    // shuffles nothing else
    val pr = planOf("q_dedup_span_removal")
    assert(!pr.contains("Window") && !pr.contains("SortAggregate"), pr)
    val prKeys = "ObjectHashAggregate\\(keys=\\[(\\w+)".r
      .findAllMatchIn(pr).map(_.group(1)).toSet
    assert(prKeys.subsetOf(Set("doc_id", "p_doc")), s"list agg on a non-doc key: $prKeys\n$pr")
    // the graded gate must keep the binary gate's shape: eval set built
    // from the pushed-down slice, corpus streamed once into a broadcast
    // probe — never a shuffled corpus join
    val p = planOf("q_decontaminate_frac")
    assert(p.contains("BroadcastHashJoin"), s"eval probe must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus side must not shuffle for the probe:\n$p")
  }

  test("q_tpch_q14: part joins broadcast; single-group aggregate, no sort") {
    val p = planOf("q_tpch_q14")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "dim join must not shuffle-sort the fact")
  }

  test("q_corpus_pipeline: one fingerprint shuffle + one rollup, nothing more") {
    val p = planOf("q_corpus_pipeline")
    // window on fp + per-lang aggregation; the gate/keeper/counters all
    // fuse into those two stages
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("q_mode: two map-side-combinable aggregations, one value-pair exchange") {
    val p = planOf("q_mode")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial+final agg expected")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("q_asof_tolerance: same AsOfJoinExec plan as the unbounded as-of") {
    val p = planOf("q_asof_tolerance")
    assert(p.contains("AsOfJoin"), "tolerance variant must use the native operator")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3, p)
  }

  test("q_tpch_q2: nation/region/min-cost broadcast; winner join is not a cartesian") {
    val p = planOf("q_tpch_q2")
    // nation, region, and the min-cost-per-part rejoin all broadcast —
    // only the partsupp aggregation and the supplier/part joins shuffle
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(p.contains("TakeOrderedAndProject"), "LIMIT 20 must not global-sort")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 6, p)
  }

  test("q_tpch_q9: filtered part and nation broadcast; fact joins bounded") {
    val p = planOf("q_tpch_q9")
    // part (filtered to PROMO) and nation are the dims: both broadcast;
    // lineitem never shuffles for them
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    // suppkey join + orderkey join + final group-by — never one per join
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 6, p)
  }

  test("q_tpch_q21: semi + anti correlations as hash joins, not nested loops") {
    val p = planOf("q_tpch_q21")
    assert(p.contains("LeftSemi"), "EXISTS must compile to a semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS must compile to an anti join")
    // the <> predicate rides the equi-join on l_orderkey as a residual
    // condition; a nested-loop join here would be quadratic per order
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), "LIMIT 20 must not global-sort")
  }

  test("q_sliding_window: explode-to-windows stays one aggregation") {
    val p = planOf("q_sliding_window")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"hopping windows must aggregate in one pass:\n$p")
  }

  test("q_decontaminate: eval shingle set broadcast — corpus never shuffles for the probe") {
    val p = planOf("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), "eval set must broadcast")
    // eval-distinct + final per-doc count; the corpus shingle stream
    // itself must not hash-exchange for the join
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
    // and nothing may be cached: a persist here pins the FULL corpus
    // shingle stream to serve a tiny eval-set build (round-7 finding #3)
    assert(!p.contains("InMemoryTableScan"), s"decontaminate must not cache the corpus:\n$p")
  }

  test("q_decontaminate: past the eval budget the switch leaves NO corpus-fraction broadcast") {
    // VERDICT r13 #1: the broadcast probe join is only the plan below
    // the eval-row budget; forcing the budget to 0 must produce the
    // bloom-prefiltered scale branch with no forced broadcast anywhere
    // (AQE may still size-derive one at runtime — that is the point).
    val df = graft.io.KernelMemo.bypassed {
      graft.queries.TextAnalysis.decontaminateGate(spark, sf(), evalRowBudget = 0L)
    }
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint") && !analyzed.contains("UnresolvedHint"),
      s"scale branch must carry no broadcast hint:\n$analyzed")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Filter might_contain"), s"bloom prefilter missing:\n$p")
    assert(p.contains("bloom_filter_agg"), s"bloom build missing:\n$p")
    // and the branches agree row-for-row (the bloom is a prefilter,
    // never a verdict): same exact result as the broadcast branch
    val bloomRows = graft.queries.TextAnalysis.decontaminateGate(spark, sf(), 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val bcastRows = graft.queries.TextAnalysis.decontaminateGate(spark, sf(), Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(bloomRows == bcastRows, "switch branches must be result-identical")
    // the decontamination SIBLINGS (graded fraction, funnel) share the
    // budget through evalProbeHinted: over budget the frame must carry
    // no hint at all (AQE derives the strategy from runtime size)
    import org.apache.spark.sql.catalyst.plans.logical.{ResolvedHint, UnresolvedHint}
    val someEv = spark.range(3).selectExpr("id AS v")
    val over = graft.queries.TextAnalysis.evalProbeHinted(spark, sf(), someEv, 0L)
    assert(!over.queryExecution.analyzed.collectFirst {
      case h: ResolvedHint => h
      case h: UnresolvedHint => h
    }.isDefined, "over-budget eval probe must be unhinted")
    val under = graft.queries.TextAnalysis.evalProbeHinted(spark, sf(), someEv, Long.MaxValue)
    assert(under.queryExecution.analyzed.collectFirst {
      case h: ResolvedHint => h
    }.isDefined, "under-budget eval probe keeps the forced broadcast")
    // the TPC-H size-derived slice hint follows the same contract
    val slice = graft.queries.TpchShapes.hintIfSmall(
      spark, sf(), "part", someEv, budgetRows = 0L)
    assert(!slice.queryExecution.analyzed.collectFirst {
      case h: ResolvedHint => h
      case h: UnresolvedHint => h
    }.isDefined, "over-budget dim slice must be unhinted")
  }

  test("q_tfidf / q_bm25: vocabulary joins carry no broadcast hint (Heap's-law frames)") {
    // the per-term df table grows ~sqrt(corpus); a forced broadcast pins
    // it into every executor at 100 TB. Only genuinely one-row frames
    // (ungrouped aggregates: corpus size, avgdl consts) may be hinted —
    // AQE decides the vocab join strategy from observed sizes.
    import org.apache.spark.sql.catalyst.plans.logical._
    for (name <- Seq("q_tfidf", "q_bm25")) {
      val plan = graft.io.KernelMemo.bypassed {
        SparkEntry.queries(name)(spark, sf()).queryExecution.analyzed
      }
      val hinted = plan.collect { case h: ResolvedHint if h.hints.strategy.isDefined => h.child }
      for (sub <- hinted) {
        val scalarAgg = sub.collectFirst {
          case a: Aggregate if a.groupingExpressions.isEmpty => ()
        }.isDefined
        assert(scalarAgg, s"$name hints a non-scalar frame:\n$sub")
      }
    }
  }

  test("q_text_repetition: per-document stats are a map-only plan, zero exchanges") {
    val p = planOf("q_text_repetition")
    // the statistic depends only on the row — any exchange here would
    // ship |tokens| rows per document for a per-document answer
    assert(!p.contains("Exchange hashpartitioning"), s"repetition must not shuffle:\n$p")
    assert(p.contains("ngram_stats"), "native per-row expression missing")
  }

  test("q_pq_encode: native per-row encode is a map-only plan, zero exchanges") {
    val p = planOf("q_pq_encode")
    // the quantizer is a pure function of the row — the r14 relational
    // kernel paid a broadcast crossJoin + M·K-row aggregate per vector;
    // any exchange here means the native pq_codes loop regressed
    assert(!p.contains("Exchange hashpartitioning"), s"PQ encode must not shuffle:\n$p")
    assert(p.contains("pq_codes"), "native pq_codes expression missing")
    assert(p.contains("Generate"), "posexplode of the code array missing")
  }

  test("q_weighted_sample: distributed TakeOrdered, no global sort or window") {
    val p = planOf("q_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Window"), "priority top-k must not windows-sort the corpus")
  }

  test("q_intradoc_dedup: per-row cleaning is map-only, zero exchanges") {
    val p = planOf("q_intradoc_dedup")
    assert(!p.contains("Exchange"), s"intra-doc dedup must not shuffle:\n$p")
  }

  test("q_pca_power: the per-row projection is map-only — zero exchanges") {
    // the Gram matrix and power iteration run as bounded build-time
    // aggregates (d and d² longs collected, the k-means/BPE pattern);
    // the RETURNED plan must be a pure per-row projection — an exchange
    // here would shuffle the corpus for a per-row answer
    val p = planOf("q_pca_power")
    assert(!p.contains("Exchange"), s"pca projection must not shuffle:\n$p")
    assert(!p.contains("Window"), s"pca projection must not sort:\n$p")
  }

  test("q_adaptive_quality: cutoff cumsum windows the bounded distinct-score frame, not the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val qe = graft.io.KernelMemo.bypassed {
      SparkEntry.queries("q_adaptive_quality")(spark, sf()).queryExecution
    }
    val wins = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected the cutoff cumsum window")
    // a Window whose child has no Aggregate beneath would be the scale
    // killer this query exists to avoid: per-lang sort partitions of
    // the whole corpus on a 4-value key
    for (w <- wins)
      assert(
        w.child.collectFirst { case a: Aggregate => a }.isDefined,
        s"cumsum window must run over the distinct-score aggregate, not the corpus:\n$w")
    val p = qe.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"the 4-row cutoff table must broadcast back:\n$p")
  }

  test("q_pack_sequences: one shard exchange feeds the packing window") {
    val p = planOf("q_pack_sequences")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"packing must shuffle once on (lang, shard):\n$p")
  }

  test("q_chunk_overlap: chunking is a pure map+explode plan, zero exchanges") {
    val p = planOf("q_chunk_overlap")
    assert(!p.contains("Exchange hashpartitioning"), s"chunking must not shuffle:\n$p")
    assert(p.contains("Generate"), "expected the chunk-index explode")
  }

  test("q_quantize_embeddings: two dim-keyed aggregations, stats join back without a hint") {
    val p = planOf("q_quantize_embeddings")
    // per-dim min/max + final error stats; the 64-row stats frame joins
    // back via AQE (no forced broadcast of anything)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3, p)
    assert(!p.contains("SortAggregate"), s"quantization aggregates must stay hash-based:\n$p")
  }

  test("q_stats_moments: all six power sums in ONE aggregation pass") {
    val p = planOf("q_stats_moments")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"moments must be a single groupBy pass:\n$p")
  }

  test("q_heavy_hitters: MG sketch has map-side partials; candidates broadcast back") {
    val p = planOf("q_heavy_hitters")
    // partial + final ObjectHashAggregate around the single k-counter
    // shuffle — the map-side MG summary is the whole point
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"MG aggregate must have map-side partials:\n$p")
    assert(p.contains("BroadcastHashJoin"), "candidate join-back should broadcast <= k rows")
    assert(!p.contains("SortAggregate"), s"no sort fallback expected on a global MG key:\n$p")
  }

  test("q_random_projection: pure map stage, zero exchanges, pruned scan") {
    val p = planOf("q_random_projection")
    assert(!p.contains("Exchange"), s"projection must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
      "projection should read only vec_id + embedding")
  }

  test("q_source_curation: one tiny aggregate over a map stage") {
    val p = planOf("q_source_curation")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"source rollup must shuffle once on source:\n$p")
    assert(!p.contains("SortAggregate"), s"quality rollup must stay hash-based:\n$p")
  }

  test("q_dedup_incremental: hash aggregates only; both postings sides scan-filtered") {
    val p = planOf("q_dedup_incremental")
    assert(!p.contains("SortAggregate"), s"pair aggregation must stay hash-based:\n$p")
    // the incoming/existing split must reach the scans as pushed-down
    // data filters (each side reads only its slice), not a post-scan split
    assert("\\(doc_id#\\d+L % 5\\)".r.findAllIn(p).nonEmpty, s"slice filter missing:\n$p")
  }

  test("q_dedup_lines: df join-back only — no pair join, no window sort, hash aggregates") {
    // the line kernel's scale claim: O(total lines), never pairs — so
    // the plan must contain NO self-join fan-out (a single join-back of
    // the bounded df>=2 fingerprint set), no SortAggregate, no Window
    for (q <- Seq("q_dedup_lines", "q_dedup_line_removal",
        "q_dedup_lines_nl", "q_dedup_line_removal_nl")) {
      val p = planOf(q)
      assert(!p.contains("SortAggregate"), s"$q: df aggregation must stay hash-based:\n$p")
      assert(!p.contains("Window"), s"$q: no window sort in the line kernel:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: no pair blow-up:\n$p")
    }
    // the removal queries' only list aggregate is keyed on doc_id over
    // the FLAGGED subset (the span-removal budget rule): the
    // collect_list must sit ABOVE the dfc >= 2 filter in the plan text
    // (tree prints parents before children)
    for (q <- Seq("q_dedup_line_removal", "q_dedup_line_removal_nl")) {
      val pr = planOf(q)
      val ci = pr.indexOf("collect_list")
      val fi = pr.indexOf("(dfc")
      assert(ci >= 0 && fi > ci,
        s"$q: list agg must aggregate only the flagged subset:\n$pr")
    }
  }

  test("q_media_dedup: hamming-ball probe join over the distinct-hash frame, never item pairs") {
    for (q <- Seq("q_media_dedup", "q_media_ball_probe")) {
      val p = planOf(q)
      assert(!p.contains("SortAggregate"), s"$q: hash-group collapse must stay hash-based:\n$p")
      assert(!p.contains("Window"), s"$q: no window sort in the media-dedup kernel:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: no all-pairs blow-up:\n$p")
      // candidates must come from the 57-key hamming-ball probe
      // equi-join (bkey) over the collapsed distinct-hash frame — the
      // plan carries the ball key as the join key and the dhash group
      // aggregate below it (no 2^14-value band column anywhere:
      // VERDICT r16 #1)
      assert(p.contains("bkey"), s"$q: ball probe equi-join missing:\n$p")
      assert(!p.contains("bval"), s"$q: the r16 band join must be gone:\n$p")
      val ji = p.indexOf("bkey")
      val ai = p.indexOf("HashAggregate", ji)
      assert(ai > ji, s"$q: probe join must sit ABOVE the dhash collapse aggregate:\n$p")
    }
  }

  test("q_dedup_simhash_blocks: masked-key join over the distinct-signature frame, probes exchange reused") {
    val p = planOf("q_dedup_simhash_blocks")
    assert(!p.contains("SortAggregate"), s"signature collapse must stay hash-based:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs blow-up:\n$p")
    // candidates come from the (mask, simhash & mask) equi-join above
    // the distinct-signature collapse; the mask family is a broadcast
    // LocalRelation (bounded model), never a shuffled side
    assert(p.contains("bkey"), s"masked-key equi-join missing:\n$p")
    val ji = p.indexOf("bkey")
    val ai = p.indexOf("HashAggregate", ji)
    assert(ai > ji, s"probe join must sit ABOVE the signature collapse aggregate:\n$p")
    // the two self-join sides shuffle the SAME probes subtree on the
    // same keys: runtime AQE must serve one from the other's shuffle
    graft.io.CacheScope.releaseAll()
    spark.catalog.clearCache()
    val df = graft.io.KernelMemo.bypassed {
      SparkEntry.queries("q_dedup_simhash_blocks")(spark, sf())
    }
    df.collect()
    val pr = df.queryExecution.executedPlan.toString
    assert(pr.contains("ReusedExchange") || pr.contains("ReusedQueryStage"),
      s"probes diamond must collapse to one shuffle at runtime:\n$pr")
  }

  test("q_dedup_simhash_blocks_pairs: probe join above the distinct collapse; no all-pairs") {
    val p = planOf("q_dedup_simhash_blocks_pairs")
    assert(!p.contains("SortAggregate"), s"signature collapse must stay hash-based:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs blow-up:\n$p")
    assert(p.contains("bkey"), s"masked-key equi-join missing:\n$p")
    val ji = p.indexOf("bkey")
    val ai = p.indexOf("HashAggregate", ji)
    assert(ai > ji, s"probe join must sit ABOVE the distinct-signature collapse:\n$p")
  }

  test("q_html_extract: pure map stage — zero exchanges, no HOF in the hot path") {
    val p = planOf("q_html_extract")
    assert(!p.contains("Exchange"),
      s"tag-strip extraction must stay a per-row projection:\n$p")
    assert(p.contains("*(1)"), s"extraction chain must stay in one codegen span:\n$p")
  }

  test("q_html_pipeline: one line-df aggregate, no sort fallback, no pair join") {
    val p = planOf("q_html_pipeline")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortAggregate"),
      s"line df and lang rollup must stay in HashAggregate:\n$p")
  }

  test("q_langid_score: native per-row scoring loop, zero exchanges") {
    val p = planOf("q_langid_score")
    assert(!p.contains("Exchange"),
      s"corpus-wide langid scoring must stay a map stage:\n$p")
    assert(p.contains("langid_score"),
      s"scoring must run through the native trigram loop:\n$p")
  }

  test("q_decontaminate_bloom: bloom prefilter sits under the confirm join") {
    val p = planOf("q_decontaminate_bloom")
    // the probe must be a FILTER on the corpus stream (map-side, below
    // the confirm join), not a post-join residual; string positions
    // because AdaptiveSparkPlanExec does not expose its subtree to
    // collect() before execution: a tree prints parents BEFORE their
    // children, so the confirm join must appear before the filter
    val fi = p.indexOf("Filter might_contain")
    assert(fi >= 0, s"might_contain must be a map-side Filter operator:\n$p")
    val ji = p.indexOf("Join")
    assert(ji >= 0 && ji < fi, s"bloom filter must run below the confirm join:\n$p")
    // the bloom itself is a scalar subquery over the DISTINCT eval set
    assert(p.contains("bloom_filter_agg"), s"bloom build missing:\n$p")
  }

  test("semantic dedup: zero-exchange cell assignment, corpus-scaled plane count") {
    val bits = graft.queries.Similarity.semBits(spark, sf())
    val assign = graft.queries.Similarity.semanticAssign(spark, sf(), bits)
    // assignment is a pure per-row projection over the scan: nothing to
    // shuffle, nothing to broadcast, nothing that grows with the corpus
    val ap = assign.queryExecution.executedPlan.toString
    assert(!ap.contains("Exchange"), s"cell assignment must be map-only:\n$ap")
    // exactly one sign test per hyperplane, and the plane count is the
    // corpus-derived semBits(n) — the round-11 cap that replaced the
    // fixed-16-cell all-pairs generator
    // the cell id is the native PlaneCell loop (round 13 — the inlined
    // per-plane CaseWhen tree blew the fused-stage JIT budget); gate the
    // corpus-derived plane count on the expression's own `bits`
    val cells = assign.queryExecution.analyzed.expressions.flatMap(e =>
      e.collect { case pc: graft.functions.PlaneCell => pc })
    assert(cells.nonEmpty, "cell assignment must go through plane_cell")
    assert(cells.forall(_.bits == bits),
      s"expected $bits hyperplanes, saw ${cells.map(_.bits)}")
    val p = planOf("q_dedup_semantic")
    assert(!p.contains("GlobalLimit"),
      "a fixed-cardinality centroid seed set crept back into the semantic kernel")
    assert(!p.contains("BroadcastNestedLoop"), "pair join must stay an equi-join")
  }

  test("q_dedup_embedding: candidates are a (label, cell, salt) equi-join") {
    val p = planOf("q_dedup_embedding")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
    // the cell blocking key must be part of the join, not a residual
    // filter: join key lists print as [label#n, cell#n, salt#n]
    assert("\\[label#\\d+, cell#\\d+, salt#\\d+".r.findAllIn(p).nonEmpty,
      s"(label, cell, salt) join keys missing:\n$p")
  }

  test("q_semantic_diversity: map-only cell assignment, ONE window exchange") {
    val p = planOf("q_semantic_diversity")
    // the whole query is: per-row cell projection -> one shuffle on the
    // cell key -> window rank -> per-row keep filter. A second exchange
    // means the rank and the cell-size count stopped sharing the window
    // partitioning; a join means the count got computed separately.
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"diversity sampling must shuffle exactly once (the cell window):\n$p")
    assert(!p.contains("Join"), s"no join belongs in this plan:\n$p")
  }

  test("q_dedup_containment: inverted-index equi-join, never all-pairs") {
    val p = planOf("q_dedup_containment")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"containment pairs must come from the postings equi-join:\n$p")
    // pair aggregation is a plain HashAggregate (count + two firsts of
    // scalars) — an array-typed buffer would demote it to SortAggregate
    assert(!p.contains("SortAggregate"), s"pair aggregate fell back to sort:\n$p")
  }

  test("q_session_overlap: interval candidates come from the bucket equi-join") {
    val p = planOf("q_session_overlap")
    // the whole point of bucketizing: the interval predicate must be a
    // post-join filter on an EQUI-join keyed by the hour bucket, never
    // a nested-loop range join
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"interval join degenerated to a range nested-loop:\n$p")
    assert("\\[h#\\d+".r.findAllIn(p).nonEmpty, s"bucket key missing from join:\n$p")
  }

  test("q_search_bm25: query-term prune is map-side; top-k is a bounded heap") {
    val p = planOf("q_search_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      s"retrieval top-k must be orderBy+limit, not a window:\n$p")
    // the IN-list filter (rendered from the ONE shared term constant)
    // must sit in the scan's map stage: between the filter and the
    // parquet scan below it there can be no exchange — i.e. only
    // matching postings ever shuffle
    val inList = graft.queries.TextAnalysis.searchTerms.mkString(",")
    val fi = p.indexOf(inList)
    assert(fi >= 0, s"query-term filter missing:\n$p")
    val scanAfter = p.indexOf("Scan parquet", fi)
    assert(scanAfter > fi, s"no scan below the query-term filter:\n$p")
    assert(!p.substring(fi, scanAfter).contains("Exchange"),
      s"query-term filter is above an exchange — full postings shuffle:\n$p")
  }

  test("q_recursive_cte executes through Spark's native recursion operator") {
    val p = planOf("q_recursive_cte")
    assert(p.contains("UnionLoop") || p.contains("CTERecursion") || p.contains("Recursion"),
      s"recursive CTE should lower to the native loop operator:\n$p")
  }

  test("q_mine_bitext: candidates from the salted cell equi-join, never a cross product") {
    val p = planOf("q_mine_bitext")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "bitext candidates must come from the (probe, salt) equi-join, never A×B")
    assert(p.contains("plane_cell"), "cells must be the corpus-scaled SRP assignment")
    assert(p.contains("dot_f"), "ranking must run on the pinned left-fold double dot")
    assert("Window".r.findAllIn(p).size >= 2, "forward AND backward ranks are windows")
  }

  test("q_dsir_weights: bounded model broadcast back; one feature explode each pass") {
    val p = planOf("q_dsir_weights")
    assert(p.contains("BroadcastHashJoin"),
      "the ≤1024-row model must join back broadcast, never shuffle the corpus")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortAggregate"),
      "feature counting must stay in HashAggregate (no array buffers)")
  }

  test("q_unigram_encode: corpus joins the bounded trained vocab; per-doc hash aggregate") {
    val p = planOf("q_unigram_encode")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortAggregate"),
      "per-doc stats must stay in HashAggregate")
    assert(p.contains("unigram_segment"),
      "segmentation must be the native DP (paid on the vocab side)")
  }

  test("q_ccnet_buckets: the tercile window is lang-partitioned, never global") {
    // parsed-operator gate, not a plan-string regex: the old regexes
    // could never match Spark's real windowspecdefinition text and
    // would also pass on '[lang' anywhere in the plan (ADVICE r17)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = graft.io.KernelMemo.bypassed {
      SparkEntry.queries("q_ccnet_buckets")(spark, sf()).queryExecution.optimizedPlan
    }
    val ntileWindows = plan.collect {
      case w: LWindow if w.windowExpressions.exists(_.sql.contains("ntile(3)")) => w
    }
    assert(ntileWindows.nonEmpty, s"expected an ntile(3) window:\n$plan")
    for (w <- ntileWindows)
      assert(w.partitionSpec.exists(_.references.exists(_.name == "lang")),
        "the tercile window must partition by lang — an empty partition spec " +
          s"funnels the corpus to one task:\n$w")
  }

  test("streaming ingest ops are stateless maps: no aggregate, join, or state operator") {
    // the "pure map at 100 TB/day" claim as a plan gate: the scoring,
    // decontamination-gate and encode ops must contain NO Aggregate /
    // Join / Window / deduplicate node — their throughput scales with
    // executors because there is nothing to shuffle or hold. (The ops
    // take a DataFrame, so the same logical plan serves batch and
    // stream; gateContaminated additionally claims NO explode — the
    // native bloom_hits loop replaced it.)
    import org.apache.spark.sql.catalyst.plans.logical._
    val dir = sf()
    val docs = graft.io.Tables(spark, dir, "documents")
      .selectExpr("doc_id", "text")
    val vecs = graft.io.Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "embedding")
    val weights = graft.queries.TextAnalysis.trainedWeights(spark, dir)
    val (cents, cb) = graft.queries.Similarity.ivfadcModel(spark, dir)
    val bloom = graft.queries.TextAnalysis.evalBloomBytes(spark, dir)
    val pqcb = graft.queries.Similarity.pqModel(spark, dir).cb
    val ops = Seq(
      "scoreDocs" -> graft.streaming.Streams.scoreDocs(docs, weights),
      "gateContaminated" -> graft.streaming.Streams.gateContaminated(docs, bloom),
      "encodePq" -> graft.streaming.Streams.encodePq(vecs, pqcb),
      "encodeIvfadc" -> graft.streaming.Streams.encodeIvfadc(vecs, cents, cb),
      "dsirScore" -> graft.streaming.Streams.dsirScore(
        docs, graft.queries.Curation.dsirModel(spark, dir)),
      "unigramEncode" -> graft.streaming.Streams.unigramEncode(
        docs, graft.queries.Bpe.unigramModel(spark, dir)),
      "extractHtml" -> graft.streaming.Streams.extractHtml(
        graft.io.Tables(spark, dir, "documents")
          .selectExpr("doc_id", s"${graft.queries.Html.htmlSql} as html")),
      "langidAnnotate" -> graft.streaming.Streams.langidAnnotate(
        docs, graft.queries.LangId.trainedModel(spark, dir),
        graft.queries.LangId.langsOf(spark, dir)))
    graft.io.CacheScope.releaseAll()
    for ((name, df) <- ops) {
      val plan = df.queryExecution.analyzed
      val stateful = plan.collect {
        case a: Aggregate => a; case j: Join => j; case w: Window => w
        case d: Deduplicate => d
      }
      assert(stateful.isEmpty, s"$name is not a stateless map: ${stateful.map(_.nodeName)}")
    }
    val gatePlan = ops.find(_._1 == "gateContaminated").get._2.queryExecution.analyzed
    assert(gatePlan.collect { case g: Generate => g }.isEmpty,
      "gateContaminated must not explode — the native bloom_hits loop replaced it")
  }
}
