package graft.runner

/** Restart-cost measurement for the durable model artifacts (round 20):
  * per model family, the on-demand TRAINING time from a corpus versus
  * the LOAD time from an exported artifact dir — the cost a restarted
  * ingest direction pays at every stream start without `model_export`,
  * versus with it.
  *
  * Usage: `runMain graft.runner.ModelStoreBench [corpusDir] [artifactDir]`
  * (defaults: sf0.01, a temp dir). Prints one JSON line:
  * `{"train": {family: sec}, "export_write": sec, "load": {family: sec},
  *   "train_total": sec, "load_total": sec}`.
  *
  * Method notes: one session, one JVM — the trainers memoize per
  * (session, dir), so training times are COLD (first touch of the
  * corpus key) and loads run against the distinct artifact key.
  * Training runs first, which hands the LOAD side any JIT warmup
  * benefit; the gap is orders of magnitude, so the bias does not
  * change the conclusion (recorded in SURVEY §8.11). */
object ModelStoreBench {

  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1)
      else "file:" + java.nio.file.Files.createTempDirectory("graft_models").toString
    val spark = graft.io.Sessions.local("graft-modelbench")
    try {
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // each thunk forces the family's full model materialization for
      // the given dir (blocklist is a frame — count() materializes)
      def touches(dir: String): Seq[(String, () => Unit)] = Seq(
        "classifier" -> (() => graft.queries.TextAnalysis.trainedWeights(spark, dir)),
        "langid" -> { () =>
          graft.queries.LangId.langsOf(spark, dir)
          graft.queries.LangId.trainedModel(spark, dir)
        },
        "dsir" -> (() => graft.queries.Curation.dsirModel(spark, dir)),
        "unigram" -> (() => graft.queries.Bpe.unigramModel(spark, dir)),
        "bloom" -> (() => graft.queries.TextAnalysis.evalBloomBytes(spark, dir)),
        "ivfadc" -> (() => graft.queries.Similarity.ivfadcModel(spark, dir)),
        "blocklist" -> (() => graft.queries.Url.blocklistFrame(spark, dir).count()))
      val train = touches(corpus).map { case (f, go) => f -> time(go()) }
      // models are now session-cached for the corpus key: the export
      // write cost is the parquet/manifest IO alone
      val exportSec = time(graft.io.ModelStore.exportModels(spark, corpus, outDir))
      val load = touches(outDir).map { case (f, go) => f -> time(go()) }
      def obj(kv: Seq[(String, Double)]) =
        kv.map { case (k, v) => s""""$k": ${f"$v%.3f"}""" }.mkString("{", ", ", "}")
      println(s"""{"train": ${obj(train)}, "export_write": ${f"$exportSec%.3f"}, """ +
        s""""load": ${obj(load)}, "train_total": ${f"${train.map(_._2).sum}%.3f"}, """ +
        s""""load_total": ${f"${load.map(_._2).sum}%.3f"}}""")
    } finally graft.io.Sessions.stop(spark)
  }
}
