package graft

/** Smoke test for the executable runbook: the full curation chain runs
  * on sf0.001, every gate only shrinks the corpus, and the packing
  * stage emits sequences + eval shards. */
class CorpusDemoSpec extends SparkSpec {

  test("corpus demo chain composes end-to-end; gates monotone; manifests written") {
    val out = java.nio.file.Files.createTempDirectory("corpus-demo-spec").toString
    val stats = CorpusDemo.run(spark, "/root/testdata/sf0.001", out).toMap
    assert(stats("raw") > 0)
    // each filtering stage can only shrink the doc set
    val order = Seq("raw", "quality_gate", "exact_dedup", "neardup_dedup",
      "fluency_head_middle", "train_split", "temperature_mix")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(stats(b) <= stats(a), s"$b (${stats(b)}) must not exceed $a (${stats(a)})")
    }
    // the near-dup chain and the fluency tail cut must both actually bite
    assert(stats("neardup_dedup") < stats("raw"))
    assert(stats("fluency_head_middle") < stats("neardup_dedup"))
    assert(stats("packed_sequences") > 0)
    // manifests on disk: sequence spans + partitioned eval shards
    assert(spark.read.parquet(s"$out/seq_manifest").count() > 0)
    assert(new java.io.File(s"$out/eval", "split=val").isDirectory ||
      new java.io.File(s"$out/eval", "split=test").isDirectory,
      "at least one eval shard directory must exist")
  }
}
