package graft

import graft.streaming.BloomSidecar

class BloomSidecarSpec extends SparkSpec {
  import spark.implicits._

  private def mkDir(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-bloom-$tag").toString

  test("readCached opens each sidecar file once: list-only on no change, incremental on append, rebuild on fold") {
    val dir = mkDir("cache")
    BloomSidecar.write(spark,
      dir, BloomSidecar.build(Seq("a", "b").toDF("k"), "k"))
    val n0 = BloomSidecar.filesOpened.get()
    val f1 = BloomSidecar.readCached(spark, dir).get
    assert(BloomSidecar.filesOpened.get() === n0 + 1)
    // unchanged directory: pure listing, zero opens, same filter object
    val f2 = BloomSidecar.readCached(spark, dir).get
    assert(BloomSidecar.filesOpened.get() === n0 + 1)
    assert(f2 eq f1)
    // append a second sidecar: exactly ONE new open (incremental merge),
    // and the cached union now covers the new keys
    BloomSidecar.write(spark,
      dir, BloomSidecar.build(Seq("c").toDF("k"), "k"))
    val f3 = BloomSidecar.readCached(spark, dir).get
    assert(BloomSidecar.filesOpened.get() === n0 + 2)
    assert(f3.mightContainString("c") && f3.mightContainString("a"))
    // fold rewrites the file set (delete + merged write): the subset
    // check fails and the cache rebuilds from the single folded file
    BloomSidecar.fold(spark, dir)  // opens the 2 files itself
    val nAfterFold = BloomSidecar.filesOpened.get()
    val f4 = BloomSidecar.readCached(spark, dir).get
    assert(BloomSidecar.filesOpened.get() === nAfterFold + 1)
    assert(f4.mightContainString("a") && f4.mightContainString("c"))
  }

  test("a 4-batch ingest fold pays O(1) sidecar opens per batch, not O(#segments)") {
    val root = mkDir("ingest")
    val corpus = s"$root/corpus"
    val index = s"$root/index"
    def batch(lo: Int) = (lo until lo + 40)
      .map(i => (i.toLong, s"document number $i with enough words to pass quality " +
        "checks because the filter wants real sentence length and variety here"))
      .toDF("id", "text")
    val n0 = BloomSidecar.filesOpened.get()
    (0 until 4).foreach(b => graft.streaming.Ingest.ingestBatch(
      batch(b * 40), corpus, index))
    // batch 0 finds no sidecar; batches 1-3 each open exactly the ONE
    // sidecar appended since their previous call (the uncached cost
    // would be 0+1+2+3 = 6 opens)
    assert(BloomSidecar.filesOpened.get() === n0 + 3,
      s"expected 3 opens across 4 batches, got ${BloomSidecar.filesOpened.get() - n0}")
    // and the fold still deduplicates: replaying batch 2 appends nothing
    val before = spark.read.parquet(corpus).count()
    graft.streaming.Ingest.ingestBatch(batch(80), corpus, index)
    assert(spark.read.parquet(corpus).count() === before)
  }
}
