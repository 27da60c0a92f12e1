package graft

/** Mirrors the driver's smoke check: `SparkEntry.entry` on sf0.001 must
  * produce rows (the fault-injecting end-to-end pipeline over documents).
  */
class EntrySpec extends SparkSpec {
  test("driver smoke contract: entry() yields rows at sf0.001") {
    val out = SparkEntry.entry(spark)
    assert(out.count() > 0)
    assert(out.columns.contains("translated_sentence"))
  }
}
