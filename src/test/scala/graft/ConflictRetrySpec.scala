package graft

import graft.ext.ManifestTable

/** Optimistic concurrency across the row-level family
  * ([[graft.ext.ManifestTable.retryOnConflict]]): disjoint-FILE writers
  * both land without help (per-candidate conflict checks), same-file
  * disjoint-row races land through a bounded REBASE (re-execution
  * against the fresh head — the serializable loser-after-winner order),
  * and a perpetually-conflicted op raises loudly instead of silently
  * dropping a mutation.
  */
class ConflictRetrySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = s"/tmp/graft_test/conflictretry_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  private def ids(dir: String): Seq[Long] =
    ManifestTable.read(spark, dir).select("id").as[Long]
      .collect().toSeq.sorted

  test("disjoint-FILE writers both land with no retry: conflicts are per-candidate") {
    val dir = tmp("disjoint")
    ManifestTable.append((0L until 50L).map(i => (i, s"d$i"))
      .toDF("id", "text"), dir, "b0")
    ManifestTable.append((50L until 100L).map(i => (i, s"d$i"))
      .toDF("id", "text"), dir, "b1")
    // the CoW update's candidates sit in b1's files; the DV delete
    // lands on b0's mid-flight — neither touches the other's files
    assert(ManifestTable.updateWhere(spark, dir, "id >= 60 AND id < 70",
      Map("text" -> "upper(text)"), "u0", beforeSwap = () => {
        assert(ManifestTable.deleteWhereDV(spark, dir, "id < 5", "d0")); ()
      }),
      "a writer must not abort on a concurrent commit to OTHER files")
    assert(ids(dir) === (5L until 100L))
    assert(ManifestTable.read(spark, dir)
      .where("text = upper(text) AND id >= 60 AND id < 70").count() === 10L)
  }

  test("same-file disjoint-row race: plain op aborts, retryOnConflict rebases both to success") {
    val dir = tmp("samefile")
    ManifestTable.append((0L until 100L).map(i => (i, s"d$i"))
      .toDF("id", "text"), dir, "b0")
    // ONE file: every op's candidate set is that file
    ManifestTable.compact(spark, dir,
      targetFileBytes = 1024L * 1024 * 1024, clusterBy = Seq("id"))
    require(ManifestTable.snapshot(spark, dir).files.size == 1)
    // pinned abort: the DV landed on the update's candidate after its
    // positions were read — committing would resurrect the deleted rows
    assert(!ManifestTable.updateWhere(spark, dir, "id >= 90",
      Map("text" -> "upper(text)"), "u0", beforeSwap = () => {
        assert(ManifestTable.deleteWhereDV(spark, dir, "id < 5", "d0")); ()
      }), "the overlapping-candidate race must still abort without retry")
    assert(ids(dir) === (5L until 100L))
    assert(ManifestTable.read(spark, dir)
      .where("text = upper(text)").count() === 0L)
    // with the rebase wrapper, attempt 2 re-reads through the new DV
    // and lands; the racing delete (same opId) replays to a no-op
    assert(ManifestTable.retryOnConflict(spark, dir, "u1") {
      ManifestTable.updateWhere(spark, dir, "id >= 90",
        Map("text" -> "upper(text)"), "u1", beforeSwap = () => {
          ManifestTable.deleteWhereDV(spark, dir, "id >= 5 AND id < 8", "d1")
          ()
        })
    }, "the rebase must land the update once the DV settles")
    assert(ids(dir) === (8L until 100L))
    assert(ManifestTable.read(spark, dir)
      .where("text = upper(text) AND id >= 90").count() === 10L)
    // and nothing below 90 was touched by the rebased rewrite
    assert(ManifestTable.read(spark, dir)
      .where("text = upper(text) AND id < 90").count() === 0L)
  }

  test("a perpetually-conflicted op exhausts its rebases and raises loudly") {
    val dir = tmp("exhaust")
    ManifestTable.append((0L until 100L).map(i => (i, s"d$i"))
      .toDF("id", "text"), dir, "b0")
    ManifestTable.compact(spark, dir,
      targetFileBytes = 1024L * 1024 * 1024, clusterBy = Seq("id"))
    var n = 0
    val e = intercept[java.util.ConcurrentModificationException] {
      ManifestTable.retryOnConflict(spark, dir, "u-never", attempts = 2) {
        ManifestTable.updateWhere(spark, dir, "id >= 90",
          Map("text" -> "upper(text)"), "u-never", beforeSwap = () => {
            n += 1 // a FRESH DV lands on the candidate every attempt
            assert(ManifestTable.deleteWhereDV(spark, dir,
              s"id = ${n - 1}", s"d$n"))
            ()
          })
      }
    }
    assert(e.getMessage.contains("rebase"))
    assert(n === 3, s"expected 1 try + 2 rebases, saw $n attempts")
    // every racing delete landed; the update never did
    assert(ids(dir) === (3L until 100L))
    assert(ManifestTable.read(spark, dir)
      .where("text = upper(text)").count() === 0L)
  }
}
