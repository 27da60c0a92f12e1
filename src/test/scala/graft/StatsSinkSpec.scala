package graft

import org.apache.spark.sql.functions._
import graft.streaming.StatsSink

/** Incremental corpus statistics: per-batch partial-aggregate segments
  * must fold to exactly the one-shot aggregate, under any batching, with
  * compaction invisible to totals.
  */
class StatsSinkSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val p = s"/tmp/graft_test/stats_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "un deux", "fr"),
      (3L, "one two three four", "en"),
      (4L, "eins", "de"),
      (5L, "cinq six sept", "fr"),
      (6L, null.asInstanceOf[String], null.asInstanceOf[String])
    ).toDF("doc_id", "text", "lang")
  }

  private def totals(dir: String): Map[String, (Long, Long, Long)] =
    StatsSink.read(spark, dir).collect().map { r =>
      (if (r.isNullAt(0)) "∅" else r.getString(0)) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
    }.toMap

  test("3-batch fold equals the one-shot aggregate (associativity)") {
    val dir = tmp("fold")
    (0L until 3L).foreach { i =>
      StatsSink.append(docs.filter(col("doc_id") % 3 === i), dir)
    }
    val oneShot = tmp("oneshot")
    StatsSink.append(docs, oneShot)
    assert(totals(dir) === totals(oneShot))
    assert(totals(dir)("en") === ((2L, 7L, 34L)))
    assert(totals(dir)("fr") === ((2L, 5L, 20L)))
  }

  test("empty store reads as an empty frame with the stats schema") {
    val dir = tmp("empty")
    val r = StatsSink.read(spark, dir)
    assert(r.columns.toSeq === Seq("lang", "n_docs", "n_tokens", "n_chars"))
    assert(r.count() === 0L)
  }

  test("an empty batch appends a no-op segment (composed-replay idempotence)") {
    val dir = tmp("noop")
    StatsSink.append(docs, dir)
    val before = totals(dir)
    // a crash-replayed ingest batch contributes zero survivors: the
    // composed stats append must leave totals unchanged
    StatsSink.append(docs.filter(lit(false)), dir)
    assert(totals(dir) === before)
  }

  test("null language rolls up under its own group, never dropped") {
    val dir = tmp("nulllang")
    StatsSink.append(docs, dir)
    val t = totals(dir)
    assert(t.contains("∅"))
    assert(t.values.map(_._1).sum === 6L)
  }

  test("distinct-content sketches: batch-fold merge equals one-shot, estimate matches exact") {
    val dir = tmp("hll_fold")
    (0L until 3L).foreach { i =>
      StatsSink.append(docs.filter(col("doc_id") % 3 === i), dir)
    }
    val oneShot = tmp("hll_oneshot")
    StatsSink.append(docs, oneShot)
    def est(d: String): Map[String, Long] =
      StatsSink.readWithDistinct(spark, d).collect()
        .filter(!_.isNullAt(0))
        .map(r => r.getString(0) -> r.getLong(4)).toMap
    // register-max merge: the folded partials are the SAME sketch as
    // the one-shot build, not merely a close one
    assert(est(dir) === est(oneShot))
    // at this cardinality HLL is exact: 2 distinct texts per language
    assert(est(dir)("en") === 2L && est(dir)("fr") === 2L)
  }

  test("compaction folds segment files without changing totals") {
    val dir = tmp("compact")
    (0L until 3L).foreach { i =>
      StatsSink.append(docs.filter(col("doc_id") % 3 === i), dir)
    }
    val before = totals(dir)
    val (in, out) = StatsSink.compact(spark, dir)
    assert(in === 3 && out === 1)
    assert(totals(dir) === before)
  }
}
