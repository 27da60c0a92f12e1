package graft

import org.apache.spark.sql.functions._
import graft.operators.Batching

class BatchingSpec extends SparkSpec {
  import spark.implicits._

  private def mkInput(tokens: Seq[Long]) =
    tokens.zipWithIndex.map { case (t, i) =>
      (i.toLong, s"id-$i", s"sentence $i", t)
    }.toDF("pos", "description_id", "english_sentence", "tokens")

  /** Sequential reference semantics (auto_translate.py:281-300) re-derived
    * in the test: greedy reset-on-overflow with carry-in base cost.
    */
  private def sequentialBatches(tokens: Seq[Long], budget: Long, base: Long): Seq[Long] = {
    var batch = -1L; var running = 0L; var open = false
    tokens.map { t =>
      val cost = Batching.rowCost(t)
      if (!open || running + cost > budget) { batch += 1; running = base + cost; open = true }
      else running += cost
      batch
    }
  }

  test("single-partition packing matches the sequential reference exactly") {
    val tokens = Seq[Long](100, 200, 50, 900, 10, 10, 10, 800, 5, 450, 300, 20)
    val got = Batching.assignBatches(mkInput(tokens), budget = 1500, baseCost = 30,
      numPartitions = 1)
      .orderBy("pos").select("batch_index").as[Long].collect().toSeq
    assert(got == sequentialBatches(tokens, 1500, 30))
  }

  test("every batch stays within budget; order and multiset preserved") {
    val tokens = (1 to 500).map(i => (i * 37 % 300 + 1).toLong)
    val df = Batching.assignBatches(mkInput(tokens), budget = 2000, baseCost = 50,
      numPartitions = 4)
    val rows = df.orderBy("pos")
      .select("pos", "batch_index", "tokens").as[(Long, Long, Long)].collect()
    // order: batch_index non-decreasing in pos; ids contiguous from 0
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(rows.map(_._2).distinct.sorted.toSeq == (0L until rows.map(_._2).distinct.length).toSeq)
    // multiset: nothing lost or duplicated
    assert(rows.map(_._1).toSeq == (0L until 500).toSeq)
    // budget: sum of row costs within each batch ≤ budget - base
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val total = 50 + rs.map(r => Batching.rowCost(r._3)).sum
      assert(total <= 2000, s"batch over budget: $total")
    }
  }

  test("explicit-part packing: per-part sequential semantics, stitched globally") {
    val tokens = (1 to 200).map(i => (i * 53 % 400 + 1).toLong)
    val parts = 4
    val n = tokens.length
    val withPart = mkInput(tokens)
      .withColumn("part", expr(s"CAST((pos * $parts) DIV $n AS INT)"))
    val got = Batching.assignBatchesByPart(withPart, "part", parts,
      budget = 1200, baseCost = 25)
      .orderBy("pos").select("batch_index").as[Long].collect().toSeq
    // expected: pack each contiguous quarter with the sequential reference,
    // then offset by the cumulative batch counts of earlier quarters
    val quarters = tokens.zipWithIndex.groupBy { case (_, i) => i * parts / n }
      .toSeq.sortBy(_._1).map(_._2.map(_._1))
    val perPart = quarters.map(q => sequentialBatches(q, 1200, 25))
    val offs = perPart.map(_.distinct.length.toLong).scanLeft(0L)(_ + _)
    val expected = perPart.zip(offs).flatMap { case (b, o) => b.map(_ + o) }
    assert(got == expected)
    // contiguous ids from 0, nothing lost
    assert(got.distinct.sorted == (0L until got.distinct.length).toSeq)
  }

  test("an oversized row still gets its own batch") {
    val got = Batching.assignBatches(mkInput(Seq(10L, 99999L, 10L)),
      budget = 100, baseCost = 0, numPartitions = 1)
      .orderBy("pos").select("batch_index").as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L))
  }

  test("custom_id formatting is 1-based batch-%04d") {
    val df = Batching.assignBatches(mkInput(Seq(10L, 10L)), budget = 10000,
      numPartitions = 1)
    assert(df.select("custom_id").distinct.as[String].collect().toSeq == Seq("batch-0001"))
  }

  test("buildRequests emits one envelope per batch with ordered user map") {
    val assigned = Batching.assignBatches(mkInput(Seq(10L, 10L, 10L)),
      budget = 10000, numPartitions = 1)
    val req = Batching.buildRequests(assigned, "SYS")
    assert(req.count() == 1)
    val row = req.select(element_at(col("body.messages"), 2).getField("content"))
      .as[String].head()
    assert(row == """{"id-0":"sentence 0","id-1":"sentence 1","id-2":"sentence 2"}""")
  }
}
