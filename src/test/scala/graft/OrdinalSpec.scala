package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Ordinal

class OrdinalSpec extends SparkSpec {
  import spark.implicits._

  test("withGlobalPos equals the single-partition row_number, distributed") {
    // ids arrive shuffled across several partitions; positions must be the
    // global rank by id regardless
    val ids = scala.util.Random.shuffle((0L until 500L).toList)
    val df = ids.map(i => (i, s"doc$i")).toDF("doc_id", "text")
      .repartition(7)
    val got = Ordinal.withGlobalPos(df, "doc_id")
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val want = df
      .select(col("doc_id"),
        (row_number().over(Window.orderBy("doc_id")) - 1).cast("long").as("pos"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    // contiguous 0-based, and no single-partition window in the plan
    assert(got.values.toSeq.sorted === (0L until 500L).toSeq)
  }

  test("withGlobalPos keeps all original columns and handles empty input") {
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val out = Ordinal.withGlobalPos(df, "doc_id")
    assert(out.columns.toSeq === Seq("doc_id", "text", "pos"))
    assert(out.orderBy("pos").as[(Long, String, Long)].collect().toSeq ===
      Seq((1L, "a", 0L), (2L, "b", 1L), (3L, "c", 2L)))
    val empty = Ordinal.withGlobalPos(df.filter(col("doc_id") < 0), "doc_id")
    assert(empty.count() === 0)
  }
}
