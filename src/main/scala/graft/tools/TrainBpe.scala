package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.Bpe

/** Offline vocabulary build for the F1 BPE tokenizer: pre-tokenize the
  * documents corpus, count pre-token frequencies distributed, train the
  * merges table on the driver (classic most-frequent-pair loop over the
  * DISTINCT-piece frequency map — an index build over a vocabulary, not a
  * row-data collect), and write the published `left right` merges format.
  *
  *   sbt "runMain graft.tools.TrainBpe /root/testdata/sf0.01 \
  *        src/main/resources/graft/bpe_merges.txt 256"
  *
  * The output is committed as a resource so every executor loads the same
  * frozen vocabulary; retraining is an explicit, versioned act.
  */
object TrainBpe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val numMerges = if (args.length > 2) args(2).toInt else 256

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-train-bpe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    try {
      // Pre-tokens containing newlines (whitespace-run pieces like "\n\n")
      // are excluded from training: a merge over such a symbol would
      // corrupt the newline-delimited `left right` merges format that
      // Bpe.defaultMerges parses back (ADVICE r3). Untrained pieces still
      // encode fine — they just never merge past characters.
      val pieceFreq: Map[String, Long] =
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select("text").as[String]
          .flatMap(Bpe.preTokenize)
          .filter(p => !p.exists(c => c == '\n' || c == '\r'))
          .groupByKey(identity).count()
          .collect().toMap
      val merges = Bpe.train(pieceFreq, numMerges)
      val file = java.nio.file.Paths.get(outPath)
      java.nio.file.Files.createDirectories(file.getParent)
      java.nio.file.Files.write(file,
        merges.map { case (a, b) => s"$a $b" }.mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[train-bpe] vocabulary pieces=${pieceFreq.size} merges=${merges.size} -> $outPath")
    } finally spark.stop()
  }
}
