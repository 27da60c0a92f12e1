package graft

import graft.ext.ManifestTable

/** I/O-count contracts of the row-level ops (VERDICT r11 #7), pinned at
  * the filesystem seam via [[CountingFs]]: turning CDC on must add ZERO
  * extra opens of the candidate data files — the candidate frame is
  * read once and every further pass (deleted rows, pre/postimages) hits
  * the persisted copy.
  */
class ManifestIoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    CountingFs.install(spark)
    val d = s"cfile:///tmp/graft_test/mio_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(d), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  /** Two byte-identical clustered tables, so per-file open counts are
    * comparable between a cdc=false run on one and a cdc=true run on
    * the other.
    */
  private def twin(name: String): (String, String) = {
    val dirs = (tmp(s"${name}_a"), tmp(s"${name}_b"))
    Seq(dirs._1, dirs._2).foreach { d =>
      ManifestTable.append(
        (0L until 400L).map(x => (x, s"doc $x")).toDF("id", "text"),
        d, "b0")
      ManifestTable.compact(spark, d, targetFileBytes = 2L * 1024,
        clusterBy = Seq("id"))
    }
    dirs
  }

  /** Opens of `dir`'s CURRENT data files during `op`. */
  private def opensDuring(dir: String)(op: => Unit): Long = {
    val before = ManifestTable.snapshot(spark, dir).files.toSet
    val prefix = new java.net.URI(dir).getPath + "/data/"
    CountingFs.reset()
    op
    CountingFs.opensUnder(prefix, before)
  }

  test("a CDC delete opens each candidate file no more than a plain delete (single pass)") {
    val (a, b) = twin("del")
    val plain = opensDuring(a) {
      assert(ManifestTable.deleteWhere(spark, a,
        "id >= 100 AND id < 140", "d0"))
    }
    val withCdc = opensDuring(b) {
      assert(ManifestTable.deleteWhere(spark, b,
        "id >= 100 AND id < 140", "d0", cdc = true))
    }
    assert(plain > 0)
    assert(withCdc === plain,
      s"CDC delete opened candidate files $withCdc times vs $plain plain")
  }

  test("a CDC update opens each candidate file no more than a plain update (single pass)") {
    val (a, b) = twin("upd")
    val set = Map("text" -> "concat(text, '!')")
    val plain = opensDuring(a) {
      assert(ManifestTable.updateWhere(spark, a,
        "id >= 100 AND id < 140", set, "u0"))
    }
    val withCdc = opensDuring(b) {
      assert(ManifestTable.updateWhere(spark, b,
        "id >= 100 AND id < 140", set, "u0", cdc = true))
    }
    assert(plain > 0)
    assert(withCdc === plain,
      s"CDC update opened candidate files $withCdc times vs $plain plain")
  }
}
