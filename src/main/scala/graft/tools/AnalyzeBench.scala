package graft.tools

import org.apache.spark.sql.SparkSession

/** Receipt runner for the ANALYZE trade ([[graft.operators
  * .StatsCatalog]]): times the EXACT profile (one Expand×(k+1)
  * distinct pass — the scheduled-maintenance cost) against the
  * APPROX profile (one plain HLL++ pass — the always-on cost) for a
  * table, each against a fresh artifact root so nothing serves warm.
  * Usage: runMain graft.tools.AnalyzeBench <sfDir> <table> */
object AnalyzeBench {
  def main(args: Array[String]): Unit = {
    val Array(dir, table) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(mode: String, f: () => Unit): Double = {
      sys.props("graft.index.dir") =
        java.nio.file.Files.createTempDirectory(s"analyze-$mode").toString
      val t0 = System.nanoTime()
      f()
      val sec = (System.nanoTime() - t0) / 1e9
      sys.props.remove("graft.index.dir")
      sec
    }
    val exact = timed("exact",
      () => graft.operators.StatsCatalog.ensure(spark, dir, table))
    val approx = timed("approx",
      () => graft.operators.StatsCatalog.ensureApprox(spark, dir, table))
    println(f"""{"metric":"analyze","table":"$table","sf":"$dir","exact_sec":$exact%.3f,"approx_sec":$approx%.3f}""")
    spark.stop()
  }
}
