package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off plan probe for the D93 salted rewrite — prints the
  * executed plans and per-leg timings of the q83 shape, plain vs
  * steered, so a pessimization shows its mechanism, not just its
  * seconds. Usage: runMain graft.tools.SteerProbe <sfDir> */
object SteerProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    sys.props("graft.index.dir") =
      java.nio.file.Files.createTempDirectory("steerprobe").toString
    val SC = graft.operators.StatsCatalog
    val fix = graft.operators.Steering.ensureSkewFixture(spark, dir)
    SC.ensure(spark, fix, "skew_fact")
    SC.ensure(spark, fix, "skew_dim")
    SC.ensureKeyProfile(spark, fix, "skew_fact", "k", hotFreq = 200L)
    def shape = {
      val f = graft.Tables(spark, fix, "skew_fact")
      val d = graft.Tables(spark, fix, "skew_dim")
      f.join(d, f("k") === d("k")).groupBy(d("seg").as("seg"))
        .agg(count(lit(1)).as("n"), sum(floor($"value")).as("v"))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    noop(shape)
    (1 to 3).foreach { i =>
      println(f"plain_$i: ${timed(noop(shape))}%.3f s")
    }
    println("== PLAIN executed ==")
    val p = shape; noop(p)
    println(p.queryExecution.executedPlan.toString.take(4000))
    graft.plans.TransparentJoinSteering.enable(spark,
      broadcastBytes = 1024L, skewAvgFreq = 64.0, factor = 8)
    val s1 = shape
    require(s1.queryExecution.optimizedPlan.toString.contains("__salt_f"))
    noop(s1)
    (1 to 3).foreach { i =>
      println(f"salted_$i: ${timed(noop(shape))}%.3f s")
    }
    println("== SALTED executed ==")
    println(s1.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
