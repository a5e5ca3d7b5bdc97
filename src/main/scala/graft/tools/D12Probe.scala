package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway profiling harness for d12 at the 100× replica. */
object D12Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/tmp/sfx100")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = graft.Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, t) =>
        (id, graft.functions.HashSketch.shingle3(t).toSeq) }
      .toDF("doc_id", "toks")
      .withColumn("sz", size($"toks").cast("long"))
    val tok = d.select($"doc_id", $"sz", explode($"toks").as("tok"))
    time("tok explode count")(println("rows=" + tok.count()))
    val df = tok.groupBy($"tok").agg(count(lit(1)).as("df"))
    time("df")(println("vocab=" + df.count()))
    val ranked = tok.join(df, "tok")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df", $"tok")))
    val prefix = ranked
      .where($"rk" <= $"sz" - (($"sz" * 9 + 9) / 10).cast("long") + 1)
      .select($"doc_id", $"sz", $"tok")
    time("prefix")(println("prefix=" + prefix.count()))
    val cand = prefix.select($"doc_id".as("doc_a"), $"sz".as("sz_a"), $"tok")
      .join(prefix.select($"doc_id".as("doc_b"), $"sz".as("sz_b"), $"tok"), "tok")
      .where($"doc_a" < $"doc_b" &&
        $"sz_b" * 10 >= $"sz_a" * 9 && $"sz_a" * 10 >= $"sz_b" * 9)
      .select($"doc_a", $"doc_b").distinct()
    time("cand")(println("cand=" + cand.count()))
    spark.stop()
  }
}
