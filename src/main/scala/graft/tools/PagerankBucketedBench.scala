package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Receipt tool for the bucketed PageRank serving shape (the r10
  * verdict's ask: "wire q54 to the bucketed-edge shape it advises"):
  * builds q54's customer–supplier graph from a scale dir, writes the
  * src-bucketed degree-annotated edge table ONCE (timed — the
  * amortized construction a deployment pays per graph lifetime, not
  * per ranking), then times the SUPERSTEP-ONLY ranking
  * ([[graft.operators.GraphRank.pagerankBucketed]]) cold — no
  * corpus-sized cache exists in this path, so the number is honest
  * by construction (no warm-cache receipt hazard). Prints one JSON
  * line; recorded in BENCH_SCALE.json.
  *
  * Usage: runMain graft.tools.PagerankBucketedBench <sfDir> <tablePath> [iters]
  */
object PagerankBucketedBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val path = args(1)
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("DROP TABLE IF EXISTS pr_edges_bench")
    val eb = graft.Tables(spark, dir, "orders")
      .join(graft.Tables(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = eb.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(eb.select(col("s").as("src"), col("c").as("dst")))
    val t0 = System.nanoTime()
    val tbl = graft.operators.GraphRank
      .writeEdgesBucketed(edges, "pr_edges_bench", path)
    val build = (System.nanoTime() - t0) / 1e9
    val nEdges = tbl.count()
    val t1 = System.nanoTime()
    val ranks = graft.operators.GraphRank.pagerankBucketed(tbl, iters)
    // q54's output shape, fully materialized through the noop sink
    ranks.where(col("node") % 2 === 1)
      .select(expr("(node - 1) DIV 2").as("supp_key"),
        col("rank").as("rank_e6"))
      .orderBy(col("rank_e6").desc, col("supp_key")).limit(20)
      .write.format("noop").mode("overwrite").save()
    val steps = (System.nanoTime() - t1) / 1e9
    ranks.unpersist()
    println(f"""{"metric":"pagerank_bucketed","sf":"$dir","edges":$nEdges,"build_once_sec":$build%.2f,"supersteps_sec":$steps%.2f,"iters":$iters}""")
    spark.stop()
  }
}
