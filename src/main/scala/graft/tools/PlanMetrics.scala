package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Measured shuffle-volume audit: executes a DataFrame to a noop sink
  * and reports, per shuffle exchange, the rows and bytes it actually
  * carried (from the exchange's SQLMetrics). This turns the PLANS.md
  * cost model from an estimate into a measurement — the number that
  * decides whether a plan survives a 100× scale-up is precisely
  * "bytes through the biggest exchange per input row".
  */
object PlanMetrics {

  case class ExchangeStat(partitioning: String, rows: Long, dataSize: Long)

  /** Execute fully and collect per-exchange metrics. The DataFrame's
    * OWN QueryExecution is driven (`toRdd`): a sink write or count()
    * would plan a separate execution whose metrics this df's plan
    * never sees. */
  def shuffles(df: DataFrame): Seq[ExchangeStat] = {
    df.queryExecution.toRdd.foreach(_ => ())
    val exchanges = scala.collection.mutable.ArrayBuffer.empty[ExchangeStat]
    def record(e: ShuffleExchangeLike): Unit = {
      val m = e.metrics
      exchanges += ExchangeStat(
        e.outputPartitioning.toString,
        m.get("shuffleRecordsWritten").orElse(m.get("numOutputRows"))
          .map(_.value).getOrElse(-1L),
        m.get("shuffleBytesWritten").orElse(m.get("dataSize"))
          .map(_.value).getOrElse(-1L))
    }
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: ShuffleQueryStageExec =>
        record(s.shuffle)
        s.shuffle.children.foreach(walk)
      case q: QueryStageExec =>
        q.plan.children.foreach(walk)
      case e: ShuffleExchangeLike =>
        record(e)
        e.children.foreach(walk)
      case other =>
        other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    exchanges.toSeq
  }
}
