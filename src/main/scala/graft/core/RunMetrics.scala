package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** K2 (reference task.ts:174,255): per-run operational metrics.
  *
  * The reference logs `ok - fetched N earthquakes` per run; the engine
  * equivalent is a `QueryExecutionListener` that captures rows-out and
  * wall time for every action on the session — zero per-query code, and
  * on a cluster the same numbers land in the Spark UI/history server.
  */
final case class RunMetric(action: String, rowsOut: Option[Long],
    durationNs: Long, error: Option[String])

class RunMetricsListener extends QueryExecutionListener {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val buf = new ConcurrentLinkedQueue[RunMetric]()

  private def rowsOut(qe: QueryExecution): Option[Long] =
    qe.executedPlan.metrics.get("numOutputRows").map(_.value)

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = {
    val m = RunMetric(funcName, rowsOut(qe), durationNs, None)
    buf.add(m)
    log.info(s"ok - $funcName rows=${m.rowsOut.getOrElse(-1L)} " +
      f"in ${durationNs / 1e9}%.3fs")
  }

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = {
    buf.add(RunMetric(funcName, None, 0L, Some(exception.getMessage)))
    log.error(s"Error in $funcName: ${exception.getMessage}")
  }

  def metrics: Seq[RunMetric] = buf.asScala.toSeq
  def clear(): Unit = buf.clear()
}

object RunMetrics {
  /** Attach a fresh listener to the session and return it. */
  def register(spark: SparkSession): RunMetricsListener = {
    val l = new RunMetricsListener
    spark.listenerManager.register(l)
    l
  }
}
