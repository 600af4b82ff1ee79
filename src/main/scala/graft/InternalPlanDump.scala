package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** EXECUTED-plan dumps for queries whose interesting plans run EAGERLY
  * at plan-build time (localCheckpoint pipelines): the registered plan
  * tail is just a LogicalRDD + sort, so [[PlanDump]] can't show a
  * dispatch-arm change — this main records every execution the query
  * triggers, end to end, via a QueryExecutionListener (the round-17
  * `*_internal_*.txt` evidence files).
  *
  * Usage: `runMain graft.InternalPlanDump <outFile> <query> [sfDir] [k=v ...]`
  * — trailing `k=v` args are session confs pinned before the run (e.g.
  * `spark.graft.pairJoin.allPairsMaxGroups=0` forces the prefix/band arm).
  */
object InternalPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: InternalPlanDump <outFile> <query> [sfDir] [k=v ...]")
    val outFile = args(0)
    val name = args(1)
    val sf = args.lift(2).filterNot(_.contains("=")).getOrElse("/root/testdata/sf0.01")
    val confs = args.drop(2).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString; () }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    SparkEntry.queries(name)(spark, sf)
      .write.mode("overwrite").format("noop").save()
    Thread.sleep(2000) // QueryExecutionListener bus is async; let it drain
    val body = plans.zipWithIndex
      .map { case (p, i) => s"---- executed plan $i ----\n$p" }
      .mkString("\n")
      .linesIterator.map(l =>
        if (l.length <= 500) l
        else l.take(240) + s" …[${l.length - 480} chars elided]… " + l.takeRight(240))
      .mkString("", "\n", "\n")
    Files.createDirectories(Paths.get(outFile).getParent)
    Files.writeString(Paths.get(outFile), body)
    println(s"wrote $outFile (${plans.size} executed plans)")
    spark.stop()
  }
}
