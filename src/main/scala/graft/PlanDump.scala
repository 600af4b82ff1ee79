package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Per-query `explain(formatted)` dumps for the optimization-round
  * evidence files (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Usage: `sbt "runMain graft.PlanDump <outDir> <suffix> <query>[,<query>...]"`
  * — writes `<outDir>/<query>_<suffix>.txt` for each named query (or for
  * every registered query when the list is `all`). Same session config
  * as [[Plans]] so dumps are comparable across invocations.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...|all> [sfDir]")
    val Array(outDir, suffix, qlist) = args.take(3)
    val sf = args.lift(3).getOrElse("/root/testdata/sf0.001")
    val names =
      if (qlist == "all") SparkEntry.queries.keys.toSeq.sorted
      else qlist.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        .linesIterator.map(l =>
          if (l.length <= 500) l
          else l.take(240) + s" …[${l.length - 480} chars elided]… " + l.takeRight(240))
        .mkString("", "\n", "\n")
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
