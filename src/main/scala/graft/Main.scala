package graft

import graft.sources.{DiscogsLake, DiscogsXml, Ingest}
import org.apache.spark.sql.SparkSession

/** CLI entry with the reference's single-dump parameter surface
  * (run.py:59-87 `lambda_handler`: input_file, bucket_name; chunk size is
  * subsumed by Spark partitioning):
  *
  * {{{
  * Main <input_xml[.gz]> <output_lake_dir> [expected_sha256]
  * }}}
  *
  * Pipeline = EP1 (SURVEY.md §3): detect entity type from the filename,
  * optionally verify the checksum, parse the XML distributedly, write the
  * Hive-partitioned Parquet lake at `<out>/<type>/year=Y/month=M/`.
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Main <input_xml[.gz]> <output_dir> [sha256]")
    val (input, outDir) = (args(0), args(1))
    val expected = args.lift(2)

    val dataType = Ingest.detectDataType(input).getOrElse(
      sys.error(s"cannot detect entity type from $input"))
    // EP1 closes "URL in, lake out": http(s) inputs download first via
    // the parallel ranged transport, then parse from the landed file.
    val local =
      if (input.startsWith("http://") || input.startsWith("https://")) {
        val name = input.split('/').last
        val dst = java.nio.file.Files.createTempDirectory("graft_dl_").resolve(name)
        val f = graft.sources.RangedHttp.fetch(input, dst.toString)
        System.err.println(s"[ingest] downloaded ${f.bytes} bytes in ${f.nChunks} chunks")
        dst.toString
      } else input
    expected.foreach { sum =>
      require(Ingest.verifyChecksum(local, sum),
        s"checksum mismatch for $input")
    }

    // Reuse a live session when embedded (tests, notebooks); only a
    // session this main itself created gets stopped on exit.
    val embedded = SparkSession.getDefaultSession.isDefined
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .withExtensions(new GraftExtensions)
      .appName(s"graft-ingest-$dataType")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val df = DiscogsXml.read(spark, local, dataType)
      // year/month parse from the ORIGINAL url — the temp download path
      // has no date in it.
      val (year, month, _) = DiscogsLake.parseInputUrl(input)
      DiscogsLake.writeDump(df, outDir, dataType, year.toInt, month)
      val written = DiscogsLake.read(spark, outDir, dataType).count()
      println(s"""{"status": "ok", "type": "$dataType", "rows_in_lake": $written}""")
    } finally if (!embedded) spark.stop()
  }
}
