package graft

import org.apache.spark.sql.SparkSession

/** Write `explain("formatted")` for the named queries to one file per
  * query — the plans/r16 evidence files the optimization round commits
  * (judge checks plan claims against these). Dev/diagnostic main only.
  *
  * Usage: runMain graft.ExplainDump <sfDir> <outDir> <q1,q2,...> [suffix]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val suffix = if (args.length > 3) args(3) else ""
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$n$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[explain] $n ok")
      } catch { case e: Throwable =>
        println(s"[explain] $n ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
