package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Physical-plan evidence dump: writes `.explain("formatted")` for the
  * named registered queries to `<outDir>/<name><suffix>.txt` — the
  * before/after plan artifacts the optimization rounds commit under
  * plans/rNN/ so plan-shape claims (Exchange counts, join strategies,
  * PushedFilters) are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...|all>
  *
  * Same session shape as [[Bench]] (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cores, UTC, 64 MB broadcast threshold) so the dumped
  * plan is the one the bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, namesArg) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      // same bounded-buffer aggregate setting as Bench (SessionFactory)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        SessionFactory.objAggFallbackThreshold)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (namesArg == "all") SparkEntry.queries.keys.toSeq.sorted
      else namesArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    var failed = List.empty[String]
    for (name <- names) {
      SparkEntry.queries.get(name) match {
        case None =>
          failed ::= name
          System.err.println(s"[plandump] no such query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            // queryExecution.explainString == df.explain("formatted"),
            // captured instead of printed
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.write(Paths.get(outDir, s"$name$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"[plandump] wrote $outDir/$name$suffix.txt")
          } catch {
            case e: Exception =>
              failed ::= name
              System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[plandump] FAILED: ${failed.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
