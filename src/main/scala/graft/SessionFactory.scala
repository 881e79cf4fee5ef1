package graft

import org.apache.spark.sql.SparkSession

/** One place that builds a correctly-tuned engine session (SURVEY §7.1
  * step 1). The reference pins identical object-store I/O settings on
  * every processor session (`zoom_proc.py:57-63`: multipart 100 MiB,
  * block 32 MiB, 256 transfer threads, explicit endpoint); here they are
  * applied once, together with the UTC session timezone every timestamp
  * oracle depends on and the [[GraftExtensions]] SQL surface.
  *
  * The s3a endpoint is deployment-specific, so it comes from the
  * `GRAFT_S3_ENDPOINT` env var (or an explicit argument) rather than a
  * hard-coded URL; no endpoint → the settings still apply wherever an
  * `s3a://` path is later read.
  */
object SessionFactory {

  /** SQL-level conf every graft session carries. The plan-string cap
    * exists because plan STRINGS are built eagerly for SQL-listener
    * events on every action: an iterative operator whose lineage ever
    * escapes its checkpoint discipline would otherwise spend minutes
    * (and GiBs) stringifying plans before any work runs — 1 MB is far
    * beyond any sane plan and far below the 2 GiB default.
    */
  def baseConf(shufflePartitions: Int = 32): Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
    "spark.sql.maxPlanStringLength" -> "1000000",
    "spark.sql.extensions" -> classOf[GraftExtensions].getName,
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" ->
      objAggFallbackThreshold
  )

  /** ObjectHashAggregate keeps a per-task hash map of aggregation
    * buffers and FALLS BACK to sort-based aggregation once the map holds
    * more than this many keys. The Spark default (128) exists to protect
    * unbounded buffers (`collect_list` over giant groups); every typed
    * aggregate in this repo carries a BOUNDED buffer (TopKAgg ≤ k
    * entries, MinHashUnionAgg = numHashes longs, VectorSumAgg = dim
    * doubles, GramSumAgg = fixed slots, the BM25 sorted-fold list ≤ the
    * query's term count), so past 128 groups/task the fallback only adds
    * a full sort of the stage's rows — measured at sf0.1: the portable
    * BM25 summation (100k groups) ran 4.6 s sort-based vs 3.1 s hashed.
    * 131072 keys × ≤ a few hundred bytes ≈ tens of MB per task — the
    * same order as the hash map a plain HashAggregate would hold, and
    * scale-invariant when shuffle partitions are sized so per-task
    * group counts stay bounded (guide §2.2). Env-overridable for
    * deployments whose group buffers are NOT bounded.
    */
  def objAggFallbackThreshold: String =
    sys.env.get("SPARK_GRAFT_OBJ_AGG_FALLBACK") match {
      case None => "131072"
      case Some(v) =>
        // validate HERE, not at session build: a typo'd env var would
        // otherwise surface as an opaque conf failure deep inside the
        // first getOrCreate() (r17 advice). New typed aggregates must
        // state their buffer bound before relying on the raised default —
        // an UNBOUNDED buffer needs the sort-based fallback this
        // threshold defers (see the scaladoc above).
        val t = v.trim
        require(t.nonEmpty && t.length <= 10 && t.forall(_.isDigit) &&
          t.toLong > 0 && t.toLong <= Int.MaxValue,
          s"SPARK_GRAFT_OBJ_AGG_FALLBACK must be a positive int, got '$v'")
        t
    }

  /** Hadoop fs settings (UNprefixed — ready for `hadoopConfiguration`;
    * prepend `spark.hadoop.` when passing through a builder). Values are
    * the reference's measured-in-production constants (BASELINE.md):
    * large multipart uploads for staging writes, 32 MiB blocks so parquet
    * row groups map to one read each, and a deep thread pool because
    * object-store latency, not bandwidth, bounds small-file load.
    */
  def s3aConf(endpoint: Option[String] = sys.env.get("GRAFT_S3_ENDPOINT"))
      : Map[String, String] =
    Map(
      "fs.s3a.multipart.size" -> "104857600",
      "fs.s3a.block.size" -> "33554432",
      "fs.s3a.threads.max" -> "256"
    ) ++ endpoint.map("fs.s3a.endpoint" -> _)

  /** A builder carrying the full graft conf; callers may add/override
    * before `getOrCreate()`.
    */
  def builder(appName: String = "graft",
              master: Option[String] = None,
              shufflePartitions: Int = 32,
              endpoint: Option[String] = sys.env.get("GRAFT_S3_ENDPOINT"))
      : SparkSession.Builder = {
    val b = SparkSession.builder().appName(appName)
    master.foreach(b.master)
    (baseConf(shufflePartitions) ++
      s3aConf(endpoint).map { case (k, v) => s"spark.hadoop.$k" -> v })
      .foreach { case (k, v) => b.config(k, v) }
    b
  }

  /** Build (or join) the session and make the tuning effective even when
    * an earlier SparkContext already exists (spark-shell, test suites):
    * builder-time `spark.hadoop.*` entries don't retrofit onto a live
    * context, so the fs settings are also applied imperatively, and the
    * SQL functions registered directly (the `spark.sql.extensions` path
    * only fires on fresh sessions).
    */
  def session(appName: String = "graft",
              master: Option[String] = None,
              shufflePartitions: Int = 32,
              endpoint: Option[String] = sys.env.get("GRAFT_S3_ENDPOINT"))
      : SparkSession = {
    val spark = builder(appName, master, shufflePartitions, endpoint).getOrCreate()
    val hc = spark.sparkContext.hadoopConfiguration
    s3aConf(endpoint).foreach { case (k, v) => hc.set(k, v) }
    GraftExtensions.register(spark)
    spark
  }
}
