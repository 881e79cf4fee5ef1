package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MaintenanceSpec extends SparkTestBase {
  import graft.TestSpark.spark
  import graft.TestSpark.spark.implicits._

  private def stage(n: Int, files: Int): String = {
    val dir = tempDir("compact_stage").toString
    (0 until n).map(i => (i.toLong, i % 40L, (i * 7) % 30L, s"row$i"))
      .toDF("id", "x", "y", "payload")
      .repartition(files)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("compaction bin-packs many small files into few, preserving " +
      "every row byte-for-byte") {
    val dir = stage(n = 5000, files = 32)
    val before = spark.read.parquet(dir).collect().toSet
    val (fb, _) = Maintenance.fileStats(spark, dir)
    assert(fb == 32)
    val r = Maintenance.compactTable(spark, dir, targetBytes = 1L << 26)
    assert(r.filesBefore == 32 && r.filesAfter == 1, r.toString)
    val after = spark.read.parquet(dir).collect().toSet
    assert(after == before)
    // no stray swap dirs remain
    assert(!new java.io.File(dir + ".__compact_tmp").exists())
    assert(!new java.io.File(dir + ".__compact_old").exists())
  }

  test("a table already at the target count is left untouched " +
      "(no pointless rewrite)") {
    val dir = stage(n = 100, files = 2)
    // 2 files of a 100-row table are under any sane byte target -> the
    // target count would be 1 and 2 > 1 WOULD compact; a 1-byte target
    // makes targetFiles >= the current count, the no-op case
    val listing = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    val r = Maintenance.compactTable(spark, dir, targetBytes = 1L)
    assert(r.filesBefore == 2 && r.filesAfter == 2, r.toString)
    val listing2 = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    assert(listing2 == listing, "no-op must leave the files untouched")
  }

  test("sorted compaction preserves z-order clustering and the zone map " +
      "is invariant (merged pre-compaction slices stay exact, no rescan)") {
    val dir = tempDir("compact_z").toString
    val df = (0 until 4000)
      .map(i => (i.toLong, (i * 31) % 997L, (i * 17) % 983L))
      .toDF("id", "x", "y")
    val nx = Layout.normalize16(col("x"), 996L)
    val ny = Layout.normalize16(col("y"), 982L)
    Layout.clusterByZ(df, nx, ny, numPartitions = 16)
      .write.mode("overwrite").parquet(dir)
    val zmBefore = Layout.zoneMap(spark.read.parquet(dir), nx, ny, 6)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // per-slice maps an ingest would have appended (2 halves)
    val t = spark.read.parquet(dir)
    val slices = Layout.mergeZoneMaps(
      Layout.zoneMap(t.where(col("id") % 2 === 0), nx, ny, 6),
      Layout.zoneMap(t.where(col("id") % 2 === 1), nx, ny, 6))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val r = Maintenance.compactTable(spark, dir, targetBytes = 1L << 26,
      sortCols = Seq(Layout.zValue(nx, ny)))
    assert(r.filesAfter < r.filesBefore, r.toString)
    // zone map is a function of the data: identical after the rewrite,
    // and the pre-compaction per-slice merge still serves it exactly
    val zmAfter = Layout.zoneMap(spark.read.parquet(dir), nx, ny, 6)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(zmAfter == zmBefore)
    assert(slices == zmAfter)
    // clustering survived: within the single output file the z-values
    // are non-decreasing
    val zs = spark.read.parquet(dir).select(Layout.zValue(nx, ny))
      .collect().map(_.getLong(0)).toSeq
    assert(zs == zs.sorted, "sorted compaction must keep the z order")
  }

  test("partitioned compaction bin-packs each date partition " +
      "independently, honors the partition filter, and preserves rows") {
    val dir = tempDir("compact_part").toString
    (0 until 3000).map(i => (i.toLong, s"2026-08-${10 + i % 3}", s"p$i"))
      .toDF("id", "load_date", "payload")
      .repartition(8)
      .write.partitionBy("load_date").mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).collect().toSet
    // compact only two of the three partitions (the recent-days filter
    // a nightly job would pass)
    val results = Maintenance.compactPartitioned(spark, dir,
      targetBytes = 1L << 26,
      partitionFilter = p => p >= "load_date=2026-08-11")
    assert(results.keySet ==
      Set("load_date=2026-08-11", "load_date=2026-08-12"), results.toString)
    results.values.foreach { r =>
      assert(r.filesBefore == 8 && r.filesAfter == 1, r.toString)
    }
    // the filtered-out partition keeps its small files
    val (f10, _) = Maintenance.fileStats(spark, s"$dir/load_date=2026-08-10")
    assert(f10 == 8)
    assert(spark.read.parquet(dir).collect().toSet == before)
    // pointing the FLAT compactor at a partitioned root is an error,
    // not a silent "already compact" no-op
    val e = intercept[IllegalArgumentException] {
      Maintenance.compactTable(spark, dir, targetBytes = 1L << 26)
    }
    assert(e.getMessage.contains("compactPartitioned"), e.getMessage)
  }

  test("interrupted swap recovers: a parked original is restored, " +
      "stale leftovers are cleared") {
    val dir = stage(n = 500, files = 4)
    val before = spark.read.parquet(dir).collect().toSet
    // crash window 2: live dir gone, original parked
    val f = new java.io.File(dir)
    val old = new java.io.File(dir + ".__compact_old")
    assert(f.renameTo(old))
    Maintenance.recoverCompaction(spark, dir)
    assert(f.exists() && !old.exists())
    assert(spark.read.parquet(dir).collect().toSet == before)
    // crash window 1/3: live dir present, orphan tmp left behind
    val tmp = new java.io.File(dir + ".__compact_tmp")
    assert(tmp.mkdirs())
    val r = Maintenance.compactTable(spark, dir, targetBytes = 1L << 26)
    assert(r.filesAfter == 1 && !tmp.exists())
    assert(spark.read.parquet(dir).collect().toSet == before)
  }

  test("compactBloomStore folds slices; the served index is unchanged " +
    "and post-compaction replays stay harmless") {
    import org.apache.spark.sql.functions.col
    import graft.operators.BloomIndex
    val store = tempDir("bloom_cstore").toString
    // three "batches" appended separately -> three slice files
    val batches = Seq(
      (0 until 60).map(i => (i / 30L, i.toLong)),
      (60 until 120).map(i => (i / 30L, i.toLong)),
      (120 until 150).map(i => (i / 30L, i.toLong)))
    batches.foreach { b =>
      BloomIndex.build(b.toDF("chunk", "key"), col("chunk"), col("key"),
          3, 1024)
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(store)
    }
    def served = graft.streaming.Streams.bloomIndexView(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val before = served
    val r = Maintenance.compactBloomStore(spark, store)
    assert(r.filesAfter < r.filesBefore, r.toString)
    assert(served == before, "compaction changed the served index")
    // a batch replayed AFTER compaction re-ORs harmlessly
    BloomIndex.build(batches(1).toDF("chunk", "key"), col("chunk"),
        col("key"), 3, 1024)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(store)
    assert(served == before, "post-compaction replay changed the index")
  }

  test("compactCountStore folds committed batches and keeps the tail " +
    "appendable") {
    import org.apache.spark.sql.functions.col
    val store = tempDir("count_cstore").toString
    def append(batch: Long, rows: Seq[(String, Int)]): Unit =
      graft.operators.Anomaly.countSeries(rows.toDF("g", "b"),
          col("g"), col("b"))
        .withColumn("batch_id", org.apache.spark.sql.functions.lit(batch))
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(store)
    append(0, (1 to 5).flatMap(b => Seq.fill(4)(("a", b))))
    append(1, Seq.fill(6)(("a", 6)) ++ Seq.fill(2)(("a", 2)))   // late b=2
    append(2, Seq.fill(3)(("a", 7)))
    def snap = graft.streaming.Streams.anomalyStoreView(spark, store)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val before = snap
    // batches 0 and 1 are superseded by committed batch 2 -> foldable
    val r = Maintenance.compactCountStore(spark, store, throughBatch = 1)
    assert(r.filesAfter < r.filesBefore, r.toString)
    assert(snap == before, "compaction changed the served counts")
    assert(before(("a", 2)) == 6L, "late partial must stay folded in")
    // the stream keeps appending; a replay of the still-uncommitted
    // LAST batch (the only one the checkpoint can replay) collapses
    // exactly as before compaction
    append(2, Seq.fill(3)(("a", 7)))
    assert(snap == before, "replay of the tail batch double-counted")
    append(3, Seq.fill(2)(("a", 8)))
    assert(snap(("a", 8)) == 2L)
  }

  test("compactIvfStore drops replay duplicates and keeps the " +
    "list-partitioned layout and probe results intact") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.operators.Ivf
    val store = tempDir("ivf_cstore").toString
    val vecs = (0L until 200L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat - 6f)))
      .toDF("vec_id", "embedding")
    val model = Ivf.fitDistributed(vecs, col("vec_id"), col("embedding"),
      nlist = 4)
    def append(batch: Long): Unit =
      Ivf.assign(model, vecs, col("vec_id"), col("embedding"))
        .withColumn("batch_id", lit(batch))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("list_id").parquet(store)
    append(0)
    append(0) // replayed appendix: bit-identical duplicate of batch 0
    val queries = vecs.where(col("vec_id") % 40 === 0)
    def probe = Ivf.topKStored(model,
        graft.streaming.Streams.ivfIndexView(spark, store), queries,
        col("vec_id"), col("embedding"), k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = probe
    val r = Maintenance.compactIvfStore(spark, store)
    assert(r.filesAfter < r.filesBefore, r.toString)
    assert(probe == before, "compaction changed probe results")
    val rows = spark.read.parquet(store)
    assert(rows.count() == 200L, "duplicates must be gone")
    assert(rows.select("list_id").distinct().count() > 1,
      "list partitioning must survive")
    // partition pruning still works on the compacted layout
    val pruned = rows.where(col("list_id") === 0)
      .queryExecution.executedPlan.toString
    assert(pruned.contains("PartitionFilters: [isnotnull(list_id"),
      pruned)
  }

  test("a slice appended DURING IVF store compaction survives — the " +
    "manifest protocol replaces the whole-directory swap") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.operators.Ivf
    val store = tempDir("ivf_concurrent").toString
    val vecs = (0L until 200L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat - 6f)))
      .toDF("vec_id", "embedding")
    val late = (200L until 240L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 17 + d * 5) % 13).toFloat - 6f)))
      .toDF("vec_id", "embedding")
    val model = Ivf.fitDistributed(vecs, col("vec_id"), col("embedding"),
      nlist = 4)
    def append(df: org.apache.spark.sql.DataFrame, batch: Long): Unit =
      Ivf.assign(model, df, col("vec_id"), col("embedding"))
        .withColumn("batch_id", lit(batch))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("list_id").parquet(store)
    append(vecs, 0)
    append(vecs, 0) // replayed duplicate appendix
    // the tap runs after the snapshot listing — this append is a live
    // ivfIndexStream batch landing mid-compaction
    var appended = false
    val r = Maintenance.compactIvfStoreImpl(spark, store, { df =>
      if (!appended) { appended = true; append(late, 1) }
      df
    })
    assert(appended && r.filesAfter < r.filesBefore, r.toString)
    val rows = spark.read.parquet(store)
    assert(rows.where(col("vec_id") < 200L).count() == 200L,
      "snapshot rows deduped exactly once")
    assert(rows.where(col("vec_id") >= 200L).count() == 40L,
      "the concurrently appended slice must survive the compaction")
    // probes see every vector, replay absorption intact
    val probe = Ivf.topKStored(model,
        graft.streaming.Streams.ivfIndexView(spark, store),
        late.where(col("vec_id") % 20 === 0),
        col("vec_id"), col("embedding"), k = 3, nprobe = 4)
      .collect()
    assert(probe.nonEmpty)
  }

  test("a torn IVF store compaction: the view serves the pre-crash " +
    "index through the manifest; recovery restores the leafs") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.operators.Ivf
    val store = tempDir("ivf_torn").toString
    val vecs = (0L until 120L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat - 6f)))
      .toDF("vec_id", "embedding")
    val model = Ivf.fitDistributed(vecs, col("vec_id"), col("embedding"),
      nlist = 4)
    Ivf.assign(model, vecs, col("vec_id"), col("embedding"))
      .withColumn("batch_id", lit(0L))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("list_id").parquet(store)
    def probe = Ivf.topKStored(model,
        graft.streaming.Streams.ivfIndexView(spark, store),
        vecs.where(col("vec_id") % 30 === 0),
        col("vec_id"), col("embedding"), k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = probe
    // crash mid-PARK: a MIXED state — some leaves' files already parked
    // (preserving the list_id=N relative layout), others still live in
    // the store — plus one torn folded file promoted and the manifest
    // present with its RELATIVE path. The mixed state is the hard case
    // for the reader: the pre-crash file set spans two roots, which a
    // single-basePath partition-discovery read rejects outright
    val storeDir = new java.io.File(store)
    val parked = new java.io.File(store + ".__compact_parked")
    val leaves = storeDir.listFiles().filter(d => d.isDirectory &&
      d.getName.startsWith("list_id="))
    assert(leaves.length > 1, "fixture needs multiple leaves for the mix")
    leaves.zipWithIndex.filter(_._2 % 2 == 0).map(_._1).foreach { leaf =>
      val dest = new java.io.File(parked, leaf.getName)
      assert(dest.mkdirs())
      leaf.listFiles().filter(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_"))
        .foreach(f => assert(f.renameTo(new java.io.File(dest, f.getName))))
    }
    val tornRel = "list_id=0/part-00000-torn.snappy.parquet"
    java.nio.file.Files.write(
      new java.io.File(storeDir, tornRel).toPath, Array[Byte](7))
    java.nio.file.Files.write(
      new java.io.File(store + ".__compact_manifest").toPath,
      tornRel.getBytes("UTF-8"))
    assert(probe == before,
      "view must serve the pre-crash index through the manifest")
    Maintenance.recoverStoreCompaction(spark, store)
    assert(!new java.io.File(storeDir, tornRel).exists() && !parked.exists())
    assert(probe == before, "recovery must restore the exact store")
    // and a fresh compaction completes on the recovered store
    val r = Maintenance.compactIvfStore(spark, store)
    assert(r.filesAfter >= 1 && probe == before, r.toString)
  }

  test("compactCardinalityStore keeps estimates and row counts; " +
    "n_slices drops to the physical truth") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Cardinality
    val store = tempDir("card_cstore").toString
    def append(batch: Long, rows: Seq[(String, String)]): Unit =
      Cardinality.sliceSketches(rows.toDF("g", "v"),
          org.apache.spark.sql.functions.lit(batch).as("batch_id"),
          col("g"), col("v"), lgK = 12)
        .withColumnRenamed("slice", "batch_id")
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(store)
    append(0, (0 until 200).map(i => (s"g${i % 2}", s"v${i % 30}")))
    append(1, (0 until 150).map(i => (s"g${i % 2}", s"v${i % 50}")))
    append(2, (0 until 80).map(i => (s"g${i % 2}", s"v${i % 10}")))
    def snap = graft.streaming.Streams.cardinalityStoreView(spark, store)
      .collect().map(r => r.getAs[String]("group") ->
        (r.getAs[Long]("n_distinct"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("n_slices"))).toMap
    val before = snap
    val r = Maintenance.compactCardinalityStore(spark, store,
      throughBatch = 1)
    assert(r.filesAfter < r.filesBefore, r.toString)
    val after = snap
    after.foreach { case (g, (est, n, slices)) =>
      assert(est == before(g)._1, s"estimate moved for $g")
      assert(n == before(g)._2, s"row count moved for $g")
      assert(slices == 2L, s"expected 1 folded + 1 tail slice for $g")
    }
    // the tail batch still replays idempotently
    append(2, (0 until 80).map(i => (s"g${i % 2}", s"v${i % 10}")))
    snap.foreach { case (g, (est, n, _)) =>
      assert(est == before(g)._1 && n == before(g)._2,
        s"tail replay changed the view for $g")
    }
  }

  test("a slice appended DURING store compaction survives the swap " +
    "and is served afterwards (snapshot protocol vs concurrent writer)") {
    import org.apache.spark.sql.functions.col
    val store = tempDir("concurrent_cstore").toString
    def append(batch: Long, rows: Seq[(String, Int)]): Unit =
      graft.operators.Anomaly.countSeries(rows.toDF("g", "b"),
          col("g"), col("b"))
        .withColumn("batch_id", org.apache.spark.sql.functions.lit(batch))
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(store)
    append(0, Seq.fill(4)(("a", 1)))
    append(1, Seq.fill(6)(("a", 2)))
    def snap = graft.streaming.Streams.anomalyStoreView(spark, store)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // the fold callback runs AFTER the snapshot listing — appending a
    // new slice from inside it is exactly a concurrent foreachBatch
    // landing mid-compaction
    var appended = false
    val r = Maintenance.compactStore(spark, store, { df =>
      if (!appended) { appended = true; append(2, Seq.fill(3)(("a", 3))) }
      df.groupBy(col("batch_id"), col("group"), col("bucket"))
        .agg(org.apache.spark.sql.functions.max(col("cnt")).as("cnt"))
        .groupBy(col("group"), col("bucket"))
        .agg(org.apache.spark.sql.functions.sum(col("cnt")).as("cnt"))
        .select(col("group"), col("bucket"), col("cnt"),
          org.apache.spark.sql.functions.lit(1L).as("batch_id"))
    })
    assert(appended && r.filesAfter >= 1, r.toString)
    val after = snap
    assert(after(("a", 1)) == 4L && after(("a", 2)) == 6L,
      "folded history must be served")
    assert(after(("a", 3)) == 3L,
      "the concurrently appended slice must survive the compaction swap")
  }

  test("a torn store compaction rolls back: manifest-listed folded " +
    "files are removed, parked originals restored, view unchanged") {
    import org.apache.spark.sql.functions.col
    val store = tempDir("rollback_cstore").toString
    def append(batch: Long, rows: Seq[(String, Int)]): Unit =
      graft.operators.Anomaly.countSeries(rows.toDF("g", "b"),
          col("g"), col("b"))
        .withColumn("batch_id", org.apache.spark.sql.functions.lit(batch))
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(store)
    append(0, Seq.fill(4)(("a", 1)))
    append(1, Seq.fill(6)(("a", 2)))
    def snap = graft.streaming.Streams.anomalyStoreView(spark, store)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val before = snap
    // simulate a crash mid-promotion: originals parked, one folded file
    // already promoted, manifest still present (= not committed)
    val storeDir = new java.io.File(store)
    val parked = new java.io.File(store + ".__compact_parked")
    assert(parked.mkdirs())
    val dataFiles = storeDir.listFiles().filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    dataFiles.foreach { f =>
      assert(f.renameTo(new java.io.File(parked, f.getName)))
    }
    val foldedName = "part-00000-torn-fold.snappy.parquet"
    java.nio.file.Files.write(
      new java.io.File(storeDir, foldedName).toPath,
      Array[Byte](1, 2, 3)) // torn garbage — rollback must remove it
    java.nio.file.Files.write(
      new java.io.File(store + ".__compact_manifest").toPath,
      foldedName.getBytes("UTF-8"))
    Maintenance.recoverStoreCompaction(spark, store)
    assert(!new java.io.File(storeDir, foldedName).exists(),
      "manifest-listed folded file must be rolled back")
    assert(!parked.exists() &&
      !new java.io.File(store + ".__compact_manifest").exists())
    assert(snap == before, "rollback must restore the exact store")
    // and the next compaction (which auto-recovers) proceeds cleanly
    val r = Maintenance.compactCountStore(spark, store, throughBatch = 0)
    assert(r.filesAfter >= 1 && snap == before, r.toString)
  }

  test("a CRASHED store compaction does not partially serve: the view " +
    "reads the pre-compaction rows through the manifest, read-only, " +
    "before anyone runs recovery") {
    import org.apache.spark.sql.functions.col
    val store = tempDir("crashview_cstore").toString
    def append(batch: Long, rows: Seq[(String, Int)]): Unit =
      graft.operators.Anomaly.countSeries(rows.toDF("g", "b"),
          col("g"), col("b"))
        .withColumn("batch_id", org.apache.spark.sql.functions.lit(batch))
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(store)
    append(0, Seq.fill(4)(("a", 1)))
    append(1, Seq.fill(6)(("a", 2)))
    def snap = graft.streaming.Streams.anomalyStoreView(spark, store)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val before = snap
    // crash mid-promotion: ALL originals parked, a torn folded file in
    // the store, manifest present — a raw directory read would see
    // only unreadable garbage (history gone)
    val storeDir = new java.io.File(store)
    val parked = new java.io.File(store + ".__compact_parked")
    assert(parked.mkdirs())
    storeDir.listFiles().filter(f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .foreach(f => assert(f.renameTo(new java.io.File(parked, f.getName))))
    val foldedName = "part-00000-crash-fold.snappy.parquet"
    java.nio.file.Files.write(
      new java.io.File(storeDir, foldedName).toPath, Array[Byte](9, 9))
    java.nio.file.Files.write(
      new java.io.File(store + ".__compact_manifest").toPath,
      foldedName.getBytes("UTF-8"))
    // the view serves the exact pre-compaction verdicts, WITHOUT
    // mutating the store (recovery stays the writer's job)
    assert(snap == before, "view must reconstruct the pre-crash store")
    assert(new java.io.File(store + ".__compact_manifest").exists() &&
      parked.exists() && new java.io.File(storeDir, foldedName).exists(),
      "a reader must not have mutated the crashed store")
    // writer-side recovery then restores the directory itself
    Maintenance.recoverStoreCompaction(spark, store)
    assert(snap == before)
  }

  test("compactZoneStore folds boxes through the merge algebra") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.operators.Layout
    val store = tempDir("zone_cstore").toString
    val nx = Layout.normalize16(col("x"), 255L)
    val ny = Layout.normalize16(col("y"), 255L)
    def append(batch: Long, rows: Seq[(Long, Long)]): Unit =
      Layout.zoneMap(rows.toDF("x", "y"), nx, ny, 4)
        .withColumn("batch_id", lit(batch))
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(store)
    append(0, (0 until 200).map(i => ((i * 613L) % 256, (i * 389L) % 256)))
    append(1, (0 until 150).map(i => ((i * 97L) % 256, (i * 31L) % 256)))
    append(2, (0 until 50).map(i => ((i * 17L) % 256, (i * 11L) % 256)))
    def snap = graft.streaming.Streams.zoneMapStoreView(spark, store)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val before = snap
    val r = Maintenance.compactZoneStore(spark, store, throughBatch = 1)
    assert(r.filesAfter < r.filesBefore, r.toString)
    assert(snap == before, "compaction changed the served zone map")
    // the tail batch still replays into the view exactly as before
    append(2, (0 until 50).map(i => ((i * 17L) % 256, (i * 11L) % 256)))
    assert(snap == before, "replay of the tail batch changed the view")
  }
}
