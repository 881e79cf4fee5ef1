package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  /** Bit-by-bit reference interleave. */
  private def refZ(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("zValue matches the bit-by-bit reference on known and random points") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L),
      (12345L, 54321L), (19999L, 999L))
    val got = pts.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(got.toSeq == pts.map { case (x, y) => refZ(x, y) })
  }

  test("zValue masks inputs wider than 16 bits") {
    val got = Seq((65536L + 3L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .as[Long].head()
    assert(got == refZ(3L, 5L))
  }

  /** Bit-by-bit 3-D reference interleave. */
  private def refZ3(x: Long, y: Long, z: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (3 * i) |
        ((y >> i) & 1L) << (3 * i + 1) |
        ((z >> i) & 1L) << (3 * i + 2)
    }

  test("zValue3 matches the bit-by-bit reference; masks wide inputs") {
    val pts = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (3L, 5L, 7L), (65535L, 65535L, 65535L), (12345L, 54321L, 777L))
    val got = pts.toDF("x", "y", "z")
      .select(Layout.zValue3(col("x"), col("y"), col("z"))).as[Long].collect()
    assert(got.toSeq == pts.map { case (x, y, z) => refZ3(x, y, z) })
    val wide = Seq((65536L + 3L, 5L, 65536L * 4 + 7L)).toDF("x", "y", "z")
      .select(Layout.zValue3(col("x"), col("y"), col("z"))).as[Long].head()
    assert(wide == refZ3(3L, 5L, 7L))
  }

  test("zoneMap3 covers every row once; 3-D pruning is sound") {
    val rows = (0 until 600).map(i =>
      ((i * 613L) % 65536, (i * 389L) % 65536, (i * 97L) % 65536))
      .toDF("x", "y", "z")
    val zm = Layout.zoneMap3(rows, col("x"), col("y"), col("z"), 6)
    assert(zm.agg(sum(col("n_rows"))).as[Long].head() == 600L)
    val (x0, x1, y0, y1, z0, z1) =
      (1000L, 30000L, 2000L, 40000L, 0L, 20000L)
    val cand = Layout.pruningStats3(zm, lit(x0), lit(x1), lit(y0), lit(y1),
      lit(z0), lit(z1)).as[(Long, Long, Long)].head()
    val exact = rows.where(col("x").between(x0, x1) &&
      col("y").between(y0, y1) && col("z").between(z0, z1)).count()
    assert(cand._3 >= exact) // candidates are a superset — sound
    assert(cand._2 <= cand._1)
  }

  test("zone map covers every row exactly once and bounds are tight") {
    val df = (0 until 1000)
      .map(i => (i.toLong % 97, (i.toLong * 31) % 89)).toDF("x", "y")
    val zm = Layout.zoneMap(df, col("x"), col("y"), bucketBits = 4).collect()
    assert(zm.map(_.getAs[Long]("n_rows")).sum == 1000L)
    zm.foreach { r =>
      assert(r.getAs[Long]("min_x") <= r.getAs[Long]("max_x"))
      assert(r.getAs[Long]("min_y") <= r.getAs[Long]("max_y"))
    }
  }

  test("pruning is sound: candidate rows >= exact matches, both layouts") {
    val df = (0 until 5000)
      .map(i => ((i.toLong * 7919) % 1024, (i.toLong * 104729) % 512))
      .toDF("x", "y")
    val (x0, x1, y0, y1) = (100L, 160L, 50L, 80L)
    val exact = df.where(col("x").between(x0, x1) &&
      col("y").between(y0, y1)).count()
    for (zm <- Seq(Layout.zoneMap(df, col("x"), col("y")),
        Layout.linearZoneMap(df, col("x"), col("y")))) {
      val st = Layout.pruningStats(zm, x0, x1, y0, y1).head()
      assert(st.getAs[Long]("n_candidate_rows") >= exact)
      assert(st.getAs[Long]("n_candidate_buckets") <=
        st.getAs[Long]("n_buckets"))
    }
  }

  test("normalize16 is exact, monotone, clamps, fills the domain") {
    val got = Seq(-5L, 0L, 1L, 127L, 255L, 300L).toDF("v")
      .select(Layout.normalize16(col("v"), 255L).as("n"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 257L, 127L * 257, 65535L, 65535L))
  }

  test("z-layout prunes a 2-D box better than single-key layout on grid data") {
    // uniform grid: every (x, y) cell — the case z-ordering exists for.
    // Domains are normalized to full 16-bit width first, as the
    // production path does from table stats.
    val df = (for (x <- 0 until 256; y <- 0 until 256)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val nx = Layout.normalize16(col("x"), 255L)
    val ny = Layout.normalize16(col("y"), 255L)
    // query box x,y in [10,20] raw -> normalized bounds
    val (b0, b1) = (10L * 257, 20L * 257)
    val zs = Layout.pruningStats(
      Layout.zoneMap(df, nx, ny, 6), b0, b1, b0, b1).head()
    val ls = Layout.pruningStats(
      Layout.linearZoneMap(df, nx, ny, 6), b0, b1, b0, b1).head()
    assert(zs.getAs[Long]("n_candidate_rows") <
      ls.getAs[Long]("n_candidate_rows"),
      s"z=${zs}, linear=${ls}")
  }

  test("clusterByZ: partition z-ranges are disjoint and rows survive") {
    val df = (0 until 4096)
      .map(i => ((i.toLong * 613) % 256, (i.toLong * 389) % 256))
      .toDF("x", "y")
    val laid = Layout.clusterByZ(df, col("x"), col("y"), 8)
    assert(laid.count() == 4096)
    val ranges = laid
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }

  test("mergeZoneMaps of disjoint slices equals the full rebuild") {
    val df = (0 until 2000)
      .map(i => (i.toLong, (i.toLong * 613) % 256, (i.toLong * 389) % 256))
      .toDF("k", "x", "y")
    def zm(d: org.apache.spark.sql.DataFrame) =
      Layout.zoneMap(d, Layout.normalize16(col("x"), 255L),
        Layout.normalize16(col("y"), 255L), bucketBits = 5)
    val merged = Layout.mergeZoneMaps(
        zm(df.where(col("k") % 3 === 0)),
        zm(df.where(col("k") % 3 === 1)),
        zm(df.where(col("k") % 3 === 2)))
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val full = zm(df).collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(merged == full)
  }

  test("mergeZoneMaps keeps buckets present in only one slice") {
    val a = Seq((0L, 1L, 1L, 1L, 1L, 5L))
      .toDF("bucket", "min_x", "max_x", "min_y", "max_y", "n_rows")
    val b = Seq((7L, 9L, 9L, 9L, 9L, 3L))
      .toDF("bucket", "min_x", "max_x", "min_y", "max_y", "n_rows")
    val m = Layout.mergeZoneMaps(a, b).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(m == Map(0L -> 5L, 7L -> 3L))
  }

  test("rejects degenerate parameters") {
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Layout.zoneMap(df, col("x"), col("y"), bucketBits = 0)
    }
    intercept[IllegalArgumentException] {
      Layout.clusterByZ(df, col("x"), col("y"), 0)
    }
  }

  test("hilbert: first-order curve, bijectivity, and the adjacency " +
    "property Morton lacks") {
    import graft.functions.Kernels
    // order-1 (2x2) reference walk: (0,0) -> (0,1) -> (1,1) -> (1,0)
    assert(Kernels.hilbert(0, 0, 1) == 0L)
    assert(Kernels.hilbert(0, 1, 1) == 1L)
    assert(Kernels.hilbert(1, 1, 1) == 2L)
    assert(Kernels.hilbert(1, 0, 1) == 3L)
    // order-4 (16x16): a bijection onto 0..255, and CONSECUTIVE curve
    // positions are always Manhattan-adjacent — the locality property
    // the curve exists for (Morton violates it at every quadrant seam)
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield (x, y, Kernels.hilbert(x, y, 4))
    assert(cells.map(_._3).sorted == (0L until 256L))
    val byD = cells.sortBy(_._3)
    byD.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"seam between ($x1,$y1) and ($x2,$y2)")
    }
    // the 16-bit form used by hilbertValue masks wide inputs and the
    // Column kernel agrees with the JVM reference through codegen
    val pts = Seq((3L, 7L), (65535L, 0L), (70000L, 4L), (12345L, 54321L))
    val got = pts.toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"))).as[Long].collect()
    assert(got.toSeq == pts.map { case (x, y) =>
      Kernels.hilbert(x & 0xFFFFL, y & 0xFFFFL, 16) })
  }

  test("curveFileMap: balanced chunks, full cover, curve-contiguous") {
    val rows = (0 until 1000)
      .map(i => ((i * 613L) % 65536, (i * 389L) % 65536)).toDF("x", "y")
    val fm = Layout.curveFileMap(rows, col("x"), col("y"),
      Layout.hilbertValue(col("x"), col("y")), numChunks = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(fm.keySet == (0L until 16L).toSet)
    // equal-count cut: 1000 rows / 16 chunks -> sizes in {62, 63}
    assert(fm.values.map(_._5).sum == 1000L)
    assert(fm.values.forall(v => v._5 == 62L || v._5 == 63L), fm.toString)
    // EVEN-bit prefix buckets of the two curves are the SAME quadtree
    // cells relabeled — pruning stats must come out identical (the
    // measured fact the hilbertValue scaladoc documents; curve choice
    // only matters for file chunks). At ODD bits the claim does not
    // hold: Morton's extra bit halves cells along one axis, Hilbert's
    // halves them along the curve.
    def prune(zm: org.apache.spark.sql.DataFrame) =
      Layout.pruningStats(zm, 1000L, 9000L, 2000L, 8000L)
        .collect().head.toSeq
    assert(prune(Layout.hilbertZoneMap(rows, col("x"), col("y"), 6)) ==
      prune(Layout.zoneMap(rows, col("x"), col("y"), 6)))
  }

  test("hilbert zone map: same cover/merge algebra as the Morton one") {
    val rows = (0 until 400)
      .map(i => ((i * 613L) % 65536, (i * 389L) % 65536)).toDF("x", "y")
    val zm = Layout.hilbertZoneMap(rows, col("x"), col("y"), bucketBits = 4)
      .collect()
    assert(zm.map(_.getLong(5)).sum == 400L)
    // merge of disjoint slices == full rebuild (curve-agnostic algebra)
    val a = Layout.hilbertZoneMap(rows.where(col("x") % 2 === 0),
      col("x"), col("y"), 4)
    val b = Layout.hilbertZoneMap(rows.where(col("x") % 2 === 1),
      col("x"), col("y"), 4)
    val merged = Layout.mergeZoneMaps(a, b).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    val full = Layout.hilbertZoneMap(rows, col("x"), col("y"), 4).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(merged == full)
  }
}
