package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CdcSpec extends SparkTestBase {
  import graft.TestSpark.spark.implicits._

  private def base: DataFrame =
    Seq((1L, "alpha", 10), (2L, "beta", 20), (3L, "gamma", 30))
      .toDF("id", "txt", "v")

  private def merged(changes: DataFrame): Map[Long, (String, Int)] =
    Cdc.applyChangeSet(base, changes, "id").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap

  test("insert, update, delete, passthrough in one changeset") {
    val changes = Seq(
      (4L, 1L, "upsert", "delta", 40),   // insert: id absent from base
      (2L, 1L, "upsert", "BETA", 21),    // update in place
      (3L, 1L, "delete", null.asInstanceOf[String], 0)) // remove
      .toDF("id", "seq", "op", "txt", "v")
    val out = merged(changes)
    assert(out == Map(1L -> ("alpha", 10), 2L -> ("BETA", 21),
      4L -> ("delta", 40)))
  }

  test("latest seq wins: delete then re-upsert, and upsert then delete") {
    val changes = Seq(
      (1L, 1L, "delete", null.asInstanceOf[String], 0),
      (1L, 2L, "upsert", "alpha2", 11),   // resurrects id 1
      (2L, 5L, "upsert", "beta2", 22),
      (2L, 9L, "delete", null.asInstanceOf[String], 0)) // kills id 2
      .toDF("id", "seq", "op", "txt", "v")
    val out = merged(changes)
    assert(out == Map(1L -> ("alpha2", 11), 3L -> ("gamma", 30)))
  }

  test("delete of an absent id is a no-op; replay is idempotent") {
    val changes = Seq(
      (99L, 1L, "delete", null.asInstanceOf[String], 0))
      .toDF("id", "seq", "op", "txt", "v")
    val once = Cdc.applyChangeSet(base, changes, "id")
    assert(once.count() == 3)
    // replaying the same delta over the merged result changes nothing
    val twice = Cdc.applyChangeSet(once, changes, "id")
    assert(twice.collect().toSet == once.collect().toSet)
  }

  test("schema evolution: a NEW changeset column widens the base with " +
      "nulls, one-shot and versioned") {
    val changes = Seq(
      (2L, 1L, "upsert", "BETA", 21, "eu"),
      (4L, 1L, "upsert", "delta", 40, "us"))
      .toDF("id", "seq", "op", "txt", "v", "region")
    val out = Cdc.applyChangeSet(base, changes, "id")
    assert(out.columns.toSeq == Seq("id", "txt", "v", "region"))
    val byId = out.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(3))).toMap
    assert(byId == Map(1L -> ("alpha", null), 2L -> ("BETA", "eu"),
      3L -> ("gamma", null), 4L -> ("delta", "us")))
    // versioned: batch 1 pre-drift, batch 2 introduces the column —
    // the store widens mid-stream and earlier rows read back null
    val b1 = Seq((5L, 1L, "upsert", "eps", 50)).toDF("id", "seq", "op", "txt", "v")
    val b2 = changes.where(col("id") === 4L)
    val store = Cdc.applyChangeSetVersioned(
      Cdc.applyChangeSetVersioned(Cdc.versionSnapshot(base), b1, "id"),
      b2, "id")
    val live = Cdc.snapshotView(store)
    assert(live.columns.toSeq == Seq("id", "txt", "v", "region"))
    val regions = live.collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(regions == Map(1L -> null, 2L -> null, 3L -> null,
      5L -> null, 4L -> "us"))
  }

  test("schema evolution: a type CONFLICT on a shared column fails " +
      "loudly at plan assembly") {
    val changes = Seq((2L, 1L, "upsert", "BETA", "not-an-int"))
      .toDF("id", "seq", "op", "txt", "v") // v: string vs base's int
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChangeSet(base, changes, "id")
    }
    assert(e.getMessage.contains("type conflict"), e.getMessage)
    // and a changeset MISSING a base payload column fails too (an
    // upsert replaces the whole row — it cannot invent v)
    val partial = Seq((2L, 1L, "upsert", "BETA")).toDF("id", "seq", "op", "txt")
    val e2 = intercept[IllegalArgumentException] {
      Cdc.applyChangeSet(base, partial, "id")
    }
    assert(e2.getMessage.contains("missing base payload"), e2.getMessage)
  }

  test("unknown op fails the job instead of silently skipping") {
    val changes = Seq((1L, 1L, "patch", "x", 0))
      .toDF("id", "seq", "op", "txt", "v")
    val e = intercept[Exception] {
      Cdc.applyChangeSet(base, changes, "id").collect()
    }
    assert(e.getMessage.contains("unknown op") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown op")))
  }

  test("summary classifies inserted/updated/deleted/unchanged/delete_noop") {
    val changes = Seq(
      (4L, 1L, "upsert", "delta", 40),
      (2L, 1L, "upsert", "BETA", 21),
      (3L, 1L, "delete", null.asInstanceOf[String], 0),
      (99L, 1L, "delete", null.asInstanceOf[String], 0))
      .toDF("id", "seq", "op", "txt", "v")
    val m = Cdc.changeSetSummary(base, changes, "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("inserted" -> 1L, "updated" -> 1L, "deleted" -> 1L,
      "unchanged" -> 1L, "delete_noop" -> 1L))
  }

  test("versioned fold across batches equals one-shot, in any batch order") {
    val changes = Seq(
      (4L, 1L, "upsert", "delta", 40),
      (2L, 1L, "upsert", "BETA", 21),
      (3L, 2L, "delete", null.asInstanceOf[String], 0),
      (3L, 3L, "upsert", "gamma3", 33),
      (1L, 4L, "delete", null.asInstanceOf[String], 0))
      .toDF("id", "seq", "op", "txt", "v")
    val oneShot = Cdc.applyChangeSet(base, changes, "id")
      .collect().map(_.toSeq).toSet
    val v0 = Cdc.versionSnapshot(base)
    // fold high-seq batch FIRST, then the low-seq stragglers: the
    // stored seq must shield newer values from the stale batch
    val highFirst = Cdc.snapshotView(
      Cdc.applyChangeSetVersioned(
        Cdc.applyChangeSetVersioned(v0, changes.where($"seq" >= 2), "id"),
        changes.where($"seq" <= 1), "id"))
      .collect().map(_.toSeq).toSet
    val lowFirst = Cdc.snapshotView(
      Cdc.applyChangeSetVersioned(
        Cdc.applyChangeSetVersioned(v0, changes.where($"seq" <= 1), "id"),
        changes.where($"seq" >= 2), "id"))
      .collect().map(_.toSeq).toSet
    assert(highFirst == oneShot && lowFirst == oneShot)
  }

  test("a stale upsert after a delete cannot resurrect the row") {
    val v0 = Cdc.versionSnapshot(base)
    val del = Seq((2L, 5L, "delete", null.asInstanceOf[String], 0))
      .toDF("id", "seq", "op", "txt", "v")
    val staleUp = Seq((2L, 3L, "upsert", "zombie", 99))
      .toDF("id", "seq", "op", "txt", "v")
    val after = Cdc.applyChangeSetVersioned(
      Cdc.applyChangeSetVersioned(v0, del, "id"), staleUp, "id")
    val view = Cdc.snapshotView(after).collect().map(_.getLong(0)).toSet
    assert(view == Set(1L, 3L))
    // the tombstone is still there, carrying the delete's seq
    val tomb = after.where(col("__deleted")).collect()
    assert(tomb.length == 1 && tomb.head.getAs[Long]("__seq") == 5L)
  }

  test("tombstone compaction honors the seq watermark") {
    val v0 = Cdc.versionSnapshot(base)
    val dels = Seq(
      (1L, 2L, "delete", null.asInstanceOf[String], 0),
      (2L, 9L, "delete", null.asInstanceOf[String], 0))
      .toDF("id", "seq", "op", "txt", "v")
    val v1 = Cdc.applyChangeSetVersioned(v0, dels, "id")
    val compacted = Cdc.compactTombstones(v1, seqWatermark = 5L)
    val tombs = compacted.where(col("__deleted"))
      .collect().map(_.getLong(0)).toSet
    assert(tombs == Set(2L)) // seq-2 tombstone purged, seq-9 kept
    assert(Cdc.snapshotView(compacted).count() == 1) // id 3 lives
  }

  test("merge plans at most two exchanges (collapse partitioning reused)") {
    val changes = Seq((2L, 1L, "upsert", "BETA", 21))
      .toDF("id", "seq", "op", "txt", "v")
    val plan = Cdc.applyChangeSet(base, changes, "id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges:\n$plan")
  }
}
