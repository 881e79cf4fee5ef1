package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Zone-map data skipping as a Catalyst optimizer rule — the remaining
  * extension point the engine uses ([[graft.GraftExtensions]] injects
  * expressions; this injects a `Rule[LogicalPlan]`): a table laid out
  * by [[graft.operators.Layout.clusterByZ]]-style jobs carries a
  * curve-bucket PARTITION column, and its zone map (bucket → raw
  * min/max box, dimension-bounded — at most 2^bucketBits rows) lives
  * comfortably on the driver. A scan filtered on the mapped columns
  * can then skip every partition directory whose box misses the
  * predicate's bounding box — exactly what lakehouse "data skipping
  * indexes" do, expressed as the standard Spark mechanism: rewrite
  * `Filter(cond, scan)` to `Filter(cond, Filter(bucket IN cands,
  * scan))`, and `FileSourceStrategy` turns the injected conjunct into
  * a PartitionFilter (directory pruning, pinned by PlanAuditSpec).
  *
  * Soundness (the rule may only ever REMOVE work, never rows):
  *   - bounds are extracted ONLY from top-level AND conjuncts of the
  *     shapes attr ⟨op⟩ literal / literal ⟨op⟩ attr with op in
  *     {=, >=, >, <=, <} on the registered columns; anything else
  *     (ORs, casts, expressions) contributes no bound — pruning with a
  *     SUPERSET box is still sound, just less effective;
  *   - a candidate bucket is any whose [min,max] box intersects the
  *     predicate box (the standard min/max skipping test); rows with
  *     NULL in a mapped column cannot satisfy a range conjunct, so
  *     their absence from the box stats never loses a row;
  *   - no bounds extracted, unknown table, or nothing pruned → the
  *     plan is returned UNCHANGED. The `zonemap_prune_scan` oracle is
  *     the end-to-end identity proof: the pruned scan answers the
  *     full-scan SQL verbatim.
  *
  * Lifecycle: [[attach]] registers a table's stats and idempotently
  * appends [[PruneRule]] to `spark.experimental.extraOptimizations`
  * (the documented hook for user rules — they run as a final batch, so
  * the injected Filter sits directly on the relation where physical
  * planning collects it). Stats are a point-in-time snapshot, same
  * contract as any external index: re-attach after rewriting the
  * table. [[detach]] drops the registration (the rule stays installed
  * but no longer matches).
  */
object ZoneMapPruning {

  /** One bucket's raw-value bounding box. NULL-only buckets carry no
    * box and are registered as unprunable candidates (`None`).
    */
  final case class BucketBox(bucket: Long, box: Option[(Long, Long, Long, Long)])

  final case class TableStats(bucketCol: String, xCol: String, yCol: String,
                              boxes: Seq[BucketBox])

  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, TableStats]

  private def canonical(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(p).toString
  }

  /** Register `path`'s zone map for pruning: one aggregation derives
    * the per-bucket raw boxes (dimension-bounded output, collected to
    * the driver — the same contract as an IVF centroid matrix), and
    * the optimizer rule is installed once per session.
    */
  def attach(spark: SparkSession, path: String, bucketCol: String,
             xCol: String, yCol: String): Unit = {
    import org.apache.spark.sql.functions._
    val stats = spark.read.parquet(path)
      .groupBy(col(bucketCol).cast("long").as("b"))
      .agg(min(col(xCol).cast("long")).as("x0"),
        max(col(xCol).cast("long")).as("x1"),
        min(col(yCol).cast("long")).as("y0"),
        max(col(yCol).cast("long")).as("y1"))
      .collect()
      .map { r =>
        BucketBox(r.getLong(0),
          if (r.isNullAt(1) || r.isNullAt(3)) None
          else Some((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      }
    registry.put(canonical(spark, path),
      TableStats(bucketCol, xCol, yCol, stats.toSeq))
    val installed = spark.experimental.extraOptimizations
    if (!installed.exists(_ eq PruneRule))
      spark.experimental.extraOptimizations = installed :+ PruneRule
  }

  def detach(spark: SparkSession, path: String): Unit =
    registry.remove(canonical(spark, path))

  /** Bounds of one attribute from the top-level conjuncts: (lower,
    * upper), unbounded sides at Long.Min/MaxValue.
    */
  private def boundsOf(conjuncts: Seq[Expression], name: String): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Byte, _)  => Some(v.toLong)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Int, _)   => Some(v.toLong)
      case Literal(v: Long, _)  => Some(v)
      case _                    => None
    }
    def attr(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name.equalsIgnoreCase(name)
      case _                     => false
    }
    conjuncts.foreach {
      case GreaterThanOrEqual(a, l) if attr(a) => lit(l).foreach(v => lo = math.max(lo, v))
      case GreaterThan(a, l) if attr(a) =>
        lit(l).foreach(v => lo = math.max(lo, if (v == Long.MaxValue) v else v + 1))
      case LessThanOrEqual(a, l) if attr(a) => lit(l).foreach(v => hi = math.min(hi, v))
      case LessThan(a, l) if attr(a) =>
        lit(l).foreach(v => hi = math.min(hi, if (v == Long.MinValue) v else v - 1))
      case EqualTo(a, l) if attr(a) =>
        lit(l).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v) }
      // reversed operand order
      case GreaterThanOrEqual(l, a) if attr(a) => lit(l).foreach(v => hi = math.min(hi, v))
      case GreaterThan(l, a) if attr(a) =>
        lit(l).foreach(v => hi = math.min(hi, if (v == Long.MinValue) v else v - 1))
      case LessThanOrEqual(l, a) if attr(a) => lit(l).foreach(v => lo = math.max(lo, v))
      case LessThan(l, a) if attr(a) =>
        lit(l).foreach(v => lo = math.max(lo, if (v == Long.MaxValue) v else v + 1))
      case EqualTo(l, a) if attr(a) =>
        lit(l).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v) }
      case _ => ()
    }
    (lo, hi)
  }

  object PruneRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case f @ Filter(cond, rel: LogicalRelation) =>
        val stats = rel.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.flatMap(p => registry.get(p.toString))
              .headOption
          case _ => None
        }
        stats match {
          case Some(TableStats(bucketCol, xCol, yCol, boxes)) =>
            val conjuncts = splitConjunctivePredicates(cond)
            val (x0, x1) = boundsOf(conjuncts, xCol)
            val (y0, y1) = boundsOf(conjuncts, yCol)
            val bounded = x0 != Long.MinValue || x1 != Long.MaxValue ||
              y0 != Long.MinValue || y1 != Long.MaxValue
            rel.output.find(_.name.equalsIgnoreCase(bucketCol)) match {
              case Some(bAttr) if bounded =>
                val cands = boxes.filter {
                  case BucketBox(_, None) => true // null-only box: keep
                  case BucketBox(_, Some((bx0, bx1, by0, by1))) =>
                    bx0 <= x1 && bx1 >= x0 && by0 <= y1 && by1 >= y0
                }.map(_.bucket)
                val inList = cands.flatMap(bucketLiteral(_, bAttr.dataType))
                // bail out unless every candidate converts losslessly —
                // an unconvertible bucket id must not silently drop
                if (cands.length < boxes.length &&
                    inList.length == cands.length) {
                  val pruned = Filter(
                    if (inList.isEmpty) Literal.FalseLiteral
                    else In(bAttr, inList), rel)
                  Filter(cond, pruned)
                } else f
              case _ => f
            }
          case None => f
        }
    }

    private def bucketLiteral(v: Long,
                              dt: org.apache.spark.sql.types.DataType): Option[Literal] =
      dt match {
        case org.apache.spark.sql.types.LongType => Some(Literal(v))
        case org.apache.spark.sql.types.IntegerType
          if v >= Int.MinValue && v <= Int.MaxValue => Some(Literal(v.toInt))
        case org.apache.spark.sql.types.ShortType
          if v >= Short.MinValue && v <= Short.MaxValue => Some(Literal(v.toShort))
        case _ => None
      }

    private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
      e match {
        case And(l, r) =>
          splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
        case other => Seq(other)
      }
  }
}
