package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints over a frame — the audit every
  * serving-layer load wants in front of it (the reference reconciles
  * row COUNTS between its dual sinks; production pipelines also gate
  * on nulls, key uniqueness, domains and referential integrity before
  * promoting a load). One call returns a small
  * `(constraint, n_rows, n_violations)` frame; compose with an
  * `assert_true(n_violations === 0)` where a violation must fail the
  * job in-plan (the repo's gate convention).
  *
  * Null semantics follow SQL CHECK: a row violates [[InRange]] /
  * [[Matches]] only when the predicate is definitely FALSE — a NULL
  * value passes (unknown), and null-freedom is [[NotNull]]'s job, so
  * the two compose instead of double-counting. A NULL foreign key
  * passes [[ForeignKey]] for the same reason.
  *
  * Scale shape: every row-local constraint (NotNull/InRange/Matches)
  * folds into ONE shared map-side-combining aggregation pass over the
  * frame — adding a tenth rule costs one more sum column, never
  * another scan. [[Unique]] is one hash aggregation keyed on the
  * candidate key; [[ForeignKey]] is one broadcast left join against
  * the (dimension-sized, deduplicated) key column + the same count
  * pass. The result union is constraint-sized.
  */
object Constraints {

  sealed trait Constraint { def label: String }

  final case class NotNull(column: String) extends Constraint {
    val label = s"not_null($column)"
  }

  /** Closed integral range check, nulls pass (see object scaladoc). */
  final case class InRange(column: String, lo: Long, hi: Long)
      extends Constraint {
    val label = s"in_range($column,$lo,$hi)"
  }

  /** RE2-safe regex domain check on a string column, nulls pass. */
  final case class Matches(column: String, pattern: String)
      extends Constraint {
    val label = s"matches($column)"
  }

  /** Candidate-key check: a violation is EVERY row that shares its key
    * with another row (so `n_violations = Σ_{groups with c>1} c` — the
    * rows a dedup would have to adjudicate, not the groups).
    */
  final case class Unique(columns: Seq[String]) extends Constraint {
    require(columns.nonEmpty, "Unique needs at least one column")
    val label = s"unique(${columns.mkString(",")})"
  }

  /** Referential check: non-null `column` values must appear in
    * `dim`'s `dimColumn` (deduplicated and broadcast — dimension-sized
    * by contract, like any FK target).
    */
  final case class ForeignKey(column: String, dim: DataFrame,
                              dimColumn: String) extends Constraint {
    val label = s"foreign_key($column->$dimColumn)"
  }

  /** Evaluate all constraints; output one row each:
    * (constraint, n_rows, n_violations), `constraint` = the label.
    */
  def audit(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "audit needs at least one constraint")
    val rowLocal: Seq[(String, org.apache.spark.sql.Column)] =
      constraints.collect {
        case c: NotNull => c.label -> col(c.column).isNull
        case c: InRange => c.label -> {
          val numeric = df.schema.fields
            .find(_.name.equalsIgnoreCase(c.column))
            .exists(_.dataType
              .isInstanceOf[org.apache.spark.sql.types.NumericType])
          if (numeric)
            // definitely-false only: null comparison -> null -> passes
            coalesce(!(col(c.column) >= c.lo && col(c.column) <= c.hi),
              lit(false))
          else {
            // type-drifted load (the rule was suggested against a
            // numeric column; today's frame carries something else):
            // parse as a NUMBER, not as a long — "7.0" must pass an
            // in-range check on [1,10], and a long try_cast rejects any
            // fractional rendering. decimal(38,9) keeps giant integral
            // renderings exact where a double would round 2⁵³-scale
            // boundaries; a value that does not even parse as a number
            // (or exceeds the decimal range, hence any long range) is
            // definitely outside — COUNT it as a violation instead of
            // letting an ANSI cast fail the job
            val v = col(c.column).try_cast("decimal(38,9)")
            col(c.column).isNotNull &&
              coalesce(!(v >= c.lo && v <= c.hi), lit(true))
          }
        }
        case c: Matches => c.label ->
          coalesce(!regexp_like(col(c.column), lit(c.pattern)), lit(false))
      }
    val parts = Seq.newBuilder[DataFrame]
    if (rowLocal.nonEmpty) {
      val aggs = count(lit(1)).as("__n") +: rowLocal.zipWithIndex.map {
        case ((_, viol), i) =>
          sum(when(viol, 1L).otherwise(0L)).as(s"__v$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      parts += one.select(explode(array(rowLocal.zipWithIndex.map {
        case ((label, _), i) =>
          struct(lit(label).as("constraint_name"), col("__n").as("n_rows"),
            col(s"__v$i").as("n_violations"))
      }: _*)).as("r")).select(col("r.constraint_name"), col("r.n_rows"),
        col("r.n_violations"))
    }
    constraints.foreach {
      case c: Unique =>
        parts += df.groupBy(c.columns.map(col): _*)
          .agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
            coalesce(sum(when(col("__c") > 1, col("__c")).otherwise(0L)),
              lit(0L)).as("n_violations"))
          .select(lit(c.label).as("constraint_name"), col("n_rows"),
            col("n_violations"))
      case c: ForeignKey =>
        val keys = broadcast(
          c.dim.select(col(c.dimColumn).as("__fk")).distinct())
        parts += df.join(keys, col(c.column) === col("__fk"), "left")
          .agg(count(lit(1)).as("n_rows"),
            coalesce(sum(when(col(c.column).isNotNull && col("__fk").isNull,
              1L).otherwise(0L)), lit(0L)).as("n_violations"))
          .select(lit(c.label).as("constraint_name"), col("n_rows"),
            col("n_violations"))
      case _ => () // row-local: already folded into the shared pass
    }
    parts.result().reduce(_ unionByName _)
  }

  /** [[audit]] with the in-plan gate: reading the frame FAILS unless
    * every constraint is clean — the promotion gate form.
    */
  def auditGated(df: DataFrame, constraints: Seq[Constraint]): DataFrame =
    audit(df, constraints)
      .where(assert_true(col("n_violations") === 0,
        concat(lit("data-quality constraint violated: "), col("constraint_name"),
          lit(" ("), col("n_violations"), lit(" rows)"))).isNull)

  /** The discovery half feeding the enforcement half: derive a
    * suggested rule table from a [[Profile.table]] frame — what a
    * platform runs on the FIRST load of a table so the SECOND load can
    * be audited against yesterday's facts. Deterministic row-local
    * derivation over the (columns-sized) profile:
    *
    *   - `not_null`  — the column was observed null-free (and the
    *     frame non-empty: zero rows prove nothing);
    *   - `unique`    — the profiler's candidate-key verdict (already
    *     null under approximate distinct counts, which propagates to
    *     "no suggestion" here — an estimate cannot found a key rule);
    *   - `in_range`  — observed [min, max], emitted ONLY for columns
    *     the profile records as INTEGRAL (`data_type` ∈ tinyint..
    *     bigint): the gate is the column's TYPE, not whether its
    *     rendered min/max happen to parse as integers — a text column
    *     of zero-padded IDs or numeric codes must not found a numeric
    *     range rule (auditing it would compare strings to long
    *     literals, and its real domain is lexicographic anyway).
    *     Decimal, date and text columns produce no range rule rather
    *     than a wrong one.
    *
    * Output one row per suggestion: `(column_name, rule_type, lo,
    * hi)`, bounds null except for `in_range`. Suggested ranges are the
    * OBSERVED envelope — by construction the same table re-audits
    * clean, and a drifted load flags exactly what moved (the paired
    * spec drives both directions); a human widens them before
    * enforcing, same as any profiler-suggested constraint.
    */
  def suggestFromProfile(profile: DataFrame): DataFrame = {
    // ONE reference to the profile (r18): the previous three-way
    // filter+union planned the profile subtree — typically the
    // multi-count_distinct one-pass aggregate over the full table —
    // THREE times inside one job (the select-union trap
    // ngramContainmentPairs documents; dq_suggest measured ~3 table
    // scans' worth of wall). The same row set now falls out of a single
    // explode of per-rule conditional structs over one profile pass.
    //
    // in_range keeps its type gate (integral columns only — see
    // scaladoc) and try_cast, not cast, for the bound values so an
    // exotic rendering means "no range rule" under ANSI mode, never a
    // thrown cast error.
    val nullL = lit(null).cast("long")
    val candidates = array(
      when(col("n_rows") > 0 && col("n_nonnull") === col("n_rows"),
        struct(lit("not_null").as("rule_type"),
          nullL.as("lo"), nullL.as("hi"))),
      when(col("is_candidate_key") === true,
        struct(lit("unique").as("rule_type"),
          nullL.as("lo"), nullL.as("hi"))),
      when(col("n_nonnull") > 0 &&
          col("data_type").isin("tinyint", "smallint", "int", "bigint") &&
          col("min_value").try_cast("long").isNotNull &&
          col("max_value").try_cast("long").isNotNull,
        struct(lit("in_range").as("rule_type"),
          col("min_value").try_cast("long").as("lo"),
          col("max_value").try_cast("long").as("hi"))))
    profile
      .select(col("column_name"),
        explode(filter(candidates, r => r.isNotNull)).as("__rule"))
      .select(col("column_name"), col("__rule.rule_type").as("rule_type"),
        col("__rule.lo").as("lo"), col("__rule.hi").as("hi"))
  }

  /** Materialize a [[suggestFromProfile]] frame into [[Constraint]]s
    * for [[audit]]/[[auditGated]] — the composition's second half. The
    * suggestion table is columns-sized (≤3 rows per column), so the
    * collect is bounded metadata, like reading any rule config.
    */
  def fromSuggestions(suggestions: DataFrame): Seq[Constraint] =
    suggestions.select(col("column_name"), col("rule_type"), col("lo"),
        col("hi"))
      .collect().toSeq.map { r =>
        val c = r.getString(0)
        r.getString(1) match {
          case "not_null" => NotNull(c)
          case "unique"   => Unique(Seq(c))
          case "in_range" => InRange(c, r.getLong(2), r.getLong(3))
          case other => throw new IllegalArgumentException(
            s"unknown suggested rule type: $other")
        }
      }
}
