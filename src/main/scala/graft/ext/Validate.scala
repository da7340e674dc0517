package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint validation (the Deequ/
  * great-expectations admin surface, Schelter et al. 2018): a batch of
  * checks evaluated against a table, one result row per check with its
  * violation count. The gate a 100 TB pipeline runs BEFORE a training
  * job consumes a corpus snapshot — a null id or a dangling foreign key
  * found here costs one aggregation pass; found during training it
  * costs the run.
  *
  * Scale shape: every check folds into ONE aggregation over ONE scan of
  * the table. Scalar checks (not-null, range, set, regex, row-count)
  * are conditional-count aggregates; uniqueness is `count(*) −
  * count(distinct …)` in the same pass; referential integrity LEFT-joins
  * the distinct reference keys (dimension-sized — broadcast by Catalyst
  * when small, shuffled otherwise) BEFORE the aggregation, so FK misses
  * are counted by the same single pass instead of one anti-join job per
  * FK. No per-check scan, no driver-side row iteration.
  */
object Validate {

  sealed trait Check {
    /** Stable row label in the report. */
    def label: String
  }
  /** `column IS NOT NULL` for every row. */
  final case class NotNull(column: String) extends Check {
    def label = s"not_null($column)"
  }
  /** No two rows share a value tuple of `columns` (NULL-containing
    * tuples are ignored, matching SQL UNIQUE). Violations = number of
    * surplus rows beyond one per distinct tuple. */
  final case class Unique(columns: Seq[String]) extends Check {
    require(columns.nonEmpty, "Unique needs at least one column")
    def label = s"unique(${columns.mkString(",")})"
  }
  /** `lo <= column <= hi` (inclusive) for every non-NULL value. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check {
    require(lo <= hi, s"InRange: lo $lo > hi $hi")
    def label = s"in_range($column)"
  }
  /** Every non-NULL value is one of `values`. */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    require(values.nonEmpty, "InSet needs at least one value")
    def label = s"in_set($column)"
  }
  /** Every non-NULL value fully matches `regex` (anchored). */
  final case class Matches(column: String, regex: String) extends Check {
    def label = s"matches($column)"
  }
  /** Table has at least `n` rows. Violations = shortfall. */
  final case class RowCountAtLeast(n: Long) extends Check {
    require(n >= 0, s"RowCountAtLeast: n must be >= 0, got $n")
    def label = s"row_count_at_least($n)"
  }
  /** Every non-NULL `column` value exists in `ref(refColumn)`
    * (referential integrity). */
  final case class ForeignKey(column: String, ref: DataFrame,
      refColumn: String) extends Check {
    def label = s"foreign_key($column)"
  }

  /** Evaluate `checks` against `df`. Returns one row per check —
    * `(check, violations, passed)` — in the order given.
    *
    * The whole batch is one job: FK reference keys are joined in first
    * (distinct key list per FK, LEFT join on a marker column), then a
    * single aggregation computes every violation count, and the one
    * result row is exploded into the report layout (the
    * [[Describe.describe]] pattern).
    */
  // FK marker columns: LEFT join each FK's distinct reference keys,
  // carrying a literal marker; a NULL marker after the join is a miss.
  // Distinct BEFORE the join keeps the join 1:1 (no row duplication).
  private def fkAugment(df: DataFrame,
      checks: Seq[Check]): (DataFrame, Map[Int, String]) = {
    var augmented = df
    val fkMarker = checks.zipWithIndex.collect {
      case (fk: ForeignKey, i) =>
        val m = s"__fk$i"
        augmented = augmented.join(
          fk.ref.select(col(fk.refColumn).as(s"__fkk$i")).distinct()
            .withColumn(m, lit(1)),
          augmented(fk.column) === col(s"__fkk$i"), "left")
        (i, m)
    }.toMap
    (augmented, fkMarker)
  }

  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    val (augmented, fkMarker) = fkAugment(df, checks)
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      val v: Column = c match {
        case NotNull(cn) =>
          count(when(col(cn).isNull, 1))
        case Unique(cols) =>
          // rows with a fully non-NULL tuple, minus distinct tuples;
          // multi-arg count_distinct skips NULL-containing tuples,
          // matching SQL UNIQUE (a struct would count them)
          val nonNull = cols.map(col(_).isNotNull).reduce(_ && _)
          count(when(nonNull, 1)) -
            count_distinct(col(cols.head), cols.tail.map(col): _*)
        case InRange(cn, lo, hi) =>
          count(when(col(cn).isNotNull &&
            (col(cn).cast("double") < lo || col(cn).cast("double") > hi), 1))
        case InSet(cn, vs) =>
          count(when(col(cn).isNotNull &&
            !col(cn).cast("string").isin(vs: _*), 1))
        case Matches(cn, re) =>
          count(when(col(cn).isNotNull &&
            !col(cn).cast("string").rlike(s"^(?:$re)$$"), 1))
        case RowCountAtLeast(n) =>
          greatest(lit(n) - count(lit(1)), lit(0L))
        case fk: ForeignKey =>
          count(when(col(fk.column).isNotNull &&
            col(fkMarker(i)).isNull, 1))
      }
      v.cast("long").as(s"__v$i")
    }
    val one = augmented.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.label).as("check"),
        col(s"__v$i").as("violations"),
        (col(s"__v$i") === 0L).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("__r")).select("__r.*")
  }

  /** Row-level companion to [[validate]]: annotate every row with the
    * labels of the checks IT violates — `df.*` plus `flagCol` (an
    * array of violated-check labels, in check order; empty = the row
    * passes). The quarantine split a streaming ingest gate needs:
    * [[validate]] says WHETHER a snapshot is clean; this says WHICH
    * rows to hold back.
    *
    * Only row-attributable checks are legal here — [[Unique]] and
    * [[RowCountAtLeast]] are properties of the whole frame, not of a
    * row, and are rejected loudly (run them through [[validate]]).
    *
    * Scale shape: one projection over the (FK-augmented) scan — every
    * flag is a codegen'd boolean expression; no aggregation, no
    * per-check pass. */
  def flagViolations(df: DataFrame, checks: Seq[Check],
      flagCol: String = "violations"): DataFrame = {
    require(checks.nonEmpty, "flagViolations needs at least one check")
    checks.foreach {
      case c @ (_: Unique | _: RowCountAtLeast) =>
        throw new IllegalArgumentException(
          s"${c.label} is frame-level, not row-attributable — " +
            "evaluate it with validate()")
      case _ => ()
    }
    val (augmented, fkMarker) = fkAugment(df, checks)
    val flags = checks.zipWithIndex.map { case (c, i) =>
      val bad: Column = c match {
        case NotNull(cn) => col(cn).isNull
        case InRange(cn, lo, hi) => col(cn).isNotNull &&
          (col(cn).cast("double") < lo || col(cn).cast("double") > hi)
        case InSet(cn, vs) => col(cn).isNotNull &&
          !col(cn).cast("string").isin(vs: _*)
        case Matches(cn, re) => col(cn).isNotNull &&
          !col(cn).cast("string").rlike(s"^(?:$re)$$")
        case fk: ForeignKey => col(fk.column).isNotNull &&
          col(fkMarker(i)).isNull
        case _: Unique | _: RowCountAtLeast =>
          throw new IllegalStateException("unreachable: rejected above")
      }
      when(bad, lit(c.label))
    }
    augmented.select(df.columns.map(col).toIndexedSeq :+
      array_compact(array(flags: _*)).as(flagCol): _*)
  }

  /** Keyed diff of two table versions — the "what changed between
    * corpus v1 and v2" audit a pipeline runs before re-training on a
    * refreshed snapshot: one row per key whose presence or content
    * differs, `status` ∈ `added` (right only) / `removed` (left only) /
    * `changed` (both sides, any compared column differs — null-safe).
    * Unchanged keys are absent. Compared columns = the LEFT side's
    * non-key columns; the right side must carry them all (checked
    * statically). Keys must be non-NULL and unique per side — checked
    * in ONE bounded aggregation per side and REFUSED otherwise (a
    * duplicate key would silently turn the full-outer join into a
    * row-multiplying blowup and the diff into nonsense; same
    * fail-don't-degrade discipline as the all-pairs guards).
    *
    * Scale shape: one full-outer hash join on the key, both sides
    * pruned to keyCol + the compared set packed in ONE struct; content
    * comparison is a null-safe struct inequality (structs compare like
    * rows — NULL fields equal NULL fields), evaluated row-side in
    * codegen. No hashing pass, no collect; output is keys + a status
    * string, never the payloads. */
  def diffByKey(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val cols = a.columns.filterNot(_ == keyCol).toSeq
    require(a.columns.contains(keyCol) && b.columns.contains(keyCol),
      s"diffByKey: both sides need key column '$keyCol'")
    require(cols.nonEmpty, "diffByKey: no non-key columns to compare")
    val missing = cols.filterNot(b.columns.contains)
    require(missing.isEmpty,
      s"diffByKey: right side lacks compared column(s) ${missing.mkString(", ")}")
    def guardKeys(df: DataFrame, side: String): Unit = {
      val r = df.agg(count(lit(1)), count(col(keyCol)),
        countDistinct(col(keyCol))).head()
      require(r.getLong(0) == r.getLong(1),
        s"diffByKey: NULL $keyCol on the $side side — keys must be non-NULL")
      require(r.getLong(1) == r.getLong(2),
        s"diffByKey: duplicate $keyCol on the $side side — " +
          "deduplicate (e.g. Dedup.latestByKey) before diffing")
    }
    guardKeys(a, "left"); guardKeys(b, "right")
    val la = a.select(col(keyCol),
      struct(cols.map(col): _*).as("__va__"), lit(1).as("__pa__"))
    val lb = b.select(col(keyCol),
      struct(cols.map(col): _*).as("__vb__"), lit(1).as("__pb__"))
    // shuffle_hash: full-outer hash join (SPARK-32399) streams one side
    // and hashes the other instead of sorting BOTH snapshots (guide §3.1)
    la.join(lb.hint("shuffle_hash"), Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("__pa__").isNull, lit("added"))
          .when(col("__pb__").isNull, lit("removed"))
          .when(!(col("__va__") <=> col("__vb__")), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col(keyCol), col("status"))
  }
}
