package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-shape tools for skewed / very large joins.
  *
  * At 100 TB a single hot key turns a hash join into one straggler task;
  * these helpers restructure the plan, complementing AQE's runtime skew
  * splitting (which only kicks in for sort-merge joins past thresholds).
  */
object Scale {

  /** Salted inner equi-join for skewed keys.
    *
    * The big (skewed) side gets a uniform random salt in [0, saltFactor);
    * the small side is replicated `saltFactor` times; the join key becomes
    * (key, salt), spreading each hot key over `saltFactor` tasks. Result
    * set is identical to `big.join(small, key)`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor >= 1)
    val salted = big.withColumn("__salt__",
      (rand(42L) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt__",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt__")).drop("__salt__")
  }

  /** Two-phase (partial → final) aggregation for high-cardinality skewed
    * group-bys: pre-aggregate on (key, salt), then merge per key. For
    * algebraic aggregates this halves shuffle volume under skew; Spark's
    * hash aggregate already does map-side partials, so use this only when
    * a single group overflows one task's hash table. */
  def twoPhaseCount(df: DataFrame, key: String, saltFactor: Int = 16): DataFrame =
    df.withColumn("__salt__", (rand(42L) * saltFactor).cast("int"))
      .groupBy(col(key), col("__salt__")).agg(count(lit(1)).as("__partial__"))
      .groupBy(col(key)).agg(sum("__partial__").as("cnt"))

  /** Balanced (stratified) sample: the first `n` rows of every stratum
    * under a deterministic order — the training-data-mix primitive
    * ("at most n docs per language/source"). One window over a single
    * shuffle on the strata key; deterministic, so resumable pipelines
    * re-produce the same sample (unlike fraction-based `sampleBy`).
    * For seeded-random balance, order by a hash of the id instead of the
    * id itself. */
  def balancedSample(df: DataFrame, strataCols: Seq[String], n: Int,
      orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= n)
      .drop("__rn__")
  }

  /** Range-bucket co-partitioning: repartition both sides by the same
    * expression so a subsequent join/zip is shuffle-local. */
  def coPartition(a: DataFrame, b: DataFrame, key: String, partitions: Int)
      : (DataFrame, DataFrame) =
    (a.repartition(partitions, col(key)), b.repartition(partitions, col(key)))
}
