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

  // ——— shuffled batch iteration (reference S9, `io/batch/batch.py:15-46`) ———

  /** Batch-id column added by [[shuffledBatches]]. */
  val BatchCol = "__BATCH__"

  /** Assign every row to one of ⌈n/size⌉ pseudo-random batches,
    * deterministically from `seed` — the distributed re-expression of the
    * reference's shuffled fixed-size batch iterator (S9,
    * `io/batch/batch.py:15-46`: torch DataLoader permutation + chunks).
    * A permutation's exact batch sizes need a global rank (a total sort —
    * affordable on the reference's single mmap'd node, anti-scale here);
    * hash-sharding gives size ± O(√size) batches in ONE narrow pass, the
    * same trade distributed training makes when sharding an epoch.
    * Re-seed per epoch (`seed + epoch`) for fresh shuffles. Duplicate
    * rows hash to the same batch (content-addressed identity). */
  def shuffledBatches(df: DataFrame, size: Int, seed: Long): DataFrame = {
    val (out, _) = shuffledBatchesWithCount(df, size, seed)
    out
  }

  private def shuffledBatchesWithCount(df: DataFrame, size: Int,
      seed: Long): (DataFrame, Long) = {
    require(size >= 1, s"batch size must be >= 1, got $size")
    val n = df.count()
    val numBatches = math.max(1L, (n + size - 1) / size)
    (df.withColumn(BatchCol,
      pmod(xxhash64(df.columns.toIndexedSeq.map(col) :+ lit(seed): _*),
        lit(numBatches))),
      numBatches)
  }

  /** Apply `f` once per shuffled batch (the reference's `imap` with a
    * per-batch `func`). Each batch is delivered WHOLE to one invocation:
    * rows are hash-partitioned by batch id (a batch never splits across
    * partitions) and sorted within partitions so co-resident batches
    * arrive as consecutive runs. The batch is materialized as a Seq —
    * bounded by construction at ~`size` rows, which is the entire point
    * of batching. */
  def imapBatches[T: org.apache.spark.sql.Encoder](
      df: DataFrame, size: Int, seed: Long)(
      f: (Long, Seq[org.apache.spark.sql.Row]) => IterableOnce[T])
      : org.apache.spark.sql.Dataset[T] = {
    val (batched, numBatches) = shuffledBatchesWithCount(df, size, seed)
    // cap the shuffle's partition count: the run-grouping iterator below
    // already handles many batches per partition, so one-partition-per-
    // batch would only buy scheduler overhead (390k tasks for 100M rows
    // at size=256); hash partitioning still keeps each batch whole
    val parts = math.min(numBatches,
      math.max(df.sparkSession.sparkContext.defaultParallelism.toLong * 4, 64L))
      .toInt
    batched
      .repartition(parts, col(BatchCol))
      .sortWithinPartitions(BatchCol)
      .mapPartitions { rows =>
        new Iterator[(Long, Seq[org.apache.spark.sql.Row])] {
          private val buf = rows.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): (Long, Seq[org.apache.spark.sql.Row]) = {
            val idx = buf.head.fieldIndex(BatchCol)
            val id = buf.head.getLong(idx)
            val batch = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
            while (buf.hasNext && buf.head.getLong(idx) == id) batch += buf.next()
            (id, batch.toSeq)
          }
        }.flatMap { case (id, batch) => f(id, batch).iterator }
      }
  }
}
