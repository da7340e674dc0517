package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.coder.{CoderConfig, Coding}
import graft.index.Index
import graft.store.Store

/** The engine facade — the reference Flight client surface
  * (`/root/reference/src/fenix/flight.py:137-292`) re-expressed as a
  * stateless library API: every scan parameter travels in the call (no
  * server-global session state, fixing the reference race — SURVEY §1.3).
  */
class Engine(val spark: SparkSession, val root: String,
    val advisedStampTtlMs: Long = 10000L) {
  val store = new Store(spark, root)

  // ——— tables ———
  def makeTable(name: String, df: DataFrame): Unit = store.createTable(name, df)

  /** CSV/JSON ingest with explicit schema ([[Store.importTable]]). */
  def importTable(name: String, path: String, format: String, schemaDdl: String,
      options: Map[String, String] = Map.empty): Unit =
    store.importTable(name, path, format, schemaDdl, options)

  /** `read_table` (S8/`flight.py:46-60`): multi-source load, optional
    * attached codes, filter, select — all explicit arguments. */
  def readTable(
      names: Seq[String],
      select: Option[Seq[String]] = None,
      filter: Option[Column] = None,
      coding: Option[(String, String)] = None): DataFrame = {
    val base = coding match {
      case Some((codingName, column)) =>
        names.map(n => Index.load(store, codingName, n, column)).reduce(_ unionByName _)
      case None => store.loadTable(names: _*)
    }
    val filtered = filter.fold(base)(base.filter)
    select.fold(filtered)(cols => filtered.select(cols.map(col): _*))
  }

  /** Export a table (or any query over it) back to the reference's
    * native Arrow IPC stream format ([[graft.sources.ArrowIpc.writeStream]])
    * — the reverse of the arrow [[importTable]] path; returns rows
    * written. */
  def exportArrow(name: String, path: String,
      maxRecordsPerBatch: Int = 4096): Long =
    graft.sources.ArrowIpc.writeStream(store.loadTable(name), path,
      maxRecordsPerBatch)

  /** Export a stored table as CSV or JSONL — Spark's `json` sink writes
    * one object per line, the standard training-data delivery format.
    * Distributed write, one file per partition; `shards > 0`
    * repartitions first to bound the output file count (balanced by
    * round-robin, so shard sizes stay even at any scale). Returns rows
    * exported. Round-trips through [[importTable]]. */
  def exportTable(name: String, path: String, format: String,
      options: Map[String, String] = Map.empty, shards: Int = 0): Long = {
    require(Set("csv", "json").contains(format),
      s"unsupported export format '$format' (csv | json)")
    val df0 = store.loadTable(name)
    val df = if (shards > 0) df0.repartition(shards) else df0
    df.write.mode("overwrite").options(options).format(format).save(path)
    df0.count()
  }

  def listTables(): Seq[String] = store.listTables()
  def dropTable(name: String): Unit = store.dropTable(name)

  // ——— coder / index ———
  def makeCoder(name: String, source: String, column: String, config: CoderConfig): Coding =
    store.makeCoder(name, source, column, config)

  def syncIndex(codingName: String, source: String, column: String): Unit =
    Index.build(store, codingName, source, column)

  def makeIndex(name: String, source: String, column: String, config: CoderConfig): Unit = {
    makeCoder(name, source, column, config)
    syncIndex(name, source, column)
  }

  def listCodings(): Seq[String] = store.listCodings()
  def dropIndex(name: String): Unit = store.dropCoding(name)

  // ——— lexical (BM25) inverted index ———

  /** Materialize the BM25 inverted index of a stored table's text
    * column ([[graft.ext.Lexical]]): postings partitioned by
    * `__TERM_BUCKET__` (a keyword query prunes to its terms' buckets
    * at the file listing, the lexical analogue of the IVF tiers'
    * cell pruning) plus the narrow doc-length sidecar. With
    * `positional` the postings also carry each occurrence's sorted
    * token positions, enabling [[searchPhrase]] — BM25 queries read
    * the same artifact and simply prune the positions column. */
  def buildLexicalIndex(source: String, idCol: String, textCol: String,
      buckets: Int = 64, positional: Boolean = false): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val df = store.loadTable(source)
    val base = store.lexIndexPath(source, textCol)
    graft.store.Swap.withArtifactLock(base) {
      val post =
        if (positional)
          graft.ext.Lexical.positionalPostings(df, idCol, textCol, buckets)
        else graft.ext.Lexical.postings(df, idCol, textCol, buckets)
      post.write.mode("overwrite").partitionBy("__TERM_BUCKET__")
        .parquet(s"$base/postings")
      graft.ext.Lexical.docLengths(df, idCol, textCol)
        .write.mode("overwrite").parquet(s"$base/doclens")
      // bucket count rides the artifact — a query pruning with the wrong
      // modulus would silently miss terms; the positional flag too, so
      // sync keeps appending the same posting shape
      store.writeSidecar(s"$base/meta.json",
        s"""{"buckets":$buckets,"positional":$positional}"""
          .getBytes("UTF-8"))
    }
  }

  private def lexMeta(base: String): (Int, Boolean) = {
    val s = new String(store.readSidecar(s"$base/meta.json"), "UTF-8")
    val buckets = """"buckets"\s*:\s*(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"lexical index at $base has no bucket count in meta.json"))
    val positional = """"positional"\s*:\s*true""".r.findFirstIn(s).isDefined
    (buckets, positional)
  }

  /** Append newly ingested documents to the lexical index: docs whose
    * id is absent from the doc-length sidecar get their postings and
    * lengths appended — the append-only-corpus incremental path (no
    * existing posting is rewritten; document UPDATES need a rebuild,
    * as with every tier's in-place-modification contract). Mutations
    * run under the artifact lock — a concurrent compaction rewriting
    * the very buckets an append lands in would otherwise install a
    * rewrite missing the appended rows. */
  def syncLexicalIndex(source: String, idCol: String,
      textCol: String): Long = {
    val base = store.lexIndexPath(source, textCol)
    graft.store.Swap.withArtifactLock(base) {
      val (buckets, positional) = lexMeta(base)
      // restore any crashed-compaction aside BEFORE appending: an append
      // that recreates a bucket dir whose only full copy sits in an aside
      // would otherwise turn the next compaction's stale-aside cleanup
      // into silent data loss for every pre-crash posting of that bucket
      recoverLexArtifacts(base)
      val known = spark.read.parquet(s"$base/doclens").select("id")
      val fresh = store.loadTable(source)
        // null-text docs are unindexable and never enter doclens — drop
        // them up front so re-sync stays a no-op (idempotent count)
        .filter(col(textCol).isNotNull)
        .join(known, col(idCol) === known("id"), "left_anti")
        .localCheckpoint(true) // freeze: the appends below grow the very
                               // paths a lazy plan would re-list
      try {
        val n = fresh.count()
        if (n > 0) {
          val post =
            if (positional) graft.ext.Lexical
              .positionalPostings(fresh, idCol, textCol, buckets)
            else graft.ext.Lexical.postings(fresh, idCol, textCol, buckets)
          post.write.mode("append").partitionBy("__TERM_BUCKET__")
            .parquet(s"$base/postings")
          graft.ext.Lexical.docLengths(fresh, idCol, textCol)
            .write.mode("append").parquet(s"$base/doclens")
        }
        n
      } finally org.apache.spark.sql.GraftShims.releaseCheckpoint(fresh)
    }
  }

  /** Top-k BM25 keyword search through the materialized index —
    * touches only the query terms' posting buckets
    * ([[graft.ext.Lexical.bm25FromIndex]]). `requireAll` switches to
    * conjunctive (AND) retrieval. Ties break by id. */
  def searchBm25(source: String, textCol: String, terms: Seq[String],
      k: Int = 10, requireAll: Boolean = false): DataFrame = {
    val base = store.lexIndexPath(source, textCol)
    recoverLexArtifacts(base) // reads too: a crashed compaction's aside
    // is invisible to parquet listing — without this, queries silently
    // miss every term hashing to that bucket until a mutating call
    val buckets = lexMeta(base)._1
    // explicit term-bucket leaf paths (the fuzzy tier's round-19
    // lesson, [[readBuckets]]): a keyword query knows its buckets
    // before reading, so partition discovery lists just those dirs
    // instead of the whole layout
    val bks = terms.map(graft.ext.Lexical.termBucket(_, buckets)).distinct
    graft.ext.Lexical.bm25FromIndex(
        readBuckets(s"$base/postings", "__TERM_BUCKET__", bks, buckets),
        spark.read.parquet(s"$base/doclens"), terms, buckets,
        requireAll = requireAll)
      .orderBy(col("bm25").desc, col("id").asc).limit(k)
  }

  /** Top-k exact-phrase search through the positional index
    * ([[graft.ext.Lexical.phraseMatch]] — pulls only the phrase terms'
    * posting buckets). Requires the index to have been built with
    * `positional = true`; fails loudly otherwise (a non-positional
    * artifact cannot answer phrase queries). Ranks by occurrence
    * count, ties break by id. */
  def searchPhrase(source: String, textCol: String, phrase: Seq[String],
      k: Int = 10): DataFrame = {
    val base = store.lexIndexPath(source, textCol)
    recoverLexArtifacts(base) // see searchBm25 — reads need the sweep too
    val (buckets, positional) = lexMeta(base)
    require(positional, s"lexical index for $source.$textCol was built " +
      "without positions — rebuild with positional = true for phrase search")
    // leaf-path pruning as [[searchBm25]]
    val bks = phrase.map(graft.ext.Lexical.termBucket(_, buckets)).distinct
    graft.ext.Lexical.phraseMatch(
        readBuckets(s"$base/postings", "__TERM_BUCKET__", bks, buckets),
        phrase, buckets)
      .orderBy(col("hits").desc, col("id").asc).limit(k)
  }

  /** Coalesce fragmented posting buckets — the maintenance step an
    * incrementally synced lexical index needs: every [[syncLexicalIndex]]
    * appends its own file set to each touched bucket, so a bucket synced
    * N times holds ≥ N small files and keyword-query scan cost becomes
    * task-overhead-bound. Buckets with more than `maxFilesPerBucket`
    * files are rewritten (temp sibling + per-bucket directory rename, as
    * [[compactIndex]]); the doc-length sidecar is rewritten alongside
    * when it fragments past the same bound. Content is identical. */
  /** Crash recovery for the lexical index's swap artifacts
    * ([[graft.store.Swap]] holds the shared discipline). MUST run
    * before ANY path that appends to or rewrites the postings/doclens
    * (sync and compaction both call it first): a lone posting-bucket
    * aside with its live dir ABSENT means a compaction crashed between
    * aside-rename and install — rename it back BEFORE an append can
    * recreate the live dir with only new postings, which would make
    * "aside alongside live" ambiguous and a later cleanup would delete
    * the only full copy. Read entry points ([[searchBm25]]/
    * [[searchPhrase]]) run it too: the aside is dot-prefixed and
    * INVISIBLE to parquet file listing, so between a crash and the next
    * mutating call queries would otherwise silently miss every term
    * hashing to the crashed bucket. One listStatus when clean, and the
    * artifact lock is taken ONLY when that listing shows an aside — a
    * read path must never rename an aside out from under a RUNNING
    * compaction's legitimate aside→install window (see
    * [[graft.store.Swap.withArtifactLock]]); inside the lock the sweep
    * re-checks, so an aside that belonged to a just-finished compaction
    * resolves to a no-op. */
  private def recoverLexArtifacts(base: String): Unit = {
    val fs = store.fs
    val postings = new org.apache.hadoop.fs.Path(s"$base/postings")
    val doclens = new org.apache.hadoop.fs.Path(s"$base/doclens")
    if (graft.store.Swap.hasBucketAsides(fs, postings, "__TERM_BUCKET__") ||
        graft.store.Swap.hasFlatAside(fs, doclens))
      graft.store.Swap.withArtifactLock(base) {
        graft.store.Swap.recoverBucketAsides(fs, postings, "__TERM_BUCKET__")
        graft.store.Swap.recoverFlatAside(fs, doclens)
      }
  }

  def compactLexicalIndex(source: String, textCol: String,
      maxFilesPerBucket: Int = 8): (Long, Long) = {
    require(maxFilesPerBucket >= 1, "maxFilesPerBucket must be >= 1")
    val base = store.lexIndexPath(source, textCol)
    // the WHOLE compact holds the artifact lock: the rewrite must not
    // race a sync's append into the same buckets (an installed rewrite
    // read before the append would silently drop the appended rows),
    // and the aside→install window must not race a reader's recovery
    // sweep ([[graft.store.Swap.withArtifactLock]])
    graft.store.Swap.withArtifactLock(base) {
      lexMeta(base) // fail loudly on a missing index
      // Crash recovery from a previous run killed mid-swap (postings
      // bucket asides AND the doclens aside). Every mutating entry point
      // runs this first — see [[recoverLexArtifacts]] for why ordering it
      // before appends is what makes aside-alongside-live unambiguous.
      recoverLexArtifacts(base)
      val fs = store.fs
      val buckets = graft.store.Swap.compactBuckets(spark, fs,
        s"$base/postings", "__TERM_BUCKET__", maxFilesPerBucket,
        "compactLexicalIndex")
      val lens = graft.store.Swap.compactFlat(spark, fs,
        s"$base/doclens", maxFilesPerBucket, "compactLexicalIndex")
      (buckets, lens)
    }
  }

  // ——— Fuzzy (edit-distance) lookup index ———

  /** Persist the PassJoin artifacts of a stored table's text column as
    * a FUZZY LOOKUP INDEX: the (id, t, len) base plus the segment and
    * probe frames, each PARTITIONED BY a CRC32 bucket of the segment
    * content — the edit-distance analogue of the lexical tier's term
    * buckets — plus the per-key row counts of both frames (the
    * candidate-volume guard's statistics, precomputed so a batch
    * [[fuzzyJoin]]'s guard cost scales with the query side only). A
    * [[fuzzyLookup]] computes the query's ≤ (k+1)²(2k+1) segment keys
    * DRIVER-SIDE ([[graft.ext.Dedup.querySegKeys]]/[[queryProbeKeys]])
    * and prunes both scans to those keys' bucket directories at the
    * file listing, so a single lookup touches a constant number of
    * buckets regardless of corpus size.
    *
    * Lifecycle parity with the other five tiers: the build records the
    * source file-listing stamp; [[syncFuzzyIndex]] appends new docs'
    * rows (PassJoin frames are row-local, so appends compose exactly);
    * [[fuzzyIndexIsFresh]] reports staleness after in-place source
    * rewrites (which need a rebuild, as everywhere); and
    * [[compactFuzzyIndex]] coalesces sync-fragmented buckets. */
  def buildFuzzyIndex(source: String, idCol: String, textCol: String,
      maxDist: Int = 2, buckets: Int = 64): Unit = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = store.fuzzyIndexPath(source, textCol)
    // listing BEFORE reading: a concurrent source change mid-build then
    // leaves a stale stamp (conservative) rather than a wrongly-fresh one
    val listing = store.sourceListing(source)
    val bf = graft.ext.Dedup.editDistanceBase(
      store.loadTable(source), idCol, textCol)
    graft.store.Swap.withArtifactLock(base) {
      // the base is partitioned by an ID bucket (layout 2): the lookup's
      // final verify then prunes the base scan to its candidates' buckets
      // instead of scanning every stored document's text — without this,
      // single-lookup latency scales with corpus size.
      // Base and frame writes overlap (guide §2.6): a from-scratch build
      // is all-or-nothing (the freshness stamp lands only after every
      // write), so the overwrite writes carry no ordering constraint.
      var frames = (0L, 0L)
      runConcurrently(Seq(
        () => writeFuzzyBase(base, bf, buckets, mode = "overwrite"),
        () => { frames =
          writeFuzzyFrames(base, bf, maxDist, buckets, mode = "overwrite") }))
      val (maxNs, maxNp) = frames
      // parameters ride the artifact: pruning with a different modulus or
      // distance than the build's would silently miss candidates; the id
      // column rides too so sync can anti-join the source against the
      // base. layout 2 (id-bucketed base) is the only layout written or
      // served — artifacts predating it need a rebuild. maxNsBound/
      // maxNpBound are per-key frequency UPPER bounds (sync adds each
      // delta's max — Σ of per-delta maxima ≥ any key's true total),
      // letting the serving join's volume guard run driver-side.
      store.writeSidecar(s"$base/meta.json",
        fuzzyMetaJson(maxDist, buckets, idCol, maxNs, maxNp))
      Index.recordSourceStamp(store, base, listing)
    }
  }

  /** Run independent Spark actions concurrently and wait for all
    * (guide §2.6 "overlap independent jobs"): the fuzzy lifecycle's
    * artifact writes are separate small jobs whose tails leave most
    * cores idle — submitted together, each job's tasks back-fill the
    * executors the others free. Threads are created fresh PER CALL so
    * Spark's InheritableThreadLocal job group/description (the bench
    * watchdog's cancellation handle) is inherited from the caller.
    * The first failure rethrows after all tasks settle — no write is
    * left mid-flight when the caller unwinds into its artifact-lock
    * cleanup. */
  private def runConcurrently(tasks: Seq[() => Unit]): Unit =
    if (tasks.sizeIs <= 1) tasks.foreach(_.apply())
    else {
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val threads = tasks.map { t =>
        val th = new Thread(() => {
          try t() catch {
            case e: Throwable => failure.compareAndSet(null, e)
          }
        })
        th.setDaemon(true)
        th.start()
        th
      }
      threads.foreach(_.join())
      Option(failure.get()).foreach(e => throw e)
    }

  private def idBucketCol(buckets: Int): Column =
    (crc32(encode(col("id").cast("string"), "UTF-8")) % buckets).cast("int")

  /** Cluster rows by their bucket BEFORE a bucket-partitioned write —
    * without this every task writes a file into every bucket directory
    * (tasks × buckets tiny files per build/sync), the [[Index.build]]
    * lesson. One shuffle sized to the bucket count; each bucket becomes
    * one task's output. */
  private def bucketClustered(df: DataFrame, bucketCol: String,
      buckets: Int): DataFrame = {
    val parts = math.max(1, math.min(buckets,
      spark.sparkContext.defaultParallelism * 2))
    df.repartition(parts, col(bucketCol))
  }

  private def writeFuzzyBase(base: String, bf: DataFrame, buckets: Int,
      mode: String): Unit =
    bucketClustered(bf.withColumn("__ID_BUCKET__", idBucketCol(buckets)),
        "__ID_BUCKET__", buckets)
      .write.mode(mode).partitionBy("__ID_BUCKET__")
      .parquet(s"$base/base")

  /** Segment/probe/count frames of one base delta, written under the
    * artifact — shared by build (overwrite) and sync (append). Returns
    * this DELTA's (max per-key segment count, max per-key probe count),
    * observed for FREE on the counts writes ([[Observation]] — no
    * extra pass): the serving join's volume guard multiplies the
    * accumulated bounds against the query batch's key counts and skips
    * its artifact pass entirely when the product is safely small. */
  private def writeFuzzyFrames(base: String, bf: DataFrame, maxDist: Int,
      buckets: Int, mode: String): (Long, Long) = {
    val bucketCol =
      (crc32(encode(col("g"), "UTF-8")) % buckets).cast("int")
    val segs = graft.ext.Dedup.editDistanceSegments(bf, maxDist)
    val probes = graft.ext.Dedup.editDistanceProbes(bf, maxDist)
    // per-key counts: sync appends PARTIAL count rows (one set per
    // delta); readers re-aggregate — Σ over partials is exact, and the
    // counts frame stays orders of magnitude smaller than the frames
    val segObs = new org.apache.spark.sql.Observation()
    val probeObs = new org.apache.spark.sql.Observation()
    // the four writes land in four separate directories and share no
    // ordering constraint — overlapped (guide §2.6), they back-fill
    // each other's task tails instead of running one small job at a
    // time (the r20 fixture profile: the lifecycle queries were
    // job-count-bound, not data-bound)
    runConcurrently(Seq(
      () => bucketClustered(segs.withColumn("__SEG_BUCKET__", bucketCol),
          "__SEG_BUCKET__", buckets)
        .write.mode(mode).partitionBy("__SEG_BUCKET__")
        .parquet(s"$base/segs"),
      () => bucketClustered(probes.withColumn("__SEG_BUCKET__", bucketCol),
          "__SEG_BUCKET__", buckets)
        .write.mode(mode).partitionBy("__SEG_BUCKET__")
        .parquet(s"$base/probes"),
      () => graft.ext.Dedup.editDistanceKeyCounts(segs, "ns")
        .observe(segObs, max(col("ns")).as("mx"))
        .write.mode(mode).parquet(s"$base/segcounts"),
      () => graft.ext.Dedup.editDistanceKeyCounts(probes, "np")
        .observe(probeObs, max(col("np")).as("mx"))
        .write.mode(mode).parquet(s"$base/probecounts")))
    def mx(o: org.apache.spark.sql.Observation): Long =
      Option(o.get("mx")).map(_.asInstanceOf[Double].toLong).getOrElse(0L)
    (mx(segObs), mx(probeObs))
  }

  private def fuzzyMeta(base: String): (Int, Int, String) = {
    val s = new String(store.readSidecar(s"$base/meta.json"), "UTF-8")
    def intOf(k: String) = (k + """\s*:\s*(\d+)""").r
      .findFirstMatchIn(s).map(_.group(1).toInt)
    def intOrFail(k: String) = intOf(k)
      .getOrElse(throw new IllegalStateException(
        s"fuzzy index at $base has no $k in meta.json"))
    val idCol = """"idCol"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(s)
      .map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        s"fuzzy index at $base predates the lifecycle metadata " +
          "(no idCol in meta.json) — rebuild with buildFuzzyIndex"))
    // layout 2 (id-bucketed base) is the only layout ever written by a
    // build that also records idCol, so anything else here is a
    // hand-rolled artifact — refuse rather than serve an unknown shape.
    // MIGRATION: layout-1 artifacts (pre-bucketed base, written before
    // the idCol field existed) are intentionally no longer served —
    // every lookup/sync/compact on one throws this error until a
    // one-time `buildFuzzyIndex(source, textCol)` rebuild, which
    // regenerates the artifact in place from the (unchanged) source
    // table. The rebuild is idempotent and crash-safe (Swap-guarded),
    // so the migration is a single engine call per artifact.
    require(intOf("\"layout\"").contains(2),
      s"fuzzy index at $base has an unsupported layout in meta.json — " +
        "only layout 2 (id-bucketed base) is served. One-time migration: " +
        "rebuild with buildFuzzyIndex(source, textCol) against the same " +
        "source table")
    (intOrFail("\"maxDist\""), intOrFail("\"buckets\""), idCol)
  }

  private def fuzzyMetaJson(maxDist: Int, buckets: Int, idCol: String,
      maxNsBound: Long, maxNpBound: Long): Array[Byte] =
    (s"""{"maxDist":$maxDist,"buckets":$buckets,"idCol":"$idCol",""" +
      s""""layout":2,"maxNsBound":$maxNsBound,"maxNpBound":$maxNpBound}""")
      .getBytes("UTF-8")

  /** The artifact's accumulated per-key frequency upper bounds, or None
    * for an artifact built before they existed (the serving guard then
    * keeps its exact counting pass). */
  private def fuzzyMetaBounds(base: String): Option[(Long, Long)] = {
    val s = new String(store.readSidecar(s"$base/meta.json"), "UTF-8")
    def longOf(k: String) = (k + """\s*:\s*(\d+)""").r
      .findFirstMatchIn(s).map(_.group(1).toLong)
    for (ns <- longOf("\"maxNsBound\""); np <- longOf("\"maxNpBound\""))
      yield (ns, np)
  }

  /** Whether the fuzzy artifact exists AND was built/synced from the
    * CURRENT source content (file-listing stamp comparison, the
    * [[Index.tierFresh]] contract) — false after any in-place source
    * rewrite until a rebuild, and false for artifacts predating the
    * stamp sidecar (rebuild to adopt). */
  def fuzzyIndexIsFresh(source: String, textCol: String): Boolean = {
    val base = store.fuzzyIndexPath(source, textCol)
    store.sidecarExists(s"$base/meta.json") &&
      Index.recordedStamp(store, base).contains(store.sourceStamp(source))
  }

  /** Append newly ingested documents to the fuzzy index: docs whose id
    * is absent from the base frame get their base/segment/probe rows
    * and partial key counts appended — the append-only-corpus
    * incremental path (PassJoin frames are row-local, so the appended
    * artifact equals a fresh rebuild row-for-row; document UPDATES need
    * a rebuild, as with every tier). Re-stamps freshness only when
    * growth is verifiably append-only (every file recorded at the last
    * build/sync still present unchanged). Returns rows appended. */
  def syncFuzzyIndex(source: String, textCol: String): Long = {
    val base = store.fuzzyIndexPath(source, textCol)
    graft.store.Swap.withArtifactLock(base) {
      val (maxDist, buckets, idCol) = fuzzyMeta(base)
      // restore any crashed-compaction aside BEFORE appending — an append
      // recreating a bucket dir whose only full copy sits in an aside
      // would turn the next cleanup into silent data loss (see
      // [[graft.store.Swap]])
      recoverFuzzyArtifacts(base)
      val listing = store.sourceListing(source)
      val known = spark.read.parquet(s"$base/base")
        .select(col("id").as("__known_id__"))
      val fresh = store.loadTable(source)
        .filter(col(textCol).isNotNull)
        .join(known, col(idCol) === col("__known_id__"), "left_anti")
      val bf = graft.ext.Dedup.editDistanceBase(fresh, idCol, textCol)
        .localCheckpoint(true) // freeze: the appends below grow the very
                               // paths a lazy plan would re-list
      try {
        val n = bf.count()
        if (n > 0) {
          // accumulate the frequency bounds: a key split across deltas
          // totals at most the sum of the per-delta maxima. Written
          // BEFORE the frame appends — a crash between the two leaves
          // the bound LOOSE (counting a delta whose frames never
          // landed), never UNDER; an under-bound would let
          // provenVolumeBound "prove" safe a candidate volume that is
          // not, silently disabling the serving join's volume guard.
          // The delta maxima cost one extra agg pass over the
          // (checkpointed) delta; [[compactFuzzyIndex]] re-tightens to
          // the true maxima. An artifact predating the bounds stays
          // unbounded (the serving guard keeps its exact count pass) —
          // a rebuild or a compaction establishes a true bound.
          fuzzyMetaBounds(base).foreach { case (ns, np) =>
            val (dNs, dNp) = deltaKeyMaxima(bf, maxDist)
            store.writeSidecar(s"$base/meta.json",
              fuzzyMetaJson(maxDist, buckets, idCol, ns + dNs, np + dNp))
          }
          writeFuzzyBase(base, bf, buckets, mode = "append")
          writeFuzzyFrames(base, bf, maxDist, buckets, mode = "append")
        }
        // re-stamp OUTSIDE the n > 0 branch: append-only growth whose
        // new rows are all null-text (filtered by design) appends
        // nothing yet leaves the artifact semantically complete — a
        // stamp gated on n > 0 would hold it permanently "stale" with
        // only a full rebuild as the way out. The append-only check
        // (every file recorded at the last build/sync still present
        // unchanged) still gates the stamp either way.
        val curSet = listing.toSet
        if (Index.recordedListing(store, base).exists(_.forall(curSet.contains)))
          Index.recordSourceStamp(store, base, listing)
        n
      } finally org.apache.spark.sql.GraftShims.releaseCheckpoint(bf)
    }
  }

  /** One delta's (max per-key segment count, max per-key probe count),
    * measured EAGERLY — [[syncFuzzyIndex]] needs the accumulated bound
    * on disk before any frame append (the crash-safe write order). */
  private def deltaKeyMaxima(bf: DataFrame, maxDist: Int): (Long, Long) = {
    def mx(frame: DataFrame, alias: String): Long = {
      val r = graft.ext.Dedup.editDistanceKeyCounts(frame, alias)
        .agg(max(col(alias))).head()
      if (r.isNullAt(0)) 0L else r.getDouble(0).toLong
    }
    // two independent bounded aggs over the same checkpointed delta —
    // overlapped (guide §2.6)
    @volatile var ns = 0L
    @volatile var np = 0L
    runConcurrently(Seq(
      () => ns = mx(graft.ext.Dedup.editDistanceSegments(bf, maxDist), "ns"),
      () => np = mx(graft.ext.Dedup.editDistanceProbes(bf, maxDist), "np")))
    (ns, np)
  }

  /** Crash recovery for the fuzzy index's swap artifacts — both bucket
    * dirs plus the three flat tables; MUST run before every mutation
    * and runs from the read paths too (same rationale as
    * [[recoverLexArtifacts]]: an aside is invisible to parquet listing,
    * so lookups would silently miss the crashed bucket's segments). */
  private def recoverFuzzyArtifacts(base: String): Unit = {
    val fs = store.fs
    val bucketed = Seq(s"$base/segs" -> "__SEG_BUCKET__",
      s"$base/probes" -> "__SEG_BUCKET__", s"$base/base" -> "__ID_BUCKET__")
      .map { case (d, c) => new org.apache.hadoop.fs.Path(d) -> c }
    val flats = Seq("segcounts", "probecounts")
      .map(d => new org.apache.hadoop.fs.Path(s"$base/$d"))
    // lock only when a listing actually shows an aside — the clean read
    // path stays lock-free, and a visible aside may belong to a RUNNING
    // compaction, whose window the lock serializes against (see
    // [[recoverLexArtifacts]]); the sweep re-checks inside the lock
    if (bucketed.exists { case (d, c) =>
          graft.store.Swap.hasBucketAsides(fs, d, c) } ||
        flats.exists(graft.store.Swap.hasFlatAside(fs, _)))
      graft.store.Swap.withArtifactLock(base) {
        bucketed.foreach { case (d, c) =>
          graft.store.Swap.recoverBucketAsides(fs, d, c) }
        flats.foreach(graft.store.Swap.recoverFlatAside(fs, _))
      }
  }

  /** Coalesce sync-fragmented segment buckets (crash-safe per-bucket
    * rename-aside swaps, [[graft.store.Swap]]) and flat tables.
    * Returns (buckets compacted across segs+probes, flat tables
    * compacted). Content identical; the partial count rows are merely
    * coalesced, not merged — readers re-aggregate either way. */
  def compactFuzzyIndex(source: String, textCol: String,
      maxFilesPerBucket: Int = 8): (Long, Long) = {
    require(maxFilesPerBucket >= 1, "maxFilesPerBucket must be >= 1")
    val base = store.fuzzyIndexPath(source, textCol)
    // whole compact under the artifact lock — see [[compactLexicalIndex]]
    graft.store.Swap.withArtifactLock(base) {
      val (maxDist, buckets, idCol) = fuzzyMeta(base) // fails loudly on a missing index
      recoverFuzzyArtifacts(base)
      val fs = store.fs
      val bucketsDone =
        graft.store.Swap.compactBuckets(spark, fs, s"$base/segs",
          "__SEG_BUCKET__", maxFilesPerBucket, "compactFuzzyIndex") +
        graft.store.Swap.compactBuckets(spark, fs, s"$base/probes",
          "__SEG_BUCKET__", maxFilesPerBucket, "compactFuzzyIndex") +
        graft.store.Swap.compactBuckets(spark, fs, s"$base/base",
          "__ID_BUCKET__", maxFilesPerBucket, "compactFuzzyIndex")
      val flatsDone = Seq("segcounts", "probecounts").map(d =>
        if (graft.store.Swap.compactFlat(spark, fs, s"$base/$d",
          maxFilesPerBucket, "compactFuzzyIndex") > 0) 1L else 0L).sum
      // Re-tighten the frequency bounds to the TRUE per-key maxima:
      // sync's crash-safe accumulation (Σ of per-delta maxima) only
      // ever loosens, and a loose bound degrades the serving join's
      // driver-side volume guard back to its exact counting pass. The
      // counts frames hold exact per-key totals and are orders of
      // magnitude smaller than the key frames — one agg each, meta
      // rewritten under the same artifact lock. Also ESTABLISHES
      // bounds on artifacts that predate them.
      def trueMax(dir: String, alias: String): Long = {
        val r = spark.read.parquet(s"$base/$dir")
          .groupBy("l", "i", "g").agg(sum(col(alias)).as("__t__"))
          .agg(max(col("__t__"))).head()
        if (r.isNullAt(0)) 0L else r.getDouble(0).toLong
      }
      store.writeSidecar(s"$base/meta.json", fuzzyMetaJson(maxDist,
        buckets, idCol, trueMax("segcounts", "ns"),
        trueMax("probecounts", "np")))
      (bucketsDone, flatsDone)
    }
  }

  private def requireFuzzyFresh(source: String, textCol: String,
      allowStale: Boolean): Unit =
    require(allowStale || fuzzyIndexIsFresh(source, textCol),
      s"fuzzy index for $source.$textCol is STALE: the source content " +
        "changed since the last build/sync (or the artifact predates " +
        "freshness stamps). Run syncFuzzyIndex after append-only growth, " +
        "rebuild after in-place rewrites, or pass allowStale = true to " +
        "serve from the stale artifact deliberately.")

  /** All documents within edit distance `maxDist` (the BUILD-time k) of
    * `query`, with the distance, through the persisted fuzzy index:
    * pairs where the document is the shorter side come from the
    * document-SEGMENT scan matched by the query's probe keys; longer
    * documents from the document-PROBE scan matched by the query's
    * segment keys — both scans pruned to the keys' bucket partitions.
    * One bounded union-distinct, then a thresholded levenshtein against
    * the base texts — the base scan is ALSO pruned (layout 2 partitions
    * it by an id bucket; the collected candidate ids select their
    * buckets at the file listing), so the whole lookup touches a
    * constant number of files regardless of corpus size; without it the
    * final verify would scan every stored document's text. Candidates
    * beyond `maxLookupCandidates` refuse loudly (a driver collect must
    * stay bounded). Ties order by (dist, id). Refuses a stale artifact
    * (loud-or-fresh, never silently stale) unless `allowStale`. */
  def fuzzyLookup(source: String, textCol: String, query: String,
      allowStale: Boolean = false,
      maxLookupCandidates: Int = 10000): DataFrame = {
    require(query != null && query.nonEmpty, "fuzzyLookup: empty query")
    require(maxLookupCandidates >= 1, "maxLookupCandidates must be >= 1")
    val base = store.fuzzyIndexPath(source, textCol)
    val (maxDist, buckets, _) = fuzzyMeta(base)
    recoverFuzzyArtifacts(base)
    requireFuzzyFresh(source, textCol, allowStale)
    val cand = fuzzyLookupCandidates(base, query, maxDist, buckets)
    // candidate ids to the driver (bounded, refused past the cap),
    // their id buckets computed IN the collecting job — never by a
    // driver-side re-hash that could disagree on exotic id types
    val rows = cand.withColumn("__b__", idBucketCol(buckets))
      .limit(maxLookupCandidates + 1).collect()
    require(rows.length <= maxLookupCandidates,
      s"fuzzyLookup: more than $maxLookupCandidates candidate ids for " +
        "this query — segment buckets collide heavily; raise " +
        "maxLookupCandidates deliberately or use fuzzyJoin for bulk " +
        "matching")
    // the verify scan reads ONLY the candidates' id buckets — explicit
    // leaf paths, like the candidate scans ([[readBuckets]]): the base
    // table's full 512-dir discovery was one of the three ~0.9s terms
    // in the 10M single-lookup constant
    val verified =
      if (rows.isEmpty) spark.read.parquet(s"$base/base").filter(lit(false))
      else readBuckets(s"$base/base", "__ID_BUCKET__",
          rows.map(_.getInt(1)).toSeq, buckets)
        .filter(col("id").isin(rows.map(_.get(0)): _*))
    verified
      .select(col("id"),
        levenshtein(col("t"), lit(query), maxDist).cast("long").as("dist"))
      .filter(col("dist") >= 0L && col("dist") <= maxDist.toLong)
      .orderBy(col("dist"), col("id"))
  }

  /** Read ONLY the given bucket partitions of a bucket-partitioned
    * artifact table: explicit `<dir>/<partCol>=<b>` leaf paths (with
    * `basePath` retaining the partition column) make partition
    * DISCOVERY itself proportional to the hit set — `read.parquet(dir)`
    * lists every bucket directory up front no matter what the plan
    * later prunes, and at the 10M/512-bucket tier that discovery was
    * ~0.9s per table × 3 tables ≈ 85% of the measured single-lookup
    * constant ([[graft.FuzzyLookupProbe]]). Buckets no key ever hashed
    * into have no directory — one cheap exists() each skips them; all
    * absent degrades to a full read filtered to nothing (rare, and the
    * schema must still come from somewhere). */
  private def readBuckets(dir: String, partCol: String,
      bks: Seq[Int], totalBuckets: Int): DataFrame = {
    val distinct = bks.distinct
    // Past half the layout, per-bucket exists() probes plus a
    // many-root listing cost as much as one full discovery — and on an
    // object store every exists() is its own RPC. Fall back to full
    // discovery + the INSET partition filter (still file-listing
    // pruning, just not discovery pruning).
    if (distinct.size * 2 >= totalBuckets)
      spark.read.parquet(dir)
        .filter(col(partCol).isin(distinct: _*))
    else {
      val fs = store.fs
      val paths = distinct
        .map(b => s"$dir/$partCol=$b")
        .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
      if (paths.isEmpty) spark.read.parquet(dir).filter(lit(false))
      else spark.read.option("basePath", dir).parquet(paths: _*)
    }
  }

  /** The candidate-id frame of one lookup: the query's probe keys
    * against the segment scan ∪ its segment keys against the probe
    * scan, both read through EXPLICIT hit-bucket leaf paths
    * ([[readBuckets]] — pruning at the listing, not a partition filter
    * over a full discovery). Package-visible so the pruning is
    * plan-assertable ([[fuzzyLookup]] consumes it eagerly, so its scans
    * never appear in the returned frame's plan). */
  private[graft] def fuzzyLookupCandidates(base: String, query: String,
      maxDist: Int, buckets: Int): DataFrame = {
    def hits(path: String, keys: Seq[(Int, Int, String)]): DataFrame = {
      val bks = keys.map(t => graft.ext.Lexical.termBucket(t._3, buckets))
        .distinct
      // key match as a disjunction over the (l, i, g) TUPLES — never a
      // separator-joined string, which a text containing the separator
      // could alias (two distinct keys comparing equal)
      val keyPred = keys.map(t =>
        col("l") === t._1 && col("i") === t._2 && col("g") === t._3)
        .reduce(_ || _)
      readBuckets(path, "__SEG_BUCKET__", bks, buckets)
        .filter(keyPred)
        .select("id")
    }
    hits(s"$base/segs", graft.ext.Dedup.queryProbeKeys(query, maxDist))
      .union(hits(s"$base/probes", graft.ext.Dedup.querySegKeys(query, maxDist)))
      .distinct()
  }

  /** The persisted artifact's PassJoin frames, shaped for
    * [[graft.ext.Dedup.editDistanceJoinAgainstFrames]] (id renamed to
    * id_b, partition column dropped, partial counts re-aggregated).
    * `segBuckets`/`probeBuckets` prune the segs/probes scans to those
    * `__SEG_BUCKET__` partitions at the file listing (None = full
    * scan); the count frames are never pruned — the guard needs the
    * corpus-side key statistics whole, and they are orders of
    * magnitude smaller. */
  private def fuzzyFrames(base: String, buckets: Int,
      segBuckets: Option[Seq[Int]] = None,
      probeBuckets: Option[Seq[Int]] = None): (DataFrame, DataFrame,
      DataFrame, DataFrame, DataFrame) = {
    val rb = spark.read.parquet(s"$base/base").select("id", "t", "len")
    // hit-bucket pruning through EXPLICIT leaf paths ([[readBuckets]]):
    // the pruned scan's partition discovery lists only the hit buckets
    // instead of the full layout (None = genuinely every bucket → plain
    // full read, no filter needed)
    def pruned(path: String, bks: Option[Seq[Int]]): DataFrame =
      bks.fold(spark.read.parquet(path))(b =>
        readBuckets(path, "__SEG_BUCKET__", b, buckets))
    val rSegs = pruned(s"$base/segs", segBuckets)
      .select(col("l"), col("i"), col("g"), col("id").as("id_b"))
    val rProbes = pruned(s"$base/probes", probeBuckets)
      .select(col("l"), col("i"), col("g"), col("id").as("id_b"))
    val segCounts = spark.read.parquet(s"$base/segcounts")
      .groupBy("l", "i", "g").agg(sum("ns").as("ns"))
    val probeCounts = spark.read.parquet(s"$base/probecounts")
      .groupBy("l", "i", "g").agg(sum("np").as("np"))
    (rb, rSegs, rProbes, segCounts, probeCounts)
  }

  /** One key frame's serving-side statistics: its hit-bucket set (the
    * batch join's artifact pruning — a right-side row whose `g` hashes
    * outside every left key's bucket can never find a join partner,
    * because key equality implies bucket equality under the writer's
    * CRC32 formula; None when the batch covers every bucket, where an
    * isin filter would prune nothing) and its ROW count (the broadcast
    * decision and the driver-side volume-guard bound). ONE bounded
    * driver job per frame: collect_set over ≤ `buckets` ints + a
    * count. */
  private case class FuzzySideStats(hitBuckets: Option[Seq[Int]],
    rows: Long)

  private def fuzzySideStats(keys: DataFrame,
      buckets: Int): FuzzySideStats = {
    val bCol = (crc32(encode(col("g"), "UTF-8")) % buckets).cast("int")
    val r = keys.agg(collect_set(bCol).as("bks"),
      count(lit(1)).as("n")).head()
    val bks = r.getSeq[Int](0)
    FuzzySideStats(
      if (bks.size >= buckets) None else Some(bks),
      r.getLong(1))
  }

  /** Broadcast the left key frames when their total stays under ~2M
    * rows (the serving-batch shape; a 10M-row dedup side must keep the
    * shuffle plan). */
  private val FuzzyBroadcastKeyCap = 2000000L

  /** BATCH edit-distance join against the persisted fuzzy index: every
    * (left row, stored doc) pair within the build-time `maxDist`, as
    * (id_a = left id, id_b = stored id, dist) — identical output to
    * [[graft.ext.Dedup.editDistanceJoin]] against the live table, but
    * the corpus side's segment/probe frames AND the guard's corpus-side
    * key counts come from the artifact, so per-call derivation cost
    * scales with the LEFT side only. The serving path for entity
    * resolution / fuzzy-key joins over an indexed corpus. */
  def fuzzyJoin(source: String, textCol: String, left: DataFrame,
      leftId: String, leftText: String,
      maxCandidates: Long = 50000000L,
      allowStale: Boolean = false): DataFrame = {
    val base = store.fuzzyIndexPath(source, textCol)
    val (maxDist, buckets, _) = fuzzyMeta(base)
    recoverFuzzyArtifacts(base)
    requireFuzzyFresh(source, textCol, allowStale)
    // batch-shape serving plan (round 18): the single lookup always
    // pruned to its query's __SEG_BUCKET__ partitions, but the batch
    // join read the FULL artifact frames — per-batch cost scaled with
    // the corpus even for a handful of queries. Two bounded driver
    // jobs over the left side yield the hit buckets (artifact scans
    // pruned at the file listing), the key counts (broadcast
    // decision), and — with the artifact's persisted frequency
    // bounds — a PROVEN volume bound that lets the guard skip its
    // artifact pass entirely (the join then reads the artifact ONCE).
    val lb = graft.ext.Dedup.editDistanceBase(left, leftId, leftText)
    val lSegStats = fuzzySideStats(
      graft.ext.Dedup.editDistanceSegments(lb, maxDist), buckets)
    val lProbeStats = fuzzySideStats(
      graft.ext.Dedup.editDistanceProbes(lb, maxDist), buckets)
    val (rb, rSegs, rProbes, segCounts, probeCounts) =
      fuzzyFrames(base, buckets, lProbeStats.hitBuckets, lSegStats.hitBuckets)
    // Σ ns(k)·npLeft(k) + Σ np(k)·nsLeft(k) ≤ maxNs·|left probes| +
    // maxNp·|left segs| — every factor known on the driver
    val bound = fuzzyMetaBounds(base).map { case (maxNs, maxNp) =>
      maxNs.toDouble * lProbeStats.rows + maxNp.toDouble * lSegStats.rows
    }
    graft.ext.Dedup.editDistanceJoinAgainstFrames(left, leftId, leftText,
      rb, rSegs, rProbes, maxDist, maxCandidates,
      Some(segCounts), Some(probeCounts),
      broadcastLeft =
        lSegStats.rows + lProbeStats.rows <= FuzzyBroadcastKeyCap,
      provenVolumeBound = bound)
  }

  /** Fuzzy ingest gate served FROM the persisted artifact — the
    * [[graft.streaming.Streams.editDistGateForEachBatch]] contract
    * ((streamIdCol, ref_id, dist) flags per micro-batch; an arrival
    * absent from the output is novel) without re-deriving the corpus
    * frames at gate construction or pinning them in executor storage:
    * the frames are parquet-backed, so a [[syncFuzzyIndex]] while the
    * stream runs extends the gate's corpus on the next micro-batch. */
  def fuzzyGateForEachBatch(source: String, textCol: String,
      streamIdCol: String, streamTextCol: String,
      maxCandidates: Long = 50000000L,
      sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    require(!Set("ref_id", "dist", "id_b").contains(streamIdCol),
      s"fuzzyGateForEachBatch: stream idCol '$streamIdCol' collides with " +
        "the fixed output columns (ref_id, dist) or the join's internal " +
        "id_b; rename it apart first")
    val base = store.fuzzyIndexPath(source, textCol)
    val (maxDist, buckets, _) = fuzzyMeta(base)
    recoverFuzzyArtifacts(base)
    requireFuzzyFresh(source, textCol, allowStale = false)
    (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) {
        // freshness re-checked PER MICRO-BATCH (one file listing), not
        // just at gate construction: the frames are re-read from parquet
        // each batch, so an in-place source rewrite mid-stream would
        // otherwise serve from a silently stale artifact until restart —
        // this tier's contract is loud-or-fresh. (A syncFuzzyIndex while
        // the stream runs re-stamps, so append-only growth passes.)
        recoverFuzzyArtifacts(base)
        requireFuzzyFresh(source, textCol, allowStale = false)
        // a micro-batch hits a handful of buckets — prune the artifact
        // scans to them (the batch-join discipline; per-arrival cost
        // must scale with the BATCH, not the corpus); the persisted
        // frequency bounds let the guard skip its artifact pass
        val lb = graft.ext.Dedup.editDistanceBase(batch, streamIdCol,
          streamTextCol)
        val lSegStats = fuzzySideStats(
          graft.ext.Dedup.editDistanceSegments(lb, maxDist), buckets)
        val lProbeStats = fuzzySideStats(
          graft.ext.Dedup.editDistanceProbes(lb, maxDist), buckets)
        val (rb, rSegs, rProbes, segCounts, probeCounts) =
          fuzzyFrames(base, buckets, lProbeStats.hitBuckets, lSegStats.hitBuckets)
        val bound = fuzzyMetaBounds(base).map { case (maxNs, maxNp) =>
          maxNs.toDouble * lProbeStats.rows +
            maxNp.toDouble * lSegStats.rows
        }
        sink(graft.ext.Dedup.editDistanceJoinAgainstFrames(batch,
            streamIdCol, streamTextCol, rb, rSegs, rProbes, maxDist,
            maxCandidates, Some(segCounts), Some(probeCounts),
            broadcastLeft =
              lSegStats.rows + lProbeStats.rows <= FuzzyBroadcastKeyCap,
            provenVolumeBound = bound)
          .withColumnRenamed("id_a", streamIdCol)
          .withColumnRenamed("id_b", "ref_id"))
      }
  }

  // ——— index maintenance / ops views ———

  /** Per-cell (cell, files, bytes, rows) layout stats of an IVF index
    * ([[Index.cellStats]]) — the skew/fragmentation ops view. */
  def indexStats(codingName: String, source: String, column: String,
      withRows: Boolean = false, tier: String = "ivf"): Seq[(Long, Int, Long, Long)] =
    Index.cellStats(store, codingName, source, column, withRows, tier)

  /** Content profile of an IVF index's cells — the clustered-corpus
    * organization view ([[indexStats]] covers storage skew; this covers
    * CONTENT skew): per cell (cell, n, mean_dist rounded to 6 decimals,
    * max_dist), distances measured from each row to its cell's ANCHOR
    * ([[graft.coder.Coding.anchor]] — the mean of the cell's digit
    * centroids) under the coding's metric. Crowded far-spread cells are
    * candidates for re-training or curriculum splits; tight cells are
    * coherent domains. The anchors ride a broadcast numCells-row frame
    * joined on the cell id — distance lands in the join projection
    * (codegen'd vector_distance), the index scan stays
    * partition-aligned, and the only shuffle is the per-cell scalar
    * aggregate. The same profile over explicit exemplar rows (no coder
    * needed) is [[graft.ext.Corpus.clusterProfile]]. */
  def cellProfile(codingName: String, source: String,
      column: String): DataFrame = {
    val codingObj = store.loadCoding(codingName)
    val cells = codingObj.numCells.toInt
    import spark.implicits._
    val anchors = (0 until cells)
      .map(c => (c.toLong, codingObj.anchor(c.toLong).toSeq))
      .toDF("cell", "__anchor__")
    Index.load(store, codingName, source, column)
      .join(broadcast(anchors), col(Search.CodeCol) === col("cell"))
      .withColumn("__d__", graft.functions.functions.vector_distance(
        col(column), col("__anchor__"), codingObj.config.metric))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("__d__")), 6).as("mean_dist"),
        max(col("__d__")).as("max_dist"))
  }

  /** Cell-scoped index repair after in-place source modifications or
    * deletions ([[Index.repair]] for the ivf copy, [[Index.repairTier]]
    * for the quantized tiers) — re-encodes only rows from changed files
    * and rewrites only affected cells. */
  def repairIndex(codingName: String, source: String, column: String,
      tier: String = "ivf"): Index.RepairStats =
    if (tier == "ivf") Index.repair(store, codingName, source, column)
    else Index.repairTier(store, codingName, source, column, tier)

  /** Whether a tier's copy was built/synced from the CURRENT source
    * content ([[Index.tierFresh]]) — false after any in-place rewrite
    * until [[repairIndex]] or a rebuild. */
  def indexIsFresh(codingName: String, source: String, column: String,
      tier: String = "ivf"): Boolean =
    Index.tierFresh(store, codingName, source, column, tier)

  /** Coalesce fragmented index cell partitions ([[Index.compactCells]]) —
    * run periodically under a streaming sync workload. `tier` selects the
    * copy (ivf | pq | sq | bq). */
  def compactIndex(codingName: String, source: String, column: String,
      maxFilesPerCell: Int = 8, tier: String = "ivf"): Index.CompactStats =
    Index.compactCells(store, codingName, source, column, maxFilesPerCell,
      tier = tier)

  /** Train + persist a PCA (optionally whitening) model on a stored
    * table's vector column ([[graft.ext.Embeddings.pcaTrain]]). */
  def trainPca(name: String, source: String, column: String, k: Int,
      whiten: Boolean = false): graft.ext.Embeddings.PcaModel = {
    val model = graft.ext.Embeddings.pcaTrain(store.loadTable(source), column,
      k, whiten)
    store.savePcaModel(name, model)
    model
  }

  /** Project a stored table's vector column under a persisted PCA model —
    * one narrow codegen'd map ([[graft.functions.PcaProject]]). */
  def projectPca(source: String, column: String, modelName: String,
      out: String = "projection"): DataFrame =
    graft.ext.Embeddings.project(store.loadTable(source), column,
      store.loadPcaModel(modelName), out)

  // ——— BPE tokenizer (pipeline extension: trained-merges token accounting) ———

  /** Train and persist a BPE model from a stored table's text column
    * ([[graft.ext.Bpe.train]] — one distributed word-frequency agg,
    * driver-bounded merge learning, deterministic). */
  def trainBpe(name: String, source: String, textCol: String,
      numMerges: Int, maxWords: Int = 65536): graft.ext.Bpe.BpeModel = {
    val model = graft.ext.Bpe.train(store.loadTable(source), textCol,
      numMerges, maxWords)
    store.saveBpeModel(name, model)
    model
  }

  /** Token counts of a stored table under a persisted BPE model — a
    * narrow map (merge ranks broadcast in the closure). */
  def bpeTokenCounts(source: String, idCol: String, textCol: String,
      model: String): DataFrame = {
    val m = store.loadBpeModel(model)
    store.loadTable(source).select(col(idCol),
      graft.ext.Bpe.tokenCountUdf(m)(col(textCol)).cast("long").as("n_tok"))
  }

  def listBpeModels(): Seq[String] = store.listBpeModels()

  /** Train and persist a bigram stupid-backoff LM over a stored table —
    * the CCNet-style perplexity-filter model ([[graft.ext.NgramLm]]). */
  def trainNgramLm(name: String, source: String, textCol: String,
      vocabSize: Int = 4096, minCount: Long = 1L,
      alpha: Double = 0.4, order: Int = 2): graft.ext.NgramLm.NgramLmModel = {
    store.ngramModelPath(name) // validate the name BEFORE the training job
    val model = graft.ext.NgramLm.train(store.loadTable(source), textCol,
      vocabSize, minCount, alpha, order = order)
    store.saveNgramModel(name, model)
    model
  }

  /** Per-document perplexity of a stored table under a persisted LM —
    * one narrow map with the model broadcast. */
  def perplexity(source: String, idCol: String, textCol: String,
      model: String): DataFrame =
    graft.ext.NgramLm.perplexity(store.loadTable(source), idCol, textCol,
      store.loadNgramModel(model))

  def listNgramModels(): Seq[String] = store.listNgramModels()

  /** Train + persist the logistic quality classifier over a stored table
    * ([[graft.ext.QualityModel]]). `labelCol` = explicit 0/1 labels;
    * None = weak labels from the Gopher rule conjunction (rule
    * distillation). */
  def trainQualityModel(name: String, source: String, textCol: String,
      labelCol: Option[String] = None): graft.ext.QualityModel.Logistic = {
    store.qualityModelPath(name) // validate the name BEFORE the training job
    val labeled = graft.ext.QualityModel.labeledFrame(
      store.loadTable(source), textCol, labelCol)
    val model = graft.ext.QualityModel.train(labeled, textCol, "__label__")
    store.saveQualityModel(name, model)
    model
  }

  /** Quality probability per document of a stored table under a
    * persisted model — one narrow codegen map. */
  def qualityScores(source: String, idCol: String, textCol: String,
      model: String): DataFrame =
    graft.ext.QualityModel.score(store.loadTable(source), idCol, textCol,
      store.loadQualityModel(model))

  def listQualityModels(): Seq[String] = store.listQualityModels()

  /** Per-group audit profile of a stored table
    * ([[graft.ext.TextAnalysis.corpusProfile]]) — run it before/after
    * curation steps; every metric is an exact integer. */
  def profileTable(source: String, textCol: String, groupCols: Seq[String],
      minWords: Int = 50, maxWords: Int = 100000): DataFrame =
    graft.ext.TextAnalysis.corpusProfile(store.loadTable(source), textCol,
      groupCols, minWords, maxWords)

  /** Semantic dedup of a stored table at scale ([[graft.ext.Dedup
    * .semanticDedup]] with buckets = the IVF cells of a trained coding —
    * the SemDeDup paper's exact setting: k-means-cluster the embeddings,
    * pairwise-compare only within clusters). One cell-assignment map over
    * the corpus, then a per-cell-bounded pair join; never an all-pairs
    * stage. Survivor rule: a row is dropped when its cell holds a
    * smaller-`idCol` row within cosine `maxDist`. */
  def semanticDedup(source: String, column: String, coding: String,
      maxDist: Double, idCol: String,
      maxBucketRows: Long = 8192L): DataFrame = {
    // prefer the MATERIALIZED cell column of the built index — the
    // assignment is then a stored-column read instead of a
    // distance-to-every-centroid recomputation on each scan of the
    // dedup's join stages. The index is a SNAPSHOT: if the source has
    // grown/changed since the build it would silently dedup stale data,
    // so only take this branch when the content stamp recorded at
    // build/sync time still matches the source ([[Index.indexFresh]] —
    // a file-listing hash, so even a same-row-count rewrite is caught).
    // Fall back to computing the assignment inline otherwise.
    val fresh = Index.indexFresh(store, coding, source, column)
    if (fresh)
      graft.ext.Dedup.semanticDedup(
        Index.load(store, coding, source, column), idCol, column,
        maxDist, bucket = col(Index.CodeCol), maxBucketRows)
        .drop(Index.CodeCol)
    else {
      val c = store.loadCoding(coding)
      graft.ext.Dedup.semanticDedup(store.loadTable(source), idCol, column,
        maxDist, bucket = Index.assignExpr(col(column), c), maxBucketRows)
    }
  }

  /** Full corpus curation of a stored table
    * ([[graft.ext.Curate.curate]]: exact dedup → minhash near-dup
    * removal → benchmark decontamination → Gopher quality → language
    * filter). Survivors (plus `n_words`/`lang_pred`) are persisted as
    * `dest`; returns the survivor count. */
  def curateTable(source: String, dest: String, bench: String,
      idCol: String, textCol: String,
      benchIdCol: String, benchTextCol: String,
      cfg: graft.ext.Curate.Config = graft.ext.Curate.Config()): Long = {
    val out = graft.ext.Curate.curate(store.loadTable(source), idCol,
      textCol, store.loadTable(bench), benchIdCol, benchTextCol, cfg)
    store.createTable(dest, out)
    store.loadTable(dest).count()
  }

  /** Per-column profile of a stored table ([[graft.ext.Describe]]):
    * one aggregation pass, one row per column. */
  def describeTable(name: String): DataFrame =
    graft.ext.Describe.describe(store.loadTable(name))

  /** Merge `updates` into table `name` with latest-wins semantics
    * ([[graft.ext.Dedup.latestByKey]]): per key, the greatest
    * (`versionCol`, `tieBreakCol`) row — existing or incoming — survives.
    * Creates the table when absent (upsert).
    *
    * Crash/concurrency safety comes from [[graft.store.Store.replaceTable]]
    * (staging write + delete/rename swap): the merge plan reads the OLD
    * table files while the new contents land in staging — no
    * read-overwrite hazard, no checkpoint copy of the merged frame, and
    * a crash anywhere before the final rename leaves the old table
    * intact. Returns the post-merge row count. */
  def upsertTable(name: String, updates: DataFrame, keyCols: Seq[String],
      versionCol: String, tieBreakCol: String): Long = {
    val base =
      if (store.tableExists(name)) store.loadTable(name).unionByName(updates)
      else updates
    val merged = graft.ext.Dedup
      .latestByKey(base, keyCols, versionCol, tieBreakCol)
    store.replaceTable(name, merged)
    store.loadTable(name).count()
  }

  /** Build the IVF+PQ index under an existing coding — the memory-
    * compressed search path ([[Index.buildPq]]). `residual = false`
    * explicitly opts into the flat variant (required above the residual
    * cell cap; weaker within-cell ranking on clustered data). */
  def makePqIndex(codingName: String, source: String, column: String,
      pqConfig: graft.coder.PQ.PQConfig, residual: Boolean = true): Unit =
    Index.buildPq(store, codingName, source, column, pqConfig, residual)

  /** Encode-only append of new source rows to an existing PQ index under
    * its stored codebooks ([[Index.syncIncrementalPq]]); returns rows
    * appended. */
  def syncPqIndex(codingName: String, source: String, column: String,
      idCol: String, expect: Option[graft.coder.PQ.PQConfig] = None): Long =
    Index.syncIncrementalPq(store, codingName, source, column, idCol, expect)

  /** Build the IVF+SQ8 index under an existing coding — 8-bit scalar
    * quantization, the memory tier between raw vectors and PQ
    * ([[Index.buildSq]]); returns the per-dimension affine params. */
  /** `perCell = true` fits one affine block per IVF cell (plus a global
    * fallback) — see [[Index.buildSq]]. */
  def makeSqIndex(codingName: String, source: String, column: String,
      perCell: Boolean = false): Index.SqParams =
    Index.buildSq(store, codingName, source, column, perCell)

  /** Quantize-only append of new source rows to an existing SQ8 index
    * under its stored affine params ([[Index.syncIncrementalSq]]);
    * returns rows appended. */
  def syncSqIndex(codingName: String, source: String, column: String,
      idCol: String): Long =
    Index.syncIncrementalSq(store, codingName, source, column, idCol)

  /** Probed IVF+SQ8 search ([[Index.searchSq]]): coarse pass over the
    * d-byte quantized copy, exact rerank of the survivors.
    * `candidates = Engine.Advised` serves the PERSISTED candidate
    * budget for (coding, "sq", probes) — see
    * [[resolveAdvisedCandidates]] (loud-or-fresh, target-reached only). */
  def searchSq(source: String, column: String, target: TargetVector,
      coding: String, probes: Int, candidates: Int, idCol: String,
      k: Int = 10, metric: Option[String] = None,
      filter: Option[Column] = None, select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame =
    Index.searchSq(store, coding, source, column, target, k, probes,
      advisedCand(candidates, coding, "sq", probes, source, column, k,
        metric),
      idCol, metric, filter, select, tieBreak)

  /** Build the IVF+BQ index under an existing coding — 1-bit sign codes
    * (32× smaller than float32; [[Index.buildBq]]); returns the
    * per-dimension mean thresholds. `perCell = true` centers each cell's
    * bits at its own means (residual codes — the config for clustered
    * corpora, where global sign bits degenerate into a cluster id). */
  def makeBqIndex(codingName: String, source: String, column: String,
      perCell: Boolean = false): Array[Double] =
    Index.buildBq(store, codingName, source, column, perCell)

  /** Encode-only append of new source rows to an existing BQ index under
    * its stored thresholds ([[Index.syncIncrementalBq]]). */
  def syncBqIndex(codingName: String, source: String, column: String,
      idCol: String): Long =
    Index.syncIncrementalBq(store, codingName, source, column, idCol)

  /** Matryoshka prefix-truncation search over a stored table
    * ([[Search.matryoshkaSearch]]): coarse rank on the first `prefixDim`
    * dims (a materialized `prefixCol` makes the coarse scan column-pruned),
    * exact rerank of the survivors. */
  def matryoshkaSearch(source: String, column: String, target: TargetVector,
      prefixDim: Int, candidates: Int, idCol: String, k: Int = 10,
      metric: String = "l2", prefixCol: Option[String] = None,
      filter: Option[Column] = None, select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame =
    Search.matryoshkaSearch(store.loadTable(source), column, target,
      prefixDim, candidates, idCol, k, metric, prefixCol, filter, select,
      tieBreak)

  /** Probed IVF+BQ search ([[Index.searchBq]]): Hamming coarse pass over
    * the 1-bit codes, exact rerank of the survivors.
    * `candidates = Engine.Advised` serves the persisted (coding, "bq",
    * probes) budget ([[resolveAdvisedCandidates]]). */
  def searchBq(source: String, column: String, target: TargetVector,
      coding: String, probes: Int, candidates: Int, idCol: String,
      k: Int = 10, metric: Option[String] = None,
      filter: Option[Column] = None, select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame =
    Index.searchBq(store, coding, source, column, target, k, probes,
      advisedCand(candidates, coding, "bq", probes, source, column, k,
        metric),
      idCol, metric, filter, select, tieBreak)

  /** Batch IVF k-NN join ([[Index.ivfKnnJoin]]): per-query top-k over
    * the probed cells — many queries amortized over one pruned corpus
    * pass; only ids/distances cross the per-query shuffle. */
  def knnJoinIvf(coding: String, source: String, column: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, probes: Int, idCol: String, metric: Option[String] = None,
      tieBreak: Seq[String] = Nil): DataFrame =
    Index.ivfKnnJoin(store, coding, source, column, queries, queryIdCol,
      queryVecCol, k, probes, idCol, metric, tieBreak)

  /** Batch k-NN join over the SQ8 copy ([[Index.sqKnnJoin]]): the
    * expensive per-cell stage carries d-byte codes instead of float
    * vectors. */
  def knnJoinSq(coding: String, source: String, column: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, probes: Int, candidates: Int, idCol: String,
      metric: Option[String] = None, tieBreak: Seq[String] = Nil): DataFrame =
    Index.sqKnnJoin(store, coding, source, column, queries, queryIdCol,
      queryVecCol, k, probes,
      advisedCand(candidates, coding, "sq", probes, source, column, k,
        metric),
      idCol, metric, tieBreak)

  /** Batch BQ k-NN join ([[Index.bqKnnJoin]]): the 1-bit tier's batch
    * join — Hamming popcount coarse pass per cell, scalars-only window,
    * exact rerank of each query's survivors. */
  def knnJoinBq(coding: String, source: String, column: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, probes: Int, candidates: Int, idCol: String,
      metric: Option[String] = None, tieBreak: Seq[String] = Nil): DataFrame =
    Index.bqKnnJoin(store, coding, source, column, queries, queryIdCol,
      queryVecCol, k, probes,
      advisedCand(candidates, coding, "bq", probes, source, column, k,
        metric),
      idCol, metric, tieBreak)

  /** Batch k-NN join over the IVF+PQ index ([[Index.pqKnnJoin]]): the
    * per-cell join carries m-byte ADC codes, each query's lookup table
    * rides the broadcast side, raw vectors only for coarse survivors. */
  def knnJoinPq(coding: String, source: String, column: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, probes: Int, candidates: Int, idCol: String,
      metric: Option[String] = None, tieBreak: Seq[String] = Nil): DataFrame =
    Index.pqKnnJoin(store, coding, source, column, queries, queryIdCol,
      queryVecCol, k, probes,
      advisedCand(candidates, coding, "pq", probes, source, column, k,
        metric),
      idCol, metric, tieBreak)

  /** Batch retrieve-rerank k-NN join ([[Index.rerankKnnJoin]]): cell-rank
    * coarse stage with no vector math, exact rerank of the survivors. */
  def knnJoinRerank(coding: String, source: String, column: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, probes: Int, candidates: Int, idCol: String,
      metric: Option[String] = None, tieBreak: Seq[String] = Nil): DataFrame =
    Index.rerankKnnJoin(store, coding, source, column, queries, queryIdCol,
      queryVecCol, k, probes,
      advisedCand(candidates, coding, "rerank", probes, source, column, k,
        metric),
      idCol, metric, tieBreak)

  /** Multi-source IVF+PQ search (reference ticket `"a:b:c"`,
    * `flight.py:47`): each source's PQ index is searched independently —
    * per-source codebooks make ADC scores incomparable across sources,
    * but each source's EXACT-reranked top-k is, so the global top-k of
    * the union equals top-k over the unioned corpus at full budgets.
    * That only holds when every source's final distances are under ONE
    * metric, so indexes trained under different metrics are refused up
    * front (cosine ∈ [0,1] unioned with unbounded l2 would silently
    * return garbage ordering). */
  def searchPqMulti(
      sources: Seq[String],
      column: String,
      target: TargetVector,
      coding: String,
      probes: Int,
      candidates: Int,
      idCol: String,
      k: Int = 10,
      metric: Option[String] = None,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    Engine.validCount("candidates", candidates)
    require(candidates != Engine.Advised,
      "candidates = Engine.Advised is single-source only: persisted " +
        "candidate advice is measured against one corpus — pass an " +
        "explicit candidate count for a multi-source union")
    require(sources.nonEmpty, "at least one source")
    val metrics = sources.map(s =>
      s -> Index.loadPqCodebooks(store, coding, s, column).canonicalMetric)
    require(metrics.map(_._2).distinct.size == 1,
      "multi-source PQ search needs every source's codebooks trained under " +
        s"ONE metric — distances are not comparable across metrics; got " +
        metrics.map { case (s, m) => s"$s:$m" }.mkString(", "))
    val m = Some(metric.map(graft.core.Metrics.canonical)
      .getOrElse(metrics.head._2))
    unionTopK(sources, k, tieBreak)(s =>
      Index.searchIvfPq(store, coding, s, column, target, k, probes,
        candidates, idCol, m, filter, select, tieBreak))
  }

  /** Global top-k over per-source top-k results: exact over the unioned
    * corpus whenever each per-source result carries true (comparable)
    * final distances — the shared merge step of every multi-source
    * search path. */
  private def unionTopK(sources: Seq[String], k: Int, tieBreak: Seq[String])(
      perSource: String => DataFrame): DataFrame =
    sources.map(perSource)
      .reduce(_ unionByName _)
      .orderBy(col(Search.DistCol).asc +: tieBreak.map(col(_).asc): _*)
      .limit(k)

  /** Multi-source IVF+SQ8 search. Simpler than [[searchPqMulti]]: each
    * source's affine params differ, but the per-source result distances
    * come from the EXACT rerank (true metric distances), so the global
    * top-k of the per-source top-k unions is exact over the unioned
    * corpus at full budgets with no codebook-comparability caveat —
    * only the metric must agree across calls (enforced by passing one
    * `metric` to every source). */
  def searchSqMulti(
      sources: Seq[String],
      column: String,
      target: TargetVector,
      coding: String,
      probes: Int,
      candidates: Int,
      idCol: String,
      k: Int = 10,
      metric: Option[String] = None,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    Engine.validCount("candidates", candidates)
    require(candidates != Engine.Advised,
      "candidates = Engine.Advised is single-source only: persisted " +
        "candidate advice is measured against one corpus — pass an " +
        "explicit candidate count for a multi-source union")
    require(sources.nonEmpty, "at least one source")
    unionTopK(sources, k, tieBreak)(s =>
      Index.searchSq(store, coding, s, column, target, k, probes,
        candidates, idCol, metric, filter, select, tieBreak))
  }

  /** Multi-source IVF+BQ search: per-source [[Index.searchBq]] top-k,
    * unioned and re-topped (same shape as [[searchSqMulti]]). */
  def searchBqMulti(
      sources: Seq[String],
      column: String,
      target: TargetVector,
      coding: String,
      probes: Int,
      candidates: Int,
      idCol: String,
      k: Int = 10,
      metric: Option[String] = None,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    Engine.validCount("candidates", candidates)
    require(candidates != Engine.Advised,
      "candidates = Engine.Advised is single-source only: persisted " +
        "candidate advice is measured against one corpus — pass an " +
        "explicit candidate count for a multi-source union")
    require(sources.nonEmpty, "at least one source")
    unionTopK(sources, k, tieBreak)(s =>
      Index.searchBq(store, coding, s, column, target, k, probes,
        candidates, idCol, metric, filter, select, tieBreak))
  }

  /** Two-stage retrieve-rerank under an IVF coding
    * ([[Index.searchRerank]]): id-only coarse pass ranked by cell score,
    * exact rerank of the `candidates` survivors; optional `probes`
    * partition pruning. */
  def searchRerank(
      source: String,
      column: String,
      target: TargetVector,
      coding: String,
      candidates: Int,
      idCol: String,
      k: Int = 10,
      probes: Option[Int] = None,
      metric: Option[String] = None,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    Engine.validCount("candidates", candidates)
    // the advice key includes the probe budget it was measured at, so
    // the probe-free (all-cells) rerank cannot serve an advised budget
    val cand =
      if (candidates != Engine.Advised) candidates
      else resolveAdvisedCandidates(coding, "rerank",
        probes.getOrElse(throw new IllegalArgumentException(
          "candidates = Engine.Advised needs an explicit probes value — " +
            "candidate advice is persisted per (coding, tier, probes)")),
        source, column, k, metric)
    Index.searchRerank(store, coding, source, column, target, k, cand,
      idCol, probes, metric, filter, select, tieBreak)
  }

  /** Multi-source retrieve-rerank: per-source exact-reranked top-k
    * merged by the shared global-top-k step (final distances are exact,
    * hence cross-source comparable — the same argument as
    * [[searchSqMulti]]). */
  def searchRerankMulti(
      sources: Seq[String],
      column: String,
      target: TargetVector,
      coding: String,
      candidates: Int,
      idCol: String,
      k: Int = 10,
      probes: Option[Int] = None,
      metric: Option[String] = None,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    Engine.validCount("candidates", candidates)
    require(candidates != Engine.Advised,
      "candidates = Engine.Advised is single-source only: persisted " +
        "candidate advice is measured against one corpus — pass an " +
        "explicit candidate count for a multi-source union")
    require(sources.nonEmpty, "at least one source")
    unionTopK(sources, k, tieBreak)(s =>
      Index.searchRerank(store, coding, s, column, target, k, candidates,
        idCol, probes, metric, filter, select, tieBreak))
  }

  /** Probed IVF+PQ search: codes-only ADC coarse pass over the probed
    * cells, exact rerank of `candidates` rows ([[Index.searchIvfPq]]). */
  def searchPq(
      source: String,
      column: String,
      target: TargetVector,
      coding: String,
      probes: Int,
      candidates: Int,
      idCol: String,
      k: Int = 10,
      metric: Option[String] = None,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame =
    Index.searchIvfPq(store, coding, source, column, target, k, probes,
      advisedCand(candidates, coding, "pq", probes, source, column, k,
        metric),
      idCol, metric, filter, select, tieBreak)

  // ——— search (V8/V9) ———
  /** Multi-source search (reference ticket `"a:b:c"`, `flight.py:47`):
    * the union of the per-source (indexed) tables searched as one. */
  def searchMulti(
      sources: Seq[String],
      column: String,
      target: TargetVector,
      metric: Option[String] = None,
      coding: Option[String] = None,
      probes: Option[Int] = None,
      k: Int = 10,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame =
    (coding, probes) match {
      case (Some(c), Some(p0)) =>
        // the Advised sentinel applies to the SINGLE-source form only:
        // persisted advice is measured against one (coding, source,
        // column) corpus, and a multi-source union is a different
        // corpus with a different recall curve
        Engine.validCount("probes", p0)
        val p =
          if (p0 != Engine.Advised) p0
          else {
            require(sources.size == 1,
              "probes = Engine.Advised is single-source only: persisted " +
                "probe advice is measured against one (coding, source, " +
                s"column) corpus, and this call unions ${sources.size} " +
                "sources — pass an explicit probe count (or advise a " +
                "dedicated union table)")
            resolveAdvisedProbes(c, sources.head, column, k, metric)
          }
        val codingObj = store.loadCoding(c)
        val m = metric.getOrElse(codingObj.config.metric)
        val cells = codingObj.rankCells(target.doubles, p)
        val indexed = Index.pruneToCells(
          sources.map(s => Index.load(store, c, s, column))
            .reduce(_ unionByName _),
          cells, codingObj.numCells)
        val base = filter.fold(indexed)(indexed.filter)
        val withDist = base.withColumn(Search.DistCol,
          graft.functions.functions.vector_distance(col(column), target.lit, m))
        val projected = select.fold(withDist)(cols =>
          withDist.select((cols :+ Search.DistCol).map(col): _*))
        projected.orderBy(col(Search.DistCol).asc +: tieBreak.map(col(_).asc): _*).limit(k)
      case _ =>
        probes.foreach(Engine.validCount("probes", _))
        require(!probes.contains(Engine.Advised),
          "probes = Engine.Advised needs a coding — the advice is " +
            "persisted per coding; pass the coding the advice was " +
            "measured for")
        Search.knn(store.loadTable(sources: _*), column,
          spark.range(1).select(target.lit.as("__target__")),
          requireMetric(metric), k, filter, select, tieBreak)
    }

  /** Brute-force or probed top-k depending on `coding`/`probes`, mirroring
    * `Flight.search` (`flight.py:242-288`). A coding with NO probe count
    * is EXACT brute force — approximation is never a silent default.
    * `probes = Some(Engine.Advised)` explicitly opts into the persisted
    * advisor budget for this (coding, source, column)
    * ([[adviseProbes]] — the "advise once, serve many" loop), refused
    * loudly when the advice is absent, stale, or was measured under an
    * incompatible k/metric ([[resolveAdvisedProbes]]); the call site
    * always reads as advised, never as exact. */
  def search(
      source: String,
      column: String,
      target: TargetVector,
      metric: Option[String] = None,
      coding: Option[String] = None,
      probes: Option[Int] = None,
      k: Int = 10,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame =
    (coding, probes) match {
      case (Some(c), Some(p0)) =>
        Engine.validCount("probes", p0)
        val p = if (p0 == Engine.Advised)
          resolveAdvisedProbes(c, source, column, k, metric) else p0
        Index.searchProbed(store, c, source, column, target, k, p, metric,
          filter, select, tieBreak)
      case _ =>
        probes.foreach(Engine.validCount("probes", _))
        require(!probes.contains(Engine.Advised),
          "probes = Engine.Advised needs a coding — the advice is " +
            "persisted per coding; pass the coding the advice was " +
            "measured for")
        Search.knn(store.loadTable(source), column,
          spark.range(1).select(target.lit.as("__target__")),
          requireMetric(metric), k, filter, select, tieBreak)
    }

  /** Per-coding (parsed advice, coding metric, verified-at) memo behind
    * [[resolveAdvisedProbes]]: the freshness check is a full source
    * file listing, the advice itself is a sidecar read, and the metric
    * compat check is a coding load — a serving loop issuing one advised
    * search per query must pay NONE of them per call. Entries expire
    * after [[advisedStampTtlMs]] (an in-place corpus rewrite — or a
    * re-advise — is therefore picked up within the TTL, not instantly;
    * pass `0` to re-verify every call). The metric slot fills lazily:
    * only a call with a metric override needs the coding, and once one
    * has paid that load the entry is upgraded in place. */
  @transient private lazy val advisedMemo =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Engine.PersistedProbeAdvice, Option[String], Long)]()

  /** The probe budget `probes = Some(Engine.Advised)` serves, or a LOUD
    * refusal. Refuses when: no advice was ever persisted for `coding`
    * ([[adviseProbes]] names the remedy); the advice was measured
    * against a different (source, column); the caller's `k` exceeds the
    * advice's (recall@k was never measured past the advice's k); a
    * `metric` override differs from the coding's metric the advice was
    * measured under; or the source corpus changed since the measurement
    * (file-listing stamp — checked at most once per
    * [[advisedStampTtlMs]] per coding). Compatibility is checked BEFORE
    * the stamp so a mismatch never pays the listing IO. */
  def resolveAdvisedProbes(coding: String, source: String, column: String,
      k: Int, metric: Option[String]): Int = {
    val now = System.nanoTime()
    val hit = Option(advisedMemo.get(coding)).filter { case (_, _, at) =>
      (now - at) < advisedStampTtlMs * 1000000L
    }
    // sidecar read only on a memo miss — the steady-state advised call
    // touches no storage at all
    val p = hit.map(_._1).getOrElse(loadProbeAdvice(coding).getOrElse(
      throw new NoSuchElementException(
        s"no persisted probe advice for coding '$coding' — run " +
          "adviseProbes (or POST /api/advise/probes) first")))
    require(p.source == source && p.column == column,
      s"probe advice for coding '$coding' was measured against " +
        s"(${p.source}, ${p.column}), not ($source, $column) — advise " +
        "this corpus before serving it with Engine.Advised")
    require(k <= p.k,
      s"probe advice for coding '$coding' was measured at k = ${p.k}; " +
        s"serving k = $k with it would apply a recall curve nobody " +
        s"measured — re-run adviseProbes with k >= $k")
    val codingMetric = metric.map(graft.core.Metrics.canonical).map { m =>
      val cm = hit.flatMap(_._2).getOrElse(graft.core.Metrics.canonical(
        store.loadCoding(coding).config.metric))
      require(m == cm,
        s"probe advice for coding '$coding' was measured under the " +
          s"coding's metric '$cm', not '$m' — drop the metric override " +
          "or re-index/advise under it")
      cm
    }
    hit match {
      case Some((cached, None, at)) if codingMetric.isDefined =>
        // upgrade in place: the NEXT overridden call skips the coding
        // load too (same verified-at — no freshness extension)
        advisedMemo.put(coding, (cached, codingMetric, at))
      case Some(_) => ()
      case None =>
        val stampNow = store.sourceStamp(p.source)
        if (stampNow != p.sourceStamp) {
          advisedMemo.remove(coding)
          throw new IllegalStateException(
            s"probe advice for coding '$coding' is STALE: source " +
              s"'${p.source}' changed since the advice was measured " +
              s"(stamp ${p.sourceStamp} -> $stampNow) — re-run " +
              "adviseProbes (or POST /api/advise/probes) to re-measure")
        }
        advisedMemo.put(coding, (p, codingMetric, now))
    }
    p.advice.probes
  }

  /** [[advisedMemo]]'s candidate-advice twin — same TTL and
    * lazily-filled coding-metric semantics, keyed per
    * (coding, tier, probes). */
  @transient private lazy val advisedCandMemo =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Engine.PersistedCandidateAdvice, Option[String], Long)]()

  /** Pass-through unless `candidates` is the [[Engine.Advised]]
    * sentinel — then the persisted budget for (coding, tier, probes)
    * via [[resolveAdvisedCandidates]]. */
  private def advisedCand(candidates: Int, coding: String, tier: String,
      probes: Int, source: String, column: String, k: Int,
      metric: Option[String]): Int = {
    Engine.validCount("candidates", candidates)
    if (candidates != Engine.Advised) candidates
    else resolveAdvisedCandidates(coding, tier, probes, source, column,
      k, metric)
  }

  /** The candidate budget `candidates = Engine.Advised` serves, or a
    * LOUD refusal — [[resolveAdvisedProbes]]' contract for the OTHER
    * serving knob. Additionally refuses advice that never REACHED its
    * recall target: a ceiling budget measured to miss is a diagnosis
    * (probe-bound or rate-distortion-bound), not a budget anyone should
    * silently serve. Keyed per (coding, tier, probes) — the advice is
    * only valid at the probe count it was measured with. */
  def resolveAdvisedCandidates(coding: String, tier: String, probes: Int,
      source: String, column: String, k: Int,
      metric: Option[String]): Int = {
    val key = s"$coding#$tier#$probes"
    val now = System.nanoTime()
    val hit = Option(advisedCandMemo.get(key)).filter { case (_, _, at) =>
      (now - at) < advisedStampTtlMs * 1000000L
    }
    // sidecar read only on a memo miss — see [[resolveAdvisedProbes]]
    val p = hit.map(_._1).getOrElse(
      loadCandidateAdvice(coding, tier, probes).getOrElse(
        throw new NoSuchElementException(
          s"no persisted candidate advice for (coding '$coding', tier " +
            s"'$tier', probes $probes) — run adviseCandidates (or POST " +
            "/api/advise/candidates) first")))
    require(p.source == source && p.column == column,
      s"candidate advice for (coding '$coding', tier '$tier', probes " +
        s"$probes) was measured against (${p.source}, ${p.column}), " +
        s"not ($source, $column) — advise this corpus before serving " +
        "it with Engine.Advised")
    require(k <= p.k,
      s"candidate advice for (coding '$coding', tier '$tier', probes " +
        s"$probes) was measured at k = ${p.k}; serving k = $k with it " +
        s"would apply a recall curve nobody measured — re-run " +
        s"adviseCandidates with k >= $k")
    require(p.advice.reachedTarget,
      s"candidate advice for (coding '$coding', tier '$tier', probes " +
        s"$probes) never REACHED its ${p.targetRecall} target (recall " +
        s"${p.advice.recall} at the ${p.advice.candidates} ceiling) — " +
        "the budget is probe- or rate-bound; raise probes/maxCandidates " +
        "and re-advise, or pass an explicit candidate count deliberately")
    val codingMetric = metric.map(graft.core.Metrics.canonical).map { m =>
      val cm = hit.flatMap(_._2).getOrElse(graft.core.Metrics.canonical(
        store.loadCoding(coding).config.metric))
      require(m == cm,
        s"candidate advice for coding '$coding' was measured under the " +
          s"coding's metric '$cm', not '$m' — drop the metric override " +
          "or re-index/advise under it")
      cm
    }
    hit match {
      case Some((cached, None, at)) if codingMetric.isDefined =>
        advisedCandMemo.put(key, (cached, codingMetric, at))
      case Some(_) => ()
      case None =>
        val stampNow = store.sourceStamp(p.source)
        if (stampNow != p.sourceStamp) {
          advisedCandMemo.remove(key)
          throw new IllegalStateException(
            s"candidate advice for (coding '$coding', tier '$tier', " +
              s"probes $probes) is STALE: source '${p.source}' changed " +
              s"since the advice was measured (stamp ${p.sourceStamp} -> " +
              s"$stampNow) — re-run adviseCandidates (or POST " +
              "/api/advise/candidates) to re-measure")
        }
        advisedCandMemo.put(key, (p, codingMetric, now))
    }
    p.advice.candidates
  }

  /** Late-interaction (ColBERT MaxSim) retrieval over a table carrying a
    * multi-vector `tokensCol` — see [[Search.maxsimSearch]].
    *
    * Without `coding`/`probes`: brute (candidates = 0) or pooled-coarse
    * two-stage over the raw table (`poolCol` reused when given, else
    * pooled inline). With `coding` + `probes`: the INDEXED serving path —
    * the coarse stage is a probed IVF search over the precomputed pooled
    * column (partition-pruned scan, distributed top-candidates), the
    * survivors' ids broadcast back to fetch token matrices, exact MaxSim
    * rerank on `candidates` docs. The token matrices never leave their
    * partitions until the candidate join, so corpus scale is bounded by
    * the single-vector index tier, not the token payload. Exact when
    * probes cover all cells and `candidates` ≥ corpus size. */
  def maxsimSearch(
      source: String,
      tokensCol: String,
      query: Seq[Seq[Double]],
      metric: String,
      k: Int,
      candidates: Int = 0,
      poolCol: Option[String] = None,
      coding: Option[String] = None,
      probes: Option[Int] = None,
      idCol: Option[String] = None,
      tieBreak: Seq[String] = Nil): DataFrame =
    (coding, probes) match {
      case (Some(c), Some(p)) =>
        val pc = poolCol.getOrElse(throw new IllegalArgumentException(
          "indexed maxsimSearch needs poolCol (the indexed pooled-vector column)"))
        val id = idCol.getOrElse(throw new IllegalArgumentException(
          "indexed maxsimSearch needs idCol to join candidates back to tokens"))
        require(candidates > 0, "indexed maxsimSearch needs candidates > 0")
        val dim = query.head.length
        val pooledQuery =
          (0 until dim).map(i => query.map(_(i)).sum / query.length).toArray
        val cands = Index.searchProbed(store, c, source, pc, pooledQuery,
          candidates, p, Some(metric), select = Some(Seq(id)),
          tieBreak = tieBreak)
        val docs = store.loadTable(source)
          .join(broadcast(cands.select(id)), Seq(id))
        import graft.functions.functions.{maxsim, tokens_lit}
        docs.withColumn(Search.DistCol,
            maxsim(col(tokensCol), tokens_lit(query), metric))
          .orderBy(col(Search.DistCol).asc +: tieBreak.map(col(_).asc): _*)
          .limit(k)
      case _ =>
        Search.maxsimSearch(store.loadTable(source), tokensCol, query,
          metric, k, candidates, tieBreak, poolCol)
    }

  /** Brute-force search has no coding to default from, so the metric must
    * be explicit — matching the reference's validated-metric contract
    * (`flight.py:254-256`); a silent l2 default would hand cosine
    * workloads wrong answers. */
  private def requireMetric(metric: Option[String]): String =
    metric.getOrElse(throw new IllegalArgumentException(
      "metric is required for search without a coding; expected one of " +
        graft.core.Metrics.All.mkString(", ")))

  /** IVF probe advisor: the "how many probes do I need for recall r?"
    * calibration every probed deployment runs once before serving.
    * Measures mean recall@k of [[knnJoinIvf]] against the exact
    * brute-force top-k ([[Search.knnJoin]]) on a DETERMINISTIC sample of
    * the table's own vectors (the `sampleQueries` smallest
    * `xxhash64(id)` rows — re-runs advise identically), doubling probes
    * 1, 2, 4, … until `targetRecall` is met; the final ladder step is
    * always the coding's full cell count, where probed == exact and
    * recall is 1.0 by construction, so the advisor always terminates
    * with a valid answer.
    *
    * Cost shape: ONE brute batch-join pass over the corpus for ground
    * truth plus one PRUNED pass per ladder step (≤ log₂(cells) + 1
    * steps), each amortizing all sample queries — never a per-query
    * loop. Driver state is `sampleQueries × k` id pairs per step
    * (bounded by the 256-query cap). Ties at the k-th distance are
    * broken on `idCol` on BOTH sides, so the recall is well-defined.
    * At 100 TB the brute pass is the honest price of ground truth —
    * run the advisor once per (coding, corpus) and persist the answer,
    * not per query. */
  def recommendProbes(coding: String, source: String, column: String,
      idCol: String, k: Int = 10, targetRecall: Double = 0.95,
      sampleQueries: Int = 32): Engine.ProbeAdvice = {
    requireAdvisorParams(k, targetRecall, sampleQueries)
    val ctx = adviceContext(coding, source, column, idCol, k, sampleQueries)
    // try/finally: a ladder-step join that throws must still release
    // the checkpointed query RDD (it would otherwise pin executor
    // blocks for the session lifetime)
    try {
      def recallAt(probes: Int): Double =
        ctx.meanRecall(collectTopK(idCol,
          knnJoinIvf(coding, source, column, ctx.queries,
            "__q_id__", "__q_vec__", k, probes, idCol, Some(ctx.metric),
            tieBreak = Seq(idCol))))
      val ladder = (Iterator.iterate(1)(_ * 2).takeWhile(_ < ctx.cells) ++
        Iterator.single(ctx.cells)).toSeq
      val (curve, advice) = climbLadder(ladder, recallAt, targetRecall)
      val (probes, recall) = advice.getOrElse(curve.last)
      Engine.ProbeAdvice(probes, recall, curve, ctx.cells)
    } finally graft.ext.Graph.release(ctx.queries)
  }

  /** Rerank-tier candidate-budget advisor — the same ladder discipline
    * as [[recommendProbes]] for the OTHER serving knob: how many
    * coarse-stage candidates do the SQ8/BQ rerank tiers need (at a
    * GIVEN probe budget) before the exact rerank of the survivors
    * recovers recall r? Ground truth is the same brute batch-join
    * pass; the ladder doubles candidates k, 2k, 4k, … up to
    * `maxCandidates`.
    *
    * Unlike the probe ladder (whose final step — all cells — is exact
    * by construction), the candidate ladder PLATEAUS at the recall
    * ceiling of the probe budget it was given: candidates only decide
    * which coarse survivors reach the exact rerank, they cannot
    * recover a neighbor whose cell was never probed. An unreachable
    * target therefore terminates at `maxCandidates` with the measured
    * ceiling — the caller learns the budget is probe-bound, which is
    * exactly the diagnosis the curve is for (the 250k bench curves
    * show the sq tier hitting 1.0 at small budgets while bq needs
    * thousands — this varies by tier and regime, so it is measured,
    * not guessed). */
  def recommendCandidates(coding: String, source: String, column: String,
      idCol: String, tier: String, probes: Int, k: Int = 10,
      targetRecall: Double = 0.95, sampleQueries: Int = 32,
      maxCandidates: Int = 4096): Engine.CandidateAdvice = {
    requireAdvisorParams(k, targetRecall, sampleQueries)
    require(probes >= 1, s"probes must be >= 1, got $probes")
    require(maxCandidates >= k,
      s"maxCandidates ($maxCandidates) must be >= k ($k)")
    val joinFn: (DataFrame, Int) => DataFrame = tier match {
      case "sq" => (q, cand) => knnJoinSq(coding, source, column, q,
        "__q_id__", "__q_vec__", k, probes, cand, idCol,
        tieBreak = Seq(idCol))
      case "bq" => (q, cand) => knnJoinBq(coding, source, column, q,
        "__q_id__", "__q_vec__", k, probes, cand, idCol,
        tieBreak = Seq(idCol))
      case "pq" => (q, cand) => knnJoinPq(coding, source, column, q,
        "__q_id__", "__q_vec__", k, probes, cand, idCol,
        tieBreak = Seq(idCol))
      case "rerank" => (q, cand) => knnJoinRerank(coding, source, column,
        q, "__q_id__", "__q_vec__", k, probes, cand, idCol,
        tieBreak = Seq(idCol))
      case other => throw new IllegalArgumentException(
        s"tier must be one of 'sq', 'bq', 'pq', 'rerank' (the reranked " +
          s"batch-join tiers), got '$other'")
    }
    val ctx = adviceContext(coding, source, column, idCol, k, sampleQueries)
    try {
      def recallAt(cand: Int): Double =
        ctx.meanRecall(collectTopK(idCol, joinFn(ctx.queries, cand)))
      val ladder = (Iterator.iterate(k)(_ * 2)
        .takeWhile(_ < maxCandidates) ++ Iterator.single(maxCandidates))
        .toSeq
      val (curve, advice) = climbLadder(ladder, recallAt, targetRecall)
      val (cand, recall) = advice.getOrElse(curve.last)
      Engine.CandidateAdvice(tier, probes, cand, recall, curve,
        reachedTarget = advice.isDefined)
    } finally graft.ext.Graph.release(ctx.queries)
  }

  /** [[recommendProbes]] + PERSIST: the advisor's scaladoc says "run
    * once per (coding, corpus) and persist the answer" — this is the
    * method that actually does. The advice lands as a JSON sidecar
    * under the coding (the PCA/BPE model-artifact pattern) stamped
    * with the source's file-listing stamp taken BEFORE the measurement
    * pass (the [[graft.index.Index]] discipline: a concurrent source
    * change mid-run leaves a stale stamp — conservative). */
  def adviseProbes(coding: String, source: String, column: String,
      idCol: String, k: Int = 10, targetRecall: Double = 0.95,
      sampleQueries: Int = 32): Engine.PersistedProbeAdvice = {
    val stamp = store.sourceStamp(source)
    val a = recommendProbes(coding, source, column, idCol, k,
      targetRecall, sampleQueries)
    val p = Engine.PersistedProbeAdvice(a, source, column, idCol, k,
      targetRecall, sampleQueries, stamp)
    store.saveProbeAdvice(coding, p.toJson.getBytes("UTF-8"))
    advisedMemo.put(coding, (p, None, System.nanoTime()))
    p
  }

  /** Joint (probes, candidates) frontier advisor for the RERANK tier,
    * persisted.
    *
    * [[recommendCandidates]] answers "how many candidates at a GIVEN
    * probe budget" — the right question for the sq/bq/pq tiers, whose
    * coarse scores discriminate between rows inside one cell. The
    * rerank tier's coarse score is the CELL RANK itself: every row of
    * a probed cell ties (broken only by id), so at small probe budgets
    * no candidate budget can separate true neighbors from their
    * cell-mates and the candidate ladder plateaus below target — the
    * measured `reached = 0 at probes = 1` on the 1M curve is a
    * diagnosis of the tier, not of the budget. The advice a rerank
    * deployment needs is therefore the FRONTIER: the smallest
    * (probes, candidates) pair that reaches `targetRecall`, probes
    * doubling from `startProbes` up to the coding's cell count.
    *
    * Cost shape: ground truth is the ONE shared brute pass; each
    * failing probe budget costs a single pruned pass (its recall
    * CEILING at `maxCandidates` — if the ceiling misses, no ladder
    * point can pass, so none is run), and only the first reachable
    * budget pays the candidate ladder (≤ log₂(maxCandidates/k)
    * passes). The winning pair is persisted under its measured
    * (coding, "rerank", probes) key, so
    * `searchRerank(probes = Some(frontier.probes),
    * candidates = Engine.Advised)` serves it; an unreachable frontier
    * persists nothing (there is no budget anyone should serve) and
    * returns `reachedTarget = false` with the measured ceilings. */
  def adviseRerankFrontier(coding: String, source: String, column: String,
      idCol: String, k: Int = 10, targetRecall: Double = 0.95,
      sampleQueries: Int = 32, maxCandidates: Int = 4096,
      startProbes: Int = 1): Engine.RerankFrontier = {
    requireAdvisorParams(k, targetRecall, sampleQueries)
    require(maxCandidates >= k,
      s"maxCandidates ($maxCandidates) must be >= k ($k)")
    require(startProbes >= 1, s"startProbes must be >= 1, got $startProbes")
    val stamp = store.sourceStamp(source)
    val ctx = adviceContext(coding, source, column, idCol, k, sampleQueries)
    try {
      val start = math.min(startProbes, ctx.cells)
      val probeLadder = (Iterator.iterate(start)(_ * 2)
        .takeWhile(_ < ctx.cells) ++ Iterator.single(ctx.cells)).toSeq
      val candLadder = (Iterator.iterate(k)(_ * 2)
        .takeWhile(_ < maxCandidates) ++ Iterator.single(maxCandidates))
        .toSeq
      val frontier = scala.collection.mutable.ListBuffer.empty[(Int, Int, Double)]
      var winner: Option[(Int, Int, Double)] = None
      var winnerCurve: List[(Int, Double)] = Nil
      val pit = probeLadder.iterator
      while (winner.isEmpty && pit.hasNext) {
        val p = pit.next()
        def recallAt(cand: Int): Double =
          ctx.meanRecall(collectTopK(idCol, knnJoinRerank(coding, source,
            column, ctx.queries, "__q_id__", "__q_vec__", k, p, cand,
            idCol, tieBreak = Seq(idCol))))
        val ceiling = recallAt(maxCandidates)
        if (ceiling >= targetRecall) {
          val (curve, advice) =
            climbLadder(candLadder.init, recallAt, targetRecall)
          val fullCurve = curve :+ ((maxCandidates, ceiling))
          frontier ++= fullCurve.map { case (c, r) => (p, c, r) }
          winner = Some(advice.getOrElse((maxCandidates, ceiling)))
            .map { case (c, r) => (p, c, r) }
          winnerCurve = fullCurve
        } else frontier += ((p, maxCandidates, ceiling))
      }
      winner match {
        case Some((p, c, r)) =>
          val a = Engine.CandidateAdvice("rerank", p, c, r, winnerCurve,
            reachedTarget = true)
          val pa = Engine.PersistedCandidateAdvice(a, source, column,
            idCol, k, targetRecall, sampleQueries, maxCandidates, stamp)
          store.saveCandidateAdvice(coding, "rerank", p,
            pa.toJson.getBytes("UTF-8"))
          advisedCandMemo.put(s"$coding#rerank#$p",
            (pa, None, System.nanoTime()))
          Engine.RerankFrontier(p, c, r, frontier.toList,
            reachedTarget = true)
        case None =>
          val (p, c, r) = frontier.last
          Engine.RerankFrontier(p, c, r, frontier.toList,
            reachedTarget = false)
      }
    } finally graft.ext.Graph.release(ctx.queries)
  }

  /** [[recommendCandidates]] + PERSIST, keyed per (coding, tier,
    * probes) — the same sidecar discipline as [[adviseProbes]] (the
    * candidate advisor shares its expensive brute ground-truth pass, so
    * "measure per call" was the one advisor output that did NOT
    * persist). Stamp taken BEFORE the measurement, conservative under
    * concurrent source changes. */
  def adviseCandidates(coding: String, source: String, column: String,
      idCol: String, tier: String, probes: Int, k: Int = 10,
      targetRecall: Double = 0.95, sampleQueries: Int = 32,
      maxCandidates: Int = 4096): Engine.PersistedCandidateAdvice = {
    val stamp = store.sourceStamp(source)
    val a = recommendCandidates(coding, source, column, idCol, tier,
      probes, k, targetRecall, sampleQueries, maxCandidates)
    val p = Engine.PersistedCandidateAdvice(a, source, column, idCol, k,
      targetRecall, sampleQueries, maxCandidates, stamp)
    store.saveCandidateAdvice(coding, tier, probes,
      p.toJson.getBytes("UTF-8"))
    advisedCandMemo.put(s"$coding#$tier#$probes",
      (p, None, System.nanoTime()))
    p
  }

  /** Persisted candidate advice for (coding, tier, probes), or None when
    * never advised. No freshness check — see [[freshCandidateAdvice]]. */
  def loadCandidateAdvice(coding: String, tier: String,
      probes: Int): Option[Engine.PersistedCandidateAdvice] =
    store.loadCandidateAdviceBytes(coding, tier, probes)
      .map(b => Engine.PersistedCandidateAdvice.fromJson(new String(b, "UTF-8")))

  /** Persisted candidate advice, REFUSED loudly when never advised for
    * this (coding, tier, probes) or when the source corpus changed since
    * the measurement — the [[freshProbeAdvice]] contract. */
  def freshCandidateAdvice(coding: String, tier: String,
      probes: Int): Engine.PersistedCandidateAdvice = {
    val p = loadCandidateAdvice(coding, tier, probes).getOrElse(
      throw new NoSuchElementException(
        s"no persisted candidate advice for (coding '$coding', tier " +
          s"'$tier', probes $probes) — run adviseCandidates (or POST " +
          "/api/advise/candidates) first"))
    val now = store.sourceStamp(p.source)
    if (now != p.sourceStamp) throw new IllegalStateException(
      s"candidate advice for (coding '$coding', tier '$tier', probes " +
        s"$probes) is STALE: source '${p.source}' changed since the " +
        s"advice was measured (stamp ${p.sourceStamp} -> $now) — re-run " +
        "adviseCandidates (or POST /api/advise/candidates) to re-measure")
    p
  }

  /** Persisted advice for `coding`, or None when never advised. No
    * freshness check — see [[freshProbeAdvice]]. */
  def loadProbeAdvice(coding: String): Option[Engine.PersistedProbeAdvice] =
    store.loadProbeAdviceBytes(coding)
      .map(b => Engine.PersistedProbeAdvice.fromJson(new String(b, "UTF-8")))

  /** Persisted advice, REFUSED loudly when the source corpus changed
    * since it was measured (file-listing stamp mismatch — the advice's
    * recall curve was measured against a corpus that no longer
    * exists). Callers that can re-measure should catch and call
    * [[adviseProbes]]. */
  def freshProbeAdvice(coding: String): Engine.PersistedProbeAdvice = {
    val p = loadProbeAdvice(coding).getOrElse(
      throw new NoSuchElementException(
        s"no persisted probe advice for coding '$coding' — run " +
          "adviseProbes (or POST /api/advise/probes) first"))
    val now = store.sourceStamp(p.source)
    if (now != p.sourceStamp) throw new IllegalStateException(
      s"probe advice for coding '$coding' is STALE: source " +
        s"'${p.source}' changed since the advice was measured " +
        s"(stamp ${p.sourceStamp} -> $now) — re-run adviseProbes " +
        "(or POST /api/advise/probes) to re-measure")
    p
  }

  /** Shared advisor scaffolding: deterministic bounded query sample
    * (checkpointed — the orderBy scan runs once, not once per ladder
    * step), exact brute-force ground truth, mean recall@k. ONE truth
    * pass serves whichever ladder the caller climbs. */
  private case class AdviceContext(queries: DataFrame,
      truth: Map[String, Set[String]], metric: String, cells: Int) {
    def meanRecall(got: Map[String, Set[String]]): Double = {
      val rs = truth.map { case (q, ids) =>
        if (ids.isEmpty) 1.0
        else ids.count(got.getOrElse(q, Set.empty[String]).contains)
          .toDouble / ids.size
      }
      if (rs.isEmpty) 1.0 else rs.sum / rs.size
    }
  }

  // string keys so non-numeric id columns advise too
  private def collectTopK(idCol: String,
      df: DataFrame): Map[String, Set[String]] =
    df.select(col("__q_id__").cast("string"), col(idCol).cast("string"))
      .collect().groupBy(_.getString(0))
      .map { case (q, rs) => q -> rs.map(_.getString(1)).toSet }

  private def adviceContext(coding: String, source: String, column: String,
      idCol: String, k: Int, sampleQueries: Int): AdviceContext = {
    val codingObj = store.loadCoding(coding)
    val metric = codingObj.config.metric
    val corpus = store.loadTable(source)
    val queries = corpus
      .select(col(idCol).as("__q_id__"), col(column).as("__q_vec__"))
      .orderBy(xxhash64(col("__q_id__")), col("__q_id__"))
      .limit(sampleQueries).localCheckpoint()
    try {
      val truth = collectTopK(idCol, graft.api.Search.knnJoin(corpus,
        column, queries, "__q_id__", "__q_vec__", metric, k,
        tieBreak = Seq(idCol), idCol = Some(idCol)))
      AdviceContext(queries, truth, metric, codingObj.numCells.toInt)
    } catch {
      case t: Throwable =>
        graft.ext.Graph.release(queries); throw t
    }
  }

  /** Climb `ladder` until `recallAt` meets `target`; returns every
    * measured point and the first passing one. */
  private def climbLadder(ladder: Seq[Int], recallAt: Int => Double,
      target: Double): (List[(Int, Double)], Option[(Int, Double)]) = {
    val curve = scala.collection.mutable.ListBuffer.empty[(Int, Double)]
    var advice: Option[(Int, Double)] = None
    val it = ladder.iterator
    while (advice.isEmpty && it.hasNext) {
      val p = it.next()
      val r = recallAt(p)
      curve += ((p, r))
      if (r >= target) advice = Some((p, r))
    }
    (curve.toList, advice)
  }

  private def requireAdvisorParams(k: Int, targetRecall: Double,
      sampleQueries: Int): Unit = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall must be in (0, 1], got $targetRecall")
    require(k >= 1, s"k must be >= 1, got $k")
    require(sampleQueries >= 1 && sampleQueries <= 256,
      s"sampleQueries must be in [1, 256] (bounded driver state), " +
        s"got $sampleQueries")
  }

  def remove(): Unit = store.remove()
}

object Engine {
  /** Sentinel probe count: `probes = Some(Engine.Advised)` opts a
    * [[Engine.search]]/[[Engine.searchMulti]] call into the PERSISTED
    * advisor budget ([[Engine.adviseProbes]]) — explicit at the call
    * site, so exact and advised serving are never confusable. Resolved
    * (and loudly refused on absent/stale/incompatible advice) by
    * [[Engine.resolveAdvisedProbes]]. Deliberately NOT -1: -1 means
    * "disabled/unbounded" in enough other libraries that a caller
    * passing it out of habit must get an invalid-count refusal
    * ([[Engine.validCount]]), never a silent opt-in to advised
    * serving. */
  val Advised: Int = Int.MinValue

  /** Every serving knob that accepts the [[Advised]] sentinel validates
    * through here: a real budget is >= 1, the sentinel is the single
    * documented negative, and everything else — 0, -1, any stray
    * negative — refuses loudly instead of acquiring a meaning by
    * accident. */
  private[graft] def validCount(name: String, v: Int): Unit =
    require(v >= 1 || v == Advised,
      s"invalid $name $v: pass a count >= 1, or Engine.Advised " +
        "(\"advised\" on the wire) to opt into the persisted advisor " +
        "budget")

  /** [[Engine.recommendProbes]] result: the smallest measured probe
    * count meeting the target, its recall, the (probes, recall) points
    * actually measured, and the coding's cell count for context. */
  case class ProbeAdvice(probes: Int, recall: Double,
      curve: Seq[(Int, Double)], numCells: Int)

  /** [[Engine.recommendCandidates]] result: the smallest measured
    * candidate budget meeting the target at the given (tier, probes) —
    * or the `maxCandidates` ceiling with `reachedTarget = false` when
    * the probe budget's recall ceiling sits below the target. */
  case class CandidateAdvice(tier: String, probes: Int, candidates: Int,
      recall: Double, curve: Seq[(Int, Double)], reachedTarget: Boolean)

  /** [[Engine.adviseRerankFrontier]] result: the smallest measured
    * (probes, candidates) pair meeting the target on the rerank tier,
    * every (probes, candidates, recall) point measured on the way, and
    * whether any pair reached the target at all. */
  case class RerankFrontier(probes: Int, candidates: Int, recall: Double,
      frontier: Seq[(Int, Int, Double)], reachedTarget: Boolean)

  /** [[Engine.adviseProbes]]' sidecar payload: the measured advice plus
    * everything needed to (a) reproduce the measurement and (b) detect
    * staleness (the source's file-listing stamp at measure time). */
  case class PersistedProbeAdvice(advice: ProbeAdvice, source: String,
      column: String, idCol: String, k: Int, targetRecall: Double,
      sampleQueries: Int, sourceStamp: String) {
    def toJson: String = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val o = m.createObjectNode()
      o.put("source", source); o.put("column", column)
      o.put("idCol", idCol); o.put("k", k)
      o.put("targetRecall", targetRecall)
      o.put("sampleQueries", sampleQueries)
      o.put("sourceStamp", sourceStamp)
      o.put("probes", advice.probes); o.put("recall", advice.recall)
      o.put("numCells", advice.numCells)
      val arr = o.putArray("curve")
      advice.curve.foreach { case (p, r) =>
        val e = arr.addObject(); e.put("probes", p); e.put("recall", r)
      }
      m.writeValueAsString(o)
    }
  }

  /** [[Engine.adviseCandidates]]' sidecar payload — the candidate-budget
    * analogue of [[PersistedProbeAdvice]] (tier and probes live inside
    * the advice; the sidecar is keyed by them too). */
  case class PersistedCandidateAdvice(advice: CandidateAdvice,
      source: String, column: String, idCol: String, k: Int,
      targetRecall: Double, sampleQueries: Int, maxCandidates: Int,
      sourceStamp: String) {
    def toJson: String = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val o = m.createObjectNode()
      o.put("source", source); o.put("column", column)
      o.put("idCol", idCol); o.put("k", k)
      o.put("targetRecall", targetRecall)
      o.put("sampleQueries", sampleQueries)
      o.put("maxCandidates", maxCandidates)
      o.put("sourceStamp", sourceStamp)
      o.put("tier", advice.tier); o.put("probes", advice.probes)
      o.put("candidates", advice.candidates)
      o.put("recall", advice.recall)
      o.put("reachedTarget", advice.reachedTarget)
      val arr = o.putArray("curve")
      advice.curve.foreach { case (c, r) =>
        val e = arr.addObject(); e.put("candidates", c); e.put("recall", r)
      }
      m.writeValueAsString(o)
    }
  }

  object PersistedCandidateAdvice {
    def fromJson(s: String): PersistedCandidateAdvice = {
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      import scala.jdk.CollectionConverters._
      val curve = n.get("curve").elements().asScala
        .map(e => (e.get("candidates").asInt(), e.get("recall").asDouble()))
        .toList
      PersistedCandidateAdvice(
        CandidateAdvice(n.get("tier").asText(), n.get("probes").asInt(),
          n.get("candidates").asInt(), n.get("recall").asDouble(), curve,
          n.get("reachedTarget").asBoolean()),
        n.get("source").asText(), n.get("column").asText(),
        n.get("idCol").asText(), n.get("k").asInt(),
        n.get("targetRecall").asDouble(), n.get("sampleQueries").asInt(),
        n.get("maxCandidates").asInt(), n.get("sourceStamp").asText())
    }
  }

  object PersistedProbeAdvice {
    def fromJson(s: String): PersistedProbeAdvice = {
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      import scala.jdk.CollectionConverters._
      val curve = n.get("curve").elements().asScala
        .map(e => (e.get("probes").asInt(), e.get("recall").asDouble()))
        .toList
      PersistedProbeAdvice(
        ProbeAdvice(n.get("probes").asInt(), n.get("recall").asDouble(),
          curve, n.get("numCells").asInt()),
        n.get("source").asText(), n.get("column").asText(),
        n.get("idCol").asText(), n.get("k").asInt(),
        n.get("targetRecall").asDouble(), n.get("sampleQueries").asInt(),
        n.get("sourceStamp").asText())
    }
  }
}
