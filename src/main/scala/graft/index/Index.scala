package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.api.Search
import graft.coder.Coding
import graft.functions.functions.vector_distance
import graft.store.Store

/** IVF-style index: a cell-partitioned materialization of the source.
  *
  * Capability parity with the reference index
  * (`/root/reference/src/fenix/io/index/index.py:37-65` build,
  * `index.py:81-170` search) re-shaped for Spark: instead of a
  * positionally-joined `__CODED_ID__` sidecar (impossible without stable
  * row order), the table is rewritten Parquet-partitioned by cell id.
  * A probed search then becomes `filter(__CODED_ID__ isin cells)` which
  * Catalyst turns into *partition pruning* — only ~probes/k^n of the data
  * is read, which is exactly the IVF scan-fraction contract, and it
  * composes with pushed-down user predicates for free.
  */
object Index {
  val CodeCol: String = Search.CodeCol

  /** Cell assignment as a UDF over the vector column (the k=1 coder UDF,
    * `coder.py:83-89`). Centroids ride the closure (tiny: n·k·d doubles). */
  def assignUdf(coding: Coding): UserDefinedFunction =
    udf((v: Seq[Double]) => Option(v).map(x => coding.assign(x.toArray)))

  /** Cell assignment as a codegen'd native expression (the hot path —
    * reads float arrays in place, no boxing/casting). */
  def assignExpr(vec: Column, coding: Coding): Column =
    org.apache.spark.sql.GraftShims.column(
      graft.functions.CellAssign(
        org.apache.spark.sql.GraftShims.expression(vec), coding))

  /** Source-file provenance column stored in the plain IVF copy: the
    * source parquet file each indexed row came from (`_metadata.file_name`
    * at build/sync time). Stripped by [[load]]; consumed by [[repair]],
    * which uses it to rewrite only the cells touched by changed files. */
  val SrcFileCol: String = "__SRC_FILE__"

  /** Build (or rebuild) the index for `source.column` under `codingName` —
    * reference `make-index` / `sync_index` (A2). One distributed pass. */
  def build(store: Store, codingName: String, source: String, column: String): Unit = {
    val coding = store.loadCoding(codingName)
    // listing + stamp BEFORE reading: a concurrent source change mid-build
    // then leaves a stale stamp (conservative — freshness check fails)
    // rather than a wrongly-fresh one
    val listing = store.sourceListing(source)
    val df = store.loadTable(source)
    // Cluster rows by cell before the partitioned write: without this every
    // task writes a file into every cell directory (tasks × cells tiny
    // files); with it each cell is one task's output. Hash-repartition on
    // the cell id keeps it one shuffle, sized to the cell count.
    val parts = math.max(1, math.min(coding.numCells,
      df.sparkSession.sparkContext.defaultParallelism.toLong * 2).toInt)
    val path = store.indexPath(source, column, codingName)
    df.withColumn(SrcFileCol, col("_metadata.file_name"))
      .withColumn(CodeCol, assignExpr(col(column), coding))
      .repartition(parts, col(CodeCol))
      .write.mode("overwrite")
      .partitionBy(CodeCol)
      .parquet(path)
    recordSourceStamp(store, path, listing)
    warnIfSkewed(store, codingName, source, column)
  }

  private def stampSidecar(path: String) = s"$path/_source_stamp.json"

  /** The sidecar records both the MD5 stamp and the full (name:len:mtime)
    * listing it hashes — sync needs the listing to prove growth was
    * append-only before re-stamping, and [[repair]] diffs it to find
    * WHICH files changed. */
  private[graft] def recordSourceStamp(store: Store, indexPath: String,
      listing: Seq[String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val payload = mapper.createObjectNode()
    payload.put("stamp", store.stampOf(listing))
    val arr = payload.putArray("files")
    listing.foreach(arr.add)
    store.writeSidecar(stampSidecar(indexPath), mapper.writeValueAsBytes(payload))
  }

  /** The recorded source listing, if the sidecar carries one (indexes
    * stamped before the listing field report None). */
  private[graft] def recordedListing(store: Store, indexPath: String): Option[Seq[String]] = {
    val sc = stampSidecar(indexPath)
    if (!store.sidecarExists(sc)) return None
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(store.readSidecar(sc))
    Option(n.get("files")).map { files =>
      (0 until files.size()).map(i => files.get(i).asText())
    }
  }

  private[graft] def recordedStamp(store: Store, indexPath: String): Option[String] = {
    val sc = stampSidecar(indexPath)
    if (!store.sidecarExists(sc)) return None
    Option(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(store.readSidecar(sc)).get("stamp")).map(_.asText())
  }

  /** Whether the materialized index copy exists AND was built/synced from
    * the CURRENT content of `source` (the stamp recorded at build/sync
    * time matches the source's file-listing stamp now — catches
    * same-row-count rewrites that count-equality checks miss). Indexes
    * predating the stamp sidecar report not-fresh. */
  def indexFresh(store: Store, codingName: String, source: String,
      column: String): Boolean =
    indexExists(store, codingName, source, column) &&
      recordedStamp(store, store.indexPath(source, column, codingName))
        .contains(store.sourceStamp(source))

  /** Tier-generalized [[indexFresh]]: whether the `tier` copy
    * (ivf | pq | sq | bq) exists and was built/synced from the CURRENT
    * source content. Every tier build records the source file-listing
    * stamp and every tier sync re-stamps only on verifiably append-only
    * growth, so an in-place source rewrite makes ALL tiers report
    * not-fresh (tier copies predating their stamp also report
    * not-fresh — rebuild to adopt). */
  def tierFresh(store: Store, codingName: String, source: String,
      column: String, tier: String = "ivf"): Boolean = {
    val path = tierPath(store, codingName, source, column, tier)
    store.sidecarExists(s"$path/_SUCCESS") &&
      recordedStamp(store, path).contains(store.sourceStamp(source))
  }

  /** Incremental sync: assign + append only the source rows whose `idCol`
    * is not yet indexed (the reference's `sync_index` reassigns the whole
    * table every time, `flight.py:219-233`). One anti-join + one narrow
    * assignment pass over the delta; appended files land in their cell
    * partitions. Returns the number of rows appended.
    *
    * The stamp is refreshed only when growth is VERIFIABLY append-only:
    * every file entry recorded at the last build/sync must still be
    * present, unchanged, in the current listing. A rewrite that modifies
    * existing rows AND adds new ids appends the new rows but leaves the
    * stamp stale (the anti-join cannot repair modified rows) — recover
    * with [[repair]]. */
  def syncIncremental(store: Store, codingName: String, source: String,
      column: String, idCol: String): Long = {
    val path = store.indexPath(source, column, codingName)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(store.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
      build(store, codingName, source, column)
      return store.spark.read.parquet(path).count()
    }
    val coding = store.loadCoding(codingName)
    val listing = store.sourceListing(source)
    val existingDf = store.spark.read.parquet(path)
    val existing = existingDf.select(col(idCol))
    val hasProvenance = existingDf.schema.fieldNames.contains(SrcFileCol)
    val src0 = store.loadTable(source)
    // legacy indexes (no provenance column) append without it — a mixed
    // schema would make the parquet read schema file-order-dependent
    val src = if (hasProvenance)
      src0.withColumn(SrcFileCol, col("_metadata.file_name"))
    else src0
    val fresh = src.join(existing, Seq(idCol), "left_anti")
    val delta = fresh.withColumn(CodeCol, assignExpr(col(column), coding))
    // the delta is bounded by the append size, so persist it: count +
    // write would otherwise run the anti-join + assignment twice
    delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val appended = delta.count()
      if (appended > 0) {
        delta.write.mode("append").partitionBy(CodeCol).parquet(path)
        // re-stamp ONLY for verifiably append-only growth: the recorded
        // listing must be a subset of the current one. Otherwise (files
        // modified or removed alongside the append) the indexed copy
        // still serves stale vectors for the modified rows, so freshness
        // must keep failing until repair()/build()
        val curSet = listing.toSet
        if (recordedListing(store, path).exists(_.forall(curSet.contains)))
          recordSourceStamp(store, path, listing)
        warnIfSkewed(store, codingName, source, column)
      }
      appended
    } finally delta.unpersist(blocking = false)
  }

  /** Outcome of a [[repair]]: which files were re-ingested / dropped and
    * how many cell partitions were rewritten (`fullRebuild` marks the
    * legacy-index fallback where file-scoped repair was impossible). */
  case class RepairStats(filesChanged: Long, cellsRewritten: Long,
      fullRebuild: Boolean)

  /** Cell-scoped repair after in-place source modifications or deletions —
    * the recovery path [[syncIncremental]] cannot provide (its anti-join
    * only sees NEW ids). Diffs the recorded per-file listing against the
    * current one, drops indexed rows originating from changed/removed
    * files, re-ingests rows from changed/added files, and rewrites ONLY
    * the affected cell partitions (ghost rows from deleted files are
    * removed too). At 100 TB a one-file rewrite costs one file's worth of
    * re-assignment plus a few cell directories — not a full re-index.
    *
    * Indexes built before the provenance column / listing sidecar fall
    * back to a full [[build]] (flagged in the returned stats). Repairs
    * only the plain IVF copy; PQ/SQ8 copies of the same source keep their
    * own stamps and need their own rebuild if stale. */
  def repair(store: Store, codingName: String, source: String,
      column: String): RepairStats = {
    val path = store.indexPath(source, column, codingName)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(store.spark.sparkContext.hadoopConfiguration)
    def fullRebuild(): RepairStats = {
      build(store, codingName, source, column)
      RepairStats(-1, -1, fullRebuild = true)
    }
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) return fullRebuild()
    val recordedOpt = recordedListing(store, path)
    val indexedRaw = store.spark.read.parquet(path)
      .withColumn(CodeCol, col(CodeCol).cast("long"))
    if (recordedOpt.isEmpty || !indexedRaw.schema.fieldNames.contains(SrcFileCol))
      return fullRebuild()

    // entry = "name:len:mtime" (parquet part names never contain ':';
    // strip the two trailing fields defensively anyway)
    def nameOf(e: String): String =
      e.substring(0, e.lastIndexOf(':', e.lastIndexOf(':') - 1))
    val recorded = recordedOpt.get
    val listing = store.sourceListing(source)
    val curSet = listing.toSet
    val recSet = recorded.toSet
    // recorded entries no longer exactly present: modified or removed
    val staleNames = recorded.filterNot(curSet.contains).map(nameOf).distinct
    // current entries not recorded: added, or the new face of a modified
    // file, or files appended by a sync that could not re-stamp
    val freshNames = listing.filterNot(recSet.contains).map(nameOf).distinct
    if (staleNames.isEmpty && freshNames.isEmpty) {
      recordSourceStamp(store, path, listing) // already consistent
      return RepairStats(0, 0, fullRebuild = false)
    }
    val affectedNames = (staleNames ++ freshNames).distinct
    val coding = store.loadCoding(codingName)
    val freshRows = store.loadTable(source)
      .withColumn(SrcFileCol, col("_metadata.file_name"))
      .filter(col(SrcFileCol).isin(freshNames: _*))
      .withColumn(CodeCol, assignExpr(col(column), coding))
    // affected cells: wherever a stale file's rows sit, plus wherever a
    // fresh file's rows land — two small distinct-collects, bounded by
    // numCells
    val staleCells =
      if (staleNames.isEmpty) Array.empty[Long]
      else indexedRaw.filter(col(SrcFileCol).isin(staleNames: _*))
        .select(CodeCol).distinct().collect().map(_.getLong(0))
    val freshCells = freshRows
      .select(CodeCol).distinct().collect().map(_.getLong(0))
    val affected = (staleCells ++ freshCells).distinct.sorted
    if (affected.isEmpty) {
      recordSourceStamp(store, path, listing) // e.g. an empty file removed
      return RepairStats(affectedNames.length.toLong, 0, fullRebuild = false)
    }
    // replacement content for the affected cells: surviving rows from
    // untouched files + re-assigned rows from changed/added files. It
    // READS the directories about to be deleted, so it must land on disk
    // (a temp sibling) before any delete — a cache could be evicted and
    // recompute over deleted files
    val replacement = indexedRaw
      .filter(col(CodeCol).isin(affected.toIndexedSeq: _*))
      .filter(!col(SrcFileCol).isin(affectedNames: _*))
      .unionByName(freshRows)
    val tmp = s"$path.__repair_tmp__"
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    val parts = math.max(1, math.min(affected.length.toLong,
      store.spark.sparkContext.defaultParallelism.toLong * 2).toInt)
    replacement.repartition(parts, col(CodeCol))
      .write.mode("overwrite").partitionBy(CodeCol).parquet(tmp)
    // swap in the rewritten cells one directory at a time; a crash
    // mid-swap leaves a stale stamp (the sidecar is written LAST), so
    // freshness keeps failing rather than lying
    affected.foreach { cell =>
      val dst = new org.apache.hadoop.fs.Path(s"$path/$CodeCol=$cell")
      val srcP = new org.apache.hadoop.fs.Path(s"$tmp/$CodeCol=$cell")
      fs.delete(dst, true)
      if (fs.exists(srcP))
        require(fs.rename(srcP, dst), s"repair: rename failed for cell $cell")
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    recordSourceStamp(store, path, listing)
    RepairStats(affectedNames.length.toLong, affected.length.toLong,
      fullRebuild = false)
  }

  /** [[repair]] for the quantized tiers (pq | sq | bq): same
    * listing-diff → reassign-changed-files → rewrite-affected-cells
    * machinery, with the fresh rows re-ENCODED under the tier's stored
    * codecs (codebooks / affine params / sign thresholds — repair never
    * re-fits; a shifted value distribution is a rebuild decision, not a
    * repair). Tier copies predating the provenance column or the
    * listing stamp fall back to a full rebuild UNDER THE STORED CONFIG
    * (per-cell mode, PQ m/k/metric/residual — preserved from the
    * sidecar). At 100 TB a one-file rewrite costs one file's worth of
    * re-encode plus a few cell directories per tier — not four full
    * re-indexes. */
  def repairTier(store: Store, codingName: String, source: String,
      column: String, tier: String): RepairStats = {
    require(Set("pq", "sq", "bq")(tier),
      s"repairTier handles pq | sq | bq (plain ivf goes through repair), got '$tier'")
    val path = tierPath(store, codingName, source, column, tier)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(store.spark.sparkContext.hadoopConfiguration)
    val coding = store.loadCoding(codingName)
    def rebuild(): RepairStats = {
      tier match {
        case "sq" =>
          val perCell = scala.util.Try(
            loadSqParams(store, codingName, source, column).perCell).getOrElse(false)
          buildSq(store, codingName, source, column, perCell)
        case "bq" =>
          val perCell = scala.util.Try(
            loadBqParams(store, codingName, source, column).perCell).getOrElse(false)
          buildBq(store, codingName, source, column, perCell)
        case "pq" =>
          val cb = loadPqCodebooks(store, codingName, source, column)
          buildPq(store, codingName, source, column, cb.config, cb.residual)
      }
      RepairStats(-1, -1, fullRebuild = true)
    }
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) return rebuild()
    val recordedOpt = recordedListing(store, path)
    val indexedRaw = store.spark.read.parquet(path)
      .withColumn(CodeCol, col(CodeCol).cast("long"))
    if (recordedOpt.isEmpty || !indexedRaw.schema.fieldNames.contains(SrcFileCol))
      return rebuild()

    def nameOf(e: String): String =
      e.substring(0, e.lastIndexOf(':', e.lastIndexOf(':') - 1))
    val recorded = recordedOpt.get
    val listing = store.sourceListing(source)
    val curSet = listing.toSet
    val recSet = recorded.toSet
    val staleNames = recorded.filterNot(curSet.contains).map(nameOf).distinct
    val freshNames = listing.filterNot(recSet.contains).map(nameOf).distinct
    if (staleNames.isEmpty && freshNames.isEmpty) {
      recordSourceStamp(store, path, listing)
      return RepairStats(0, 0, fullRebuild = false)
    }
    val affectedNames = (staleNames ++ freshNames).distinct
    val assigned = store.loadTable(source)
      .withColumn(SrcFileCol, col("_metadata.file_name"))
      .filter(col(SrcFileCol).isin(freshNames: _*))
      .withColumn(CodeCol, assignExpr(col(column), coding))
    // tier-specific re-encode of the fresh rows under STORED codecs
    val freshRows: DataFrame = tier match {
      case "sq" =>
        val params = loadSqParams(store, codingName, source, column)
        assigned.withColumn(SqCol,
          quantizeSetCol(col(column), col(CodeCol), params))
      case "bq" =>
        val params = loadBqParams(store, codingName, source, column)
        assigned.withColumn(BqCol,
          packSignBitsSetCol(col(column), col(CodeCol), params))
      case "pq" =>
        val cb = loadPqCodebooks(store, codingName, source, column)
        if (!cb.residual)
          assigned.withColumn(PqCol, graft.coder.PQ.encodeExpr(col(column), cb))
        else {
          val fb = residualFallbackAnchor(cb, coding)
          val full: Map[Long, Array[Double]] = (0L until coding.numCells)
            .map(c => c -> cb.anchors.getOrElse(c, fb(c))).toMap
          withResidualBase(assigned, column, cb.canonicalMetric)
            .withColumn("__RES__",
              graft.coder.PQ.residualExpr(col(ResBase), col(CodeCol), full))
            .withColumn(PqCol, graft.coder.PQ.encodeExpr(col("__RES__"), cb))
            .drop("__RES__", ResBase)
        }
    }
    val staleCells =
      if (staleNames.isEmpty) Array.empty[Long]
      else indexedRaw.filter(col(SrcFileCol).isin(staleNames: _*))
        .select(CodeCol).distinct().collect().map(_.getLong(0))
    val freshCells = freshRows
      .select(CodeCol).distinct().collect().map(_.getLong(0))
    val affected = (staleCells ++ freshCells).distinct.sorted
    if (affected.isEmpty) {
      recordSourceStamp(store, path, listing)
      return RepairStats(affectedNames.length.toLong, 0, fullRebuild = false)
    }
    // replacement reads the directories about to be deleted → must land
    // on a temp sibling before any delete (as [[repair]])
    val replacement = indexedRaw
      .filter(col(CodeCol).isin(affected.toIndexedSeq: _*))
      .filter(!col(SrcFileCol).isin(affectedNames: _*))
      .unionByName(freshRows)
    val tmp = s"$path.__repair_tmp__"
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    val parts = math.max(1, math.min(affected.length.toLong,
      store.spark.sparkContext.defaultParallelism.toLong * 2).toInt)
    replacement.repartition(parts, col(CodeCol))
      .write.mode("overwrite").partitionBy(CodeCol).parquet(tmp)
    affected.foreach { cell =>
      val dst = new org.apache.hadoop.fs.Path(s"$path/$CodeCol=$cell")
      val srcP = new org.apache.hadoop.fs.Path(s"$tmp/$CodeCol=$cell")
      fs.delete(dst, true)
      if (fs.exists(srcP))
        require(fs.rename(srcP, dst), s"repairTier: rename failed for cell $cell")
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    recordSourceStamp(store, path, listing)
    RepairStats(affectedNames.length.toLong, affected.length.toLong,
      fullRebuild = false)
  }

  /** Per-cell layout statistics of the IVF copy: (cell, files, bytes,
    * rows = −1 unless `withRows`). The ops view for skew and
    * fragmentation — incremental sync appends one file set per
    * micro-batch, so long-running streams fragment cell partitions until
    * scan task overhead dominates; a cell holding a disproportionate
    * byte share signals coder imbalance (retrain or raise probes). Pure
    * file-listing driver work unless row counts are requested. */
  def cellStats(store: Store, codingName: String, source: String,
      column: String, withRows: Boolean = false,
      tier: String = "ivf"): Seq[(Long, Int, Long, Long)] = {
    val path = tierPath(store, codingName, source, column, tier)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(store.spark.sparkContext.hadoopConfiguration)
    val prefix = s"$CodeCol="
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
    val rowsByCell: Map[Long, Long] =
      if (!withRows) Map.empty
      else store.spark.read.parquet(path)
        .groupBy(col(CodeCol).cast("long")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    dirs.map { d =>
      val cell = d.getPath.getName.stripPrefix(prefix).toLong
      val files = fs.listStatus(d.getPath)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
      (cell, files.length, files.map(_.getLen).sum,
        rowsByCell.getOrElse(cell, -1L))
    }.toSeq.sortBy(_._1)
  }

  /** Outcome of a [[compactCells]] pass. */
  case class CompactStats(cellsCompacted: Long, filesBefore: Long,
      filesAfter: Long)

  /** Byte-share skew of a tier's cell layout. `ratio` = max cell bytes /
    * median cell bytes; `maxShare` = max cell bytes / total bytes. */
  case class SkewStats(cells: Int, maxCell: Long, maxBytes: Long,
      medianBytes: Long, ratio: Double, maxShare: Double)

  /** Cell-balance report for an index tier — at 100 TB a hot cell turns
    * probed search into a near-scan: a probe that touches the hot cell
    * reads its whole byte share regardless of the probe budget. Driver-
    * only file listing (no job). Remedies for a skewed layout, in order:
    * re-train the coder with more cells (or a fresh seed — a degenerate
    * k-means init can starve centroids), raise `probes` so rank quality
    * stops depending on the one hot cell, or pre-split the hot cell's
    * key range upstream. [[build]] and [[syncIncremental]] print this
    * report loudly when the layout crosses the skew threshold — the
    * build is still usable (every query stays correct; only probed-
    * search SPEED degrades), so it warns rather than throws. */
  def cellSkew(store: Store, codingName: String, source: String,
      column: String, tier: String = "ivf"): SkewStats = {
    val stats = cellStats(store, codingName, source, column, tier = tier)
    require(stats.nonEmpty, s"cellSkew: no cells under $tier index for " +
      s"$source.$column ('$codingName')")
    val bytes = stats.map(_._3).sorted
    val median = math.max(1L, bytes(bytes.length / 2))
    val (maxCell, _, maxBytes, _) = stats.maxBy(_._3)
    val total = math.max(1L, bytes.sum)
    SkewStats(stats.length, maxCell, maxBytes, median,
      maxBytes.toDouble / median, maxBytes.toDouble / total)
  }

  /** Loud skew report after build/sync (threshold: one cell ≥ 16× the
    * median or ≥ half of all bytes, with enough cells for "median" to
    * mean anything). */
  private def warnIfSkewed(store: Store, codingName: String, source: String,
      column: String): Unit = {
    val s = cellSkew(store, codingName, source, column)
    if (s.cells >= 4 && (s.ratio >= 16.0 || s.maxShare >= 0.5))
      System.err.println(f"[graft] SKEWED index layout for $source.$column " +
        f"('$codingName'): cell ${s.maxCell} holds ${s.maxShare * 100}%.1f%% " +
        f"of bytes (${s.ratio}%.1fx the median cell, ${s.cells} cells). " +
        "Probed search degrades toward a scan on the hot cell; re-train " +
        "the coder with more cells/new seed, raise probes, or pre-split " +
        "the hot key range (see Index.cellSkew).")
  }

  /** Cell-partitioned copy path of an index `tier` (ivf | pq | sq | bq) —
    * all four tiers share the `__CODED_ID__=N` partition layout, so the
    * layout tooling ([[cellStats]]/[[compactCells]]) applies uniformly. */
  private def tierPath(store: Store, codingName: String, source: String,
      column: String, tier: String): String = tier match {
    case "ivf" => store.indexPath(source, column, codingName)
    case "pq"  => store.pqIndexPath(source, column, codingName)
    case "sq"  => store.sqIndexPath(source, column, codingName)
    case "bq"  => store.bqIndexPath(source, column, codingName)
    case other => throw new IllegalArgumentException(
      s"tier must be ivf | pq | sq | bq, got '$other'")
  }

  /** Rewrite fragmented cell partitions coalesced — the maintenance step
    * a streaming [[syncIncremental]] workload needs: every micro-batch
    * appends its own file set, so a cell touched by N waves holds ≥ N
    * small files and scan cost becomes task-overhead-bound. Cells with
    * more than `maxFilesPerCell` files are rewritten to ≈
    * max(1, bytes/targetFileBytes) files each (temp sibling + per-cell
    * rename, as [[repair]]).
    *
    * Content is identical, so the recorded source stamp remains VALID —
    * it is snapshotted before the swap and restored verbatim after (NOT
    * refreshed to the current source listing, which may have drifted).
    * Crash discipline is fail-closed: the stamp sidecar is deleted before
    * the first swap, so a crash mid-compaction leaves freshness failing
    * (recover with [[build]]/[[repair]]) instead of serving a cell whose
    * directory vanished between the delete and the rename.
    *
    * `tier` selects which cell-partitioned copy to compact (ivf | pq |
    * sq | bq — all share the layout and, since round 6, the stamp
    * sidecar, so the fail-closed snapshot/restore applies uniformly;
    * the tiers' codec sidecars live at the path root and are never
    * touched since only cell directories are swapped). */
  def compactCells(store: Store, codingName: String, source: String,
      column: String, maxFilesPerCell: Int = 8,
      targetFileBytes: Long = 128L << 20, tier: String = "ivf"): CompactStats = {
    require(maxFilesPerCell >= 1, "maxFilesPerCell must be >= 1")
    val path = tierPath(store, codingName, source, column, tier)
    require(store.sidecarExists(s"$path/_SUCCESS"),
      s"compactCells: no $tier index for $source.$column under '$codingName'")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(store.spark.sparkContext.hadoopConfiguration)
    val stats = cellStats(store, codingName, source, column, tier = tier)
    val frag = stats.filter(_._2 > maxFilesPerCell)
    if (frag.isEmpty) return CompactStats(0, 0, 0)
    val cells = frag.map(_._1)
    val bytes = frag.map(_._3).sum
    val recorded = recordedListing(store, path)
    val tmp = s"$path.__compact_tmp__"
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    val parts = math.max(cells.length.toLong,
      bytes / math.max(1L, targetFileBytes) + 1).toInt
    store.spark.read.parquet(path)
      .withColumn(CodeCol, col(CodeCol).cast("long"))
      .filter(col(CodeCol).isin(cells: _*))
      .repartition(parts, col(CodeCol))
      .write.mode("overwrite").partitionBy(CodeCol).parquet(tmp)
    fs.delete(new org.apache.hadoop.fs.Path(stampSidecar(path)), false)
    cells.foreach { cell =>
      val dst = new org.apache.hadoop.fs.Path(s"$path/$CodeCol=$cell")
      val srcP = new org.apache.hadoop.fs.Path(s"$tmp/$CodeCol=$cell")
      fs.delete(dst, true)
      if (fs.exists(srcP))
        require(fs.rename(srcP, dst), s"compactCells: rename failed for cell $cell")
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    recorded.foreach(l => recordSourceStamp(store, path, l))
    val after = cellStats(store, codingName, source, column, tier = tier)
      .filter(s => cells.contains(s._1)).map(_._2.toLong).sum
    CompactStats(cells.length.toLong, frag.map(_._2.toLong).sum, after)
  }

  /** Whether the materialized indexed copy exists (Spark's _SUCCESS
    * marker: a partial/failed write does not count). */
  def indexExists(store: Store, codingName: String, source: String,
      column: String): Boolean =
    store.sidecarExists(s"${store.indexPath(source, column, codingName)}/_SUCCESS")

  /** Read the indexed copy: source schema ⊕ `__CODED_ID__: long`
    * (reference V7 `index.py:19-34`, minus the positional join). The
    * internal provenance column is stripped — it exists for [[repair]],
    * not for queries. */
  def load(store: Store, codingName: String, source: String, column: String): DataFrame = {
    val df = store.spark.read.parquet(store.indexPath(source, column, codingName))
    // partition-column discovery types the cell id as int; contract says long
    df.withColumn(CodeCol, col(CodeCol).cast("long")).drop(SrcFileCol)
  }

  /** Partition-prune to the probed cells — skipped entirely at full
    * probes, where the IN-SET predicate prunes nothing and would only
    * ship a numCells-element filter in every task (searchRerank's
    * existing behavior, now shared by every probed path). */
  private[graft] def pruneToCells(df: DataFrame, cells: Array[Long],
      numCells: Long): DataFrame =
    if (cells.length >= numCells) df
    else df.filter(col(CodeCol).isin(cells.toIndexedSeq: _*))

  /** Probed top-k search (reference V8 with coding+probes,
    * `index.py:113-126`): rank cells driver-side from the coding, prune to
    * the `probes` nearest cells, then exact distance + top-k inside them.
    * `metric` defaults to the coding's training metric (`index.py:116-117`).
    */
  def searchProbed(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      target: graft.api.TargetVector,
      k: Int,
      probes: Int,
      metric: Option[String] = None,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val coding = store.loadCoding(codingName)
    val m = metric.getOrElse(coding.config.metric)
    val cells = coding.rankCells(target.doubles, probes)
    val indexed = load(store, codingName, source, column)
    val pruned = pruneToCells(indexed, cells, coding.numCells)
    val base = filter.fold(pruned)(pruned.filter)
    val withDist = base.withColumn(Search.DistCol,
      vector_distance(col(column), target.lit, m))
    val projected = select.fold(withDist)(cols =>
      withDist.select((cols :+ Search.DistCol).map(col): _*))
    projected.orderBy(col(Search.DistCol).asc +: tieBreak.map(col(_).asc): _*).limit(k)
  }

  /** Two-stage retrieve-rerank search (IVF-ADC shape: Jégou et al.'s
    * asymmetric distance over the coarse codes, then exact rerank).
    *
    * Stage 1 scores rows by their CELL's additive score — computed from
    * `__CODED_ID__` alone via a broadcast k^n lookup — over a projection
    * of (id, code) ONLY, optionally partition-pruned to the `probes`
    * nearest cells: at 100 TB the coarse TakeOrdered carries a few bytes
    * per row, never the float vectors. Stage 2 broadcast-joins the
    * `candidates` surviving ids back against the (pruned) index and
    * re-scores them exactly on the raw vectors — the same shape as
    * [[searchIvfPq]]. With full probes and `candidates` ≥ the corpus this
    * equals exact search; smaller values trade recall for a bounded
    * rerank set. `idCol` must be unique per row.
    */
  def searchRerank(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      target: graft.api.TargetVector,
      k: Int,
      candidates: Int,
      idCol: String,
      probes: Option[Int] = None,
      metric: Option[String] = None,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val coding = store.loadCoding(codingName)
    val m = metric.getOrElse(coding.config.metric)
    // driver-side k^n score table (capped by CoderConfig.numCells), shipped
    // as a map literal so the rank lookup stays inside codegen (no UDF on
    // the coarse path); cells absent from the coding rank last
    val cells = coding.rankCells(target.doubles,
      probes.getOrElse(coding.numCells.toInt))
    val scoreOfCell: Map[Long, Int] = cells.zipWithIndex.toMap // rank = score order
    val indexed = load(store, codingName, source, column)
    val prunedAll =
      if (cells.length < coding.numCells)
        indexed.filter(col(CodeCol).isin(cells.toIndexedSeq: _*))
      else indexed
    // predicate applies to BOTH passes (pushed into the coarse scan, so
    // the candidate budget is spent on qualifying rows — same contract
    // as searchIvfPq)
    val pruned = filter.fold(prunedAll)(prunedAll.filter)
    val coarseCols = (Seq(idCol, CodeCol) ++ tieBreak).distinct.map(col)
    val coarseIds = pruned
      .select(coarseCols: _*)
      .withColumn("__cell_rank__",
        coalesce(try_element_at(typedLit(scoreOfCell), col(CodeCol)),
          lit(Int.MaxValue)))
      .orderBy(col("__cell_rank__").asc +: tieBreak.map(col(_).asc): _*)
      .limit(candidates)
      .select(idCol)
    val reranked = pruned.join(broadcast(coarseIds), Seq(idCol))
      .withColumn(Search.DistCol,
        vector_distance(col(column), target.lit, m))
    val projected = select.fold(reranked)(cols =>
      reranked.select((cols :+ Search.DistCol).map(col): _*))
    projected
      .orderBy(col(Search.DistCol).asc +: tieBreak.map(col(_).asc): _*)
      .limit(k)
  }

  // ——— IVF+PQ: cell-partitioned layout + per-row PQ codes ———

  /** Codes column name in a PQ index. */
  val PqCol: String = "__PQ__"
  private def pqSidecar(path: String) = s"$path/_pq_codebooks.json"

  /** Build the IVF+PQ index (the Faiss-IVFADC shape, Jégou et al. 2011):
    * the cell-partitioned copy additionally carries an m-byte PQ code per
    * row, so probed search can rank candidates from (id, code) alone —
    * at 100 TB the coarse pass reads ~probes/k^n of the rows AND none of
    * the float vectors. Codebooks land as an underscore-prefixed sidecar
    * (ignored by parquet directory listings) next to the data.
    */
  /** Residual PQ is gated to a bounded cell count (the anchor map literal
    * is numCells·dim doubles, and search ships one ADC table per probed
    * cell). */
  private val ResidualCellCap = 4096L

  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def buildPq(store: Store, codingName: String, source: String, column: String,
      pqConfig: graft.coder.PQ.PQConfig,
      residual: Boolean = true): graft.coder.PQ.PQCodebooks = {
    val coding = store.loadCoding(codingName)
    // listing BEFORE reading (as [[build]]): a concurrent source change
    // mid-build leaves a conservatively-stale stamp
    val listing = store.sourceListing(source)
    val df = store.loadTable(source)
    val metricC = graft.core.Metrics.canonical(pqConfig.metric)
    // Residual mode (IVFADC proper, Jégou et al. §III): PQ codebooks train
    // on x − anchor(cell), spending their resolution on WITHIN-cell
    // structure — flat PQ on cluster-dominated data can separate cells but
    // ranks within a cell at chance (observed: recall collapses as rows/
    // cell grow). All metrics route through it: l2 natively; cosine on the
    // unit sphere (normalize ⇒ cosine is monotone in l2 there); dot via
    // the affine split −q·x = −q·anchor − q·r. The cell cap bounds the
    // anchor map literal — above it the weaker flat variant must be an
    // EXPLICIT choice, not a silent fallback.
    if (residual && coding.numCells > ResidualCellCap)
      throw new IllegalArgumentException(
        s"residual PQ supports codings up to $ResidualCellCap cells (anchor " +
          s"tables are numCells×dim doubles); coding '$codingName' has " +
          s"${coding.numCells}. Pass residual = false to explicitly build " +
          "the flat variant (weaker within-cell ranking on clustered data).")
    val useRes = residual
    val assigned0 = df.withColumn(SrcFileCol, col("_metadata.file_name"))
      .withColumn(CodeCol, assignExpr(col(column), coding))
    // Cosine residuals live on the unit sphere: normalize once (codegen'd
    // built-ins), then anchors/residuals/codebooks all operate in the
    // space where l2 ranking is monotone-equivalent to cosine distance.
    val assigned =
      if (!useRes) assigned0
      else withResidualBase(assigned0, column, metricC)
    // Anchors = EMPIRICAL per-cell means — the codebook-derived anchor is
    // a poor cell representative under this engine's additive-codebook
    // coarse quantizer, and residual resolution is only as good as the
    // anchor. One map-side-combined vector-sum agg (VecSumAgg): only
    // numCells (sum, count) rows shuffle; the anchor pass + the encode
    // pass below are two corpus scans by design (anchors must exist
    // before codes can be encoded; a 100 TB corpus can't be cached).
    val anchors: Map[Long, Array[Double]] =
      if (!useRes) Map.empty
      else {
        val vecSum = udaf(graft.coder.VecSumAgg)
        assigned
          .select(col(CodeCol), col(ResBase).as("__v__"))
          .groupBy(col(CodeCol))
          .agg(vecSum(col("__v__")).as("s"), count(col("__v__")).as("n"))
          .collect()
          .map { r =>
            val s = r.getSeq[Double](1); val n = r.getLong(2)
            r.getLong(0) -> s.map(_ / n).toArray
          }.toMap
      }
    val encodeInput =
      if (useRes)
        assigned.withColumn("__RES__",
          graft.coder.PQ.residualExpr(col(ResBase), col(CodeCol), anchors))
      else assigned
    // Residual codebooks must NOT re-normalize their input (the residual
    // is already in the right space), so train under l2 and restore the
    // user metric on the returned codebooks — training only uses the
    // metric for the cosine normalization decision.
    val cb0 = graft.coder.PQ.train(encodeInput,
      if (useRes) "__RES__" else column,
      if (useRes) pqConfig.copy(metric = "l2") else pqConfig)
    val cb = cb0.copy(config = cb0.config.copy(metric = pqConfig.metric),
      residual = useRes, anchors = anchors)
    log.info(s"buildPq($source.$column under $codingName): " +
      s"variant=${if (useRes) "residual" else "flat"} metric=$metricC " +
      s"cells=${coding.numCells} m=${cb.m} k=${cb.k}")
    val parts = math.max(1, math.min(coding.numCells,
      df.sparkSession.sparkContext.defaultParallelism.toLong * 2).toInt)
    val path = store.pqIndexPath(source, column, codingName)
    encodeInput
      .withColumn(PqCol, graft.coder.PQ.encodeExpr(
        col(if (useRes) "__RES__" else column), cb))
      .drop("__RES__", ResBase)
      .repartition(parts, col(CodeCol))
      .write.mode("overwrite")
      .partitionBy(CodeCol)
      .parquet(path)
    store.writeSidecar(pqSidecar(path), graft.coder.PQ.toJsonBytes(cb))
    recordSourceStamp(store, path, listing)
    cb
  }

  /** Anchor for a cell absent from the build-time empirical means: the
    * coding's centroid-mean anchor, projected onto the unit sphere for
    * cosine (residual space is the normalized one). Deterministic and
    * derivable at both encode (incremental sync) and search time, so the
    * two always agree. */
  private def residualFallbackAnchor(cb: graft.coder.PQ.PQCodebooks,
      coding: Coding): Long => Array[Double] =
    if (cb.canonicalMetric == "cosine")
      c => graft.core.Metrics.normalize(coding.anchor(c))
    else coding.anchor

  private val ResBase = "__RESBASE__"

  /** Adds the column residuals are computed from: raw doubles for
    * l2/dot, the unit sphere for cosine (zero vectors pass through,
    * matching `Metrics.normalize` / `PQCodebooks.maybeNormalize`). */
  private def withResidualBase(df: DataFrame, column: String,
      metricC: String): DataFrame =
    if (metricC != "cosine")
      df.withColumn(ResBase, col(column).cast("array<double>"))
    else graft.functions.functions.withUnitNormalized(df, col(column), ResBase)

  /** Incremental PQ sync: encode-only append of the source rows whose
    * `idCol` is not yet in the PQ index, under the STORED codebooks — no
    * retraining, mirroring [[syncIncremental]] for the plain IVF copy
    * (reference `sync_index` re-assigns after new data,
    * `flight.py:219-233`). Residual indexes encode new rows against the
    * build-time empirical anchors; rows landing in cells the build never
    * saw use the deterministic fallback anchor — the SAME one
    * [[searchIvfPq]] builds its ADC table from, so codes and search
    * tables always agree. Refuses when the index doesn't exist or when
    * `expect` names a different PQ layout than the stored one. Returns
    * the number of rows appended. */
  def syncIncrementalPq(store: Store, codingName: String, source: String,
      column: String, idCol: String,
      expect: Option[graft.coder.PQ.PQConfig] = None): Long = {
    val path = store.pqIndexPath(source, column, codingName)
    require(store.sidecarExists(pqSidecar(path)),
      s"no PQ index for $source.$column under coding '$codingName' — " +
        "build it first (buildPq)")
    val cb = loadPqCodebooks(store, codingName, source, column)
    expect.foreach { e =>
      require(e.numSubspaces == cb.config.numSubspaces &&
          graft.core.Metrics.canonical(e.metric) == cb.canonicalMetric &&
          e.codebookSize >= cb.config.codebookSize,
        s"PQ config mismatch: stored index has m=${cb.config.numSubspaces} " +
          s"k=${cb.config.codebookSize} metric=${cb.canonicalMetric}; " +
          s"requested m=${e.numSubspaces} k=${e.codebookSize} " +
          s"metric=${graft.core.Metrics.canonical(e.metric)} — rebuild with buildPq")
    }
    val coding = store.loadCoding(codingName)
    val existingDf = store.spark.read.parquet(path)
    val existing = existingDf.select(col(idCol))
    // legacy copies (no provenance column) append without it — a mixed
    // schema would make the parquet read file-order-dependent
    val src0 = store.loadTable(source)
    val src = if (existingDf.schema.fieldNames.contains(SrcFileCol))
      src0.withColumn(SrcFileCol, col("_metadata.file_name"))
    else src0
    val fresh = src.join(existing, Seq(idCol), "left_anti")
    val assigned = fresh.withColumn(CodeCol, assignExpr(col(column), coding))
    val delta =
      if (!cb.residual)
        assigned.withColumn(PqCol,
          graft.coder.PQ.encodeExpr(col(column), cb))
      else {
        // anchors for EVERY possible cell (stored empirical mean, else the
        // deterministic fallback); numCells is ≤ the residual cap by build
        val fb = residualFallbackAnchor(cb, coding)
        val full: Map[Long, Array[Double]] = (0L until coding.numCells)
          .map(c => c -> cb.anchors.getOrElse(c, fb(c))).toMap
        withResidualBase(assigned, column, cb.canonicalMetric)
          .withColumn("__RES__",
            graft.coder.PQ.residualExpr(col(ResBase), col(CodeCol), full))
          .withColumn(PqCol, graft.coder.PQ.encodeExpr(col("__RES__"), cb))
          .drop("__RES__", ResBase)
      }
    // persist the (append-sized) delta: count + write would otherwise run
    // the anti-join + assignment + normalize + residual + encode twice
    delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val appended = delta.count()
      if (appended > 0) {
        delta.write.mode("append").partitionBy(CodeCol).parquet(path)
        // re-stamp ONLY for verifiably append-only growth (the
        // [[syncIncremental]] rule): a rewrite that also modified
        // existing files must keep freshness failing
        val curSet = store.sourceListing(source).toSet
        if (recordedListing(store, path).exists(_.forall(curSet.contains)))
          recordSourceStamp(store, path, store.sourceListing(source))
      }
      appended
    } finally delta.unpersist(blocking = false)
  }

  def pqIndexExists(store: Store, codingName: String, source: String, column: String): Boolean =
    store.sidecarExists(pqSidecar(store.pqIndexPath(source, column, codingName)))

  def loadPqCodebooks(store: Store, codingName: String, source: String,
      column: String): graft.coder.PQ.PQCodebooks =
    graft.coder.PQ.fromJsonBytes(
      store.readSidecar(pqSidecar(store.pqIndexPath(source, column, codingName))))

  def loadPq(store: Store, codingName: String, source: String, column: String): DataFrame = {
    val df = store.spark.read.parquet(store.pqIndexPath(source, column, codingName))
    df.withColumn(CodeCol, col(CodeCol).cast("long")).drop(SrcFileCol)
  }

  /** Probed IVF+PQ search, two distributed passes:
    *   1. coarse: partition-pruned scan of (idCol, code) only — ADC ranks
    *      every surviving row via m byte-indexed table lookups, keeps the
    *      best `candidates` ids (TakeOrdered, no full sort);
    *   2. rerank: broadcast-semi-join those ids back against the same
    *      pruned partitions and score exactly on the raw vectors.
    * With probes = numCells and `candidates` ≥ the corpus this is exact
    * (the oracle contract); bounded budgets give the classic IVFADC
    * recall/scan-fraction trade. `idCol` must be unique per row.
    * `metric` must equal the PQ codebooks' training metric (the ADC table
    * is only meaningful under it); the IVF coding may differ.
    */
  def searchIvfPq(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      target: graft.api.TargetVector,
      k: Int,
      probes: Int,
      candidates: Int,
      idCol: String,
      metric: Option[String] = None,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val coding = store.loadCoding(codingName)
    val cb = loadPqCodebooks(store, codingName, source, column)
    val m = graft.core.Metrics.canonical(metric.getOrElse(cb.canonicalMetric))
    require(m == cb.canonicalMetric,
      s"metric '$m' does not match the PQ codebooks' training metric " +
        s"'${cb.canonicalMetric}' — rebuild the PQ index under '$m'")
    val cells = coding.rankCells(target.doubles, probes)
    val prunedAll = pruneToCells(loadPq(store, codingName, source, column),
      cells, coding.numCells)
    // the predicate applies to BOTH passes (pushed into the coarse scan,
    // so the candidate budget is spent on qualifying rows only)
    val pruned = filter.fold(prunedAll)(prunedAll.filter)
    // residual codebooks score against per-cell query tables (IVFADC);
    // flat codebooks use the single-table ADC. The fallback anchor (cells
    // the build never saw) must match what an encode of a new row in that
    // cell would use — see residualFallbackAnchor.
    val adc =
      if (cb.residual)
        graft.coder.PQ.adcScoreCellsExpr(col(PqCol), col(CodeCol), cb,
          target.doubles, cells, residualFallbackAnchor(cb, coding))
      else graft.coder.PQ.adcScoreExpr(col(PqCol), cb, target.doubles)
    val coarseIds = pruned
      .select(col(idCol), col(PqCol), col(CodeCol))
      .withColumn("__ADC__", adc)
      .orderBy(col("__ADC__").asc, col(idCol).asc)
      .limit(candidates)
      .select(idCol)
    val reranked = pruned.join(broadcast(coarseIds), Seq(idCol))
      .withColumn(Search.DistCol, vector_distance(col(column), target.lit, m))
      .drop(PqCol)
    val projected = select.fold(reranked)(cols =>
      reranked.select((cols :+ Search.DistCol).map(col): _*))
    projected
      .orderBy(col(Search.DistCol).asc +: tieBreak.map(col(_).asc): _*)
      .limit(k)
  }

  // ——— IVF+SQ8: cell-partitioned layout + 8-bit scalar-quantized vectors ———

  /** Codes column in an SQ8 index (one uint8 per dimension). */
  val SqCol: String = "__SQ__"
  private def sqSidecar(path: String) = s"$path/_sq_params.json"

  /** The SQ8 index's affine params: one (scale, zeroPoint) pair PER
    * DIMENSION — the standard scalar-quantizer formulation. A single
    * global pair collapses resolution for every dimension when one
    * outlier element lands anywhere in the corpus; per-dimension fitting
    * costs the same single agg pass. */
  case class SqParams(scales: Array[Float], zeroPoints: Array[Float]) {
    def dim: Int = scales.length
  }

  /** The full affine parameter set of an SQ8 index: the shared per-dim
    * params, plus (opt-in, [[buildSq]] `perCell = true`) one params block
    * PER CELL keyed by `__CODED_ID__` — the SemDeDup setting, where
    * heterogeneous clusters have disjoint per-dimension ranges and one
    * shared range wastes the 8-bit resolution on between-cluster spread.
    * `global` doubles as the fallback for cells the build never saw. */
  case class SqParamsSet(global: SqParams, cells: Map[Long, SqParams] = Map.empty) {
    def perCell: Boolean = cells.nonEmpty
    /** (sorted cells, flat scales, flat zps) with the global block LAST —
      * the layout [[graft.functions.QuantizePerCellDim]] binary-searches. */
    def flat: (IndexedSeq[Long], IndexedSeq[Float], IndexedSeq[Float]) = {
      val sorted = cells.keys.toIndexedSeq.sorted
      val blocks = sorted.map(cells) :+ global
      (sorted,
        blocks.flatMap(_.scales.toIndexedSeq),
        blocks.flatMap(_.zeroPoints.toIndexedSeq))
    }
  }

  private def quantizeCol(vec: Column, p: SqParams): Column =
    org.apache.spark.sql.GraftShims.column(graft.functions.QuantizePerDim(
      org.apache.spark.sql.GraftShims.expression(vec), p.scales.toIndexedSeq, p.zeroPoints.toIndexedSeq))

  private def dequantizeCol(codes: Column, p: SqParams): Column =
    org.apache.spark.sql.GraftShims.column(graft.functions.DequantizePerDim(
      org.apache.spark.sql.GraftShims.expression(codes), p.scales.toIndexedSeq, p.zeroPoints.toIndexedSeq))

  /** Quantize under a param set: per-cell expression (params selected per
    * row by its cell id) when the set carries cells, plain per-dim
    * otherwise. */
  private def quantizeSetCol(vec: Column, cell: Column, set: SqParamsSet): Column =
    if (!set.perCell) quantizeCol(vec, set.global)
    else {
      val (cs, ss, zs) = set.flat
      org.apache.spark.sql.GraftShims.column(graft.functions.QuantizePerCellDim(
        org.apache.spark.sql.GraftShims.expression(vec),
        org.apache.spark.sql.GraftShims.expression(cell), cs, ss, zs))
    }

  private def dequantizeSetCol(codes: Column, cell: Column, set: SqParamsSet): Column =
    if (!set.perCell) dequantizeCol(codes, set.global)
    else {
      val (cs, ss, zs) = set.flat
      org.apache.spark.sql.GraftShims.column(graft.functions.DequantizePerCellDim(
        org.apache.spark.sql.GraftShims.expression(codes),
        org.apache.spark.sql.GraftShims.expression(cell), cs, ss, zs))
    }

  /** Fit per-dimension affine params from per-dimension [lo, hi]:
    * `q = x/scale + zeroPoint` maps [lo_i, hi_i] onto [0, 255]. Constant
    * dimensions (hi == lo — paddings, one-hot constants) encode exactly
    * under (scale 1, zeroPoint −lo); ranges too tiny for float32 fall
    * back the same way rather than dividing by a rounded-to-zero scale. */
  private[graft] def fitSqParams(lo: Array[Double], hi: Array[Double]): SqParams = {
    val scales = new Array[Float](lo.length)
    val zps = new Array[Float](lo.length)
    var i = 0
    while (i < lo.length) {
      val s = ((hi(i) - lo(i)) / 255.0).toFloat
      val z = if (s > 0f) (-lo(i) / s).toFloat else Float.NaN
      if (s > 0f && java.lang.Float.isFinite(s) && java.lang.Float.isFinite(z)) {
        scales(i) = s; zps(i) = z
      } else {
        scales(i) = 1f; zps(i) = (-lo(i)).toFloat
      }
      i += 1
    }
    SqParams(scales, zps)
  }

  /** Build the IVF+SQ8 index: the cell-partitioned copy carries an 8-bit
    * scalar-quantized copy of the vector (d bytes/row vs 4d float bytes —
    * the memory tier BETWEEN raw vectors and PQ's m bytes, with near-exact
    * ranking instead of PQ's subspace approximation). Affine params are
    * PER-DIMENSION ([[fitSqParams]]): one map-side-combined min/max agg
    * pass (only partitions × dim doubles shuffle), so each dimension's
    * dequantized values have ≤ range_i/510 absolute error — an outlier
    * in one dimension cannot collapse the others' resolution. Encode is
    * the codegen'd [[graft.functions.QuantizePerDim]] — a single narrow
    * corpus pass. */
  def buildSq(store: Store, codingName: String, source: String,
      column: String, perCell: Boolean = false): SqParams = {
    val coding = store.loadCoding(codingName)
    val listing = store.sourceListing(source)
    if (perCell)
      require(coding.numCells <= ResidualCellCap,
        s"per-cell SQ8 supports codings up to $ResidualCellCap cells (the " +
          s"param set is numCells×dim×2 floats); coding '$codingName' has " +
          s"${coding.numCells}. Build with perCell = false.")
    val df = store.loadTable(source)
    val vecMin = udaf(graft.coder.VecMinAgg)
    val vecMax = udaf(graft.coder.VecMaxAgg)
    // ONE agg pass either way: per-cell just keys the same VecMin/VecMax
    // agg by the cell id (numCells × (lo, hi) rows collect — bounded by
    // the cell cap); the global fallback derives from the per-cell
    // bounds driver-side, no second scan
    val set: SqParamsSet =
      if (!perCell) {
        val stats = df
          .select(col(column).cast("array<double>").as("__v__"))
          .filter(col("__v__").isNotNull)
          .agg(vecMin(col("__v__")).as("lo"), vecMax(col("__v__")).as("hi"))
          .collect()(0)
        val lo = stats.getSeq[Double](0).toArray
        val hi = stats.getSeq[Double](1).toArray
        require(lo.nonEmpty,
          s"buildSq: $source.$column has no non-null vectors to quantize")
        SqParamsSet(fitSqParams(lo, hi))
      } else {
        val rows = df
          .withColumn(CodeCol, assignExpr(col(column), coding))
          .select(col(CodeCol), col(column).cast("array<double>").as("__v__"))
          .filter(col("__v__").isNotNull)
          .groupBy(col(CodeCol))
          .agg(vecMin(col("__v__")).as("lo"), vecMax(col("__v__")).as("hi"))
          .collect()
        require(rows.nonEmpty,
          s"buildSq: $source.$column has no non-null vectors to quantize")
        val bounds = rows.map { r =>
          r.getLong(0) -> (r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray)
        }
        val dim = bounds.head._2._1.length
        val gLo = Array.fill(dim)(Double.MaxValue)
        val gHi = Array.fill(dim)(Double.MinValue)
        bounds.foreach { case (_, (lo, hi)) =>
          var i = 0
          while (i < dim) {
            if (lo(i) < gLo(i)) gLo(i) = lo(i)
            if (hi(i) > gHi(i)) gHi(i) = hi(i)
            i += 1
          }
        }
        SqParamsSet(fitSqParams(gLo, gHi),
          bounds.map { case (c, (lo, hi)) => c -> fitSqParams(lo, hi) }.toMap)
      }
    val parts = math.max(1, math.min(coding.numCells,
      df.sparkSession.sparkContext.defaultParallelism.toLong * 2).toInt)
    val path = store.sqIndexPath(source, column, codingName)
    df.withColumn(SrcFileCol, col("_metadata.file_name"))
      .withColumn(CodeCol, assignExpr(col(column), coding))
      .withColumn(SqCol, quantizeSetCol(col(column), col(CodeCol), set))
      .repartition(parts, col(CodeCol))
      .write.mode("overwrite")
      .partitionBy(CodeCol)
      .parquet(path)
    store.writeSidecar(sqSidecar(path), sqParamsJson(set).getBytes("UTF-8"))
    recordSourceStamp(store, path, listing)
    set.global
  }

  private def sqParamsJson(set: SqParamsSet): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val payload = mapper.createObjectNode()
    def putArr(node: com.fasterxml.jackson.databind.node.ObjectNode,
        k: String, a: Array[Float]): Unit = {
      val arr = node.putArray(k); a.foreach(arr.add); ()
    }
    putArr(payload, "scales", set.global.scales)
    putArr(payload, "zeroPoints", set.global.zeroPoints)
    if (set.perCell) {
      val cellsNode = payload.putObject("cells")
      set.cells.toSeq.sortBy(_._1).foreach { case (c, p) =>
        val n = cellsNode.putObject(c.toString)
        putArr(n, "scales", p.scales)
        putArr(n, "zeroPoints", p.zeroPoints)
      }
    }
    mapper.writeValueAsString(payload)
  }

  def sqIndexExists(store: Store, codingName: String, source: String,
      column: String): Boolean =
    store.sidecarExists(sqSidecar(store.sqIndexPath(source, column, codingName))) &&
      // a sidecar in the legacy single-affine format (or otherwise
      // unparseable) counts as ABSENT, so exists-then-build flows rebuild
      // it instead of failing at search time
      scala.util.Try(loadSqParams(store, codingName, source, column)).isSuccess

  private def loadSqParams(store: Store, codingName: String, source: String,
      column: String): SqParamsSet = {
    val bytes = store.readSidecar(
      sqSidecar(store.sqIndexPath(source, column, codingName)))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = mapper.readTree(bytes)
    def arr(node: com.fasterxml.jackson.databind.JsonNode, k: String): Array[Float] = {
      val a = Option(node.get(k)).filter(_.isArray).getOrElse(
        throw new IllegalStateException(
          "malformed or pre-per-dimension SQ sidecar (rebuild with buildSq): " +
            new String(bytes, "UTF-8").take(200)))
      Array.tabulate(a.size())(i => a.get(i).floatValue())
    }
    val global = SqParams(arr(n, "scales"), arr(n, "zeroPoints"))
    val cells: Map[Long, SqParams] = Option(n.get("cells")).map { cn =>
      val b = Map.newBuilder[Long, SqParams]
      cn.fields().forEachRemaining { e =>
        b += e.getKey.toLong -> SqParams(arr(e.getValue, "scales"), arr(e.getValue, "zeroPoints"))
      }
      b.result()
    }.getOrElse(Map.empty)
    SqParamsSet(global, cells)
  }

  /** Incremental SQ8 sync: quantize-only append of source rows whose
    * `idCol` is not yet in the SQ index, under the STORED affine params
    * (no re-fit — new values outside the original [lo, hi] clamp to the
    * range ends, the standard SQ staleness trade; rebuild when the value
    * distribution shifts). Mirrors [[syncIncrementalPq]]; refuses when
    * the index doesn't exist. Returns rows appended. */
  def syncIncrementalSq(store: Store, codingName: String, source: String,
      column: String, idCol: String): Long = {
    val path = store.sqIndexPath(source, column, codingName)
    require(store.sidecarExists(sqSidecar(path)),
      s"no SQ index for $source.$column under coding '$codingName' — " +
        "build it first (buildSq)")
    val params = loadSqParams(store, codingName, source, column)
    val coding = store.loadCoding(codingName)
    val existingDf = store.spark.read.parquet(path)
    val existing = existingDf.select(col(idCol))
    // legacy copies (no provenance column) append without it — a mixed
    // schema would make the parquet read file-order-dependent
    val src0 = store.loadTable(source)
    val src = if (existingDf.schema.fieldNames.contains(SrcFileCol))
      src0.withColumn(SrcFileCol, col("_metadata.file_name"))
    else src0
    val fresh = src.join(existing, Seq(idCol), "left_anti")
    val delta = fresh
      .withColumn(CodeCol, assignExpr(col(column), coding))
      // per-cell sets quantize rows in unseen cells under the global
      // fallback block — the same block the dequantize side will select
      .withColumn(SqCol, quantizeSetCol(col(column), col(CodeCol), params))
    delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val appended = delta.count()
      if (appended > 0) {
        delta.write.mode("append").partitionBy(CodeCol).parquet(path)
        // re-stamp ONLY for verifiably append-only growth (the
        // [[syncIncremental]] rule): a rewrite that also modified
        // existing files must keep freshness failing
        val curSet = store.sourceListing(source).toSet
        if (recordedListing(store, path).exists(_.forall(curSet.contains)))
          recordSourceStamp(store, path, store.sourceListing(source))
      }
      appended
    } finally delta.unpersist(blocking = false)
  }

  /** Probed IVF+SQ8 search — the [[searchIvfPq]] two-pass shape with the
    * ADC stage replaced by exact distance over the DEQUANTIZED 8-bit
    * copy: the coarse pass reads (idCol, d-byte codes) over pruned
    * partitions only, ranks with `vector_distance(dequantize(codes),
    * target)` (both codegen'd, fused in one projection), then the float
    * vectors are read back just for the `candidates` survivors and
    * scored exactly. With probes = numCells and candidates ≥ corpus this
    * is exact (the oracle contract); at bounded budgets the 8-bit
    * ranking error (≤ range/510 per element) makes candidate recall far
    * tighter than PQ's at 4× PQ's footprint. */
  def searchSq(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      target: graft.api.TargetVector,
      k: Int,
      probes: Int,
      candidates: Int,
      idCol: String,
      metric: Option[String] = None,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val coding = store.loadCoding(codingName)
    val params = loadSqParams(store, codingName, source, column)
    val m = graft.core.Metrics.canonical(
      metric.getOrElse(coding.config.metric))
    val cells = coding.rankCells(target.doubles, probes)
    val prunedAll = pruneToCells(store.spark.read
      .parquet(store.sqIndexPath(source, column, codingName))
      .withColumn(CodeCol, col(CodeCol).cast("long")).drop(SrcFileCol),
      cells, coding.numCells)
    val pruned = filter.fold(prunedAll)(prunedAll.filter)
    val coarseIds = pruned
      .select(col(idCol), col(SqCol), col(CodeCol))
      .withColumn("__SQD__", vector_distance(
        dequantizeSetCol(col(SqCol), col(CodeCol), params), target.lit, m))
      .orderBy(col("__SQD__").asc, col(idCol).asc)
      .limit(candidates)
      .select(idCol)
    val reranked = pruned.join(broadcast(coarseIds), Seq(idCol))
      .withColumn(Search.DistCol, vector_distance(col(column), target.lit, m))
      .drop(SqCol)
    val projected = select.fold(reranked)(cols =>
      reranked.select((cols :+ Search.DistCol).map(col): _*))
    projected
      .orderBy(col(Search.DistCol).asc +: tieBreak.map(col(_).asc): _*)
      .limit(k)
  }

  // ——— IVF + BQ (1-bit binary quantization) tier ———

  val BqCol: String = "__BQ__"
  private def bqSidecar(path: String) = s"$path/_bq_thresholds.json"

  /** BQ sidecar params: per-dimension sign thresholds plus the two
    * conditional-mean reconstruction levels ([[graft.functions
    * .DequantizeSignBits]]). Legacy sidecars (thresholds only) load with
    * empty levels and fall back to symmetric Hamming coarse ranking. */
  case class BqParams(thresholds: Array[Double], lo: Array[Float],
      hi: Array[Float]) {
    def asymmetric: Boolean = lo.nonEmpty
  }

  /** Global params plus (opt-in, [[buildBq]] `perCell = true`) one block
    * per IVF cell. Per-cell thresholds are what make the 1-bit tier
    * usable on CLUSTERED corpora: globally-centered sign bits degenerate
    * into a cluster id (every member of a cell shares its offset's sign
    * pattern), while per-cell centering makes the bits encode the
    * within-cell residual — exactly where a query's true neighbors live. */
  case class BqParamsSet(global: BqParams, cells: Map[Long, BqParams] = Map.empty) {
    def perCell: Boolean = cells.nonEmpty
    /** Flat (cells + trailing global fallback) blocks, sorted by cell. */
    def flat: (IndexedSeq[Long], IndexedSeq[Double], IndexedSeq[Float], IndexedSeq[Float]) = {
      val cs = cells.keys.toIndexedSeq.sorted
      val blocks = cs.map(cells) :+ global
      (cs, blocks.flatMap(_.thresholds.toIndexedSeq),
        blocks.flatMap(_.lo.toIndexedSeq), blocks.flatMap(_.hi.toIndexedSeq))
    }
  }

  private def packSignBitsSetCol(vec: Column, cell: Column, set: BqParamsSet): Column =
    if (!set.perCell) packSignBitsCol(vec, set.global.thresholds)
    else {
      val (cs, thr, _, _) = set.flat
      org.apache.spark.sql.GraftShims.column(graft.functions.PackSignBitsPerCell(
        org.apache.spark.sql.GraftShims.expression(vec),
        org.apache.spark.sql.GraftShims.expression(cell), cs, thr))
    }

  private def dequantizeSignBitsSetCol(codes: Column, cell: Column,
      set: BqParamsSet): Column =
    if (!set.perCell) dequantizeSignBitsCol(codes, set.global)
    else {
      val (cs, _, lo, hi) = set.flat
      org.apache.spark.sql.GraftShims.column(graft.functions.DequantizeSignBitsPerCell(
        org.apache.spark.sql.GraftShims.expression(codes),
        org.apache.spark.sql.GraftShims.expression(cell), cs, lo, hi))
    }

  /** Build the IVF+BQ index: the cell-partitioned copy carries a 1-bit
    * sign code per dimension (`ceil(d/8)` bytes/row — 32× smaller than
    * float32, 8× smaller than SQ8; the coarsest memory tier). Each
    * dimension is binarized around its MEAN, and the sidecar also
    * records each side's CONDITIONAL MEAN — the optimal 1-bit scalar
    * dequantizer levels — so the coarse pass can rank ASYMMETRICALLY:
    * `vector_distance(reconstruction, query)` keeps the query at full
    * float precision and per-dimension magnitudes in the ranking
    * (measured at 1M × 256-d: recall@10@4k 0.59 symmetric-Hamming →
    * asymmetric well above; the scan still reads only the packed bits).
    * Two map-side-combined agg passes (mean, then per-side sums keyed by
    * the sign mask); encode is the codegen'd
    * [[graft.functions.PackSignBits]] — one narrow corpus pass.
    *
    * The tier's contract matches SQ8's: the 1-bit score is COARSE
    * ranking only; [[searchBq]] always reranks the `candidates`
    * survivors with the exact metric over the float vectors, so full
    * probes + candidates is exact. Returns the per-dim thresholds. */
  def buildBq(store: Store, codingName: String, source: String,
      column: String, perCell: Boolean = false): Array[Double] = {
    val coding = store.loadCoding(codingName)
    val listing = store.sourceListing(source)
    if (perCell)
      require(coding.numCells <= ResidualCellCap,
        s"per-cell BQ supports codings up to $ResidualCellCap cells (the " +
          s"param set is numCells×dim×3 values); coding '$codingName' has " +
          s"${coding.numCells}. Build with perCell = false.")
    val df = store.loadTable(source)
    val vecSum = udaf(graft.coder.VecSumAgg)
    val vecs = df
      .select(col(column).cast("array<double>").as("__v__"))
      .filter(col("__v__").isNotNull)

    /** (thresholds, lo, hi) from a vector frame under GIVEN thresholds:
      * one agg of four element-masked VecSum columns. */
    def condLevels(frame: DataFrame, thr: Array[Double]): (Array[Float], Array[Float]) = {
      val thrLit = typedLit(thr.toSeq)
      val cond = frame.select(
          zip_with(col("__v__"), thrLit, (x, t) => when(x > t, x).otherwise(lit(0.0d))).as("hs"),
          zip_with(col("__v__"), thrLit, (x, t) => when(x > t, lit(1.0d)).otherwise(lit(0.0d))).as("hc"),
          zip_with(col("__v__"), thrLit, (x, t) => when(x > t, lit(0.0d)).otherwise(x)).as("ls"),
          zip_with(col("__v__"), thrLit, (x, t) => when(x > t, lit(0.0d)).otherwise(lit(1.0d))).as("lc"))
        .agg(vecSum(col("hs")).as("hs"), vecSum(col("hc")).as("hc"),
          vecSum(col("ls")).as("ls"), vecSum(col("lc")).as("lc"))
        .collect()(0)
      val (hs, hc, ls, lc) = (cond.getSeq[Double](0), cond.getSeq[Double](1),
        cond.getSeq[Double](2), cond.getSeq[Double](3))
      // an empty side (constant dimension) reconstructs to the threshold
      val hi = Array.tabulate(thr.length)(i =>
        (if (hc(i) > 0) hs(i) / hc(i) else thr(i)).toFloat)
      val lo = Array.tabulate(thr.length)(i =>
        (if (lc(i) > 0) ls(i) / lc(i) else thr(i)).toFloat)
      (lo, hi)
    }

    val stats = vecs
      .agg(vecSum(col("__v__")).as("s"), count(lit(1)).as("n"))
      .collect()(0)
    require(!stats.isNullAt(0) && stats.getSeq[Double](0).nonEmpty,
      s"buildBq: $source.$column has no non-null vectors to binarize")
    val n = stats.getLong(1).toDouble
    val thresholds = stats.getSeq[Double](0).map(_ / n).toArray
    val (gLo, gHi) = condLevels(vecs, thresholds)
    val global = BqParams(thresholds, gLo, gHi)

    val set: BqParamsSet =
      if (!perCell) BqParamsSet(global)
      else {
        val keyed = df
          .withColumn(CodeCol, assignExpr(col(column), coding))
          .select(col(CodeCol), col(column).cast("array<double>").as("__v__"))
          .filter(col("__v__").isNotNull)
        // per-cell means: ONE keyed sum/count agg (numCells×dim doubles
        // collect — bounded by the cell cap)
        val sums = keyed.groupBy(col(CodeCol))
          .agg(vecSum(col("__v__")).as("s"), count(lit(1)).as("n"))
          .collect()
        val cellThr: Map[Long, Array[Double]] = sums.map { r =>
          val cn = r.getLong(2).toDouble
          r.getLong(0) -> r.getSeq[Double](1).map(_ / cn).toArray
        }.toMap
        // per-cell conditional levels: the per-row threshold block joins
        // in via a broadcast of the tiny (cell, thresholds) table, then
        // the same four masked VecSums — keyed this time
        import df.sparkSession.implicits._
        val thrDf = broadcast(cellThr.toSeq.map { case (c, t) => (c, t.toSeq) }
          .toDF(CodeCol, "__thr__"))
        val cond = keyed.join(thrDf, CodeCol)
          .select(col(CodeCol),
            zip_with(col("__v__"), col("__thr__"), (x, t) => when(x > t, x).otherwise(lit(0.0d))).as("hs"),
            zip_with(col("__v__"), col("__thr__"), (x, t) => when(x > t, lit(1.0d)).otherwise(lit(0.0d))).as("hc"),
            zip_with(col("__v__"), col("__thr__"), (x, t) => when(x > t, lit(0.0d)).otherwise(x)).as("ls"),
            zip_with(col("__v__"), col("__thr__"), (x, t) => when(x > t, lit(0.0d)).otherwise(lit(1.0d))).as("lc"))
          .groupBy(col(CodeCol))
          .agg(vecSum(col("hs")).as("hs"), vecSum(col("hc")).as("hc"),
            vecSum(col("ls")).as("ls"), vecSum(col("lc")).as("lc"))
          .collect()
        val cells = cond.map { r =>
          val c = r.getLong(0)
          val thr = cellThr(c)
          val (hs, hc, ls, lc) = (r.getSeq[Double](1), r.getSeq[Double](2),
            r.getSeq[Double](3), r.getSeq[Double](4))
          val hi = Array.tabulate(thr.length)(i =>
            (if (hc(i) > 0) hs(i) / hc(i) else thr(i)).toFloat)
          val lo = Array.tabulate(thr.length)(i =>
            (if (lc(i) > 0) ls(i) / lc(i) else thr(i)).toFloat)
          c -> BqParams(thr, lo, hi)
        }.toMap
        BqParamsSet(global, cells)
      }

    val parts = math.max(1, math.min(coding.numCells,
      df.sparkSession.sparkContext.defaultParallelism.toLong * 2).toInt)
    val path = store.bqIndexPath(source, column, codingName)
    df.withColumn(SrcFileCol, col("_metadata.file_name"))
      .withColumn(CodeCol, assignExpr(col(column), coding))
      .withColumn(BqCol, packSignBitsSetCol(col(column), col(CodeCol), set))
      .repartition(parts, col(CodeCol))
      .write.mode("overwrite")
      .partitionBy(CodeCol)
      .parquet(path)
    store.writeSidecar(bqSidecar(path), bqParamsJson(set).getBytes("UTF-8"))
    recordSourceStamp(store, path, listing)
    thresholds
  }

  private def bqParamsJson(set: BqParamsSet): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def block(node: com.fasterxml.jackson.databind.node.ObjectNode, p: BqParams): Unit = {
      node.set[com.fasterxml.jackson.databind.JsonNode](
        "thresholds", mapper.valueToTree(p.thresholds))
      node.set[com.fasterxml.jackson.databind.JsonNode]("lo", mapper.valueToTree(p.lo))
      node.set[com.fasterxml.jackson.databind.JsonNode]("hi", mapper.valueToTree(p.hi))
    }
    val payload = mapper.createObjectNode()
    block(payload, set.global)
    if (set.perCell) {
      val cn = payload.putObject("cells")
      set.cells.toSeq.sortBy(_._1).foreach { case (c, p) =>
        block(cn.putObject(c.toString), p)
      }
    }
    mapper.writeValueAsString(payload)
  }

  private def packSignBitsCol(vec: Column, thresholds: Array[Double]): Column =
    org.apache.spark.sql.GraftShims.column(graft.functions.PackSignBits(
      org.apache.spark.sql.GraftShims.expression(vec), thresholds.toIndexedSeq))

  private def dequantizeSignBitsCol(codes: Column, p: BqParams): Column =
    org.apache.spark.sql.GraftShims.column(graft.functions.DequantizeSignBits(
      org.apache.spark.sql.GraftShims.expression(codes),
      p.lo.toIndexedSeq, p.hi.toIndexedSeq))

  def bqIndexExists(store: Store, codingName: String, source: String,
      column: String): Boolean =
    store.sidecarExists(bqSidecar(store.bqIndexPath(source, column, codingName))) &&
      scala.util.Try(loadBqThresholds(store, codingName, source, column)).isSuccess

  private def loadBqParams(store: Store, codingName: String,
      source: String, column: String): BqParamsSet = {
    val path = store.bqIndexPath(source, column, codingName)
    require(store.sidecarExists(bqSidecar(path)),
      s"no BQ index for $source.$column under coding '$codingName' — " +
        "build it first (buildBq)")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(store.readSidecar(bqSidecar(path)))
    def block(n: com.fasterxml.jackson.databind.JsonNode): BqParams = {
      def dbl(name: String): Array[Double] = Option(n.get(name)).map { a =>
        Array.tabulate(a.size())(i => a.get(i).asDouble())
      }.getOrElse(Array.empty)
      def flt(name: String): Array[Float] = Option(n.get(name)).map { a =>
        Array.tabulate(a.size())(i => a.get(i).asDouble().toFloat)
      }.getOrElse(Array.empty)
      BqParams(dbl("thresholds"), flt("lo"), flt("hi"))
    }
    val cells: Map[Long, BqParams] = Option(root.get("cells")).map { cn =>
      val b = Map.newBuilder[Long, BqParams]
      cn.properties().forEach { e => b += e.getKey.toLong -> block(e.getValue) }
      b.result()
    }.getOrElse(Map.empty)
    BqParamsSet(block(root), cells)
  }

  private def loadBqThresholds(store: Store, codingName: String,
      source: String, column: String): Array[Double] =
    loadBqParams(store, codingName, source, column).global.thresholds

  /** Incremental BQ sync: append-only delta encoded under the STORED
    * thresholds (no re-fit — a shifted value distribution degrades code
    * balance, not correctness, since rerank is exact; rebuild when the
    * distribution moves). Mirrors [[syncIncrementalSq]]. */
  def syncIncrementalBq(store: Store, codingName: String, source: String,
      column: String, idCol: String): Long = {
    val path = store.bqIndexPath(source, column, codingName)
    val params = loadBqParams(store, codingName, source, column)
    val coding = store.loadCoding(codingName)
    val existingDf = store.spark.read.parquet(path)
    val existing = existingDf.select(col(idCol))
    // legacy copies (no provenance column) append without it — a mixed
    // schema would make the parquet read file-order-dependent
    val src0 = store.loadTable(source)
    val src = if (existingDf.schema.fieldNames.contains(SrcFileCol))
      src0.withColumn(SrcFileCol, col("_metadata.file_name"))
    else src0
    val fresh = src.join(existing, Seq(idCol), "left_anti")
    val delta = fresh
      .withColumn(CodeCol, assignExpr(col(column), coding))
      // per-cell sets pack rows in unseen cells under the global
      // fallback block — the same block the decode side will select
      .withColumn(BqCol, packSignBitsSetCol(col(column), col(CodeCol), params))
    delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val appended = delta.count()
      if (appended > 0) {
        delta.write.mode("append").partitionBy(CodeCol).parquet(path)
        // re-stamp ONLY for verifiably append-only growth (the
        // [[syncIncremental]] rule): a rewrite that also modified
        // existing files must keep freshness failing
        val curSet = store.sourceListing(source).toSet
        if (recordedListing(store, path).exists(_.forall(curSet.contains)))
          recordSourceStamp(store, path, store.sourceListing(source))
      }
      appended
    } finally delta.unpersist(blocking = false)
  }

  /** Probed IVF+BQ search — the [[searchSq]] two-pass shape at the 1-bit
    * tier: the coarse pass reads (idCol, ceil(d/8)-byte codes) over
    * pruned partitions only and ranks ASYMMETRICALLY —
    * `vector_distance(dequantize_sign_bits(codes), target, metric)`,
    * the codegen'd conditional-mean reconstruction fused with the
    * distance in one projection — so the full-precision query and
    * per-dimension magnitudes stay in the ranking while the scan reads
    * only the packed bits (legacy thresholds-only sidecars fall back to
    * symmetric [[graft.functions.HammingDistance]] popcount). The float
    * vectors are read back just for the `candidates` survivors and
    * scored exactly under `metric`. With probes = numCells and
    * candidates ≥ corpus this is exact (the oracle contract); at
    * bounded budgets the 1-bit coarse scan is 8× smaller than SQ8's and
    * 32× smaller than raw. Coarse ties break by `idCol`, so candidate
    * selection is deterministic. */
  def searchBq(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      target: graft.api.TargetVector,
      k: Int,
      probes: Int,
      candidates: Int,
      idCol: String,
      metric: Option[String] = None,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val coding = store.loadCoding(codingName)
    val params = loadBqParams(store, codingName, source, column)
    val thresholds = params.global.thresholds
    val m = graft.core.Metrics.canonical(
      metric.getOrElse(coding.config.metric))
    require(target.length == thresholds.length,
      s"searchBq: target has ${target.length} dims, index has ${thresholds.length}")
    val cells = coding.rankCells(target.doubles, probes)
    val prunedAll = pruneToCells(store.spark.read
      .parquet(store.bqIndexPath(source, column, codingName))
      .withColumn(CodeCol, col(CodeCol).cast("long")).drop(SrcFileCol),
      cells, coding.numCells)
    val pruned = filter.fold(prunedAll)(prunedAll.filter)
    val coarseScore: Column =
      if (params.perCell || params.global.asymmetric)
        vector_distance(
          dequantizeSignBitsSetCol(col(BqCol), col(CodeCol), params),
          target.lit, m)
      else {
        val v = target.doubles
        val code = new Array[Byte]((v.length + 7) / 8)
        var i = 0
        while (i < v.length) {
          if (v(i) > thresholds(i)) code(i >> 3) = (code(i >> 3) | (0x80 >> (i & 7))).toByte
          i += 1
        }
        org.apache.spark.sql.GraftShims.column(
          graft.functions.HammingDistance(
            org.apache.spark.sql.GraftShims.expression(col(BqCol)),
            code.toIndexedSeq)).cast("double")
      }
    val coarseIds = pruned
      .select(col(idCol), col(BqCol), col(CodeCol))
      .withColumn("__BQD__", coarseScore)
      .orderBy(col("__BQD__").asc, col(idCol).asc)
      .limit(candidates)
      .select(idCol)
    val reranked = pruned.join(broadcast(coarseIds), Seq(idCol))
      .withColumn(Search.DistCol, vector_distance(col(column), target.lit, m))
      .drop(BqCol)
    val projected = select.fold(reranked)(cols =>
      reranked.select((cols :+ Search.DistCol).map(col): _*))
    projected
      .orderBy(col(Search.DistCol).asc +: tieBreak.map(col(_).asc): _*)
      .limit(k)
  }

  /** A k^n-capped probe union is still a planning hazard as an IN-SET
    * partition filter (catalog pruning evaluates it per partition and the
    * predicate itself ships in every task); beyond this many distinct
    * cells the batch should probe less or split. */
  val ProbedCellUnionCap = 32768

  /** Distinct probed cells across the query batch (driver-side — the
    * exploded frame is numQueries×probes rows), cap-checked. A union
    * covering EVERY cell is exempt: [[pruneToCells]] then skips the
    * IN-SET filter entirely, so there is nothing hazardous to build. */
  private def probedCellUnion(exploded: DataFrame, numCells: Long): Array[Long] = {
    val cells = exploded.select("__cell__").distinct().collect().map(_.getLong(0))
    require(cells.length <= ProbedCellUnionCap || cells.length >= numCells,
      s"the union of probed cells across this query batch (${cells.length}) " +
        s"exceeds $ProbedCellUnionCap — an IN-SET partition filter that " +
        "large is itself a planning hazard. Reduce probes, use a coding " +
        "with fewer cells, or split the query batch.")
    cells
  }

  /** Batch IVF k-NN join: top-k corpus rows per query row, probing only
    * each query's nearest cells.
    *
    * Scale shape: every query explodes to its `probes` cell ids (small
    * broadcast); the union of probed cells prunes the partitioned corpus
    * scan (driver-side distinct — capped, see [[ProbedCellUnionCap]]); the
    * per-cell broadcast equi-join scores distances MAP-SIDE (the pruned
    * scan has to read the vectors to score them, but no shuffle sees
    * them), and only (queryId, corpusId, distance, tie-breaks) ride the
    * per-query window exchange — the corpus' float vectors never cross a
    * shuffle. Full rows come back via a broadcast join of the ≤
    * numQueries·k survivors. This is the "online ANN" surface re-shaped
    * for Spark: amortize many queries over one pruned corpus pass.
    * `idCol` must be unique per corpus row. The exploded query batch
    * (numQueries×probes rows, vectors included) is broadcast — batches
    * estimated past `broadcastCapBytes` are hash-chunked and the
    * per-chunk top-k unioned (equivalent; see
    * [[graft.api.Search.QueryBroadcastCap]]).
    */
  def ivfKnnJoin(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      probes: Int,
      idCol: String,
      metric: Option[String] = None,
      tieBreak: Seq[String] = Nil,
      broadcastCapBytes: Long = Search.QueryBroadcastCap): DataFrame = {
    val qs = queries.select(col(queryIdCol), col(queryVecCol))
    Search.chunkByBroadcastSize(qs, queryIdCol, queryVecCol, probes, broadcastCapBytes)
      .map(ch => ivfKnnJoinChunk(store, codingName, source, column, ch,
        queryIdCol, queryVecCol, k, probes, idCol, metric, tieBreak))
      .reduce(_.unionByName(_))
  }

  private def ivfKnnJoinChunk(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      probes: Int,
      idCol: String,
      metric: Option[String],
      tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coding = store.loadCoding(codingName)
    val m = metric.getOrElse(coding.config.metric)
    val rankCellsUdf = udf((v: Seq[Double]) => coding.rankCells(v.toArray, probes))
    val exploded = queries
      .withColumn("__cell__", explode(rankCellsUdf(col(queryVecCol).cast("array<double>"))))
    val cells = probedCellUnion(exploded, coding.numCells)
    val corpus = pruneToCells(load(store, codingName, source, column),
      cells, coding.numCells)
    // narrow coarse pass: score in the projection of the broadcast join,
    // then immediately shed the vectors before the window exchange
    val coarseCols = (idCol +: tieBreak).distinct
    val scored = corpus
      .select((coarseCols :+ column).distinct.map(col) :+ col(CodeCol): _*)
      .join(broadcast(exploded), col(CodeCol) === col("__cell__"))
      .withColumn(Search.DistCol, vector_distance(col(column), col(queryVecCol), m))
      .select(col(queryIdCol) +: col(Search.DistCol) +: coarseCols.map(col): _*)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col(Search.DistCol).asc +: tieBreak.map(col(_).asc): _*)
    val topk = scored.withColumn("__rank__", row_number().over(w))
      .filter(col("__rank__") <= k)
      .select(col(queryIdCol), col(Search.DistCol), col(idCol))
    // survivors (≤ numQueries·k ids) broadcast back against the pruned
    // corpus to restore the full row — distances travel with them, no
    // re-scoring
    broadcast(topk).join(corpus, Seq(idCol))
  }

  /** Batch k-NN join over the SQ8 index: [[ivfKnnJoin]]'s shape with the
    * expensive stage on the QUANTIZED copy — the per-cell
    * corpus×queries join carries (id, cell, d-byte codes) instead of 4d
    * float bytes (4× less data through the join and the per-query
    * window), then raw vectors are read back only for each query's
    * `candidates` coarse survivors and scored exactly. With
    * probes = numCells and candidates ≥ corpus size this equals the
    * exact k-NN join (the oracle contract); bounded budgets inherit
    * SQ8's near-exact ranking, so small `candidates` already recover
    * the true top-k. Query batches estimated past `broadcastCapBytes`
    * are hash-chunked (see [[ivfKnnJoin]]). */
  def sqKnnJoin(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      probes: Int,
      candidates: Int,
      idCol: String,
      metric: Option[String] = None,
      tieBreak: Seq[String] = Nil,
      broadcastCapBytes: Long = Search.QueryBroadcastCap): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val qs = queries.select(col(queryIdCol), col(queryVecCol))
    Search.chunkByBroadcastSize(qs, queryIdCol, queryVecCol, probes, broadcastCapBytes)
      .map(ch => sqKnnJoinChunk(store, codingName, source, column, ch,
        queryIdCol, queryVecCol, k, probes, candidates, idCol, metric, tieBreak))
      .reduce(_.unionByName(_))
  }

  private def sqKnnJoinChunk(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      probes: Int,
      candidates: Int,
      idCol: String,
      metric: Option[String],
      tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coding = store.loadCoding(codingName)
    val params = loadSqParams(store, codingName, source, column)
    val m = graft.core.Metrics.canonical(
      metric.getOrElse(coding.config.metric))
    val rankCellsUdf = udf((v: Seq[Double]) => coding.rankCells(v.toArray, probes))
    val exploded = queries
      .withColumn("__cell__",
        explode(rankCellsUdf(col(queryVecCol).cast("array<double>"))))
    val cells = probedCellUnion(exploded, coding.numCells)
    val sqDf = pruneToCells(store.spark.read
      .parquet(store.sqIndexPath(source, column, codingName))
      .withColumn(CodeCol, col(CodeCol).cast("long")).drop(SrcFileCol),
      cells, coding.numCells)
    // coarse: only (id, cell, codes) ride the per-cell join and window
    val coarse = sqDf.select(col(idCol), col(CodeCol), col(SqCol))
      .join(broadcast(exploded), col(CodeCol) === col("__cell__"))
      .withColumn("__SQD__", vector_distance(
        dequantizeSetCol(col(SqCol), col(CodeCol), params), col(queryVecCol), m))
    val wCoarse = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__SQD__").asc, col(idCol).asc)
    val survivors = coarse.withColumn("__crank__", row_number().over(wCoarse))
      .filter(col("__crank__") <= candidates)
      .select(col(queryIdCol), col(idCol))
    rerankSurvivors(survivors, sqDf, queries, queryIdCol, queryVecCol,
      column, idCol, k, m, tieBreak)
  }

  /** Shared rerank tail of the sq/bq/pq/rerank batch kNN joins — the
    * [[ivfKnnJoin]] scale discipline applied to a candidate set: the
    * survivors (≤ queries·candidates scalar id pairs) broadcast back
    * against the pruned corpus so the corpus side NEVER shuffles by id,
    * the already-broadcast-sized query batch rejoins map-side for the
    * exact rescore, the per-query top-k window exchanges SCALARS only
    * (queryId, id, distance, tie-breaks — no vectors), and the k
    * winners fetch their vector rows by a second broadcast join
    * (distances travel with them; no re-scoring). */
  private def rerankSurvivors(
      survivors: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      column: String,
      idCol: String,
      k: Int,
      metric: String,
      tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rerankCols = (Seq(queryIdCol, idCol) ++ tieBreak).distinct
    val scored = broadcast(survivors)
      .join(corpus.select(col(idCol), col(column)), Seq(idCol))
      .join(broadcast(queries), Seq(queryIdCol))
      .withColumn(Search.DistCol,
        vector_distance(col(column), col(queryVecCol), metric))
      .select((rerankCols :+ Search.DistCol).map(col): _*)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col(Search.DistCol).asc +: tieBreak.map(col(_).asc): _*)
    val topk = scored.withColumn("__rank__", row_number().over(w))
      .filter(col("__rank__") <= k).drop("__rank__")
    broadcast(topk).join(corpus.select(col(idCol), col(column)), Seq(idCol))
  }

  /** Batch k-NN join over the BQ index: [[sqKnnJoin]]'s shape at the
    * 1-bit tier — the per-cell corpus×queries join carries (id, cell,
    * ceil(d/8)-byte sign codes) and ranks with the codegen'd
    * [[graft.functions.HammingDistancePair]] popcount (32× less data
    * through the join and the per-query window than raw floats; the
    * query side pre-packs its codes under the stored thresholds), then
    * raw vectors are read back only for each query's `candidates`
    * coarse survivors and scored exactly under `metric`. With
    * probes = numCells and candidates ≥ corpus size this equals the
    * exact k-NN join (the oracle contract). Query batches estimated
    * past `broadcastCapBytes` are hash-chunked (see [[ivfKnnJoin]]). */
  def bqKnnJoin(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      probes: Int,
      candidates: Int,
      idCol: String,
      metric: Option[String] = None,
      tieBreak: Seq[String] = Nil,
      broadcastCapBytes: Long = Search.QueryBroadcastCap): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val qs = queries.select(col(queryIdCol), col(queryVecCol))
    Search.chunkByBroadcastSize(qs, queryIdCol, queryVecCol, probes, broadcastCapBytes)
      .map(ch => bqKnnJoinChunk(store, codingName, source, column, ch,
        queryIdCol, queryVecCol, k, probes, candidates, idCol, metric, tieBreak))
      .reduce(_.unionByName(_))
  }
  private def bqKnnJoinChunk(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      probes: Int,
      candidates: Int,
      idCol: String,
      metric: Option[String],
      tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coding = store.loadCoding(codingName)
    val params = loadBqParams(store, codingName, source, column)
    val m = graft.core.Metrics.canonical(
      metric.getOrElse(coding.config.metric))
    val rankCellsUdf = udf((v: Seq[Double]) => coding.rankCells(v.toArray, probes))
    val exploded = queries
      .withColumn("__cell__",
        explode(rankCellsUdf(col(queryVecCol).cast("array<double>"))))
    val cells = probedCellUnion(exploded, coding.numCells)
    val bqDf = pruneToCells(store.spark.read
      .parquet(store.bqIndexPath(source, column, codingName))
      .withColumn(CodeCol, col(CodeCol).cast("long")).drop(SrcFileCol),
      cells, coding.numCells)
    // coarse: (id, cell, 1-bit codes) ride the per-cell join; the
    // asymmetric score — vector_distance over the conditional-mean
    // reconstruction vs each query's full-precision vector (legacy
    // sidecars: symmetric hamming vs the query's packed code) — lands in
    // the join projection, and the per-query window exchange carries
    // SCALARS only: (queryId, id, score). Neither vectors nor codes
    // cross the shuffle.
    val (qSide, score) =
      if (params.perCell || params.global.asymmetric)
        (exploded.select(col(queryIdCol), col("__cell__"), col(queryVecCol)),
          vector_distance(
            dequantizeSignBitsSetCol(col(BqCol), col(CodeCol), params),
            col(queryVecCol), m))
      else {
        val packed = exploded
          .withColumn("__QBQ__",
            packSignBitsCol(col(queryVecCol), params.global.thresholds))
          .select(col(queryIdCol), col("__cell__"), col("__QBQ__"))
        (packed, org.apache.spark.sql.GraftShims.column(
          graft.functions.HammingDistancePair(
            org.apache.spark.sql.GraftShims.expression(col(BqCol)),
            org.apache.spark.sql.GraftShims.expression(col("__QBQ__"))))
          .cast("double"))
      }
    val coarse = bqDf.select(col(idCol), col(CodeCol), col(BqCol))
      .join(broadcast(qSide), col(CodeCol) === col("__cell__"))
      .withColumn("__BQD__", score)
      .select(col(queryIdCol), col(idCol), col("__BQD__"))
    val wCoarse = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__BQD__").asc, col(idCol).asc)
    val survivors = coarse.withColumn("__crank__", row_number().over(wCoarse))
      .filter(col("__crank__") <= candidates)
      .select(col(queryIdCol), col(idCol))
    // scale discipline of the rerank tail: see [[rerankSurvivors]]
    rerankSurvivors(survivors, bqDf, queries, queryIdCol, queryVecCol,
      column, idCol, k, m, tieBreak)
  }

  /** Batch k-NN join over the IVF+PQ index: [[sqKnnJoin]]'s shape at the
    * ADC tier — the per-cell corpus×queries join carries (id, cell,
    * m-byte PQ codes) and ranks with the codegen'd
    * [[graft.functions.PQAdcScoreLut]] (each query's per-cell lookup
    * table is built ONCE on the broadcast side by
    * [[graft.coder.PQ.adcLut]] — the [[searchIvfPq]] per-target table
    * shipped as a column instead of an expression literal; residual
    * codebooks get their per-cell IVFADC tables the same way), then raw
    * vectors are read back only for each query's `candidates` coarse
    * survivors and scored exactly under the codebooks' metric. With
    * probes = numCells and candidates ≥ corpus size this equals the
    * exact k-NN join (the oracle contract). Query batches estimated
    * past `broadcastCapBytes` are hash-chunked (see [[ivfKnnJoin]]);
    * the LUT adds m·k doubles per (query, probed cell) to the
    * broadcast — at m=64,k=256 that is ~130 KB per replica, dwarfing
    * the vector itself — so the chunk estimate charges m·k·8 bytes per
    * replicated row on top of the vector payload. */
  def pqKnnJoin(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      probes: Int,
      candidates: Int,
      idCol: String,
      metric: Option[String] = None,
      tieBreak: Seq[String] = Nil,
      broadcastCapBytes: Long = Search.QueryBroadcastCap): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val qs = queries.select(col(queryIdCol), col(queryVecCol))
    // the broadcast q-side carries an m·k-double ADC LUT per (query,
    // probed cell) — charge it per replica or a batch sized just under
    // the cap on vectors alone ships a multi-GB broadcast
    val cb = loadPqCodebooks(store, codingName, source, column)
    val lutBytes = cb.m.toLong * cb.k * 8
    Search.chunkByBroadcastSize(qs, queryIdCol, queryVecCol, probes,
        broadcastCapBytes, perReplicaExtraBytes = lutBytes)
      .map(ch => pqKnnJoinChunk(store, codingName, source, column, ch,
        queryIdCol, queryVecCol, k, probes, candidates, idCol, metric, tieBreak))
      .reduce(_.unionByName(_))
  }

  private def pqKnnJoinChunk(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      probes: Int,
      candidates: Int,
      idCol: String,
      metric: Option[String],
      tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coding = store.loadCoding(codingName)
    val cb = loadPqCodebooks(store, codingName, source, column)
    val m = graft.core.Metrics.canonical(metric.getOrElse(cb.canonicalMetric))
    require(m == cb.canonicalMetric,
      s"metric '$m' does not match the PQ codebooks' training metric " +
        s"'${cb.canonicalMetric}' — rebuild the PQ index under '$m'")
    val rankCellsUdf = udf((v: Seq[Double]) => coding.rankCells(v.toArray, probes))
    val exploded = queries
      .withColumn("__cell__",
        explode(rankCellsUdf(col(queryVecCol).cast("array<double>"))))
    val cells = probedCellUnion(exploded, coding.numCells)
    val pqDf = pruneToCells(loadPq(store, codingName, source, column),
      cells, coding.numCells)
    val fallback = residualFallbackAnchor(cb, coding)
    val lutUdf = udf((v: Seq[Double], cell: Long) =>
      graft.coder.PQ.adcLut(cb, fallback, v.toArray, cell).toSeq)
    val qSide = exploded
      .withColumn("__LUT__",
        lutUdf(col(queryVecCol).cast("array<double>"), col("__cell__")))
      .select(col(queryIdCol), col("__cell__"), col("__LUT__"))
    // coarse: (id, cell, m-byte codes) ride the per-cell join, the LUT
    // lookup lands in the join projection, and the per-query window
    // exchange carries SCALARS only — neither vectors, codes, nor
    // tables cross the shuffle
    val adc = org.apache.spark.sql.GraftShims.column(
      graft.functions.PQAdcScoreLut(
        org.apache.spark.sql.GraftShims.expression(col(PqCol)),
        org.apache.spark.sql.GraftShims.expression(col("__LUT__")),
        cb.m, cb.k, graft.coder.PQ.adcSqrtFinish(cb)))
    val coarse = pqDf.select(col(idCol), col(CodeCol), col(PqCol))
      .join(broadcast(qSide), col(CodeCol) === col("__cell__"))
      .withColumn("__ADC__", adc)
      .select(col(queryIdCol), col(idCol), col("__ADC__"))
    val wCoarse = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__ADC__").asc, col(idCol).asc)
    val survivors = coarse.withColumn("__crank__", row_number().over(wCoarse))
      .filter(col("__crank__") <= candidates)
      .select(col(queryIdCol), col(idCol))
    // scale discipline of the rerank tail: see [[rerankSurvivors]]
    rerankSurvivors(survivors, pqDf, queries, queryIdCol, queryVecCol,
      column, idCol, k, m, tieBreak)
  }

  /** Batch retrieve-rerank k-NN join: [[searchRerank]]'s two-stage shape
    * amortized over a query batch — stage 1 ranks rows by their CELL's
    * position in each query's probe list (the additive coarse score,
    * carried by the broadcast join key itself via `posexplode`: no
    * per-query score table, no vector math at all), stage 2 reads raw
    * vectors only for each query's `candidates` survivors and scores
    * them exactly. With probes = numCells and candidates ≥ corpus size
    * this equals the exact k-NN join (the oracle contract). Coarse ties
    * inside one cell break on `idCol` — deterministic candidate
    * selection, as [[sqKnnJoin]]. Query batches estimated past
    * `broadcastCapBytes` are hash-chunked (see [[ivfKnnJoin]]). */
  def rerankKnnJoin(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      probes: Int,
      candidates: Int,
      idCol: String,
      metric: Option[String] = None,
      tieBreak: Seq[String] = Nil,
      broadcastCapBytes: Long = Search.QueryBroadcastCap): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val qs = queries.select(col(queryIdCol), col(queryVecCol))
    Search.chunkByBroadcastSize(qs, queryIdCol, queryVecCol, probes, broadcastCapBytes)
      .map(ch => rerankKnnJoinChunk(store, codingName, source, column, ch,
        queryIdCol, queryVecCol, k, probes, candidates, idCol, metric, tieBreak))
      .reduce(_.unionByName(_))
  }

  private def rerankKnnJoinChunk(
      store: Store,
      codingName: String,
      source: String,
      column: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      probes: Int,
      candidates: Int,
      idCol: String,
      metric: Option[String],
      tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coding = store.loadCoding(codingName)
    val m = metric.getOrElse(coding.config.metric)
    val rankCellsUdf = udf((v: Seq[Double]) => coding.rankCells(v.toArray, probes))
    // posexplode: the position in the probe list IS the coarse score
    val exploded = queries
      .select(col(queryIdCol),
        posexplode(rankCellsUdf(col(queryVecCol).cast("array<double>"))))
      .withColumnRenamed("pos", "__cell_rank__")
      .withColumnRenamed("col", "__cell__")
    val cells = probedCellUnion(exploded, coding.numCells)
    val corpus = pruneToCells(load(store, codingName, source, column),
      cells, coding.numCells)
    // coarse: (id, cell) only — at 100 TB the coarse stage never reads
    // a float vector
    val coarse = corpus.select(col(idCol), col(CodeCol))
      .join(broadcast(exploded), col(CodeCol) === col("__cell__"))
      .select(col(queryIdCol), col(idCol), col("__cell_rank__"))
    val wCoarse = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__cell_rank__").asc, col(idCol).asc)
    val survivors = coarse.withColumn("__crank__", row_number().over(wCoarse))
      .filter(col("__crank__") <= candidates)
      .select(col(queryIdCol), col(idCol))
    // scale discipline of the rerank tail: see [[rerankSurvivors]]
    rerankSurvivors(survivors, corpus, queries, queryIdCol, queryVecCol,
      column, idCol, k, m, tieBreak)
  }
}
