package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.coder.{Coder, CoderConfig, Coding}

/** Filesystem-backed catalog.
  *
  * Layout mirrors the reference root
  * (`/root/reference/src/fenix/io/table/table.py:9`,
  * `io/coder/coder.py:120-127`, `io/index/index.py:14-29`) but with
  * cluster-scale storage choices:
  *
  * {{{
  * <root>/sources/<name>/                      Parquet table
  * <root>/codings/<name>/centroids/            Parquet (codebook, cell, centroid)
  * <root>/codings/<name>/config.json           training config
  * <root>/indexes/<source>/<column>/<coding>/  Parquet partitioned by __CODED_ID__
  * }}}
  *
  * Differences by design (SURVEY §1.3, §2.6): no server-global session
  * state (all scan parameters are method arguments); the index is a
  * cell-partitioned copy of the table, NOT a positionally-joined sidecar
  * (Spark has no stable row order); drop-index actually removes the index
  * directories (fixes the reference leak, `flight.py:95-100`).
  *
  * All paths go through the Hadoop `FileSystem` API so the same code runs
  * on local disk, HDFS, or object stores.
  */
class Store(val spark: SparkSession, val root: String) {
  private[graft] def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Every table/coding/column/model name becomes a filesystem path
    * segment — reject anything outside `[A-Za-z0-9._-]` (and `.`/`..`
    * traversal) BEFORE it reaches a Path. Central here so both the
    * library API and the HTTP server get the same guarantee.
    *
    * The contract applies RETROACTIVELY: read and drop paths validate
    * too, so an artifact persisted under a name outside the character
    * class (possible only before this guard existed, or by writing to
    * the store directory out-of-band) is unreachable through the API —
    * rename it on disk to a legal name to recover it. Uniform
    * validation is deliberate: a read-side exemption would re-open the
    * traversal surface this exists to close. */
  private def safeSeg(name: String): String = {
    require(name.nonEmpty && name.length <= 255 && name != "." && name != ".." &&
      name.forall(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '-'),
      s"invalid name '$name': allowed characters are [A-Za-z0-9._-]")
    require(!name.endsWith(".graft-old"),
      s"invalid name '$name': the .graft-old suffix is reserved for " +
        "replaceTable's crash-safe aside copy")
    name
  }

  private def sourcePath(name: String) = s"$root/sources/${safeSeg(name)}"
  /** Public path of a named table's parquet directory (streaming sinks
    * need it for `writeStream.option("path", …)`). */
  def tablePath(name: String): String = sourcePath(name)
  private def codingPath(name: String) = s"$root/codings/${safeSeg(name)}"
  def indexPath(source: String, column: String, coding: String) =
    s"$root/indexes/${safeSeg(source)}/${safeSeg(column)}/${safeSeg(coding)}"
  /** IVF+PQ variant of [[indexPath]]: cell-partitioned copy + codes column. */
  def pqIndexPath(source: String, column: String, coding: String) =
    s"$root/pq_indexes/${safeSeg(source)}/${safeSeg(column)}/${safeSeg(coding)}"
  /** IVF+SQ8 variant: cell-partitioned copy + 8-bit quantized vectors. */
  def sqIndexPath(source: String, column: String, coding: String) =
    s"$root/sq_indexes/${safeSeg(source)}/${safeSeg(column)}/${safeSeg(coding)}"
  /** IVF+BQ variant: cell-partitioned copy + 1-bit sign codes. */
  def bqIndexPath(source: String, column: String, coding: String) =
    s"$root/bq_indexes/${safeSeg(source)}/${safeSeg(column)}/${safeSeg(coding)}"
  /** Lexical (BM25) inverted index: term-bucket-partitioned postings
    * plus the doc-length sidecar table. */
  def lexIndexPath(source: String, column: String) =
    s"$root/lex_indexes/${safeSeg(source)}/${safeSeg(column)}"
  /** Fuzzy (edit-distance) lookup index: segment-bucket-partitioned
    * PassJoin artifacts plus the (id, t, len) base table. */
  def fuzzyIndexPath(source: String, column: String) =
    s"$root/fuzzy_indexes/${safeSeg(source)}/${safeSeg(column)}"

  /** Write small sidecar bytes (e.g. PQ codebooks) through the store's
    * filesystem, so the layout works on HDFS/object stores too. */
  def writeSidecar(path: String, bytes: Array[Byte]): Unit = {
    val out = fs.create(new Path(path), true)
    try out.write(bytes) finally out.close()
  }

  def readSidecar(path: String): Array[Byte] = {
    val in = fs.open(new Path(path))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
  }

  def sidecarExists(path: String): Boolean = fs.exists(new Path(path))

  private def list(dir: String): Seq[String] = {
    val p = new Path(dir)
    if (!fs.exists(p)) Nil
    else {
      val names = fs.listStatus(p).filter(_.isDirectory)
        .map(_.getPath.getName).toSeq
      val live = names.filterNot(_.endsWith(".graft-old"))
      // a LONE aside (a replaceTable swap crashed between its two
      // renames) is readable via loadTable's fallback — surface it
      // under its base name, or listings/exists-based routes would
      // report a readable table absent and DELETE could never reach
      // it. An aside alongside its live dir stays hidden (stale copy).
      val liveSet = live.toSet
      val ghosts = names.filter(_.endsWith(".graft-old"))
        .map(_.stripSuffix(".graft-old")).filterNot(liveSet)
      (live ++ ghosts).sorted
    }
  }

  // ——— Tables (S1-S6) ———

  /** Replace table `name` with `df` via staging + swap (the upsert/merge
    * path, where `df` typically READS the very table being replaced).
    *
    * `mode("overwrite")` truncates the destination before the (long)
    * distributed rewrite even starts, so a crash mid-write loses the
    * whole table and a concurrent reader can observe a partial one.
    * Here the new contents are fully written to a staging directory
    * first; the swap is then metadata ops only: the OLD table is renamed
    * ASIDE (never deleted before the new one is live), staging renames
    * into place, and only then is the aside copy dropped. A crash at any
    * point leaves a complete table readable: before the aside-rename,
    * the old table is untouched; between the two renames, the old table
    * sits at `<dest>.graft-old` — [[loadTable]] falls back to it
    * read-only, and the NEXT replaceTable completes the swap (it reads
    * through the fallback, skips the aside-rename since dest is absent,
    * and installs the fresh staging copy); after the staging rename the
    * new table is live regardless of whether the aside cleanup ran.
    * Readers racing the swap see old-or-new, never partial — the residue
    * is the two-rename-sized window where the path is briefly absent
    * (Hadoop rename cannot atomically replace a non-empty directory; on
    * object stores without atomic rename the window widens to a copy,
    * the documented trade-off). */
  def replaceTable(name: String, df: DataFrame): Unit = {
    val dest = new Path(sourcePath(name))
    val aside = new Path(sourcePath(name) + ".graft-old")
    val staging = new Path(s"$root/staging/${safeSeg(name)}")
    if (fs.exists(staging)) fs.delete(staging, true)
    // the FULL replacement is written before anything is renamed — df
    // may read the very table being replaced (upsert shape) or, after a
    // crashed swap, its aside copy via [[loadTable]]'s read fallback
    graft.types.Tensors.enforceDeclaredShapes(df)
      .write.mode("overwrite").parquet(staging.toString)
    // a stale aside from a prior swap that crashed AFTER going live is
    // dropped only when the destination is in fact live; in the
    // crashed-between-renames state (dest absent) it survives as the
    // readable copy until the new table is in place
    if (fs.exists(aside) && fs.exists(dest)) fs.delete(aside, true)
    if (fs.exists(dest)) require(fs.rename(dest, aside),
      s"replaceTable: aside rename $dest -> $aside failed (table untouched)")
    fs.mkdirs(dest.getParent)
    require(fs.rename(staging, dest),
      s"replaceTable: rename $staging -> $dest failed (old table intact at " +
        s"$aside, new table left in staging)")
    if (fs.exists(aside)) fs.delete(aside, true)
  }

  /** Write a table; columns declared as fixed-shape tensors (via
    * `Tensors.asTensor` metadata) are shape-checked during the write, so a
    * ragged vector fails ingest rather than a later distance/assign. */
  def createTable(name: String, df: DataFrame): Unit =
    graft.types.Tensors.enforceDeclaredShapes(df)
      .write.mode("overwrite").parquet(sourcePath(name))

  /** Import an external CSV, JSON, or Arrow IPC stream file set as a
    * named table. For CSV/JSON the schema is caller-supplied DDL, never
    * inferred (the reference's schema contract, SURVEY §1.2) and parsing
    * is FAILFAST (a malformed record fails the import rather than
    * becoming silent nulls). For `arrow` — the reference's native format
    * (`io/arrow/arrow.py:6-21`) — the schema travels IN the file
    * ([[graft.sources.ArrowIpc]]); a non-empty `schemaDdl` is validated
    * against it (names + types) rather than applied. Either way the data
    * lands in the store's parquet layout through the normal ingest path —
    * tensor shape enforcement included. */
  def importTable(name: String, path: String, format: String, schemaDdl: String,
      options: Map[String, String] = Map.empty): Unit = {
    require(Set("csv", "json", "arrow").contains(format),
      s"unsupported import format '$format' (csv | json | arrow)")
    val df =
      if (format == "arrow") {
        val got = graft.sources.ArrowIpc.readStream(spark, path)
        if (schemaDdl.nonEmpty) {
          val want = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
          val gotShape = got.schema.map(f => (f.name, f.dataType))
          val wantShape = want.map(f => (f.name, f.dataType))
          require(gotShape == wantShape,
            s"arrow file schema $gotShape does not match declared $wantShape")
        }
        got
      } else
        spark.read.schema(schemaDdl).options(options)
          .option("mode", "FAILFAST").format(format).load(path)
    createTable(name, df)
  }

  /** Load one or many sources; many ⇒ vertical concat (S4/P7,
    * `table.py:12-21`).
    *
    * Read-only crash fallback: if a [[replaceTable]] swap crashed
    * between its two renames, the table sits complete at
    * `<dest>.graft-old` with the destination path absent — readers fall
    * back to the aside copy (no mutation, so no race with a live
    * writer; the next replaceTable performs the mutating recovery). */
  def loadTable(names: String*): DataFrame = {
    require(names.nonEmpty, "at least one source name")
    names.map { n =>
      val p = sourcePath(n)
      val path =
        if (!fs.exists(new Path(p)) && fs.exists(new Path(p + ".graft-old")))
          p + ".graft-old"
        else p
      spark.read.parquet(path)
    }.reduce(_ unionByName _)
  }

  def listTables(): Seq[String] = list(s"$root/sources")

  def tableExists(name: String): Boolean =
    fs.exists(new Path(sourcePath(name))) ||
      // crashed-swap aside: readable via loadTable's fallback
      fs.exists(new Path(sourcePath(name) + ".graft-old"))

  /** Metadata-cheap content stamp of a stored source: MD5 over the
    * sorted (name, length, mtime) file listing of its directory. Any
    * rewrite — including one that preserves the row count — lands new
    * files and changes the stamp, so "stamp unchanged" is a far stronger
    * freshness proxy than count equality (one FS listing, no data
    * scan). */
  def sourceStamp(name: String): String = {
    if (!fs.exists(new Path(sourcePath(name)))) return "absent"
    stampOf(sourceListing(name))
  }

  /** The sorted (name:len:mtime) file entries behind [[sourceStamp]] —
    * persisted by the index stamp sidecar so sync/repair can diff WHICH
    * files changed, not just that something did. */
  def sourceListing(name: String): Seq[String] = {
    val p = new Path(sourcePath(name))
    if (!fs.exists(p)) Nil
    else fs.listStatus(p)
      // data files only: parquet readers ignore _/.-prefixed files, and
      // a rewritten _SUCCESS marker must not read as "file modified" to
      // the append-only subset gate or the repair diff
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .sorted.toSeq
  }

  /** MD5 of a file listing (the stamp format). */
  def stampOf(entries: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(entries.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Bucketed table: pre-hash-partitioned AND sorted on `bucketCol` so
    * equi-joins/aggregations between co-bucketed tables plan with NO
    * shuffle exchange (registered in the session catalog — bucketing
    * metadata lives there, the data under the store root). At 100 TB,
    * bucketing the fact tables on their join key once pays for every
    * downstream join. */
  def createBucketedTable(name: String, df: DataFrame, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", s"$root/bucketed/$name")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(name)

  def loadBucketedTable(name: String): DataFrame = spark.table(name)

  def dropTable(name: String): Unit = {
    fs.delete(new Path(sourcePath(name)), true)
    // a crashed-swap aside is the same logical table — dropping the
    // name must not leave a readable ghost behind
    fs.delete(new Path(sourcePath(name) + ".graft-old"), true)
  }

  /** Rewrite a table into `numFiles` files (small-file compaction after
    * many incremental appends — at scale, file-count hygiene is what keeps
    * scan task counts and NameNode/liststatus pressure sane). */
  def compact(name: String, numFiles: Int): Unit = {
    val src = sourcePath(name)
    val tmp = s"$src.__compact_tmp__"
    spark.read.parquet(src).repartition(numFiles)
      .write.mode("overwrite").parquet(tmp)
    fs.delete(new Path(src), true)
    require(fs.rename(new Path(tmp), new Path(src)), s"rename failed for $name")
  }

  /** Range-cluster a table on `sortCol`: repartitionByRange + sort within
    * partitions, so each output file covers a disjoint value range and
    * Parquet row-group min/max statistics skip whole files for range
    * predicates (the poor man's clustering key — at 100 TB this is the
    * difference between scanning one file and scanning all of them for a
    * `WHERE ts BETWEEN …`). */
  def optimizeLayout(name: String, sortCol: String, numFiles: Int): Unit = {
    val src = sourcePath(name)
    val tmp = s"$src.__layout_tmp__"
    spark.read.parquet(src)
      .repartitionByRange(numFiles, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(tmp)
    fs.delete(new Path(src), true)
    require(fs.rename(new Path(tmp), new Path(src)), s"rename failed for $name")
  }

  /** Z-order (Morton-curve) multi-column clustering: interleave the bits
    * of min/max-normalized column ranks and range-cluster on the
    * resulting z-value, so each output file covers a small HYPERCUBE of
    * the value space and Parquet min/max stats skip files for predicates
    * on ANY of the clustered columns — where [[optimizeLayout]] clusters
    * one column perfectly and leaves the others unclustered. The layout
    * move behind Delta/Iceberg `OPTIMIZE ZORDER BY`, for the multi-filter
    * scan patterns a 100 TB store actually serves.
    *
    * Normalization is linear in [min, max] by default (ONE agg pass, no
    * global sort), so heavily skewed columns collapse onto few z-cells
    * and lose within-dense-region pruning; `equiDepth = true` ranks each
    * column by ~256 approximate quantiles instead (Greenwald-Khanna
    * sketch — still no global sort), spending the z-curve's resolution
    * where the data actually is. Numeric columns only. */
  def zorderLayout(name: String, cols: Seq[String], numFiles: Int,
      equiDepth: Boolean = false): Unit = {
    import org.apache.spark.sql.functions._
    require(cols.size >= 2 && cols.size <= 4,
      s"zorderLayout interleaves 2-4 columns, got ${cols.size} " +
        "(one column wants optimizeLayout; >4 dims dilute per-dim locality)")
    val src = sourcePath(name)
    val tmp = s"$src.__zorder_tmp__"
    val df = spark.read.parquet(src)
    val n = cols.size
    val bitsPer = if (equiDepth) 8 else math.min(16, 63 / n)
    val scale = (1L << bitsPer) - 1
    val ranks: Seq[org.apache.spark.sql.Column] =
      if (equiDepth) {
        val doubled = cols.foldLeft(df)((d, c) =>
          d.withColumn(s"__zq_$c", col(c).cast("double")))
        val probs = (1 until (1 << bitsPer)).map(_.toDouble / (1 << bitsPer)).toArray
        // ONE Greenwald-Khanna pass sketches every column (the
        // multi-column overload) — per-column calls would rescan the
        // corpus n times at exactly the scale this feature targets
        val allBounds = doubled.stat.approxQuantile(
          cols.map(c => s"__zq_$c").toArray, probs, 0.001)
        cols.zip(allBounds).map { case (c, bounds) =>
          // rank = quantile-bucket index by binary search. A UDF is fine
          // here: this is a one-shot layout REWRITE job, not a query path
          val rank = udf { (v: Double) =>
            val i = java.util.Arrays.binarySearch(bounds, v)
            (if (i >= 0) i + 1 else -(i + 1)).toLong // insertion point
          }
          rank(col(c).cast("double"))
        }
      } else {
        val aggs = cols.flatMap(c =>
          Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
        val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        cols.zipWithIndex.map { case (c, i) =>
          require(!stats.isNullAt(2 * i) && !stats.isNullAt(2 * i + 1),
            s"zorderLayout: column '$c' of '$name' has no non-null numeric " +
              "values (empty table, all-null, or non-numeric column)")
          Store.linearRank(col(c),
            stats.getDouble(2 * i), stats.getDouble(2 * i + 1), bitsPer)
        }
      }
    val z = Store.mortonInterleave(ranks, bitsPer)
    df.withColumn("__Z__", z)
      .repartitionByRange(numFiles, col("__Z__"))
      .sortWithinPartitions("__Z__")
      .drop("__Z__")
      .write.mode("overwrite").parquet(tmp)
    fs.delete(new Path(src), true)
    require(fs.rename(new Path(tmp), new Path(src)), s"rename failed for $name")
  }

  /** Catalog stats for a table: (rowCount, totalBytes, fileCount). */
  def tableStats(name: String): (Long, Long, Int) = {
    val p = new Path(sourcePath(name))
    val files = fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val rows = spark.read.parquet(sourcePath(name)).count()
    (rows, files.map(_.getLen).sum, files.length)
  }

  // ——— BPE tokenizer models ———

  def bpeModelPath(name: String): String = s"$root/models/bpe/${safeSeg(name)}.json"

  def saveBpeModel(name: String, model: graft.ext.Bpe.BpeModel): Unit =
    writeSidecar(bpeModelPath(name), model.toJson.getBytes("UTF-8"))

  def loadBpeModel(name: String): graft.ext.Bpe.BpeModel =
    graft.ext.Bpe.fromJson(new String(readSidecar(bpeModelPath(name)), "UTF-8"))

  def listBpeModels(): Seq[String] = {
    val p = new Path(s"$root/models/bpe")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isFile)
      .map(_.getPath.getName.stripSuffix(".json")).toSeq.sorted
  }

  def dropBpeModel(name: String): Unit =
    fs.delete(new Path(bpeModelPath(name)), false)

  // ——— n-gram LM models (perplexity quality filtering) ———

  def ngramModelPath(name: String): String = s"$root/models/ngram/${safeSeg(name)}.json"

  def saveNgramModel(name: String, model: graft.ext.NgramLm.NgramLmModel): Unit =
    writeSidecar(ngramModelPath(name), model.toJson.getBytes("UTF-8"))

  /** Content-keyed model cache: repeated loads of an unchanged model file
    * (the server's per-request perplexity route) return the SAME instance,
    * so its memoized broadcast is reused instead of accumulating one (or
    * more) broadcast blocks per request. The md5 check re-reads the small
    * sidecar each call, so a retrained model is picked up immediately. */
  @transient private lazy val ngramModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, graft.ext.NgramLm.NgramLmModel)]()

  def loadNgramModel(name: String): graft.ext.NgramLm.NgramLmModel = {
    val bytes = readSidecar(ngramModelPath(name))
    val digest = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("MD5").digest(bytes))
    val cached = ngramModelCache.get(name)
    if (cached != null && cached._1 == digest) cached._2
    else {
      val m = graft.ext.NgramLm.fromJson(new String(bytes, "UTF-8"))
      ngramModelCache.put(name, (digest, m))
      m
    }
  }

  def listNgramModels(): Seq[String] = {
    val p = new Path(s"$root/models/ngram")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isFile)
      .map(_.getPath.getName.stripSuffix(".json")).toSeq.sorted
  }

  // ——— quality classifier models (model-based filtering) ———

  def qualityModelPath(name: String): String =
    s"$root/models/quality/${safeSeg(name)}.json"

  def saveQualityModel(name: String,
      model: graft.ext.QualityModel.Logistic): Unit =
    writeSidecar(qualityModelPath(name), model.toJson.getBytes("UTF-8"))

  def loadQualityModel(name: String): graft.ext.QualityModel.Logistic =
    graft.ext.QualityModel.fromJson(
      new String(readSidecar(qualityModelPath(name)), "UTF-8"))

  def listQualityModels(): Seq[String] = {
    val p = new Path(s"$root/models/quality")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isFile)
      .map(_.getPath.getName.stripSuffix(".json")).toSeq.sorted
  }

  def dropQualityModel(name: String): Unit =
    fs.delete(new Path(qualityModelPath(name)), false)

  def dropNgramModel(name: String): Unit = {
    ngramModelCache.remove(name)
    fs.delete(new Path(ngramModelPath(name)), false)
  }

  // ——— PCA models (embedding dimensionality reduction) ———

  def pcaModelPath(name: String): String = s"$root/models/pca/${safeSeg(name)}.json"

  def savePcaModel(name: String, model: graft.ext.Embeddings.PcaModel): Unit =
    writeSidecar(pcaModelPath(name), model.toJson.getBytes("UTF-8"))

  def loadPcaModel(name: String): graft.ext.Embeddings.PcaModel =
    graft.ext.Embeddings.fromJson(new String(readSidecar(pcaModelPath(name)), "UTF-8"))

  def listPcaModels(): Seq[String] = {
    val p = new Path(s"$root/models/pca")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isFile)
      .map(_.getPath.getName.stripSuffix(".json")).toSeq.sorted
  }

  def dropPcaModel(name: String): Unit =
    fs.delete(new Path(pcaModelPath(name)), false)

  // ——— probe/candidate advisor advice (persisted per coding — the
  // advisor's ground-truth pass is a full corpus scan; "run once per
  // (coding, corpus) and persist" is only real if something persists) ———

  def probeAdvicePath(coding: String): String =
    s"$root/models/advice/${safeSeg(coding)}.json"

  def saveProbeAdvice(coding: String, json: Array[Byte]): Unit =
    writeSidecar(probeAdvicePath(coding), json)

  def loadProbeAdviceBytes(coding: String): Option[Array[Byte]] = {
    val p = probeAdvicePath(coding)
    if (sidecarExists(p)) Some(readSidecar(p)) else None
  }

  def dropProbeAdvice(coding: String): Unit =
    fs.delete(new Path(probeAdvicePath(coding)), false)

  /** Candidate advice is keyed per (coding, tier, probes): the budget is
    * a property of the serving tier AT a probe count, not of the coding
    * alone (`_cand_` + the tier name keeps the namespace disjoint from
    * probe-advice files, whose stem is the bare coding name). */
  def candidateAdvicePath(coding: String, tier: String, probes: Int): String =
    s"$root/models/advice/${safeSeg(coding)}_cand_${safeSeg(tier)}_p$probes.json"

  def saveCandidateAdvice(coding: String, tier: String, probes: Int,
      json: Array[Byte]): Unit =
    writeSidecar(candidateAdvicePath(coding, tier, probes), json)

  def loadCandidateAdviceBytes(coding: String, tier: String,
      probes: Int): Option[Array[Byte]] = {
    val p = candidateAdvicePath(coding, tier, probes)
    if (sidecarExists(p)) Some(readSidecar(p)) else None
  }

  def dropCandidateAdvice(coding: String, tier: String, probes: Int): Unit =
    fs.delete(new Path(candidateAdvicePath(coding, tier, probes)), false)

  // ——— Codings (V3, A1) ———

  def saveCoding(name: String, coding: Coding): Unit = {
    codingCache.remove(name)
    import spark.implicits._
    val c = coding.config
    val rows = for {
      j <- coding.centroids.indices
      i <- coding.centroids(j).indices
    } yield (j, i, coding.centroids(j)(i).toSeq)
    rows.toDF("codebook", "cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"${codingPath(name)}/centroids")
    val json =
      s"""{"metric":"${c.metric}","codebookSize":${c.codebookSize},"numCodebooks":${c.numCodebooks},
         |"batchSize":${c.batchSize},"numEpochs":${c.numEpochs},"seed":${c.seed},
         |"maxStepsPerEpoch":${c.maxStepsPerEpoch}}""".stripMargin.replace("\n", "")
    val out = fs.create(new Path(s"${codingPath(name)}/config.json"), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  // Driver-side coding cache: codings are tiny (n·k·d doubles) but live
  // in Parquet, so a probed search would otherwise pay 2 small Spark jobs
  // per call just to reload unchanged centroids. Invalidated on save/drop.
  private val codingCache =
    new java.util.concurrent.ConcurrentHashMap[String, Coding]()

  def loadCoding(name: String): Coding = {
    val cached = codingCache.get(name)
    if (cached != null) return cached
    val fresh = loadCodingUncached(name)
    codingCache.put(name, fresh)
    fresh
  }

  private def loadCodingUncached(name: String): Coding = {
    val in = fs.open(new Path(s"${codingPath(name)}/config.json"))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def field(k: String): String =
      s""""$k":\\s*("?)([^,}"]*)\\1""".r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalStateException(s"missing $k in $json")).group(2)
    val config = CoderConfig(
      metric = field("metric"),
      codebookSize = field("codebookSize").toInt,
      numCodebooks = field("numCodebooks").toInt,
      batchSize = field("batchSize").toInt,
      numEpochs = field("numEpochs").toInt,
      seed = field("seed").toLong,
      maxStepsPerEpoch = field("maxStepsPerEpoch").toInt)
    val rows = spark.read.parquet(s"${codingPath(name)}/centroids").collect()
    val n = config.numCodebooks; val k = config.codebookSize
    val centroids = Array.ofDim[Array[Double]](n, k)
    rows.foreach { r =>
      centroids(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    Coding(centroids, config)
  }

  def makeCoder(name: String, source: String, column: String, config: CoderConfig): Coding = {
    val coding = Coder.train(loadTable(source), column, config)
    saveCoding(name, coding)
    coding
  }

  def listCodings(): Seq[String] = list(s"$root/codings")

  /** Drop a coding AND every index built from it (fixes the reference's
    * drop-index leak, `flight.py:92-100` / SURVEY A4). */
  def dropCoding(name: String): Unit = {
    codingCache.remove(name)
    fs.delete(new Path(codingPath(name)), true)
    for {
      source <- list(s"$root/indexes")
      column <- list(s"$root/indexes/$source")
      coding <- list(s"$root/indexes/$source/$column") if coding == name
    } fs.delete(new Path(indexPath(source, column, coding)), true)
    for {
      source <- list(s"$root/pq_indexes")
      column <- list(s"$root/pq_indexes/$source")
      coding <- list(s"$root/pq_indexes/$source/$column") if coding == name
    } fs.delete(new Path(pqIndexPath(source, column, coding)), true)
    for {
      source <- list(s"$root/sq_indexes")
      column <- list(s"$root/sq_indexes/$source")
      coding <- list(s"$root/sq_indexes/$source/$column") if coding == name
    } fs.delete(new Path(sqIndexPath(source, column, coding)), true)
    for {
      source <- list(s"$root/bq_indexes")
      column <- list(s"$root/bq_indexes/$source")
      coding <- list(s"$root/bq_indexes/$source/$column") if coding == name
    } fs.delete(new Path(bqIndexPath(source, column, coding)), true)
    // advisor sidecars measured for this coding die with it: probe
    // advice (bare coding stem) and every (tier, probes) candidate
    // advice — the tier set is matched explicitly so a sibling coding
    // whose NAME merely starts with "<name>_cand_" is never collected
    dropProbeAdvice(name)
    val candRe = (java.util.regex.Pattern.quote(safeSeg(name)) +
      """_cand_(sq|bq|pq|rerank)_p\d+\.json""").r
    val adviceDir = new Path(s"$root/models/advice")
    if (fs.exists(adviceDir))
      fs.listStatus(adviceDir)
        .filter(s => s.isFile &&
          candRe.pattern.matcher(s.getPath.getName).matches())
        .foreach(s => fs.delete(s.getPath, false))
  }

  def listIndexes(): Seq[(String, String, String)] =
    for {
      source <- list(s"$root/indexes")
      column <- list(s"$root/indexes/$source")
      coding <- list(s"$root/indexes/$source/$column")
    } yield (source, column, coding)

  /** Delete the whole root (A5, `flight.py:102-103`). */
  def remove(): Unit = fs.delete(new Path(root), true)
}

/** Pure-Column pieces of the Z-order key, exposed so queries can compute
  * (and oracles can mirror) the deterministic bit interleave without a
  * layout rewrite. */
object Store {
  import org.apache.spark.sql.Column

  /** Linear min/max normalization of a numeric column to a
    * [0, 2^bitsPer − 1] rank — the one-agg-pass default of
    * [[Store.zorderLayout]] (skew caveat documented there). */
  def linearRank(c: Column, lo: Double, hi: Double, bitsPer: Int): Column = {
    val scale = (1L << bitsPer) - 1
    if (hi == lo) lit(0L)
    else least(greatest(
      ((c.cast("double") - lit(lo)) / lit(hi - lo)) * scale, lit(0.0)),
      lit(scale.toDouble)).cast("long")
  }

  /** Morton bit interleave of n pre-normalized long ranks — a
    * driver-built chain of codegen'd shift/or builtins (bitsPer·n
    * terms), no UDF in the job. Bit b of rank j lands at position
    * b·n + j. */
  def mortonInterleave(ranks: Seq[Column], bitsPer: Int): Column = {
    val n = ranks.size
    (0 until bitsPer).flatMap { b =>
      (0 until n).map { j =>
        shiftleft(shiftrightunsigned(ranks(j), b).bitwiseAND(lit(1L)),
          b * n + j)
      }
    }.reduce(_.bitwiseOR(_))
  }
}
