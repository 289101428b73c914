package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface (§2 #54-#55).
  *
  * The reference persists daily rkyv blobs (generate_daily_blobs,
  * main.rs:1004) and ingests external JSON lists (fetch_list,
  * main.rs:3046). The lake-native equivalents: a date-partitioned
  * parquet sink whose partition column prunes at read time, and a
  * schema-explicit JSON-lines reader.
  */
object Sources {

  /** Daily archive writer: hive-style `day=YYYY-MM-DD/` parquet
    * partitions. At 100 TB this layout IS the firehose-window index:
    * InputWindow filters become PartitionFilters (zero data touched
    * outside the window).
    */
  def writeDailyArchive(events: DataFrame, outDir: String): Unit =
    events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(col("day")) // one writer wave per day partition
      .write
      .partitionBy("day")
      .mode(SaveMode.Overwrite)
      .parquet(outDir)

  /** Read back with a day range — the filter must land in
    * PartitionFilters, not in post-scan evaluation.
    */
  def readDailyArchive(s: SparkSession, dir: String, fromDay: String, toDay: String): DataFrame =
    s.read.parquet(dir).filter(col("day") >= fromDay && col("day") <= toDay)

  /** Retention sweep on the daily archive — the batch analogue of the
    * reference's clean_up_old_posts loop (main.rs:4008: posts older
    * than 7 days are continuously dropped from the store and its
    * indexes). On a date-partitioned lake the sweep is a PARTITION
    * DROP: one metadata delete per expired `day=` directory, zero data
    * rewritten — O(partitions), not O(rows), which is what a 100 TB
    * archive needs. Goes through the Hadoop FileSystem API so the same
    * call works on HDFS / object stores, not just local disk.
    *
    * Returns the dropped day values (observability; the reference logs
    * its cleanup counts the same way).
    */
  def expireDailyArchive(s: SparkSession, dir: String, olderThanDay: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val expired = fs
      .listStatus(root)
      .toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      // hive-style day=yyyy-MM-dd partition names compare lexicographically
      .filter(p => p.getName.startsWith("day=") && p.getName.stripPrefix("day=") < olderThanDay)
    // fs.delete returns false (instead of throwing) on some stores —
    // only report days whose delete actually succeeded, so consumers
    // never record retention that did not happen and a re-sweep retries
    // the failures
    expired
      .filter(p => fs.delete(p, true))
      .map(_.getName.stripPrefix("day="))
      .sorted
  }

  /** Small-file compaction for one partition of an append-only sink
    * (the operational twin of [[appendServedLinks]]: every pipeline run
    * appends a file, so a hot partition accumulates thousands of tiny
    * parquet files and scan cost becomes file-open cost). Rewrites the
    * partition's rows into `targetFiles` files in a sibling temp dir,
    * then swaps it in via two renames — the standard lake compaction
    * move (rename is atomic-per-path on HDFS; object-store deployments
    * would version the directory instead). Readers between the two
    * renames see the partition briefly absent, never half-written —
    * acceptable for maintenance windows, and the swap is idempotent to
    * re-runs. Returns (filesBefore, filesAfter).
    */
  def compactPartition(s: SparkSession, partitionDir: String, targetFiles: Int = 1): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val part = new Path(partitionDir)
    val fs = part.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(part), s"no such partition: $partitionDir")
    def parquetFiles() =
      fs.listStatus(part).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles()
    if (before <= targetFiles) return (before, before)
    val tmp = new Path(partitionDir + ".compact.tmp")
    val old = new Path(partitionDir + ".compact.old")
    fs.delete(tmp, true); fs.delete(old, true)
    s.read.parquet(partitionDir).repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(part, old), s"compaction swap failed: could not move $part aside")
    require(fs.rename(tmp, part), s"compaction swap failed: could not move $tmp into place")
    fs.delete(old, true)
    (before, parquetFiles())
  }

  /** JSON-lines sink/source with explicit schema (schema inference is a
    * full extra pass at scale — never rely on it).
    */
  def writeJsonl(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(outDir)

  def readJsonl(s: SparkSession, dir: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(dir)

  /** CSV sink/source, schema-explicit, header on — the interchange
    * format externals hand over (the reference's list files). The
    * option set makes the round trip actually lossless: `\N` marks
    * nulls so empty strings survive as empty strings, and multiLine
    * reassembles quoted fields containing newlines.
    */
  def writeCsv(df: DataFrame, outDir: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("nullValue", "\\N")
      .csv(outDir)

  def readCsv(s: SparkSession, dir: String, schema: StructType): DataFrame =
    s.read
      .schema(schema)
      .option("header", "true")
      .option("nullValue", "\\N")
      .option("multiLine", "true")
      .csv(dir)

  /** Served-links audit sink (dump_links, main.rs:587 + LinkedPostsState,
    * main.rs:2546): the reference periodically persists which posts each
    * feed served. Here every pipeline run APPENDS its served frame's ids
    * as (feed_id, post_id, served_at_ms) rows to a
    * `day=/feed_id=/`-partitioned sink:
    *  - append-only parquet, so concurrent feed runs never clobber;
    *  - `day` first ⇒ [[expireDailyArchive]] doubles as the
    *    clean_post_links sweep (main.rs:161) — link retention is the
    *    same partition drop as post retention;
    *  - `feed_id` second ⇒ per-feed audit reads prune to one feed's
    *    partitions (PartitionFilters, test-pinned).
    */
  def appendServedLinks(
      served: DataFrame,
      idCol: String,
      feedId: String,
      servedAtMs: Long,
      outDir: String): Unit =
    served
      .select(
        date_format(timestamp_millis(lit(servedAtMs)), "yyyy-MM-dd").as("day"),
        lit(feedId).as("feed_id"),
        col(idCol).as("post_id"),
        lit(servedAtMs).as("served_at_ms"))
      // a feed serves one result page per run — single file per run, not
      // one shard per upstream partition
      .coalesce(1)
      .write
      .partitionBy("day", "feed_id")
      .mode(SaveMode.Append)
      .parquet(outDir)

  def readServedLinks(s: SparkSession, dir: String, feedId: String): DataFrame =
    s.read.parquet(dir).filter(col("feed_id") === feedId)

  /** Feed-resolver population — the documented-but-unbuilt hook behind
    * the `feed` input (main.rs:1704): the reference HTTP-fetches an
    * external feed's skeleton per query; in this engine served feeds
    * are already ARCHIVED (every run appends its page to the
    * served-links sink), so a feed's current skeleton is simply its
    * most recent run there. For each (feedUri → feed_id) this
    * materializes the one-column post-id relation Binding.feeds wants:
    * the read prunes to the feed's own partitions (feed_id is a
    * partition column) and the latest-run cut is a single-row
    * broadcast max — no full-sink scan, no shuffle of the links, and
    * feeds become composable inputs (one feed's output can seed
    * another's pipeline).
    */
  def resolveFeeds(
      s: SparkSession, linksDir: String, uris: Map[String, String]): Map[String, DataFrame] =
    uris.map { case (uri, feedId) =>
      val links = readServedLinks(s, linksDir, feedId)
      val latest = links.agg(max(col("served_at_ms")).as("__latest"))
      uri -> links
        .crossJoin(broadcast(latest)) // single row
        .filter(col("served_at_ms") === col("__latest"))
        .select(col("post_id"))
    }

  /** Text-corpus parquet sink tuned for 100 TB document tables: zstd
    * (higher ratio than the snappy default at comparable scan speed —
    * on a 100 TB corpus the delta is tens of TB of storage AND of scan
    * I/O) with a large dictionary-friendly page budget. Sorting within
    * partitions by the cluster-ish key first makes similar documents
    * adjacent, which is where parquet dictionary/prefix encodings win.
    */
  def writeTextCorpus(df: DataFrame, outDir: String, sortCols: Seq[String] = Nil): Unit = {
    val arranged = if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(col): _*) else df
    arranged.write
      .mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      // 8 MiB pages (parquet-mr default is 1 MiB): larger compression
      // windows help zstd on long text values
      .option("parquet.page.size", (8 * 1024 * 1024).toString)
      .parquet(outDir)
  }

  /** Binary-file ingestion — the bridge from REAL image/audio files on
    * disk (or any Hadoop-compatible store) to the engine's binary
    * `payload` column, which the header decoders
    * (TextOps.decodeImageMeta / decodeAudioMeta) and the test-pinned
    * mapPartitions library shape consume unchanged. Spark's binaryFile
    * source reads (path, modificationTime, length, content) with one
    * row per file, pushdown on the glob at file-listing time, and
    * partition-parallel reads governed by files.maxPartitionBytes — at
    * 100 TB the listing prunes before any byte moves, exactly like the
    * daily archive's partition pruning. (The reference has no
    * counterpart; this closes the r5 "files → payload column" gap.)
    */
  def readBinaryDir(s: SparkSession, dir: String, glob: String = "*"): DataFrame =
    s.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        col("path"),
        col("modificationTime").as("mod_time"),
        col("content").as("payload"))

  /** Persisted content-hash index — the artifact that makes exact
    * dedup INCREMENTAL: yesterday's corpus is represented by its
    * normalized-content hashes (md5 of the CCNet-style normalization,
    * the dedup_normalized device), so today's crawl dedups against all
    * history by ONE anti join instead of re-reading the corpus. At
    * 100 TB the index is ~1/1000th the corpus (32 hex chars + a
    * provenance id per unique doc) and the join shuffles on the hash —
    * the same balanced key every dedup op in the repo shuffles on.
    */
  /** Content-keyed cache directory for a persisted index (ADVICE r6):
    * the old fixed `/tmp/<basename>` scheme keyed the cache by
    * directory NAME only, so regenerating the dataset in place, or two
    * datasets sharing a basename, silently served a stale/foreign
    * index. Here the path embeds an md5 FINGERPRINT of the input's
    * identity — canonical path, builder config tag, and each input
    * parquet part's (name, length, mtime) — so changed data resolves
    * to a different directory, never a stale hit. On top of the
    * _SUCCESS torn-write guard, a `_FINGERPRINT` marker written AFTER
    * the build is re-validated against the recomputed fingerprint on
    * every hit, so a pre-seeded or half-built directory (the
    * world-writable-/tmp and concurrent-session hazards) fails
    * validation and is rebuilt rather than trusted. The marker doubles
    * as the torn-write guard (it only exists if `build` returned), so
    * it works for flat parquet dirs and multi-part index layouts
    * alike. Concurrent rebuilds of the SAME fingerprint race benignly:
    * both write identical content and the marker lands last.
    */
  def cachedIndexDir(dataDir: String, table: String, configTag: String)(
      build: String => Unit): String = {
    val fp = inputFingerprint(dataDir, table, configTag)
    val root =
      new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-index-cache")
    val dir = new java.io.File(root, fp)
    val marker = new java.io.File(dir, "_FINGERPRINT")
    val valid = marker.exists() && {
      val src = scala.io.Source.fromFile(marker)
      try src.mkString.trim == fp
      finally src.close()
    }
    if (!valid) {
      build(dir.getAbsolutePath)
      val w = new java.io.PrintWriter(marker)
      try w.print(fp)
      finally w.close()
    }
    dir.getAbsolutePath
  }

  /** md5 over (canonical path, config tag, per-part name:length:mtime)
    * of `<dataDir>/<table>.parquet` — the cache key for
    * [[cachedIndexDir]]. Cheap (driver-side metadata only), yet
    * changes whenever the input files are regenerated, moved, or the
    * builder config changes.
    */
  private[graft] def inputFingerprint(
      dataDir: String,
      table: String,
      configTag: String): String = {
    val f = new java.io.File(dataDir, s"$table.parquet")
    val parts =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq else Seq(f)
    val desc = (Seq(f.getCanonicalPath, configTag) ++
      parts.map(p => s"${p.getName}:${p.length}:${p.lastModified}")).mkString("|")
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(desc.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
  }

  /** Right-to-be-forgotten EXECUTION — the effectful side of the
    * catalog's user_erasure_audit (§2 #304). GDPR deletes arrive
    * continuously; a lake cannot rewrite 100 TB per request, so the
    * standard shape is (1) requests append to a tiny TOMBSTONE index,
    * (2) every read anti-joins it (erasure is immediately effective),
    * (3) a periodic sweep physically rewrites and the tombstones for
    * swept users can then be dropped. Duplicate/re-delivered requests
    * are harmless: the read path distincts, the sweep is idempotent.
    */
  def appendTombstones(requests: DataFrame, tombDir: String): Unit =
    requests.select(col("user_id").cast("long").as("user_id")).distinct()
      .write.mode(SaveMode.Append).parquet(tombDir)

  def readTombstones(s: SparkSession, tombDir: String): DataFrame =
    s.read.parquet(tombDir).select(col("user_id")).distinct()

  /** The logical erasure every consumer reads through: a broadcast
    * anti join against the (tiny) tombstone set. At 100 TB the
    * tombstones are a fraction of one dimension — the join costs a
    * broadcast, never a shuffle of the fact table.
    */
  def readActive(table: DataFrame, tombstones: DataFrame): DataFrame =
    table.join(broadcast(tombstones), Seq("user_id"), "left_anti")

  /** The physical sweep: rewrite the table minus tombstoned users.
    * Returns (rows_deleted, rows_kept) as the sweep's audit record.
    * Idempotent — re-sweeping an already-swept table deletes zero.
    */
  def sweepErasure(s: SparkSession, table: DataFrame, tombstones: DataFrame,
      outDir: String): (Long, Long) = {
    // count the INPUT before the overwrite: `table` is lazy, and if it
    // was read from outDir itself (an in-place re-sweep) a count taken
    // after the write would re-scan the already-rewritten data and
    // corrupt the audit record
    val total = table.count()
    val active = readActive(table, tombstones)
    active.write.mode(SaveMode.Overwrite).parquet(outDir)
    val kept = s.read.parquet(outDir).count()
    (total - kept, kept)
  }

  def buildHashIndex(docs: DataFrame, outDir: String): Unit =
    docs
      .select(md5(graft.queries.Round5Ops.normText(col("text"))).as("h"), col("doc_id"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("first_doc_id"))
      .write.mode(SaveMode.Overwrite).parquet(outDir)

  def readHashIndex(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(indexDir)

  /** Intake-dedup a new batch against the persisted index: the batch
    * first dedups ITSELF (min-doc_id survivor per hash — the family's
    * order-free keep rule), then anti-joins history. Emits the
    * surviving rows with all their columns.
    */
  def dedupAgainstIndex(docs: DataFrame, index: DataFrame): DataFrame = {
    val hashed = docs.withColumn("h", md5(graft.queries.Round5Ops.normText(col("text"))))
    val keep = hashed
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .join(index.select(col("h")), Seq("h"), "left_anti")
    hashed.join(keep, Seq("h", "doc_id"), "left_semi").drop("h")
  }

  /** Fold a batch's surviving hashes into the index (append-only; the
    * survivors are by construction absent from it). Re-delivering the
    * same batch afterwards dedups to zero — idempotent re-ingest,
    * test-pinned.
    */
  def appendToHashIndex(survivors: DataFrame, indexDir: String): Unit =
    survivors
      .select(md5(graft.queries.Round5Ops.normText(col("text"))).as("h"),
        col("doc_id").as("first_doc_id"))
      .write.mode(SaveMode.Append).parquet(indexDir)

  /** Morton (Z-order) key over two non-negative int columns, 16 bits
    * each: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Pure codegen'd bit arithmetic (32 shift/mask terms) — no UDF.
    */
  private[graft] def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    (0 until 16)
      .map { i =>
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }
      .reduce(_.bitwiseOR(_))

  /** Z-ordered parquet layout — the multi-dimensional clustering step
    * a 100 TB lake runs before handing data to min/max-pruning scans.
    * A single-column sort clusters one predicate dimension and leaves
    * the other scattered across every file; interleaving the bits of
    * both keys (Morton order) keeps rows close in BOTH dimensions, so
    * parquet row-group min/max stats prune selective 2-D predicates
    * (user × time, tenant × entity) instead of only 1-D ones.
    *
    * Shape: derive z = interleave(a₁₆, b₁₆), `repartitionByRange` on z
    * (one skew-resistant range shuffle — the same sampling-based
    * partitioner the sort operator uses), sort WITHIN partitions (no
    * second exchange), drop the scratch column at the writer. Files
    * come out tiling the z-curve; the clustering-quality test pins
    * that per-file bounding boxes cover a small fraction of the key
    * space on both dimensions, which is exactly the property min/max
    * pruning consumes.
    */
  def writeZordered(
      df: DataFrame, colA: String, colB: String, outDir: String, partitions: Int = 8): Unit = {
    df.withColumn("_z", zValue(col(colA).cast("long"), col(colB).cast("long")))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write
      .mode(SaveMode.Overwrite)
      .parquet(outDir)
  }

  /** Bucketed table writer — the CO-LOCATED JOIN layout: both sides of
    * a recurring big-×-big equi-join written with `bucketBy(n, key)` +
    * `sortBy(key)` hash-place every key into the same bucket file on
    * both tables, so the join consumes the ON-DISK partitioning —
    * no Exchange on either side, and with sortBy no Sort either (the
    * SortMergeJoin zips pre-sorted bucket files). At 100 TB this is
    * THE recurring-join amortization: one shuffle's cost paid once at
    * write, repaid on every subsequent join/aggregation keyed the same
    * way. Registered as an external table (explicit `path`) so the
    * files outlive the session while the in-memory catalog carries
    * the bucket spec; the exchange-free plan and result-equality vs
    * the unbucketed join are spec-pinned.
    */
  def writeBucketed(
      df: DataFrame, table: String, keyCol: String, path: String, buckets: Int = 8): Unit =
    df
      // pre-hash into one partition per bucket (same Murmur3 the bucket
      // spec uses): each task then writes exactly ONE file per bucket,
      // which is the condition under which the scan reports its sort
      // order and the join elides the per-side Sort too
      .repartition(buckets, col(keyCol))
      .write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)
}
