package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event row for typed stateful streaming. */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

/** Running per-user aggregate state (the reference's incrementally
  * refreshed like/reply counters, main.rs:3815 run_update_counts_query,
  * re-expressed as Structured Streaming state instead of poll loops).
  */
case class UserCounts(user_id: Long, n_events: Long, total_value: Double, last_event_id: Long)

/** Structured Streaming counterparts of the reference's ingestion loop
  * (§2 #44-#46). The reference polls SurrealDB every 5 s and mutates
  * in-memory BTreeMaps behind an ArcSwap (main.rs:3143, 3287, 3815);
  * here each poll loop is a continuous query with watermarked state —
  * the same semantics, but distributed, fault-tolerant and backpressured.
  */
object Streams {

  /** #44 windowed counts (trending window, main.rs:626): sliding window
    * aggregation with a watermark bounding state.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"),
        col("n"),
        col("total_value"))

  /** #45 incremental per-user counters via explicit state
    * (run_update_counts_query as a keyed state machine). Update-mode
    * output: one refreshed row per user per micro-batch.
    */
  def incrementalCounts(events: Dataset[Ev]): Dataset[UserCounts] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserCounts, UserCounts](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[UserCounts]) =>
          val prev = state.getOption.getOrElse(UserCounts(uid, 0L, 0.0, -1L))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserCounts(
              uid,
              acc.n_events + 1,
              acc.total_value + e.value,
              math.max(acc.last_event_id, e.event_id))
          }
          state.update(next)
          next
      }
  }

  /** #46 streaming dedup (the duplicates filter, main.rs:1916, applied
    * on ingest): watermark-bounded drop of re-deliveries by key.
    */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** #50s streaming sessionization: the batch gap-sessionize (§2 #25)
    * as a continuous query — Spark's native session_window assigns
    * events to gap-bounded sessions with watermarked state eviction.
    */
  def sessionizeStream(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        col("session_value"))

  /** Per-post liker-set state: the reference's likes_post_to_users
    * RoaringBitmap (main.rs:61) as keyed stream state.
    */
  case class LikerSet(likers: Seq[Long])
  case class PostLikes(post_id: Long, n_likes: Long)

  /** #45b likes-graph ingestion (run_likes_query, main.rs:3287): the
    * reference polls the likes table and unions new likers into a
    * per-post bitmap. Here each micro-batch folds its likes into a
    * per-post liker SET held as keyed state — set semantics make
    * at-least-once redelivery and double-likes idempotent, exactly
    * like the bitmap. At scale the state lives in RocksDB (test-pinned
    * provider parity), sharded by post key; emission is the refreshed
    * (post, n_likes) counter row per batch.
    */
  def likesGraphStream(likes: Dataset[(Long, Long)]): Dataset[PostLikes] = {
    import likes.sparkSession.implicits._
    likes
      .groupByKey(_._2) // key = post
      .mapGroupsWithState[LikerSet, PostLikes](GroupStateTimeout.NoTimeout) {
        (pid: Long, rows: Iterator[(Long, Long)], state: GroupState[LikerSet]) =>
          val prev = state.getOption.getOrElse(LikerSet(Nil))
          val merged = (prev.likers.toSet ++ rows.map(_._1)).toSeq.sorted
          state.update(LikerSet(merged))
          PostLikes(pid, merged.size)
      }
  }

  /** A user's current feed: their top-scored events so far. */
  case class FeedState(entries: List[(Double, Long)])
  case class FeedRow(user_id: Long, rank: Int, event_id: Long, score: Double)

  /** #49s continuous feed maintenance: the reference serves feeds by
    * rerunning the block pipeline over its in-RAM store on every
    * request; here the per-user top-k IS the state — each micro-batch
    * folds new events into a bounded heap per user
    * (mapGroupsWithState), so serving is a state read, not a recompute.
    * Scoring uses the same hn shape with a fixed anchor for
    * reproducibility.
    */
  def streamingFeed(events: Dataset[Ev], k: Int, anchorMs: Long): Dataset[FeedRow] = {
    import events.sparkSession.implicits._
    def score(e: Ev): Double = {
      // clamp at 0: events newer than the anchor (normal in a live
      // stream) must not shrink the denominator below 2 — unclamped,
      // ageH < -2 turns pow() into NaN and poisons the top-k state
      val ageH = math.max(0.0, (anchorMs - e.ts.getTime).toDouble / 3600000.0)
      e.value / math.pow(ageH + 2.0, 1.8)
    }
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FeedState, List[FeedRow]](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[FeedState]) =>
          val prev = state.getOption.getOrElse(FeedState(Nil))
          // dedup by event_id before the cut: an at-least-once source
          // may redeliver an event, which must not occupy two feed slots
          val merged = (prev.entries ++ rows.map(e => (score(e), e.event_id)))
            .groupBy(_._2)
            .valuesIterator
            .map(_.maxBy(_._1))
            .toList
            .sortBy { case (s, id) => (-s, id) }
            .take(k)
          state.update(FeedState(merged))
          merged.zipWithIndex.map { case ((s, id), i) => FeedRow(uid, i + 1, id, s) }
      }
      .flatMap(identity)
  }

  /** #39s the corpus intake pipeline (batch form: corpus_pipeline) as a
    * CONTINUOUS query: documents stream in, the language/quality gates
    * run codegen'd per micro-batch (stateless — they fuse into the
    * batch scan exactly like the batch plan), and exact content-hash
    * dedup holds md5(text) keys as watermark-bounded state. The shape
    * of a streaming pretraining-data intake: bounded state, no
    * reprocessing, same gates as the batch path.
    */
  def corpusIntakeStream(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    docs
      .withWatermark("ts", "1 hour")
      .withColumn("n_words", size(words))
      .filter(
        // the SAME gates as the batch corpus_pipeline: language-ID
        // argmax, length, lexical diversity
        graft.queries.TextOps.bestLang.getField("lang") === "en" &&
          col("n_words") >= 30 &&
          size(array_distinct(words)).cast("double") / col("n_words") >= 0.3)
      .withColumn("h", md5(col("text")))
      .dropDuplicatesWithinWatermark("h")
      .select(col("doc_id"), col("ts"), col("n_words"), col("h"))
  }

  /** #48s stream-static enrichment: the reference resolves author
    * profile data per post at query time from its in-memory profile map
    * (main.rs:63 all_profiles); streaming-side the profile dimension is
    * a static broadcast joined to each micro-batch.
    */
  def enrichWithProfiles(events: DataFrame, profiles: DataFrame): DataFrame =
    events.join(
      broadcast(profiles),
      events("user_id") === profiles("profile_user_id"),
      "left")

  /** #47 streaming trending tags (main.rs:626 as a continuous query):
    * explode words of a (ts, text) stream, windowed distinct-ish counts
    * per tag. The reference recomputes trending over its in-memory maps
    * per request; here the window state maintains it incrementally.
    */
  def trendingTagsStream(texts: DataFrame): DataFrame =
    texts
      .withWatermark("ts", "1 hour")
      .select(col("ts"), explode(split(col("text"), " ")).as("tag"))
      .filter(length(col("tag")) > 3)
      .groupBy(window(col("ts"), "6 hours", "1 hour"), col("tag"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("tag"), col("n"))
}
