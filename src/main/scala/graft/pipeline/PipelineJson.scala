package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** JSON front-end for the pipeline compiler: accepts the reference
  * engine's block payload shape (main.rs:1243 `payload["blocks"]` — the
  * SkyFeed builder wire format) and compiles it onto a relation. A user
  * of the reference can POST the same JSON; here it becomes ONE Catalyst
  * plan instead of an interpreted block loop.
  *
  * Wire surface parsed (reference evidence):
  *  - input: firehose / list / did / tags / labels / post / archived
  *    (main.rs:1410, 1427, 1606, 1669, 1780, 1786, 1792). `feed`
  *    (main.rs:1704) is an external HTTP fetch — permanently out of
  *    scope for a batch engine, rejected with a clear error.
  *  - keep/remove subjects: item, image_count, reply_count,
  *    repost_count, like_count, language, list, duplicates,
  *    non_duplicates, embed, labels, where, videos (main.rs:1798-1980),
  *    plus a generic column-compare extension for any other subject.
  *  - regex (main.rs:1982), score add from like/repost/reply counts /
  *    hn / created_at / value script (main.rs:2151-2227), sort by
  *    created_at / hn / likes / repost_count / reply_count / random /
  *    score (main.rs:2229-2306), stash (main.rs:2308), limit +
  *    posts_per_user (main.rs:2342), replace parent / root / record /
  *    direct_replies / all_replies / quote_posts (main.rs:2386-2508).
  *
  * `Binding` maps the reference's logical post fields onto the actual
  * relation's columns. The core identity/time/engagement columns are
  * required; everything else is optional and only needed when the
  * payload uses the corresponding block:
  *  - `fieldCols`: logical field name → Column for the count/flag
  *    subjects (like_count, repost_count, reply_count, image_count,
  *    language, record, video, is_reply). like_count falls back to
  *    `valueCol`; anything else unmapped falls back to a column of the
  *    same name.
  *  - `lists`: listUri → one-column member-key relation (the
  *    reference's fetch_list result as a broadcastable set).
  *  - `tagsCol` / `labelsCol`: array<string> columns for tags/labels
  *    inputs and label subjects.
  *  - `refCols`: "parent"/"root"/"record" → nullable ref column names
  *    on the store (the thread/quote structure).
  *  - `store`: the full post store replace blocks look targets up in.
  *  - `archive`: the archived-posts relation the `archived` input pulls.
  */
case class Binding(
    idCol: String,
    authorCol: String,
    tsCol: String,
    valueCol: String,
    nowEpochMs: Long,
    regexTargets: Map[String, Seq[String]],
    whereFields: Map[String, Column],
    /** Names in `whereFields` bound to ARRAY columns, so a script's
      * `x in field` compiles to array_contains instead of substring
      * containment (both are Rhai `in` meanings).
      */
    whereArrayFields: Set[String] = Set.empty,
    scoreRoundScale: Int = 6,
    fieldCols: Map[String, Column] = Map.empty,
    lists: Map[String, DataFrame] = Map.empty,
    tagsCol: Option[Column] = None,
    labelsCol: Option[Column] = None,
    refCols: Map[String, String] = Map.empty,
    store: Option[DataFrame] = None,
    archive: Option[DataFrame] = None,
    /** Likes bipartite graph for the custom_liked* inputs: first column
      * = liker user key, second = liked post key (the reference's
      * likes_user_to_posts / likes_post_to_users RoaringBitmaps as one
      * edge relation).
      */
    likes: Option[DataFrame] = None,
    /** Resolved feed skeletons for the `feed` input (main.rs:1704):
      * feedUri → one-column relation of the post ids the external feed
      * served. The reference fetches these over HTTP inside the query;
      * here the fetch is an ingestion concern — whatever fetcher the
      * deployment uses lands the skeleton as a relation, and the block
      * itself is a pure semi join against the store (the reference's
      * all_posts_by_id containment check). Unresolved URIs still fail
      * with a clear error.
      */
    feeds: Map[String, DataFrame] = Map.empty)

object PipelineJson {
  private val mapper = new ObjectMapper

  def parse(payload: String, b: Binding): Seq[Block] = {
    val root = mapper.readTree(payload)
    val blocks = root.path("blocks")
    require(blocks.isArray, "payload must carry a blocks array")
    // track whether a score block has run: blocks downstream of scoring
    // rank by score; before any scoring they rank by recency (the
    // reference's "current order" is its insertion order — newest-first
    // recency is the deterministic distributed equivalent). The score
    // column SURVIVES replace blocks (kept originals retain their
    // earned score; replaced rows restart at 0 — the reference's
    // global-map semantics), so the flag never resets.
    var scored = false
    blocks.elements().asScala.flatMap { node =>
      val out = compileBlock(node, b, scored)
      str(node, "type", "") match {
        case "score" => scored = true
        case "input" if str(node, "inputType", "").startsWith("custom_") => scored = true
        case _ => ()
      }
      out
    }.toSeq
  }

  /** Full program semantics over a base relation — the reference's
    * whole-payload execution model (main.rs:1398-2508): input blocks
    * APPEND a fresh window of the store to the working set, stash
    * blocks move the working set into named slots and back
    * (stash / pop=union / subtract=anti-join, main.rs:2308), everything
    * else transforms the working set. Still fully lazy: the result is
    * one composed logical plan over however many scan branches the
    * program pulled in.
    *
    * Deliberate divergence: the reference truncates every feed to 500
    * AFTER the pipeline in "current order" (main.rs:2511) — its
    * in-memory insertion order. A distributed frame has no insertion
    * order, so an implicit cap would select nondeterministic rows;
    * express the cap as an explicit trailing sort + limit block (every
    * real SkyFeed payload ends with one anyway).
    */
  def run(base: DataFrame, payload: String, b: Binding): DataFrame = {
    val root = mapper.readTree(payload)
    val blockNodes = root.path("blocks")
    require(blockNodes.isArray, "payload must carry a blocks array")
    var working: Option[DataFrame] = None
    val stash = scala.collection.mutable.Map[String, DataFrame]()
    var scored = false

    // frames on either side of a union may or may not have picked up a
    // score column yet — align on score=0.0 (the reference's side-map
    // default) before unioning
    def aligned(x: DataFrame, y: DataFrame) = {
      def ensure(df: DataFrame) =
        if (df.columns.contains("score")) df
        else df.withColumn("score", lit(0.0))
      if (x.columns.contains("score") || y.columns.contains("score"))
        ensure(x).unionByName(ensure(y))
      else x.unionByName(y)
    }

    blockNodes.elements().asScala.foreach { node =>
      str(node, "type", "") match {
        case "input" if str(node, "inputType", "").startsWith("custom_") =>
          // the custom like-graph inputs REPLACE the working set
          // (posts.clear(), main.rs:1504/1586): likedweighted builds it
          // from the store, likedbylikers is seeded by the current set
          val src =
            if (str(node, "inputType", "") == "custom_likedbylikers")
              working.getOrElse(throw new IllegalArgumentException(
                "custom_likedbylikers needs a seeded working set (add an input block before it)"))
            else base
          working = Some(compileBlock(node, b, scored).foldLeft(src)((df, blk) => blk(df)))
          scored = true
        case "input" =>
          val pulled = compileBlock(node, b, scored).foldLeft(base)((df, blk) => blk(df))
          working = Some(working.fold(pulled)(aligned(_, pulled)))
        case "stash" =>
          val key = reqStr(node, "key", "stash")
          str(node, "action", "stash") match {
            case "stash" =>
              stash(key) = working.getOrElse(base.limit(0))
              working = Some(base.limit(0))
            case "pop" =>
              val stashed = stash.getOrElse(key, throw new IllegalArgumentException(s"no stash '$key'"))
              working = Some(working.fold(stashed)(aligned(_, stashed)))
            case "subtract" =>
              val stashed = stash.getOrElse(key, throw new IllegalArgumentException(s"no stash '$key'"))
              working = working.map(SubtractSet(stashed, b.idCol)(_))
            case other => throw new IllegalArgumentException(s"unknown stash action '$other'")
          }
        case t =>
          val w = working.getOrElse(
            throw new IllegalArgumentException("pipeline must start with an input block"))
          working = Some(compileBlock(node, b, scored).foldLeft(w)((df, blk) => blk(df)))
          if (t == "score") scored = true
      }
    }
    working.getOrElse(base.limit(0))
  }

  /** Run a wire payload as a CONTINUOUS query — the reference's actual
    * operating mode (it recomputes every feed as the firehose arrives;
    * main.rs:3143's poll loop IS a streaming pipeline). The stateless
    * block subset compiles onto an unbounded stream unchanged:
    * comparison/regex/where filters, list membership (stream-static
    * join), un-normalized score adds; the duplicates filter becomes
    * watermark-bounded ingest dedup (dropDuplicatesWithinWatermark —
    * the reference's at-ingest duplicates check, main.rs:1916).
    *
    * The firehose input IS the stream: the payload's time window is
    * enforced by the watermark + downstream state TTL instead of a
    * fixed `now` (a fixed window over an unbounded stream would pin a
    * historical slice — not what a live feed means). Blocks that need
    * a bounded working set — sort/limit/top-k, normalization's global
    * max, stash slots, replace lookups, custom like-walks — are
    * rejected with a pointer to the right tool: the batch runner for
    * one-shot evaluation, or Streams.streamingFeed, which maintains
    * exactly that bounded per-user top-k as keyed state over this
    * function's output.
    */
  def runStreaming(
      stream: DataFrame, payload: String, b: Binding, lateness: String = "1 hour"): DataFrame = {
    val root = mapper.readTree(payload)
    val blockNodes = root.path("blocks")
    require(blockNodes.isArray, "payload must carry a blocks array")
    var working: Option[DataFrame] = None
    var scored = false

    def reject(what: String, hint: String): Nothing =
      throw new IllegalArgumentException(
        s"streaming pipeline cannot run $what — $hint")

    blockNodes.elements().asScala.foreach { node =>
      str(node, "type", "") match {
        case "input" =>
          val it = str(node, "inputType", "firehose")
          if (it != "firehose")
            reject(s"input '$it'",
              "a continuous pipeline takes its one input FROM the stream; " +
                "other inputs are batch recomputation (PipelineJson.run)")
          if (working.nonEmpty)
            reject("a second input block", "a stream has exactly one firehose")
          working = Some(stream.withWatermark(b.tsCol, lateness))
        case "remove" if str(node, "subject", "") == "duplicates" =>
          // the wire duplicates filter compiles to an opaque Compute in
          // the batch path (score-carrying survivor choice); on a stream
          // it is first-arrival-wins ingest dedup over the id key
          val w = working.getOrElse(
            throw new IllegalArgumentException("pipeline must start with an input block"))
          working = Some(w.dropDuplicatesWithinWatermark(b.idCol))
        case t =>
          val w = working.getOrElse(
            throw new IllegalArgumentException("pipeline must start with an input block"))
          val next = compileBlock(node, b, scored).foldLeft(w) { (df, blk) =>
            blk match {
              case _: KeepCmp | _: KeepRegex | _: WhereFilter | _: RoundCol => blk(df)
              case _: KeepInSet => blk(df) // stream-static join
              case c: Compute if c.streamSafe => c(df) // pure per-row map/filter
              case s: ScoreAdd =>
                if (s.normalize)
                  reject("a normalized score block",
                    "the global max is unbounded on a stream; normalize at serve " +
                      "time (Streams.streamingFeed ranks within its bounded state)")
                blk(df)
              case d: DedupByKey =>
                // first-arrival-wins ingest dedup (the streaming form of
                // the duplicates filter); survivor order is arrival order
                df.dropDuplicatesWithinWatermark(d.keys.head, d.keys.tail: _*)
              case other =>
                reject(s"block ${other.getClass.getSimpleName}",
                  "sort/limit/stash/replace need a bounded working set — run them " +
                    "in the batch runner or serve via Streams.streamingFeed state")
            }
          }
          working = Some(next)
          if (t == "score") scored = true
      }
    }
    working.getOrElse(reject("an empty payload", "add an input block"))
  }

  /** The reference's WHOLE production loop (poll → pipeline → serve,
    * main.rs:3143 + generate_feed_skeleton main.rs:1229) as ONE
    * continuous system: a full wire payload — filters AND its trailing
    * sort/limit — compiles into
    *   stateless prefix  → runStreaming (codegen'd filters on the
    *                       firehose, watermark-bounded dedup), then
    *   serving suffix    → Streams.streamingFeed (the sort-hn + limit
    *                       tail becomes the bounded per-user top-k
    *                       keyed state; k = the limit count, gravity =
    *                       the sort block's knob).
    * Serving is then a state read (Streams.readFeedState over the
    * query's checkpoint) — no recompute per request, unlike the
    * reference, which reruns the block loop over its in-RAM store on
    * every poll. The suffix may rank by hn (the reference's own
    * live-feed ranking), by the payload's accumulated `score` (the
    * prefix's un-normalized score adds fix each event's score at
    * arrival), or by created_at (either direction — the event time IS
    * the static key); all three are per-event-static, which is what
    * lets the bounded keyed top-k serve them. Sorts that read mutable
    * per-post state (likes/reposts/replies) or one-shot orderings
    * (random) are rejected with a pointer to the batch runner.
    */
  def runServingFeed(
      stream: DataFrame,
      payload: String,
      b: Binding,
      anchorMs: Long,
      lateness: String = "1 hour"): org.apache.spark.sql.Dataset[graft.streaming.Streams.FeedRow] = {
    import graft.streaming.{Ev, Streams}
    val root = mapper.readTree(payload)
    val blockNodes = root.path("blocks")
    require(blockNodes.isArray, "payload must carry a blocks array")
    val nodes = blockNodes.elements().asScala.toVector
    // the serving suffix is the longest trailing run of sort/limit
    // blocks; everything before it must be streaming-safe (enforced by
    // runStreaming)
    val servingTypes = Set("sort", "limit")
    var cut = nodes.length
    while (cut > 0 && servingTypes(str(nodes(cut - 1), "type", ""))) cut -= 1
    val (prefix, suffix) = nodes.splitAt(cut)
    require(
      suffix.exists(n => str(n, "type", "") == "sort"),
      "a serving feed needs a trailing sort block (hn) — for an unranked " +
        "continuous filter use runStreaming directly")
    val sorts = suffix.filter(n => str(n, "type", "") == "sort")
    val limits = suffix.filter(n => str(n, "type", "") == "limit")
    require(sorts.size == 1 && limits.size <= 1, "serving suffix allows one sort and one limit")
    // the reference executes blocks SEQUENTIALLY (main.rs:1398): a
    // limit before the sort truncates THEN ranks; compiling it as the
    // top-k state would silently turn that into rank-then-truncate —
    // refuse rather than reorder semantics
    require(
      limits.isEmpty ||
        suffix.indexWhere(n => str(n, "type", "") == "sort") <
        suffix.indexWhere(n => str(n, "type", "") == "limit"),
      "serving suffix must sort BEFORE limit (the reference's sequential " +
        "block semantics make limit-then-sort truncate-then-rank — run that " +
        "shape in the batch runner)")
    val sortNode = sorts.head
    val sortType = str(sortNode, "sortType", "hn")
    val desc = str(sortNode, "sortDirection", "desc") == "desc"
    // every serveable ranking is per-event-static (Streams.FeedRanking);
    // sort-by-score before any score block degrades to recency, exactly
    // like the batch compiler's `case "score" if !scored`
    val prefixScored = prefix.exists(n => str(n, "type", "") == "score")
    val ranking = sortType match {
      case "hn" => Streams.FeedRanking.Hn(anchorMs, sortNode.path("gravity").asText("1.8").toDouble)
      case "score" if prefixScored => Streams.FeedRanking.ByValue
      case "score" => Streams.FeedRanking.ByRecency(newestFirst = true)
      case "created_at" => Streams.FeedRanking.ByRecency(newestFirst = desc)
      case other =>
        throw new IllegalArgumentException(
          s"continuous serving ranks by a per-event-static key (hn, score, created_at); " +
            s"sort '$other' reads mutable per-post state or is one-shot — run it in the batch runner")
    }
    val k = limits.headOption
      .map(n => if (n.hasNonNull("count")) n.get("count").asInt() else 100)
      .getOrElse(100)
    val prefixRoot = mapper.createObjectNode()
    val arr = prefixRoot.putArray("blocks")
    prefix.foreach(arr.add)
    val filtered = runStreaming(stream, mapper.writeValueAsString(prefixRoot), b, lateness)
    // ByValue serves the accumulated score column the prefix computed;
    // the other rankings derive from ts/value inside the state machine
    val valueCol =
      if (ranking == Streams.FeedRanking.ByValue) col("score") else col(b.valueCol).cast("double")
    val s = stream.sparkSession
    import s.implicits._
    Streams.streamingFeedRanked(
      filtered.select(
        col(b.idCol).cast("long").as("event_id"),
        col(b.tsCol).as("ts"),
        col(b.authorCol).cast("long").as("user_id"),
        lit("wire").as("event_type"),
        valueCol.as("value")).as[Ev],
      k = k, ranking = ranking, lateness = lateness)
  }

  /** The reference's SECOND pipeline endpoint: the LIST BUILDER
    * (generate_list_skeleton, main.rs:2678) — the same block wire
    * format over the PROFILE dimension instead of posts. Inputs
    * `network` (the whole profile store) and `list` (membership) APPEND
    * to the working set like post inputs; filters are remove subjects
    * `profile` (avatar/banner flags, main.rs:2758), `list`,
    * `duplicates`, and the regex block over name / handle / description
    * and their unions (main.rs:2778). `sort` is a declared no-op in the
    * reference (TODO stub, main.rs:2864) and stays one here; `limit`
    * truncates. Same documented divergence as run(): a distributed
    * frame has no insertion order, so deterministic truncation needs an
    * upstream order — the reference's own sort being a no-op means real
    * payloads never relied on one.
    */
  def runListBuilder(profiles: DataFrame, payload: String, b: Binding): DataFrame = {
    val root = mapper.readTree(payload)
    val blockNodes = root.path("blocks")
    require(blockNodes.isArray, "payload must carry a blocks array")
    var working: Option[DataFrame] = None
    blockNodes.elements().asScala.foreach { node =>
      str(node, "type", "") match {
        case "input" =>
          val pulled = str(node, "inputType", "network") match {
            case "network" => profiles
            case "list" =>
              val members = boundList(node, b, "list-builder input")
              KeepInSet(b.idCol, members, members.columns.head, keep = true)(profiles)
            case other =>
              throw new IllegalArgumentException(s"unsupported list-builder inputType '$other'")
          }
          working = Some(working.fold(pulled)(_.unionByName(pulled)))
        case _ =>
          val w = working.getOrElse(
            throw new IllegalArgumentException("list builder must start with an input block"))
          working = Some(compileListBlock(node, b).foldLeft(w)((df, blk) => blk(df)))
      }
    }
    working.getOrElse(profiles.limit(0))
  }

  /** Regex block compilation shared by BOTH pipeline endpoints (posts
    * and the profile list builder) — only the default target differs.
    */
  private def compileRegexBlock(n: JsonNode, b: Binding, defaultTarget: String): Seq[Block] = {
    val targets = b.regexTargets.getOrElse(
      str(n, "target", defaultTarget),
      throw new IllegalArgumentException(s"unbound regex target ${str(n, "target", defaultTarget)}"))
    Seq(KeepRegex(
      targets,
      reqStr(n, "value", "regex"),
      caseSensitive = n.path("caseSensitive").asBoolean(false),
      invert = n.path("invert").asBoolean(false)))
  }

  private def compileListBlock(n: JsonNode, b: Binding): Seq[Block] =
    str(n, "type", "") match {
      case "remove" =>
        str(n, "subject", "profile") match {
          case "profile" =>
            // (main.rs:2764): remove the named flag bucket
            val (field, keepWhenTrue) = str(n, "value", "has_avatar") match {
              case "has_avatar" => ("has_avatar", false)
              case "has_no_avatar" => ("has_avatar", true)
              case "has_banner" => ("has_banner", false)
              case "has_no_banner" => ("has_banner", true)
              case other =>
                throw new IllegalArgumentException(s"unknown profile filter value '$other'")
            }
            val c = resolveField(b, field)
            Seq(WhereFilter(if (keepWhenTrue) c else !c))
          case "list" =>
            val members = boundList(n, b, "remove")
            Seq(KeepInSet(b.idCol, members, members.columns.head, keep = false))
          case "duplicates" =>
            Seq(DedupByKey(Seq(b.idCol), Seq(col(b.idCol))))
          case other =>
            throw new IllegalArgumentException(s"unsupported list-builder remove subject '$other'")
        }
      case "regex" =>
        // shared with the post pipeline; the list builder defaults the
        // target to "name" (main.rs:2793)
        compileRegexBlock(n, b, defaultTarget = "name")
      case "limit" =>
        Seq(LimitN(if (n.hasNonNull("count")) n.get("count").asInt() else 100))
      case "sort" => Nil // the reference's list-builder sort is a TODO no-op (main.rs:2864)
      case other => throw new IllegalArgumentException(s"unsupported list-builder block '$other'")
    }

  private def str(n: JsonNode, field: String, dflt: String): String =
    if (n.hasNonNull(field)) n.get(field).asText() else dflt

  private def reqStr(n: JsonNode, field: String, blockType: String): String = {
    require(n.hasNonNull(field), s"$blockType block is missing '$field'")
    n.get(field).asText()
  }

  /** Typed literal from a JSON scalar: numbers stay numeric so id/author
    * comparisons don't silently string-compare against long columns.
    * Fractional values stay DOUBLE — `asLong()` would truncate 7.5 to 7
    * and silently match the wrong row.
    */
  private def jsonLit(v: JsonNode): Column =
    if (v.isIntegralNumber) lit(v.asLong())
    else if (v.isNumber) lit(v.asDouble())
    else lit(v.asText())

  private def strSeq(n: JsonNode, field: String, blockType: String): Seq[String] = {
    val arr = n.get(field)
    require(arr != null && arr.isArray, s"$blockType block needs a '$field' array")
    // the reference's inverted indexes are lowercase (main.rs:1609)
    arr.elements().asScala.map(_.asText().toLowerCase).toSeq
  }

  /** Logical post field → bound Column. like_count defaults to the
    * binding's engagement column; everything else unmapped resolves to
    * a relation column of the same name.
    */
  private def resolveField(b: Binding, name: String): Column =
    b.fieldCols.getOrElse(name, if (name == "like_count") col(b.valueCol) else col(name))

  /** The reference's HN score (main.rs:4338): likes / (age_h + 2)^gravity
    * against the deterministic anchor. Reads like_count through the
    * same field resolution as the count filters, so a Binding that maps
    * like_count explicitly gets consistent semantics everywhere.
    */
  private def hnExpr(b: Binding, gravity: Double): Column = {
    val ageH = (lit(b.nowEpochMs) - unix_millis(col(b.tsCol))).cast("double") / lit(3600000.0)
    resolveField(b, "like_count") / pow(ageH + lit(2.0), lit(gravity))
  }

  /** `where` script filter. The reference pushes the RUNNING SCORE into
    * the script scope as a constant (main.rs:1969), defaulting to 0 for
    * unscored posts — so `score` resolves to the score column when the
    * working frame has one and to literal 0.0 before any score block.
    * Resolved lazily (Compute) because only the frame itself knows.
    * A user-bound `score` field in whereFields wins over the built-in.
    */
  private def whereBlock(script: String, b: Binding, invert: Boolean): Block = Compute.streamSafe { df =>
    val scoreCol = if (df.columns.contains("score")) col("score") else lit(0.0)
    val fields = Map("score" -> scoreCol) ++ b.whereFields
    val pred = WhereDsl.compile(script, fields, b.whereArrayFields)
    df.filter(if (invert) !pred else pred)
  }

  /** Case-insensitive membership over a bound array column: the
    * reference's tag/label indexes are lowercase on BOTH sides
    * (main.rs:1609) — lowercasing only the query side would silently
    * drop mixed-case store values.
    */
  private def containsAnyToken(arrCol: Column, tokens: Seq[String]): Column =
    tokens.map(t => exists(arrCol, x => lower(x) === lit(t))).reduce(_ || _)

  private def histWindow(n: JsonNode, b: Binding): Seq[Block] = {
    val secs = if (n.hasNonNull("historySeconds")) n.get("historySeconds").asLong() else 604800L
    // the reference skips the cutoff at/beyond the 7-day retention
    // (is_cutoff_beyond_7_days, main.rs:1621): the store never holds
    // older posts anyway, and the batch equivalent of "everything the
    // store has" is no time filter at all
    if (secs < 604800L) Seq(InputWindow(b.tsCol, b.nowEpochMs, secs)) else Nil
  }

  private def boundList(n: JsonNode, b: Binding, blockType: String): DataFrame = {
    val uri = reqStr(n, "listUri", blockType)
    b.lists.getOrElse(
      uri,
      throw new IllegalArgumentException(s"unbound listUri '$uri' (add it to Binding.lists)"))
  }

  private def boundStore(b: Binding): DataFrame =
    b.store.getOrElse(
      throw new IllegalArgumentException("replace blocks need Binding.store (the full post store)"))

  private def boundLikes(b: Binding, blockType: String): DataFrame =
    b.likes.getOrElse(
      throw new IllegalArgumentException(s"$blockType needs Binding.likes (liker, post)"))

  /** Shared tail of the custom_liked* inputs: max-normalize the raw
    * decimal per-post scores (single-row broadcast, no driver collect)
    * and join the scored ids back onto the (optionally windowed) store.
    */
  private def normalizedStoreJoin(
      raw: DataFrame, b: Binding, win: Seq[Block], mult: Double): DataFrame = {
    val mx = raw.agg(max(col("__raw")).as("__mx"))
    val scored = raw
      .crossJoin(broadcast(mx))
      .select(
        col("__post"),
        // zero max ⇒ contribution 0, not an Infinity-poisoned score
        // (same guard as ScoreAdd; f2/f3 user-score sums can be ≤ 0)
        round(
          when(col("__mx") =!= 0, col("__raw").cast("double") / col("__mx").cast("double") * mult)
            .otherwise(lit(0.0)),
          b.scoreRoundScale).as("score"))
    val store = win.foldLeft(boundStore(b))((df, blk) => blk(df))
    store.join(scored, col(b.idCol) === col("__post")).drop("__post")
  }

  private val Dec12 = graft.OracleMath.Dec12

  private def boundRef(b: Binding, target: String): String =
    b.refCols.getOrElse(
      target,
      throw new IllegalArgumentException(s"unbound replace ref '$target' (add it to Binding.refCols)"))

  private def compileBlock(n: JsonNode, b: Binding, scored: Boolean = true): Seq[Block] = {
    str(n, "type", "") match {
      case "input" =>
        str(n, "inputType", "firehose") match {
          case "firehose" =>
            val secs = if (n.hasNonNull("firehoseSeconds")) n.get("firehoseSeconds").asLong() else 86400L
            Seq(InputWindow(b.tsCol, b.nowEpochMs, secs))
          case "list" =>
            // posts by the list's authors within the history window
            // (main.rs:1427): membership is a broadcast semi join. The
            // cutoff always applies for list inputs (the reference
            // filters `post.id > cutoff_tid` unconditionally here —
            // the ≥7-day skip below is specific to tags/labels)
            val members = boundList(n, b, "input")
            val secs = if (n.hasNonNull("historySeconds")) n.get("historySeconds").asLong() else 604800L
            Seq(
              InputWindow(b.tsCol, b.nowEpochMs, secs),
              KeepInSet(b.authorCol, members, members.columns.head, keep = true))
          case "did" =>
            // single author's posts (main.rs:1780)
            require(n.hasNonNull("did"), "did input is missing 'did'")
            Seq(WhereFilter(col(b.authorCol) === jsonLit(n.get("did"))))
          case "tags" =>
            // inverted tag index lookup (main.rs:1606) → array-membership
            // predicate over the bound tags column (scan-side at rest)
            val tagsCol = b.tagsCol.getOrElse(
              throw new IllegalArgumentException("tags input needs Binding.tagsCol"))
            val tags = strSeq(n, "tags", "tags input")
            require(tags.nonEmpty, "tags input needs at least one tag")
            histWindow(n, b) :+ WhereFilter(containsAnyToken(tagsCol, tags))
          case "labels" =>
            // label index lookup (main.rs:1669)
            val labelsCol = b.labelsCol.getOrElse(
              throw new IllegalArgumentException("labels input needs Binding.labelsCol"))
            val labels = strSeq(n, "labels", "labels input")
            require(labels.nonEmpty, "labels input needs at least one label")
            histWindow(n, b) :+ WhereFilter(containsAnyToken(labelsCol, labels))
          case "post" =>
            // point lookup by post id(s) (main.rs:1786) — the In
            // predicate reaches PushedFilters / row-group skipping
            val uris = n.get("postUri")
            require(uris != null && !uris.isNull, "post input is missing 'postUri'")
            val ids =
              if (uris.isArray) uris.elements().asScala.map(jsonLit).toSeq else Seq(jsonLit(uris))
            Seq(WhereFilter(col(b.idCol).isin(ids: _*)))
          case "archived" =>
            // archive store pull (main.rs:1792): swap in the bound
            // archive relation; run() unions it with the other branches
            UseRelation(b.archive.getOrElse(
              throw new IllegalArgumentException("archived input needs Binding.archive"))) +:
              histWindow(n, b)
          case "custom_likedweighted" =>
            // (main.rs:1453): posts liked by the list's users; prolific
            // likers weigh less — per-like weight 1/(base + likes(u)),
            // post score = max-normalized weight sum. Replaces the
            // working set with the scored posts. Weight rounded then
            // decimal-summed (order-independent, oracle-exact); the
            // normalizing max arrives by single-row broadcast, no
            // driver collect.
            val likes = boundLikes(b, "custom_likedweighted")
            val members = boundList(n, b, "input")
            val baseCnt =
              if (n.hasNonNull("baseLikeCount")) n.get("baseLikeCount").asDouble() else 0.0
            val mult = str(n, "scoreNormalizationMultiplier", "1.0").toDouble
            val (uCol, pCol) = (likes.columns(0), likes.columns(1))
            val win = histWindow(n, b)
            Seq(Compute { _ =>
              val userCnt = likes.groupBy(col(uCol)).agg(count(lit(1)).as("__n"))
              val raw = likes
                .join(members, likes(uCol) === members(members.columns.head), "left_semi")
                .join(userCnt, uCol)
                .withColumn("__w", round(lit(1.0) / (lit(baseCnt) + col("__n")), 10).cast(Dec12))
                .groupBy(col(pCol).as("__post"))
                .agg(sum(col("__w")).as("__raw"))
              normalizedStoreJoin(raw, b, win, mult)
            })

          case "custom_likedbylikers" =>
            // (main.rs:1515): two-hop like-graph walk seeded by the
            // CURRENT working set — each seed post's likers become
            // curators scored by f0..f5 of that post's liker count;
            // the new working set is everything the curators liked,
            // scored by the max-normalized curator-score sum.
            val likes = boundLikes(b, "custom_likedbylikers")
            val fnName = str(n, "userScoreFunction", "f1")
            val exponent = str(n, "scoreExponent", "1.3").toDouble
            val mult = str(n, "scoreNormalizationMultiplier", "1.0").toDouble
            val (uCol, pCol) = (likes.columns(0), likes.columns(1))
            val win = histWindow(n, b)
            Seq(Compute { working =>
              val postCnt = likes.groupBy(col(pCol)).agg(count(lit(1)).as("__cnt"))
              val seeds = working.select(col(b.idCol).as("__sid")).distinct()
              val curators = likes
                .join(seeds, likes(pCol) === col("__sid"))
                .join(postCnt, pCol)
                .withColumn("__s", round(UserScore.fn(fnName, exponent)(col("__cnt")), 10).cast(Dec12))
                .filter(col("__s") > 0) // the reference drops non-positive scores
                .groupBy(col(uCol).as("__cu"))
                .agg(sum(col("__s")).as("__cscore"))
              val raw = likes
                .join(curators, likes(uCol) === col("__cu"))
                .groupBy(col(pCol).as("__post"))
                .agg(sum(col("__cscore")).as("__raw"))
              normalizedStoreJoin(raw, b, win, mult)
            })

          case "feed" =>
            // (main.rs:1704): the reference GETs the feed's skeleton
            // (a post-id list) and keeps the store posts it names.
            // The HTTP fetch itself stays out of the engine; the
            // resolved skeleton arrives via Binding.feeds and the
            // block is the containment check as a semi join — id-set
            // pushdown / broadcast semi at scale. Feed ORDER is not
            // preserved (a distributed frame has no insertion order;
            // same documented divergence as the 500-cap): payloads
            // rank the result with their own sort block.
            val uri = reqStr(n, "feedUri", "feed input")
            val skeleton = b.feeds.getOrElse(
              uri,
              throw new IllegalArgumentException(
                s"unbound feedUri '$uri' — the HTTP skeleton fetch (main.rs:1704) is an ingestion " +
                  "concern; resolve it to a post-id relation in Binding.feeds"))
            Seq(KeepInSet(b.idCol, skeleton, skeleton.columns.head, keep = true))
          case other => throw new IllegalArgumentException(s"unsupported inputType $other")
        }

      case t @ ("keep" | "remove") =>
        str(n, "subject", "") match {
          case subject @ ("like_count" | "reply_count" | "repost_count") =>
            // reference semantics (main.rs:1831-1884): the operator
            // names the rows to REMOVE — `<  v` retains count >= v —
            // and keep/remove dispatch identically for count subjects
            val c = resolveField(b, subject)
            val v = n.get("value")
            require(v != null && v.isNumber, s"$subject filter needs a numeric value")
            val value = lit(v.asDouble())
            val retain = str(n, "operator", "<") match {
              case "<" => c >= value
              case ">" => c <= value
              case "==" => c =!= value
              case "!=" => c === value
              case other => throw new IllegalArgumentException(s"unknown operator '$other' on $subject")
            }
            Seq(WhereFilter(retain))

          case "image_count" =>
            // (main.rs:1817): remove the named bucket
            val c = resolveField(b, "image_count")
            Seq(WhereFilter(str(n, "value", "0") match {
              case "0" => c =!= 0
              case "1" => c =!= 1
              case "2+" => c < 2
              case other => throw new IllegalArgumentException(s"unknown image_count value '$other'")
            }))

          case "language" =>
            // (main.rs:1885): the operator encodes polarity — "=="
            // removes the language, "!=" (default) keeps only it
            val langC = resolveField(b, "language")
            val lang = lit(str(n, "language", "en"))
            Seq(WhereFilter(str(n, "operator", "!=") match {
              case "==" => langC =!= lang
              case "!=" => langC === lang
              case other => throw new IllegalArgumentException(s"unknown operator '$other' on language")
            }))

          case "list" =>
            // author-set membership (main.rs:1903): keep=semi, remove=anti
            val members = boundList(n, b, t)
            Seq(KeepInSet(b.authorCol, members, members.columns.head, keep = t == "keep"))

          case "duplicates" =>
            // one row per key survives (main.rs:1916). In the reference
            // the survivor's identity is irrelevant (scores live in a
            // global map keyed by id); here the score rides on the row,
            // and same-id rows from different input branches can differ
            // in it (aligned() zero-fills unscored branches) — keep the
            // highest-scored variant, deterministically, so the score a
            // later sort reads matches the map's accumulated value
            Seq(Compute { df =>
              val order =
                if (df.columns.contains("score"))
                  Seq(col("score").desc_nulls_last, col(b.idCol))
                else Seq(col(b.idCol))
              DedupByKey(Seq(b.idCol), order)(df)
            })

          case "non_duplicates" =>
            Seq(KeepDupes(Seq(b.idCol), Seq(col(b.idCol))))

          case "embed" =>
            // (main.rs:1929): retain rows NOT matching the named embed
            val rec = resolveField(b, "record")
            Seq(WhereFilter(str(n, "value", "none") match {
              case "none" => rec.isNotNull && rec =!= ""
              case "feed" => !coalesce(rec, lit("")).startsWith("feed")
              case "post" => !coalesce(rec, lit("")).startsWith("post")
              case other => throw new IllegalArgumentException(s"unknown embed value '$other'")
            }))

          case "labels" =>
            // (main.rs:1938): remove every post carrying a named label.
            // A null label array means "no labels" — coalesce before
            // inverting, or `!null` silently drops every unlabeled post
            val labelsCol = b.labelsCol.getOrElse(
              throw new IllegalArgumentException("labels filter needs Binding.labelsCol"))
            val labels = strSeq(n, "labels", "labels filter")
            Seq(WhereFilter(!coalesce(containsAnyToken(labelsCol, labels), lit(false))))

          case "videos" =>
            // (main.rs:1973): the one subject where keep/remove differ
            val v = resolveField(b, "video")
            Seq(WhereFilter(if (t == "keep") v.isNotNull else v.isNull))

          case "item" =>
            // (main.rs:1800): remove the named item kind
            str(n, "value", "reply") match {
              case "post" => Seq(WhereFilter(resolveField(b, "is_reply")))
              case "reply" => Seq(WhereFilter(!resolveField(b, "is_reply")))
              case "repost" => Nil // reference no-ops (main.rs:1811)
              case "has_labels" =>
                // null label array = no labels (size(null) is null, not 0)
                val labelsCol = b.labelsCol.getOrElse(
                  throw new IllegalArgumentException("item has_labels needs Binding.labelsCol"))
                Seq(WhereFilter(coalesce(size(labelsCol), lit(0)) === 0))
              case "has_no_labels" =>
                val labelsCol = b.labelsCol.getOrElse(
                  throw new IllegalArgumentException("item has_no_labels needs Binding.labelsCol"))
                Seq(WhereFilter(coalesce(size(labelsCol), lit(0)) > 0))
              case other => throw new IllegalArgumentException(s"unknown item value '$other'")
            }

          case "where" =>
            // Rhai `where` as a keep/remove subject (main.rs:1952):
            // remove inverts the compiled predicate
            Seq(whereBlock(reqStr(n, "value", t), b, invert = t == "remove"))

          case subject =>
            // engine extension: generic column compare for subjects the
            // reference doesn't name — keep retains matches, remove the
            // complement (our DSL semantics, not reference-specified)
            val op = str(n, "operator", "==")
            val v = n.get("value")
            require(v != null && !v.isNull, s"$t block on '$subject' is missing a value")
            val value = if (v.isNumber) lit(v.asDouble()) else lit(v.asText())
            val effOp = if (t == "keep") op
            else op match {
              case "==" => "!="
              case "!=" => "=="
              case "<" => ">="
              case ">" => "<="
              case "<=" => ">"
              case ">=" => "<"
              case other => throw new IllegalArgumentException(s"unknown operator '$other' in $t block")
            }
            Seq(KeepCmp(subject, effOp, value))
        }

      case "where" =>
        // standalone where block (alias of the keep/subject=where form)
        Seq(whereBlock(reqStr(n, "value", "where"), b, invert = false))

      case "remember_posts" =>
        Nil // a declared no-op in the reference (main.rs:2384)

      case "regex" =>
        compileRegexBlock(n, b, defaultTarget = "text")

      case "score" =>
        require(str(n, "scoreType", "add") == "add", "only scoreType=add exists in the reference")
        val normalize = n.path("normalize").asBoolean(true)
        // a "value" script (the reference's Rhai expression, main.rs:2162)
        // compiles through the same DSL as `where` — arithmetic included
        val expr = if (n.hasNonNull("value"))
          WhereDsl.compile(n.get("value").asText(), b.whereFields, b.whereArrayFields)
        else str(n, "from", "hn") match {
          case "hn" => hnExpr(b, str(n, "gravity", "1.8").toDouble)
          case "like_count" => resolveField(b, "like_count").cast("double")
          case "repost_count" => resolveField(b, "repost_count").cast("double")
          case "reply_count" => resolveField(b, "reply_count").cast("double")
          case "created_at" => unix_millis(col(b.tsCol)).cast("double") / lit(1000.0)
          case other => throw new IllegalArgumentException(s"unsupported score from=$other")
        }
        // the reference's scoreNormalizationMultiplier (main.rs:2631)
        // scales the normalized contribution; it arrives as a string
        val multiplier = str(n, "scoreNormalizationMultiplier", "1.0").toDouble
        // rounding after each score block keeps later rankings bit-stable
        // across engines (same policy as the hand-built pipelines)
        Seq(ScoreAdd(expr, normalize, multiplier), RoundCol("score", b.scoreRoundScale))

      case "sort" =>
        val desc = str(n, "sortDirection", "desc") == "desc"
        def dir(c: Column) = if (desc) c.desc else c.asc
        val keys = str(n, "sortType", "score") match {
          // sort-by-score before any score block: every score is an
          // implicit 0 in the reference — order degrades to recency
          case "score" if !scored => Seq(col(b.tsCol).desc, col(b.idCol))
          case "score" => Seq(dir(col("score")), col(b.idCol))
          case "created_at" => Seq(dir(col(b.tsCol)), col(b.idCol))
          case "likes" => Seq(dir(resolveField(b, "like_count")), col(b.idCol))
          case st @ ("repost_count" | "reply_count") => Seq(dir(resolveField(b, st)), col(b.idCol))
          case "hn" =>
            // sort-time HN score (main.rs:2246): ranked on the rounded
            // value so double `pow` ulp drift can't flip ranks vs the
            // oracle; id tie-break for determinism
            Seq(dir(round(hnExpr(b, str(n, "gravity", "1.8").toDouble), b.scoreRoundScale)), col(b.idCol))
          case "random" =>
            // the reference shuffles with a thread RNG (main.rs:2283);
            // the reproducible distributed equivalent orders by a keyed
            // cryptographic hash of the row id
            Seq(md5(concat(col(b.idCol).cast("string"), lit("#" + str(n, "seed", "42")))).asc, col(b.idCol))
          case other => throw new IllegalArgumentException(s"unsupported sortType $other")
        }
        Seq(SortBy(keys))

      case "limit" =>
        if (str(n, "limitType", "default") == "posts_per_user") {
          val cnt = if (n.hasNonNull("count")) n.get("count").asInt() else 5
          // rank by score once scoring has happened; before that, by
          // recency (no score column exists yet — referencing it would
          // fail on a valid program)
          val order =
            if (scored) Seq(col("score").desc, col(b.idCol))
            else Seq(col(b.tsCol).desc, col(b.idCol))
          Seq(LimitPerKey(b.authorCol, cnt, order))
        } else {
          Seq(LimitN(if (n.hasNonNull("count")) n.get("count").asInt() else 100))
        }

      case "replace" =>
        // (main.rs:2386-2508): lookups swap each row for the store row
        // its ref points at; inversions swap the working set for the
        // store rows pointing INTO it
        val target = str(n, "with", "parent")
        val keepMissing = n.path("keepItemsWithMissingTarget").asBoolean(true)
        target match {
          case "parent" | "root" | "record" =>
            Seq(ReplaceWith(boundStore(b), b.idCol, boundRef(b, target), keepMissing))
          case "direct_replies" =>
            Seq(ReplaceInversion(boundStore(b), boundRef(b, "parent"), b.idCol))
          case "all_replies" =>
            Seq(ReplaceInversion(boundStore(b), boundRef(b, "root"), b.idCol))
          case "quote_posts" =>
            Seq(ReplaceInversion(boundStore(b), boundRef(b, "record"), b.idCol))
          case other => throw new IllegalArgumentException(s"unknown replace target '$other'")
        }

      case other => throw new IllegalArgumentException(s"unsupported block type $other")
    }
  }
}
