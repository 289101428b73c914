package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Firehose record normalization — the reference's ingestion front
  * door re-expressed relationally.
  *
  * `process_post` (main.rs:3447-3683) and `process_profile`
  * (main.rs:3684-3723) transcribe raw firehose JSON records into the
  * PostV1 / Profile shapes every downstream block consumes: id/author
  * prefix strips, array-field defaulting, image alt-text joining with
  * the `<[{next-image}]>` separator, video blob/aspect/captions
  * flattening (the `CAPTION_FILE_TEXT_CONTENT_SKYFEED_QUERY_ENGINE`
  * caption framing), engagement-count seeding, and skip-on-error for
  * records without an id.
  *
  * Here that is ONE `from_json` projection plus a null filter — fully
  * codegen'd column expressions, no UDF, no shuffle: at 100 TB this
  * fuses into the scan of the raw record files and parallelizes
  * per-partition with zero coordination. Divergences from the
  * reference, all deliberate and documented inline:
  *
  *   - mentions/langs/tags/labels become SORTED DISTINCT arrays (the
  *     reference stores `HashSet`s — unordered; a deterministic
  *     relational engine needs a canonical order). `links` stays a
  *     plain array in wire order (the reference keeps a `Vec`).
  *   - the reference `unwrap()`s `author`/`text`/`createdAt` and
  *     PANICS the ingest loop on a record missing them; panicking a
  *     1000-executor job over one bad record is wrong at scale, so
  *     those rows take the same skip path as a missing `id` (the
  *     reference's only graceful error, anyhow!("Failed to
  *     process_post")).
  *   - `quote_count` seeds 0 exactly like the reference's
  *     `// TODO Get proper quote count`.
  */
object Firehose {

  /** Raw post-record JSON schema (the reference's SINGLE_POST_QUERY
    * column list, main.rs:3726): absent fields read as null, exactly
    * the reference's `contains_key && !is_null` guard pair.
    */
  val postRecordSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("author", StringType),
    StructField("text", StringType),
    StructField("langs", ArrayType(StringType)),
    StructField("tags", ArrayType(StringType)),
    StructField("mentions", ArrayType(StringType)),
    StructField("labels", ArrayType(StringType)),
    StructField("links", ArrayType(StringType)),
    StructField("images", ArrayType(StructType(Seq(StructField("alt", StringType))))),
    StructField("record", StringType),
    StructField("root", StringType),
    StructField("parent", StringType),
    StructField("via", StringType),
    StructField("bridgyOriginalUrl", StringType),
    StructField("video", StructType(Seq(
      StructField("aspectRatio", StructType(Seq(
        StructField("height", LongType), StructField("width", LongType)))),
      StructField("blob", StructType(Seq(
        StructField("mediaType", StringType), StructField("size", LongType)))),
      StructField("alt", StringType),
      StructField("captions", ArrayType(StructType(Seq(StructField("text", StringType)))))))),
    StructField("replyCount", LongType),
    StructField("repostCount", LongType),
    StructField("likeCount", LongType),
    StructField("createdAt", StringType)))

  /** Raw profile-record JSON schema (process_profile's field reads). */
  val profileRecordSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("displayName", StringType),
    StructField("handle", StringType),
    StructField("description", StringType),
    StructField("avatar", StringType),
    StructField("banner", StringType)))

  private val nextImageSep = "\n\n<[{next-image}]>\n\n"
  private val captionFrame = "CAPTION_FILE_TEXT_CONTENT_SKYFEED_QUERY_ENGINE\n"

  private def emptyStrings: Column = array().cast("array<string>")
  private def setCol(c: Column): Column = sort_array(array_distinct(coalesce(c, emptyStrings)))

  /** Raw JSON post records (`raw` string column) → typed PostV1
    * columns (process_post, main.rs:3447-3683). Streaming-safe: a
    * stateless projection + filter, usable unchanged under
    * `readStream` (see [[graft.streaming.Streams.firehoseIntakeStream]]).
    */
  def parsePostRecords(raw: DataFrame, rawCol: String = "raw"): DataFrame = {
    // Parse ONCE per row, behind a generator barrier: a plain
    // project-then-filter lets predicate pushdown substitute the
    // from_json into every null-check (5 full parses per row in the
    // optimized plan — measured 4× the whole operator's cost), and
    // OptimizeJsonExprs then prunes each copy to a different schema so
    // codegen CSE can't merge them back. explode(filter(array(j)))
    // evaluates the parse exactly once, drops skip-on-error rows in
    // the same breath, and nothing rewrites through a Generate.
    val j = from_json(col(rawCol), postRecordSchema)
    // prefix-room checks: the reference's id[5..] / author[4..] PANIC
    // on shorter strings (a wrong-typed "id":123 coerces to "123" in
    // PERMISSIVE mode and would blind-strip to "") — here too-short
    // ids take the same skip path as missing ones
    val valid = filter(
      array(j),
      x =>
        length(x.getField("id")) >= 6 && length(x.getField("author")) >= 5 &&
          x.getField("text").isNotNull && x.getField("createdAt").isNotNull)
    val withJ = raw.select(explode(valid).as("j"))
    val video = col("j.video")
    def vid(f: Column): Column = when(video.isNull, lit(null)).otherwise(f)
    withJ
      .select(
        // id[5..] / author[4..]: blind prefix strips, like the reference
        expr("substring(j.id, 6)").as("id"),
        expr("substring(j.author, 5)").as("author"),
        col("j.text").as("text"),
        setCol(col("j.langs")).as("langs"),
        setCol(col("j.tags")).as("tags"),
        setCol(col("j.mentions")).as("mentions"),
        setCol(col("j.labels")).as("labels"),
        coalesce(col("j.links"), emptyStrings).as("links"),
        coalesce(size(col("j.images")), lit(0)).cast("long").as("image_count"),
        when(col("j.images").isNull, lit(""))
          .otherwise(array_join(
            transform(col("j.images"), i => coalesce(i.getField("alt"), lit(""))),
            nextImageSep))
          .as("alt_text"),
        coalesce(col("j.record"), lit("")).as("record"),
        coalesce(expr("substring(j.root, 6)"), lit("")).as("root"),
        coalesce(expr("substring(j.parent, 6)"), lit("")).as("parent"),
        col("j.via").as("via"),
        col("j.bridgyOriginalUrl").as("bridgy_original_url"),
        vid(coalesce(col("j.video.aspectRatio.height"), lit(0L))).as("video_height"),
        vid(coalesce(col("j.video.aspectRatio.width"), lit(0L))).as("video_width"),
        vid(coalesce(col("j.video.blob.mediaType"), lit(""))).as("video_media_type"),
        vid(coalesce(col("j.video.blob.size"), lit(0L))).as("video_size"),
        vid(coalesce(col("j.video.alt"), lit(""))).as("video_alt"),
        vid(coalesce(
          array_join(
            transform(
              col("j.video.captions"),
              c => concat(lit(captionFrame), coalesce(c.getField("text"), lit("")), lit("\n"))),
            ""),
          lit(""))).as("video_captions_text"),
        coalesce(col("j.replyCount"), lit(0L)).as("reply_count"),
        coalesce(col("j.repostCount"), lit(0L)).as("repost_count"),
        coalesce(col("j.likeCount"), lit(0L)).as("like_count"),
        lit(0L).as("quote_count"),
        col("j.createdAt").as("created_at"))
  }

  /** Raw JSON profile records → typed Profile columns
    * (process_profile, main.rs:3684-3723): name/handle/description
    * default to "", has_avatar/has_banner are key-presence flags,
    * follower/following seed 0 (counted later by the graph, not the
    * record). Missing id takes the skip path (the reference unwraps).
    */
  def parseProfileRecords(raw: DataFrame, rawCol: String = "raw"): DataFrame =
    raw
      .select(explode(filter(
        array(from_json(col(rawCol), profileRecordSchema)),
        x => x.getField("id").isNotNull)).as("j"))
      .select(
        col("j.id").as("id"),
        coalesce(col("j.displayName"), lit("")).as("name"),
        coalesce(col("j.handle"), lit("")).as("handle"),
        coalesce(col("j.description"), lit("")).as("description"),
        col("j.avatar").isNotNull.as("has_avatar"),
        col("j.banner").isNotNull.as("has_banner"),
        lit(0L).as("follower_count"),
        lit(0L).as("following_count"))

  // ---------------------------------------------------------------
  // Deterministic raw-record fixtures (the container ships no firehose
  // capture): every field-presence/absence/dup/default branch of
  // process_post driven by event_id residues, byte-built with the same
  // concat logic the DuckDB oracle uses, so the PARSE is what the
  // correctness gate exercises. The e%17 rows omit `id` — the
  // skip-on-error path.
  // ---------------------------------------------------------------

  /** events → one raw post-record JSON line per event.
    *
    * The input fans across the session's cores first (r10, measured):
    * every caller feeds the single-row-group events scan, so the
    * synthesis concat AND the downstream from_json parse ran as ONE
    * task (two ~1.5 s single-task stages at sf0.1 in parse_post_records
    * — the ingest front door). GraftSession.fan is the identity
    * whenever the scan already fills the configured parallelism.
    */
  def synthPostRecords(events: DataFrame): DataFrame = {
    val fanned = graft.GraftSession.fan(events, col("event_id"))
    val e = col("event_id")
    val u = col("user_id")
    def s(c: Column): Column = c.cast("string")
    def m(k: Int): Column = pmod(e, lit(k))
    val raw = concat(
      lit("{\"author\":\"did:plc:u"), s(u),
      lit("\",\"text\":\"post about "), col("event_type"), lit(" number "), s(e),
      lit("\",\"createdAt\":\"t"), s(unix_micros(col("ts"))),
      lit("\",\"likeCount\":"), s(pmod(e * 7, lit(100))),
      when(m(17) === 0, lit(""))
        .otherwise(concat(lit(",\"id\":\"post:rk"), s(e), lit("_plc_u"), s(u), lit("\""))),
      when(m(5) === 0, lit(""))
        .when(m(5) === 1, lit(",\"langs\":[\"en\"]"))
        .when(m(5) === 2, lit(",\"langs\":[\"en\",\"es\"]"))
        .when(m(5) === 3, lit(",\"langs\":[\"es\",\"en\",\"en\"]"))
        .otherwise(lit(",\"langs\":[]")),
      when(m(4) === 0, lit(""))
        .when(m(4) === 1, concat(lit(",\"tags\":[\"tag"), s(m(7)), lit("\",\"common\"]")))
        .when(m(4) === 2, lit(",\"tags\":[\"common\",\"common\"]"))
        .otherwise(concat(lit(",\"tags\":[\"tag"), s(m(7)), lit("\"]"))),
      when(m(6) === 0, concat(lit(",\"mentions\":[\"did:plc:u"), s(u + 1), lit("\"]")))
        .otherwise(lit("")),
      when(m(8) === 0, lit(",\"labels\":[\"porn\"]"))
        .when(m(8) === 4, lit(",\"labels\":[\"nudity\",\"porn\",\"nudity\"]"))
        .otherwise(lit("")),
      when(m(3) === 0, concat(
        lit(",\"links\":[\"https://example.com/a\",\"https://news.example.org/x"), s(m(5)), lit("\"]")))
        .when(m(3) === 1, lit(",\"links\":[]"))
        .otherwise(lit("")),
      when(m(9) === 1, concat(lit(",\"images\":[{\"alt\":\"alt 0 for "), s(e), lit("\"}]")))
        .when(m(9) === 2, concat(
          lit(",\"images\":[{\"alt\":\"alt 0 for "), s(e),
          lit("\"},{\"alt\":\"alt 1 for "), s(e), lit("\"}]")))
        .when(m(9) === 3, concat(
          lit(",\"images\":[{\"alt\":\"alt 0 for "), s(e),
          lit("\"},{\"alt\":\"alt 1 for "), s(e),
          lit("\"},{\"alt\":\"alt 2 for "), s(e), lit("\"}]")))
        .otherwise(lit("")),
      when(m(10) === 0, concat(
        lit(",\"record\":\"post:rk"), s(e + 1000000), lit("_plc_u"), s(u), lit("\"")))
        .otherwise(lit("")),
      when(m(2) === 1, concat(
        lit(",\"root\":\"post:rt"), s(e), lit("_plc_u"), s(u),
        lit("\",\"parent\":\"post:pr"), s(e), lit("_plc_u"), s(u), lit("\"")))
        .otherwise(lit("")),
      when(m(12) === 0, lit(",\"via\":\"deck.blue\"")).otherwise(lit("")),
      when(m(15) === 0, concat(
        lit(",\"bridgyOriginalUrl\":\"https://mastodon.example/u"), s(u), lit("/"), s(e), lit("\"")))
        .otherwise(lit("")),
      when(m(11) === 0, concat(
        lit(",\"video\":{\"aspectRatio\":{\"height\":1080,\"width\":1920},\"blob\":{\"mediaType\":\"video/mp4\",\"size\":"),
        s(e * 1000),
        lit("},\"alt\":\"vid "), s(e),
        lit("\",\"captions\":[{\"text\":\"cap a "), s(e), lit("\"},{\"text\":\"cap b\"}]}")))
        .when(m(11) === 5, concat(
          lit(",\"video\":{\"blob\":{\"mediaType\":\"video/mp4\",\"size\":"), s(e), lit("}}")))
        .otherwise(lit("")),
      when(m(13) === 0, lit(""))
        .otherwise(concat(lit(",\"replyCount\":"), s(pmod(e, lit(50))))),
      when(m(2) === 0, concat(lit(",\"repostCount\":"), s(pmod(u, lit(20)))))
        .otherwise(lit("")),
      lit("}"))
    fanned.select(e.as("event_id"), raw.as("raw"))
  }

  /** customer → one raw profile-record JSON line per customer; the
    * k%13 rows omit `id` (skip path), avatar/banner presence by
    * residue (has_avatar/has_banner are key-presence flags).
    */
  def synthProfileRecords(customer: DataFrame): DataFrame = {
    val k = col("c_custkey")
    def s(c: Column): Column = c.cast("string")
    def m(i: Int): Column = pmod(k, lit(i))
    val raw = concat(
      lit("{\"seq\":"), s(k),
      when(m(13) === 0, lit(""))
        .otherwise(concat(lit(",\"id\":\"did:plc:c"), s(k), lit("\""))),
      when(m(4) === 0, lit(""))
        .otherwise(concat(lit(",\"displayName\":\""), col("c_name"), lit("\""))),
      when(m(5) === 0, lit(""))
        .otherwise(concat(lit(",\"handle\":\"u"), s(k), lit(".bsky.social\""))),
      when(m(3) === 0, lit(""))
        .otherwise(concat(lit(",\"description\":\"segment "), col("c_mktsegment"), lit("\""))),
      when(m(2) === 0, concat(lit(",\"avatar\":\"av"), s(k), lit("\""))).otherwise(lit("")),
      when(m(7) === 0, concat(lit(",\"banner\":\"bn"), s(k), lit("\""))).otherwise(lit("")),
      lit("}"))
    customer.select(k.as("c_custkey"), raw.as("raw"))
  }
}
