package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** JSON front-end for the pipeline compiler: accepts the reference
  * engine's block payload shape (main.rs:1243 `payload["blocks"]` — the
  * SkyFeed builder wire format) and compiles it onto a relation. A user
  * of the reference can POST the same JSON; here it becomes ONE Catalyst
  * plan instead of an interpreted block loop.
  *
  * `Binding` maps the reference's logical post fields onto the actual
  * relation's columns (id, author, created-at, engagement value, regex
  * target columns, and the field names the `where` scripts may use).
  */
case class Binding(
    idCol: String,
    authorCol: String,
    tsCol: String,
    valueCol: String,
    nowEpochMs: Long,
    regexTargets: Map[String, Seq[String]],
    whereFields: Map[String, Column],
    scoreRoundScale: Int = 6)

object PipelineJson {
  private val mapper = new ObjectMapper

  def parse(payload: String, b: Binding): Seq[Block] = {
    val root = mapper.readTree(payload)
    val blocks = root.path("blocks")
    require(blocks.isArray, "payload must carry a blocks array")
    // track whether a score block has run: blocks downstream of scoring
    // rank by score; before any scoring they rank by recency (the
    // reference's "current order" is its insertion order — newest-first
    // recency is the deterministic distributed equivalent)
    var scored = false
    blocks.elements().asScala.flatMap { node =>
      val out = compileBlock(node, b, scored)
      if (str(node, "type", "") == "score") scored = true
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
    */
  def run(base: org.apache.spark.sql.DataFrame, payload: String, b: Binding): org.apache.spark.sql.DataFrame = {
    val root = mapper.readTree(payload)
    val blockNodes = root.path("blocks")
    require(blockNodes.isArray, "payload must carry a blocks array")
    var working: Option[org.apache.spark.sql.DataFrame] = None
    val stash = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame]()
    var scored = false

    // frames on either side of a union may or may not have picked up a
    // score column yet — align on score=0.0 (the reference's side-map
    // default) before unioning
    def aligned(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) = {
      def ensure(df: org.apache.spark.sql.DataFrame) =
        if (df.columns.contains("score")) df
        else df.withColumn("score", org.apache.spark.sql.functions.lit(0.0))
      if (x.columns.contains("score") || y.columns.contains("score"))
        ensure(x).unionByName(ensure(y))
      else x.unionByName(y)
    }

    blockNodes.elements().asScala.foreach { node =>
      str(node, "type", "") match {
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

  private def str(n: JsonNode, field: String, dflt: String): String =
    if (n.hasNonNull(field)) n.get(field).asText() else dflt

  private def reqStr(n: JsonNode, field: String, blockType: String): String = {
    require(n.hasNonNull(field), s"$blockType block is missing '$field'")
    n.get(field).asText()
  }

  private def compileBlock(n: JsonNode, b: Binding, scored: Boolean = true): Seq[Block] = {
    str(n, "type", "") match {
      case "input" =>
        str(n, "inputType", "firehose") match {
          case "firehose" =>
            val secs = if (n.hasNonNull("firehoseSeconds")) n.get("firehoseSeconds").asLong() else 86400L
            Seq(InputWindow(b.tsCol, b.nowEpochMs, secs))
          case other => throw new IllegalArgumentException(s"unsupported inputType $other")
        }

      case t @ ("keep" | "remove") =>
        val subject = str(n, "subject", "")
        val op = str(n, "operator", "==")
        val v = n.get("value")
        // wire input: validate, don't NPE
        require(v != null && !v.isNull, s"$t block on '$subject' is missing a value")
        val value = if (v.isNumber) lit(v.asDouble()) else lit(v.asText())
        // `remove X op v` retains the complement — invert the operator
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

      case "regex" =>
        val targets = b.regexTargets.getOrElse(
          str(n, "target", "text"),
          throw new IllegalArgumentException(s"unbound regex target ${str(n, "target", "text")}"))
        Seq(KeepRegex(
          targets,
          reqStr(n, "value", "regex"),
          caseSensitive = n.path("caseSensitive").asBoolean(false),
          invert = n.path("invert").asBoolean(false)))

      case "where" =>
        Seq(WhereFilter(WhereDsl.compile(reqStr(n, "value", "where"), b.whereFields)))

      case "score" =>
        require(str(n, "scoreType", "add") == "add", "only scoreType=add exists in the reference")
        val normalize = n.path("normalize").asBoolean(true)
        // a "value" script (the reference's Rhai expression, main.rs:2162)
        // compiles through the same DSL as `where` — arithmetic included
        val expr = if (n.hasNonNull("value"))
          WhereDsl.compile(n.get("value").asText(), b.whereFields)
        else str(n, "from", "hn") match {
          case "hn" =>
            val gravity = str(n, "gravity", "1.8").toDouble
            val ageH = (lit(b.nowEpochMs) - unix_millis(col(b.tsCol))).cast("double") / lit(3600000.0)
            col(b.valueCol) / pow(ageH + lit(2.0), lit(gravity))
          case "like_count" => col(b.valueCol)
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
          case "likes" => Seq(dir(col(b.valueCol)), col(b.idCol))
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

      case other => throw new IllegalArgumentException(s"unsupported block type $other")
    }
  }
}
