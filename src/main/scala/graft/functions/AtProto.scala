package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's AT-proto id codecs (main.rs:4105-4200) as pure
  * Catalyst column expressions — no UDFs, everything codegen'd, so id
  * translation can run inside a 100 TB scan at full speed.
  *
  * TID (datetime_to_tid, main.rs:4195): epoch micros shifted left 9
  * bits, encoded big-endian in the SORTABLE base32 alphabet
  * "234567abcdefghijklmnopqrstuvwxyz" — 13 symbols covering 65 bits
  * (the final symbol carries the low 4 bits plus one zero pad bit).
  * Lexicographic TID order == timestamp order (the property the
  * reference's BTreeMap range scans rely on; here it makes TID columns
  * range-prunable exactly like timestamps).
  */
object AtProto {

  private val Alphabet = "234567abcdefghijklmnopqrstuvwxyz"

  private def sym(idx: Column): Column =
    element_at(array(Alphabet.map(c => lit(c.toString)): _*), idx.cast("int") + 1)

  private val symVal: Column =
    map(Alphabet.zipWithIndex.flatMap { case (c, i) => Seq(lit(c.toString), lit(i.toLong)) }: _*)

  /** Epoch microseconds → 13-char sortable-base32 TID. Valid for
    * micros < 2^54 (year ~2540): the <<9 stays inside a signed long.
    */
  def microsToTid(micros: Column): Column = {
    val v = micros * lit(512L) // << 9
    val head = (0 until 12).map(k => sym(shiftrightunsigned(v, 59 - 5 * k).bitwiseAND(31)))
    val last = sym(v.bitwiseAND(15) * 2) // low 4 bits + zero pad bit
    concat(head :+ last: _*)
  }

  /** 13-char TID → epoch microseconds (inverse of [[microsToTid]]).
    * Malformed input (wrong length, characters outside the alphabet)
    * decodes to null — try_element_at, not element_at, because Spark
    * 4's default ANSI mode would otherwise throw on the first bad row
    * and kill the scan.
    */
  def tidToMicros(tid: Column): Column = {
    val head = (0 until 12)
      .map(k => try_element_at(symVal, substring(tid, k + 1, 1)) * lit(1L << (59 - 5 * k)))
      .reduce(_ + _)
    val last = shiftrightunsigned(try_element_at(symVal, substring(tid, 13, 1)), 1)
    // >> 9, NOT `/ 512`: Spark's `/` on longs is double division
    when(length(tid) === 13, shiftrightunsigned(head + last, 9))
  }

  /** did:plc:x → plc_x; did:web:a.b-c → web_a_b__c (did_to_key,
    * main.rs:4151 — '.'→'_' then '-'→'__', in that order).
    */
  def didToKey(did: Column): Column =
    when(did.startsWith("did:plc:"), concat(lit("plc_"), substring(did, 9, 2048)))
      .when(
        did.startsWith("did:web:"),
        concat(
          lit("web_"),
          // literal replaces, not regex: translate for the 1:1 '.'→'_',
          // then the non-regex replace() for the 1:2 '-'→'__' — same
          // application order, no per-row Pattern machinery
          replace(translate(substring(did, 9, 2048), ".", "_"), lit("-"), lit("__"))))
      .otherwise(lit(null).cast("string"))

  /** didkey → did body (unsafe_key_to_did, main.rs:4172): every '_'
    * becomes ':' — "plc_x" → "plc:x". Faithfully UNSAFE, exactly like
    * the reference: a web key's '_' (from '.') and '__' (from '-')
    * are mangled too, which is why the reference names it unsafe and
    * only calls it on plc keys. [[postIdToUri]] is the safe inverse
    * for full post ids.
    */
  def keyToDid(key: Column): Column = translate(key, "_", ":")

  /** rkey validated against the reference's RKEY_REGEX
    * `^[a-z0-9-]+$` (ensure_valid_rkey, main.rs:4181): passes through
    * valid rkeys, yields null for invalid ones — the family's
    * null-not-throw form of the reference's Err, filterable mid-scan.
    */
  def ensureValidRkey(rkey: Column): Column =
    when(rkey.rlike("^[a-z0-9\\-]+$"), rkey)

  /** "<coll>:<rkey>_<method>_<body>" → at:// URI
    * (convert_post_id_to_uri, main.rs:4105): the inverse of
    * [[atUriToPostId]] including the web-DID unescape ORDER — '__'
    * back to '-' FIRST, then '_' back to '.' (the reverse of
    * did_to_key's '.'-then-'-' escape, same order as the reference's
    * replace chain). Two DELIBERATE divergences: (1) the reference's
    * plain split('_') takes parts[2] only, truncating every
    * multi-segment web body ("web_example_com" loses "_com") — here
    * split(limit=3) keeps the whole body so did→key→uri round-trips;
    * (2) the reference indexes blindly (parts[1]/parts[2] panic on
    * malformed ids), here malformed ids yield null. Round-trip with
    * [[atUriToPostId]] is pinned in AtProtoSpec.
    */
  def postIdToUri(id: Column): Column = {
    val last = element_at(split(id, ":"), -1)
    val parts = split(last, "_", 3)
    val rkey = get(parts, lit(0))
    val method = get(parts, lit(1))
    val body = get(parts, lit(2))
    val host = when(
      method === "web",
      // split with limit=3 keeps web bodies with '_' intact; unescape
      // '__'→'-' before '_'→'.' (inverse application order); literal
      // replace/translate, no regex engine per row
      translate(replace(body, lit("__"), lit("-")), "_", "."))
      .otherwise(body)
    when(
      method.isNotNull && body.isNotNull && ensureValidRkey(rkey).isNotNull,
      concat(lit("at://did:"), method, lit(":"), host, lit("/app.bsky.feed.post/"), rkey))
  }

  /** at://<did>/<collection>/<rkey> → "<post|list>:<rkey>_<didkey>"
    * (at_uri_to_post_id, main.rs:4127). Unsupported collections and
    * invalid DIDs/rkeys yield null (the relational form of the
    * reference's Err) — filterable, never throwing mid-scan.
    */
  def atUriToPostId(uri: Column): Column = {
    val parts = split(uri, "/")
    // get() is 0-indexed and null-safe: a URI with fewer segments must
    // yield null, not an ANSI INVALID_ARRAY_INDEX error mid-scan
    val host = get(parts, lit(2))
    val collection = get(parts, lit(3))
    val rkey = get(parts, lit(4))
    val coll = when(collection === "app.bsky.feed.post", lit("post"))
      .when(collection === "app.bsky.graph.list", lit("list"))
    val didKey = didToKey(host)
    when(
      coll.isNotNull && didKey.isNotNull && rkey.rlike("^[a-z0-9\\-]+$"),
      concat(coll, lit(":"), rkey, lit("_"), didKey))
  }
}
