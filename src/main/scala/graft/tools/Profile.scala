package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry: time sub-plans of the slow queries to find
  * where wall-clock goes (dev tool, not part of the driver contract).
  */
object Profile {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import graft.queries.TextOps

    val docs = Tables.documents(spark, dir)
    val words = split(col("text"), " ")
    val sh3 = array_distinct(transform(sequence(lit(0), greatest(size(words) - 3, lit(0))),
      i => concat_ws(" ", element_at(words, i + 1), element_at(words, i + 2), element_at(words, i + 3))))

    // warmup
    docs.select(col("doc_id")).write.format("noop").mode("overwrite").save()

    time("shingle-compute-only")(docs.select(sh3.as("sh")).select(size(col("sh"))).agg(sum("size(sh)")).count())
    time("explode-grams")(docs.select(col("doc_id"), explode(sh3).as("g")).count())
    val grams = docs.select(col("doc_id"), explode(sh3).as("g"))
    time("grams-groupby-size")(grams.groupBy("doc_id").count().count())
    time("grams-selfjoin-shifted") {
      grams.join(grams.select((col("doc_id") - 1).as("doc_id"), col("g")), Seq("doc_id", "g")).count()
    }
    time("md5-min-agg")(grams.groupBy("doc_id").agg(min(md5(col("g")))).count())
    time("minhash-16-via-agg") {
      val base = grams.select(col("doc_id"), xxhash64(col("g")).as("h"))
      base.groupBy("doc_id")
        .agg(min(xxhash64(lit(0), col("h"))).as("m0"),
          (1 until 16).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i")): _*)
        .count()
    }
    time("full-ngram-jaccard")(TextOps.ngramJaccard(spark, dir).count())
    time("full-doc-fingerprint")(TextOps.docFingerprint(spark, dir).count())

    // native codegen'd DotProduct vs interpreted HOF composition, at
    // pair-mining scale (half-matrix of embeddings)
    val embp = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    val lp = embp.select(col("vec_id").as("a"), col("e").as("ea"))
    val rp = embp.select(col("vec_id").as("b"), col("e").as("eb"))
    val pairs = lp.join(broadcast(rp), col("a") < col("b"))
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    for (round <- 1 to 3) {
      time(s"dot-native-pairs-$round")(
        pairs.select(graft.functions.Registry.dot(col("ea"), col("eb")).as("d"))
          .agg(sum("d")).count())
      time(s"dot-hof-pairs-$round")(
        pairs.select(hofDot(col("ea"), col("eb")).as("d")).agg(sum("d")).count())
    }

    val li = Tables.lineitem(spark, dir)
    time("rollup-plain-double")(li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")), count(lit(1))).count())
    time("rollup-decimal")(li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(38, 6))), count(lit(1))).count())
    time("percentile-agg")(li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)")).count())
    spark.stop()
  }
}
