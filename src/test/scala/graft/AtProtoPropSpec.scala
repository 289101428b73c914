package graft

import graft.functions.AtProto
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the TID codec: one generated batch of arbitrary
  * timestamps through a single DataFrame — decode∘encode is identity
  * and lexicographic TID order is exactly timestamp order, over the
  * codec's whole valid domain (micros < 2^54), not just hand-picked
  * examples.
  */
class AtProtoPropSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 4)

  test("TID codec: roundtrip identity and order preservation over random micros") {
    import spark.implicits._
    val gen = Gen.chooseNum(0L, (1L << 54) - 1)
    val micros = Gen.listOfN(500, gen).sample.getOrElse(sys.error("gen failed"))
      .distinct ++ Seq(0L, 1L, (1L << 54) - 1)
    val rows = micros.toDF("us")
      .select(col("us"), AtProto.microsToTid(col("us")).as("tid"))
      .withColumn("back", AtProto.tidToMicros(col("tid")))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("back") == r.getAs[Long]("us"),
        s"roundtrip broke at ${r.getAs[Long]("us")}")
      assert(r.getAs[String]("tid").length == 13)
    }
    val sortedByTime = rows.sortBy(_.getAs[Long]("us")).map(_.getAs[String]("tid")).toSeq
    assert(sortedByTime == sortedByTime.sorted, "lexicographic order diverged from time order")
  }
}
