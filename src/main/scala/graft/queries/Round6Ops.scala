package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 additions: the PRODUCTION intake recipe. corpus_recipe (#88)
  * proves the gates → dedup → decontaminate → split chain composes as
  * one plan with an exact oracle, but its dedup stage is
  * normalization-aware EXACT dedup — a real crawl intake near-dedups.
  * That swap only became safe this round: the MinHash band join now
  * carries the hot-bucket guard (TextOps.dropHotBuckets), so a
  * boilerplate-heavy corpus cannot blow the recipe up from inside its
  * dedup stage.
  */
object Round6Ops {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** #92 corpus_recipe_neardup — corpus_recipe with the dedup stage
    * swapped for MinHash NEAR-dedup over the gated survivors: every
    * candidate pair (est. jaccard ≥ 0.5) drops its higher doc_id, the
    * dedup family's order-free lower-id-survivor rule, hot-bucket
    * guarded. Gate and tail are corpus_recipe's own (shared code), so
    * the two entries differ in exactly the stage under study.
    * Rows-only by declared design (xxhash64 signatures aren't
    * SQL-expressible); the planted test pins that a near-duplicate —
    * NOT byte- or normalization-identical — folds into its original.
    * Scale shape: the gram/signature pass runs over gate SURVIVORS
    * only, the band join shuffles on (band, bandhash) under the cap,
    * and the tail's decontaminate/split/card stay the audited #88
    * plans.
    */
  def corpusRecipeNeardup(s: SparkSession, dir: String): DataFrame =
    corpusRecipeNeardupOver(docs(s, dir))

  private[graft] def corpusRecipeNeardupOver(d: DataFrame): DataFrame =
    Round5Ops.recipeTail(d, nearDedupDocs(Round5Ops.recipeGate(d)))

  /** The near-dedup stage over a gated (doc_id, source, text, n_words)
    * working set — test entry point for the planted near-duplicate.
    */
  private[graft] def nearDedupDocs(gated: DataFrame): DataFrame =
    gated
      .join(
        TextOps.minhashPairs(gated.select(col("doc_id"), col("text")))
          .select(col("b").as("doc_id"))
          .distinct(),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("text"), col("n_words"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_recipe_neardup" -> (corpusRecipeNeardup(_, _)))

  val oracles: Map[String, String] = Map.empty
}
