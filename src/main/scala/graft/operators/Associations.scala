package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Association / co-occurrence mining over basket-shaped data — the
  * "what appears together" primitive behind recommender candidates,
  * related-document suggestions and topic co-occurrence stats. All
  * scores are integer-exact (counts and DIV-scaled ratios), so results
  * hash-match an external SQL replay.
  */
object Associations {

  /** Pairwise co-occurrence counts with per-item supports and
    * confidences: for every unordered item pair {i1 &lt; i2} that shares
    * at least one basket, emit how many baskets contain both
    * (`pair_cnt`), each item's basket support, and both directed
    * confidences as exact parts-per-million
    * (`conf12_ppm = pair_cnt·10⁶ DIV cnt_1`).
    *
    * Plan shape: one distinct (partial-agg) pass builds the
    * (basket, item) posting frame, checkpointed once because it feeds
    * three consumers (both sides of the pair join and the support
    * aggregate). The pair join is an equi-join on the basket id — at
    * scale the shuffle key — and its output volume is
    * Σ_b |b|·(|b|−1)/2, which is why oversized baskets are dropped WHOLE
    * before the join (partial-agg count + broadcast anti-join, the same
    * skew guard as the dedup joins): one degenerate basket of 10⁶ items
    * would otherwise emit 5·10¹¹ pairs. Confidences of surviving pairs
    * are unaffected — supports count all baskets an item appears in,
    * including dropped ones, so the guard only removes pairs, never
    * skews scores.
    */
  def coOccurrencePairs(df: DataFrame, basketCol: Column, itemCol: Column,
                        maxBasket: Long = 10000L): DataFrame = {
    require(maxBasket >= 2, s"maxBasket=$maxBasket must be >= 2")
    val t = df.select(basketCol.as("b"), itemCol.as("i"))
      .distinct()
      .localCheckpoint(true)
    val sup = t.groupBy(col("i")).agg(count(lit(1)).as("cnt"))
    val big = t.groupBy(col("b")).agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBasket).select(col("b"))
    val kept = t.join(broadcast(big), Seq("b"), "left_anti")
    kept.alias("a").join(kept.alias("c"),
        col("a.b") === col("c.b") && col("a.i") < col("c.i"))
      .select(col("a.i").as("i1"), col("c.i").as("i2"))
      .groupBy(col("i1"), col("i2"))
      .agg(count(lit(1)).as("pair_cnt"))
      .join(sup.select(col("i").as("i1"), col("cnt").as("cnt_1")), Seq("i1"))
      .join(sup.select(col("i").as("i2"), col("cnt").as("cnt_2")), Seq("i2"))
      .select(col("i1"), col("i2"), col("pair_cnt"), col("cnt_1"), col("cnt_2"),
        expr("pair_cnt * 1000000L DIV cnt_1").as("conf12_ppm"),
        expr("pair_cnt * 1000000L DIV cnt_2").as("conf21_ppm"))
  }
}
