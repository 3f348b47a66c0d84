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

  /** Frequent item triples (Apriori level 3, Agrawal &amp; Srikant VLDB
    * 1994): ordered triples {i1 &lt; i2 &lt; i3} contained in at least
    * `minSupport` baskets.
    *
    * The anti-explosion structure is Apriori's downward-closure pruning,
    * expressed as semi-joins: items below `minSupport` leave the posting
    * frame first (L1), pair occurrences that aren't frequent pairs never
    * extend to a third item (L2 semi-join on the occurrence stream), and
    * candidate triples whose other two sub-pairs aren't frequent are cut
    * before the counting shuffle. The frequent-pair frame is an aggregate
    * (≤ one row per frequent pair), broadcast to every prune site; the
    * only data-sized shuffles are the basket equi-joins. Oversized
    * baskets are dropped whole, as in [[coOccurrencePairs]].
    *
    * Output: (i1, i2, i3, triple_cnt), support ≥ `minSupport`.
    */
  def frequentTriples(df: DataFrame, basketCol: Column, itemCol: Column,
                      minSupport: Long, maxBasket: Long = 10000L): DataFrame = {
    require(minSupport >= 1, s"minSupport=$minSupport must be >= 1")
    require(maxBasket >= 3, s"maxBasket=$maxBasket must be >= 3")
    val t = df.select(basketCol.as("b"), itemCol.as("i"))
      .distinct()
      .localCheckpoint(true)
    val big = t.groupBy(col("b")).agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBasket).select(col("b"))
    val dropped = t.join(broadcast(big), Seq("b"), "left_anti")
    val l1 = dropped.groupBy(col("i")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minSupport).select(col("i"))
    val kept = dropped.join(broadcast(l1), Seq("i"), "left_semi")
      .localCheckpoint(true)
    val pocc = kept.alias("a").join(kept.alias("c"),
        col("a.b") === col("c.b") && col("a.i") < col("c.i"))
      .select(col("a.b").as("b"), col("a.i").as("i1"), col("c.i").as("i2"))
      .localCheckpoint(true)
    val l2 = pocc.groupBy(col("i1"), col("i2"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minSupport).select(col("i1"), col("i2"))
      .localCheckpoint(true)
    pocc.join(broadcast(l2), Seq("i1", "i2"), "left_semi").alias("p")
      .join(kept.alias("e"),
        col("p.b") === col("e.b") && col("e.i") > col("p.i2"))
      .select(col("p.i1").as("i1"), col("p.i2").as("i2"),
        col("e.i").as("i3"))
      .join(broadcast(l2.toDF("i1", "i3")), Seq("i1", "i3"), "left_semi")
      .join(broadcast(l2.toDF("i2", "i3")), Seq("i2", "i3"), "left_semi")
      .groupBy(col("i1"), col("i2"), col("i3"))
      .agg(count(lit(1)).as("triple_cnt"))
      .filter(col("triple_cnt") >= minSupport)
      .select(col("i1"), col("i2"), col("i3"), col("triple_cnt"))
  }
}
