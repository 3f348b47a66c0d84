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
    * (basket, item) posting frame (checkpointed — it feeds the support
    * aggregate AND the basket build), then ONE groupBy(basket) folds
    * each basket into a sorted item array and the pair stream is
    * generated MAP-SIDE from the arrays (posexplode of the array, then
    * explode of each element's suffix slice) straight into the
    * partial-aggregating pair count — no basket self-join, so the
    * posting frame crosses one exchange instead of feeding both sides
    * of a join (guide §2.4). Pair volume is still Σ_b |b|·(|b|−1)/2,
    * which is why oversized baskets are dropped WHOLE — here a
    * `size(items) &gt; maxBasket` filter on the folded arrays (same set
    * as the former count + anti-join guard, one shuffle cheaper): one
    * degenerate basket of 10⁶ items would otherwise emit 5·10¹¹ pairs.
    * Confidences of surviving pairs are unaffected — supports count all
    * baskets an item appears in, including dropped ones, so the guard
    * only removes pairs, never skews scores.
    */
  def coOccurrencePairs(df: DataFrame, basketCol: Column, itemCol: Column,
                        maxBasket: Long = 10000L): DataFrame = {
    require(maxBasket >= 2, s"maxBasket=$maxBasket must be >= 2")
    val t = df.select(basketCol.as("b"), itemCol.as("i"))
      .distinct()
      .localCheckpoint(true)
    val sup = t.groupBy(col("i")).agg(count(lit(1)).as("cnt"))
    val baskets = t.groupBy(col("b"))
      .agg(sort_array(collect_list(col("i"))).as("items"))
      .filter(size(col("items")).cast("long") <= maxBasket)
    pairStream(baskets)
      .groupBy(col("i1"), col("i2"))
      .agg(count(lit(1)).as("pair_cnt"))
      .join(sup.select(col("i").as("i1"), col("cnt").as("cnt_1")), Seq("i1"))
      .join(sup.select(col("i").as("i2"), col("cnt").as("cnt_2")), Seq("i2"))
      .select(col("i1"), col("i2"), col("pair_cnt"), col("cnt_1"), col("cnt_2"),
        expr("pair_cnt * 1000000L DIV cnt_1").as("conf12_ppm"),
        expr("pair_cnt * 1000000L DIV cnt_2").as("conf21_ppm"))
  }

  /** Map-side ordered-pair generation from per-basket sorted item
    * arrays: posexplode each array (emitting i1 with its 0-based index),
    * then explode the strictly-later slice as i2 — every (i1 &lt; i2 in
    * array order) pair, streamed row by row with O(|basket|) peak memory
    * (never the O(|basket|²) a flattened pair array would buffer). On a
    * DISTINCT per-basket item set, array order equals value order, so
    * the stream is exactly the former self-join's `a.i &lt; c.i` output —
    * without shuffling the posting frame into both sides of a join.
    * Output columns: every `baskets` column except `items`, plus
    * (i1, i2).
    */
  private[graft] def pairStream(baskets: DataFrame): DataFrame = {
    val passthrough = baskets.columns.filterNot(_ == "items").map(col).toSeq
    baskets
      .select(passthrough :+ col("items") :+
        posexplode(col("items")).as(Seq("__ix", "i1")): _*)
      .select(passthrough :+ col("i1") :+
        explode(slice(col("items"), col("__ix") + lit(2),
          greatest(size(col("items")) - col("__ix") - 1, lit(0))))
          .as("i2"): _*)
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
    * Pair generation deliberately stays a basket SELF-JOIN here, unlike
    * [[coOccurrencePairs]]'s array stream: triple baskets are typically
    * LARGE (a document's distinct-token set), and the r14 optimization
    * round measured the array fold + per-position slice generation 40%
    * SLOWER than the join at that basket size (the array row carries
    * O(|basket|) state per generated pair; the join enumerates pairs
    * from hash buckets with no per-pair allocation). Small-basket
    * callers keep the array stream.
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
    // Pair enumeration is COMPUTE-dense — the joins emit far more rows
    // than the bytes they read — and AQE coalesces shuffles by BYTES, so
    // the planner-inserted exchanges under both basket joins collapse the
    // heaviest CPU stages of the query onto one task (measured r15:
    // every stage ran single-task, 7.2 s wall). An EXPLICIT repartition
    // at the session's shuffle parallelism is exempt from coalescing and
    // co-partitions both join sides (one shared exchange per frame);
    // the setting itself stays scale-adaptive — it is the same knob that
    // sizes every other exchange (guide §1.2 "per-task work" feeding
    // back into the distributed shape, §2.5).
    val nPart = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val keptJ = kept.repartition(nPart, col("b"))
    val pocc = keptJ.alias("a").join(keptJ.alias("c"),
        col("a.b") === col("c.b") && col("a.i") < col("c.i"))
      .select(col("a.b").as("b"), col("a.i").as("i1"), col("c.i").as("i2"))
      .localCheckpoint(true)
    val l2 = pocc.groupBy(col("i1"), col("i2"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minSupport).select(col("i1"), col("i2"))
      .localCheckpoint(true)
    // Downward-closure prunes BEFORE the extension join, not only after
    // (r15, guide §3.2 — shrink the join's inputs, not its output): a
    // valid triple's i3 exceeds both partners, so (i1,i3) and (i2,i3)
    // are frequent pairs with i3 SECOND — the extension side needs only
    // items in π₂(L2); symmetrically p.i2 must pair frequently with some
    // larger third item, i.e. appear in π₁(L2). Both prunes are
    // broadcast semi-joins on aggregates already in hand (map-side, no
    // new shuffle), and both are necessary conditions of the final two
    // semi-joins — result-identical by construction.
    val extendable = l2.select(col("i2").as("i")).distinct()
    val keptExt = kept.join(broadcast(extendable), Seq("i"), "left_semi")
      .repartition(nPart, col("b"))
    pocc.join(broadcast(l2), Seq("i1", "i2"), "left_semi")
      .join(broadcast(l2.select(col("i1").as("i2")).distinct()),
        Seq("i2"), "left_semi")
      .repartition(nPart, col("b")).alias("p")
      .join(keptExt.alias("e"),
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
