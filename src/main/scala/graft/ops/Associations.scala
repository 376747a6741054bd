package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X97 — association-rule mining at the pair level (Agrawal & Srikant
  * VLDB'94's Apriori, truncated where production basket analysis actually
  * operates): which items co-occur in a basket beyond chance, as
  * support / confidence / lift — the retail cross-sell staple, and the
  * same machinery curation pipelines point at (source, topic) or
  * (license, domain) co-occurrence. Pairs are where the signal and the
  * money are; higher-order itemsets fall out of re-running over
  * pair-merged pseudo-items when anyone needs them.
  *
  * Exact integer contract: with N baskets, n_a = baskets containing a,
  * n_ab = baskets containing both —
  * support = n_ab·1e6 DIV N, confidence(a→b) = n_ab·1e6 DIV n_a,
  * lift = n_ab·N·1e6 DIV (n_a·n_b) (DECIMAL(38,0) product — n_ab·N
  * overflows Long at corpus scale), every division integral, every
  * engine bit-identical. Both rule directions are emitted (same support
  * and lift; confidence differs — that asymmetry is the point of
  * confidence).
  *
  * Scale shape: one basket-distinct pass (multiset→set: duplicate items
  * in one basket count once — the standard convention), one item-keyed
  * count, one basket-keyed self-join for pairs (fan-out = C(basket size,
  * 2) per basket — the X73/X90 density caveat: a degenerate mega-basket
  * is quadratic, and `maxBasketSize` REFUSES baskets past it rather than
  * silently stalling the stage), one pair-keyed count, map-side combine
  * everywhere. The support threshold prunes BEFORE the margin joins, so
  * only surviving pairs pay them. */
object Associations {

  def pairRules(baskets: DataFrame, basket: Column, item: Column,
      minSupportMicro: Long, maxBasketSize: Long = 10000L): DataFrame = {
    require(minSupportMicro >= 0 && minSupportMicro <= 1000000L,
      s"minSupportMicro must be in [0, 1e6], got $minSupportMicro")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val b = baskets.select(basket.as("__b"), item.cast("string").as("__i"))
      .filter(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()
    // one basket-keyed pass serves BOTH the size guard and the basket
    // count N — no second distinct+count shuffle over the basket frame
    val sizes = b.groupBy("__b").agg(count(lit(1)).as("__sz"))
    val probe = sizes.agg(count(lit(1)).as("__n"),
      max(col("__sz")).as("__mx")).collect()(0)
    val n = probe.getLong(0)
    require(n >= 1, "pairRules: no baskets after null/dup removal")
    if (probe.getLong(1) > maxBasketSize) {
      // failure path only: name one offender for the message
      val huge = sizes.filter(col("__sz") > maxBasketSize).limit(1).collect()
      require(huge.isEmpty,
        s"basket '${huge.headOption.map(_.get(0)).orNull}' exceeds " +
          s"maxBasketSize=$maxBasketSize — pair fan-out is quadratic in " +
          "basket size; split or cap upstream")
    }
    val itemN = b.groupBy("__i").agg(count(lit(1)).as("__ni"))
    val pairs = b.as("l").join(b.as("r"),
        col("l.__b") === col("r.__b") && col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("__a"), col("r.__i").as("__c"))
      .agg(count(lit(1)).as("__nab"))
      .filter(expr(s"__nab * 1000000 DIV ${n}L") >= minSupportMicro)
    // emit both directions; margins join AFTER the support prune
    val directed = pairs.select(col("__a"), col("__c"), col("__nab"))
      .unionAll(pairs.select(col("__c").as("__a"), col("__a").as("__c"),
        col("__nab")))
    directed
      .join(itemN.select(col("__i").as("__a"), col("__ni").as("__na")), "__a")
      .join(itemN.select(col("__i").as("__c"), col("__ni").as("__nc")), "__c")
      .select(col("__a").as("antecedent"), col("__c").as("consequent"),
        col("__nab").as("n_both"),
        expr(s"__nab * 1000000 DIV ${n}L").as("support_micro"),
        expr("__nab * 1000000 DIV __na").as("confidence_micro"),
        expr(s"CAST(CAST(__nab AS DECIMAL(38,0)) * ${n}L * 1000000 " +
          "DIV (CAST(__na AS DECIMAL(38,0)) * __nc) AS BIGINT)")
          .as("lift_micro"))
  }
}
