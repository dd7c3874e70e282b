package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared basket-pair builder for the co-purchase graph family
  * (q112/q115/q135/q166/q185/q186/q225 and Mining's supportEdges users).
  *
  * Replaces the distinct → self-join-on-basket-key → pair-groupBy shape
  * (one distinct exchange + two join exchanges + one pair exchange, plus
  * a join whose probe side re-reads the distinct output) with ONE basket
  * aggregation + row-local pair fan-out + ONE pair aggregation — guide
  * §2.4 "remove shuffles outright": two exchanges, no join, and the
  * second exchange carries partially-aggregated pair counts instead of
  * raw pair rows.
  *
  * Semantics are unchanged: collect_set == the old DISTINCT projection,
  * sort_array + (i < j) fan-out == the old `pa < pb` self-join, so the
  * (pa, pb, w) multiset is identical and every oracle that reads it is
  * untouched. Fan-out per basket is C(|basket|, 2) computed row-locally —
  * bounded by basket width exactly like the old join's per-key fan-out
  * (the q325 Apriori discipline), so the 100 TB posture is unchanged
  * while the shuffle count halves.
  */
private[queries] object Baskets {

  /** Distinct unordered within-basket item pairs with their basket
    * co-occurrence count: (pa, pb, w) with pa < pb, w = number of
    * baskets containing both items.
    */
  def pairCounts(df: DataFrame, basket: String, item: String): DataFrame =
    df.select(col(basket).as("o"), col(item).as("p"))
      .groupBy(col("o"))
      .agg(sort_array(collect_set(col("p"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(slice(ps, 1, size(ps) - 1), (x, i) ->
             transform(slice(ps, i + 2, size(ps) - i - 1),
               y -> struct(x AS pa, y AS pb))))""")).as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("w"))

  /** Per-item distinct-basket counts off the same basket aggregation —
    * q186's per-part order counts without re-scanning the source.
    */
  def itemCounts(baskets: DataFrame): DataFrame =
    baskets.select(explode(col("ps")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))

  /** The basket aggregation alone, for callers that need both the pair
    * counts and the per-item counts off one cached frame.
    */
  def baskets(df: DataFrame, basket: String, item: String): DataFrame =
    df.select(col(basket).as("o"), col(item).as("p"))
      .groupBy(col("o"))
      .agg(sort_array(collect_set(col("p"))).as("ps"))

  /** Pair fan-out + count over a pre-built (cached) basket frame. */
  def pairCountsFrom(baskets: DataFrame): DataFrame =
    baskets
      .select(explode(expr(
        """flatten(transform(slice(ps, 1, size(ps) - 1), (x, i) ->
             transform(slice(ps, i + 2, size(ps) - i - 1),
               y -> struct(x AS pa, y AS pb))))""")).as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("w"))
}
