package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-call corpus audit report — the per-source "data card" table a
  * pipeline publishes next to every corpus drop (what Dolma/RedPajama
  * ship as dataset summaries): volume, token mass, length profile,
  * exact-duplicate rate, and language spread, per source.
  *
  * Scale posture: ONE groupBy over one scan. The only non-trivial
  * aggregates are the two count-distincts (dup rate, language spread),
  * which Spark plans as Expand + two-stage partial aggregates — each
  * source's distinct sets shuffle once on (source, value), never
  * through a single reducer. The text distinct is keyed by
  * xxhash64(text) so the shuffle carries 8-byte keys, never the corpus
  * payload (the q44 convention — exact modulo ~n²/2⁶⁵ collisions; the
  * DuckDB oracle counts distinct strings and agrees under the same
  * convention). Length percentiles ride the same aggregate (exact
  * interpolated percentile — sort-based within the group, the q25
  * convention). No window, no join, no collect. */
object Report {

  /** per-source corpus report over a documents-shaped frame.
    * Returns one row per `source`:
    *  - n_docs, total_tokens (raw whitespace split — deliberately NOT
    *    the tokenizer-op convention of dropping empty fragments: the
    *    data card reports raw field mass, so '' counts as 1 and runs
    *    of spaces inflate — matches DuckDb's len(string_split));
    *  - total_chars, mean_chars (6 dp), p50_chars / p90_chars (exact
    *    interpolated);
    *  - n_distinct_texts and dup_rate = 1 − distinct/n (9 dp) — the
    *    exact-duplicate signal ([[Dedup.exact]] removes them), keyed
    *    by xxhash64(text) so distinct-set shuffles never carry text;
    *  - n_langs, top-level language spread for the mixture planner. */
  def corpusReport(df: DataFrame, source: String = "source",
                   text: String = "text", lang: String = "lang",
                   nChars: String = "n_chars"): DataFrame = {
    val tok: Column = size(split(col(text), " "))
    df.groupBy(source).agg(
        count(lit(1)).as("n_docs"),
        sum(tok.cast("long")).as("total_tokens"),
        sum(col(nChars)).as("total_chars"),
        round(sum(col(nChars)).cast("double") / count(lit(1)), 6)
          .as("mean_chars"),
        percentile(col(nChars), lit(0.5)).as("p50_chars"),
        percentile(col(nChars), lit(0.9)).as("p90_chars"),
        countDistinct(xxhash64(col(text))).as("n_distinct_texts"),
        countDistinct(col(lang)).as("n_langs"))
      .withColumn("dup_rate", round(lit(1.0) -
        col("n_distinct_texts").cast("double") / col("n_docs"), 9))
      .orderBy(source)
  }
}
