package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** At-scale fulltext search: the DataFrame-native twin of the
  * scenario-space `LOOKUP ... WHERE ES_QUERY(...)` surface
  * (graft.nql.Fulltext). A BM25 match query over a document table,
  * expressed as two keyed aggregations — no inverted-index service,
  * no collect, no all-pairs.
  *
  * 100 TB posture: tokenization and per-term tf are codegen'd array
  * folds — no token explode, no keyed shuffle. Scan 1 reduces the
  * corpus to ONE stats row (N, avgdl, per-term df) that broadcasts
  * back; scan 2 scores every doc in a single projection and feeds a
  * TakeOrderedAndProject (bounded heap, no global sort). Two
  * column-pruned passes over the text column total — at 100 TB a
  * second pass is far cheaper than shuffling every token.
  *
  * Scoring is BM25 with Lucene-8's idf (ln(1+(N-df+.5)/(df+.5))) and
  * k1=1.2, b=0.75 in double precision — the scenario-space twin keeps
  * ES float32 semantics for the TCK goldens; this one is a clean
  * double pipeline whose DuckDB oracle replays the same formula. */
object FulltextSearch {

  val K1 = 1.2
  val B = 0.75

  /** ASCII tokenization shared verbatim with the DuckDB oracle:
    * lowercase, split on non-alphanumeric runs, drop empties. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  /** Driver-side twin of `tokens` for the query string. */
  def analyzeQuery(query: String): Seq[String] =
    query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct.toSeq

  /** Top-k BM25 matches for `query` over `docs(idCol, textCol)`:
    * (doc_id, score) with score rounded portably to 6 dp, ordered
    * score desc then doc_id (the rounded score orders, so the oracle
    * cuts the same k rows).
    *
    * Per-term tf is an array fold over the tokenized doc — NO token
    * explode and NO keyed shuffle anywhere: scan 1 aggregates the
    * corpus stats (N, avgdl, per-term df) into ONE row that broadcasts
    * back; scan 2 scores each doc in a single projection and feeds
    * TakeOrderedAndProject. Plan width grows with |query terms|
    * (fine for interactive queries; a thousand-term query would want
    * the inverted-index/explode shape instead). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               query: String, k: Int): DataFrame = {
    val qTerms = analyzeQuery(query)
    require(qTerms.nonEmpty, "empty fulltext query")
    val base = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks"))
      .select(Seq(col("doc_id"), size(col("toks")).as("dl")) ++
        qTerms.zipWithIndex.map { case (t, i) =>
          size(filter(col("toks"), x => x === lit(t))).as(s"tf_$i") }: _*)
    val statAggs = Seq(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")) ++
      qTerms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val termScore = qTerms.indices.map { i =>
      val idf = log(lit(1d) +
        (col("n") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
      val tfPart = col(s"tf_$i") * (K1 + 1d) /
        (col(s"tf_$i") +
          lit(K1) * (lit(1d - B) + lit(B) * col("dl") / col("avgdl")))
      when(col(s"tf_$i") > 0, idf * tfPart).otherwise(lit(0d))
    }.reduce(_ + _)
    base
      .filter(qTerms.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        graft.functions.Fn.roundPortable(termScore, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** The oracle-side replay of `bm25TopK` (DuckDB SQL). */
  def oracleSql(query: String, k: Int): String = {
    val terms = analyzeQuery(query).map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
       |                     x -> x <> '') AS toks
       |  FROM documents),
       |t AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d),
       |stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM d),
       |hits AS (SELECT doc_id, dl, term, count(*) AS tf FROM t
       |         WHERE term IN ($terms) GROUP BY 1, 2, 3),
       |dfs AS (SELECT term, count(*) AS df FROM hits GROUP BY 1),
       |scored AS (
       |  SELECT h.doc_id,
       |         sum(ln(1 + (s.n - f.df + 0.5)/(f.df + 0.5)) *
       |             h.tf * ${K1 + 1d} /
       |             (h.tf + $K1 * ((1 - $B) + $B * h.dl / s.avgdl))) AS raw
       |  FROM hits h
       |  JOIN dfs f ON h.term = f.term
       |  CROSS JOIN stats s
       |  GROUP BY 1)
       |SELECT doc_id, floor(raw * 1e6 + 0.5) / 1e6 AS score
       |FROM scored ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }
}
