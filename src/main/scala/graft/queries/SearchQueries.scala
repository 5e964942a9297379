package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._

/** FULL-TEXT retrieval over the document corpus through a real
  * INVERTED INDEX — the serving tier q134's lexical re-rank doesn't
  * have (there the shortlist is dense-first and token overlap is
  * computed per candidate; here the INDEX finds the candidates). The
  * posting-list store is the text analog of [[SimilarityQueries]]'
  * IVF/code stores: one ingest-time corpus pass builds `(term, doc_id,
  * positions, tf)` BUCKETED AND SORTED BY TERM, so a query resolves
  * its terms to literals and the scan is a term-`IN` over term-sorted
  * bucket files — row-group min/max skipping reads the queried terms'
  * posting lists, not the corpus (PlanSpec pins `PushedFilters`). At
  * 100 TB a boolean query touches each query term's postings: the
  * search-engine probe shape.
  *
  * Positions are 0-based offsets in the whitespace token sequence
  * (post filtering of empties — both engines index the same list), so
  * PHRASE search is pure integer set algebra: `"a b"` matches where
  * `positions(a) ∩ (positions(b) − 1)` is nonempty. All outputs are
  * integers; ranking keys are `(tf totals DESC, doc_id)` — exact
  * lexicographic order, no float scoring in the hash gate.
  */
object SearchQueries {

  /** The ON-DISK inverted index: `(term, doc_id, positions, tf)`,
    * term-bucketed and term-sorted — posting lists clustered the way
    * a probe reads them. The index build's shuffle carries token
    * occurrences once (the ingest cost every search engine pays);
    * positions are `sort_array`'d so the stored list is deterministic
    * under any partitioning.
    */
  private[graft] val PostingStore = new RunStore("graft_postings", 8,
    Seq("term"),
    (s, d) => documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id"), col("positions"), col("tf")))

  /** The two query terms, resolved DETERMINISTICALLY from the index:
    * highest document frequency, ties to the lexicographically
    * smaller term. Driver-side collect of a 2-row aggregate — the
    * bounded index-probe class (q41's probeCells): resolving a query
    * to literal terms is what makes the store scan pushdown-prunable.
    */
  private[graft] def topDfTerms(s: org.apache.spark.sql.SparkSession,
      d: String, n: Int): Seq[String] =
    PostingStore.table(s, d)
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(n)
      .collect().map(_.getString(0)).toSeq

  /** q151 — BOOLEAN AND retrieval: documents containing BOTH of the
    * two highest-df terms, served from the posting store with a
    * literal term-IN scan; per-doc output carries each term's tf and
    * the exact integer ranking key `(tf_a + tf_b DESC, doc_id)`,
    * top-20 cut (TakeOrderedAndProject — k rows move, not the match
    * set).
    */
  val q151BooleanSearch: Q = (s, d) => {
    val Seq(ta, tb) = topDfTerms(s, d, 2)
    val hits = PostingStore.table(s, d)
      .filter(col("term").isin(ta, tb))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col("term") === ta, col("tf")).otherwise(0L)).as("tf_a"),
        sum(when(col("term") === tb, col("tf")).otherwise(0L)).as("tf_b"))
      .filter(col("n_terms") === 2)
    hits
      .select(col("doc_id"), col("tf_a"), col("tf_b"),
        (col("tf_a") + col("tf_b")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** The term-resolution CTEs shared by both oracles: postings from
    * scratch, then the two top-df terms by `(df DESC, term)`.
    */
  private val postingsCteSql: String =
    s"""tk AS (
       |  SELECT doc_id, unnest(lst) AS term, unnest(range(len(lst))) AS pos
       |  FROM (SELECT doc_id, $tokensSql AS lst FROM documents)),
       |post AS (
       |  SELECT term, doc_id, list(pos ORDER BY pos) AS positions,
       |    CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM tk GROUP BY term, doc_id),
       |qt AS (
       |  SELECT term, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS rk
       |  FROM post GROUP BY term QUALIFY rk <= 2)""".stripMargin

  val q151Sql: String =
    s"""WITH $postingsCteSql,
       |ta AS (SELECT term FROM qt WHERE rk = 1),
       |tb AS (SELECT term FROM qt WHERE rk = 2),
       |hits AS (
       |  SELECT p.doc_id,
       |    CAST(SUM(CASE WHEN p.term = ta.term THEN p.tf ELSE 0 END) AS BIGINT) AS tf_a,
       |    CAST(SUM(CASE WHEN p.term = tb.term THEN p.tf ELSE 0 END) AS BIGINT) AS tf_b,
       |    COUNT(*) AS n_terms
       |  FROM post p CROSS JOIN ta CROSS JOIN tb
       |  WHERE p.term IN (ta.term, tb.term)
       |  GROUP BY p.doc_id
       |  HAVING COUNT(*) = 2)
       |SELECT doc_id, tf_a, tf_b, CAST(tf_a + tf_b AS BIGINT) AS score
       |FROM hits
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** q152 — PHRASE retrieval: documents where the two top-df terms
    * occur ADJACENTLY (`ta` immediately followed by `tb`), with the
    * exact occurrence count — pure integer position-set algebra over
    * the same two posting lists q151 scans: `|pos(ta) ∩ (pos(tb)−1)|`.
    * This is the operator a token-overlap score cannot express: order
    * and adjacency matter.
    */
  val q152PhraseSearch: Q = (s, d) => {
    val Seq(ta, tb) = topDfTerms(s, d, 2)
    val store = PostingStore.table(s, d)
    val pa = store.filter(col("term") === ta)
      .select(col("doc_id"), col("positions").as("pos_a"))
    val pb = store.filter(col("term") === tb)
      .select(col("doc_id"), col("positions").as("pos_b"))
    pa.join(pb, "doc_id")
      .select(col("doc_id"),
        size(array_intersect(col("pos_a"),
          transform(col("pos_b"), p => p - 1))).cast("long").as("n_phrase"))
      .filter(col("n_phrase") > 0)
      .orderBy("doc_id")
  }

  val q152Sql: String =
    s"""WITH $postingsCteSql,
       |ta AS (SELECT term FROM qt WHERE rk = 1),
       |tb AS (SELECT term FROM qt WHERE rk = 2),
       |pa AS (SELECT p.doc_id, p.positions AS pos_a
       |       FROM post p JOIN ta ON p.term = ta.term),
       |pb AS (SELECT p.doc_id, p.positions AS pos_b
       |       FROM post p JOIN tb ON p.term = tb.term)
       |SELECT pa.doc_id,
       |  CAST(len(list_intersect(pos_a, list_transform(pos_b, x -> x - 1)))
       |    AS BIGINT) AS n_phrase
       |FROM pa JOIN pb USING (doc_id)
       |WHERE len(list_intersect(pos_a, list_transform(pos_b, x -> x - 1))) > 0
       |ORDER BY pa.doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q151_boolean_search" -> q151BooleanSearch,
    "q152_phrase_search" -> q152PhraseSearch)

  val oracle: Map[String, String] = Map(
    "q151_boolean_search" -> q151Sql,
    "q152_phrase_search" -> q152Sql)
}
