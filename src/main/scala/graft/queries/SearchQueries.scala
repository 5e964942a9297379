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

  /** Fixed-size term query batch: 16 md5-sampled DISTINCT terms (the
    * annQuerySet discipline — |Q| constant across scale factors).
    */
  private[graft] val TermQueryCount = 16

  /** q153 — BATCH multi-query retrieval: the whole term-query batch
    * served off ONE posting-store scan (q122's batch-serving shape
    * applied to text): the 16-term query frame broadcasts onto the
    * store, each term's top-5 documents fold through the bounded
    * [[graft.functions.TopKAggregate]] — map-side partials, the
    * shuffle carries ≤ 5·partitions rows per term, never the posting
    * lists. Ranking is `(tf DESC, doc_id ASC)`; TopKAggregate orders
    * by `(score DESC, id ASC)`, so the id tiebreak matches the SQL
    * window exactly. At 100 TB: one index scan amortized over the
    * query batch — a search cluster's batch-lookup path.
    */
  val q153BatchTermServe: Q = (s, d) => {
    val store = PostingStore.table(s, d)
    val qterms = store.select("term").distinct()
      .orderBy(md5(concat(lit("tq:"), col("term"))))
      .limit(TermQueryCount)
    store
      .join(broadcast(qterms), "term")
      .groupBy("term")
      .agg(graft.functions.TopKAggregate
        .topK(col("doc_id"), col("tf").cast("double"), 5).as("topk"))
      .transform(df => graft.functions.TopKAggregate
        .explodeTopK(df, col("term"), col("topk")))
      .select(col("group").as("term"), col("id").as("doc_id"),
        col("score").cast("long").as("tf"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("term")
          .orderBy(col("tf").desc, col("doc_id"))).cast("long"))
      .select("term", "rank", "doc_id", "tf")
      .orderBy("term", "rank")
  }

  val q153Sql: String =
    s"""WITH $postingsCteSql,
       |qs AS (SELECT term FROM (SELECT DISTINCT term FROM post)
       |       ORDER BY md5('tq:' || term) LIMIT $TermQueryCount)
       |SELECT term, CAST(rank AS BIGINT) AS rank, doc_id, tf FROM (
       |  SELECT p.term, p.doc_id, p.tf,
       |    ROW_NUMBER() OVER (PARTITION BY p.term
       |      ORDER BY p.tf DESC, p.doc_id) AS rank
       |  FROM post p JOIN qs USING (term))
       |WHERE rank <= 5
       |ORDER BY term, rank""".stripMargin

  /** q154 — LEXICAL-then-DENSE hybrid retrieval: the reverse of
    * q134's dense-then-lexical — the standard "BM25-candidates,
    * embedding re-rank" RAG baseline. Candidates come from the REAL
    * index (q151's boolean AND hits over the posting store, a pruned
    * literal-IN scan); the dense re-rank joins the candidate set
    * (bounded, broadcast) to the embeddings table and orders by exact
    * cosine against a fixed query vector (vec 0 — the corpus-wide
    * id alignment: `vec_id` n is document n's embedding). Fusion rank
    * `(sim DESC, doc_id)` ties break on the integer id, and only the
    * top-10 emit — the output carries BOTH the lexical score and the
    * dense sim, the trace a production reranker logs.
    */
  val q154LexicalDenseHybrid: Q = (s, d) => {
    val Seq(ta, tb) = topDfTerms(s, d, 2)
    val cands = PostingStore.table(s, d)
      .filter(col("term").isin(ta, tb))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("lex_score"))
      .filter(col("n_terms") === 2)
      .select(col("doc_id"), col("lex_score"))
    val emb = graft.core.Tables.embeddings(s, d)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    emb.join(broadcast(cands), emb("vec_id") === cands("doc_id"))
      .crossJoin(broadcast(qv))
      .select(col("doc_id"), col("lex_score"),
        graft.functions.VectorFunctions.cosineSimilarity(col("q_emb"), col("embedding"))
          .as("sim"))
      .orderBy(col("sim").desc, col("doc_id"))
      .limit(10)
  }

  val q154Sql: String =
    s"""WITH $postingsCteSql,
       |ta AS (SELECT term FROM qt WHERE rk = 1),
       |tb AS (SELECT term FROM qt WHERE rk = 2),
       |cands AS (
       |  SELECT p.doc_id, CAST(SUM(p.tf) AS BIGINT) AS lex_score
       |  FROM post p CROSS JOIN ta CROSS JOIN tb
       |  WHERE p.term IN (ta.term, tb.term)
       |  GROUP BY p.doc_id
       |  HAVING COUNT(*) = 2),
       |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
       |      WHERE vec_id = 0),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
       |SELECT c.doc_id, c.lex_score,
       |  ${SimilarityQueries.cosSql("qe", "e.emb")} AS sim
       |FROM cands c JOIN e ON c.doc_id = e.vec_id CROSS JOIN q
       |ORDER BY sim DESC, c.doc_id LIMIT 10""".stripMargin

  val queries: Map[String, Q] = Map(
    "q151_boolean_search" -> q151BooleanSearch,
    "q152_phrase_search" -> q152PhraseSearch,
    "q153_batch_term_serve" -> q153BatchTermServe,
    "q154_lexical_dense_hybrid" -> q154LexicalDenseHybrid)

  val oracle: Map[String, String] = Map(
    "q151_boolean_search" -> q151Sql,
    "q152_phrase_search" -> q152Sql,
    "q153_batch_term_serve" -> q153Sql,
    "q154_lexical_dense_hybrid" -> q154Sql)
}
