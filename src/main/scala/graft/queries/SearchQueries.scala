package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._

/** FULL-TEXT retrieval over the document corpus through a real
  * INVERTED INDEX — the serving tier q134's lexical re-rank doesn't
  * have (there the shortlist is dense-first and token overlap is
  * computed per candidate; here the INDEX finds the candidates). The
  * posting-list store is the text analog of [[SimilarityQueries]]'
  * IVF/code stores: one ingest-time corpus pass builds `(term, doc_id,
  * positions, tf, dl)` BUCKETED AND SORTED BY TERM, so a query
  * resolves its terms to literals and the scan is a term-`IN` over
  * term-sorted bucket files — row-group min/max skipping reads the
  * queried terms' posting lists, not the corpus (PlanSpec pins
  * `PushedFilters`). At 100 TB a boolean query touches each query
  * term's postings: the search-engine probe shape.
  *
  * Positions are 0-based offsets in the whitespace token sequence
  * (post filtering of empties — both engines index the same list), so
  * PHRASE search is pure integer set algebra: `"a b"` matches where
  * `positions(a) ∩ (positions(b) − 1)` is nonempty. Every posting row
  * also carries its document's token count `dl` — the Lucene layout:
  * doc length lives IN the index, so BM25's length normalization is a
  * map-side expression at query time, not a corpus-grain join.
  *
  * All outputs are integers. The boolean/phrase tiers rank by exact
  * `(tf totals DESC, doc_id)`; the scored tiers (q164, q154's lexical
  * leg) rank by GraftBM25 — BM25 with k1=1.2, b=0.75 evaluated in
  * EXACT fixed-point integer arithmetic (see [[bm25ScoreCols]]) so the
  * hash gate stays bit-identical across engines.
  */
object SearchQueries {

  /** The ON-DISK inverted index: `(term, doc_id, positions, tf, dl)`,
    * term-bucketed and term-sorted — posting lists clustered the way
    * a probe reads them. The index build's shuffle carries token
    * occurrences once (the ingest cost every search engine pays);
    * positions are `sort_array`'d so the stored list is deterministic
    * under any partitioning, and `dl` (the doc's token count) rides
    * every posting row so scoring never joins a doc-length frame.
    */
  private[graft] def postingRows(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        posexplode(col("w")).as(Seq("pos", "term")))
      .groupBy("term", "doc_id", "dl")
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id"), col("positions"), col("tf"),
        col("dl"))

  /** The BM25 corpus scalars, derived ONCE at index build time and
    * persisted in the store's sidecar (the quantizer-grid discipline):
    * serving never pays a corpus-grain aggregate for two numbers. The
    * derivation reads the just-written table — by name, since the
    * store is mid-build when metaBuild runs. A fold that appends delta
    * postings must refresh these (q163's lifecycle table computes its
    * stats inline instead; the memoized store here is build-only).
    */
  private[graft] val PostingStore = new RunStore("graft_postings", 8,
    Seq("term"), (s, d) => postingRows(documents(s, d)),
    metaBuild = (s, d) => {
      val r = s.table(RunStore.tableName("graft_postings", d))
        .agg(sum("tf").as("corpus_len"),
          count_distinct(col("doc_id")).as("n_docs"))
        .head()
      Map("corpus_len" -> r.getLong(0).toString,
        "n_docs" -> r.getLong(1).toString)
    },
    metaVersion = "bm25-scalars-v1")

  /** The query terms, resolved DETERMINISTICALLY from a posting frame:
    * highest document frequency, ties to the lexicographically
    * smaller term. Driver-side collect of an n-row aggregate — the
    * bounded index-probe class (q41's probeCells): resolving a query
    * to literal terms is what makes the store scan pushdown-prunable.
    */
  private[graft] def topDfTermsOf(store: org.apache.spark.sql.DataFrame,
      n: Int): Seq[String] =
    store
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(n)
      .collect().map(_.getString(0)).toSeq

  private[graft] def topDfTerms(s: org.apache.spark.sql.SparkSession,
      d: String, n: Int): Seq[String] =
    topDfTermsOf(PostingStore.table(s, d), n)

  /** q151's engine over ANY posting frame (the memoized store, or
    * q163's folded lifecycle table): BOOLEAN AND — documents
    * containing BOTH of the two highest-df terms, served with a
    * literal term-IN scan; per-doc output carries each term's tf and
    * the exact integer ranking key `(tf_a + tf_b DESC, doc_id)`,
    * top-20 cut (TakeOrderedAndProject — k rows move, not the match
    * set).
    */
  private[graft] def booleanSearchOver(
      store: org.apache.spark.sql.DataFrame,
      tombstones: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val Seq(ta, tb) = topDfTermsOf(store, 2)
    val scanned = store.filter(col("term").isin(ta, tb))
    // q198: deleted docs are anti-joined out AFTER the literal term-IN
    // scan — the exclusion runs at posting-list grain (never the
    // corpus) against a broadcast deletion-bounded ledger
    tombstones
      .map(t => scanned.join(broadcast(t), Seq("doc_id"), "left_anti"))
      .getOrElse(scanned)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col("term") === ta, col("tf")).otherwise(0L)).as("tf_a"),
        sum(when(col("term") === tb, col("tf")).otherwise(0L)).as("tf_b"))
      .filter(col("n_terms") === 2)
      .select(col("doc_id"), col("tf_a"), col("tf_b"),
        (col("tf_a") + col("tf_b")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  val q151BooleanSearch: Q = (s, d) =>
    booleanSearchOver(PostingStore.table(s, d))

  /** The term-resolution CTEs shared by the search oracles: postings
    * from scratch (with per-doc length `dl` — both engines index the
    * same filtered token list), then the two top-df terms by
    * `(df DESC, term)`.
    */
  private val postingsCteSql: String =
    s"""tk AS (
       |  SELECT doc_id, CAST(len(lst) AS BIGINT) AS dl,
       |    unnest(lst) AS term, unnest(range(len(lst))) AS pos
       |  FROM (SELECT doc_id, $tokensSql AS lst FROM documents)),
       |post AS (
       |  SELECT term, doc_id, dl, list(pos ORDER BY pos) AS positions,
       |    CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM tk GROUP BY term, doc_id, dl),
       |qt AS (
       |  SELECT term, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS rk
       |  FROM post GROUP BY term QUALIFY rk <= 2)""".stripMargin

  /** q151's oracle body, with an optional extra predicate on the hit
    * scan (q198 injects the tombstone exclusion there — the same stage
    * the engine's anti-join runs at).
    */
  private def booleanSql(hitsExtraPred: String): String =
    s"""WITH $postingsCteSql,
       |ta AS (SELECT term FROM qt WHERE rk = 1),
       |tb AS (SELECT term FROM qt WHERE rk = 2),
       |hits AS (
       |  SELECT p.doc_id,
       |    CAST(SUM(CASE WHEN p.term = ta.term THEN p.tf ELSE 0 END) AS BIGINT) AS tf_a,
       |    CAST(SUM(CASE WHEN p.term = tb.term THEN p.tf ELSE 0 END) AS BIGINT) AS tf_b,
       |    COUNT(*) AS n_terms
       |  FROM post p CROSS JOIN ta CROSS JOIN tb
       |  WHERE p.term IN (ta.term, tb.term)$hitsExtraPred
       |  GROUP BY p.doc_id
       |  HAVING COUNT(*) = 2)
       |SELECT doc_id, tf_a, tf_b, CAST(tf_a + tf_b AS BIGINT) AS score
       |FROM hits
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  val q151Sql: String = booleanSql("")

  /** The q198 deletion ledger: ~5% of doc_ids, md5-uniform. Term
    * RESOLUTION deliberately still reads the raw store — df statistics
    * drift until compaction rebuilds them, the honest production
    * contract (the sidecar scalars refresh at compaction, q163's
    * lifecycle); only the HIT SET must never surface a deleted doc.
    */
  private[graft] def searchTombstones(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    documents(s, d).select(col("doc_id"))
      .filter(mdUniform("docdel:", col("doc_id")) < 0.05)

  /** q198 — DELETES reaching the TEXT index: q151's boolean serve over
    * the same posting store with a tombstone ledger applied — the
    * q158/q197 right-to-be-forgotten contract completing the deletion
    * triad (tables q158, vector store q197, text index q198), where
    * rewriting term-bucketed posting files per deletion is exactly
    * what a production index avoids (Lucene's live-docs bitset as a
    * Spark anti-join). The exclusion runs AFTER the literal term-IN
    * scan, at posting-list grain, against a broadcast deletion-bounded
    * ledger; compaction (q163's generation machinery) physically drops
    * the postings and resets it. Oracle: q151's algebra with the
    * tombstone predicate inside the hit scan — serve-under-deletes ≡
    * serve-over-the-compacted-index.
    */
  val q198TombstonedSearch: Q = (s, d) =>
    booleanSearchOver(PostingStore.table(s, d),
      tombstones = Some(searchTombstones(s, d)))

  val q198Sql: String =
    booleanSql(s"""
       |    AND ${mdUniformSql("docdel:", "p.doc_id")} >= 0.05""")

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

  // ------------------------------------------------------------- BM25

  /** GraftBM25's fixed-point scale: tf-norm carries 6 decimal digits.
    * EXACT-ARITHMETIC BM25 (k1 = 1.2, b = 0.75), derived so every
    * intermediate is a BIGINT and both engines floor identically:
    *
    *  - per-term tf normalization `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    *    with `avgdl = corpus_len/n_docs` cross-multiplies (×10·corpus_len)
    *    to the integer rational
    *      `22·L·tf / (10·L·tf + 3·L + 9·dl·N)`  (L=corpus_len, N=n_docs),
    *    floored at scale: `(22·L·tf·Scale) div (10·L·tf + 3·L + 9·dl·N)`
    *    — bounded by 2.2·Scale, exact while 22·L·tf·Scale fits 64 bits
    *    (L·tf < 4·10¹¹ — a 100-billion-token corpus; past that, drop
    *    Scale or widen the intermediate to DECIMAL(38), one line);
    *  - idf uses the INTEGER log2 of the Robertson ratio:
    *    `bitlength((2N+1) div (2·df+1))` = ⌊log2((N+0.5)/(df+0.5))⌋+1 ∈
    *    [1, 63] — genuine logarithmic df dampening with no float
    *    transcendental in the hash gate (the impact-quantized-score
    *    trick of document-at-a-time search engines). Production code
    *    free of the bit-exactness constraint swaps in `ln` idf — a
    *    one-expression change that leaves every plan shape intact;
    *  - per-doc score = Σ over query terms of `idf_q · tf_norm_scaled`
    *    — a sum of BIGINTs, commutative under any partitioning.
    */
  private[graft] val Bm25Scale = 1000000L

  /** The per-posting GraftBM25 score columns, given `df`, `corpus_len`
    * and `n_docs` columns alongside the posting's `tf` and `dl` — one
    * codegen'd integer expression, no join beyond the bounded df/totals
    * broadcasts.
    */
  private def bm25ScoreCol: org.apache.spark.sql.Column =
    expr(s"""cast(length(conv((2 * n_docs + 1) div (2 * df + 1), 10, 2))
            |  as bigint)
            |* ((22 * corpus_len * tf * $Bm25Scale)
            |   div (10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs))"""
      .stripMargin.replace("\n", " "))

  /** DuckDB mirror of [[bm25ScoreCol]]: `p` the posting alias, `f` the
    * df alias, `t` the totals alias. `//` is DuckDB's integer
    * division; `length(bin(x))` is the same bitlength
    * `length(conv(x, 10, 2))` computes on the Spark side.
    */
  private def bm25ScoreSql(p: String, f: String, t: String): String =
    s"CAST(length(bin((2 * $t.n_docs + 1) // (2 * $f.df + 1))) AS BIGINT)" +
      s" * ((22 * $t.corpus_len * $p.tf * $Bm25Scale)" +
      s" // (10 * $t.corpus_len * $p.tf + 3 * $t.corpus_len" +
      s" + 9 * $p.dl * $t.n_docs))"

  /** The totals CTE both BM25 oracles share. */
  private val bm25TotalsSql: String =
    """tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS corpus_len,
      |        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM post)"""
      .stripMargin

  /** Per-(doc, term) GraftBM25 scores for `qterms` (literal terms —
    * the scan stays a pushdown-pruned term-IN): postings join their
    * term's df (a |Q|-row broadcast), the two corpus scalars ride as
    * LITERALS, and the score is one map-side integer expression — dl
    * rides the posting row, so NOTHING doc-grain or corpus-grain is
    * touched at query time. The scalars come from the posting store's
    * SIDECAR ([[bm25Corpus]] — derived once at index build, the
    * quantizer-grid discipline), so a BM25 query's only work is the
    * pruned posting-list scan plus two bounded broadcasts.
    */
  private[graft] def bm25Scores(store: org.apache.spark.sql.DataFrame,
      qterms: Seq[String], corpusLen: Long,
      nDocs: Long): org.apache.spark.sql.DataFrame = {
    val matched = store.filter(col("term").isin(qterms: _*))
    val dfFrame = matched.groupBy("term").agg(count(lit(1)).as("df"))
    matched
      .join(broadcast(dfFrame), "term")
      .withColumn("corpus_len", lit(corpusLen))
      .withColumn("n_docs", lit(nDocs))
      .select(col("term"), col("doc_id"), bm25ScoreCol.as("score"))
  }

  /** The sidecar-pinned corpus scalars — one small-file read on the
    * store's reuse path, no corpus pass (the bounded index-probe
    * class, like the IVF-PQ centroid/anchor reads).
    */
  private[graft] def bm25Corpus(s: org.apache.spark.sql.SparkSession,
      d: String): (Long, Long) = {
    val m = PostingStore.metadata(s, d)
    (m("corpus_len").toLong, m("n_docs").toLong)
  }

  /** q164 — BM25 top-k retrieval: the 16-term md5-sampled query batch
    * (q153's sampling) scored with GraftBM25 over the posting store —
    * idf from the query terms' df rows, doc-length norm from the `dl`
    * the index itself carries — summed per doc, top-20 by
    * `(bm25 DESC, doc_id)` (TakeOrderedAndProject). This is the
    * ranking function a retrieval consumer actually ships (q151's raw
    * tf sum is the index proof, not a relevance score), and q154's
    * lexical leg reuses it so the hybrid is BM25-then-dense for real.
    */
  val q164Bm25TopK: Q = (s, d) => {
    val store = PostingStore.table(s, d)
    val (corpusLen, nDocs) = bm25Corpus(s, d)
    val qts = store.select("term").distinct()
      .orderBy(md5(concat(lit("tq:"), col("term"))))
      .limit(TermQueryCount)
      .collect().map(_.getString(0)).toSeq
    bm25Scores(store, qts, corpusLen, nDocs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"), sum("score").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  val q164Sql: String =
    s"""WITH $postingsCteSql,
       |qs AS (SELECT term FROM (SELECT DISTINCT term FROM post)
       |       ORDER BY md5('tq:' || term) LIMIT $TermQueryCount),
       |$bm25TotalsSql,
       |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
       |        FROM post JOIN qs USING (term) GROUP BY term),
       |sc AS (SELECT p.doc_id, ${bm25ScoreSql("p", "f", "t")} AS score
       |       FROM post p JOIN qs USING (term)
       |        JOIN dfq f ON p.term = f.term CROSS JOIN tot t)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit,
       |  CAST(SUM(score) AS BIGINT) AS bm25
       |FROM sc GROUP BY doc_id
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  /** The hybrid tier's lexical candidate bound: the BM25-ranked cut
    * before the dense re-rank. 1000 candidates is the standard
    * first-stage depth of a BM25→embedding reranker — and it is what
    * makes q154's broadcast GENUINELY k-bounded at any corpus size.
    */
  private[graft] val LexCandidateLimit = 1000

  /** q154 — LEXICAL-then-DENSE hybrid retrieval: the reverse of
    * q134's dense-then-lexical — the standard "BM25-candidates,
    * embedding re-rank" RAG baseline. Candidates come from the REAL
    * index (the boolean-AND hit set of the two top-df terms over the
    * posting store, a pruned literal-IN scan), are scored with
    * GraftBM25 (q164's scoring — doc-length-normalized, idf-damped,
    * exact integers), and are CUT to the top-[[LexCandidateLimit]] by
    * `(lex_score DESC, doc_id)` BEFORE anything is broadcast — the
    * round-13 verdict #1 fix: the old shape force-broadcast the raw
    * AND hit set of the two highest-df (stopword-like) terms, which
    * grows linearly with the corpus; the TakeOrderedAndProject cut
    * makes the broadcast k-bounded at any scale (PlanSpec pins it).
    * The dense re-rank joins the bounded candidate set to the
    * embeddings table and orders by exact cosine against a fixed
    * query vector (vec 0 — the corpus-wide id alignment: `vec_id` n
    * is document n's embedding). Fusion rank `(sim DESC, doc_id)`
    * ties break on the integer id, and only the top-10 emit — the
    * output carries BOTH the lexical score and the dense sim, the
    * trace a production reranker logs.
    */
  val q154LexicalDenseHybrid: Q = (s, d) => {
    val store = PostingStore.table(s, d)
    val (corpusLen, nDocs) = bm25Corpus(s, d)
    val qts = topDfTermsOf(store, 2)
    val cands = bm25Scores(store, qts, corpusLen, nDocs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("score").as("lex_score"))
      .filter(col("n_terms") === 2)
      .select(col("doc_id"), col("lex_score"))
      .orderBy(col("lex_score").desc, col("doc_id"))
      .limit(LexCandidateLimit)
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
       |$bm25TotalsSql,
       |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
       |        FROM post JOIN qt USING (term) GROUP BY term),
       |sc AS (SELECT p.doc_id, ${bm25ScoreSql("p", "f", "t")} AS score
       |       FROM post p JOIN qt USING (term)
       |        JOIN dfq f ON p.term = f.term CROSS JOIN tot t),
       |cands AS (
       |  SELECT doc_id, lex_score FROM (
       |    SELECT doc_id, CAST(SUM(score) AS BIGINT) AS lex_score,
       |      COUNT(*) AS n_terms
       |    FROM sc GROUP BY doc_id HAVING COUNT(*) = 2)
       |  ORDER BY lex_score DESC, doc_id LIMIT $LexCandidateLimit),
       |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
       |      WHERE vec_id = 0),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
       |SELECT c.doc_id, c.lex_score,
       |  ${SimilarityQueries.cosSql("qe", "e.emb")} AS sim
       |FROM cands c JOIN e ON c.doc_id = e.vec_id CROSS JOIN q
       |ORDER BY sim DESC, c.doc_id LIMIT 10""".stripMargin

  /** q163 — the posting-index INGEST LIFECYCLE (q126's discipline on
    * the text index — round-13 verdict #3: every other store family
    * folds O(delta); the search tier must not re-ingest the corpus per
    * index refresh):
    *
    *  1. DAY 0 (build): the BASE corpus (`doc_id % 10 ≠ 0`) tokenizes
    *     once into `(term, doc_id, positions, tf, dl)` rows, written
    *     bucketed/sorted by term.
    *  2. INGEST (fold): the delta slice tokenizes O(delta) with the
    *     SAME derivation ([[postingRows]] — the fold path must match
    *     the build path or folded postings could never join the
    *     store's) and APPENDS under the store's bucket spec via the
    *     generic schema-checked store fold
    *     ([[DedupTextQueries.foldAdmittedVia]], manifest refreshed).
    *     Nothing already indexed is rewritten.
    *  3. SERVE: q151's boolean-AND engine over the FOLDED table — the
    *     two top-df terms resolve against base+delta postings, so both
    *     the term resolution and the hit set see delta documents
    *     immediately (PostingFoldSpec additionally pins that delta
    *     docs appear in the folded postings and the served hits).
    *
    * Oracle: [[q151Sql]] VERBATIM — base+delta is the whole corpus, so
    * a fold that dropped, re-tokenized, or double-appended anything
    * flips the hash against the from-scratch index. Like q92/q126 the
    * query runs its lifecycle at construction by design, on its own
    * non-memoized table (dropped and rebuilt each run — re-runnable
    * under Bench warmup/repeat); compaction of a long-folded store
    * rides the existing generation-dir machinery
    * ([[DedupTextQueries.compactStore]]).
    */
  val q163PostingIndexFold: Q = (s, d) => {
    val t = RunStore.tableName("graft_posting_lifecycle", d)
    RunStore.dropWithLocation(s, t)
    val docs = documents(s, d)
    val isBase = col("doc_id") % 10 =!= 0
    graft.core.Tables.writeBucketed(postingRows(docs.filter(isBase)), t, 8,
      "term")
    DedupTextQueries.foldAdmittedVia(postingRows)(s, t, docs.filter(!isBase))
    booleanSearchOver(s.table(t))
  }

  val queries: Map[String, Q] = Map(
    "q151_boolean_search" -> q151BooleanSearch,
    "q152_phrase_search" -> q152PhraseSearch,
    "q153_batch_term_serve" -> q153BatchTermServe,
    "q154_lexical_dense_hybrid" -> q154LexicalDenseHybrid,
    "q163_posting_index_fold" -> q163PostingIndexFold,
    "q164_bm25_topk" -> q164Bm25TopK,
    "q198_tombstoned_search" -> q198TombstonedSearch)

  val oracle: Map[String, String] = Map(
    "q151_boolean_search" -> q151Sql,
    "q152_phrase_search" -> q152Sql,
    "q153_batch_term_serve" -> q153Sql,
    "q154_lexical_dense_hybrid" -> q154Sql,
    // q151's SQL verbatim: the folded base+delta index must serve
    // exactly what the from-scratch index serves
    "q163_posting_index_fold" -> q151Sql,
    "q164_bm25_topk" -> q164Sql,
    // q151's algebra with the tombstone predicate inside the hit scan
    "q198_tombstoned_search" -> q198Sql)
}
