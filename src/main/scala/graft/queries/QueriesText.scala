package graft.queries

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import graft.multimodal.Media
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables
import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis / dedup / similarity / multimodal / streaming queries
  * (SURVEY §2 D/E) — the LLM-training-data-pipeline operator family.
  */
object QueriesText {
  type Q = (SparkSession, String) => DataFrame

  // DuckDB replica of TextFunctions.normText — keep in sync
  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
  private def toksSql = s"string_split($normSql, ' ')"

  val queries: Map[String, Q] = Map(
    "q_token_count" -> ((s, d) => {
      Tables(s, d).documents
        .select(col("doc_id"), tokens(col("text")).as("__toks"))
        .select(col("doc_id"), tokenCountOfTokens(col("__toks")).as("n_tokens"))
        .orderBy("doc_id")
    }),

    "q_text_quality" -> ((s, d) => {
      // tokens materialized once (HOF lambdas don't CSE), quality
      // assembled from the same raw components as the oracle
      Tables(s, d).documents
        .select(col("doc_id"), col("text"), tokens(col("text")).as("__toks"))
        .select(col("doc_id"),
          tokenCountOfTokens(col("__toks")).as("n_tokens"),
          punctRatio(col("text")).as("__punct"),
          stopwordRatioOfTokens(col("__toks")).as("__stop"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("__punct"), 6).as("punct_ratio"),
          round(col("__stop"), 6).as("stop_ratio"),
          round(qualityScoreOf(col("n_tokens"), col("__punct"), col("__stop")), 6)
            .as("quality"))
        .orderBy("doc_id")
    }),

    "q_lang_id" -> ((s, d) => {
      // tokens, then the 5 scores, each materialized ONCE per row —
      // the argmax in the final projection reads cheap struct fields
      // (inline scores re-evaluate per `when` reference: no CSE
      // through HOF lambdas)
      Tables(s, d).documents
        .select(col("doc_id"), col("lang").as("lang_actual"), tokens(col("text")).as("__toks"))
        .select(col("doc_id"), col("lang_actual"),
          langScoresOfTokens(col("__toks")).as("__ls"))
        .select(col("doc_id"), col("lang_actual"),
          langIdOfScores(col("__ls")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    "q_token_bpe" -> ((s, d) => {
      // BPE-ish regex pre-tokenization counts (letters/digits/punct
      // runs) alongside whitespace token counts
      Tables(s, d).documents
        .select(col("doc_id"), col("text"), tokens(col("text")).as("__toks"))
        .select(col("doc_id"),
          tokenCountOfTokens(col("__toks")).as("n_ws_tokens"),
          bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),

    "q_fingerprint_rolling" -> ((s, d) => {
      // order-sensitive rolling-hash fingerprint (no oracle: no shared
      // hash primitive with DuckDB; semantics spec'd in ScalaTest)
      Tables(s, d).documents
        .select(col("doc_id"), tokens(col("text")).as("__toks"))
        .select(col("doc_id"), rollingFingerprint(col("__toks")).as("rolling_fp"))
        .orderBy("doc_id")
    }),

    "q_fingerprint" -> ((s, d) => {
      Tables(s, d).documents
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy("fp")
    }),

    "q_dedup_exact" -> ((s, d) => {
      Dedup.exact(Tables(s, d).documents, "doc_id", "text")
        .select(col("fp"), col("doc_id").as("keep_id"), col("n_dups"))
        .orderBy("fp")
    }),

    "q_dedup_ngram" -> ((s, d) => {
      Dedup.ngramJaccard(Tables(s, d).documents, "doc_id", "text",
          shingleN = 3, threshold = 0.5)
        .orderBy("id_a", "id_b")
    }),

    "q_dedup_minhash" -> ((s, d) => {
      Dedup.minHashLsh(Tables(s, d).documents, "doc_id", "text",
          shingleN = 3, numHashes = 32, bands = 8, threshold = 0.6)
        .orderBy("id_a", "id_b")
    }),

    "q_dedup_simhash" -> ((s, d) => {
      Dedup.simHashDups(Tables(s, d).documents, "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    "q_dedup_embed" -> ((s, d) => {
      // embedding-cosine near-dup: candidate pairs blocked by a coarse
      // cluster key (label) through the CAPPED bucket generator — a hot
      // block at corpus scale is dropped, never allowed to go O(m²).
      // Threshold is domain-tuned; 0.42 exercises the tail of this
      // synthetic corpus (true dups would sit near 1.0).
      Dedup.embedCosine(Tables(s, d).embeddings, "vec_id", "embedding",
          blockCol = "label", threshold = 0.42, maxBlock = 1000)
        .orderBy("id_a", "id_b")
    }),

    "q_embed_norm" -> ((s, d) => {
      Tables(s, d).embeddings
        .select(col("vec_id"), size(col("embedding")).as("dim"),
          round(sqrt(VectorFunctions.dotHof(col("embedding"), col("embedding"))), 6)
            .as("l2_norm"),
          round(VectorFunctions.dotHof(col("embedding"), col("embedding")), 6)
            .as("sq_sum"))
        .orderBy("vec_id")
    }),

    "q_ann_bruteforce" -> ((s, d) => {
      val t = Tables(s, d)
      // native FloatVecDot folds left-to-right exactly like the
      // oracle's sequential list_sum — bit-identical doubles
      Similarity.bruteForceTopK(t.embeddings,
          t.embeddings.filter(col("vec_id") < 3), k = 5, useNative = true)
        .orderBy("query_id", "rk")
    }),

    "q_ann_lsh" -> ((s, d) => {
      val t = Tables(s, d)
      Similarity.lshTopK(t.embeddings, t.embeddings.filter(col("vec_id") < 3),
          k = 5, tables = 8, planes = 4, dim = 64)
        .orderBy("query_id", "rk")
    }),

    "q_dedup_clusters" -> ((s, d) => {
      // near-dup pairs -> connected components -> survivor per cluster
      // (the end product of a corpus dedup pipeline)
      val pairs = Dedup.minHashLsh(Tables(s, d).documents, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.6)
      graft.operators.Components.dedupClusters(pairs)
        .orderBy("component")
    }),

    "q_ann_ivf" -> ((s, d) => {
      val t = Tables(s, d)
      Similarity.ivfTopK(t.embeddings, t.embeddings.filter(col("vec_id") < 3),
          k = 5, nlist = 16, nprobe = 4)
        .orderBy("query_id", "rk")
    }),

    "q_corpus_filter" -> ((s, d) => {
      // composed curation pipeline: language-consistency + quality
      // + exact-dedup canonical flags -> per-language keep/drop counts
      val docs = Tables(s, d).documents
        .select(col("doc_id"), col("lang"), col("text"), tokens(col("text")).as("__toks"))
        .withColumn("__fp", fingerprint(col("text")))
        .withColumn("__ls", langScoresOfTokens(col("__toks")))
        .withColumn("lang_ok", langIdOfScores(col("__ls")) === col("lang"))
        .withColumn("q_ok",
          qualityScoreOf(tokenCountOfTokens(col("__toks")), punctRatio(col("text")),
            stopwordRatioOfTokens(col("__toks"))) >= 0.5)
      val canon = docs.groupBy("__fp").agg(min(col("doc_id")).as("__keep_id"))
      docs.join(canon, "__fp")
        .withColumn("is_canonical", col("doc_id") === col("__keep_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_canonical") && col("lang_ok") && col("q_ok"), 1L)
            .otherwise(0L)).as("n_kept"),
          sum(when(!col("is_canonical"), 1L).otherwise(0L)).as("n_dup_dropped"),
          sum(when(col("is_canonical") && !col("lang_ok"), 1L).otherwise(0L)).as("n_lang_dropped"),
          sum(when(col("is_canonical") && col("lang_ok") && !col("q_ok"), 1L)
            .otherwise(0L)).as("n_quality_dropped"))
        .orderBy("lang")
    }),

    "q_media_pipeline" -> ((s, d) => {
      Media.mediaStats(s, Tables(s, d).documents)
    }),

    "q_stream_window" -> ((s, d) => {
      EventStream.runBatchEquivalent(s, d)
    }))

  val oracles: Map[String, String] = Map(
    "q_token_count" ->
      s"""SELECT doc_id,
         | CASE WHEN length($normSql) = 0 THEN 0 ELSE cast(len($toksSql) as int) END AS n_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      s"""WITH base AS (
         | SELECT doc_id, text, $normSql AS norm,
         |  CASE WHEN length($normSql) = 0 THEN 0 ELSE cast(len($toksSql) as int) END AS n_tokens,
         |  CASE WHEN length(text) = 0 THEN 0.0
         |   ELSE cast(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) as double) / length(text) END AS punct_ratio,
         |  CASE WHEN len($toksSql) = 0 THEN 0.0
         |   ELSE cast(len(list_filter($toksSql, x -> x IN ('the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','from','that','this','be'))) as double) / len($toksSql) END AS stop_ratio
         | FROM documents)
         |SELECT doc_id, n_tokens, round(punct_ratio, 6) AS punct_ratio,
         | round(stop_ratio, 6) AS stop_ratio,
         | round(least(cast(n_tokens as double) / 50.0, 1.0) * 0.4
         |  + greatest(0.0, 1.0 - punct_ratio * 5.0) * 0.3
         |  + least(stop_ratio * 5.0, 1.0) * 0.3, 6) AS quality
         |FROM base ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      s"""WITH scored AS (
         | SELECT doc_id, lang AS lang_actual,
         |  len(list_filter($toksSql, x -> x IN ('the','and','of','is','with'))) AS s_en,
         |  len(list_filter($toksSql, x -> x IN ('le','la','et','les','des'))) AS s_fr,
         |  len(list_filter($toksSql, x -> x IN ('der','die','und','das','ist'))) AS s_de,
         |  len(list_filter($toksSql, x -> x IN ('el','los','las','una','es'))) AS s_es,
         |  len(list_filter($toksSql, x -> x IN ('de','shi','le','zai','he'))) AS s_zh
         | FROM documents),
         |best AS (SELECT *, greatest(s_en, s_fr, s_de, s_es, s_zh) AS b FROM scored)
         |SELECT doc_id, lang_actual,
         | CASE WHEN s_en = b AND b > 0 THEN 'en'
         |      WHEN s_fr = b AND b > 0 THEN 'fr'
         |      WHEN s_de = b AND b > 0 THEN 'de'
         |      WHEN s_es = b AND b > 0 THEN 'es'
         |      WHEN s_zh = b AND b > 0 THEN 'zh'
         |      ELSE 'und' END AS lang_pred
         |FROM best ORDER BY doc_id""".stripMargin,

    "q_token_bpe" ->
      s"""SELECT doc_id,
         | CASE WHEN length($normSql) = 0 THEN 0 ELSE cast(len($toksSql) as int) END AS n_ws_tokens,
         | cast(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+')) as int) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      s"""SELECT md5($normSql) AS fp, count(*) AS n_docs, min(doc_id) AS first_doc
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dedup_exact" ->
      s"""SELECT md5($normSql) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dedup_embed" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | round(
        |  list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> cast(x[1] as double) * cast(x[2] as double)))
        |  / (sqrt(list_sum(list_transform(a.embedding, x -> cast(x as double) * cast(x as double))))
        |   * sqrt(list_sum(list_transform(b.embedding, x -> cast(x as double) * cast(x as double))))), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |JOIN (SELECT label FROM embeddings GROUP BY label
        |      HAVING count(*) BETWEEN 2 AND 1000) ok ON a.label = ok.label
        |WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> cast(x[1] as double) * cast(x[2] as double)))
        |  / (sqrt(list_sum(list_transform(a.embedding, x -> cast(x as double) * cast(x as double))))
        |   * sqrt(list_sum(list_transform(b.embedding, x -> cast(x as double) * cast(x as double))))) >= 0.42
        |ORDER BY id_a, id_b""".stripMargin,

    "q_embed_norm" ->
      """SELECT vec_id, cast(len(embedding) as int) AS dim,
        | round(sqrt(list_sum(list_transform(embedding, x -> cast(x as double) * cast(x as double)))), 6) AS l2_norm,
        | round(list_sum(list_transform(embedding, x -> cast(x as double) * cast(x as double))), 6) AS sq_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
        | pairs AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |   list_sum(list_transform(list_zip(q.qv, e.embedding),
        |     p -> cast(p[1] as double) * cast(p[2] as double)))
        |   / (sqrt(list_sum(list_transform(q.qv, x -> cast(x as double) * cast(x as double))))
        |    * sqrt(list_sum(list_transform(e.embedding, x -> cast(x as double) * cast(x as double))))) AS cosine
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        | ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk FROM pairs)
        |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, cast(rk as int) AS rk
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "q_corpus_filter" ->
      s"""WITH base AS (
         | SELECT doc_id, lang, md5($normSql) AS fp,
         |  CASE WHEN length($normSql) = 0 THEN 0 ELSE cast(len($toksSql) as int) END AS n_tokens,
         |  CASE WHEN length(text) = 0 THEN 0.0
         |   ELSE cast(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) as double) / length(text) END AS punct_ratio,
         |  CASE WHEN len($toksSql) = 0 THEN 0.0
         |   ELSE cast(len(list_filter($toksSql, x -> x IN ('the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','from','that','this','be'))) as double) / len($toksSql) END AS stop_ratio,
         |  len(list_filter($toksSql, x -> x IN ('the','and','of','is','with'))) AS s_en,
         |  len(list_filter($toksSql, x -> x IN ('le','la','et','les','des'))) AS s_fr,
         |  len(list_filter($toksSql, x -> x IN ('der','die','und','das','ist'))) AS s_de,
         |  len(list_filter($toksSql, x -> x IN ('el','los','las','una','es'))) AS s_es,
         |  len(list_filter($toksSql, x -> x IN ('de','shi','le','zai','he'))) AS s_zh
         | FROM documents),
         |flags AS (
         | SELECT doc_id, lang, fp,
         |  (CASE WHEN s_en = greatest(s_en,s_fr,s_de,s_es,s_zh) AND greatest(s_en,s_fr,s_de,s_es,s_zh) > 0 THEN 'en'
         |        WHEN s_fr = greatest(s_en,s_fr,s_de,s_es,s_zh) AND greatest(s_en,s_fr,s_de,s_es,s_zh) > 0 THEN 'fr'
         |        WHEN s_de = greatest(s_en,s_fr,s_de,s_es,s_zh) AND greatest(s_en,s_fr,s_de,s_es,s_zh) > 0 THEN 'de'
         |        WHEN s_es = greatest(s_en,s_fr,s_de,s_es,s_zh) AND greatest(s_en,s_fr,s_de,s_es,s_zh) > 0 THEN 'es'
         |        WHEN s_zh = greatest(s_en,s_fr,s_de,s_es,s_zh) AND greatest(s_en,s_fr,s_de,s_es,s_zh) > 0 THEN 'zh'
         |        ELSE 'und' END) = lang AS lang_ok,
         |  (least(cast(n_tokens as double) / 50.0, 1.0) * 0.4
         |   + greatest(0.0, 1.0 - punct_ratio * 5.0) * 0.3
         |   + least(stop_ratio * 5.0, 1.0) * 0.3) >= 0.5 AS q_ok
         | FROM base),
         |canon AS (SELECT fp, min(doc_id) AS keep_id FROM flags GROUP BY 1)
         |SELECT lang, count(*) AS n_docs,
         | cast(sum(CASE WHEN is_canonical AND lang_ok AND q_ok THEN 1 ELSE 0 END) as bigint) AS n_kept,
         | cast(sum(CASE WHEN NOT is_canonical THEN 1 ELSE 0 END) as bigint) AS n_dup_dropped,
         | cast(sum(CASE WHEN is_canonical AND NOT lang_ok THEN 1 ELSE 0 END) as bigint) AS n_lang_dropped,
         | cast(sum(CASE WHEN is_canonical AND lang_ok AND NOT q_ok THEN 1 ELSE 0 END) as bigint) AS n_quality_dropped
         |FROM (SELECT f.*, f.doc_id = c.keep_id AS is_canonical FROM flags f JOIN canon c USING (fp))
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stream_window" ->
      """SELECT strftime(date_trunc('hour', cast(ts as timestamp)), '%Y-%m-%d %H:%M:%S') AS bucket_start,
        | event_type, count(*) AS n_events,
        | round(cast(sum(cast(value as decimal(28,15))) as double), 4) AS value_sum
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin)
}
