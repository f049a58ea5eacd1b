package graft.queries

import graft.QueryDef
import graft.operators.{TextPipeline, TextStats}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** TF-IDF text pipeline queries over the `documents` table (SURVEY.md §2.2,
  * §2.4 A1-A5, §2.3 J1). Oracle SQL shares one tokenizer CTE so both engines
  * see the identical token stream.
  */
object Text {

  /** DuckDB CTE mirroring Exprs.tokens: lowercase → strip non-alnum → split. */
  val toksCte: String = """
    toks AS (
      SELECT doc_id, lang, term FROM (
        SELECT doc_id, lang,
          unnest(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +')) AS term
        FROM documents) u
      WHERE term <> '')"""

  private def toks(s: org.apache.spark.sql.SparkSession, dir: String) =
    TextPipeline.tokenize(Tables(s, dir, "documents"))

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q18_term_stats",
      (s, dir) => {
        toks(s, dir).groupBy(col("term"))
          .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("df"))
      },
      oracle = Some(s"""
        WITH $toksCte
        SELECT term, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS df
        FROM toks GROUP BY 1"""),
      bench = true),

    QueryDef("q19_tf",
      (s, dir) => TextPipeline.tf(TextPipeline.termCounts(toks(s, dir))),
      oracle = Some(s"""
        WITH $toksCte,
        counts AS (SELECT doc_id, term, COUNT(*) AS cnt FROM toks GROUP BY 1, 2)
        SELECT doc_id, term, cnt,
          CAST(cnt AS DOUBLE)/CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS DOUBLE) AS tf
        FROM counts""")),

    QueryDef("q20_idf",
      (s, dir) => TextPipeline.idf(toks(s, dir)),
      oracle = Some(s"""
        WITH $toksCte,
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks)
        SELECT term, COUNT(DISTINCT doc_id) AS df, (SELECT n_docs FROM n) AS n_docs,
          CAST((SELECT n_docs FROM n) AS DOUBLE)/CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS idf_ref,
          round(ln(CAST((SELECT n_docs FROM n) AS DOUBLE)/CAST(COUNT(DISTINCT doc_id) AS DOUBLE)), 10) AS idf_log
        FROM toks GROUP BY 1""")),

    QueryDef("q21_tfidf",
      (s, dir) => {
        val t = toks(s, dir)
        TextPipeline.tfidf(TextPipeline.tf(TextPipeline.termCounts(t)), TextPipeline.idf(t))
      },
      oracle = Some(s"""
        WITH $toksCte,
        counts AS (SELECT doc_id, term, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
        tf AS (SELECT doc_id, term,
          CAST(cnt AS DOUBLE)/CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS DOUBLE) AS tf
          FROM counts),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
        idf AS (SELECT term,
          CAST((SELECT n_docs FROM n) AS DOUBLE)/CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS idf
          FROM toks GROUP BY 1)
        SELECT doc_id, tf.term AS term, tf.tf * idf.idf AS tfidf
        FROM tf JOIN idf ON tf.term = idf.term"""),
      bench = true),

    QueryDef("q22_doc_vectors",
      (s, dir) => {
        val t = toks(s, dir)
        val tfidf = TextPipeline.tfidf(TextPipeline.tf(TextPipeline.termCounts(t)), TextPipeline.idf(t))
        TextPipeline.docVectors(tfidf, TextPipeline.vocab(t))
      },
      oracle = Some(s"""
        WITH $toksCte,
        counts AS (SELECT doc_id, term, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
        tf AS (SELECT doc_id, term,
          CAST(cnt AS DOUBLE)/CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS DOUBLE) AS tf
          FROM counts),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
        idf AS (SELECT term,
          CAST((SELECT n_docs FROM n) AS DOUBLE)/CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS idf
          FROM toks GROUP BY 1),
        tfidf AS (SELECT doc_id, tf.term AS term, tf.tf * idf.idf AS tfidf
          FROM tf JOIN idf ON tf.term = idf.term),
        vocab AS (SELECT term, CAST(row_number() OVER (ORDER BY term) AS BIGINT) AS idx
          FROM (SELECT DISTINCT term FROM toks) v)
        SELECT doc_id,
          string_agg(CAST(idx AS VARCHAR) || ':' ||
            CAST(CAST(round(tfidf*1000000.0) AS BIGINT) AS VARCHAR), ' ' ORDER BY idx) AS vec
        FROM tfidf JOIN vocab USING (term) GROUP BY doc_id"""),
      bench = true),

    // P4/U2: stop-word removal as a broadcast left-anti join (the scalable
    // form for large stop sets; the reference loads a side file per task)
    QueryDef("q45_stopword_filter",
      (s, dir) => {
        val t = toks(s, dir)
        val stop = s.createDataFrame(
          TextStats.stopwords.map(Tuple1(_))).toDF("sw")
        t.join(broadcast(stop), t("term") === stop("sw"), "left_anti")
          .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      },
      oracle = Some {
        val list = TextStats.stopwords.map(w => s"'$w'").mkString(", ")
        s"""
        WITH $toksCte
        SELECT term, COUNT(*) AS cnt FROM toks
        WHERE term NOT IN ($list)
        GROUP BY 1"""
      }),

    // BM25 relevance: top-20 docs for a fixed query term set
    QueryDef("q49_bm25",
      (s, dir) => {
        TextPipeline.bm25(toks(s, dir), Seq("spark", "query", "fast"))
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(20)
      },
      oracle = Some(s"""
        WITH $toksCte,
        counts AS (SELECT doc_id, term, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
        dl AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS dl FROM counts GROUP BY 1),
        stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
        dft AS (
          SELECT term, COUNT(DISTINCT doc_id) AS df FROM counts
          WHERE term IN ('spark', 'query', 'fast') GROUP BY 1),
        scored AS (
          SELECT c.doc_id,
            round(ln((CAST(n_docs AS DOUBLE) - df + 0.5)/(CAST(df AS DOUBLE) + 0.5) + 1.0), 10) *
            (CAST(cnt AS DOUBLE) * (1.2 + 1.0)) /
              (CAST(cnt AS DOUBLE) + 1.2 * ((1.0 - 0.75) +
                0.75 * CAST(dl AS DOUBLE) / (CAST(total_len AS DOUBLE)/CAST(n_docs AS DOUBLE)))) AS s
          FROM counts c
          JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
          WHERE c.term IN ('spark', 'query', 'fast'))
        SELECT doc_id, round(CAST(SUM(CAST(s AS DECIMAL(30,12))) AS DOUBLE), 6) AS score, COUNT(*) AS n_matched
        FROM scored GROUP BY 1
        ORDER BY score DESC, doc_id ASC LIMIT 20"""))
  )
}
