package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r11 SQL front-end contract: after `GraftSql.register`, a
  * SQL-only user can reproduce representative operators from every
  * §2 family — market analytics, chunked cumulative/lag scaffolds,
  * relational subqueries, dedup (exact/simhash/span-level), text,
  * similarity (via the registered codegen'd `graft_*` functions) —
  * through `spark.sql` text, matching the DataFrame path EXACTLY
  * (same rows, same bits; results compared as canonical sorted row
  * strings). r13 widened the panel to 16 operators (r12 verdict
  * item 7) so the SQL surface can't silently drift from the
  * DataFrame path in any family.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val registered: Unit = GraftSql.register(spark, sf)

  private def rows(df: org.apache.spark.sql.DataFrame): Vector[String] =
    df.collect().map(_.toSeq.map {
      case null => "∅"
      case d: Double => java.lang.Double.doubleToRawLongBits(d).toString
      case x => x.toString
    }.mkString("|")).sorted.toVector

  private def same(sql: String, df: org.apache.spark.sql.DataFrame): Unit = {
    registered
    val a = rows(spark.sql(sql))
    val b = rows(df)
    assert(a.length === b.length, s"row counts ${a.length} vs ${b.length}")
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  private val tieKey =
    "lpad(CAST(unix_micros(ts) AS STRING), 20, '0') || lpad(CAST(event_id AS STRING), 20, '0')"

  test("OHLC daily candlesticks via SQL") {
    same(
      s"""SELECT symbol, to_date(ts) AS day,
         |       min_by(price, $tieKey) AS open, max(price) AS high,
         |       min(price) AS low, max_by(price, $tieKey) AS close,
         |       sum(volume) AS volume, count(1) AS n_ticks
         |FROM ticks GROUP BY 1, 2""".stripMargin,
      graft.operators.MarketOps.ohlcDaily(graft.core.Tables.ticks(spark, sf)))
  }

  test("VWAP via SQL") {
    same(
      """SELECT symbol, to_date(ts) AS day,
        |       round(CAST(sum(CAST(price AS DECIMAL(18,2)) * volume) AS DOUBLE)
        |             / CAST(sum(volume) AS DOUBLE), 6) AS vwap
        |FROM ticks GROUP BY 1, 2""".stripMargin,
      graft.operators.MarketOps.vwapDaily(graft.core.Tables.ticks(spark, sf)))
  }

  test("top-N per symbol via SQL window") {
    same(
      """SELECT symbol, CAST(rn AS BIGINT) AS rn, event_id, price FROM (
        |  SELECT symbol, event_id, price,
        |         row_number() OVER (PARTITION BY symbol
        |                            ORDER BY price DESC, event_id) AS rn
        |  FROM ticks) WHERE rn <= 3""".stripMargin,
      graft.operators.MarketOps.topNBySymbol(
        graft.core.Tables.ticks(spark, sf), 3))
  }

  test("donchian channel via SQL window equals the deque operator bit for bit") {
    same(
      """SELECT event_id, symbol,
        |       CAST(mx AS DOUBLE) AS upper_ch, CAST(mn AS DOUBLE) AS lower_ch,
        |       CAST(mx + mn AS DOUBLE) / 2.0 AS mid_ch
        |FROM (
        |  SELECT event_id, symbol,
        |         max(CAST(price AS DECIMAL(18,2))) OVER w AS mx,
        |         min(CAST(price AS DECIMAL(18,2))) OVER w AS mn
        |  FROM ticks
        |  WINDOW w AS (PARTITION BY symbol ORDER BY ts, event_id
        |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |""".stripMargin,
      graft.operators.MarketOps.donchian(graft.core.Tables.ticks(spark, sf), 20))
  }

  test("brute-force cosine ANN via the registered graft_dot function") {
    same(
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |       round(graft_dot(embedding, qe) /
        |             (sqrt(graft_dot(embedding, embedding))
        |              * sqrt(graft_dot(qe, qe))), 4) AS cos_sim
        |FROM embeddings CROSS JOIN q WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
      graft.pipeline.Similarity.bruteForceTopK(
        graft.core.Tables.embeddings(spark, sf), 0L, 10))
  }

  test("document fingerprint via the registered graft_fingerprint function") {
    same(
      "SELECT doc_id, graft_fingerprint(text) AS fingerprint FROM documents",
      graft.pipeline.TextOps.fingerprint(
        graft.core.Tables.documents(spark, sf)))
  }

  test("int8 quantization + exact integer dot via SQL functions") {
    same(
      """SELECT vec_id,
        |       graft_dot_i8(graft_quantize_i8(embedding),
        |                    graft_quantize_i8(embedding)) AS self_dot
        |FROM embeddings""".stripMargin,
      {
        import org.apache.spark.sql.functions._
        val emb = graft.core.Tables.embeddings(spark, sf)
        graft.functions.GraftFunctions.register(spark)
        emb.select(col("vec_id"),
          graft.pipeline.Similarity.dotI8(
            graft.pipeline.Similarity.quantizeI8(col("embedding")),
            graft.pipeline.Similarity.quantizeI8(col("embedding")))
            .as("self_dot"))
      })
  }

  test("TPC-H Q1 pricing summary via SQL") {
    same(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       CAST(sum(l_extendedprice) AS DOUBLE) AS sum_base,
        |       CAST(count(1) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= date'1998-09-02'
        |GROUP BY 1, 2""".stripMargin,
      {
        import org.apache.spark.sql.functions._
        graft.core.Tables.lineitem(spark, sf)
          .filter(col("l_shipdate") <= lit(java.sql.Date.valueOf("1998-09-02")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).cast("bigint").as("sum_qty"),
            sum(col("l_extendedprice")).cast("double").as("sum_base"),
            count(lit(1)).as("count_order"))
      })
  }

  test("token entropy via SQL matches the operator") {
    same(
      """WITH c AS (
        |  SELECT doc_id, w, count(1) AS c
        |  FROM (SELECT doc_id, explode(split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1, 2),
        |t AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM c),
        |q AS (SELECT doc_id, n,
        |        CAST(CAST(CASE WHEN CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
        |                * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0 >= 0
        |             THEN floor(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
        |                * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
        |             ELSE ceil(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
        |                * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0 - 0.5)
        |             END AS BIGINT) AS DECIMAL(18,0))
        |          * CAST(0.000001 AS DECIMAL(7,6)) AS term
        |      FROM t)
        |SELECT doc_id, max(n) AS n_tokens, count(1) AS n_distinct,
        |       -CAST(sum(term) AS DOUBLE) / 0.6931471805599453 + 0.0 AS entropy
        |FROM q GROUP BY doc_id""".stripMargin,
      graft.pipeline.TextOps.tokenEntropy(
        graft.core.Tables.documents(spark, sf)))
  }

  test("chunked cumulative volume equals the naive SQL window bit for bit") {
    // the distributed prefix aggregation's contract, stated in SQL: the
    // chunked operator IS the per-symbol unbounded running sum
    same(
      """SELECT event_id, symbol,
        |       sum(volume) OVER (PARTITION BY symbol ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_volume
        |FROM ticks""".stripMargin,
      graft.operators.MarketOps.runningVolume(graft.core.Tables.ticks(spark, sf)))
  }

  test("tick returns via SQL lag equal the chunked-carry operator") {
    same(
      """SELECT event_id, symbol, price / prev - 1 AS ret FROM (
        |  SELECT event_id, symbol, price,
        |         lag(price) OVER (PARTITION BY symbol ORDER BY ts, event_id) AS prev
        |  FROM ticks)
        |WHERE prev IS NOT NULL AND prev <> 0.0""".stripMargin,
      graft.operators.MarketOps.returns(graft.core.Tables.ticks(spark, sf)))
  }

  test("exact dedup via SQL") {
    same(
      """SELECT min(doc_id) AS keep_id, count(1) AS dup_count
        |FROM documents GROUP BY md5(text)""".stripMargin,
      graft.pipeline.Dedup.exact(graft.core.Tables.documents(spark, sf)))
  }

  test("simhash signatures via the registered graft_simhash function") {
    same(
      "SELECT doc_id, graft_simhash(text) AS simhash FROM documents",
      graft.pipeline.Dedup.simhash(graft.core.Tables.documents(spark, sf)))
  }

  test("EXISTS-subquery semi join via SQL") {
    same(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_totalprice > 300000.0)""".stripMargin,
      graft.operators.Relational.semiJoin(spark, sf))
  }

  test("span-level dedup via SQL window gate + islands (r13)") {
    same(
      """WITH g AS (
        |  SELECT doc_id, pos0 + 1 AS pos,
        |         CAST(conv(substring(md5(gram), 1, 15), 16, 10) AS BIGINT) AS h
        |  FROM (SELECT doc_id,
        |               posexplode(filter(transform(ws, (w, i) ->
        |                 CASE WHEN i <= size(ws) - 3
        |                      THEN concat_ws(' ', element_at(ws, i + 1),
        |                             element_at(ws, i + 2), element_at(ws, i + 3))
        |                 END), x -> x IS NOT NULL)) AS (pos0, gram)
        |        FROM (SELECT doc_id, split(text, ' ') AS ws FROM documents))),
        |f AS (SELECT doc_id, pos FROM (
        |        SELECT doc_id, pos,
        |               min(doc_id) OVER (PARTITION BY h) AS mn,
        |               max(doc_id) OVER (PARTITION BY h) AS mx
        |        FROM g) WHERE mn <> mx),
        |e AS (SELECT doc_id, explode(sequence(CAST(pos AS BIGINT),
        |               CAST(pos AS BIGINT) + 2)) AS wpos FROM f),
        |d AS (SELECT doc_id, wpos FROM (
        |        SELECT doc_id, wpos,
        |               lag(wpos) OVER (PARTITION BY doc_id ORDER BY wpos) AS prev
        |        FROM e) WHERE prev IS NULL OR prev <> wpos),
        |i AS (SELECT doc_id, wpos,
        |             wpos - row_number() OVER (PARTITION BY doc_id
        |                                       ORDER BY wpos) AS grp
        |      FROM d)
        |SELECT doc_id, min(wpos) AS span_start, max(wpos) AS span_end,
        |       count(1) AS span_words
        |FROM i GROUP BY doc_id, grp""".stripMargin,
      graft.pipeline.Dedup.spanDedup(graft.core.Tables.documents(spark, sf)))
  }

  test("sessionization via SQL gaps-and-islands equals the chunked operator") {
    same(
      """WITH flagged AS (
        |  SELECT event_id, symbol, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR (unix_micros(ts) - unix_micros(lag(ts) OVER w))
        |                   > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM ticks
        |  WINDOW w AS (PARTITION BY symbol ORDER BY ts, event_id))
        |SELECT event_id, symbol,
        |       CAST(sum(is_new) OVER (PARTITION BY symbol ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS session_id
        |FROM flagged""".stripMargin,
      graft.operators.MarketOps.sessionize(
        graft.core.Tables.ticks(spark, sf), 30))
  }

  test("r17: IVFPQ ANN top-k reaches SQL as a parameterized view") {
    registered
    GraftSql.registerAnnTopK(spark, sf, "ann_hits", queryId = 3L, k = 10)
    val scala = graft.pipeline.Similarity.ivfPqTopK(
      graft.core.Tables.embeddings(spark, sf), 3L, 10)
    assert(rows(spark.sql("SELECT * FROM ann_hits")) === rows(scala))
    // the view composes with further SQL — join back to the corpus
    val joined = spark.sql(
      """SELECT a.vec_id, a.cos_sim, e.label
        |FROM ann_hits a JOIN embeddings e USING (vec_id)""".stripMargin)
    assert(joined.count() === scala.count())
  }

  test("r17: indexed BM25 top-k reaches SQL as a parameterized view") {
    registered
    GraftSql.registerBm25TopK(spark, sf, "bm25_hits", SparkEntry.Bm25Terms, 10)
    val scala = graft.pipeline.Bm25Index
      .forTable(graft.core.Tables.documents(spark, sf))
      .topK(SparkEntry.Bm25Terms, 10)
    assert(rows(spark.sql("SELECT * FROM bm25_hits")) === rows(scala))
    val joined = spark.sql(
      """SELECT b.doc_id, b.score, d.source
        |FROM bm25_hits b JOIN documents d USING (doc_id)""".stripMargin)
    assert(joined.count() === scala.count())
  }

  test("r18: positional proximity and phrase views equal the Scala paths") {
    GraftSql.register(spark, sf)
    GraftSql.registerBm25Near(spark, sf, "near_hits", "spark", "join", 3, 10)
    val pos = graft.pipeline.Bm25PosIndex
      .forTable(graft.core.Tables.documents(spark, sf))
    assert(rows(spark.sql("SELECT * FROM near_hits")) ===
      rows(pos.nearTopK("spark", "join", 3, 10)))
    GraftSql.registerBm25Phrase(spark, sf, "phrase_hits",
      SparkEntry.Bm25Phrases, 2, 10)
    assert(rows(spark.sql("SELECT * FROM phrase_hits")) ===
      rows(pos.phraseTopK(SparkEntry.Bm25Phrases, 2, 10)))
    // views compose with further SQL
    val joined = spark.sql(
      """SELECT n.doc_id, n.min_dist, d.lang
        |FROM near_hits n JOIN documents d USING (doc_id)""".stripMargin)
    assert(joined.count() ===
      spark.sql("SELECT * FROM near_hits").count())
  }
}
