package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every `queries` entry has a matching `oracleSql` DuckDB statement
  * unless the operator is not SQL-expressible (sketch-based dedup,
  * ML scoring) — those get the driver's rows-only check and a
  * ScalaTest determinism/quality spec instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §D dashboard + TPC-H-grade analytics
    "q_total_amount" -> (Analytics.totalAmount _),
    "q_amount_by_priority" -> (Analytics.amountByPriority _),
    "q_count_by_state" -> (Analytics.countByState _),
    "q1_pricing_summary" -> (Analytics.pricingSummary _),
    "q3_shipping_priority" -> (Analytics.shippingPriority _),
    "q5_region_revenue" -> (Analytics.regionRevenue _),
    "q_top_customers_window" -> (Analytics.topCustomersWindow _),
    "q_running_total_window" -> (Analytics.runningTotalWindow _),
    "q_bucketed_amounts" -> (Analytics.bucketedAmounts _),
    "q_distinct_parts" -> (Analytics.distinctParts _),
    "q_pivot_status_month" -> (Analytics.pivotStatusMonth _),
    "q_rollup_priority" -> (Analytics.rollupPriority _),
    // §B medallion
    "ingest_bronze" -> (Medallion.ingestBronze _),
    "silver_clean" -> (Medallion.silverClean _),
    "gold_enrich" -> (Medallion.goldEnrich _),
    // §G dedup
    "dedup_exact" -> (Dedup.exact _),
    "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
    "dedup_minhash_lsh" -> ((s: SparkSession, d: String) => Dedup.minhashLsh(s, d)),
    "dedup_simhash" -> ((s: SparkSession, d: String) => Dedup.simhash(s, d)),
    // §I text analysis
    "text_quality" -> (TextAnalysis.quality _),
    "text_langid" -> (TextAnalysis.langId _),
    "text_token_count" -> (TextAnalysis.tokenCount _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
  )

  // ---- DuckDB oracle SQL ------------------------------------------------
  // Conventions for bit-exact parity with the Spark plans:
  //  * money aggs: CAST(x AS DECIMAL(12,4)) before SUM, CAST(... AS
  //    DOUBLE) after — exact decimals are order-insensitive, so both
  //    engines produce the identical double.
  //  * DuckDB regexp_replace needs the 'g' flag to match Spark's
  //    replace-all semantics.
  //  * int-typed derivations are CAST to INTEGER to mirror Spark's
  //    int32 results (DuckDB defaults to BIGINT).

  private val decPrice = "CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))"

  private val silverSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
      |  CAST(o_orderstatus <> 'F' AS VARCHAR) AS bad_flag,
      |  CAST(regexp_replace(o_orderpriority, '[^0-9]', '', 'g') AS DOUBLE) AS priority_num,
      |  trim(regexp_replace(o_orderpriority, '^[0-9]+-', '', 'g')) AS priority_label,
      |  CAST(year(o_orderdate) AS INTEGER) AS order_year,
      |  CAST(year(o_orderdate) - 1995 AS INTEGER) AS years_since_1995
      |FROM orders WHERE o_orderstatus IN ('F','O','P')""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_total_amount" ->
      "SELECT CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS total_amount FROM orders",
    "q_amount_by_priority" ->
      """SELECT o_orderpriority, CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS total_amount
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_count_by_state" ->
      """SELECT n_name, c_mktsegment, COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, c_mktsegment""".stripMargin,
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_qty,
         |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_base_price,
         |  CAST(round(SUM($decPrice), 4) AS DOUBLE) AS sum_disc_price,
         |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(5,4)))), 4) AS DOUBLE) AS sum_charge,
         |  CAST(round(SUM(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) / COUNT(*) AS avg_price,
         |  CAST(round(SUM(CAST(l_discount AS DECIMAL(12,4))), 4) AS DOUBLE) / COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(round(SUM($decPrice), 4) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      s"""SELECT n_name, CAST(round(SUM($decPrice), 4) AS DOUBLE) AS revenue
         |FROM lineitem, orders, supplier, customer, nation, region
         |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
         |  AND o_custkey = c_custkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,
    "q_top_customers_window" ->
      """WITH rev AS (
        |  SELECT o_custkey, CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_mktsegment, rank, o_custkey, revenue FROM (
        |  SELECT c_mktsegment, o_custkey, revenue,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY revenue DESC, o_custkey) AS INTEGER) AS rank
        |  FROM rev JOIN customer ON o_custkey = c_custkey)
        |WHERE rank <= 3""".stripMargin,
    "q_running_total_window" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_total
        |FROM orders""".stripMargin,
    "q_bucketed_amounts" ->
      """SELECT CAST(FLOOR(o_totalprice / 1000) AS BIGINT) * 1000 AS amount_bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS total_amount
        |FROM orders GROUP BY 1""".stripMargin,
    "q_distinct_parts" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_pivot_status_month" ->
      """SELECT CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1""".stripMargin,
    "q_rollup_priority" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS total_amount
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "ingest_bronze" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  o_orderpriority, 'orders_raw' AS src_table FROM orders""".stripMargin,
    "silver_clean" -> silverSql,
    "gold_enrich" ->
      s"""WITH silver AS ($silverSql),
         |charges AS (
         |  SELECT l_orderkey, SUM($decPrice) AS line_charges
         |  FROM lineitem GROUP BY l_orderkey)
         |SELECT s.*,
         |  trim(regexp_replace(o_orderpriority, '1-URGENT|2-HIGH', 'EXPEDITED', 'g')) AS priority_group,
         |  CAST(round(COALESCE(c.line_charges, 0) - CAST(o_totalprice AS DECIMAL(12,4)), 2) AS DOUBLE) AS net
         |FROM silver s LEFT JOIN charges c ON s.o_orderkey = c.l_orderkey""".stripMargin,
    "dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, md5(text) AS content_hash, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2]) for i in range(1, len(w) - 1)]) AS sh
        |  FROM w WHERE len(w) >= 3),
        |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh),
        |inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        |common AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(n_common AS INTEGER) AS n_common,
        |  CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
        |FROM common
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.6""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars_m,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS INTEGER) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS INTEGER) AS n_punct,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it|for)\b')) AS INTEGER) AS n_stop,
        |  CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS INTEGER) AS n_word_chars,
        |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) / greatest(length(text), 1) AS punct_ratio,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it|for)\b')) AS DOUBLE)
        |    / greatest(len(regexp_extract_all(text, '[a-zA-Z0-9]+')), 1) AS stopword_ratio,
        |  CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS DOUBLE)
        |    / greatest(len(regexp_extract_all(text, '[a-zA-Z0-9]+')), 1) AS avg_word_len,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) BETWEEN 5 AND 10000
        |    AND CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) / greatest(length(text), 1) < 0.3
        |    AS INTEGER) AS keep_flag
        |FROM documents""".stripMargin,
    "text_langid" ->
      """SELECT doc_id, lang AS lang_tagged,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|is|in|that|with)\b')) AS INTEGER) AS s_en,
        |  CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit)\b')) AS INTEGER) AS s_de,
        |  CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|dans|avec)\b')) AS INTEGER) AS s_fr,
        |  CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|es|en|que|con)\b')) AS INTEGER) AS s_es,
        |  CASE
        |    WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
        |    WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
        |    WHEN s_fr >= s_es THEN 'fr'
        |    ELSE 'es' END AS lang_pred
        |FROM (SELECT doc_id, lang, text,
        |  len(regexp_extract_all(lower(text), '\b(the|and|of|is|in|that|with)\b')) AS s_en,
        |  len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit)\b')) AS s_de,
        |  len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|dans|avec)\b')) AS s_fr,
        |  len(regexp_extract_all(lower(text), '\b(el|los|las|es|en|que|con)\b')) AS s_es
        |  FROM documents)""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS INTEGER) AS bpe_tokens
        |FROM documents""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 16) AS fingerprint
        |FROM documents""".stripMargin,
  )
}
