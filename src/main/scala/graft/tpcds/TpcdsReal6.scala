package graft.tpcds

/** Real-TPC-DS batch 6 — multi-CTE flagships (q14/q23 in their `a`
  * forms, q44 over exact cent averages, q54, q58). Conventions:
  * TpcdsReal scaladoc. Batch 7 (TpcdsReal7) closes the remaining four
  * (q8/q24/q39/q64) on generator v7. */
object TpcdsReal6 {

  val texts: Map[String, String] = Map(

    "q14" -> """
      |WITH cross_items AS (
      |  SELECT i_item_sk AS ss_item_sk
      |  FROM item,
      |       (SELECT iss.i_brand_id AS brand_id, iss.i_class_id AS class_id,
      |               iss.i_category_id AS category_id
      |        FROM store_sales, item iss, date_dim d1
      |        WHERE ss_item_sk = iss.i_item_sk AND ss_sold_date_sk = d1.d_date_sk
      |          AND d1.d_year BETWEEN 1999 AND 2001
      |        INTERSECT
      |        SELECT ics.i_brand_id, ics.i_class_id, ics.i_category_id
      |        FROM catalog_sales, item ics, date_dim d2
      |        WHERE cs_item_sk = ics.i_item_sk AND cs_sold_date_sk = d2.d_date_sk
      |          AND d2.d_year BETWEEN 1999 AND 2001
      |        INTERSECT
      |        SELECT iws.i_brand_id, iws.i_class_id, iws.i_category_id
      |        FROM web_sales, item iws, date_dim d3
      |        WHERE ws_item_sk = iws.i_item_sk AND ws_sold_date_sk = d3.d_date_sk
      |          AND d3.d_year BETWEEN 1999 AND 2001) x
      |  WHERE i_brand_id = brand_id AND i_class_id = class_id
      |    AND i_category_id = category_id),
      |avg_sales AS (
      |  SELECT avg(quantity * list_price) AS average_sales
      |  FROM (SELECT ss_quantity AS quantity, ss_list_price AS list_price
      |        FROM store_sales, date_dim
      |        WHERE ss_sold_date_sk = d_date_sk AND d_year BETWEEN 1999 AND 2001
      |        UNION ALL
      |        SELECT cs_quantity, cs_list_price
      |        FROM catalog_sales, date_dim
      |        WHERE cs_sold_date_sk = d_date_sk AND d_year BETWEEN 1999 AND 2001
      |        UNION ALL
      |        SELECT ws_quantity, ws_list_price
      |        FROM web_sales, date_dim
      |        WHERE ws_sold_date_sk = d_date_sk AND d_year BETWEEN 1999 AND 2001) x)
      |SELECT channel, i_brand_id, i_class_id, i_category_id,
      |       round(CAST(sum(sales) AS DOUBLE), 2) AS sales_,
      |       CAST(sum(number_sales) AS BIGINT) AS number_sales_
      |FROM (SELECT 'store' AS channel, i_brand_id, i_class_id, i_category_id,
      |             sum(ss_quantity * ss_list_price) AS sales,
      |             count(*) AS number_sales
      |      FROM store_sales, item, date_dim
      |      WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
      |        AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
      |        AND d_year = 2001 AND d_moy = 11
      |      GROUP BY i_brand_id, i_class_id, i_category_id
      |      HAVING sum(ss_quantity * ss_list_price) >
      |             (SELECT average_sales FROM avg_sales)
      |      UNION ALL
      |      SELECT 'catalog', i_brand_id, i_class_id, i_category_id,
      |             sum(cs_quantity * cs_list_price), count(*)
      |      FROM catalog_sales, item, date_dim
      |      WHERE cs_item_sk IN (SELECT ss_item_sk FROM cross_items)
      |        AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
      |        AND d_year = 2001 AND d_moy = 11
      |      GROUP BY i_brand_id, i_class_id, i_category_id
      |      HAVING sum(cs_quantity * cs_list_price) >
      |             (SELECT average_sales FROM avg_sales)
      |      UNION ALL
      |      SELECT 'web', i_brand_id, i_class_id, i_category_id,
      |             sum(ws_quantity * ws_list_price), count(*)
      |      FROM web_sales, item, date_dim
      |      WHERE ws_item_sk IN (SELECT ss_item_sk FROM cross_items)
      |        AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
      |        AND d_year = 2001 AND d_moy = 11
      |      GROUP BY i_brand_id, i_class_id, i_category_id
      |      HAVING sum(ws_quantity * ws_list_price) >
      |             (SELECT average_sales FROM avg_sales)) y
      |GROUP BY ROLLUP(channel, i_brand_id, i_class_id, i_category_id)
      |ORDER BY channel NULLS FIRST, i_brand_id NULLS FIRST,
      |         i_class_id NULLS FIRST, i_category_id NULLS FIRST,
      |         sales_, number_sales_
      |LIMIT 100""".stripMargin,

    "q23" -> """
      |WITH frequent_ss_items AS (
      |  SELECT substr(i_item_desc, 1, 30) AS itemdesc, i_item_sk AS item_sk,
      |         d_date AS solddate, count(*) AS cnt
      |  FROM store_sales, date_dim, item
      |  WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
      |    AND d_year IN (2000, 2001, 2002)
      |  GROUP BY substr(i_item_desc, 1, 30), i_item_sk, d_date
      |  HAVING count(*) > 1),
      |max_store_sales AS (
      |  SELECT max(csales) AS tpcds_cmax
      |  FROM (SELECT c_customer_sk,
      |               CAST(round(CAST(sum(ss_quantity * ss_sales_price) * 100
      |                               AS DOUBLE)) AS BIGINT) AS csales
      |        FROM store_sales, customer, date_dim
      |        WHERE ss_customer_sk = c_customer_sk AND ss_sold_date_sk = d_date_sk
      |          AND d_year IN (2000, 2001, 2002)
      |        GROUP BY c_customer_sk) t),
      |best_ss_customer AS (
      |  SELECT c_customer_sk,
      |         CAST(round(CAST(sum(ss_quantity * ss_sales_price) * 100
      |                         AS DOUBLE)) AS BIGINT) AS ssales
      |  FROM store_sales, customer
      |  WHERE ss_customer_sk = c_customer_sk
      |  GROUP BY c_customer_sk
      |  HAVING CAST(round(CAST(sum(ss_quantity * ss_sales_price) * 100
      |                         AS DOUBLE)) AS BIGINT)
      |       > 0.5 * (SELECT tpcds_cmax FROM max_store_sales))
      |SELECT round(CAST(sum(sales) AS DOUBLE), 2) AS total_sales
      |FROM (SELECT cs_quantity * cs_list_price AS sales
      |      FROM catalog_sales, date_dim
      |      WHERE d_year = 2000 AND d_moy = 2 AND cs_sold_date_sk = d_date_sk
      |        AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
      |        AND cs_bill_customer_sk IN (SELECT c_customer_sk FROM best_ss_customer)
      |      UNION ALL
      |      SELECT ws_quantity * ws_list_price AS sales
      |      FROM web_sales, date_dim
      |      WHERE d_year = 2000 AND d_moy = 2 AND ws_sold_date_sk = d_date_sk
      |        AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
      |        AND ws_bill_customer_sk IN (SELECT c_customer_sk FROM best_ss_customer)) x
      |LIMIT 100""".stripMargin,

    "q44" -> """
      |SELECT asceding.rnk, i1.i_product_name AS best_performing,
      |       i2.i_product_name AS worst_performing
      |FROM (SELECT * FROM (
      |        SELECT item_sk, CAST(rank() OVER (ORDER BY rank_col ASC) AS BIGINT) AS rnk
      |        FROM (SELECT ss_item_sk AS item_sk,
      |                     CAST(round(CAST(sum(ss_net_profit) * 100 AS DOUBLE))
      |                          AS BIGINT) / CAST(count(ss_net_profit) AS DOUBLE)
      |                       AS rank_col
      |              FROM store_sales ss1
      |              WHERE ss_store_sk = 4
      |              GROUP BY ss_item_sk
      |              HAVING CAST(round(CAST(sum(ss_net_profit) * 100 AS DOUBLE))
      |                          AS BIGINT) / CAST(count(ss_net_profit) AS DOUBLE)
      |                   > 0.9 * (SELECT CAST(round(CAST(sum(ss_net_profit) * 100
      |                                               AS DOUBLE)) AS BIGINT) /
      |                                   CAST(count(ss_net_profit) AS DOUBLE)
      |                                     AS rank_col
      |                            FROM store_sales
      |                            WHERE ss_store_sk = 4 AND ss_addr_sk IS NULL
      |                            GROUP BY ss_store_sk)) v1) v11
      |      WHERE rnk < 11) asceding,
      |     (SELECT * FROM (
      |        SELECT item_sk, CAST(rank() OVER (ORDER BY rank_col DESC) AS BIGINT) AS rnk
      |        FROM (SELECT ss_item_sk AS item_sk,
      |                     CAST(round(CAST(sum(ss_net_profit) * 100 AS DOUBLE))
      |                          AS BIGINT) / CAST(count(ss_net_profit) AS DOUBLE)
      |                       AS rank_col
      |              FROM store_sales ss1
      |              WHERE ss_store_sk = 4
      |              GROUP BY ss_item_sk
      |              HAVING CAST(round(CAST(sum(ss_net_profit) * 100 AS DOUBLE))
      |                          AS BIGINT) / CAST(count(ss_net_profit) AS DOUBLE)
      |                   > 0.9 * (SELECT CAST(round(CAST(sum(ss_net_profit) * 100
      |                                               AS DOUBLE)) AS BIGINT) /
      |                                   CAST(count(ss_net_profit) AS DOUBLE)
      |                                     AS rank_col
      |                            FROM store_sales
      |                            WHERE ss_store_sk = 4 AND ss_addr_sk IS NULL
      |                            GROUP BY ss_store_sk)) v2) v21
      |      WHERE rnk < 11) descending,
      |     item i1, item i2
      |WHERE asceding.rnk = descending.rnk
      |  AND i1.i_item_sk = asceding.item_sk
      |  AND i2.i_item_sk = descending.item_sk
      |ORDER BY asceding.rnk, best_performing, worst_performing
      |LIMIT 100""".stripMargin,

    "q54" -> """
      |WITH my_customers AS (
      |  SELECT DISTINCT c_customer_sk, c_current_addr_sk
      |  FROM (SELECT cs_sold_date_sk AS sold_date_sk,
      |               cs_bill_customer_sk AS customer_sk,
      |               cs_item_sk AS item_sk
      |        FROM catalog_sales
      |        UNION ALL
      |        SELECT ws_sold_date_sk, ws_bill_customer_sk, ws_item_sk
      |        FROM web_sales) cs_or_ws_sales, item, customer, date_dim
      |  WHERE sold_date_sk = d_date_sk AND item_sk = i_item_sk
      |    AND i_category = 'Women' AND i_class = 'class01'
      |    AND c_customer_sk = cs_or_ws_sales.customer_sk
      |    AND d_moy = 12 AND d_year = 1998),
      |my_revenue AS (
      |  SELECT c_customer_sk,
      |         CAST(round(CAST(sum(ss_ext_sales_price) * 100 AS DOUBLE)) AS BIGINT)
      |           AS revenue_cents
      |  FROM my_customers, store_sales, customer_address, store, date_dim
      |  WHERE c_current_addr_sk = ca_address_sk
      |    AND ca_county = s_county AND ca_state = s_state
      |    AND ss_customer_sk = c_customer_sk
      |    AND ss_sold_date_sk = d_date_sk
      |    AND d_month_seq BETWEEN (SELECT DISTINCT d_month_seq + 1 FROM date_dim
      |                             WHERE d_year = 1998 AND d_moy = 12)
      |                        AND (SELECT DISTINCT d_month_seq + 3 FROM date_dim
      |                             WHERE d_year = 1998 AND d_moy = 12)
      |  GROUP BY c_customer_sk),
      |segments AS (
      |  SELECT CAST(floor(revenue_cents / 5000.0) AS INT) AS segment
      |  FROM my_revenue)
      |SELECT segment, CAST(count(*) AS BIGINT) AS num_customers,
      |       segment * 50 AS segment_base
      |FROM segments
      |GROUP BY segment
      |ORDER BY segment, num_customers
      |LIMIT 100""".stripMargin,

    "q58" -> """
      |WITH ss_items AS (
      |  SELECT i_item_id AS item_id,
      |         CAST(round(CAST(sum(ss_ext_sales_price) * 100 AS DOUBLE)) AS BIGINT)
      |           AS ss_item_rev
      |  FROM store_sales, item, date_dim
      |  WHERE ss_item_sk = i_item_sk
      |    AND d_date IN (SELECT d_date FROM date_dim
      |                   WHERE d_week_seq = (SELECT d_week_seq FROM date_dim
      |                                       WHERE d_date = CAST('2000-01-03' AS DATE)))
      |    AND ss_sold_date_sk = d_date_sk
      |  GROUP BY i_item_id),
      |cs_items AS (
      |  SELECT i_item_id AS item_id,
      |         CAST(round(CAST(sum(cs_ext_sales_price) * 100 AS DOUBLE)) AS BIGINT)
      |           AS cs_item_rev
      |  FROM catalog_sales, item, date_dim
      |  WHERE cs_item_sk = i_item_sk
      |    AND d_date IN (SELECT d_date FROM date_dim
      |                   WHERE d_week_seq = (SELECT d_week_seq FROM date_dim
      |                                       WHERE d_date = CAST('2000-01-03' AS DATE)))
      |    AND cs_sold_date_sk = d_date_sk
      |  GROUP BY i_item_id),
      |ws_items AS (
      |  SELECT i_item_id AS item_id,
      |         CAST(round(CAST(sum(ws_ext_sales_price) * 100 AS DOUBLE)) AS BIGINT)
      |           AS ws_item_rev
      |  FROM web_sales, item, date_dim
      |  WHERE ws_item_sk = i_item_sk
      |    AND d_date IN (SELECT d_date FROM date_dim
      |                   WHERE d_week_seq = (SELECT d_week_seq FROM date_dim
      |                                       WHERE d_date = CAST('2000-01-03' AS DATE)))
      |    AND ws_sold_date_sk = d_date_sk
      |  GROUP BY i_item_id)
      |SELECT ss_items.item_id,
      |       CAST(ss_item_rev AS DOUBLE) / 100 AS ss_item_rev,
      |       round(CAST(ss_item_rev AS DOUBLE) /
      |             ((ss_item_rev + cs_item_rev + ws_item_rev) / 3.0) * 100, 4) AS ss_dev,
      |       CAST(cs_item_rev AS DOUBLE) / 100 AS cs_item_rev,
      |       round(CAST(cs_item_rev AS DOUBLE) /
      |             ((ss_item_rev + cs_item_rev + ws_item_rev) / 3.0) * 100, 4) AS cs_dev,
      |       CAST(ws_item_rev AS DOUBLE) / 100 AS ws_item_rev,
      |       round(CAST(ws_item_rev AS DOUBLE) /
      |             ((ss_item_rev + cs_item_rev + ws_item_rev) / 3.0) * 100, 4) AS ws_dev,
      |       round(CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 300.0, 4) AS average
      |FROM ss_items, cs_items, ws_items
      |WHERE ss_items.item_id = cs_items.item_id
      |  AND ss_items.item_id = ws_items.item_id
      |  AND ss_item_rev BETWEEN 0.9 * cs_item_rev AND 1.1 * cs_item_rev
      |  AND ss_item_rev BETWEEN 0.9 * ws_item_rev AND 1.1 * ws_item_rev
      |  AND cs_item_rev BETWEEN 0.9 * ss_item_rev AND 1.1 * ss_item_rev
      |  AND cs_item_rev BETWEEN 0.9 * ws_item_rev AND 1.1 * ws_item_rev
      |  AND ws_item_rev BETWEEN 0.9 * ss_item_rev AND 1.1 * ss_item_rev
      |  AND ws_item_rev BETWEEN 0.9 * cs_item_rev AND 1.1 * cs_item_rev
      |ORDER BY ss_items.item_id, ss_item_rev
      |LIMIT 100""".stripMargin)
}
