package graft.tpcds

/** Real-TPC-DS batch 5 (conventions: TpcdsReal scaladoc). */
object TpcdsReal5 {

  val texts: Map[String, String] = Map(

    "q4" -> """
      |WITH year_total AS (
      |  SELECT c_customer_id AS customer_id, c_first_name AS customer_first_name,
      |         c_last_name AS customer_last_name, d_year AS dyear,
      |         CAST(round(CAST(sum((ss_ext_list_price - ss_ext_wholesale_cost
      |                              - ss_ext_discount_amt) + ss_ext_sales_price)
      |                         * 100 AS DOUBLE)) AS BIGINT) AS year_total,
      |         's' AS sale_type
      |  FROM customer, store_sales, date_dim
      |  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
      |    AND d_year IN (2001, 2002)
      |  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
      |  UNION ALL
      |  SELECT c_customer_id, c_first_name, c_last_name, d_year,
      |         CAST(round(CAST(sum((cs_ext_list_price - cs_ext_wholesale_cost
      |                              - cs_ext_discount_amt) + cs_ext_sales_price)
      |                         * 100 AS DOUBLE)) AS BIGINT),
      |         'c' AS sale_type
      |  FROM customer, catalog_sales, date_dim
      |  WHERE c_customer_sk = cs_bill_customer_sk AND cs_sold_date_sk = d_date_sk
      |    AND d_year IN (2001, 2002)
      |  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
      |  UNION ALL
      |  SELECT c_customer_id, c_first_name, c_last_name, d_year,
      |         CAST(round(CAST(sum((ws_ext_list_price - ws_ext_wholesale_cost
      |                              - ws_ext_discount_amt) + ws_ext_sales_price)
      |                         * 100 AS DOUBLE)) AS BIGINT),
      |         'w' AS sale_type
      |  FROM customer, web_sales, date_dim
      |  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
      |    AND d_year IN (2001, 2002)
      |  GROUP BY c_customer_id, c_first_name, c_last_name, d_year)
      |SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
      |       t_s_secyear.customer_last_name
      |FROM year_total t_s_firstyear, year_total t_s_secyear,
      |     year_total t_c_firstyear, year_total t_c_secyear,
      |     year_total t_w_firstyear, year_total t_w_secyear
      |WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
      |  AND t_s_firstyear.customer_id = t_c_secyear.customer_id
      |  AND t_s_firstyear.customer_id = t_c_firstyear.customer_id
      |  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
      |  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
      |  AND t_s_firstyear.sale_type = 's' AND t_c_firstyear.sale_type = 'c'
      |  AND t_w_firstyear.sale_type = 'w' AND t_s_secyear.sale_type = 's'
      |  AND t_c_secyear.sale_type = 'c' AND t_w_secyear.sale_type = 'w'
      |  AND t_s_firstyear.dyear = 2001 AND t_s_secyear.dyear = 2002
      |  AND t_c_firstyear.dyear = 2001 AND t_c_secyear.dyear = 2002
      |  AND t_w_firstyear.dyear = 2001 AND t_w_secyear.dyear = 2002
      |  AND t_s_firstyear.year_total > 0 AND t_c_firstyear.year_total > 0
      |  AND t_w_firstyear.year_total > 0
      |  AND CASE WHEN t_c_firstyear.year_total > 0
      |           THEN CAST(t_c_secyear.year_total AS DOUBLE) / t_c_firstyear.year_total
      |           ELSE NULL END
      |    > CASE WHEN t_s_firstyear.year_total > 0
      |           THEN CAST(t_s_secyear.year_total AS DOUBLE) / t_s_firstyear.year_total
      |           ELSE NULL END
      |  AND CASE WHEN t_c_firstyear.year_total > 0
      |           THEN CAST(t_c_secyear.year_total AS DOUBLE) / t_c_firstyear.year_total
      |           ELSE NULL END
      |    > CASE WHEN t_w_firstyear.year_total > 0
      |           THEN CAST(t_w_secyear.year_total AS DOUBLE) / t_w_firstyear.year_total
      |           ELSE NULL END
      |ORDER BY 1, 2, 3
      |LIMIT 100""".stripMargin,

    "q11" -> """
      |WITH year_total AS (
      |  SELECT c_customer_id AS customer_id, c_first_name AS customer_first_name,
      |         c_last_name AS customer_last_name,
      |         c_preferred_cust_flag AS customer_preferred_cust_flag,
      |         d_year AS dyear,
      |         CAST(round(CAST(sum(ss_ext_list_price - ss_ext_discount_amt)
      |                         * 100 AS DOUBLE)) AS BIGINT) AS year_total,
      |         's' AS sale_type
      |  FROM customer, store_sales, date_dim
      |  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
      |    AND d_year IN (2001, 2002)
      |  GROUP BY c_customer_id, c_first_name, c_last_name,
      |           c_preferred_cust_flag, d_year
      |  UNION ALL
      |  SELECT c_customer_id, c_first_name, c_last_name, c_preferred_cust_flag,
      |         d_year,
      |         CAST(round(CAST(sum(ws_ext_list_price - ws_ext_discount_amt)
      |                         * 100 AS DOUBLE)) AS BIGINT),
      |         'w' AS sale_type
      |  FROM customer, web_sales, date_dim
      |  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
      |    AND d_year IN (2001, 2002)
      |  GROUP BY c_customer_id, c_first_name, c_last_name,
      |           c_preferred_cust_flag, d_year)
      |SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
      |       t_s_secyear.customer_last_name,
      |       t_s_secyear.customer_preferred_cust_flag
      |FROM year_total t_s_firstyear, year_total t_s_secyear,
      |     year_total t_w_firstyear, year_total t_w_secyear
      |WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
      |  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
      |  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
      |  AND t_s_firstyear.sale_type = 's' AND t_w_firstyear.sale_type = 'w'
      |  AND t_s_secyear.sale_type = 's' AND t_w_secyear.sale_type = 'w'
      |  AND t_s_firstyear.dyear = 2001 AND t_s_secyear.dyear = 2002
      |  AND t_w_firstyear.dyear = 2001 AND t_w_secyear.dyear = 2002
      |  AND t_s_firstyear.year_total > 0 AND t_w_firstyear.year_total > 0
      |  AND CASE WHEN t_w_firstyear.year_total > 0
      |           THEN CAST(t_w_secyear.year_total AS DOUBLE) / t_w_firstyear.year_total
      |           ELSE 0.0 END
      |    > CASE WHEN t_s_firstyear.year_total > 0
      |           THEN CAST(t_s_secyear.year_total AS DOUBLE) / t_s_firstyear.year_total
      |           ELSE 0.0 END
      |ORDER BY 1, 2, 3, 4
      |LIMIT 100""".stripMargin,

    "q17" -> """
      |SELECT i_item_id, i_item_desc, s_state,
      |       CAST(count(ss_quantity) AS BIGINT) AS store_sales_quantitycount,
      |       round(avg(ss_quantity), 4) AS store_sales_quantityave,
      |       CASE WHEN count(ss_quantity) > 1
      |            THEN round(stddev_samp(ss_quantity), 4) ELSE NULL END
      |         AS store_sales_quantitystdev,
      |       CASE WHEN count(ss_quantity) > 1
      |            THEN round(stddev_samp(ss_quantity) / avg(ss_quantity), 4)
      |            ELSE NULL END AS store_sales_quantitycov,
      |       CAST(count(sr_return_quantity) AS BIGINT) AS store_returns_quantitycount,
      |       round(avg(sr_return_quantity), 4) AS store_returns_quantityave,
      |       CASE WHEN count(sr_return_quantity) > 1
      |            THEN round(stddev_samp(sr_return_quantity), 4) ELSE NULL END
      |         AS store_returns_quantitystdev,
      |       CASE WHEN count(sr_return_quantity) > 1
      |            THEN round(stddev_samp(sr_return_quantity) / avg(sr_return_quantity), 4)
      |            ELSE NULL END AS store_returns_quantitycov,
      |       CAST(count(cs_quantity) AS BIGINT) AS catalog_sales_quantitycount,
      |       round(avg(cs_quantity), 4) AS catalog_sales_quantityave,
      |       CASE WHEN count(cs_quantity) > 1
      |            THEN round(stddev_samp(cs_quantity), 4) ELSE NULL END
      |         AS catalog_sales_quantitystdev,
      |       CASE WHEN count(cs_quantity) > 1
      |            THEN round(stddev_samp(cs_quantity) / avg(cs_quantity), 4)
      |            ELSE NULL END AS catalog_sales_quantitycov
      |FROM store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2,
      |     date_dim d3, store, item
      |WHERE d1.d_quarter_name = '2001Q1' AND d1.d_date_sk = ss_sold_date_sk
      |  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
      |  AND ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
      |  AND ss_ticket_number = sr_ticket_number
      |  AND sr_returned_date_sk = d2.d_date_sk
      |  AND d2.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3')
      |  AND sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
      |  AND cs_sold_date_sk = d3.d_date_sk
      |  AND d3.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3')
      |GROUP BY i_item_id, i_item_desc, s_state
      |ORDER BY i_item_id, i_item_desc, s_state
      |LIMIT 100""".stripMargin,

    "q67" -> """
      |SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
      |       d_moy, s_store_id,
      |       CAST(sumsales_cents AS DOUBLE) / 100 AS sumsales,
      |       rk
      |FROM (SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
      |             d_moy, s_store_id, sumsales_cents,
      |             CAST(rank() OVER (PARTITION BY i_category
      |               ORDER BY sumsales_cents DESC) AS BIGINT) AS rk
      |      FROM (SELECT i_category, i_class, i_brand, i_product_name, d_year,
      |                   d_qoy, d_moy, s_store_id,
      |                   CAST(round(CAST(sum(coalesce(ss_sales_price * ss_quantity, 0))
      |                                   * 100 AS DOUBLE)) AS BIGINT) AS sumsales_cents
      |            FROM store_sales, date_dim, store, item
      |            WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
      |              AND ss_store_sk = s_store_sk
      |              AND d_month_seq BETWEEN 1200 AND 1211
      |            GROUP BY ROLLUP(i_category, i_class, i_brand, i_product_name,
      |                            d_year, d_qoy, d_moy, s_store_id)) dw1) dw2
      |WHERE rk <= 100
      |ORDER BY i_category NULLS FIRST, sumsales_cents DESC, rk, i_class NULLS FIRST,
      |         i_brand NULLS FIRST, i_product_name NULLS FIRST,
      |         d_year NULLS FIRST, d_qoy NULLS FIRST, d_moy NULLS FIRST,
      |         s_store_id NULLS FIRST
      |LIMIT 100""".stripMargin,

    "q72" -> """
      |SELECT i_item_desc, w_warehouse_name, d1.d_week_seq,
      |       CAST(sum(CASE WHEN p_promo_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS no_promo,
      |       CAST(sum(CASE WHEN p_promo_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS promo,
      |       CAST(count(*) AS BIGINT) AS total_cnt
      |FROM catalog_sales
      |JOIN inventory ON (cs_item_sk = inv_item_sk)
      |JOIN warehouse ON (w_warehouse_sk = inv_warehouse_sk)
      |JOIN item ON (i_item_sk = cs_item_sk)
      |JOIN customer_demographics ON (cs_bill_cdemo_sk = cd_demo_sk)
      |JOIN household_demographics ON (cs_bill_hdemo_sk = hd_demo_sk)
      |JOIN date_dim d1 ON (cs_sold_date_sk = d1.d_date_sk)
      |JOIN date_dim d2 ON (inv_date_sk = d2.d_date_sk)
      |JOIN date_dim d3 ON (cs_ship_date_sk = d3.d_date_sk)
      |LEFT OUTER JOIN promotion ON (cs_promo_sk = p_promo_sk)
      |LEFT OUTER JOIN catalog_returns ON (cr_item_sk = cs_item_sk
      |                                    AND cr_order_number = cs_order_number)
      |WHERE d1.d_week_seq = d2.d_week_seq
      |  AND inv_quantity_on_hand < cs_quantity
      |  AND d3.d_date_sk > d1.d_date_sk + 5
      |  AND hd_buy_potential = '>10000'
      |  AND d1.d_year = 1999
      |  AND cd_marital_status = 'D'
      |GROUP BY i_item_desc, w_warehouse_name, d1.d_week_seq
      |ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d1.d_week_seq,
      |         no_promo, promo
      |LIMIT 100""".stripMargin,

    "q75" -> """
      |WITH all_sales AS (
      |  SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
      |         CAST(sum(sales_cnt) AS BIGINT) AS sales_cnt,
      |         CAST(sum(sales_amt_cents) AS BIGINT) AS sales_amt_cents
      |  FROM (SELECT d_year, i_brand_id, i_class_id, i_category_id,
      |               i_manufact_id,
      |               cs_quantity - coalesce(cr_return_quantity, 0) AS sales_cnt,
      |               CAST(round(CAST((cs_ext_sales_price
      |                 - coalesce(cr_return_amount, 0)) * 100 AS DOUBLE)) AS BIGINT)
      |                 AS sales_amt_cents
      |        FROM catalog_sales
      |        JOIN item ON i_item_sk = cs_item_sk
      |        JOIN date_dim ON d_date_sk = cs_sold_date_sk
      |        LEFT JOIN catalog_returns ON (cs_order_number = cr_order_number
      |                                      AND cs_item_sk = cr_item_sk)
      |        WHERE i_category = 'Books'
      |        UNION
      |        SELECT d_year, i_brand_id, i_class_id, i_category_id,
      |               i_manufact_id,
      |               ss_quantity - coalesce(sr_return_quantity, 0) AS sales_cnt,
      |               CAST(round(CAST((ss_ext_sales_price
      |                 - coalesce(sr_return_amt, 0)) * 100 AS DOUBLE)) AS BIGINT)
      |                 AS sales_amt_cents
      |        FROM store_sales
      |        JOIN item ON i_item_sk = ss_item_sk
      |        JOIN date_dim ON d_date_sk = ss_sold_date_sk
      |        LEFT JOIN store_returns ON (ss_ticket_number = sr_ticket_number
      |                                    AND ss_item_sk = sr_item_sk)
      |        WHERE i_category = 'Books'
      |        UNION
      |        SELECT d_year, i_brand_id, i_class_id, i_category_id,
      |               i_manufact_id,
      |               ws_quantity - coalesce(wr_return_quantity, 0) AS sales_cnt,
      |               CAST(round(CAST((ws_ext_sales_price
      |                 - coalesce(wr_return_amt, 0)) * 100 AS DOUBLE)) AS BIGINT)
      |                 AS sales_amt_cents
      |        FROM web_sales
      |        JOIN item ON i_item_sk = ws_item_sk
      |        JOIN date_dim ON d_date_sk = ws_sold_date_sk
      |        LEFT JOIN web_returns ON (ws_order_number = wr_order_number
      |                                  AND ws_item_sk = wr_item_sk)
      |        WHERE i_category = 'Books') sales_detail
      |  GROUP BY d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id)
      |SELECT prev_yr.d_year AS prev_year, curr_yr.d_year AS year_,
      |       curr_yr.i_brand_id, curr_yr.i_class_id, curr_yr.i_category_id,
      |       curr_yr.i_manufact_id, prev_yr.sales_cnt AS prev_yr_cnt,
      |       curr_yr.sales_cnt AS curr_yr_cnt,
      |       curr_yr.sales_cnt - prev_yr.sales_cnt AS sales_cnt_diff,
      |       CAST(curr_yr.sales_amt_cents - prev_yr.sales_amt_cents AS DOUBLE) / 100
      |         AS sales_amt_diff
      |FROM all_sales curr_yr, all_sales prev_yr
      |WHERE curr_yr.i_brand_id = prev_yr.i_brand_id
      |  AND curr_yr.i_class_id = prev_yr.i_class_id
      |  AND curr_yr.i_category_id = prev_yr.i_category_id
      |  AND curr_yr.i_manufact_id = prev_yr.i_manufact_id
      |  AND curr_yr.d_year = 2001 AND prev_yr.d_year = 2000
      |  AND CAST(curr_yr.sales_cnt AS DOUBLE) / prev_yr.sales_cnt < 0.9
      |ORDER BY sales_cnt_diff, sales_amt_diff, curr_yr.i_brand_id,
      |         curr_yr.i_class_id, curr_yr.i_category_id, curr_yr.i_manufact_id
      |LIMIT 100""".stripMargin,

    "q77" -> """
      |WITH ss AS (
      |  SELECT s_store_sk, sum(ss_ext_sales_price) AS sales,
      |         sum(ss_net_profit) AS profit
      |  FROM store_sales, date_dim, store
      |  WHERE ss_sold_date_sk = d_date_sk
      |    AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
      |    AND ss_store_sk = s_store_sk
      |  GROUP BY s_store_sk),
      |sr AS (
      |  SELECT s_store_sk, sum(sr_return_amt) AS returns_,
      |         sum(sr_net_loss) AS profit_loss
      |  FROM store_returns, date_dim, store
      |  WHERE sr_returned_date_sk = d_date_sk
      |    AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
      |    AND sr_store_sk = s_store_sk
      |  GROUP BY s_store_sk),
      |cs AS (
      |  SELECT cs_call_center_sk, sum(cs_ext_sales_price) AS sales,
      |         sum(cs_net_profit) AS profit
      |  FROM catalog_sales, date_dim
      |  WHERE cs_sold_date_sk = d_date_sk
      |    AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
      |  GROUP BY cs_call_center_sk),
      |cr AS (
      |  SELECT cr_call_center_sk, sum(cr_return_amount) AS returns_,
      |         sum(cr_net_loss) AS profit_loss
      |  FROM catalog_returns, date_dim
      |  WHERE cr_returned_date_sk = d_date_sk
      |    AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
      |  GROUP BY cr_call_center_sk),
      |ws AS (
      |  SELECT wp_web_page_sk, sum(ws_ext_sales_price) AS sales,
      |         sum(ws_net_profit) AS profit
      |  FROM web_sales, date_dim, web_page
      |  WHERE ws_sold_date_sk = d_date_sk
      |    AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
      |    AND ws_web_page_sk = wp_web_page_sk
      |  GROUP BY wp_web_page_sk),
      |wr AS (
      |  SELECT wp_web_page_sk, sum(wr_return_amt) AS returns_,
      |         sum(wr_net_loss) AS profit_loss
      |  FROM web_returns, date_dim, web_page
      |  WHERE wr_returned_date_sk = d_date_sk
      |    AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
      |    AND wr_web_page_sk = wp_web_page_sk
      |  GROUP BY wp_web_page_sk)
      |SELECT channel, id,
      |       round(CAST(sum(sales) AS DOUBLE), 2) AS sales,
      |       round(CAST(sum(returns_) AS DOUBLE), 2) AS returns_,
      |       round(CAST(sum(profit) AS DOUBLE), 2) AS profit
      |FROM (SELECT 'store channel' AS channel, ss.s_store_sk AS id, sales,
      |             coalesce(returns_, 0) AS returns_,
      |             profit - coalesce(profit_loss, 0) AS profit
      |      FROM ss LEFT JOIN sr ON ss.s_store_sk = sr.s_store_sk
      |      UNION ALL
      |      SELECT 'catalog channel', cs_call_center_sk, sales, returns_,
      |             profit - profit_loss
      |      FROM cs, cr
      |      UNION ALL
      |      SELECT 'web channel', ws.wp_web_page_sk, sales,
      |             coalesce(returns_, 0),
      |             profit - coalesce(profit_loss, 0)
      |      FROM ws LEFT JOIN wr ON ws.wp_web_page_sk = wr.wp_web_page_sk) x
      |GROUP BY ROLLUP(channel, id)
      |ORDER BY channel NULLS FIRST, id NULLS FIRST, sales, returns_, profit
      |LIMIT 100""".stripMargin,

    "q80" -> """
      |WITH ssr AS (
      |  SELECT s_store_id AS store_id,
      |         sum(ss_ext_sales_price) AS sales,
      |         sum(coalesce(sr_return_amt, 0)) AS returns_,
      |         sum(ss_net_profit - coalesce(sr_net_loss, 0)) AS profit
      |  FROM store_sales
      |  LEFT OUTER JOIN store_returns ON (ss_item_sk = sr_item_sk
      |                                    AND ss_ticket_number = sr_ticket_number),
      |       date_dim, store, item, promotion
      |  WHERE ss_sold_date_sk = d_date_sk
      |    AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
      |    AND ss_store_sk = s_store_sk AND ss_item_sk = i_item_sk
      |    AND i_current_price > 50 AND ss_promo_sk = p_promo_sk
      |    AND p_channel_tv = 'N'
      |  GROUP BY s_store_id),
      |csr AS (
      |  SELECT cp_catalog_page_id AS catalog_page_id,
      |         sum(cs_ext_sales_price) AS sales,
      |         sum(coalesce(cr_return_amount, 0)) AS returns_,
      |         sum(cs_net_profit - coalesce(cr_net_loss, 0)) AS profit
      |  FROM catalog_sales
      |  LEFT OUTER JOIN catalog_returns ON (cs_item_sk = cr_item_sk
      |                                      AND cs_order_number = cr_order_number),
      |       date_dim, catalog_page, item, promotion
      |  WHERE cs_sold_date_sk = d_date_sk
      |    AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
      |    AND cs_catalog_page_sk = cp_catalog_page_sk AND cs_item_sk = i_item_sk
      |    AND i_current_price > 50 AND cs_promo_sk = p_promo_sk
      |    AND p_channel_tv = 'N'
      |  GROUP BY cp_catalog_page_id),
      |wsr AS (
      |  SELECT web_site_id,
      |         sum(ws_ext_sales_price) AS sales,
      |         sum(coalesce(wr_return_amt, 0)) AS returns_,
      |         sum(ws_net_profit - coalesce(wr_net_loss, 0)) AS profit
      |  FROM web_sales
      |  LEFT OUTER JOIN web_returns ON (ws_item_sk = wr_item_sk
      |                                  AND ws_order_number = wr_order_number),
      |       date_dim, web_site, item, promotion
      |  WHERE ws_sold_date_sk = d_date_sk
      |    AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-22' AS DATE)
      |    AND ws_web_site_sk = web_site_sk AND ws_item_sk = i_item_sk
      |    AND i_current_price > 50 AND ws_promo_sk = p_promo_sk
      |    AND p_channel_tv = 'N'
      |  GROUP BY web_site_id)
      |SELECT channel, id,
      |       round(CAST(sum(sales) AS DOUBLE), 2) AS sales,
      |       round(CAST(sum(returns_) AS DOUBLE), 2) AS returns_,
      |       round(CAST(sum(profit) AS DOUBLE), 2) AS profit
      |FROM (SELECT 'store channel' AS channel, 'store' || store_id AS id,
      |             sales, returns_, profit FROM ssr
      |      UNION ALL
      |      SELECT 'catalog channel', 'catalog_page' || catalog_page_id,
      |             sales, returns_, profit FROM csr
      |      UNION ALL
      |      SELECT 'web channel', 'web_site' || web_site_id,
      |             sales, returns_, profit FROM wsr) x
      |GROUP BY ROLLUP(channel, id)
      |ORDER BY channel NULLS FIRST, id NULLS FIRST, sales, returns_, profit
      |LIMIT 100""".stripMargin)
}
