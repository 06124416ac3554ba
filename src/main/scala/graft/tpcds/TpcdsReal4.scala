package graft.tpcds

/** Real-TPC-DS batch 4 (conventions: TpcdsReal scaladoc; `*_cents` BIGINT
  * sums wherever a window/ratio consumes an aggregate — see batch 2). */
object TpcdsReal4 {

  private val cents =
    (c: String) => s"CAST(round(CAST(sum($c) * 100 AS DOUBLE)) AS BIGINT)"

  val texts: Map[String, String] = Map(

    "q5" -> """
      |WITH ssr AS (
      |  SELECT s_store_id,
      |         sum(sales_price) AS sales, sum(profit) AS profit,
      |         sum(return_amt) AS returns_, sum(net_loss) AS profit_loss
      |  FROM (SELECT ss_store_sk AS store_sk, ss_sold_date_sk AS date_sk,
      |               ss_ext_sales_price AS sales_price, ss_net_profit AS profit,
      |               CAST(0 AS DECIMAL(7,2)) AS return_amt,
      |               CAST(0 AS DECIMAL(7,2)) AS net_loss
      |        FROM store_sales
      |        UNION ALL
      |        SELECT sr_store_sk, sr_returned_date_sk,
      |               CAST(0 AS DECIMAL(7,2)), CAST(0 AS DECIMAL(7,2)),
      |               sr_return_amt, sr_net_loss
      |        FROM store_returns) salesreturns, date_dim, store
      |  WHERE date_sk = d_date_sk
      |    AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-06' AS DATE)
      |    AND store_sk = s_store_sk
      |  GROUP BY s_store_id),
      |csr AS (
      |  SELECT cp_catalog_page_id,
      |         sum(sales_price) AS sales, sum(profit) AS profit,
      |         sum(return_amt) AS returns_, sum(net_loss) AS profit_loss
      |  FROM (SELECT cs_catalog_page_sk AS page_sk, cs_sold_date_sk AS date_sk,
      |               cs_ext_sales_price AS sales_price, cs_net_profit AS profit,
      |               CAST(0 AS DECIMAL(7,2)) AS return_amt,
      |               CAST(0 AS DECIMAL(7,2)) AS net_loss
      |        FROM catalog_sales
      |        UNION ALL
      |        SELECT cr_catalog_page_sk, cr_returned_date_sk,
      |               CAST(0 AS DECIMAL(7,2)), CAST(0 AS DECIMAL(7,2)),
      |               cr_return_amount, cr_net_loss
      |        FROM catalog_returns) salesreturns, date_dim, catalog_page
      |  WHERE date_sk = d_date_sk
      |    AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-06' AS DATE)
      |    AND page_sk = cp_catalog_page_sk
      |  GROUP BY cp_catalog_page_id),
      |wsr AS (
      |  SELECT web_site_id,
      |         sum(sales_price) AS sales, sum(profit) AS profit,
      |         sum(return_amt) AS returns_, sum(net_loss) AS profit_loss
      |  FROM (SELECT ws_web_site_sk AS wsr_web_site_sk,
      |               ws_sold_date_sk AS date_sk,
      |               ws_ext_sales_price AS sales_price, ws_net_profit AS profit,
      |               CAST(0 AS DECIMAL(7,2)) AS return_amt,
      |               CAST(0 AS DECIMAL(7,2)) AS net_loss
      |        FROM web_sales
      |        UNION ALL
      |        SELECT ws_web_site_sk, wr_returned_date_sk,
      |               CAST(0 AS DECIMAL(7,2)), CAST(0 AS DECIMAL(7,2)),
      |               wr_return_amt, wr_net_loss
      |        FROM web_returns LEFT OUTER JOIN web_sales
      |          ON (wr_item_sk = ws_item_sk
      |              AND wr_order_number = ws_order_number)) salesreturns,
      |       date_dim, web_site
      |  WHERE date_sk = d_date_sk
      |    AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-06' AS DATE)
      |    AND wsr_web_site_sk = web_site_sk
      |  GROUP BY web_site_id)
      |SELECT channel, id,
      |       round(CAST(sum(sales) AS DOUBLE), 2) AS sales,
      |       round(CAST(sum(returns_) AS DOUBLE), 2) AS returns_,
      |       round(CAST(sum(profit) AS DOUBLE), 2) AS profit
      |FROM (SELECT 'store channel' AS channel, 'store' || s_store_id AS id,
      |             sales, returns_, profit - profit_loss AS profit FROM ssr
      |      UNION ALL
      |      SELECT 'catalog channel', 'catalog_page' || cp_catalog_page_id,
      |             sales, returns_, profit - profit_loss FROM csr
      |      UNION ALL
      |      SELECT 'web channel', 'web_site' || web_site_id,
      |             sales, returns_, profit - profit_loss FROM wsr) x
      |GROUP BY ROLLUP(channel, id)
      |ORDER BY channel NULLS FIRST, id NULLS FIRST, sales, returns_, profit
      |LIMIT 100""".stripMargin,

    "q10" -> """
      |SELECT cd_gender, cd_marital_status, cd_education_status,
      |       CAST(count(*) AS BIGINT) AS cnt1,
      |       cd_purchase_estimate, CAST(count(*) AS BIGINT) AS cnt2,
      |       cd_credit_rating, CAST(count(*) AS BIGINT) AS cnt3,
      |       cd_dep_count, CAST(count(*) AS BIGINT) AS cnt4,
      |       cd_dep_employed_count, CAST(count(*) AS BIGINT) AS cnt5,
      |       cd_dep_college_count, CAST(count(*) AS BIGINT) AS cnt6
      |FROM customer c, customer_address ca, customer_demographics
      |WHERE c.c_current_addr_sk = ca.ca_address_sk
      |  AND ca_county IN ('Williamson County', 'Walker County', 'Ziebach County',
      |                    'Luce County', 'Furnas County')
      |  AND cd_demo_sk = c.c_current_cdemo_sk
      |  AND EXISTS (SELECT * FROM store_sales, date_dim
      |              WHERE c.c_customer_sk = ss_customer_sk
      |                AND ss_sold_date_sk = d_date_sk
      |                AND d_year = 2002 AND d_moy BETWEEN 1 AND 4)
      |  AND (EXISTS (SELECT * FROM web_sales, date_dim
      |               WHERE c.c_customer_sk = ws_bill_customer_sk
      |                 AND ws_sold_date_sk = d_date_sk
      |                 AND d_year = 2002 AND d_moy BETWEEN 1 AND 4)
      |       OR EXISTS (SELECT * FROM catalog_sales, date_dim
      |                  WHERE c.c_customer_sk = cs_ship_customer_sk
      |                    AND cs_sold_date_sk = d_date_sk
      |                    AND d_year = 2002 AND d_moy BETWEEN 1 AND 4))
      |GROUP BY cd_gender, cd_marital_status, cd_education_status,
      |         cd_purchase_estimate, cd_credit_rating, cd_dep_count,
      |         cd_dep_employed_count, cd_dep_college_count
      |ORDER BY cd_gender, cd_marital_status, cd_education_status,
      |         cd_purchase_estimate, cd_credit_rating, cd_dep_count,
      |         cd_dep_employed_count, cd_dep_college_count
      |LIMIT 100""".stripMargin,

    "q49" -> """
      |SELECT channel, item, round(return_ratio, 6) AS return_ratio,
      |       return_rank, currency_rank
      |FROM (
      |  SELECT 'web' AS channel, web.item, web.return_ratio,
      |         web.return_rank, web.currency_rank
      |  FROM (SELECT item, return_ratio, currency_ratio,
      |               CAST(rank() OVER (ORDER BY return_ratio) AS BIGINT) AS return_rank,
      |               CAST(rank() OVER (ORDER BY currency_ratio) AS BIGINT) AS currency_rank
      |        FROM (SELECT ws.ws_item_sk AS item,
      |                     CAST(sum(coalesce(wr.wr_return_quantity, 0)) AS DOUBLE) /
      |                       CAST(sum(coalesce(ws.ws_quantity, 0)) AS DOUBLE) AS return_ratio,
      |                     CAST(sum(coalesce(wr.wr_return_amt, 0)) AS DOUBLE) /
      |                       CAST(sum(coalesce(ws.ws_net_paid, 0)) AS DOUBLE) AS currency_ratio
      |              FROM web_sales ws LEFT OUTER JOIN web_returns wr
      |                ON (ws.ws_order_number = wr.wr_order_number
      |                    AND ws.ws_item_sk = wr.wr_item_sk), date_dim
      |              WHERE wr.wr_return_amt > 100
      |                AND ws.ws_net_profit > 1 AND ws.ws_net_paid > 0
      |                AND ws.ws_quantity > 0 AND ws_sold_date_sk = d_date_sk
      |                AND d_year = 2001 AND d_moy = 12
      |              GROUP BY ws.ws_item_sk) in_web) web
      |  WHERE web.return_rank <= 10 OR web.currency_rank <= 10
      |  UNION ALL
      |  SELECT 'catalog' AS channel, catalog.item, catalog.return_ratio,
      |         catalog.return_rank, catalog.currency_rank
      |  FROM (SELECT item, return_ratio, currency_ratio,
      |               CAST(rank() OVER (ORDER BY return_ratio) AS BIGINT) AS return_rank,
      |               CAST(rank() OVER (ORDER BY currency_ratio) AS BIGINT) AS currency_rank
      |        FROM (SELECT cs.cs_item_sk AS item,
      |                     CAST(sum(coalesce(cr.cr_return_quantity, 0)) AS DOUBLE) /
      |                       CAST(sum(coalesce(cs.cs_quantity, 0)) AS DOUBLE) AS return_ratio,
      |                     CAST(sum(coalesce(cr.cr_return_amount, 0)) AS DOUBLE) /
      |                       CAST(sum(coalesce(cs.cs_net_paid, 0)) AS DOUBLE) AS currency_ratio
      |              FROM catalog_sales cs LEFT OUTER JOIN catalog_returns cr
      |                ON (cs.cs_order_number = cr.cr_order_number
      |                    AND cs.cs_item_sk = cr.cr_item_sk), date_dim
      |              WHERE cr.cr_return_amount > 100
      |                AND cs.cs_net_profit > 1 AND cs.cs_net_paid > 0
      |                AND cs.cs_quantity > 0 AND cs_sold_date_sk = d_date_sk
      |                AND d_year = 2001 AND d_moy = 12
      |              GROUP BY cs.cs_item_sk) in_cat) catalog
      |  WHERE catalog.return_rank <= 10 OR catalog.currency_rank <= 10
      |  UNION ALL
      |  SELECT 'store' AS channel, store.item, store.return_ratio,
      |         store.return_rank, store.currency_rank
      |  FROM (SELECT item, return_ratio, currency_ratio,
      |               CAST(rank() OVER (ORDER BY return_ratio) AS BIGINT) AS return_rank,
      |               CAST(rank() OVER (ORDER BY currency_ratio) AS BIGINT) AS currency_rank
      |        FROM (SELECT sts.ss_item_sk AS item,
      |                     CAST(sum(coalesce(sr.sr_return_quantity, 0)) AS DOUBLE) /
      |                       CAST(sum(coalesce(sts.ss_quantity, 0)) AS DOUBLE) AS return_ratio,
      |                     CAST(sum(coalesce(sr.sr_return_amt, 0)) AS DOUBLE) /
      |                       CAST(sum(coalesce(sts.ss_net_paid, 0)) AS DOUBLE) AS currency_ratio
      |              FROM store_sales sts LEFT OUTER JOIN store_returns sr
      |                ON (sts.ss_ticket_number = sr.sr_ticket_number
      |                    AND sts.ss_item_sk = sr.sr_item_sk), date_dim
      |              WHERE sr.sr_return_amt > 100
      |                AND sts.ss_net_profit > 1 AND sts.ss_net_paid > 0
      |                AND sts.ss_quantity > 0 AND ss_sold_date_sk = d_date_sk
      |                AND d_year = 2001 AND d_moy = 12
      |              GROUP BY sts.ss_item_sk) in_store) store
      |  WHERE store.return_rank <= 10 OR store.currency_rank <= 10) tmp
      |ORDER BY channel, return_rank, currency_rank, item, return_ratio
      |LIMIT 100""".stripMargin,

    "q57" -> """
      |WITH v1 AS (
      |  SELECT i_category, i_brand, cc_name, d_year, d_moy,
      |         CAST(round(CAST(sum(cs_sales_price) * 100 AS DOUBLE)) AS BIGINT) AS sum_cents,
      |         avg(CAST(round(CAST(sum(cs_sales_price) * 100 AS DOUBLE)) AS BIGINT)) OVER
      |           (PARTITION BY i_category, i_brand, cc_name, d_year) AS avg_cents,
      |         rank() OVER
      |           (PARTITION BY i_category, i_brand, cc_name
      |            ORDER BY d_year, d_moy) AS rn
      |  FROM item, catalog_sales, date_dim, call_center
      |  WHERE cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
      |    AND cc_call_center_sk = cs_call_center_sk
      |    AND (d_year = 2000 OR (d_year = 1999 AND d_moy = 12)
      |         OR (d_year = 2001 AND d_moy = 1))
      |  GROUP BY i_category, i_brand, cc_name, d_year, d_moy),
      |v2 AS (
      |  SELECT v1.i_category, v1.i_brand, v1.cc_name, v1.d_year, v1.d_moy,
      |         v1.avg_cents, v1.sum_cents,
      |         v1_lag.sum_cents AS psum_cents, v1_lead.sum_cents AS nsum_cents
      |  FROM v1, v1 v1_lag, v1 v1_lead
      |  WHERE v1.i_category = v1_lag.i_category
      |    AND v1.i_category = v1_lead.i_category
      |    AND v1.i_brand = v1_lag.i_brand AND v1.i_brand = v1_lead.i_brand
      |    AND v1.cc_name = v1_lag.cc_name AND v1.cc_name = v1_lead.cc_name
      |    AND v1.rn = v1_lag.rn + 1 AND v1.rn = v1_lead.rn - 1)
      |SELECT i_category, i_brand, cc_name, d_year, d_moy,
      |       round(avg_cents) / 100 AS avg_monthly_sales,
      |       CAST(sum_cents AS DOUBLE) / 100 AS sum_sales,
      |       CAST(psum_cents AS DOUBLE) / 100 AS psum,
      |       CAST(nsum_cents AS DOUBLE) / 100 AS nsum
      |FROM v2
      |WHERE d_year = 2000 AND avg_cents > 0
      |  AND CASE WHEN avg_cents > 0
      |           THEN abs(sum_cents - avg_cents) / avg_cents
      |           ELSE NULL END > 0.1
      |ORDER BY sum_cents - avg_cents, i_category, i_brand, cc_name,
      |         d_year, d_moy, sum_cents, psum_cents, nsum_cents
      |LIMIT 100""".stripMargin,

    "q63" -> """
      |SELECT manager_id, CAST(sum_cents AS DOUBLE) / 100 AS sum_sales,
      |       round(avg_cents) / 100 AS avg_monthly_sales
      |FROM (SELECT i_manager_id AS manager_id,
      |             CAST(round(CAST(sum(ss_sales_price) * 100 AS DOUBLE)) AS BIGINT) AS sum_cents,
      |             avg(CAST(round(CAST(sum(ss_sales_price) * 100 AS DOUBLE)) AS BIGINT)) OVER
      |               (PARTITION BY i_manager_id) AS avg_cents
      |      FROM item, store_sales, date_dim, store
      |      WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
      |        AND ss_store_sk = s_store_sk
      |        AND d_month_seq IN (1200, 1201, 1202, 1203, 1204, 1205, 1206,
      |                            1207, 1208, 1209, 1210, 1211)
      |        AND ((i_category IN ('Books', 'Children', 'Electronics')
      |              AND i_class IN ('class01', 'class02', 'class03'))
      |             OR (i_category IN ('Women', 'Music', 'Men')
      |              AND i_class IN ('class04', 'class05', 'class06')))
      |      GROUP BY i_manager_id, d_moy) tmp1
      |WHERE CASE WHEN avg_cents > 0
      |           THEN abs(sum_cents - avg_cents) / avg_cents
      |           ELSE NULL END > 0.1
      |ORDER BY manager_id, avg_cents, sum_cents
      |LIMIT 100""".stripMargin,

    "q71" -> """
      |SELECT i_brand_id AS brand_id, i_brand AS brand, t_hour, t_minute,
      |       round(CAST(sum(ext_price) AS DOUBLE), 2) AS ext_price
      |FROM item,
      |     (SELECT ws_ext_sales_price AS ext_price,
      |             ws_sold_date_sk AS sold_date_sk, ws_item_sk AS sold_item_sk,
      |             ws_sold_time_sk AS time_sk
      |      FROM web_sales, date_dim
      |      WHERE d_date_sk = ws_sold_date_sk AND d_moy = 11 AND d_year = 1999
      |      UNION ALL
      |      SELECT cs_ext_sales_price, cs_sold_date_sk, cs_item_sk,
      |             cs_sold_time_sk
      |      FROM catalog_sales, date_dim
      |      WHERE d_date_sk = cs_sold_date_sk AND d_moy = 11 AND d_year = 1999
      |      UNION ALL
      |      SELECT ss_ext_sales_price, ss_sold_date_sk, ss_item_sk,
      |             ss_sold_time_sk
      |      FROM store_sales, date_dim
      |      WHERE d_date_sk = ss_sold_date_sk AND d_moy = 11 AND d_year = 1999) tmp,
      |     time_dim
      |WHERE sold_item_sk = i_item_sk AND i_manager_id = 1
      |  AND time_sk = t_time_sk
      |  AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
      |GROUP BY i_brand, i_brand_id, t_hour, t_minute
      |ORDER BY ext_price DESC, brand_id, t_hour, t_minute""".stripMargin,

    "q74" -> """
      |WITH year_total AS (
      |  SELECT c_customer_id AS customer_id, c_first_name AS customer_first_name,
      |         c_last_name AS customer_last_name, d_year AS year_,
      |         CAST(round(CAST(sum(ss_net_paid) * 100 AS DOUBLE)) AS BIGINT) AS year_total,
      |         's' AS sale_type
      |  FROM customer, store_sales, date_dim
      |  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
      |    AND d_year IN (1998, 1999)
      |  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
      |  UNION ALL
      |  SELECT c_customer_id, c_first_name, c_last_name, d_year,
      |         CAST(round(CAST(sum(ws_net_paid) * 100 AS DOUBLE)) AS BIGINT),
      |         'w' AS sale_type
      |  FROM customer, web_sales, date_dim
      |  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
      |    AND d_year IN (1998, 1999)
      |  GROUP BY c_customer_id, c_first_name, c_last_name, d_year)
      |SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
      |       t_s_secyear.customer_last_name
      |FROM year_total t_s_firstyear, year_total t_s_secyear,
      |     year_total t_w_firstyear, year_total t_w_secyear
      |WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
      |  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
      |  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
      |  AND t_s_firstyear.sale_type = 's' AND t_w_firstyear.sale_type = 'w'
      |  AND t_s_secyear.sale_type = 's' AND t_w_secyear.sale_type = 'w'
      |  AND t_s_firstyear.year_ = 1998 AND t_s_secyear.year_ = 1999
      |  AND t_w_firstyear.year_ = 1998 AND t_w_secyear.year_ = 1999
      |  AND t_s_firstyear.year_total > 0 AND t_w_firstyear.year_total > 0
      |  AND CASE WHEN t_w_firstyear.year_total > 0
      |           THEN CAST(t_w_secyear.year_total AS DOUBLE) / t_w_firstyear.year_total
      |           ELSE NULL END
      |    > CASE WHEN t_s_firstyear.year_total > 0
      |           THEN CAST(t_s_secyear.year_total AS DOUBLE) / t_s_firstyear.year_total
      |           ELSE NULL END
      |ORDER BY 1, 2, 3
      |LIMIT 100""".stripMargin,

    "q78" -> """
      |WITH ws AS (
      |  SELECT d_year AS ws_sold_year, ws_item_sk,
      |         ws_bill_customer_sk AS ws_customer_sk,
      |         CAST(sum(ws_quantity) AS BIGINT) AS ws_qty,
      |         CAST(round(CAST(sum(ws_wholesale_cost) * 100 AS DOUBLE)) AS BIGINT) AS ws_wc_cents,
      |         CAST(round(CAST(sum(ws_sales_price) * 100 AS DOUBLE)) AS BIGINT) AS ws_sp_cents
      |  FROM web_sales
      |  LEFT JOIN web_returns ON wr_order_number = ws_order_number
      |                       AND ws_item_sk = wr_item_sk
      |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
      |  WHERE wr_order_number IS NULL
      |  GROUP BY d_year, ws_item_sk, ws_bill_customer_sk),
      |cs AS (
      |  SELECT d_year AS cs_sold_year, cs_item_sk,
      |         cs_bill_customer_sk AS cs_customer_sk,
      |         CAST(sum(cs_quantity) AS BIGINT) AS cs_qty,
      |         CAST(round(CAST(sum(cs_wholesale_cost) * 100 AS DOUBLE)) AS BIGINT) AS cs_wc_cents,
      |         CAST(round(CAST(sum(cs_sales_price) * 100 AS DOUBLE)) AS BIGINT) AS cs_sp_cents
      |  FROM catalog_sales
      |  LEFT JOIN catalog_returns ON cr_order_number = cs_order_number
      |                           AND cs_item_sk = cr_item_sk
      |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
      |  WHERE cr_order_number IS NULL
      |  GROUP BY d_year, cs_item_sk, cs_bill_customer_sk),
      |ss AS (
      |  SELECT d_year AS ss_sold_year, ss_item_sk,
      |         ss_customer_sk,
      |         CAST(sum(ss_quantity) AS BIGINT) AS ss_qty,
      |         CAST(round(CAST(sum(ss_wholesale_cost) * 100 AS DOUBLE)) AS BIGINT) AS ss_wc_cents,
      |         CAST(round(CAST(sum(ss_sales_price) * 100 AS DOUBLE)) AS BIGINT) AS ss_sp_cents
      |  FROM store_sales
      |  LEFT JOIN store_returns ON sr_ticket_number = ss_ticket_number
      |                         AND ss_item_sk = sr_item_sk
      |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
      |  WHERE sr_ticket_number IS NULL
      |  GROUP BY d_year, ss_item_sk, ss_customer_sk)
      |SELECT ss_customer_sk,
      |       round(CAST(ss_qty AS DOUBLE) /
      |             (coalesce(ws_qty, 0) + coalesce(cs_qty, 0)), 2) AS ratio,
      |       ss_qty AS store_qty,
      |       CAST(ss_wc_cents AS DOUBLE) / 100 AS store_wholesale_cost,
      |       CAST(ss_sp_cents AS DOUBLE) / 100 AS store_sales_price,
      |       coalesce(ws_qty, 0) + coalesce(cs_qty, 0) AS other_chan_qty,
      |       CAST(coalesce(ws_wc_cents, 0) + coalesce(cs_wc_cents, 0) AS DOUBLE) / 100
      |         AS other_chan_wholesale_cost,
      |       CAST(coalesce(ws_sp_cents, 0) + coalesce(cs_sp_cents, 0) AS DOUBLE) / 100
      |         AS other_chan_sales_price
      |FROM ss
      |LEFT JOIN ws ON (ws_sold_year = ss_sold_year AND ws_item_sk = ss_item_sk
      |                 AND ws_customer_sk = ss_customer_sk)
      |LEFT JOIN cs ON (cs_sold_year = ss_sold_year AND cs_item_sk = ss_item_sk
      |                 AND cs_customer_sk = ss_customer_sk)
      |WHERE (coalesce(ws_qty, 0) > 0 OR coalesce(cs_qty, 0) > 0)
      |  AND ss_sold_year = 2000
      |ORDER BY ss_customer_sk, ss_qty DESC, ss_wc_cents DESC, ss_sp_cents DESC,
      |         other_chan_qty, other_chan_wholesale_cost, other_chan_sales_price,
      |         ratio
      |LIMIT 100""".stripMargin)
}
