package graft.tpcds

/** Real-TPC-DS batch 7 — the final four (q8, q24, q39, q64), unlocked by
  * generator v7 (store-aligned zip pool, cyclic market ids, two inventory
  * snapshots per month). Conventions: TpcdsReal scaladoc. */
object TpcdsReal7 {

  val texts: Map[String, String] = Map(

    "q8" -> """
      |SELECT s_store_name,
      |       round(CAST(sum(ss_net_profit) AS DOUBLE), 2) AS net_profit
      |FROM store_sales, date_dim, store,
      |     (SELECT ca_zip FROM (
      |        (SELECT substr(ca_zip, 1, 5) AS ca_zip FROM customer_address
      |         WHERE substr(ca_zip, 1, 5) IN
      |           ('24128', '76232', '65084', '87816', '83926', '77556',
      |            '20548', '26231', '43848', '15126', '91137', '61265',
      |            '98294', '25782', '17920', '18426', '98235', '40081',
      |            '84093', '28577', '55565', '17183', '54601', '67897',
      |            '22752', '86284', '18376', '38607', '45200', '21756',
      |            '29741', '96765', '23932', '89360', '29839', '25989',
      |            '28898', '91068', '72550', '10390'))
      |        INTERSECT
      |        (SELECT ca_zip FROM
      |           (SELECT substr(ca_zip, 1, 5) AS ca_zip, count(*) AS cnt
      |            FROM customer_address, customer
      |            WHERE ca_address_sk = c_current_addr_sk
      |              AND c_preferred_cust_flag = 'Y'
      |            GROUP BY substr(ca_zip, 1, 5)
      |            HAVING count(*) > 10) a1)) a2) v1
      |WHERE ss_store_sk = s_store_sk AND ss_sold_date_sk = d_date_sk
      |  AND d_qoy = 2 AND d_year = 1998
      |  AND substr(s_zip, 1, 2) = substr(v1.ca_zip, 1, 2)
      |GROUP BY s_store_name
      |ORDER BY s_store_name, net_profit
      |LIMIT 100""".stripMargin,

    "q24" -> """
      |WITH ssales AS (
      |  SELECT c_last_name, c_first_name, s_store_name, ca_state, s_state,
      |         i_color, i_current_price, i_manager_id, i_units, i_size,
      |         CAST(round(CAST(sum(ss_net_paid) * 100 AS DOUBLE)) AS BIGINT)
      |           AS netpaid_cents
      |  FROM store_sales, store_returns, store, item, customer,
      |       customer_address
      |  WHERE ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
      |    AND ss_customer_sk = c_customer_sk AND ss_item_sk = i_item_sk
      |    AND ss_store_sk = s_store_sk AND c_current_addr_sk = ca_address_sk
      |    AND c_birth_country <> upper(ca_country) AND s_zip = ca_zip
      |    AND s_market_id = 8
      |  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state,
      |           i_color, i_current_price, i_manager_id, i_units, i_size)
      |SELECT c_last_name, c_first_name, s_store_name,
      |       CAST(sum(netpaid_cents) AS DOUBLE) / 100 AS paid
      |FROM ssales
      |WHERE i_color = 'blue'
      |GROUP BY c_last_name, c_first_name, s_store_name
      |HAVING sum(netpaid_cents) > (SELECT 0.05 * avg(netpaid_cents) FROM ssales)
      |ORDER BY c_last_name, c_first_name, s_store_name, paid
      |LIMIT 100""".stripMargin,

    "q39" -> """
      |WITH inv AS (
      |  SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy, stdev, mean,
      |         CASE WHEN mean = 0 THEN NULL ELSE stdev / mean END AS cov
      |  FROM (SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
      |               stddev_samp(inv_quantity_on_hand) AS stdev,
      |               avg(inv_quantity_on_hand) AS mean
      |        FROM inventory, item, warehouse, date_dim
      |        WHERE inv_item_sk = i_item_sk
      |          AND inv_warehouse_sk = w_warehouse_sk
      |          AND inv_date_sk = d_date_sk AND d_year = 2001
      |        GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy) foo
      |  WHERE CASE WHEN mean = 0 THEN 0 ELSE stdev / mean END > 1)
      |SELECT inv1.w_warehouse_sk AS wsk1, inv1.i_item_sk AS isk1,
      |       inv1.d_moy AS moy1, round(inv1.mean, 4) AS mean1,
      |       round(inv1.cov, 4) AS cov1,
      |       inv2.w_warehouse_sk AS wsk2, inv2.i_item_sk AS isk2,
      |       inv2.d_moy AS moy2, round(inv2.mean, 4) AS mean2,
      |       round(inv2.cov, 4) AS cov2
      |FROM inv inv1, inv inv2
      |WHERE inv1.i_item_sk = inv2.i_item_sk
      |  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
      |  AND inv1.d_moy = 3 AND inv2.d_moy = 4
      |ORDER BY wsk1, isk1, moy1, mean1, cov1, wsk2, isk2, moy2, mean2, cov2
      |LIMIT 100""".stripMargin,

    "q64" -> """
      |WITH cs_ui AS (
      |  SELECT cs_item_sk,
      |         sum(cs_ext_list_price) AS sale,
      |         sum(cr_refunded_cash + cr_reversed_charge + cr_store_credit)
      |           AS refund
      |  FROM catalog_sales, catalog_returns
      |  WHERE cs_item_sk = cr_item_sk AND cs_order_number = cr_order_number
      |  GROUP BY cs_item_sk
      |  HAVING sum(cs_ext_list_price) >
      |         2 * sum(cr_refunded_cash + cr_reversed_charge + cr_store_credit)),
      |cross_sales AS (
      |  SELECT i_product_name AS product_name, i_item_sk AS item_sk,
      |         s_store_name AS store_name, s_zip AS store_zip,
      |         ad1.ca_street_number AS b_street_number,
      |         ad1.ca_street_name AS b_street_name,
      |         ad1.ca_city AS b_city, ad1.ca_zip AS b_zip,
      |         ad2.ca_street_number AS c_street_number,
      |         ad2.ca_street_name AS c_street_name,
      |         ad2.ca_city AS c_city, ad2.ca_zip AS c_zip,
      |         d1.d_year AS syear, d2.d_year AS fsyear, d3.d_year AS s2year,
      |         CAST(count(*) AS BIGINT) AS cnt,
      |         CAST(round(CAST(sum(ss_wholesale_cost) * 100 AS DOUBLE)) AS BIGINT)
      |           AS s1_cents,
      |         CAST(round(CAST(sum(ss_list_price) * 100 AS DOUBLE)) AS BIGINT)
      |           AS s2_cents,
      |         CAST(round(CAST(sum(ss_coupon_amt) * 100 AS DOUBLE)) AS BIGINT)
      |           AS s3_cents
      |  FROM store_sales, store_returns, cs_ui, date_dim d1, date_dim d2,
      |       date_dim d3, store, customer, customer_demographics cd1,
      |       customer_demographics cd2, promotion, household_demographics hd1,
      |       household_demographics hd2, customer_address ad1,
      |       customer_address ad2, income_band ib1, income_band ib2, item
      |  WHERE ss_store_sk = s_store_sk AND ss_sold_date_sk = d1.d_date_sk
      |    AND ss_customer_sk = c_customer_sk AND ss_cdemo_sk = cd1.cd_demo_sk
      |    AND ss_hdemo_sk = hd1.hd_demo_sk AND ss_addr_sk = ad1.ca_address_sk
      |    AND ss_item_sk = i_item_sk AND ss_item_sk = sr_item_sk
      |    AND ss_ticket_number = sr_ticket_number
      |    AND ss_item_sk = cs_ui.cs_item_sk
      |    AND c_current_cdemo_sk = cd2.cd_demo_sk
      |    AND c_current_hdemo_sk = hd2.hd_demo_sk
      |    AND c_current_addr_sk = ad2.ca_address_sk
      |    AND c_first_sales_date_sk = d2.d_date_sk
      |    AND c_first_shipto_date_sk = d3.d_date_sk
      |    AND ss_promo_sk = p_promo_sk
      |    AND hd1.hd_income_band_sk = ib1.ib_income_band_sk
      |    AND hd2.hd_income_band_sk = ib2.ib_income_band_sk
      |    AND cd1.cd_marital_status <> cd2.cd_marital_status
      |    AND i_color IN ('red', 'blue', 'green', 'yellow', 'black', 'white')
      |    AND i_current_price BETWEEN 10 AND 90
      |  GROUP BY i_product_name, i_item_sk, s_store_name, s_zip,
      |           ad1.ca_street_number, ad1.ca_street_name, ad1.ca_city,
      |           ad1.ca_zip, ad2.ca_street_number, ad2.ca_street_name,
      |           ad2.ca_city, ad2.ca_zip, d1.d_year, d2.d_year, d3.d_year)
      |SELECT cs1.product_name, cs1.store_name, cs1.store_zip,
      |       cs1.b_street_number, cs1.b_street_name, cs1.b_city, cs1.b_zip,
      |       cs1.c_street_number, cs1.c_street_name, cs1.c_city, cs1.c_zip,
      |       cs1.syear AS syear1, cs1.cnt AS cnt1,
      |       CAST(cs1.s1_cents AS DOUBLE) / 100 AS s11,
      |       CAST(cs1.s2_cents AS DOUBLE) / 100 AS s21,
      |       CAST(cs1.s3_cents AS DOUBLE) / 100 AS s31,
      |       cs2.s1_cents, cs2.s2_cents, cs2.s3_cents,
      |       cs2.syear AS syear2, cs2.cnt AS cnt2
      |FROM cross_sales cs1, cross_sales cs2
      |WHERE cs1.item_sk = cs2.item_sk
      |  AND cs1.syear = 1999 AND cs2.syear = 2000
      |  AND cs2.cnt <= cs1.cnt
      |  AND cs1.store_name = cs2.store_name
      |  AND cs1.store_zip = cs2.store_zip
      |ORDER BY cs1.product_name, cs1.store_name, cs2.cnt,
      |         cs1.store_zip, cs1.b_street_number, cs1.b_street_name,
      |         cs1.b_city, cs1.b_zip, cs1.c_street_number, cs1.c_street_name,
      |         cs1.c_city, cs1.c_zip, syear1, cnt1, s11, s21, s31,
      |         cs2.s1_cents, cs2.s2_cents, cs2.s3_cents, syear2
      |LIMIT 100""".stripMargin,

    "q14b" -> """
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
      |SELECT this_year.channel AS ty_channel, this_year.i_brand_id AS ty_brand,
      |       this_year.i_class_id AS ty_class,
      |       this_year.i_category_id AS ty_category,
      |       round(CAST(this_year.sales AS DOUBLE), 2) AS ty_sales,
      |       CAST(this_year.number_sales AS BIGINT) AS ty_number_sales,
      |       last_year.channel AS ly_channel, last_year.i_brand_id AS ly_brand,
      |       last_year.i_class_id AS ly_class,
      |       last_year.i_category_id AS ly_category,
      |       round(CAST(last_year.sales AS DOUBLE), 2) AS ly_sales,
      |       CAST(last_year.number_sales AS BIGINT) AS ly_number_sales
      |FROM (SELECT 'store' AS channel, i_brand_id, i_class_id, i_category_id,
      |             sum(ss_quantity * ss_list_price) AS sales,
      |             count(*) AS number_sales
      |      FROM store_sales, item, date_dim
      |      WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
      |        AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
      |        AND d_week_seq = (SELECT d_week_seq FROM date_dim
      |                          WHERE d_year = 2001 AND d_moy = 12 AND d_dom = 11)
      |      GROUP BY i_brand_id, i_class_id, i_category_id
      |      HAVING sum(ss_quantity * ss_list_price) >
      |             (SELECT average_sales FROM avg_sales)) this_year,
      |     (SELECT 'store' AS channel, i_brand_id, i_class_id, i_category_id,
      |             sum(ss_quantity * ss_list_price) AS sales,
      |             count(*) AS number_sales
      |      FROM store_sales, item, date_dim
      |      WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
      |        AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
      |        AND d_week_seq = (SELECT d_week_seq FROM date_dim
      |                          WHERE d_year = 2000 AND d_moy = 12 AND d_dom = 11)
      |      GROUP BY i_brand_id, i_class_id, i_category_id
      |      HAVING sum(ss_quantity * ss_list_price) >
      |             (SELECT average_sales FROM avg_sales)) last_year
      |WHERE this_year.i_brand_id = last_year.i_brand_id
      |  AND this_year.i_class_id = last_year.i_class_id
      |  AND this_year.i_category_id = last_year.i_category_id
      |ORDER BY ty_channel, ty_brand, ty_class, ty_category, ty_sales,
      |         ty_number_sales, ly_sales, ly_number_sales
      |LIMIT 100""".stripMargin,

    "q23b" -> """
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
      |SELECT c_last_name, c_first_name,
      |       round(CAST(sum(sales) AS DOUBLE), 2) AS sales
      |FROM (SELECT c_last_name, c_first_name,
      |             cs_quantity * cs_list_price AS sales
      |      FROM catalog_sales, customer, date_dim
      |      WHERE d_year = 2000 AND d_moy = 2 AND cs_sold_date_sk = d_date_sk
      |        AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
      |        AND cs_bill_customer_sk IN (SELECT c_customer_sk FROM best_ss_customer)
      |        AND cs_bill_customer_sk = c_customer_sk
      |      UNION ALL
      |      SELECT c_last_name, c_first_name,
      |             ws_quantity * ws_list_price AS sales
      |      FROM web_sales, customer, date_dim
      |      WHERE d_year = 2000 AND d_moy = 2 AND ws_sold_date_sk = d_date_sk
      |        AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
      |        AND ws_bill_customer_sk IN (SELECT c_customer_sk FROM best_ss_customer)
      |        AND ws_bill_customer_sk = c_customer_sk) x
      |GROUP BY c_last_name, c_first_name
      |ORDER BY c_last_name, c_first_name, sales
      |LIMIT 100""".stripMargin,

    "q24b" -> """
      |WITH ssales AS (
      |  SELECT c_last_name, c_first_name, s_store_name, ca_state, s_state,
      |         i_color, i_current_price, i_manager_id, i_units, i_size,
      |         CAST(round(CAST(sum(ss_net_paid) * 100 AS DOUBLE)) AS BIGINT)
      |           AS netpaid_cents
      |  FROM store_sales, store_returns, store, item, customer,
      |       customer_address
      |  WHERE ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
      |    AND ss_customer_sk = c_customer_sk AND ss_item_sk = i_item_sk
      |    AND ss_store_sk = s_store_sk AND c_current_addr_sk = ca_address_sk
      |    AND c_birth_country <> upper(ca_country) AND s_zip = ca_zip
      |    AND s_market_id = 8
      |  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state,
      |           i_color, i_current_price, i_manager_id, i_units, i_size)
      |SELECT c_last_name, c_first_name, s_store_name,
      |       CAST(sum(netpaid_cents) AS DOUBLE) / 100 AS paid
      |FROM ssales
      |WHERE i_color = 'purple'
      |GROUP BY c_last_name, c_first_name, s_store_name
      |HAVING sum(netpaid_cents) > (SELECT 0.05 * avg(netpaid_cents) FROM ssales)
      |ORDER BY c_last_name, c_first_name, s_store_name, paid
      |LIMIT 100""".stripMargin,

    "q39b" -> """
      |WITH inv AS (
      |  SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy, stdev, mean,
      |         CASE WHEN mean = 0 THEN NULL ELSE stdev / mean END AS cov
      |  FROM (SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
      |               stddev_samp(inv_quantity_on_hand) AS stdev,
      |               avg(inv_quantity_on_hand) AS mean
      |        FROM inventory, item, warehouse, date_dim
      |        WHERE inv_item_sk = i_item_sk
      |          AND inv_warehouse_sk = w_warehouse_sk
      |          AND inv_date_sk = d_date_sk AND d_year = 2001
      |        GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy) foo
      |  WHERE CASE WHEN mean = 0 THEN 0 ELSE stdev / mean END > 1)
      |SELECT inv1.w_warehouse_sk AS wsk1, inv1.i_item_sk AS isk1,
      |       inv1.d_moy AS moy1, round(inv1.mean, 4) AS mean1,
      |       round(inv1.cov, 4) AS cov1,
      |       inv2.w_warehouse_sk AS wsk2, inv2.i_item_sk AS isk2,
      |       inv2.d_moy AS moy2, round(inv2.mean, 4) AS mean2,
      |       round(inv2.cov, 4) AS cov2
      |FROM inv inv1, inv inv2
      |WHERE inv1.i_item_sk = inv2.i_item_sk
      |  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
      |  AND inv1.d_moy = 3 AND inv2.d_moy = 4
      |  AND inv1.cov > 1.5
      |ORDER BY wsk1, isk1, moy1, mean1, cov1, wsk2, isk2, moy2, mean2, cov2
      |LIMIT 100""".stripMargin)
}
