package graft.tpcds

/** Real-TPC-DS batch 3 (conventions: TpcdsReal scaladoc). */
object TpcdsReal3 {

  private def avgC(col: String): String =
    s"round(CAST(sum($col) * 100 AS DOUBLE) / count($col)) / 100"

  val texts: Map[String, String] = Map(

    "q2" -> """
      |WITH wscs AS (
      |  SELECT sold_date_sk, sales_price FROM
      |    (SELECT ws_sold_date_sk AS sold_date_sk,
      |            ws_ext_sales_price AS sales_price FROM web_sales
      |     UNION ALL
      |     SELECT cs_sold_date_sk, cs_ext_sales_price FROM catalog_sales) s),
      |wswscs AS (
      |  SELECT d_week_seq,
      |         sum(CASE WHEN d_day_name = 'Sunday' THEN sales_price ELSE NULL END) AS sun_sales,
      |         sum(CASE WHEN d_day_name = 'Monday' THEN sales_price ELSE NULL END) AS mon_sales,
      |         sum(CASE WHEN d_day_name = 'Tuesday' THEN sales_price ELSE NULL END) AS tue_sales,
      |         sum(CASE WHEN d_day_name = 'Wednesday' THEN sales_price ELSE NULL END) AS wed_sales,
      |         sum(CASE WHEN d_day_name = 'Thursday' THEN sales_price ELSE NULL END) AS thu_sales,
      |         sum(CASE WHEN d_day_name = 'Friday' THEN sales_price ELSE NULL END) AS fri_sales,
      |         sum(CASE WHEN d_day_name = 'Saturday' THEN sales_price ELSE NULL END) AS sat_sales
      |  FROM wscs, date_dim
      |  WHERE d_date_sk = sold_date_sk
      |  GROUP BY d_week_seq)
      |SELECT d_week_seq1,
      |       round(CAST(sun_sales1 AS DOUBLE) / CAST(sun_sales2 AS DOUBLE), 2) AS sun_r,
      |       round(CAST(mon_sales1 AS DOUBLE) / CAST(mon_sales2 AS DOUBLE), 2) AS mon_r,
      |       round(CAST(tue_sales1 AS DOUBLE) / CAST(tue_sales2 AS DOUBLE), 2) AS tue_r,
      |       round(CAST(wed_sales1 AS DOUBLE) / CAST(wed_sales2 AS DOUBLE), 2) AS wed_r,
      |       round(CAST(thu_sales1 AS DOUBLE) / CAST(thu_sales2 AS DOUBLE), 2) AS thu_r,
      |       round(CAST(fri_sales1 AS DOUBLE) / CAST(fri_sales2 AS DOUBLE), 2) AS fri_r,
      |       round(CAST(sat_sales1 AS DOUBLE) / CAST(sat_sales2 AS DOUBLE), 2) AS sat_r
      |FROM (SELECT wswscs.d_week_seq AS d_week_seq1, sun_sales AS sun_sales1,
      |             mon_sales AS mon_sales1, tue_sales AS tue_sales1,
      |             wed_sales AS wed_sales1, thu_sales AS thu_sales1,
      |             fri_sales AS fri_sales1, sat_sales AS sat_sales1
      |      FROM wswscs, date_dim
      |      WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 1998) y,
      |     (SELECT wswscs.d_week_seq AS d_week_seq2, sun_sales AS sun_sales2,
      |             mon_sales AS mon_sales2, tue_sales AS tue_sales2,
      |             wed_sales AS wed_sales2, thu_sales AS thu_sales2,
      |             fri_sales AS fri_sales2, sat_sales AS sat_sales2
      |      FROM wswscs, date_dim
      |      WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 1999) z
      |WHERE d_week_seq1 = d_week_seq2 - 53
      |ORDER BY d_week_seq1""".stripMargin,

    "q12" -> """
      |SELECT i_item_id, i_item_desc, i_category, i_class,
      |       round(CAST(i_current_price AS DOUBLE), 2) AS i_current_price,
      |       round(CAST(itemrevenue AS DOUBLE), 2) AS itemrevenue,
      |       round(revenueratio, 4) AS revenueratio
      |FROM (SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
      |             sum(ws_ext_sales_price) AS itemrevenue,
      |             CAST(sum(ws_ext_sales_price) * 100 AS DOUBLE) /
      |               CAST(sum(sum(ws_ext_sales_price)) OVER (PARTITION BY i_class) AS DOUBLE) AS revenueratio
      |      FROM web_sales, item, date_dim
      |      WHERE ws_item_sk = i_item_sk
      |        AND i_category IN ('Sports', 'Books', 'Home')
      |        AND ws_sold_date_sk = d_date_sk
      |        AND d_date BETWEEN CAST('1999-02-22' AS DATE) AND CAST('1999-03-24' AS DATE)
      |      GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price) x
      |ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio""".stripMargin,

    "q18" -> s"""
      |SELECT i_item_id, ca_country, ca_state, ca_county,
      |       round(avg(cs_quantity), 4) AS agg1,
      |       ${avgC("cs_list_price")} AS agg2,
      |       ${avgC("cs_coupon_amt")} AS agg3,
      |       ${avgC("cs_sales_price")} AS agg4,
      |       ${avgC("cs_net_profit")} AS agg5,
      |       round(avg(c_birth_year), 4) AS agg6,
      |       round(avg(cd1.cd_dep_count), 4) AS agg7
      |FROM catalog_sales, customer_demographics cd1, customer_demographics cd2,
      |     customer, customer_address, date_dim, item
      |WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk
      |  AND cs_bill_cdemo_sk = cd1.cd_demo_sk
      |  AND cs_bill_customer_sk = c_customer_sk
      |  AND cd1.cd_gender = 'F' AND cd1.cd_education_status = 'Unknown'
      |  AND c_current_cdemo_sk = cd2.cd_demo_sk
      |  AND c_current_addr_sk = ca_address_sk
      |  AND c_birth_month IN (1, 6, 8, 9, 12, 2)
      |  AND d_year = 1998
      |  AND ca_state IN ('MS', 'IN', 'ND', 'OK', 'NM', 'VA', 'TN')
      |GROUP BY ROLLUP(i_item_id, ca_country, ca_state, ca_county)
      |ORDER BY ca_country NULLS FIRST, ca_state NULLS FIRST,
      |         ca_county NULLS FIRST, i_item_id NULLS FIRST
      |LIMIT 100""".stripMargin,

    "q20" -> """
      |SELECT i_item_id, i_item_desc, i_category, i_class,
      |       round(CAST(i_current_price AS DOUBLE), 2) AS i_current_price,
      |       round(CAST(itemrevenue AS DOUBLE), 2) AS itemrevenue,
      |       round(revenueratio, 4) AS revenueratio
      |FROM (SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
      |             sum(cs_ext_sales_price) AS itemrevenue,
      |             CAST(sum(cs_ext_sales_price) * 100 AS DOUBLE) /
      |               CAST(sum(sum(cs_ext_sales_price)) OVER (PARTITION BY i_class) AS DOUBLE) AS revenueratio
      |      FROM catalog_sales, item, date_dim
      |      WHERE cs_item_sk = i_item_sk
      |        AND i_category IN ('Sports', 'Books', 'Home')
      |        AND cs_sold_date_sk = d_date_sk
      |        AND d_date BETWEEN CAST('1999-02-22' AS DATE) AND CAST('1999-03-24' AS DATE)
      |      GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price) x
      |ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio""".stripMargin,

    "q29" -> """
      |SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
      |       CAST(sum(ss_quantity) AS BIGINT) AS store_sales_quantity,
      |       CAST(sum(sr_return_quantity) AS BIGINT) AS store_returns_quantity,
      |       CAST(sum(cs_quantity) AS BIGINT) AS catalog_sales_quantity
      |FROM store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2,
      |     date_dim d3, store, item
      |WHERE d1.d_moy = 4 AND d1.d_year = 1999 AND d1.d_date_sk = ss_sold_date_sk
      |  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
      |  AND ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
      |  AND ss_ticket_number = sr_ticket_number
      |  AND sr_returned_date_sk = d2.d_date_sk
      |  AND d2.d_moy BETWEEN 4 AND 7 AND d2.d_year = 1999
      |  AND sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
      |  AND cs_sold_date_sk = d3.d_date_sk
      |  AND d3.d_year IN (1999, 2000, 2001)
      |GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
      |ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
      |LIMIT 100""".stripMargin,

    "q30" -> """
      |WITH customer_total_return AS (
      |  SELECT wr_returning_customer_sk AS ctr_customer_sk,
      |         ca_state AS ctr_state,
      |         round(CAST(sum(wr_return_amt) AS DOUBLE), 2) AS ctr_total_return
      |  FROM web_returns, date_dim, customer_address
      |  WHERE wr_returned_date_sk = d_date_sk AND d_year = 2000
      |    AND wr_returning_addr_sk = ca_address_sk
      |  GROUP BY wr_returning_customer_sk, ca_state)
      |SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
      |       c_preferred_cust_flag, c_birth_day, c_birth_month, c_birth_year,
      |       c_birth_country, c_email_address,
      |       ctr_total_return
      |FROM customer_total_return ctr1, customer_address, customer
      |WHERE ctr1.ctr_total_return > (SELECT avg(ctr_total_return) * 1.2
      |                               FROM customer_total_return ctr2
      |                               WHERE ctr1.ctr_state = ctr2.ctr_state)
      |  AND ca_address_sk = c_current_addr_sk AND ca_state = 'GA'
      |  AND ctr1.ctr_customer_sk = c_customer_sk
      |ORDER BY c_customer_id, c_salutation, c_first_name, c_last_name,
      |         c_preferred_cust_flag, c_birth_day, c_birth_month, c_birth_year,
      |         c_birth_country, c_email_address, ctr_total_return
      |LIMIT 100""".stripMargin,

    "q31" -> """
      |WITH ss AS (
      |  SELECT ca_county, d_qoy, d_year,
      |         CAST(round(CAST(sum(ss_ext_sales_price) * 100 AS DOUBLE)) AS BIGINT) AS store_sales
      |  FROM store_sales, date_dim, customer_address
      |  WHERE ss_sold_date_sk = d_date_sk AND ss_addr_sk = ca_address_sk
      |  GROUP BY ca_county, d_qoy, d_year),
      |ws AS (
      |  SELECT ca_county, d_qoy, d_year,
      |         CAST(round(CAST(sum(ws_ext_sales_price) * 100 AS DOUBLE)) AS BIGINT) AS web_sales
      |  FROM web_sales, date_dim, customer_address
      |  WHERE ws_sold_date_sk = d_date_sk AND ws_bill_addr_sk = ca_address_sk
      |  GROUP BY ca_county, d_qoy, d_year)
      |SELECT ss1.ca_county, ss1.d_year,
      |       round(CAST(ws2.web_sales AS DOUBLE) / ws1.web_sales, 4) AS web_q1_q2_increase,
      |       round(CAST(ss2.store_sales AS DOUBLE) / ss1.store_sales, 4) AS store_q1_q2_increase,
      |       round(CAST(ws3.web_sales AS DOUBLE) / ws2.web_sales, 4) AS web_q2_q3_increase,
      |       round(CAST(ss3.store_sales AS DOUBLE) / ss2.store_sales, 4) AS store_q2_q3_increase
      |FROM ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
      |WHERE ss1.d_qoy = 1 AND ss1.d_year = 2000
      |  AND ss1.ca_county = ss2.ca_county AND ss2.d_qoy = 2 AND ss2.d_year = 2000
      |  AND ss2.ca_county = ss3.ca_county AND ss3.d_qoy = 3 AND ss3.d_year = 2000
      |  AND ss1.ca_county = ws1.ca_county AND ws1.d_qoy = 1 AND ws1.d_year = 2000
      |  AND ws1.ca_county = ws2.ca_county AND ws2.d_qoy = 2 AND ws2.d_year = 2000
      |  AND ws1.ca_county = ws3.ca_county AND ws3.d_qoy = 3 AND ws3.d_year = 2000
      |  AND CAST(ws2.web_sales AS DOUBLE) / ws1.web_sales >
      |      CAST(ss2.store_sales AS DOUBLE) / ss1.store_sales
      |  AND CAST(ws3.web_sales AS DOUBLE) / ws2.web_sales >
      |      CAST(ss3.store_sales AS DOUBLE) / ss2.store_sales
      |ORDER BY ss1.ca_county, ss1.d_year, web_q1_q2_increase,
      |         store_q1_q2_increase, web_q2_q3_increase, store_q2_q3_increase""".stripMargin,

    "q33" -> """
      |WITH ss AS (
      |  SELECT i_manufact_id,
      |         round(CAST(sum(ss_ext_sales_price) AS DOUBLE), 2) AS total_sales
      |  FROM store_sales, date_dim, customer_address, item
      |  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
      |                          WHERE i_category IN ('Electronics'))
      |    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
      |    AND d_year = 1998 AND d_moy = 5
      |    AND ss_addr_sk = ca_address_sk AND ca_gmt_offset = -5
      |  GROUP BY i_manufact_id),
      |cs AS (
      |  SELECT i_manufact_id,
      |         round(CAST(sum(cs_ext_sales_price) AS DOUBLE), 2) AS total_sales
      |  FROM catalog_sales, date_dim, customer_address, item
      |  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
      |                          WHERE i_category IN ('Electronics'))
      |    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
      |    AND d_year = 1998 AND d_moy = 5
      |    AND cs_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
      |  GROUP BY i_manufact_id),
      |ws AS (
      |  SELECT i_manufact_id,
      |         round(CAST(sum(ws_ext_sales_price) AS DOUBLE), 2) AS total_sales
      |  FROM web_sales, date_dim, customer_address, item
      |  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
      |                          WHERE i_category IN ('Electronics'))
      |    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
      |    AND d_year = 1998 AND d_moy = 5
      |    AND ws_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
      |  GROUP BY i_manufact_id)
      |SELECT i_manufact_id,
      |       round(CAST(sum(total_sales) AS DOUBLE), 2) AS total_sales
      |FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
      |      UNION ALL SELECT * FROM ws) tmp1
      |GROUP BY i_manufact_id
      |ORDER BY total_sales, i_manufact_id
      |LIMIT 100""".stripMargin,

    "q35" -> """
      |SELECT ca_state, cd_gender, cd_marital_status, cd_dep_count,
      |       CAST(count(*) AS BIGINT) AS cnt1,
      |       round(avg(cd_dep_count), 4) AS a1,
      |       CAST(max(cd_dep_count) AS INT) AS m1,
      |       CAST(sum(cd_dep_count) AS BIGINT) AS s1,
      |       cd_dep_employed_count,
      |       CAST(count(*) AS BIGINT) AS cnt2,
      |       cd_dep_college_count,
      |       CAST(count(*) AS BIGINT) AS cnt3
      |FROM customer c, customer_address ca, customer_demographics
      |WHERE c.c_current_addr_sk = ca.ca_address_sk
      |  AND cd_demo_sk = c.c_current_cdemo_sk
      |  AND EXISTS (SELECT * FROM store_sales, date_dim
      |              WHERE c.c_customer_sk = ss_customer_sk
      |                AND ss_sold_date_sk = d_date_sk
      |                AND d_year = 2002 AND d_qoy < 4)
      |  AND (EXISTS (SELECT * FROM web_sales, date_dim
      |               WHERE c.c_customer_sk = ws_bill_customer_sk
      |                 AND ws_sold_date_sk = d_date_sk
      |                 AND d_year = 2002 AND d_qoy < 4)
      |       OR EXISTS (SELECT * FROM catalog_sales, date_dim
      |                  WHERE c.c_customer_sk = cs_ship_customer_sk
      |                    AND cs_sold_date_sk = d_date_sk
      |                    AND d_year = 2002 AND d_qoy < 4))
      |GROUP BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
      |         cd_dep_employed_count, cd_dep_college_count
      |ORDER BY ca_state NULLS FIRST, cd_gender, cd_marital_status,
      |         cd_dep_count, cd_dep_employed_count, cd_dep_college_count
      |LIMIT 100""".stripMargin,

    "q40" -> """
      |SELECT w_state, i_item_id,
      |       round(CAST(sum(CASE WHEN d_date < CAST('2000-03-11' AS DATE)
      |                THEN cs_sales_price - coalesce(cr_refunded_cash, 0)
      |                ELSE 0 END) AS DOUBLE), 2) AS sales_before,
      |       round(CAST(sum(CASE WHEN d_date >= CAST('2000-03-11' AS DATE)
      |                THEN cs_sales_price - coalesce(cr_refunded_cash, 0)
      |                ELSE 0 END) AS DOUBLE), 2) AS sales_after
      |FROM catalog_sales
      |  LEFT OUTER JOIN catalog_returns
      |    ON (cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk),
      |  warehouse, item, date_dim
      |WHERE i_current_price BETWEEN 0.99 AND 1.49
      |  AND i_item_sk = cs_item_sk
      |  AND cs_warehouse_sk = w_warehouse_sk
      |  AND cs_sold_date_sk = d_date_sk
      |  AND d_date BETWEEN CAST('2000-02-10' AS DATE) AND CAST('2000-04-10' AS DATE)
      |GROUP BY w_state, i_item_id
      |ORDER BY w_state, i_item_id
      |LIMIT 100""".stripMargin,

    "q51" -> """
      |WITH web_v1 AS (
      |  SELECT ws_item_sk AS item_sk, d_date,
      |         sum(CAST(round(CAST(sum(ws_sales_price) * 100 AS DOUBLE)) AS BIGINT))
      |           OVER (PARTITION BY ws_item_sk ORDER BY d_date
      |                 ROWS UNBOUNDED PRECEDING) AS cume_sales
      |  FROM web_sales, date_dim
      |  WHERE ws_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 1200 AND 1211
      |    AND ws_item_sk IS NOT NULL
      |  GROUP BY ws_item_sk, d_date),
      |store_v1 AS (
      |  SELECT ss_item_sk AS item_sk, d_date,
      |         sum(CAST(round(CAST(sum(ss_sales_price) * 100 AS DOUBLE)) AS BIGINT))
      |           OVER (PARTITION BY ss_item_sk ORDER BY d_date
      |                 ROWS UNBOUNDED PRECEDING) AS cume_sales
      |  FROM store_sales, date_dim
      |  WHERE ss_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 1200 AND 1211
      |    AND ss_item_sk IS NOT NULL
      |  GROUP BY ss_item_sk, d_date)
      |SELECT item_sk, CAST(d_date AS STRING) AS d_date,
      |       CAST(web_sales AS DOUBLE) / 100 AS web_sales,
      |       CAST(store_sales AS DOUBLE) / 100 AS store_sales,
      |       CAST(web_cumulative AS DOUBLE) / 100 AS web_cumulative,
      |       CAST(store_cumulative AS DOUBLE) / 100 AS store_cumulative
      |FROM (SELECT item_sk, d_date, web_sales, store_sales,
      |             max(web_sales) OVER (PARTITION BY item_sk ORDER BY d_date
      |               ROWS UNBOUNDED PRECEDING) AS web_cumulative,
      |             max(store_sales) OVER (PARTITION BY item_sk ORDER BY d_date
      |               ROWS UNBOUNDED PRECEDING) AS store_cumulative
      |      FROM (SELECT CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk
      |                        ELSE store.item_sk END AS item_sk,
      |                   CASE WHEN web.d_date IS NOT NULL THEN web.d_date
      |                        ELSE store.d_date END AS d_date,
      |                   web.cume_sales AS web_sales,
      |                   store.cume_sales AS store_sales
      |            FROM web_v1 web FULL OUTER JOIN store_v1 store
      |              ON (web.item_sk = store.item_sk AND web.d_date = store.d_date)) x) y
      |WHERE web_cumulative > store_cumulative
      |ORDER BY item_sk, d_date
      |LIMIT 100""".stripMargin,

    "q56" -> """
      |WITH ss AS (
      |  SELECT i_item_id,
      |         round(CAST(sum(ss_ext_sales_price) AS DOUBLE), 2) AS total_sales
      |  FROM store_sales, date_dim, customer_address, item
      |  WHERE i_item_id IN (SELECT i_item_id FROM item
      |                      WHERE i_color IN ('red', 'navy', 'olive'))
      |    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
      |    AND d_year = 2000 AND d_moy = 2
      |    AND ss_addr_sk = ca_address_sk AND ca_gmt_offset = -5
      |  GROUP BY i_item_id),
      |cs AS (
      |  SELECT i_item_id,
      |         round(CAST(sum(cs_ext_sales_price) AS DOUBLE), 2) AS total_sales
      |  FROM catalog_sales, date_dim, customer_address, item
      |  WHERE i_item_id IN (SELECT i_item_id FROM item
      |                      WHERE i_color IN ('red', 'navy', 'olive'))
      |    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
      |    AND d_year = 2000 AND d_moy = 2
      |    AND cs_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
      |  GROUP BY i_item_id),
      |ws AS (
      |  SELECT i_item_id,
      |         round(CAST(sum(ws_ext_sales_price) AS DOUBLE), 2) AS total_sales
      |  FROM web_sales, date_dim, customer_address, item
      |  WHERE i_item_id IN (SELECT i_item_id FROM item
      |                      WHERE i_color IN ('red', 'navy', 'olive'))
      |    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
      |    AND d_year = 2000 AND d_moy = 2
      |    AND ws_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
      |  GROUP BY i_item_id)
      |SELECT i_item_id,
      |       round(CAST(sum(total_sales) AS DOUBLE), 2) AS total_sales
      |FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
      |      UNION ALL SELECT * FROM ws) tmp1
      |GROUP BY i_item_id
      |ORDER BY total_sales, i_item_id
      |LIMIT 100""".stripMargin,

    "q60" -> """
      |WITH ss AS (
      |  SELECT i_item_id,
      |         round(CAST(sum(ss_ext_sales_price) AS DOUBLE), 2) AS total_sales
      |  FROM store_sales, date_dim, customer_address, item
      |  WHERE i_item_id IN (SELECT i_item_id FROM item
      |                      WHERE i_category IN ('Music'))
      |    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
      |    AND d_year = 1998 AND d_moy = 9
      |    AND ss_addr_sk = ca_address_sk AND ca_gmt_offset = -5
      |  GROUP BY i_item_id),
      |cs AS (
      |  SELECT i_item_id,
      |         round(CAST(sum(cs_ext_sales_price) AS DOUBLE), 2) AS total_sales
      |  FROM catalog_sales, date_dim, customer_address, item
      |  WHERE i_item_id IN (SELECT i_item_id FROM item
      |                      WHERE i_category IN ('Music'))
      |    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
      |    AND d_year = 1998 AND d_moy = 9
      |    AND cs_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
      |  GROUP BY i_item_id),
      |ws AS (
      |  SELECT i_item_id,
      |         round(CAST(sum(ws_ext_sales_price) AS DOUBLE), 2) AS total_sales
      |  FROM web_sales, date_dim, customer_address, item
      |  WHERE i_item_id IN (SELECT i_item_id FROM item
      |                      WHERE i_category IN ('Music'))
      |    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
      |    AND d_year = 1998 AND d_moy = 9
      |    AND ws_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
      |  GROUP BY i_item_id)
      |SELECT i_item_id,
      |       round(CAST(sum(total_sales) AS DOUBLE), 2) AS total_sales
      |FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
      |      UNION ALL SELECT * FROM ws) tmp1
      |GROUP BY i_item_id
      |ORDER BY total_sales, i_item_id
      |LIMIT 100""".stripMargin,

    "q66" -> """
      |SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
      |       w_country, ship_carriers, year_,
      |       round(CAST(sum(jan_sales) AS DOUBLE), 2) AS jan_sales,
      |       round(CAST(sum(feb_sales) AS DOUBLE), 2) AS feb_sales,
      |       round(CAST(sum(mar_sales) AS DOUBLE), 2) AS mar_sales,
      |       round(CAST(sum(apr_sales) AS DOUBLE), 2) AS apr_sales,
      |       round(CAST(sum(may_sales) AS DOUBLE), 2) AS may_sales,
      |       round(CAST(sum(jun_sales) AS DOUBLE), 2) AS jun_sales,
      |       round(CAST(sum(jul_sales) AS DOUBLE), 2) AS jul_sales,
      |       round(CAST(sum(aug_sales) AS DOUBLE), 2) AS aug_sales,
      |       round(CAST(sum(sep_sales) AS DOUBLE), 2) AS sep_sales,
      |       round(CAST(sum(oct_sales) AS DOUBLE), 2) AS oct_sales,
      |       round(CAST(sum(nov_sales) AS DOUBLE), 2) AS nov_sales,
      |       round(CAST(sum(dec_sales) AS DOUBLE), 2) AS dec_sales
      |FROM (
      |  SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
      |         w_country, 'UPS,FEDEX' AS ship_carriers, d_year AS year_,
      |         sum(CASE WHEN d_moy = 1 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS jan_sales,
      |         sum(CASE WHEN d_moy = 2 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS feb_sales,
      |         sum(CASE WHEN d_moy = 3 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS mar_sales,
      |         sum(CASE WHEN d_moy = 4 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS apr_sales,
      |         sum(CASE WHEN d_moy = 5 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS may_sales,
      |         sum(CASE WHEN d_moy = 6 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS jun_sales,
      |         sum(CASE WHEN d_moy = 7 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS jul_sales,
      |         sum(CASE WHEN d_moy = 8 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS aug_sales,
      |         sum(CASE WHEN d_moy = 9 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS sep_sales,
      |         sum(CASE WHEN d_moy = 10 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS oct_sales,
      |         sum(CASE WHEN d_moy = 11 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS nov_sales,
      |         sum(CASE WHEN d_moy = 12 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS dec_sales
      |  FROM web_sales, warehouse, date_dim, time_dim, ship_mode
      |  WHERE ws_warehouse_sk = w_warehouse_sk AND ws_sold_date_sk = d_date_sk
      |    AND ws_sold_time_sk = t_time_sk AND ws_ship_mode_sk = sm_ship_mode_sk
      |    AND d_year = 2001 AND t_time BETWEEN 30838 AND 30838 + 28800
      |    AND sm_carrier IN ('UPS', 'FEDEX')
      |  GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
      |           w_state, w_country, d_year
      |  UNION ALL
      |  SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
      |         w_country, 'UPS,FEDEX' AS ship_carriers, d_year AS year_,
      |         sum(CASE WHEN d_moy = 1 THEN cs_sales_price * cs_quantity ELSE 0 END) AS jan_sales,
      |         sum(CASE WHEN d_moy = 2 THEN cs_sales_price * cs_quantity ELSE 0 END) AS feb_sales,
      |         sum(CASE WHEN d_moy = 3 THEN cs_sales_price * cs_quantity ELSE 0 END) AS mar_sales,
      |         sum(CASE WHEN d_moy = 4 THEN cs_sales_price * cs_quantity ELSE 0 END) AS apr_sales,
      |         sum(CASE WHEN d_moy = 5 THEN cs_sales_price * cs_quantity ELSE 0 END) AS may_sales,
      |         sum(CASE WHEN d_moy = 6 THEN cs_sales_price * cs_quantity ELSE 0 END) AS jun_sales,
      |         sum(CASE WHEN d_moy = 7 THEN cs_sales_price * cs_quantity ELSE 0 END) AS jul_sales,
      |         sum(CASE WHEN d_moy = 8 THEN cs_sales_price * cs_quantity ELSE 0 END) AS aug_sales,
      |         sum(CASE WHEN d_moy = 9 THEN cs_sales_price * cs_quantity ELSE 0 END) AS sep_sales,
      |         sum(CASE WHEN d_moy = 10 THEN cs_sales_price * cs_quantity ELSE 0 END) AS oct_sales,
      |         sum(CASE WHEN d_moy = 11 THEN cs_sales_price * cs_quantity ELSE 0 END) AS nov_sales,
      |         sum(CASE WHEN d_moy = 12 THEN cs_sales_price * cs_quantity ELSE 0 END) AS dec_sales
      |  FROM catalog_sales, warehouse, date_dim, time_dim, ship_mode
      |  WHERE cs_warehouse_sk = w_warehouse_sk AND cs_sold_date_sk = d_date_sk
      |    AND cs_sold_time_sk = t_time_sk AND cs_ship_mode_sk = sm_ship_mode_sk
      |    AND d_year = 2001 AND t_time BETWEEN 30838 AND 30838 + 28800
      |    AND sm_carrier IN ('UPS', 'FEDEX')
      |  GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
      |           w_state, w_country, d_year) x
      |GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
      |         w_country, ship_carriers, year_
      |ORDER BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
      |         w_country, ship_carriers, year_
      |LIMIT 100""".stripMargin,

    "q69" -> """
      |SELECT cd_gender, cd_marital_status, cd_education_status,
      |       CAST(count(*) AS BIGINT) AS cnt1,
      |       cd_purchase_estimate,
      |       CAST(count(*) AS BIGINT) AS cnt2,
      |       cd_credit_rating,
      |       CAST(count(*) AS BIGINT) AS cnt3
      |FROM customer c, customer_address ca, customer_demographics
      |WHERE c.c_current_addr_sk = ca.ca_address_sk
      |  AND ca_state IN ('TN', 'GA', 'CA')
      |  AND cd_demo_sk = c.c_current_cdemo_sk
      |  AND EXISTS (SELECT * FROM store_sales, date_dim
      |              WHERE c.c_customer_sk = ss_customer_sk
      |                AND ss_sold_date_sk = d_date_sk
      |                AND d_year = 2001 AND d_moy BETWEEN 4 AND 6)
      |  AND NOT EXISTS (SELECT * FROM web_sales, date_dim
      |                  WHERE c.c_customer_sk = ws_bill_customer_sk
      |                    AND ws_sold_date_sk = d_date_sk
      |                    AND d_year = 2001 AND d_moy BETWEEN 4 AND 6)
      |  AND NOT EXISTS (SELECT * FROM catalog_sales, date_dim
      |                  WHERE c.c_customer_sk = cs_ship_customer_sk
      |                    AND cs_sold_date_sk = d_date_sk
      |                    AND d_year = 2001 AND d_moy BETWEEN 4 AND 6)
      |GROUP BY cd_gender, cd_marital_status, cd_education_status,
      |         cd_purchase_estimate, cd_credit_rating
      |ORDER BY cd_gender, cd_marital_status, cd_education_status,
      |         cd_purchase_estimate, cd_credit_rating
      |LIMIT 100""".stripMargin,

    "q76" -> """
      |SELECT channel, col_name, d_year, d_qoy, i_category,
      |       CAST(count(*) AS BIGINT) AS sales_cnt,
      |       round(CAST(sum(ext_sales_price) AS DOUBLE), 2) AS sales_amt
      |FROM (
      |  SELECT 'store' AS channel, 'ss_customer_sk' AS col_name, d_year, d_qoy,
      |         i_category, ss_ext_sales_price AS ext_sales_price
      |  FROM store_sales, item, date_dim
      |  WHERE ss_customer_sk IS NULL
      |    AND ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
      |  UNION ALL
      |  SELECT 'web' AS channel, 'ws_promo_sk' AS col_name, d_year, d_qoy,
      |         i_category, ws_ext_sales_price AS ext_sales_price
      |  FROM web_sales, item, date_dim
      |  WHERE ws_promo_sk IS NULL
      |    AND ws_sold_date_sk = d_date_sk AND ws_item_sk = i_item_sk
      |  UNION ALL
      |  SELECT 'catalog' AS channel, 'cs_bill_cdemo_sk' AS col_name, d_year,
      |         d_qoy, i_category, cs_ext_sales_price AS ext_sales_price
      |  FROM catalog_sales, item, date_dim
      |  WHERE cs_bill_cdemo_sk IS NULL
      |    AND cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk) foo
      |GROUP BY channel, col_name, d_year, d_qoy, i_category
      |ORDER BY channel, col_name, d_year, d_qoy, i_category, sales_cnt, sales_amt
      |LIMIT 100""".stripMargin,

    "q81" -> """
      |WITH customer_total_return AS (
      |  SELECT cr_returning_customer_sk AS ctr_customer_sk,
      |         ca_state AS ctr_state,
      |         round(CAST(sum(cr_return_amt_inc_tax) AS DOUBLE), 2) AS ctr_total_return
      |  FROM catalog_returns, date_dim, customer_address
      |  WHERE cr_returned_date_sk = d_date_sk AND d_year = 2000
      |    AND cr_returning_addr_sk = ca_address_sk
      |  GROUP BY cr_returning_customer_sk, ca_state)
      |SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
      |       ca_street_number, ca_street_name, ca_street_type, ca_suite_number,
      |       ca_city, ca_county, ca_state, ca_zip, ca_country,
      |       CAST(ca_gmt_offset AS DOUBLE) AS ca_gmt_offset,
      |       ca_location_type, ctr_total_return
      |FROM customer_total_return ctr1, customer_address, customer
      |WHERE ctr1.ctr_total_return > (SELECT avg(ctr_total_return) * 1.2
      |                               FROM customer_total_return ctr2
      |                               WHERE ctr1.ctr_state = ctr2.ctr_state)
      |  AND ca_address_sk = c_current_addr_sk AND ca_state = 'GA'
      |  AND ctr1.ctr_customer_sk = c_customer_sk
      |ORDER BY c_customer_id, c_salutation, c_first_name, c_last_name,
      |         ca_street_number, ca_street_name, ca_street_type,
      |         ca_suite_number, ca_city, ca_county, ca_state, ca_zip,
      |         ca_country, ca_gmt_offset, ca_location_type, ctr_total_return
      |LIMIT 100""".stripMargin,

    "q83" -> """
      |WITH sr_items AS (
      |  SELECT i_item_id AS item_id,
      |         CAST(sum(sr_return_quantity) AS BIGINT) AS sr_item_qty
      |  FROM store_returns, item, date_dim
      |  WHERE sr_item_sk = i_item_sk
      |    AND d_date IN (SELECT d_date FROM date_dim
      |                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
      |                                        WHERE d_date IN (CAST('2000-06-30' AS DATE),
      |                                                         CAST('2000-09-27' AS DATE),
      |                                                         CAST('2000-11-17' AS DATE))))
      |    AND sr_returned_date_sk = d_date_sk
      |  GROUP BY i_item_id),
      |cr_items AS (
      |  SELECT i_item_id AS item_id,
      |         CAST(sum(cr_return_quantity) AS BIGINT) AS cr_item_qty
      |  FROM catalog_returns, item, date_dim
      |  WHERE cr_item_sk = i_item_sk
      |    AND d_date IN (SELECT d_date FROM date_dim
      |                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
      |                                        WHERE d_date IN (CAST('2000-06-30' AS DATE),
      |                                                         CAST('2000-09-27' AS DATE),
      |                                                         CAST('2000-11-17' AS DATE))))
      |    AND cr_returned_date_sk = d_date_sk
      |  GROUP BY i_item_id),
      |wr_items AS (
      |  SELECT i_item_id AS item_id,
      |         CAST(sum(wr_return_quantity) AS BIGINT) AS wr_item_qty
      |  FROM web_returns, item, date_dim
      |  WHERE wr_item_sk = i_item_sk
      |    AND d_date IN (SELECT d_date FROM date_dim
      |                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
      |                                        WHERE d_date IN (CAST('2000-06-30' AS DATE),
      |                                                         CAST('2000-09-27' AS DATE),
      |                                                         CAST('2000-11-17' AS DATE))))
      |    AND wr_returned_date_sk = d_date_sk
      |  GROUP BY i_item_id)
      |SELECT sr_items.item_id, sr_item_qty,
      |       round(CAST(sr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100, 4) AS sr_dev,
      |       cr_item_qty,
      |       round(CAST(cr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100, 4) AS cr_dev,
      |       wr_item_qty,
      |       round(CAST(wr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100, 4) AS wr_dev,
      |       round(CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE) / 3.0, 4) AS average
      |FROM sr_items, cr_items, wr_items
      |WHERE sr_items.item_id = cr_items.item_id
      |  AND sr_items.item_id = wr_items.item_id
      |ORDER BY sr_items.item_id, sr_item_qty
      |LIMIT 100""".stripMargin,

    "q97" -> """
      |WITH ssci AS (
      |  SELECT ss_customer_sk AS customer_sk, ss_item_sk AS item_sk
      |  FROM store_sales, date_dim
      |  WHERE ss_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 1200 AND 1211
      |  GROUP BY ss_customer_sk, ss_item_sk),
      |csci AS (
      |  SELECT cs_bill_customer_sk AS customer_sk, cs_item_sk AS item_sk
      |  FROM catalog_sales, date_dim
      |  WHERE cs_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 1200 AND 1211
      |  GROUP BY cs_bill_customer_sk, cs_item_sk)
      |SELECT CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL
      |                      AND csci.customer_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS store_only,
      |       CAST(sum(CASE WHEN ssci.customer_sk IS NULL
      |                      AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS catalog_only,
      |       CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL
      |                      AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS store_and_catalog
      |FROM ssci FULL OUTER JOIN csci
      |  ON (ssci.customer_sk = csci.customer_sk AND ssci.item_sk = csci.item_sk)""".stripMargin)
}
