package graft.tpcds

/** Real-TPC-DS batch 2 (same conventions as TpcdsReal: published query
  * texts, shared between spark.sql and the DuckDB oracle; adaptations are
  * the documented list in TpcdsReal's scaladoc — rounding casts, ORDER BY
  * covering outputs, lite-tuned substitution params, precomputed date
  * arithmetic, integer-cent rounding for decimal averages). */
object TpcdsReal2 {

  /** round(CAST(sum(x)*100 AS DOUBLE)/count(x))/100 — the cross-engine
    * decimal-average formulation (see TpcdsReal scaladoc). */
  private def avgC(col: String): String =
    s"round(CAST(sum($col) * 100 AS DOUBLE) / count($col)) / 100"

  val texts: Map[String, String] = Map(


    "q9" -> {
      def bucket(n: Int, lo: Int, hi: Int): String =
        s"""CASE WHEN (SELECT count(*) FROM store_sales
           |                  WHERE ss_quantity BETWEEN $lo AND $hi) > 24500
           |            THEN (SELECT round(CAST(sum(ss_ext_discount_amt) * 100 AS DOUBLE) / count(ss_ext_discount_amt)) / 100
           |                  FROM store_sales WHERE ss_quantity BETWEEN $lo AND $hi)
           |            ELSE (SELECT round(CAST(sum(ss_net_paid) * 100 AS DOUBLE) / count(ss_net_paid)) / 100
           |                  FROM store_sales WHERE ss_quantity BETWEEN $lo AND $hi)
           |       END AS bucket$n""".stripMargin
      s"""
      |SELECT ${bucket(1, 1, 20)},
      |       ${bucket(2, 21, 40)},
      |       ${bucket(3, 41, 60)},
      |       ${bucket(4, 61, 80)},
      |       ${bucket(5, 81, 100)}
      |FROM reason
      |WHERE r_reason_sk = 1""".stripMargin
    },

    "q13" -> s"""
      |SELECT round(avg(ss_quantity), 4) AS avg_qty,
      |       ${avgC("ss_ext_sales_price")} AS avg_esp,
      |       ${avgC("ss_ext_wholesale_cost")} AS avg_ewc,
      |       round(CAST(sum(ss_ext_wholesale_cost) AS DOUBLE), 2) AS sum_ewc
      |FROM store_sales, store, customer_demographics,
      |     household_demographics, customer_address, date_dim
      |WHERE s_store_sk = ss_store_sk AND ss_sold_date_sk = d_date_sk
      |  AND d_year = 2001
      |  AND ((ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
      |        AND cd_marital_status = 'M' AND cd_education_status = 'Advanced Degree'
      |        AND ss_sales_price BETWEEN 100 AND 150 AND hd_dep_count = 3)
      |       OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
      |        AND cd_marital_status = 'S' AND cd_education_status = 'College'
      |        AND ss_sales_price BETWEEN 50 AND 100 AND hd_dep_count = 1)
      |       OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
      |        AND cd_marital_status = 'W' AND cd_education_status = '2 yr Degree'
      |        AND ss_sales_price BETWEEN 150 AND 200 AND hd_dep_count = 1))
      |  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
      |        AND ca_state IN ('TX', 'OH', 'TX')
      |        AND ss_net_profit BETWEEN 100 AND 200)
      |       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
      |        AND ca_state IN ('OR', 'NM', 'KY')
      |        AND ss_net_profit BETWEEN 150 AND 300)
      |       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
      |        AND ca_state IN ('VA', 'TX', 'MS')
      |        AND ss_net_profit BETWEEN 50 AND 250))""".stripMargin,

    "q16" -> """
      |SELECT CAST(count(DISTINCT cs_order_number) AS BIGINT) AS order_count,
      |       round(CAST(sum(cs_ext_ship_cost) AS DOUBLE), 2) AS total_shipping_cost,
      |       round(CAST(sum(cs_net_profit) AS DOUBLE), 2) AS total_net_profit
      |FROM catalog_sales cs1, date_dim, customer_address, call_center
      |WHERE d_date BETWEEN CAST('2002-02-01' AS DATE) AND CAST('2002-04-02' AS DATE)
      |  AND cs1.cs_ship_date_sk = d_date_sk
      |  AND cs1.cs_ship_addr_sk = ca_address_sk
      |  AND ca_state = 'GA'
      |  AND cs1.cs_call_center_sk = cc_call_center_sk
      |  AND cc_county = 'Williamson County'
      |  AND EXISTS (SELECT * FROM catalog_sales cs2
      |              WHERE cs1.cs_order_number = cs2.cs_order_number
      |                AND cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
      |  AND NOT EXISTS (SELECT * FROM catalog_returns cr1
      |                  WHERE cs1.cs_order_number = cr1.cr_order_number)""".stripMargin,

    "q21" -> """
      |SELECT w_warehouse_name, i_item_id,
      |       CAST(sum(CASE WHEN d_date < CAST('2000-03-11' AS DATE)
      |                THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS inv_before,
      |       CAST(sum(CASE WHEN d_date >= CAST('2000-03-11' AS DATE)
      |                THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS inv_after
      |FROM inventory, warehouse, item, date_dim
      |WHERE i_current_price BETWEEN 0.99 AND 49.99
      |  AND i_item_sk = inv_item_sk
      |  AND inv_warehouse_sk = w_warehouse_sk
      |  AND inv_date_sk = d_date_sk
      |  AND d_date BETWEEN CAST('2000-02-10' AS DATE) AND CAST('2000-04-10' AS DATE)
      |GROUP BY w_warehouse_name, i_item_id
      |HAVING (CASE WHEN sum(CASE WHEN d_date < CAST('2000-03-11' AS DATE)
      |                      THEN inv_quantity_on_hand ELSE 0 END) > 0
      |             THEN CAST(sum(CASE WHEN d_date >= CAST('2000-03-11' AS DATE)
      |                           THEN inv_quantity_on_hand ELSE 0 END) AS DOUBLE) /
      |                  sum(CASE WHEN d_date < CAST('2000-03-11' AS DATE)
      |                      THEN inv_quantity_on_hand ELSE 0 END)
      |             ELSE NULL END) BETWEEN 0.666667 AND 1.5
      |ORDER BY w_warehouse_name, i_item_id
      |LIMIT 100""".stripMargin,

    "q22" -> """
      |SELECT i_product_name, i_brand, i_class, i_category,
      |       round(avg(inv_quantity_on_hand), 6) AS qoh
      |FROM inventory, date_dim, item
      |WHERE inv_date_sk = d_date_sk AND inv_item_sk = i_item_sk
      |  AND d_month_seq BETWEEN 1200 AND 1211
      |GROUP BY ROLLUP(i_product_name, i_brand, i_class, i_category)
      |ORDER BY qoh NULLS FIRST, i_product_name NULLS FIRST, i_brand NULLS FIRST,
      |         i_class NULLS FIRST, i_category NULLS FIRST
      |LIMIT 100""".stripMargin,

    "q27" -> s"""
      |SELECT i_item_id, s_state, CAST(grouping(s_state) AS INT) AS g_state,
      |       round(avg(ss_quantity), 4) AS agg1,
      |       ${avgC("ss_list_price")} AS agg2,
      |       ${avgC("ss_coupon_amt")} AS agg3,
      |       ${avgC("ss_sales_price")} AS agg4
      |FROM store_sales, customer_demographics, date_dim, store, item
      |WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
      |  AND ss_store_sk = s_store_sk AND ss_cdemo_sk = cd_demo_sk
      |  AND cd_gender = 'M' AND cd_marital_status = 'S'
      |  AND cd_education_status = 'College'
      |  AND d_year = 2002 AND s_state IN ('TN', 'GA', 'CA', 'WA', 'NY', 'TX')
      |GROUP BY ROLLUP(i_item_id, s_state)
      |ORDER BY i_item_id NULLS FIRST, s_state NULLS FIRST
      |LIMIT 100""".stripMargin,

    "q28" -> s"""
      |SELECT b1.b1_lp, b1.b1_cnt, b1.b1_cntd,
      |       b2.b2_lp, b2.b2_cnt, b2.b2_cntd,
      |       b3.b3_lp, b3.b3_cnt, b3.b3_cntd
      |FROM (SELECT ${avgC("ss_list_price")} AS b1_lp,
      |             CAST(count(ss_list_price) AS BIGINT) AS b1_cnt,
      |             CAST(count(DISTINCT ss_list_price) AS BIGINT) AS b1_cntd
      |      FROM store_sales
      |      WHERE ss_quantity BETWEEN 0 AND 5
      |        AND (ss_list_price BETWEEN 10 AND 20
      |             OR ss_coupon_amt BETWEEN 0 AND 100
      |             OR ss_wholesale_cost BETWEEN 10 AND 30)) b1,
      |     (SELECT ${avgC("ss_list_price")} AS b2_lp,
      |             CAST(count(ss_list_price) AS BIGINT) AS b2_cnt,
      |             CAST(count(DISTINCT ss_list_price) AS BIGINT) AS b2_cntd
      |      FROM store_sales
      |      WHERE ss_quantity BETWEEN 6 AND 10
      |        AND (ss_list_price BETWEEN 20 AND 30
      |             OR ss_coupon_amt BETWEEN 0 AND 200
      |             OR ss_wholesale_cost BETWEEN 20 AND 40)) b2,
      |     (SELECT ${avgC("ss_list_price")} AS b3_lp,
      |             CAST(count(ss_list_price) AS BIGINT) AS b3_cnt,
      |             CAST(count(DISTINCT ss_list_price) AS BIGINT) AS b3_cntd
      |      FROM store_sales
      |      WHERE ss_quantity BETWEEN 11 AND 15
      |        AND (ss_list_price BETWEEN 30 AND 40
      |             OR ss_coupon_amt BETWEEN 0 AND 300
      |             OR ss_wholesale_cost BETWEEN 30 AND 50)) b3""".stripMargin,

    "q34" -> """
      |SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
      |       ss_ticket_number, cnt
      |FROM (SELECT ss_ticket_number, ss_customer_sk, CAST(count(*) AS BIGINT) AS cnt
      |      FROM store_sales, date_dim, store, household_demographics
      |      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |        AND store_sales.ss_store_sk = store.s_store_sk
      |        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
      |        AND (date_dim.d_dom BETWEEN 1 AND 3 OR date_dim.d_dom BETWEEN 25 AND 28)
      |        AND (household_demographics.hd_buy_potential = '>10000'
      |             OR household_demographics.hd_buy_potential = 'Unknown')
      |        AND household_demographics.hd_vehicle_count > 0
      |        AND (CASE WHEN household_demographics.hd_vehicle_count > 0
      |                  THEN CAST(household_demographics.hd_dep_count AS DOUBLE) /
      |                       household_demographics.hd_vehicle_count
      |                  ELSE NULL END) > 1.2
      |        AND date_dim.d_year IN (1999, 2000, 2001)
      |        AND store.s_county IN ('Williamson County', 'Walker County',
      |                               'Ziebach County', 'Luce County',
      |                               'Furnas County', 'Richland County',
      |                               'Huron County', 'Bronx County')
      |      GROUP BY ss_ticket_number, ss_customer_sk) dn, customer
      |WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 1 AND 3
      |ORDER BY c_last_name NULLS FIRST, c_first_name NULLS FIRST,
      |         c_salutation NULLS FIRST, c_preferred_cust_flag DESC NULLS FIRST,
      |         ss_ticket_number, cnt""".stripMargin,

    "q36" -> """
      |SELECT round(CAST(sum(ss_net_profit) AS DOUBLE) /
      |             CAST(sum(ss_ext_sales_price) AS DOUBLE), 6) AS gross_margin,
      |       i_category, i_class,
      |       CAST(grouping(i_category) + grouping(i_class) AS INT) AS lochierarchy,
      |       CAST(rank() OVER (
      |         PARTITION BY grouping(i_category) + grouping(i_class),
      |           CASE WHEN grouping(i_class) = 1 THEN i_category END
      |         ORDER BY sum(ss_net_profit) / sum(ss_ext_sales_price) ASC) AS BIGINT)
      |         AS rank_within_parent
      |FROM store_sales, date_dim d1, item, store
      |WHERE d1.d_year = 2001 AND d1.d_date_sk = ss_sold_date_sk
      |  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
      |  AND s_state IN ('TN', 'GA', 'CA', 'WA', 'NY', 'TX', 'OH', 'IL')
      |GROUP BY ROLLUP(i_category, i_class)
      |ORDER BY lochierarchy DESC, CASE WHEN grouping(i_category) + grouping(i_class) = 0
      |         THEN i_category END NULLS FIRST, rank_within_parent, gross_margin,
      |         i_category NULLS FIRST, i_class NULLS FIRST
      |LIMIT 100""".stripMargin,

    "q38" -> """
      |SELECT CAST(count(*) AS BIGINT) AS cnt FROM (
      |  SELECT DISTINCT c_last_name, c_first_name, d_date
      |  FROM store_sales, date_dim, customer
      |  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |    AND store_sales.ss_customer_sk = customer.c_customer_sk
      |    AND d_month_seq BETWEEN 1200 AND 1211
      |  INTERSECT
      |  SELECT DISTINCT c_last_name, c_first_name, d_date
      |  FROM catalog_sales, date_dim, customer
      |  WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
      |    AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
      |    AND d_month_seq BETWEEN 1200 AND 1211
      |  INTERSECT
      |  SELECT DISTINCT c_last_name, c_first_name, d_date
      |  FROM web_sales, date_dim, customer
      |  WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
      |    AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
      |    AND d_month_seq BETWEEN 1200 AND 1211
      |) hot_cust""".stripMargin,

    "q41" -> """
      |SELECT DISTINCT i_product_name
      |FROM item i1
      |WHERE i_manufact_id BETWEEN 70 AND 110
      |  AND (SELECT count(*) AS item_cnt FROM item
      |       WHERE (i_manufact = i1.i_manufact
      |              AND ((i_category = 'Women' AND i_color IN ('red', 'blue')
      |                    AND i_units IN ('Each', 'Dozen'))
      |                   OR (i_category = 'Men' AND i_color IN ('black', 'white')
      |                       AND i_units IN ('Case', 'Pallet'))))
      |          OR (i_manufact = i1.i_manufact
      |              AND ((i_category = 'Women' AND i_color IN ('green', 'yellow')
      |                    AND i_units IN ('Gross', 'Each'))
      |                   OR (i_category = 'Men' AND i_color IN ('navy', 'purple')
      |                       AND i_units IN ('Dozen', 'Case'))))) > 0
      |ORDER BY i_product_name
      |LIMIT 100""".stripMargin,

    "q45" -> """
      |SELECT ca_zip, ca_city,
      |       round(CAST(sum(ws_sales_price) AS DOUBLE), 2) AS sum_sales
      |FROM web_sales, customer, customer_address, date_dim, item
      |WHERE ws_bill_customer_sk = c_customer_sk
      |  AND c_current_addr_sk = ca_address_sk
      |  AND ws_item_sk = i_item_sk
      |  AND (substr(ca_zip, 1, 5) IN ('85669', '86197', '88274', '83405',
      |                                '86475', '85392', '85460', '80348', '81792')
      |       OR i_item_id IN (SELECT i_item_id FROM item
      |                        WHERE i_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)))
      |  AND ws_sold_date_sk = d_date_sk AND d_qoy = 2 AND d_year = 2001
      |GROUP BY ca_zip, ca_city
      |ORDER BY ca_zip, ca_city
      |LIMIT 100""".stripMargin,

    "q46" -> """
      |SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
      |       round(CAST(amt AS DOUBLE), 2) AS amt,
      |       round(CAST(profit AS DOUBLE), 2) AS profit
      |FROM (SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
      |             sum(ss_coupon_amt) AS amt, sum(ss_net_profit) AS profit
      |      FROM store_sales, date_dim, store, household_demographics,
      |           customer_address
      |      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |        AND store_sales.ss_store_sk = store.s_store_sk
      |        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
      |        AND store_sales.ss_addr_sk = customer_address.ca_address_sk
      |        AND (household_demographics.hd_dep_count = 4
      |             OR household_demographics.hd_vehicle_count = 3)
      |        AND date_dim.d_dow IN (6, 0)
      |        AND date_dim.d_year IN (1999, 2000, 2001)
      |        AND store.s_city IN ('Midway', 'Fairview', 'Oak Grove',
      |                             'Five Points', 'Pleasant Hill')
      |      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
      |     customer, customer_address current_addr
      |WHERE ss_customer_sk = c_customer_sk
      |  AND customer.c_current_addr_sk = current_addr.ca_address_sk
      |  AND current_addr.ca_city <> bought_city
      |ORDER BY c_last_name NULLS FIRST, c_first_name NULLS FIRST,
      |         ca_city NULLS FIRST, bought_city NULLS FIRST, ss_ticket_number,
      |         amt, profit
      |LIMIT 100""".stripMargin,

    "q47" -> """
      |WITH v1 AS (
      |  SELECT i_category, i_brand, s_store_name, s_company_name,
      |         d_year, d_moy,
      |         CAST(round(CAST(sum(ss_sales_price) * 100 AS DOUBLE)) AS BIGINT) AS sum_cents,
      |         avg(CAST(round(CAST(sum(ss_sales_price) * 100 AS DOUBLE)) AS BIGINT)) OVER
      |           (PARTITION BY i_category, i_brand, s_store_name,
      |                         s_company_name, d_year) AS avg_cents,
      |         rank() OVER
      |           (PARTITION BY i_category, i_brand, s_store_name, s_company_name
      |            ORDER BY d_year, d_moy) AS rn
      |  FROM item, store_sales, date_dim, store
      |  WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
      |    AND ss_store_sk = s_store_sk
      |    AND (d_year = 2000 OR (d_year = 1999 AND d_moy = 12)
      |         OR (d_year = 2001 AND d_moy = 1))
      |  GROUP BY i_category, i_brand, s_store_name, s_company_name, d_year, d_moy),
      |v2 AS (
      |  SELECT v1.i_category, v1.i_brand, v1.s_store_name, v1.s_company_name,
      |         v1.d_year, v1.d_moy, v1.avg_cents, v1.sum_cents,
      |         v1_lag.sum_cents AS psum_cents, v1_lead.sum_cents AS nsum_cents
      |  FROM v1, v1 v1_lag, v1 v1_lead
      |  WHERE v1.i_category = v1_lag.i_category
      |    AND v1.i_category = v1_lead.i_category
      |    AND v1.i_brand = v1_lag.i_brand AND v1.i_brand = v1_lead.i_brand
      |    AND v1.s_store_name = v1_lag.s_store_name
      |    AND v1.s_store_name = v1_lead.s_store_name
      |    AND v1.s_company_name = v1_lag.s_company_name
      |    AND v1.s_company_name = v1_lead.s_company_name
      |    AND v1.rn = v1_lag.rn + 1 AND v1.rn = v1_lead.rn - 1)
      |SELECT i_category, i_brand, s_store_name, s_company_name, d_year, d_moy,
      |       round(avg_cents) / 100 AS avg_monthly_sales,
      |       CAST(sum_cents AS DOUBLE) / 100 AS sum_sales,
      |       CAST(psum_cents AS DOUBLE) / 100 AS psum, CAST(nsum_cents AS DOUBLE) / 100 AS nsum
      |FROM v2
      |WHERE d_year = 2000 AND avg_cents > 0
      |  AND CASE WHEN avg_cents > 0
      |           THEN abs(sum_cents - avg_cents) / avg_cents
      |           ELSE NULL END > 0.1
      |ORDER BY sum_cents - avg_cents, i_category, i_brand,
      |         s_store_name, s_company_name, d_year, d_moy, sum_cents,
      |         psum_cents, nsum_cents
      |LIMIT 100""".stripMargin,

    "q48" -> """
      |SELECT CAST(sum(ss_quantity) AS BIGINT) AS total_qty
      |FROM store_sales, store, customer_demographics, customer_address, date_dim
      |WHERE s_store_sk = ss_store_sk AND ss_sold_date_sk = d_date_sk
      |  AND d_year = 2000
      |  AND ((cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'M'
      |        AND cd_education_status = '4 yr Degree'
      |        AND ss_sales_price BETWEEN 100 AND 150)
      |       OR (cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'D'
      |        AND cd_education_status = '2 yr Degree'
      |        AND ss_sales_price BETWEEN 50 AND 100)
      |       OR (cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'S'
      |        AND cd_education_status = 'College'
      |        AND ss_sales_price BETWEEN 150 AND 200))
      |  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
      |        AND ca_state IN ('CO', 'OH', 'TX')
      |        AND ss_net_profit BETWEEN 0 AND 2000)
      |       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
      |        AND ca_state IN ('OR', 'MN', 'KY')
      |        AND ss_net_profit BETWEEN 150 AND 3000)
      |       OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
      |        AND ca_state IN ('VA', 'CA', 'MS')
      |        AND ss_net_profit BETWEEN 50 AND 25000))""".stripMargin,

    "q53" -> """
      |SELECT manufact_id, CAST(sum_cents AS DOUBLE) / 100 AS sum_sales,
      |       round(avg_cents) / 100 AS avg_quarterly_sales
      |FROM (SELECT i_manufact_id AS manufact_id,
      |             CAST(round(CAST(sum(ss_sales_price) * 100 AS DOUBLE)) AS BIGINT) AS sum_cents,
      |             avg(CAST(round(CAST(sum(ss_sales_price) * 100 AS DOUBLE)) AS BIGINT)) OVER
      |               (PARTITION BY i_manufact_id) AS avg_cents
      |      FROM item, store_sales, date_dim, store
      |      WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
      |        AND ss_store_sk = s_store_sk
      |        AND d_month_seq IN (1200, 1201, 1202, 1203, 1204, 1205, 1206,
      |                            1207, 1208, 1209, 1210, 1211)
      |        AND ((i_category IN ('Books', 'Children', 'Electronics')
      |              AND i_class IN ('class01', 'class02', 'class03'))
      |             OR (i_category IN ('Women', 'Music', 'Men')
      |              AND i_class IN ('class04', 'class05', 'class06')))
      |      GROUP BY i_manufact_id, d_qoy) tmp1
      |WHERE CASE WHEN avg_cents > 0
      |           THEN abs(sum_cents - avg_cents) / avg_cents
      |           ELSE NULL END > 0.1
      |ORDER BY avg_cents, sum_cents, manufact_id
      |LIMIT 100""".stripMargin,

    "q59" -> """
      |WITH wss AS (
      |  SELECT d_week_seq, ss_store_sk,
      |         round(CAST(sum(CASE WHEN d_day_name = 'Sunday' THEN ss_sales_price ELSE NULL END) AS DOUBLE), 2) AS sun_sales,
      |         round(CAST(sum(CASE WHEN d_day_name = 'Monday' THEN ss_sales_price ELSE NULL END) AS DOUBLE), 2) AS mon_sales,
      |         round(CAST(sum(CASE WHEN d_day_name = 'Tuesday' THEN ss_sales_price ELSE NULL END) AS DOUBLE), 2) AS tue_sales,
      |         round(CAST(sum(CASE WHEN d_day_name = 'Wednesday' THEN ss_sales_price ELSE NULL END) AS DOUBLE), 2) AS wed_sales,
      |         round(CAST(sum(CASE WHEN d_day_name = 'Thursday' THEN ss_sales_price ELSE NULL END) AS DOUBLE), 2) AS thu_sales,
      |         round(CAST(sum(CASE WHEN d_day_name = 'Friday' THEN ss_sales_price ELSE NULL END) AS DOUBLE), 2) AS fri_sales,
      |         round(CAST(sum(CASE WHEN d_day_name = 'Saturday' THEN ss_sales_price ELSE NULL END) AS DOUBLE), 2) AS sat_sales
      |  FROM store_sales, date_dim
      |  WHERE d_date_sk = ss_sold_date_sk
      |  GROUP BY d_week_seq, ss_store_sk)
      |SELECT s_store_name1, s_store_id1, d_week_seq1,
      |       round(sun_sales1 / sun_sales2, 4) AS sun_r,
      |       round(mon_sales1 / mon_sales2, 4) AS mon_r,
      |       round(tue_sales1 / tue_sales2, 4) AS tue_r,
      |       round(wed_sales1 / wed_sales2, 4) AS wed_r,
      |       round(thu_sales1 / thu_sales2, 4) AS thu_r,
      |       round(fri_sales1 / fri_sales2, 4) AS fri_r,
      |       round(sat_sales1 / sat_sales2, 4) AS sat_r
      |FROM (SELECT s_store_name AS s_store_name1, wss.d_week_seq AS d_week_seq1,
      |             s_store_id AS s_store_id1, sun_sales AS sun_sales1,
      |             mon_sales AS mon_sales1, tue_sales AS tue_sales1,
      |             wed_sales AS wed_sales1, thu_sales AS thu_sales1,
      |             fri_sales AS fri_sales1, sat_sales AS sat_sales1
      |      FROM wss, store, date_dim d
      |      WHERE d.d_week_seq = wss.d_week_seq AND ss_store_sk = s_store_sk
      |        AND d_month_seq BETWEEN 1176 AND 1187) y,
      |     (SELECT s_store_name AS s_store_name2, wss.d_week_seq AS d_week_seq2,
      |             s_store_id AS s_store_id2, sun_sales AS sun_sales2,
      |             mon_sales AS mon_sales2, tue_sales AS tue_sales2,
      |             wed_sales AS wed_sales2, thu_sales AS thu_sales2,
      |             fri_sales AS fri_sales2, sat_sales AS sat_sales2
      |      FROM wss, store, date_dim d
      |      WHERE d.d_week_seq = wss.d_week_seq AND ss_store_sk = s_store_sk
      |        AND d_month_seq BETWEEN 1188 AND 1199) x
      |WHERE s_store_id1 = s_store_id2 AND d_week_seq1 = d_week_seq2 - 52
      |ORDER BY s_store_name1, s_store_id1, d_week_seq1,
      |         sun_r, mon_r, tue_r, wed_r, thu_r, fri_r, sat_r
      |LIMIT 100""".stripMargin,

    "q70" -> """
      |SELECT round(CAST(sum(ss_net_profit) AS DOUBLE), 2) AS total_sum,
      |       s_state, s_county,
      |       CAST(grouping(s_state) + grouping(s_county) AS INT) AS lochierarchy,
      |       CAST(rank() OVER (
      |         PARTITION BY grouping(s_state) + grouping(s_county),
      |           CASE WHEN grouping(s_county) = 1 THEN s_state END
      |         ORDER BY sum(ss_net_profit) DESC) AS BIGINT) AS rank_within_parent
      |FROM store_sales, date_dim d1, store
      |WHERE d1.d_month_seq BETWEEN 1200 AND 1211
      |  AND d1.d_date_sk = ss_sold_date_sk AND s_store_sk = ss_store_sk
      |  AND s_state IN (SELECT s_state
      |                  FROM (SELECT s_state,
      |                               rank() OVER (PARTITION BY s_state
      |                                 ORDER BY sum(ss_net_profit) DESC) AS ranking
      |                        FROM store_sales, store, date_dim
      |                        WHERE d_month_seq BETWEEN 1200 AND 1211
      |                          AND d_date_sk = ss_sold_date_sk
      |                          AND s_store_sk = ss_store_sk
      |                        GROUP BY s_state) tmp1
      |                  WHERE ranking <= 5)
      |GROUP BY ROLLUP(s_state, s_county)
      |ORDER BY lochierarchy DESC,
      |         CASE WHEN grouping(s_state) + grouping(s_county) = 0
      |              THEN s_state END NULLS FIRST,
      |         rank_within_parent, total_sum, s_state NULLS FIRST,
      |         s_county NULLS FIRST
      |LIMIT 100""".stripMargin,

    "q79" -> """
      |SELECT c_last_name, c_first_name, substr(s_city, 1, 30) AS city,
      |       ss_ticket_number,
      |       round(CAST(amt AS DOUBLE), 2) AS amt,
      |       round(CAST(profit AS DOUBLE), 2) AS profit
      |FROM (SELECT ss_ticket_number, ss_customer_sk, store.s_city,
      |             sum(ss_coupon_amt) AS amt, sum(ss_net_profit) AS profit
      |      FROM store_sales, date_dim, store, household_demographics
      |      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |        AND store_sales.ss_store_sk = store.s_store_sk
      |        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
      |        AND (household_demographics.hd_dep_count = 6
      |             OR household_demographics.hd_vehicle_count > 2)
      |        AND date_dim.d_dow = 1
      |        AND date_dim.d_year IN (1999, 2000, 2001)
      |        AND store.s_number_employees BETWEEN 200 AND 295
      |      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk,
      |               store.s_city) ms, customer
      |WHERE ss_customer_sk = c_customer_sk
      |ORDER BY c_last_name NULLS FIRST, c_first_name NULLS FIRST, city,
      |         profit, ss_ticket_number, amt
      |LIMIT 100""".stripMargin,

    "q82" -> """
      |SELECT i_item_id, i_item_desc,
      |       round(CAST(i_current_price AS DOUBLE), 2) AS i_current_price
      |FROM item, inventory, date_dim, store_sales
      |WHERE i_current_price BETWEEN 30 AND 60
      |  AND inv_item_sk = i_item_sk
      |  AND d_date_sk = inv_date_sk
      |  AND d_date BETWEEN CAST('2000-05-25' AS DATE) AND CAST('2000-07-24' AS DATE)
      |  AND i_manufact_id IN (16, 45, 93, 138)
      |  AND inv_quantity_on_hand BETWEEN 100 AND 500
      |  AND ss_item_sk = i_item_sk
      |GROUP BY i_item_id, i_item_desc, i_current_price
      |ORDER BY i_item_id, i_item_desc, i_current_price
      |LIMIT 100""".stripMargin,

    "q85" -> s"""
      |SELECT substr(r_reason_desc, 1, 20) AS reason,
      |       round(avg(ws_quantity), 4) AS avg_qty,
      |       ${avgC("wr_refunded_cash")} AS avg_refunded,
      |       ${avgC("wr_fee")} AS avg_fee
      |FROM web_sales, web_returns, web_page, customer_demographics cd1,
      |     customer_demographics cd2, customer_address, date_dim, reason
      |WHERE ws_web_page_sk = wp_web_page_sk
      |  AND ws_item_sk = wr_item_sk
      |  AND ws_order_number = wr_order_number
      |  AND ws_sold_date_sk = d_date_sk AND d_year = 2000
      |  AND cd1.cd_demo_sk = wr_refunded_cdemo_sk
      |  AND cd2.cd_demo_sk = wr_returning_cdemo_sk
      |  AND ca_address_sk = wr_refunded_addr_sk
      |  AND r_reason_sk = wr_reason_sk
      |  AND ((cd1.cd_marital_status = 'M'
      |        AND cd1.cd_marital_status = cd2.cd_marital_status
      |        AND cd1.cd_education_status = 'Advanced Degree'
      |        AND cd1.cd_education_status = cd2.cd_education_status
      |        AND ws_sales_price BETWEEN 100 AND 150)
      |       OR (cd1.cd_marital_status = 'S'
      |        AND cd1.cd_marital_status = cd2.cd_marital_status
      |        AND cd1.cd_education_status = 'College'
      |        AND cd1.cd_education_status = cd2.cd_education_status
      |        AND ws_sales_price BETWEEN 50 AND 100)
      |       OR (cd1.cd_marital_status = 'W'
      |        AND cd1.cd_marital_status = cd2.cd_marital_status
      |        AND cd1.cd_education_status = '2 yr Degree'
      |        AND cd1.cd_education_status = cd2.cd_education_status
      |        AND ws_sales_price BETWEEN 150 AND 200))
      |  AND ((ca_country = 'United States' AND ca_state IN ('TN', 'GA', 'CA')
      |        AND ws_net_profit BETWEEN 0 AND 2000)
      |       OR (ca_country = 'United States' AND ca_state IN ('WA', 'NY', 'TX')
      |        AND ws_net_profit BETWEEN 150 AND 3000)
      |       OR (ca_country = 'United States' AND ca_state IN ('OH', 'IL', 'SD')
      |        AND ws_net_profit BETWEEN 50 AND 25000))
      |GROUP BY r_reason_desc
      |ORDER BY reason, avg_qty, avg_refunded, avg_fee
      |LIMIT 100""".stripMargin,

    "q86" -> """
      |SELECT round(CAST(sum(ws_net_paid) AS DOUBLE), 2) AS total_sum,
      |       i_category, i_class,
      |       CAST(grouping(i_category) + grouping(i_class) AS INT) AS lochierarchy,
      |       CAST(rank() OVER (
      |         PARTITION BY grouping(i_category) + grouping(i_class),
      |           CASE WHEN grouping(i_class) = 1 THEN i_category END
      |         ORDER BY sum(ws_net_paid) DESC) AS BIGINT) AS rank_within_parent
      |FROM web_sales, date_dim d1, item
      |WHERE d1.d_month_seq BETWEEN 1200 AND 1211
      |  AND d1.d_date_sk = ws_sold_date_sk AND i_item_sk = ws_item_sk
      |GROUP BY ROLLUP(i_category, i_class)
      |ORDER BY lochierarchy DESC,
      |         CASE WHEN grouping(i_category) + grouping(i_class) = 0
      |              THEN i_category END NULLS FIRST,
      |         rank_within_parent, total_sum, i_category NULLS FIRST,
      |         i_class NULLS FIRST
      |LIMIT 100""".stripMargin,

    "q87" -> """
      |SELECT CAST(count(*) AS BIGINT) AS cnt FROM (
      |  (SELECT DISTINCT c_last_name, c_first_name, d_date
      |   FROM store_sales, date_dim, customer
      |   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |     AND store_sales.ss_customer_sk = customer.c_customer_sk
      |     AND d_month_seq BETWEEN 1200 AND 1211)
      |  EXCEPT
      |  (SELECT DISTINCT c_last_name, c_first_name, d_date
      |   FROM catalog_sales, date_dim, customer
      |   WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
      |     AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
      |     AND d_month_seq BETWEEN 1200 AND 1211)
      |  EXCEPT
      |  (SELECT DISTINCT c_last_name, c_first_name, d_date
      |   FROM web_sales, date_dim, customer
      |   WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
      |     AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
      |     AND d_month_seq BETWEEN 1200 AND 1211)
      |) cool_cust""".stripMargin,

    "q89" -> """
      |SELECT i_category, i_class, i_brand, s_store_name, s_company_name,
      |       d_moy, CAST(sum_cents AS DOUBLE) / 100 AS sum_sales,
      |       round(avg_cents) / 100 AS avg_monthly_sales
      |FROM (SELECT i_category, i_class, i_brand, s_store_name, s_company_name,
      |             d_moy,
      |             CAST(round(CAST(sum(ss_sales_price) * 100 AS DOUBLE)) AS BIGINT) AS sum_cents,
      |             avg(CAST(round(CAST(sum(ss_sales_price) * 100 AS DOUBLE)) AS BIGINT)) OVER
      |               (PARTITION BY i_category, i_brand, s_store_name,
      |                             s_company_name) AS avg_cents
      |      FROM item, store_sales, date_dim, store
      |      WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
      |        AND ss_store_sk = s_store_sk AND d_year = 1999
      |        AND ((i_category IN ('Books', 'Electronics', 'Sports')
      |              AND i_class IN ('class01', 'class02', 'class03'))
      |             OR (i_category IN ('Men', 'Jewelry', 'Women')
      |              AND i_class IN ('class04', 'class05', 'class06')))
      |      GROUP BY i_category, i_class, i_brand, s_store_name,
      |               s_company_name, d_moy) tmp1
      |WHERE CASE WHEN avg_cents <> 0
      |           THEN abs(sum_cents - avg_cents) / avg_cents
      |           ELSE NULL END > 0.1
      |ORDER BY sum_cents - avg_cents, s_store_name, i_category,
      |         i_class, i_brand, s_company_name, d_moy, sum_cents,
      |         avg_cents
      |LIMIT 100""".stripMargin,

    "q94" -> """
      |SELECT CAST(count(DISTINCT ws_order_number) AS BIGINT) AS order_count,
      |       round(CAST(sum(ws_ext_ship_cost) AS DOUBLE), 2) AS total_shipping_cost,
      |       round(CAST(sum(ws_net_profit) AS DOUBLE), 2) AS total_net_profit
      |FROM web_sales ws1, date_dim, customer_address, web_site
      |WHERE d_date BETWEEN CAST('1999-02-01' AS DATE) AND CAST('1999-04-02' AS DATE)
      |  AND ws1.ws_ship_date_sk = d_date_sk
      |  AND ws1.ws_ship_addr_sk = ca_address_sk
      |  AND ca_state = 'CA'
      |  AND ws1.ws_web_site_sk = web_site_sk
      |  AND web_company_name = 'ought'
      |  AND EXISTS (SELECT * FROM web_sales ws2
      |              WHERE ws1.ws_order_number = ws2.ws_order_number
      |                AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
      |  AND NOT EXISTS (SELECT * FROM web_returns wr1
      |                  WHERE ws1.ws_order_number = wr1.wr_order_number)""".stripMargin,

    "q95" -> """
      |WITH ws_wh AS (
      |  SELECT ws1.ws_order_number
      |  FROM web_sales ws1, web_sales ws2
      |  WHERE ws1.ws_order_number = ws2.ws_order_number
      |    AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
      |SELECT CAST(count(DISTINCT ws_order_number) AS BIGINT) AS order_count,
      |       round(CAST(sum(ws_ext_ship_cost) AS DOUBLE), 2) AS total_shipping_cost,
      |       round(CAST(sum(ws_net_profit) AS DOUBLE), 2) AS total_net_profit
      |FROM web_sales ws1, date_dim, customer_address, web_site
      |WHERE d_date BETWEEN CAST('1999-02-01' AS DATE) AND CAST('1999-04-02' AS DATE)
      |  AND ws1.ws_ship_date_sk = d_date_sk
      |  AND ws1.ws_ship_addr_sk = ca_address_sk
      |  AND ca_state = 'CA'
      |  AND ws1.ws_web_site_sk = web_site_sk
      |  AND web_company_name = 'ought'
      |  AND ws1.ws_order_number IN (SELECT ws_order_number FROM ws_wh)
      |  AND ws1.ws_order_number IN (SELECT wr_order_number
      |                              FROM web_returns, ws_wh
      |                              WHERE wr_order_number = ws_wh.ws_order_number)""".stripMargin)
}
