"""The Impala-kit TPC-DS corpus: 20 full-fidelity queries + suite groups.

This is the reference's dashboard workload — the three named suites at
ImpalaKitQueries.scala:1465-1469 (interactive / reporting / deepAnalytic,
20 distinct queries over the store-sales star schema), with query texts
re-derived from the public TPC-DS templates in the reference's Impala-kit
form (explicit JOIN syntax + julian ``ss_sold_date_sk`` partition-key
filters; texts at ImpalaKitQueries.scala:28-1015).

Correctness model: unlike the driver-testdata queries these run on the
generated 24-table schema, so the oracle is *engine-vs-engine*: the test
writes the generated tables to parquet and compares every query against
DuckDB executing the same SQL over the same files
(tests/test_impala_suite.py), plus the reference's own HashResults
run-to-run fingerprint stability.

Fidelity deviations (documented, intentional):
- q59: the reference text reuses the first half's julian range
  (2451088-2451452) for the second half whose d_month_seq window is one
  year later, which makes the join empty by construction; we use the
  range the comment declares ('1999-10-01'..'2000-09-30', julian
  2451453-2451817) so the query returns rows.
- MAPJOIN hints in the kit are Impala syntax; Spark's equivalent
  BROADCAST hint is exercised by the suite runner's broadcast variation
  (and j9 in the driver registry).
"""

from __future__ import annotations

from ..query import Query

INTERACTIVE = ("q19", "q42", "q52", "q55", "q63", "q68", "q73", "q98")
REPORTING = ("q3", "q7", "q27", "q43", "q53", "q89")
DEEP_ANALYTIC = ("q34", "q46", "q59", "q65", "q79", "ss_max")

IMPALA_QUERIES: dict[str, str] = {
    "q19": """
        select i_brand_id, i_brand, i_manufact_id, i_manufact,
               sum(ss_ext_sales_price) ext_price
        from store_sales
          join item on (store_sales.ss_item_sk = item.i_item_sk)
          join customer on (store_sales.ss_customer_sk = customer.c_customer_sk)
          join customer_address on (customer.c_current_addr_sk = customer_address.ca_address_sk)
          join store on (store_sales.ss_store_sk = store.s_store_sk)
          join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        where ss_sold_date_sk between 2451484 and 2451513
          and d_moy = 11 and d_year = 1999
          and i_manager_id = 7
          and substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
        group by i_brand, i_brand_id, i_manufact_id, i_manufact
        order by ext_price desc, i_brand, i_brand_id, i_manufact_id, i_manufact
        limit 100
    """,
    "q27": """
        select i_item_id, s_state,
               avg(ss_quantity) agg1, avg(ss_list_price) agg2,
               avg(ss_coupon_amt) agg3, avg(ss_sales_price) agg4
        from store_sales
          join store on (store_sales.ss_store_sk = store.s_store_sk)
          join customer_demographics on (store_sales.ss_cdemo_sk = customer_demographics.cd_demo_sk)
          join item on (store_sales.ss_item_sk = item.i_item_sk)
          join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        where ss_sold_date_sk between 2450815 and 2451179
          and d_year = 1998
          and s_state in ('WI', 'CA', 'TX', 'FL', 'WA', 'TN')
          and cd_gender = 'F' and cd_marital_status = 'W'
          and cd_education_status = 'Primary'
        group by i_item_id, s_state
        order by i_item_id, s_state
        limit 100
    """,
    "q3": """
        select dt.d_year, item.i_brand_id brand_id, item.i_brand brand,
               sum(ss_ext_sales_price) sum_agg
        from store_sales
          join item on (store_sales.ss_item_sk = item.i_item_sk)
          join date_dim dt on (dt.d_date_sk = store_sales.ss_sold_date_sk)
        where item.i_manufact_id = 436
          and dt.d_moy = 12
          and (ss_sold_date_sk between 2451149 and 2451179
            or ss_sold_date_sk between 2451514 and 2451544
            or ss_sold_date_sk between 2451880 and 2451910
            or ss_sold_date_sk between 2452245 and 2452275
            or ss_sold_date_sk between 2452610 and 2452640)
        group by d_year, item.i_brand, item.i_brand_id
        order by d_year, sum_agg desc, brand_id
        limit 100
    """,
    "q34": """
        select c_last_name, c_first_name, c_salutation,
               c_preferred_cust_flag, ss_ticket_number, cnt
        from
          (select ss_ticket_number, ss_customer_sk, count(*) cnt
           from store_sales
             join household_demographics on (store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk)
             join store on (store_sales.ss_store_sk = store.s_store_sk)
             join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
           where date_dim.d_year in (1998, 1998 + 1, 1998 + 2)
             and (date_dim.d_dom between 1 and 3 or date_dim.d_dom between 25 and 28)
             and (household_demographics.hd_buy_potential = '>10000'
               or household_demographics.hd_buy_potential = 'unknown')
             and household_demographics.hd_vehicle_count > 0
             and (case when household_demographics.hd_vehicle_count > 0
                  then household_demographics.hd_dep_count / household_demographics.hd_vehicle_count
                  else null end) > 1.2
             and store.s_county in ('Saginaw County', 'Sumner County', 'Appanoose County',
                                    'Daviess County', 'Fairfield County', 'Raleigh County',
                                    'Ziebach County', 'Williamson County')
             and ss_sold_date_sk between 2450816 and 2451910
           group by ss_ticket_number, ss_customer_sk) dn
          join customer on (dn.ss_customer_sk = customer.c_customer_sk)
        where cnt between 15 and 20
        order by c_last_name, c_first_name, c_salutation,
                 c_preferred_cust_flag desc, ss_ticket_number, cnt
        limit 1000
    """,
    "q42": """
        select d_year, i_category_id, i_category,
               sum(ss_ext_sales_price) as total_price
        from store_sales
          join item on (store_sales.ss_item_sk = item.i_item_sk)
          join date_dim dt on (dt.d_date_sk = store_sales.ss_sold_date_sk)
        where item.i_manager_id = 1
          and dt.d_moy = 12 and dt.d_year = 1998
          and ss_sold_date_sk between 2451149 and 2451179
        group by d_year, i_category_id, i_category
        order by total_price desc, d_year, i_category_id, i_category
        limit 100
    """,
    "q43": """
        select s_store_name, s_store_id,
               sum(case when (d_day_name = 'Sunday') then ss_sales_price else null end) sun_sales,
               sum(case when (d_day_name = 'Monday') then ss_sales_price else null end) mon_sales,
               sum(case when (d_day_name = 'Tuesday') then ss_sales_price else null end) tue_sales,
               sum(case when (d_day_name = 'Wednesday') then ss_sales_price else null end) wed_sales,
               sum(case when (d_day_name = 'Thursday') then ss_sales_price else null end) thu_sales,
               sum(case when (d_day_name = 'Friday') then ss_sales_price else null end) fri_sales,
               sum(case when (d_day_name = 'Saturday') then ss_sales_price else null end) sat_sales
        from store_sales
          join store on (store_sales.ss_store_sk = store.s_store_sk)
          join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        where s_gmt_offset = -5 and d_year = 1998
          and ss_sold_date_sk between 2450816 and 2451179
        group by s_store_name, s_store_id
        order by s_store_name, s_store_id, sun_sales, mon_sales, tue_sales,
                 wed_sales, thu_sales, fri_sales, sat_sales
        limit 100
    """,
    "q46": """
        select c_last_name, c_first_name, ca_city, bought_city,
               ss_ticket_number, amt, profit
        from
          (select ss_ticket_number, ss_customer_sk, ca_city bought_city,
                  sum(ss_coupon_amt) amt, sum(ss_net_profit) profit
           from store_sales
             join store on (store_sales.ss_store_sk = store.s_store_sk)
             join household_demographics on (store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk)
             join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
             join customer_address on (store_sales.ss_addr_sk = customer_address.ca_address_sk)
           where store.s_city in ('Midway', 'Concord', 'Spring Hill', 'Brownsville', 'Greenville')
             and (household_demographics.hd_dep_count = 5
               or household_demographics.hd_vehicle_count = 3)
             and date_dim.d_dow in (6, 0)
             and date_dim.d_year in (1999, 1999 + 1, 1999 + 2)
             and ss_sold_date_sk between 2451180 and 2452275
           group by ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn
          join customer on (dn.ss_customer_sk = customer.c_customer_sk)
          join customer_address current_addr on (customer.c_current_addr_sk = current_addr.ca_address_sk)
        where current_addr.ca_city <> bought_city
        order by c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number
        limit 100
    """,
    "q52": """
        select d_year, i_brand_id, i_brand, sum(ss_ext_sales_price) ext_price
        from store_sales
          join item on (store_sales.ss_item_sk = item.i_item_sk)
          join date_dim dt on (store_sales.ss_sold_date_sk = dt.d_date_sk)
        where i_manager_id = 1 and d_moy = 12 and d_year = 1998
          and ss_sold_date_sk between 2451149 and 2451179
        group by d_year, i_brand, i_brand_id
        order by d_year, ext_price desc, i_brand_id
        limit 100
    """,
    "q53": """
        select *
        from
          (select i_manufact_id, sum(ss_sales_price) sum_sales
           from store_sales
             join item on (store_sales.ss_item_sk = item.i_item_sk)
             join store on (store_sales.ss_store_sk = store.s_store_sk)
             join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
           where ss_sold_date_sk between 2451911 and 2452275
             and d_month_seq in (1212, 1212 + 1, 1212 + 2, 1212 + 3, 1212 + 4, 1212 + 5,
                                 1212 + 6, 1212 + 7, 1212 + 8, 1212 + 9, 1212 + 10, 1212 + 11)
             and ((i_category in ('Books', 'Children', 'Electronics')
                   and i_class in ('personal', 'portable', 'reference', 'self-help')
                   and i_brand in ('scholaramalgamalg #14', 'scholaramalgamalg #7',
                                   'exportiunivamalg #9', 'scholaramalgamalg #9'))
               or (i_category in ('Women', 'Music', 'Men')
                   and i_class in ('accessories', 'classical', 'fragrances', 'pants')
                   and i_brand in ('amalgimporto #1', 'edu packscholar #1',
                                   'exportiimporto #1', 'importoamalg #1')))
           group by i_manufact_id, d_qoy) tmp1
        order by sum_sales, i_manufact_id
        limit 100
    """,
    "q55": """
        select i_brand_id, i_brand, sum(ss_ext_sales_price) ext_price
        from store_sales
          join item on (store_sales.ss_item_sk = item.i_item_sk)
          join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        where i_manager_id = 36 and d_moy = 12 and d_year = 2001
          and ss_sold_date_sk between 2452245 and 2452275
        group by i_brand, i_brand_id
        order by ext_price desc, i_brand_id
        limit 100
    """,
    "q59": """
        select s_store_name1, s_store_id1, d_week_seq1,
               sun_sales1 / sun_sales2 sun_ratio, mon_sales1 / mon_sales2 mon_ratio,
               tue_sales1 / tue_sales2 tue_ratio, wed_sales1 / wed_sales2 wed_ratio,
               thu_sales1 / thu_sales2 thu_ratio, fri_sales1 / fri_sales2 fri_ratio,
               sat_sales1 / sat_sales2 sat_ratio
        from
          (select s_store_name s_store_name1, wss.d_week_seq d_week_seq1,
                  s_store_id s_store_id1, sun_sales sun_sales1, mon_sales mon_sales1,
                  tue_sales tue_sales1, wed_sales wed_sales1, thu_sales thu_sales1,
                  fri_sales fri_sales1, sat_sales sat_sales1
           from
             (select d_week_seq, ss_store_sk,
                     sum(case when (d_day_name = 'Sunday') then ss_sales_price else null end) sun_sales,
                     sum(case when (d_day_name = 'Monday') then ss_sales_price else null end) mon_sales,
                     sum(case when (d_day_name = 'Tuesday') then ss_sales_price else null end) tue_sales,
                     sum(case when (d_day_name = 'Wednesday') then ss_sales_price else null end) wed_sales,
                     sum(case when (d_day_name = 'Thursday') then ss_sales_price else null end) thu_sales,
                     sum(case when (d_day_name = 'Friday') then ss_sales_price else null end) fri_sales,
                     sum(case when (d_day_name = 'Saturday') then ss_sales_price else null end) sat_sales
              from store_sales
                join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
              where ss_sold_date_sk between 2451088 and 2451452
              group by d_week_seq, ss_store_sk) wss
             join store on (wss.ss_store_sk = store.s_store_sk)
             join date_dim d on (wss.d_week_seq = d.d_week_seq)
           where d_month_seq between 1185 and 1185 + 11) y
          join
          (select s_store_name s_store_name2, wss.d_week_seq d_week_seq2,
                  s_store_id s_store_id2, sun_sales sun_sales2, mon_sales mon_sales2,
                  tue_sales tue_sales2, wed_sales wed_sales2, thu_sales thu_sales2,
                  fri_sales fri_sales2, sat_sales sat_sales2
           from
             (select d_week_seq, ss_store_sk,
                     sum(case when (d_day_name = 'Sunday') then ss_sales_price else null end) sun_sales,
                     sum(case when (d_day_name = 'Monday') then ss_sales_price else null end) mon_sales,
                     sum(case when (d_day_name = 'Tuesday') then ss_sales_price else null end) tue_sales,
                     sum(case when (d_day_name = 'Wednesday') then ss_sales_price else null end) wed_sales,
                     sum(case when (d_day_name = 'Thursday') then ss_sales_price else null end) thu_sales,
                     sum(case when (d_day_name = 'Friday') then ss_sales_price else null end) fri_sales,
                     sum(case when (d_day_name = 'Saturday') then ss_sales_price else null end) sat_sales
              from store_sales
                join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
              where ss_sold_date_sk between 2451453 and 2451817
              group by d_week_seq, ss_store_sk) wss
             join store on (wss.ss_store_sk = store.s_store_sk)
             join date_dim d on (wss.d_week_seq = d.d_week_seq)
           where d_month_seq between 1185 + 12 and 1185 + 23) x
          on (y.s_store_id1 = x.s_store_id2)
        where d_week_seq1 = d_week_seq2 - 52
        order by s_store_name1, s_store_id1, d_week_seq1
        limit 100
    """,
    "q63": """
        select *
        from
          (select i_manager_id, sum(ss_sales_price) sum_sales
           from store_sales
             join item on (store_sales.ss_item_sk = item.i_item_sk)
             join store on (store_sales.ss_store_sk = store.s_store_sk)
             join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
           where ss_sold_date_sk between 2451911 and 2452275
             and d_month_seq in (1212, 1212 + 1, 1212 + 2, 1212 + 3, 1212 + 4, 1212 + 5,
                                 1212 + 6, 1212 + 7, 1212 + 8, 1212 + 9, 1212 + 10, 1212 + 11)
             and ((i_category in ('Books', 'Children', 'Electronics')
                   and i_class in ('personal', 'portable', 'refernece', 'self-help')
                   and i_brand in ('scholaramalgamalg #14', 'scholaramalgamalg #7',
                                   'exportiunivamalg #9', 'scholaramalgamalg #9'))
               or (i_category in ('Women', 'Music', 'Men')
                   and i_class in ('accessories', 'classical', 'fragrances', 'pants')
                   and i_brand in ('amalgimporto #1', 'edu packscholar #1',
                                   'exportiimporto #1', 'importoamalg #1')))
           group by i_manager_id, d_moy) tmp1
        order by i_manager_id, sum_sales
        limit 100
    """,
    "q65": """
        select s_store_name, i_item_desc, sc.revenue, i_current_price,
               i_wholesale_cost, i_brand
        from
          (select ss_store_sk, ss_item_sk, sum(ss_sales_price) as revenue
           from store_sales
             join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
           where ss_sold_date_sk between 2451911 and 2452275
             and d_month_seq between 1212 and 1212 + 11
           group by ss_store_sk, ss_item_sk) sc
          join item on (sc.ss_item_sk = item.i_item_sk)
          join store on (sc.ss_store_sk = store.s_store_sk)
          join
          (select ss_store_sk, avg(revenue) as ave
           from
             (select ss_store_sk, ss_item_sk, sum(ss_sales_price) as revenue
              from store_sales
                join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
              where ss_sold_date_sk between 2451911 and 2452275
                and d_month_seq between 1212 and 1212 + 11
              group by ss_store_sk, ss_item_sk) sa
           group by ss_store_sk) sb on (sc.ss_store_sk = sb.ss_store_sk)
        where sc.revenue <= 0.1 * sb.ave
        order by s_store_name, i_item_desc
        limit 100
    """,
    "q68": """
        select c_last_name, c_first_name, ca_city, bought_city,
               ss_ticket_number, extended_price, extended_tax, list_price
        from
          (select ss_ticket_number, ss_customer_sk, ca_city bought_city,
                  sum(ss_ext_sales_price) extended_price,
                  sum(ss_ext_list_price) list_price,
                  sum(ss_ext_tax) extended_tax
           from store_sales
             join store on (store_sales.ss_store_sk = store.s_store_sk)
             join household_demographics on (store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk)
             join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
             join customer_address on (store_sales.ss_addr_sk = customer_address.ca_address_sk)
           where store.s_city in ('Midway', 'Fairview')
             and (household_demographics.hd_dep_count = 5
               or household_demographics.hd_vehicle_count = 3)
             and d_date between '1999-01-01' and '1999-03-31'
             and ss_sold_date_sk between 2451180 and 2451269
           group by ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn
          join customer on (dn.ss_customer_sk = customer.c_customer_sk)
          join customer_address current_addr on (customer.c_current_addr_sk = current_addr.ca_address_sk)
        where current_addr.ca_city <> bought_city
        order by c_last_name, ss_ticket_number
        limit 100
    """,
    "q7": """
        select i_item_id,
               avg(ss_quantity) agg1, avg(ss_list_price) agg2,
               avg(ss_coupon_amt) agg3, avg(ss_sales_price) agg4
        from store_sales
          join customer_demographics on (store_sales.ss_cdemo_sk = customer_demographics.cd_demo_sk)
          join item on (store_sales.ss_item_sk = item.i_item_sk)
          join promotion on (store_sales.ss_promo_sk = promotion.p_promo_sk)
          join date_dim on (ss_sold_date_sk = d_date_sk)
        where cd_gender = 'F' and cd_marital_status = 'W'
          and cd_education_status = 'Primary'
          and (p_channel_email = 'N' or p_channel_event = 'N')
          and d_year = 1998
          and ss_sold_date_sk between 2450815 and 2451179
        group by i_item_id
        order by i_item_id
        limit 100
    """,
    "q73": """
        select c_last_name, c_first_name, c_salutation,
               c_preferred_cust_flag, ss_ticket_number, cnt
        from
          (select ss_ticket_number, ss_customer_sk, count(*) cnt
           from store_sales
             join household_demographics on (store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk)
             join store on (store_sales.ss_store_sk = store.s_store_sk)
           where store.s_county in ('Williamson County', 'Franklin Parish',
                                    'Bronx County', 'Orange County')
             and (household_demographics.hd_buy_potential = '>10000'
               or household_demographics.hd_buy_potential = 'unknown')
             and household_demographics.hd_vehicle_count > 0
             and case when household_demographics.hd_vehicle_count > 0
                 then household_demographics.hd_dep_count / household_demographics.hd_vehicle_count
                 else null end > 1
             and ss_sold_date_sk between 2451180 and 2451269
           group by ss_ticket_number, ss_customer_sk) dj
          join customer on (dj.ss_customer_sk = customer.c_customer_sk)
        where cnt between 1 and 5
        order by cnt desc, c_last_name, c_first_name, c_salutation,
                 c_preferred_cust_flag, ss_ticket_number
        limit 1000
    """,
    "q79": """
        select c_last_name, c_first_name, substr(s_city, 1, 30) as city,
               ss_ticket_number, amt, profit
        from
          (select ss_ticket_number, ss_customer_sk, s_city,
                  sum(ss_coupon_amt) amt, sum(ss_net_profit) profit
           from store_sales
             join household_demographics on (store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk)
             join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
             join store on (store_sales.ss_store_sk = store.s_store_sk)
           where store.s_number_employees between 200 and 295
             and (household_demographics.hd_dep_count = 8
               or household_demographics.hd_vehicle_count > 0)
             and date_dim.d_dow = 1
             and date_dim.d_year in (1998, 1998 + 1, 1998 + 2)
             and d_date between '1999-01-01' and '1999-03-31'
             and ss_sold_date_sk between 2451180 and 2451269
           group by ss_ticket_number, ss_customer_sk, ss_addr_sk, s_city) ms
          join customer on (ms.ss_customer_sk = customer.c_customer_sk)
        order by c_last_name, c_first_name, city, profit, ss_ticket_number
        limit 100
    """,
    "q89": """
        select *
        from
          (select i_category, i_class, i_brand, s_store_name, s_company_name,
                  d_moy, sum(ss_sales_price) sum_sales
           from store_sales
             join item on (store_sales.ss_item_sk = item.i_item_sk)
             join store on (store_sales.ss_store_sk = store.s_store_sk)
             join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
           where ss_sold_date_sk between 2451545 and 2451910
             and d_year in (2000)
             and ((i_category in ('Home', 'Books', 'Electronics')
                   and i_class in ('wallpaper', 'parenting', 'musical'))
               or (i_category in ('Shoes', 'Jewelry', 'Men')
                   and i_class in ('womens', 'birdal', 'pants')))
           group by i_category, i_class, i_brand, s_store_name,
                    s_company_name, d_moy) tmp1
        order by sum_sales, s_store_name, i_category, i_class, i_brand, d_moy
        limit 100
    """,
    "q98": """
        select i_item_desc, i_category, i_class, i_current_price,
               sum(ss_ext_sales_price) as itemrevenue
        from store_sales
          join item on (store_sales.ss_item_sk = item.i_item_sk)
          join date_dim on (store_sales.ss_sold_date_sk = date_dim.d_date_sk)
        where i_category in ('Jewelry', 'Sports', 'Books')
          and ss_sold_date_sk between 2451911 and 2451941
          and d_date between '2001-01-01' and '2001-01-31'
        group by i_item_id, i_item_desc, i_category, i_class, i_current_price
        order by i_category, i_class, i_item_id, i_item_desc
        limit 1000
    """,
    "ss_max": """
        select count(*) as total,
               count(ss_sold_date_sk) as not_null_total,
               count(distinct ss_sold_date_sk) as unique_days,
               max(ss_sold_date_sk) as max_ss_sold_date_sk,
               max(ss_sold_time_sk) as max_ss_sold_time_sk,
               max(ss_item_sk) as max_ss_item_sk,
               max(ss_customer_sk) as max_ss_customer_sk,
               max(ss_cdemo_sk) as max_ss_cdemo_sk,
               max(ss_hdemo_sk) as max_ss_hdemo_sk,
               max(ss_addr_sk) as max_ss_addr_sk,
               max(ss_store_sk) as max_ss_store_sk,
               max(ss_promo_sk) as max_ss_promo_sk
        from store_sales
    """,
}

SUITES: dict[str, tuple[str, ...]] = {
    "interactive": INTERACTIVE,
    "reporting": REPORTING,
    "deep_analytic": DEEP_ANALYTIC,
}

# Tables each query touches — the test registers exactly these
IMPALA_TABLES = ("store_sales", "date_dim", "item", "customer",
                 "customer_address", "store", "promotion",
                 "customer_demographics", "household_demographics")


def impala_queries(suite: str | None = None) -> list[Query]:
    """Queries of one named suite (or the full 20-query corpus)."""
    names = SUITES[suite] if suite else tuple(IMPALA_QUERIES)
    return [Query.from_sql(n, IMPALA_QUERIES[n]) for n in names]
