"""Deterministic pure-Spark data generators.

The reference pipes an external `dsdgen` binary per partition and parses
'|'-separated text (tpcds/Tables.scala:45-104, fixed RNGSEED 100). We
replace that with `spark.range(n)` + column expressions. Crucially the
randomness is **hash-derived, not F.rand**: `F.rand(seed)` depends on the
partition layout (same seed, different parallelism -> different rows),
while `xxhash64(id, seed)` is a pure function of the row id — the dataset
is bit-identical on 1 core or 1000 executors. That is the property dsdgen's
RNGSEED provided, and it's what makes 100 TB regeneration reproducible.

Surface:
  uniform/uniform_int/choice/padded   expression helpers
  gen_table(spark, schema, n, seed)   generic schema-driven generator
  TPCDS_SCHEMAS                       all 24 TPC-DS table schemas
                                      (structure parity with
                                      tpcds/Tables.scala:261-735)
  gen_tpcds(spark, name, scale)       generated TPC-DS table
  gen_edges(...)                      uniform / power-law skewed edge lists
                                      (graph corpus + TrafficEstimation skew)
  micro tables                        JoinPerformance / AggregationPerformance
  vary_data_size / vary_num_matches   payload padding + n-fold union
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MASK = (1 << 63) - 1  # keep hash values non-negative


def _h(seed: str, *cols: Column) -> Column:
    """Non-negative 63-bit hash, pure function of (seed, cols)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def uniform(id_col: Column, seed: str, lo: float = 0.0, hi: float = 1.0) -> Column:
    """Uniform double in [lo, hi), deterministic per id."""
    u = (_h(seed, id_col) % F.lit(1 << 40)).cast("double") / F.lit(float(1 << 40))
    return u * (hi - lo) + lo


def uniform_int(id_col: Column, seed: str, lo: int, hi: int) -> Column:
    """Uniform int in [lo, hi], deterministic per id."""
    return (_h(seed, id_col) % F.lit(hi - lo + 1) + F.lit(lo)).cast("long")


def choice(id_col: Column, seed: str, values: list[str]) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (uniform_int(id_col, seed, 0, len(values) - 1) + 1).cast("int"))


def money(id_col: Column, seed: str, lo: float, hi: float) -> Column:
    """Money value as DECIMAL(7,2) — the real TPC-DS money type. Decimal
    keeps engine-to-engine aggregation exact (order-independent sums), so
    the verbatim `sum(ss_ext_sales_price)` queries hash-match a DuckDB
    run over the same parquet."""
    return F.round(uniform(id_col, seed, lo, hi), 2).cast("decimal(7,2)")


def gen_table(
    spark: SparkSession,
    n: int,
    columns: dict[str, object],
    seed: str = "100",
    partitions: int | None = None,
) -> DataFrame:
    """Generate n rows; `columns` maps name -> (fn(id_col) -> Column) or a
    literal spec tuple understood by _spec_column."""
    df = spark.range(0, n, numPartitions=partitions)
    idc = F.col("id")
    cols = []
    for name, spec in columns.items():
        col = spec(idc) if callable(spec) else _spec_column(idc, f"{seed}:{name}", spec)
        cols.append(col.alias(name))
    return df.select(*cols)


def _spec_column(idc: Column, seed: str, spec: object) -> Column:
    """Spec tuples: ('key',), ('int', lo, hi), ('double', lo, hi),
    ('money', lo, hi), ('choice', [values]), ('string', prefix),
    ('date', start_year, n_years)."""
    kind = spec[0]  # type: ignore[index]
    if kind == "key":
        return idc + 1
    if kind == "int":
        return uniform_int(idc, seed, spec[1], spec[2])  # type: ignore[misc]
    if kind == "double":
        return uniform(idc, seed, spec[1], spec[2])  # type: ignore[misc]
    if kind == "money":
        return money(idc, seed, spec[1], spec[2])  # type: ignore[misc]
    if kind == "choice":
        return choice(idc, seed, spec[1])  # type: ignore[misc]
    if kind == "string":
        return F.concat(F.lit(spec[1]), (idc + 1).cast("string"))  # type: ignore[misc]
    if kind == "date":
        start, years = spec[1], spec[2]  # type: ignore[misc]
        days = uniform_int(idc, seed, 0, years * 365 - 1)
        return F.date_add(F.lit(f"{start}-01-01").cast("date"), days.cast("int"))
    raise ValueError(f"unknown column spec {spec!r}")


# ---------------------------------------------------------------------------
# TPC-DS schema catalog (structure parity: tpcds/Tables.scala:261-735).
# decimal money columns are doubles here, matching the reference's own
# useDoubleForDecimal() escape hatch (tpcds/Tables.scala:106-116).
# ---------------------------------------------------------------------------

TPCDS_FACTS: dict[str, tuple[str, int]] = {
    # table -> (hive partition column, base rows at scale=1)
    "store_sales": ("ss_sold_date_sk", 2_880_000),
    "store_returns": ("sr_returned_date_sk", 288_000),
    "catalog_sales": ("cs_sold_date_sk", 1_440_000),
    "catalog_returns": ("cr_returned_date_sk", 144_000),
    "web_sales": ("ws_sold_date_sk", 720_000),
    "web_returns": ("wr_returned_date_sk", 72_000),
    "inventory": ("inv_date_sk", 11_745_000),
}

_DATE_SK = ("int", 2_450_815, 2_452_642)  # dsdgen's julian date_sk range

# Variable basket sizes, cycled deterministically: row id -> ticket such
# that tickets span 1..25 items (avg ~11, the dsdgen regime). Real TPC-DS
# tickets hold many lines sharing customer/store/date — the property
# q34/q46/q68/q73/q79 aggregate over (`group by ss_ticket_number, ...`
# with HAVING on the line count). Pattern-based (not hash-based) so row
# counts stay exact and the mapping is parallelism-invariant.
_TICKET_SIZES = [12, 1, 18, 3, 16, 5, 20, 2, 15, 8, 4, 17, 25, 6, 19, 2, 9, 16, 3, 22]
_TICKET_CYCLE = sum(_TICKET_SIZES)  # 223 rows -> 20 tickets per cycle


# row-in-cycle -> bucket index, precomputed (bucket k covers
# prefix[k] <= r < prefix[k+1]). A single 223-literal array lookup
# instead of 19 nested CASE branches: _ticket is composed several times
# inside the planted/echo conditionals, and the CASE form blew past
# janino's 64 KB generated-method limit, dropping the whole projection
# out of codegen.
_TICKET_BUCKET: list[int] = []
for _k, _s in enumerate(_TICKET_SIZES):
    _TICKET_BUCKET.extend([_k] * _s)


def _ticket(idc: Column) -> Column:
    """Deterministic row->ticket mapping with variable basket sizes."""
    cycle = F.floor(idc / F.lit(_TICKET_CYCLE)).cast("long")
    r = idc % F.lit(_TICKET_CYCLE)
    bucket = F.element_at(
        F.array(*[F.lit(b) for b in _TICKET_BUCKET]), (r + 1).cast("int")
    )
    return cycle * F.lit(len(_TICKET_SIZES)) + bucket.cast("long") + 1


def _per_ticket_int(seed: str, lo: int, hi: int):
    """Column fn: uniform int keyed by the row's *ticket*, so every line
    of a basket shares the value (customer, store, date, demographics)."""
    return lambda idc: uniform_int(_ticket(idc), seed, lo, hi)


def _sales_columns(
    p: str, demo_prefix: str = "", order_col: str | None = None,
    extras: dict[str, object] | None = None,
) -> dict[str, object]:
    """Channel fact schema. ``demo_prefix`` is "" for store_sales and
    "bill_" for catalog/web (real TPC-DS column names: cs_bill_customer_sk
    etc.); ``order_col`` is ss_ticket_number / cs_order_number /
    ws_order_number; ``extras`` appends channel-specific FKs."""
    d = demo_prefix
    cols: dict[str, object] = {
        f"{p}_sold_date_sk": _per_ticket_int(f"{p}_sold_date_sk", 2_450_815, 2_452_642),
        f"{p}_sold_time_sk": _per_ticket_int(f"{p}_sold_time_sk", 1, 86_400),
        f"{p}_item_sk": ("int", 1, 18_000),
        f"{p}_{d}customer_sk": _per_ticket_int(f"{p}_customer_sk", 1, 100_000),
        f"{p}_{d}cdemo_sk": _per_ticket_int(f"{p}_cdemo_sk", 1, 1_920_800),
        f"{p}_{d}hdemo_sk": _per_ticket_int(f"{p}_hdemo_sk", 1, 7_200),
        f"{p}_{d}addr_sk": _per_ticket_int(f"{p}_addr_sk", 1, 50_000),
        f"{p}_store_sk": _per_ticket_int(f"{p}_store_sk", 1, 12),
        f"{p}_promo_sk": ("int", 1, 300),
        order_col or f"{p}_ticket_number": _ticket,
        f"{p}_quantity": ("int", 1, 100),
        f"{p}_wholesale_cost": ("money", 1.0, 100.0),
        f"{p}_list_price": ("money", 1.0, 200.0),
        f"{p}_sales_price": ("money", 1.0, 200.0),
        f"{p}_ext_discount_amt": ("money", 0.0, 1_000.0),
        f"{p}_ext_sales_price": ("money", 1.0, 20_000.0),
        f"{p}_ext_wholesale_cost": ("money", 1.0, 10_000.0),
        f"{p}_ext_list_price": ("money", 1.0, 40_000.0),
        f"{p}_ext_tax": ("money", 0.0, 1_800.0),
        f"{p}_coupon_amt": ("money", 0.0, 1_000.0),
        f"{p}_net_paid": ("money", 1.0, 20_000.0),
        f"{p}_net_profit": ("money", -10_000.0, 10_000.0),
    }
    cols.update(extras or {})
    return cols


def _cycle(values: list[str]):
    """Column fn: values assigned round-robin by row id. For tiny dims
    (store: 12 rows) a hash choice can miss a value entirely — P(no
    'Midway' store) ≈ 25% — silently emptying every query that filters
    on it; cycling guarantees each value appears once per len(values)
    rows at every scale and seed."""
    arr_vals = list(values)

    def col(idc: Column) -> Column:
        arr = F.array(*[F.lit(v) for v in arr_vals])
        return F.element_at(arr, (idc % len(arr_vals) + 1).cast("int"))

    return col


# City/county vocab shared by store and customer_address — includes every
# value the ported corpus filters on (q34/q46/q68/q73/q79 predicates), so
# those predicates stay structurally non-empty at every scale.
_CITIES = ["Midway", "Fairview", "Concord", "Spring Hill", "Brownsville",
           "Greenville", "Pleasant Hill", "Oak Grove", "Edgewood"]
_COUNTIES = ["Williamson County", "Franklin Parish", "Bronx County",
             "Orange County", "Saginaw County", "Sumner County",
             "Appanoose County", "Daviess County", "Fairfield County",
             "Raleigh County", "Ziebach County", "Walker County"]

# Geography is CORRELATED, not independent: a county belongs to one
# state (dsdgen draws both from one fips row). Stores cycle these pairs
# (one store per county) and addresses hash-pick a pair, so q54's
# "customer lives in the store's county AND state" join matches 1/12 of
# (address, store) pairs instead of ~never under independent draws.
# State coverage keeps every corpus literal reachable: TN (q27/q36),
# GA (q15/q16), TX/OH/CA/WA/NY/GA/MI (q13/q85 lists), IL (q85).
_GEO_PAIRS = [("Williamson County", "TN"), ("Franklin Parish", "GA"),
              ("Bronx County", "NY"), ("Orange County", "CA"),
              ("Saginaw County", "MI"), ("Sumner County", "TX"),
              ("Appanoose County", "IL"), ("Daviess County", "OH"),
              ("Fairfield County", "WA"), ("Raleigh County", "CA"),
              ("Ziebach County", "TX"), ("Walker County", "GA")]


def _geo_pair_hash(seed: str, part: int):
    """Column fn: hash-chosen (county, state) pair component. One seed
    shared by both components -> the pair is drawn jointly."""
    def col(idc: Column) -> Column:
        arr = F.array(*[F.lit(p[part]) for p in _GEO_PAIRS])
        idx = uniform_int(idc, seed, 0, len(_GEO_PAIRS) - 1)
        return F.element_at(arr, (idx + 1).cast("int"))
    return col


def _geo_pair_cycle(part: int):
    """Column fn: cycled (county, state) pair component (stores)."""
    def col(idc: Column) -> Column:
        arr = F.array(*[F.lit(p[part]) for p in _GEO_PAIRS])
        return F.element_at(arr, (idc % len(_GEO_PAIRS) + 1).cast("int"))
    return col

# Zip vocabulary shared by customer_address and store. dsdgen zips
# cluster into a bounded set per region, which is what gives q8's
# "preferred customers per 5-digit zip > 10" HAVING and its literal-list
# INTERSECT non-empty results; a uniform 10000-99999 draw spreads 50k
# addresses over 90k zips (~1 customer/zip) and empties both. The vocab
# is q15's 9 literal zips (whose 2-digit prefixes are also q45's list)
# plus 40 of q8's 400 literals.
_ZIPS = ["85669", "86197", "88274", "83405", "86475", "85392", "85460",
         "80348", "81792",
         "24128", "76232", "65084", "87816", "83926", "77556", "20548",
         "26231", "43848", "15126", "91137", "61265", "98294", "25782",
         "17920", "18426", "98235", "40081", "84093", "28577", "55565",
         "17183", "54601", "67897", "22752", "86284", "18376", "38607",
         "45200", "21756", "29741", "96765", "23932", "89360", "29839",
         "25989", "28898", "91068", "72550", "10390"]
# store zips: a 12-value cycled subset (one per store) drawn from the q8
# literals so the final substr(s_zip,1,2) = substr(ca_zip,1,2) join in
# q8 always has matching store prefixes
_STORE_ZIPS = ["24128", "76232", "65084", "87816", "83926", "77556",
               "20548", "26231", "43848", "15126", "91137", "61265"]

_J2000 = 2_451_545  # julian day number of 2000-01-01 (a Saturday)
_DATE_DIM_BASE = 2_415_022  # 1900-01-02, the first dsdgen date_dim row


def _date_dim_columns() -> dict[str, object]:
    def d(idc: Column) -> Column:
        return F.date_add(F.lit("2000-01-01").cast("date"),
                          (idc + F.lit(_DATE_DIM_BASE - _J2000)).cast("int"))

    # built lazily per-call: Column exprs need an active session, and this
    # module is imported before one exists
    def day_names() -> Column:
        return F.array(*[F.lit(n) for n in
                         ["Sunday", "Monday", "Tuesday", "Wednesday",
                          "Thursday", "Friday", "Saturday"]])

    return {
        "d_date_sk": lambda idc: idc + _DATE_DIM_BASE,
        "d_date": d,
        "d_year": lambda idc: F.year(d(idc)).cast("long"),
        "d_moy": lambda idc: F.month(d(idc)).cast("long"),
        "d_dom": lambda idc: F.dayofmonth(d(idc)).cast("long"),
        # dsdgen convention: 0 = Sunday .. 6 = Saturday
        "d_dow": lambda idc: (F.dayofweek(d(idc)) - 1).cast("long"),
        "d_day_name": lambda idc: F.element_at(day_names(), F.dayofweek(d(idc))),
        # months since 1900-01 (1212 = Jan 2001); weeks start Sunday, seq 1
        # on the week containing 1900-01-02 (a Tuesday, so offset +2)
        "d_month_seq": lambda idc: ((F.year(d(idc)) - 1900) * 12
                                    + F.month(d(idc)) - 1).cast("long"),
        "d_week_seq": lambda idc: (F.floor((idc + 2) / 7) + 1).cast("long"),
        "d_qoy": lambda idc: F.quarter(d(idc)).cast("long"),
        "d_quarter_name": lambda idc: F.concat(
            F.year(d(idc)).cast("string"), F.lit("Q"),
            F.quarter(d(idc)).cast("string")),
    }


def _returns_columns(
    rp: str, sp: str, sales_table: str, extras: dict[str, object] | None = None,
    amt_col: str | None = None,
):
    """Returns-table factory ALIGNED to its sales channel: each return row
    maps to sales row ``id*10`` (row counts keep a fixed 10:1 ratio across
    scales) and reproduces that row's item / ticket / per-basket keys by
    re-deriving the same hash columns — so return<->sale joins
    (sr_ticket_number = ss_ticket_number AND sr_item_sk = ss_item_sk)
    match real lines, the way dsdgen emits returns referencing sales.

    Returns a factory(seed) because item reproduction needs the sales
    table's per-table seed (``{seed}:{sales_table}:{col}``).
    """

    def factory(base_seed: str) -> dict[str, object]:
        def sales_row(idc: Column) -> Column:
            return idc * 10

        def item(idc: Column) -> Column:
            if sp == "ss":
                return _ss_item_of_row(base_seed, sales_row(idc))
            return uniform_int(
                sales_row(idc), f"{base_seed}:{sales_table}:{sp}_item_sk", 1, 18_000
            )

        def quantity_sold(idc: Column) -> Column:
            return uniform_int(
                sales_row(idc), f"{base_seed}:{sales_table}:{sp}_quantity", 1, 100
            )

        def tkt(idc: Column) -> Column:
            return _ticket(sales_row(idc))

        def per_basket(col_seed: str, lo: int, hi: int):
            return lambda idc: uniform_int(tkt(idc), col_seed, lo, hi)

        cols: dict[str, object] = {
            f"{rp}_returned_date_sk": lambda idc: (
                per_basket(f"{sp}_sold_date_sk", 2_450_815, 2_452_642)(idc)
                + uniform_int(idc, f"{rp}_lag", 1, 150)
            ),
            f"{rp}_item_sk": item,
            f"{rp}_return_quantity": lambda idc: (
                F.pmod(_h(f"{rp}_rq", idc), quantity_sold(idc)) + 1
            ),
            amt_col or f"{rp}_return_amt": ("money", 0.0, 20_000.0),
            f"{rp}_net_loss": ("money", 0.0, 10_000.0),
        }
        cols.update(extras or {})
        if rp == "sr":
            # basket customer/date go through the follow-up-aware helpers
            # (must mirror _store_sales_columns exactly)
            cols["sr_customer_sk"] = lambda idc: _ss_customer_of_ticket(tkt(idc))
            cols["sr_returned_date_sk"] = lambda idc: (
                _ss_date_of_ticket(tkt(idc))
                + uniform_int(idc, "sr_lag", 1, 150)
            )
            cols["sr_cdemo_sk"] = per_basket("ss_cdemo_sk", 1, 1_920_800)
            cols["sr_hdemo_sk"] = per_basket("ss_hdemo_sk", 1, 7_200)
            # the basket's LOCAL store (must mirror _store_sales_columns)
            cols["sr_store_sk"] = _local_store_sk(base_seed, tkt)
            cols["sr_ticket_number"] = tkt
            cols["sr_reason_sk"] = ("int", 1, 35)
        elif rp == "cr":
            # returned-item echo mirror: cs rows ==10 (mod 40) carry the
            # item of ss row 20m-10 and their return lands on the sr
            # row's return date (see _sr_returned_date_of)
            def cr_item(idc: Column) -> Column:
                echo_r = _ss_item_of_row(base_seed, idc * 20 - 10)
                return F.when(idc % 4 == 1, echo_r).otherwise(item(idc))

            def cr_returned(idc: Column) -> Column:
                default = (
                    per_basket("cs_sold_date_sk", 2_450_815, 2_452_642)(idc)
                    + uniform_int(idc, "cr_lag", 1, 150)
                )
                return F.when(
                    idc % 4 == 1, _sr_returned_date_of(idc * 2 - 1)
                ).otherwise(default)

            cols["cr_item_sk"] = cr_item
            cols["cr_returned_date_sk"] = cr_returned
            cols["cr_refunded_customer_sk"] = per_basket("cs_customer_sk", 1, 100_000)
            cols["cr_refunded_cdemo_sk"] = per_basket("cs_cdemo_sk", 1, 1_920_800)
            cols["cr_returning_customer_sk"] = per_basket("cs_customer_sk", 1, 100_000)
            cols["cr_returning_addr_sk"] = per_basket("cs_addr_sk", 1, 50_000)
            cols["cr_return_amt_inc_tax"] = ("money", 0.0, 21_000.0)
            # the catalog page the returned sale used (per-line, re-derived)
            cols["cr_catalog_page_sk"] = lambda idc: uniform_int(
                sales_row(idc), f"{base_seed}:catalog_sales:cs_catalog_page_sk",
                1, 11_718,
            )
            cols["cr_order_number"] = tkt
            cols["cr_reason_sk"] = ("int", 1, 35)
            # the call center the returned order went through (per-line,
            # re-derived from the sales row — q91 groups returns by it)
            cols["cr_call_center_sk"] = lambda idc: uniform_int(
                sales_row(idc), f"{base_seed}:catalog_sales:cs_call_center_sk",
                1, 6,
            )
        elif rp == "wr":
            # returned-item echo mirror: ws rows ==10 (mod 20) carry the
            # item of ss row 40w-30 and return on the sr row's date
            def wr_item(idc: Column) -> Column:
                echo_r = _ss_item_of_row(base_seed, idc * 40 - 30)
                return F.when(idc % 2 == 1, echo_r).otherwise(item(idc))

            def wr_returned(idc: Column) -> Column:
                default = (
                    per_basket("ws_sold_date_sk", 2_450_815, 2_452_642)(idc)
                    + uniform_int(idc, "wr_lag", 1, 150)
                )
                return F.when(
                    idc % 2 == 1, _sr_returned_date_of(idc * 4 - 3)
                ).otherwise(default)

            cols["wr_item_sk"] = wr_item
            cols["wr_returned_date_sk"] = wr_returned
            cols["wr_refunded_customer_sk"] = per_basket("ws_customer_sk", 1, 100_000)
            cols["wr_refunded_cdemo_sk"] = per_basket("ws_cdemo_sk", 1, 1_920_800)
            # dsdgen: the returning party is usually the buyer — the
            # returning/refunded demographic and address keys coincide,
            # which is what makes q85's cd1 = cd2 equality predicates
            # match real rows
            cols["wr_returning_cdemo_sk"] = per_basket("ws_cdemo_sk", 1, 1_920_800)
            cols["wr_returning_customer_sk"] = per_basket("ws_customer_sk", 1, 100_000)
            cols["wr_returning_addr_sk"] = per_basket("ws_addr_sk", 1, 50_000)
            cols["wr_refunded_addr_sk"] = per_basket("ws_addr_sk", 1, 50_000)
            cols["wr_refunded_cash"] = ("money", 0.0, 10_000.0)
            cols["wr_fee"] = ("money", 0.5, 100.0)
            # the page the returned sale used (per-line col, re-derived)
            cols["wr_web_page_sk"] = lambda idc: uniform_int(
                sales_row(idc), f"{base_seed}:web_sales:ws_web_page_sk", 1, 60
            )
            cols["wr_order_number"] = tkt
            cols["wr_reason_sk"] = ("int", 1, 35)
        return cols

    return factory


def _catalog_sales_columns(base_seed: str) -> dict[str, object]:
    """catalog_sales with CROSS-CHANNEL repurchase rows: rows where
    ``id % 5 in (1, 2)`` re-derive the (customer, item, sold date) of
    store_returns row ``id // 5`` — the "returned in store, re-bought
    from the catalog" behavior the q17/q25/q29 family measures, and the
    same-customer-both-channels-per-year activity q4 measures. Under
    independent uniform keys the sr><cs (customer, item) join is
    structurally empty (|pairs| = 1.8e9 vs ~1e4 rows at sf0.01); dsdgen
    gets matches from volume at SF>=1, we plant them deterministically
    at every scale. Row-count ratio cs:sr is a fixed 5:1 (TPCDS_FACTS),
    so id//5 is a valid sr row at any sf. Residues 1 and 2 are never
    multiples of 10, so catalog_returns' alignment to cs rows ``id*10``
    is untouched.

    Rows where ``id % 20 == 5`` are TRIPLE-CHANNEL echoes: they
    re-derive the (customer, item, sold date, ext_sales_price) of
    store_sales row ``2*id - 6`` — always ``== 4 (mod 40)``, the same ss
    rows web_sales echoes at ``id % 10 == 5`` via ``4*id - 16``. Every
    such ss line is therefore sold through all three channels in the
    same WEEK with near-equal per-channel revenue (q58/q83's balanced
    3-channel item weeks), by lines NO channel ever returns: ss rows
    ``== 4 (mod 40)`` are not multiples of 10 so no sr row derives from
    them, and the cs/ws echo residues are odd so no cr/wr row derives
    from the echoes — which is exactly q78's no-returns 3-channel
    (year, item, customer) join.
    """

    def sr_row(idc: Column) -> Column:
        return F.floor(idc / 5).cast("long")

    def planted(idc: Column) -> Column:
        return (idc % 5 == 1) | (idc % 5 == 2)

    def ss_row3(idc: Column) -> Column:
        return idc * 2 - 6

    def planted3(idc: Column) -> Column:
        return idc % 20 == 5

    def ss_row_r(idc: Column) -> Column:
        # returned-item echo source: ss rows == 10 (mod 80)
        return idc * 2 - 10

    def planted_r(idc: Column) -> Column:
        return idc % 40 == 10

    def customer(idc: Column) -> Column:
        # the sr row's customer is per-basket over its sales row (id*10)
        cross = _ss_customer_of_ticket(_ticket(sr_row(idc) * 10))
        echo3 = _ss_customer_of_ticket(_ticket(ss_row3(idc)))
        default = uniform_int(_ticket(idc), "cs_customer_sk", 1, 100_000)
        return (F.when(planted(idc), cross)
                 .when(planted3(idc), echo3).otherwise(default))

    def item(idc: Column) -> Column:
        cross = _ss_item_of_row(base_seed, sr_row(idc) * 10)
        echo3 = _ss_item_of_row(base_seed, ss_row3(idc))
        echo_r = _ss_item_of_row(base_seed, ss_row_r(idc))
        default = uniform_int(
            idc, f"{base_seed}:catalog_sales:cs_item_sk", 1, 18_000
        )
        return (F.when(planted(idc), cross)
                 .when(planted3(idc), echo3)
                 .when(planted_r(idc), echo_r).otherwise(default))

    def sold_date(idc: Column) -> Column:
        cross = _ss_date_of_ticket(_ticket(sr_row(idc) * 10))
        echo3 = _ss_date_of_ticket(_ticket(ss_row3(idc)))
        echo_r = _ss_date_of_ticket(_ticket(ss_row_r(idc)))
        default = uniform_int(_ticket(idc), "cs_sold_date_sk", 2_450_815, 2_452_642)
        return (F.when(planted(idc), cross)
                 .when(planted3(idc), echo3)
                 .when(planted_r(idc), echo_r).otherwise(default))

    def sales_price(idc: Column) -> Column:
        echo3 = money(ss_row3(idc), f"{base_seed}:store_sales:ss_ext_sales_price",
                      1.0, 20_000.0)
        default = money(idc, f"{base_seed}:catalog_sales:cs_ext_sales_price",
                        1.0, 20_000.0)
        return F.when(planted3(idc), echo3).otherwise(default)

    cols = _sales_columns(
        "cs", demo_prefix="bill_", order_col="cs_order_number",
        extras={
            # ship date follows the ACTUAL (possibly echoed) sold date
            "cs_ship_date_sk": lambda idc: (
                sold_date(idc) + uniform_int(idc, "cs_ship_lag", 1, 120)
            ),
            "cs_ship_addr_sk": _null_every(
                _per_ticket_int("cs_ship_addr_sk", 1, 50_000)),
            "cs_ext_ship_cost": ("money", 0.0, 1_000.0),
            "cs_net_paid_inc_tax": ("money", 1.0, 21_000.0),
            "cs_warehouse_sk": ("int", 1, 5),
            "cs_call_center_sk": ("int", 1, 6),
            "cs_catalog_page_sk": ("int", 1, 11_718),
            "cs_ship_mode_sk": ("int", 1, 20),
        },
    )
    cols["cs_bill_customer_sk"] = customer
    # dsdgen: the ship-to party is the buyer for the vast majority of
    # orders; q69's not-exists probe uses the ship-to key
    cols["cs_ship_customer_sk"] = customer
    cols["cs_item_sk"] = item
    cols["cs_sold_date_sk"] = sold_date
    cols["cs_ext_sales_price"] = sales_price
    return cols


def _web_sales_columns(base_seed: str) -> dict[str, object]:
    """web_sales with STORE-ECHO rows: rows where ``id % 5 in (1, 2)``
    re-derive the (customer, sold date) of store_sales row ``id * 4``
    (cs:ws row ratio is a fixed 4:1) — multi-channel customers whose
    store and web activity fall in the same year, the property the
    year-over-year family (q4/q11/q74) and the channel-overlap counts
    (q38/q87/q97) measure. Per-ticket customer draws make a customer's
    lifetime ~1 basket, so without echoes "active in store AND web in
    two consecutive years" has ~zero expected rows at any test scale.
    Residues 1 and 2 are never multiples of 10, so web_returns'
    alignment to ws rows ``id*10`` is untouched.

    Rows where ``id % 10 == 5`` are the web half of the TRIPLE-CHANNEL
    echo (see _catalog_sales_columns): they re-derive the (customer,
    item, sold date, ext_sales_price) of store_sales row ``4*id - 16``
    — always ``== 4 (mod 40)``, the same ss rows catalog_sales echoes
    at ``id % 20 == 5``.
    """

    def src_row(idc: Column) -> Column:
        return idc * 4

    def planted(idc: Column) -> Column:
        return (idc % 5 == 1) | (idc % 5 == 2)

    def ss_row3(idc: Column) -> Column:
        return idc * 4 - 16

    def planted3(idc: Column) -> Column:
        return idc % 10 == 5

    def ss_row_r(idc: Column) -> Column:
        # returned-item echo source: ss rows == 10 (mod 80)
        return idc * 4 - 30

    def planted_r(idc: Column) -> Column:
        return idc % 20 == 10

    def customer(idc: Column) -> Column:
        cross = _ss_customer_of_ticket(_ticket(src_row(idc)))
        echo3 = _ss_customer_of_ticket(_ticket(ss_row3(idc)))
        default = uniform_int(_ticket(idc), "ws_customer_sk", 1, 100_000)
        return (F.when(planted(idc), cross)
                 .when(planted3(idc), echo3).otherwise(default))

    def item(idc: Column) -> Column:
        echo3 = _ss_item_of_row(base_seed, ss_row3(idc))
        echo_r = _ss_item_of_row(base_seed, ss_row_r(idc))
        default = uniform_int(
            idc, f"{base_seed}:web_sales:ws_item_sk", 1, 18_000
        )
        return (F.when(planted3(idc), echo3)
                 .when(planted_r(idc), echo_r).otherwise(default))

    def sold_date(idc: Column) -> Column:
        cross = _ss_date_of_ticket(_ticket(src_row(idc)))
        echo3 = _ss_date_of_ticket(_ticket(ss_row3(idc)))
        echo_r = _ss_date_of_ticket(_ticket(ss_row_r(idc)))
        default = uniform_int(_ticket(idc), "ws_sold_date_sk", 2_450_815, 2_452_642)
        return (F.when(planted(idc), cross)
                 .when(planted3(idc), echo3)
                 .when(planted_r(idc), echo_r).otherwise(default))

    def sales_price(idc: Column) -> Column:
        echo3 = money(ss_row3(idc), f"{base_seed}:store_sales:ss_ext_sales_price",
                      1.0, 20_000.0)
        default = money(idc, f"{base_seed}:web_sales:ws_ext_sales_price",
                        1.0, 20_000.0)
        return F.when(planted3(idc), echo3).otherwise(default)

    cols = _sales_columns(
        "ws", demo_prefix="bill_", order_col="ws_order_number",
        extras={
            "ws_ship_date_sk": lambda idc: (
                sold_date(idc) + uniform_int(idc, "ws_ship_lag", 1, 120)
            ),
            "ws_ship_hdemo_sk": _per_ticket_int("ws_ship_hdemo_sk", 1, 7_200),
            "ws_ship_addr_sk": _per_ticket_int("ws_ship_addr_sk", 1, 50_000),
            "ws_ext_ship_cost": ("money", 0.0, 1_000.0),
            "ws_warehouse_sk": ("int", 1, 5),
            "ws_web_page_sk": ("int", 1, 60),
            "ws_web_site_sk": ("int", 1, 30),
            "ws_ship_mode_sk": ("int", 1, 20),
        },
    )
    cols["ws_bill_customer_sk"] = customer
    # dsdgen: the ship-to party is the buyer for most orders (q76 pivots
    # on the NULL lines)
    cols["ws_ship_customer_sk"] = _null_every(customer)
    cols["ws_sold_date_sk"] = sold_date
    cols["ws_item_sk"] = item
    cols["ws_ext_sales_price"] = sales_price
    return cols


def _nullable_ss_addr(idc: Column) -> Column:
    """dsdgen emits NULL FKs for a few percent of fact rows; q44's
    baseline subquery (`ss_addr_sk is null`) depends on them. NULL one
    basket in 25 (per-ticket, so a basket is all-null or all-set);
    non-null baskets keep the exact values the plain column had."""
    t = _ticket(idc)
    return F.when(t % 25 == 7, F.lit(None).cast("long")).otherwise(
        uniform_int(t, "ss_addr_sk", 1, 50_000)
    )


# STORE FOLLOW-UP baskets: every 8th store basket (ticket == 3 mod 8)
# belongs to a catalog customer and happens 30-90 days after their
# catalog order — dsdgen's cross-channel funnel at volume, planted
# deterministically (q54 measures exactly this: catalog/web buyers'
# store revenue in the following quarter). The source is a DEFAULT
# catalog row (== 3 mod 20: never itself sr-planted or triple-echoed),
# so the chain terminates — no recursive derivation. Every site that
# re-derives a store basket's customer or date (returns factory,
# cross-channel plantings, the local-store chain) goes through these
# two helpers, keeping the whole web of alignments exact.
_FOLLOWUP_MOD, _FOLLOWUP_RESIDUE = 8, 3


def _followup_cs_row(tkt: Column) -> Column:
    return F.floor((tkt * 4) / 20).cast("long") * 20 + 3


def _is_followup(tkt: Column) -> Column:
    return tkt % _FOLLOWUP_MOD == _FOLLOWUP_RESIDUE


# WHALE/HOT-ITEM planting (q23a/q23b): store tickets ``== 21 (mod 64)``
# belong to a single "whale" customer (c_customer_sk 1) and land whole
# baskets on one of 8 hot (item, day) pairs. dsdgen's comparable
# properties are item-popularity skew (frequent_ss_items: the same item
# sold >4 times on one DAY) and customer-spend skew (best_ss_customer:
# within 95% of the max store spend); under this generator's uniform
# per-line draws both CTEs are structurally empty at harness scales, so
# the skew is planted deterministically. Ticket residue 21 (mod 64) is
# never a follow-up ticket (21 mod 8 = 5 != 3), and whale LINES flow
# into catalog/web through the existing triple-channel echo residues,
# which re-derive (customer, item, date) through the central helpers
# below — so q23's final month (Feb 2000, 4 of the 8 hot days) sees
# catalog AND web purchases of frequent items by the best customer.
# Every ticket size the residue hits is >= 9 lines, so each hot pair
# crosses the count(*) > 4 bar even when a scale yields one ticket.
_WHALE_MOD, _WHALE_RESIDUE = 64, 21
_WHALE_CUSTOMER = 1
_HOT_ITEMS = (77, 2_311, 4_523, 6_733, 8_951, 11_171, 13_397, 15_601)
# 2000-02-03/09/16/23 (q23's d_moy=2, d_year=2000 month), then
# 2000-06-15, 2001-03-10, 2002-07-04, 2002-11-11 — all inside the
# d_year in (2000..2003) window of the frequent-items CTE
_HOT_DATES = tuple(_J2000 + off for off in (33, 39, 46, 53, 166, 434, 915, 1045))


def _is_whale(tkt: Column) -> Column:
    return tkt % _WHALE_MOD == _WHALE_RESIDUE


def _whale_pair(tkt: Column) -> Column:
    return F.floor(tkt / _WHALE_MOD).cast("long") % len(_HOT_ITEMS)


def _ss_item_of_row(base_seed: str, row: Column) -> Column:
    """ITEM of store_sales line ``row`` — the one true derivation.

    Every site that reproduces a store line's item (the sr factory, the
    catalog/web cross-channel and triple/returned echoes) must call this
    so the whale branch propagates everywhere the default draw used to.
    """
    tkt = _ticket(row)
    hot = F.element_at(
        F.array(*[F.lit(i) for i in _HOT_ITEMS]), (_whale_pair(tkt) + 1).cast("int")
    ).cast("long")
    default = uniform_int(row, f"{base_seed}:store_sales:ss_item_sk", 1, 18_000)
    return F.when(_is_whale(tkt), hot).otherwise(default)


def _ss_customer_of_ticket(tkt: Column) -> Column:
    cs_cust = uniform_int(
        _ticket(_followup_cs_row(tkt)), "cs_customer_sk", 1, 100_000
    )
    default = uniform_int(tkt, "ss_customer_sk", 1, 100_000)
    return (F.when(_is_whale(tkt), F.lit(_WHALE_CUSTOMER).cast("long"))
             .when(_is_followup(tkt), cs_cust).otherwise(default))


def _ss_date_of_ticket(tkt: Column) -> Column:
    cs_date = uniform_int(
        _ticket(_followup_cs_row(tkt)), "cs_sold_date_sk", 2_450_815, 2_452_642
    )
    follow = cs_date + uniform_int(tkt, "ss_followup_lag", 30, 90)
    hot = F.element_at(
        F.array(*[F.lit(d) for d in _HOT_DATES]), (_whale_pair(tkt) + 1).cast("int")
    ).cast("long")
    default = uniform_int(tkt, "ss_sold_date_sk", 2_450_815, 2_452_642)
    return (F.when(_is_whale(tkt), hot)
             .when(_is_followup(tkt), follow).otherwise(default))


# RETURNED-ITEM triple-channel echo (q83): catalog rows ``==10 (mod
# 40)`` and web rows ``==10 (mod 20)`` re-derive the ITEM and basket
# date of store_sales row ``==10 (mod 80)`` — a returned store line
# (multiple of 10). Those cs/ws rows are themselves multiples of 10, so
# their cr/wr rows exist, and the returns factories align the cr/wr
# RETURN DATE to the sr row's return date — the same item returned in
# all three channels in the same week. Residues are disjoint from the
# sales-side triple echo (==5) and the sr-repurchase classes (1,2 mod 5).
def _sr_returned_date_of(k: Column) -> Column:
    """Return date of store_returns row k — must mirror the sr factory."""
    return _ss_date_of_ticket(_ticket(k * 10)) + uniform_int(k, "sr_lag", 1, 150)


# Store baskets are LOCAL: a basket's store is the store of the
# customer's address geo pair (dsdgen's catchment behavior — q54
# measures revenue at stores in the customer's county+state, which
# under independent store draws matches ~1/144 of lines). The chain
# re-derives customer -> c_current_addr_sk -> ca geo pair -> the one
# store cycled onto that pair, each step the same hash the dim tables
# use, so the ss/sr/store/address/customer five-way joins all land.
def _local_store_sk(base_seed: str, ticket_of):
    def col(idc: Column) -> Column:
        customer_sk = _ss_customer_of_ticket(ticket_of(idc))
        addr_sk = uniform_int(
            customer_sk - 1, f"{base_seed}:customer:c_current_addr_sk", 1, 50_000
        )
        pair_idx = uniform_int(addr_sk - 1, "ca_geo", 0, len(_GEO_PAIRS) - 1)
        return pair_idx + 1
    return col


# item taxonomy: 10 categories x 2 classes each, class drawn jointly
# with (nested under) its category — see the i_category entry note
_ITEM_CATEGORIES = ["Books", "Electronics", "Home", "Jewelry", "Men",
                    "Music", "Shoes", "Sports", "Women", "Children"]
# slot 2c and 2c+1 are category c's classes
_ITEM_CLASSES = ["reference", "self-help",      # Books
                 "portable", "personal",        # Electronics
                 "wallpaper", "accessories",    # Home
                 "fragrances", "birdal",        # Jewelry
                 "shirts", "pants",             # Men
                 "classical", "musical",        # Music
                 "athletic", "womens",          # Shoes
                 "football", "rugby",           # Sports
                 "dresses", "maternity",        # Women
                 "parenting", "infants"]        # Children


def _item_cat_idx(idc: Column) -> Column:
    return uniform_int(idc, "i_category", 0, len(_ITEM_CATEGORIES) - 1)


def _item_class_idx(idc: Column) -> Column:
    return _item_cat_idx(idc) * 2 + uniform_int(idc, "i_class_slot", 0, 1)


def _item_category(idc: Column) -> Column:
    arr = F.array(*[F.lit(v) for v in _ITEM_CATEGORIES])
    return F.element_at(arr, (_item_cat_idx(idc) + 1).cast("int"))


def _item_class(idc: Column) -> Column:
    arr = F.array(*[F.lit(v) for v in _ITEM_CLASSES])
    return F.element_at(arr, (_item_class_idx(idc) + 1).cast("int"))


# q76 pivots on NULL CHANNEL keys (ss_store_sk / ws_ship_customer_sk /
# cs_ship_addr_sk). One line in 50 goes NULL, per-LINE on residue 27
# (mod 50): never a returns-derived row (those are multiples of 10) and
# outside every planted/echo residue class, so the returns factories'
# re-derivation and the cross-channel plantings are untouched.
_NULL_MOD, _NULL_RESIDUE = 50, 27


def _null_every(inner):
    def col(idc: Column) -> Column:
        val = inner(idc) if callable(inner) else inner
        return F.when(
            idc % _NULL_MOD == _NULL_RESIDUE, F.lit(None).cast("long")
        ).otherwise(val)
    return col


def _store_sales_columns(base_seed: str) -> dict[str, object]:
    cols = _sales_columns("ss")
    cols["ss_addr_sk"] = _nullable_ss_addr
    cols["ss_customer_sk"] = lambda idc: _ss_customer_of_ticket(_ticket(idc))
    cols["ss_sold_date_sk"] = lambda idc: _ss_date_of_ticket(_ticket(idc))
    cols["ss_item_sk"] = lambda idc: _ss_item_of_row(base_seed, idc)
    cols["ss_store_sk"] = _null_every(_local_store_sk(base_seed, _ticket))
    return cols


# dsdgen's inventory is a DENSE WEEKLY GRID, not a random spray: every
# tracked item x every warehouse x every week of the 5-year calendar
# (11_745_000 = 9_000 items x 5 warehouses x 261 weeks at scale 1 —
# exactly the dsdgen layout, where half the item table is
# catalog-carried and inventoried). Scaling down shrinks the tracked
# ITEM subset (the dsdgen convention), never the week grid — q39's
# month-over-month stddev needs ~4 weekly samples per (item, warehouse,
# month) cell and q72's d1.d_week_seq = d2.d_week_seq join needs every
# week present.
_INV_WEEKS = 261
_INV_WAREHOUSES = 5
_INV_CELLS = _INV_WEEKS * _INV_WAREHOUSES  # rows per tracked item
# spreads tracked items across the 18_000-item space (coprime stride ->
# injective for up to 18_000 tracked items) so hash-derived item
# attributes (manufact, price band) stay uniform over the subset
_INV_ITEM_STRIDE = 3_989


def _inventory_columns() -> dict[str, object]:
    def item(idc: Column) -> Column:
        slot = F.floor(idc / _INV_CELLS).cast("long")
        return (slot * _INV_ITEM_STRIDE) % 18_000 + 1

    def warehouse(idc: Column) -> Column:
        return (F.floor(idc / _INV_WEEKS) % _INV_WAREHOUSES).cast("long") + 1

    def date_sk(idc: Column) -> Column:
        return (idc % _INV_WEEKS) * 7 + 2_450_815

    def quantity(idc: Column) -> Column:
        # ~25% stockout-zero weeks, else uniform 0..1000. dsdgen draws
        # uniform quantities and gets q39's cov > 1 survivors from sheer
        # cell count (45_000 cells at sf1); at harness scales the cell
        # count is 100x smaller, so deterministic stockouts restore the
        # high-variance cells the query exists to find (P(cov>1) ~ 0.42
        # per cell vs 0.05 under pure uniform).
        return F.when(
            uniform(idc, "inv_stockout") < 0.25, F.lit(0).cast("long")
        ).otherwise(uniform_int(idc, "inv_quantity_on_hand", 0, 1_000))

    return {
        "inv_date_sk": date_sk,
        "inv_item_sk": item,
        "inv_warehouse_sk": warehouse,
        "inv_quantity_on_hand": quantity,
    }


TPCDS_SCHEMAS: dict[str, dict[str, object]] = {
    "store_sales": lambda seed: _store_sales_columns(seed),
    "web_sales": lambda seed: _web_sales_columns(seed),
    "catalog_sales": lambda seed: _catalog_sales_columns(seed),
    "store_returns": _returns_columns("sr", "ss", "store_sales"),
    "catalog_returns": _returns_columns(
        "cr", "cs", "catalog_sales",
        extras={"cr_refunded_cash": ("money", 0.0, 10_000.0),
                # q64 sums all three refund components
                "cr_reversed_charge": ("money", 0.0, 5_000.0),
                "cr_store_credit": ("money", 0.0, 5_000.0)},
        # real TPC-DS name: catalog uses _amount, store/web use _amt
        amt_col="cr_return_amount",
    ),
    "web_returns": _returns_columns("wr", "ws", "web_sales"),
    "inventory": _inventory_columns(),
    # date_dim is a real CALENDAR, not random columns: d_date_sk is the
    # julian day number (dsdgen convention: 2451545 = 2000-01-01), every
    # other column derives from the corresponding date. That makes the
    # corpus's julian partition-key filters, d_date string ranges, d_dow
    # weekend predicates, and d_month_seq windows all mutually consistent
    # (e.g. d_month_seq 1212 = Jan 2001, dsdgen's (year-1900)*12 + moy-1).
    "date_dim": _date_dim_columns(),
    "item": {
        "i_item_sk": ("key",),
        "i_item_id": ("string", "ITEM_"),
        "i_rec_start_date": ("date", 1997, 4),
        "i_item_desc": ("string", "Description of item "),
        # class is NESTED under category (dsdgen: each class belongs to
        # one category) — two classes per category, drawn jointly, so
        # pair predicates like q54's "i_category='Women' and
        # i_class='maternity'" select 1/20 of items instead of the ~1/160
        # an independent draw gives. The vocab keeps every value the
        # corpus filters on (q53/q63/q89 lists) reachable.
        "i_category": _item_category,
        "i_category_id": lambda idc: _item_cat_idx(idc) + 1,
        "i_class": _item_class,
        "i_class_id": lambda idc: _item_class_idx(idc) + 1,
        "i_brand": ("choice", ["scholaramalgamalg #14", "scholaramalgamalg #7",
                                "exportiunivamalg #9", "scholaramalgamalg #9",
                                "amalgimporto #1", "edu packscholar #1",
                                "exportiimporto #1", "importoamalg #1"]
                    + [f"Brand#{i}" for i in range(1, 18)]),
        "i_brand_id": ("int", 1_001_001, 1_016_017),
        "i_current_price": ("money", 0.09, 99.99),
        "i_wholesale_cost": ("money", 0.05, 80.0),
        "i_manufact_id": ("int", 1, 1_000),
        "i_manufact": ("choice", [f"manufact#{i}" for i in range(1, 101)]),
        "i_manager_id": ("int", 1, 100),
        "i_product_name": ("string", "Product "),
        # color/units/size carry the dsdgen vocabulary the corpus filters
        # on (q41 combo predicates, q56 color subsets)
        "i_color": ("choice", ["slate", "blanched", "burnished", "powder",
                               "khaki", "brown", "honeydew", "floral",
                               "deep", "light", "cornflower", "midnight",
                               "snow", "beige", "rose", "smoke", "pale",
                               "metallic", "antique", "chiffon"]),
        "i_units": ("choice", ["Ounce", "Oz", "Bunch", "Ton", "N/A",
                               "Dozen", "Box", "Pound", "Pallet", "Gross",
                               "Each", "Lb", "Carton", "Case"]),
        "i_size": ("choice", ["medium", "extra large", "N/A", "small",
                              "petite", "large", "economy"]),
    },
    "customer": {
        "c_customer_sk": ("key",),
        "c_customer_id": ("string", "CUST_"),
        "c_current_cdemo_sk": ("int", 1, 1_920_800),
        "c_current_hdemo_sk": ("int", 1, 7_200),
        "c_current_addr_sk": ("int", 1, 50_000),
        "c_salutation": ("choice", ["Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir"]),
        "c_first_name": ("string", "First"),
        "c_last_name": ("string", "Last"),
        "c_preferred_cust_flag": ("choice", ["Y", "N"]),
        "c_birth_day": ("int", 1, 28),
        "c_birth_month": ("int", 1, 12),
        "c_birth_year": ("int", 1924, 1992),
        "c_birth_country": ("choice", ["UNITED STATES", "CANADA", "MEXICO",
                                       "GERMANY", "JAPAN", "BRAZIL"]),
        "c_login": ("string", "login"),
        "c_email_address": ("string", "cust@example"),
        "c_last_review_date": _DATE_SK,
        # q64 groups by the first-sale / first-ship-to years
        "c_first_sales_date_sk": _DATE_SK,
        "c_first_shipto_date_sk": _DATE_SK,
    },
    "customer_address": {
        "ca_address_sk": ("key",),
        "ca_street_number": lambda idc: uniform_int(
            idc, "ca_street_number", 1, 1_000).cast("string"),
        "ca_street_name": ("choice", ["Main", "Oak", "Park", "First",
                                       "Cedar", "Elm", "Maple", "Lake"]),
        "ca_street_type": ("choice", ["St", "Ave", "Blvd", "Ct", "Ln", "Way"]),
        "ca_suite_number": ("string", "Suite "),
        "ca_city": ("choice", _CITIES),
        # jointly-drawn (county, state) pair — see _GEO_PAIRS
        "ca_county": _geo_pair_hash("ca_geo", 0),
        "ca_state": _geo_pair_hash("ca_geo", 1),
        "ca_zip": ("choice", _ZIPS),
        "ca_country": lambda idc: F.lit("United States"),
        "ca_gmt_offset": ("int", -8, -5),
        "ca_location_type": ("choice", ["apartment", "condo", "single family"]),
    },
    "customer_demographics": {
        "cd_demo_sk": ("key",),
        "cd_gender": ("choice", ["M", "F"]),
        "cd_marital_status": ("choice", ["S", "M", "D", "W", "U"]),
        "cd_education_status": ("choice", ["Primary", "Secondary", "College",
                                            "2 yr Degree", "4 yr Degree",
                                            "Advanced Degree", "Unknown"]),
        "cd_purchase_estimate": ("int", 500, 10_000),
        "cd_credit_rating": ("choice", ["Good", "Low Risk", "High Risk",
                                         "Unknown"]),
        "cd_dep_count": ("int", 0, 9),
        "cd_dep_employed_count": ("int", 0, 6),
        "cd_dep_college_count": ("int", 0, 6),
    },
    "household_demographics": {
        "hd_demo_sk": ("key",),
        "hd_income_band_sk": ("int", 1, 20),
        "hd_buy_potential": ("choice", ["0-500", "501-1000", "1001-5000",
                                         "5001-10000", ">10000", "Unknown"]),
        "hd_dep_count": ("int", 0, 9),
        "hd_vehicle_count": ("int", 0, 4),
    },
    "income_band": {
        "ib_income_band_sk": ("key",),
        "ib_lower_bound": ("int", 0, 190_000),
        "ib_upper_bound": ("int", 10_000, 200_000),
    },
    "promotion": {
        "p_promo_sk": ("key",),
        "p_promo_id": ("string", "PROMO_"),
        "p_cost": ("money", 100.0, 1_000.0),
        "p_channel_dmail": ("choice", ["Y", "N"]),
        "p_channel_email": ("choice", ["Y", "N"]),
        "p_channel_tv": ("choice", ["Y", "N"]),
        "p_channel_event": ("choice", ["Y", "N"]),
    },
    "reason": {
        "r_reason_sk": ("key",),
        "r_reason_id": ("string", "REASON_"),
        # dsdgen-style 'reason N' descriptions (q93 filters r_reason_desc
        # = 'reason 28'); derived from the key, not random
        "r_reason_desc": lambda idc: F.concat(
            F.lit("reason "), (idc + 1).cast("string")),
    },
    "ship_mode": {
        "sm_ship_mode_sk": ("key",),
        "sm_type": ("choice", ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "LIBRARY"]),
        "sm_carrier": ("choice", ["UPS", "FEDEX", "AIRBORNE", "USPS", "DHL",
                                   "BARIAN"]),
    },
    "store": {
        "s_store_sk": ("key",),
        "s_store_id": ("string", "STORE_"),
        # dsdgen store-name vocabulary (q88/q96 filter s_store_name='ese');
        # cycled, not hash-chosen: 12 stores must cover all 8 names
        "s_store_name": _cycle(["ese", "ought", "able", "bar", "anti",
                                "cally", "ation", "eing"]),
        "s_number_employees": ("int", 200, 300),
        "s_floor_space": ("int", 5_000_000, 10_000_000),
        "s_company_id": ("int", 1, 6),
        "s_street_number": lambda idc: uniform_int(
            idc, "s_street_number", 1, 1_000).cast("string"),
        "s_street_name": ("choice", ["Main", "Oak", "Park", "First",
                                      "Cedar", "Elm"]),
        "s_street_type": ("choice", ["St", "Ave", "Blvd", "Ct", "Ln"]),
        "s_suite_number": ("string", "Suite "),
        "s_city": _cycle(_CITIES),
        # one store per (county, state) pair; TN stays in-vocab for
        # q36's s_state='TN' filter (and q27's IN-list)
        "s_county": _geo_pair_cycle(0),
        "s_state": _geo_pair_cycle(1),
        "s_zip": _cycle(_STORE_ZIPS),
        "s_company_name": ("choice", ["Unknown", "ought", "able", "pri"]),
        # cycled so market 8 (q24's filter) always has a store
        "s_market_id": lambda idc: (idc % 10 + 1).cast("long"),
        "s_gmt_offset": ("int", -8, -5),
    },
    # time_dim is a real CLOCK (like date_dim's calendar): t_time_sk is the
    # second-of-day + 1, hour/minute/second derive from it — so fact
    # sold_time_sk joins land on consistent hour/minute predicates (q88/q96)
    "time_dim": {
        "t_time_sk": ("key",),
        "t_time": lambda idc: idc,
        "t_hour": lambda idc: F.floor(idc / 3600).cast("long"),
        "t_minute": lambda idc: F.floor((idc % 3600) / 60).cast("long"),
        "t_second": lambda idc: (idc % 60).cast("long"),
        "t_am_pm": lambda idc: F.when(idc < 43_200, F.lit("AM")).otherwise(F.lit("PM")),
        # dsdgen meal windows (q71 filters on these)
        "t_meal_time": lambda idc: F.when(
            (idc >= 6 * 3600) & (idc < 10 * 3600), F.lit("breakfast")
        ).when((idc >= 17 * 3600) & (idc < 21 * 3600), F.lit("dinner")),
    },
    "warehouse": {
        "w_warehouse_sk": ("key",),
        "w_warehouse_name": ("string", "Warehouse "),
        "w_warehouse_sq_ft": ("int", 50_000, 1_000_000),
        "w_city": _cycle(_CITIES),
        "w_county": ("choice", _COUNTIES),
        "w_state": ("choice", ["CA", "NY", "TX", "WA"]),
        "w_country": lambda idc: F.lit("United States"),
    },
    "web_page": {
        "wp_web_page_sk": ("key",),
        "wp_web_page_id": ("string", "PAGE_"),
        "wp_creation_date_sk": _DATE_SK,
        "wp_char_count": ("int", 100, 8_000),
    },
    "web_site": {
        "web_site_sk": ("key",),
        "web_site_id": ("string", "SITE_"),
        "web_name": ("string", "site"),
        # cycled: q94/q95 filter web_company_name = 'pri'
        "web_company_name": _cycle(["pri", "able", "ought", "Unknown"]),
        "web_open_date_sk": _DATE_SK,
    },
    "call_center": {
        "cc_call_center_sk": ("key",),
        "cc_call_center_id": ("string", "CC_"),
        # cycled (6 rows must cover the vocabulary q99 groups on)
        "cc_name": _cycle(["NY Metro", "Mid Atlantic", "North Midwest",
                           "California", "Pacific Northwest", "Central"]),
        # cycled so 'Williamson County' (q16's filter) is always present
        "cc_county": _cycle(_COUNTIES),
        "cc_rec_start_date": ("date", 1998, 4),
        "cc_manager": ("string", "Manager "),
        "cc_employees": ("int", 100, 700),
        "cc_sq_ft": ("int", 10_000, 700_000),
    },
    "catalog_page": {
        "cp_catalog_page_sk": ("key",),
        "cp_catalog_page_id": ("string", "CP_"),
        "cp_catalog_number": ("int", 1, 109),
        "cp_catalog_page_number": ("int", 1, 188),
    },
}

_DIM_ROWS: dict[str, int] = {
    "date_dim": 73_049, "item": 18_000, "customer": 100_000,
    "customer_address": 50_000, "customer_demographics": 1_920_800,
    "household_demographics": 7_200, "income_band": 20, "promotion": 300,
    "reason": 35, "ship_mode": 20, "store": 12, "time_dim": 86_400,
    "warehouse": 5, "web_page": 60, "web_site": 30, "call_center": 6,
    "catalog_page": 11_718,
}


def tpcds_rows(name: str, scale: float) -> int:
    """Row count for a table at a given scale factor (facts scale linearly,
    dims are fixed — the TPC-DS convention)."""
    if name in TPCDS_FACTS:
        return max(1, int(TPCDS_FACTS[name][1] * scale))
    return _DIM_ROWS[name]


def gen_tpcds(
    spark: SparkSession, name: str, scale: float = 0.01, seed: str = "100",
    partitions: int | None = None,
) -> DataFrame:
    if name not in TPCDS_SCHEMAS:
        raise KeyError(f"unknown TPC-DS table {name!r}")
    entry = TPCDS_SCHEMAS[name]
    # returns tables are factories: they reproduce their sales channel's
    # hash columns and need the base seed, not the per-table seed
    columns = entry(seed) if callable(entry) else entry
    return gen_table(
        spark, tpcds_rows(name, scale), columns,
        seed=f"{seed}:{name}", partitions=partitions,
    )


def write_tpcds(
    spark: SparkSession, name: str, location: str, scale: float = 0.01,
    seed: str = "100",
) -> None:
    """Write a generated table the way the reference does: facts
    hive-partitioned on their date key (tpcds/Tables.scala:165-167),
    dims coalesced to one file (tpcds/Tables.scala:160-162)."""
    df = gen_tpcds(spark, name, scale, seed)
    writer = df.write.mode("overwrite").format("parquet")
    if name in TPCDS_FACTS:
        part_col = TPCDS_FACTS[name][0]
        # NOT-NULL partition filter (Tables.scala:168-170): a null date key
        # would land in __HIVE_DEFAULT_PARTITION__ and dodge every
        # partition-pruned scan. DISTRIBUTE BY the partition column so each
        # hive partition is written by one task (Tables.scala:143-156).
        df.where(F.col(part_col).isNotNull()).repartition(
            F.col(part_col)
        ).write.mode("overwrite").partitionBy(part_col).parquet(
            f"{location}/{name}"
        )
    else:
        writer = df.coalesce(1).write.mode("overwrite")
        writer.parquet(f"{location}/{name}")


# ---------------------------------------------------------------------------
# graph generators (edge lists; uniform + power-law skew)
# ---------------------------------------------------------------------------


def gen_edges(
    spark: SparkSession, n_nodes: int, n_edges: int, seed: str = "g",
    skew: float = 0.0, partitions: int | None = None,
) -> DataFrame:
    """Edge list (source long, target long). skew=0 -> uniform endpoints;
    skew>0 -> power-law-ish degree distribution via inverse-transform on
    the hash-uniform (replaces TrafficEstimation.scala's skew-0.1..1.0
    JSON fixtures)."""
    df = spark.range(0, n_edges, numPartitions=partitions)
    idc = F.col("id")

    def endpoint(s: str) -> Column:
        u = uniform(idc, f"{seed}:{s}", 0.0, 1.0)
        if skew <= 0:
            return (u * n_nodes).cast("long")
        # u^(1/(1-skew)) concentrates mass near 0 as skew -> 1
        return (F.pow(u, F.lit(1.0 / (1.0 - skew * 0.999))) * n_nodes).cast("long")

    return df.select(endpoint("src").alias("source"), endpoint("dst").alias("target"))


# ---------------------------------------------------------------------------
# micro-benchmark tables (JoinPerformance.scala:14-31,
# AggregationPerformance.scala:13-25, DatasetPerformance.scala:30-36)
# ---------------------------------------------------------------------------


def ints_table(spark: SparkSession, n: int, files: int = 1) -> DataFrame:
    """1milints / 100milints / 1bilints: `range(n).repartition(files)`."""
    return spark.range(n).repartition(files)


def grouped_ints(spark: SparkSession, n_groups: int, rows_per_group: int = 10_000) -> DataFrame:
    """intsN: (a int, b int) with `rows_per_group` rows per group value."""
    return spark.range(n_groups * rows_per_group).select(
        (F.col("id") % n_groups).cast("int").alias("a"),
        uniform_int(F.col("id"), "b", 0, 1 << 20).cast("int").alias("b"),
    )


def two_groups(spark: SparkSession, n: int) -> DataFrame:
    """twoGroupsN: (a = id % 2, b = id)."""
    return spark.range(n).select(
        (F.col("id") % 2).alias("a"), F.col("id").alias("b")
    )


def vary_data_size(df: DataFrame, n_bytes: int) -> DataFrame:
    """Append a `dataN` padding column of n literal bytes
    (JoinPerformance.scala:50-55 varyDataSize)."""
    return df.withColumn(f"data{n_bytes}", F.lit("*" * n_bytes))


def vary_num_matches(df: DataFrame, n: int) -> DataFrame:
    """n-fold self-union for match-multiplicity scaling
    (JoinPerformance.scala:64-70)."""
    return reduce(DataFrame.unionAll, [df] * n)
