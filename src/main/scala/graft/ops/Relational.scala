package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Relational operator inventory (SURVEY.md §7.3) — scans, filters, joins,
  * aggregations, windows, set ops, scalar functions — each expressed as a
  * declarative DataFrame plan so Catalyst handles pushdown, pruning, join
  * strategy and AQE re-planning.
  *
  * Oracle-parity convention: any aggregation over double "money" columns
  * first casts to DECIMAL(18,2) (the data is exactly 2-decimal — FIXTURES.md)
  * so sums are exact and therefore independent of partitioning/accumulation
  * order; the final value is cast back to double. Averages are computed as
  * exact-decimal-sum (cast to double) divided by count — a single IEEE
  * division that matches DuckDB bit-for-bit. Every query ends in a total
  * deterministic ORDER BY.
  */
object Relational {

  /** Exact 2-decimal view of a money/quantity double column. */
  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** l_extendedprice * (1 - l_discount) as an exact DECIMAL(18,4). */
  private def discPrice(df: DataFrame) =
    (dec2(df("l_extendedprice")) * (lit(1) - dec2(df("l_discount")))).cast(DecimalType(18, 4))

  /** TPC-H Q1 shape: multi-function hash aggregation with group keys.
    * Partial (map-side) aggregation + final merge — 2-phase, shuffle only
    * carries one row per (flag,status) per partition. */
  /** Unbounded money totals: collapse the decimal sum to scale 2 BEFORE
    * the final double cast. A sum at scale s only converts to double
    * identically across engines while value*10^s stays under 2^53 — above
    * that, engines that cast decimal->double in two roundings (int128 to
    * double, then divide by 10^s) can land one ulp away from a correctly
    * rounded conversion (the sf1 sweep caught exactly this on q01's
    * scale-6 charge sum). At scale 2 the window extends to ~9e13 in value
    * — beyond any per-group money total this schema can produce. */
  private def moneyTotal(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // round(), not a down-scale CAST: Spark's decimal cast rounds HALF_UP
    // while DuckDB's truncates — round(d, 2) is half-away-from-zero in
    // both engines and returns a scale-2 decimal whose double cast is
    // then exact in the window above.
    round(c, 2).cast(DoubleType)

  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val charge = (discPrice(lineitem) * (lit(1) + dec2(lineitem("l_tax")))).cast(DecimalType(18, 6))
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        moneyTotal(sum(discPrice(lineitem))).as("sum_disc_price"),
        moneyTotal(sum(charge)).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Selective predicate scan + projection: filters and the 5-column read
    * schema are pushed into the parquet scan. */
  def filterScan(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      // (l_orderkey, l_linenumber) is not unique in the synthetic lineitem
      // (q04 has the same caveat) — order by every output column so the
      // row order is total and the oracle compare cannot see tied rows in
      // a different engine order (caught by the sf1 sweep).
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")

  /** TPC-H Q6 shape: fully-pushed selective aggregate, no shuffle beyond the
    * final single-row merge. */
  def selectiveRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        moneyTotal(sum((dec2(col("l_extendedprice")) * dec2(col("l_discount"))).cast(DecimalType(18, 4))))
          .as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q3 shape: selective fact-dim join (dim side broadcast by
    * Catalyst), aggregation, top-k. */
  def topRevenueOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    customer
      .filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(discPrice(lineitem)).cast(DoubleType).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)

  /** Left outer join against a pre-aggregated side: per-customer order stats,
    * customers without orders kept with nulls. */
  def customerOrderStats(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perCust = orders
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast(DoubleType).as("total_spent"))
    customer
      .select("c_custkey", "c_name", "c_mktsegment")
      .join(perCust, Seq("c_custkey"), "left")
      .orderBy("c_custkey")
  }

  /** Left-semi join (EXISTS): customers having at least one 'F' order. */
  def customersWithFinishedOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** Left-anti join (NOT EXISTS): customers with no 'P' order. */
  def customersWithoutPendingOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_orderstatus") === "P").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Distinct aggregation: per-segment stats with COUNT(DISTINCT). */
  def segmentStats(customer: DataFrame): DataFrame =
    customer
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        sum(dec2(col("c_acctbal"))).cast(DoubleType).as("sum_acctbal"))
      .withColumn("avg_acctbal", col("sum_acctbal") / col("n_customers"))
      .orderBy("c_mktsegment")

  /** ROLLUP over the region→nation hierarchy: subtotals + grand total.
    * Spark plans rollup as a single Expand + hash aggregate. */
  def revenueRollup(region: DataFrame, nation: DataFrame, customer: DataFrame,
      orders: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast(DoubleType).as("revenue"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  /** Ranking window: first 3 orders per customer by date, plus the previous
    * order's price (lag) — partitioned window, deterministic tie-break. */
  def firstOrdersPerCustomer(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "rn", "prev_price")
      .orderBy("o_custkey", "rn")
  }

  /** Sliding-frame window: 3-row moving sum/avg of quantity per supplier.
    * Sum over an exact decimal is accumulation-order independent, so the
    * frame aggregation is engine-portable; the average is derived by one
    * IEEE division. */
  def movingQuantity(lineitem: DataFrame): DataFrame = {
    // (l_orderkey, l_linenumber) is not unique in the synthetic lineitem, so
    // both the frame ordering and the output ordering carry extra columns to
    // stay total — otherwise the moving sum itself is nondeterministic.
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
      .rowsBetween(-2, 0)
    lineitem
      .withColumn("qty_3sum", sum(dec2(col("l_quantity"))).over(w).cast(DoubleType))
      .withColumn("qty_3n", count(lit(1)).over(w))
      .withColumn("qty_3avg", col("qty_3sum") / col("qty_3n"))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "qty_3sum", "qty_3avg")
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "qty_3sum", "qty_3avg")
  }

  /** Global top-k: total sort is avoided — Spark plans orderBy+limit as
    * TakeOrderedAndProject (per-partition top-k, then merge of k·P rows). */
  def topOrders(orders: DataFrame): DataFrame =
    orders
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")

  /** Set ops: symmetric difference of the customer-key sets of 'O' vs 'F'
    * orders ((A EXCEPT B) UNION (B EXCEPT A)). */
  def exclusiveStatusCustomers(orders: DataFrame): DataFrame = {
    val a = orders.filter(col("o_orderstatus") === "O").select(col("o_custkey")).distinct()
    val b = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
    a.except(b).union(b.except(a)).orderBy("o_custkey")
  }

  /** Set ops: INTERSECT of the same two key sets. */
  def sharedStatusCustomers(orders: DataFrame): DataFrame = {
    val a = orders.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val b = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    a.intersect(b).orderBy("o_custkey")
  }

  /** Scalar-function mix: date parts/truncation, string ops, exact decimal
    * math — all codegen'd builtins, no UDFs. */
  def scalarShowcase(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("order_year"),
      month(col("o_orderdate")).as("order_month"),
      dayofmonth(col("o_orderdate")).as("order_day"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      upper(col("o_orderpriority")).as("priority_upper"),
      substring(col("o_orderpriority"), 1, 1).as("priority_code"),
      concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_priority"),
      length(col("o_orderpriority")).as("priority_len"),
      (dec2(col("o_totalprice")) * lit(BigDecimal("1.1")).cast(DecimalType(3, 1)))
        .cast(DecimalType(18, 3)).cast(DoubleType).as("price_with_tax"),
      abs(dec2(col("o_totalprice")) - lit(200000)).cast(DoubleType).as("price_dev"))
    .orderBy("o_orderkey")

  /** A genuinely large shuffle join (fact ⋈ fact): orders ⋈ lineitem with
    * aggregation on the joined result. At scale this is the sort-merge /
    * shuffled-hash path AQE tunes; keys are co-partitioned by the shuffle. */
  def orderLineRevenue(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        moneyTotal(sum(discPrice(lineitem))).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy("o_orderstatus", "o_orderpriority")

  /** Exact grouped percentiles (continuous interpolation — the
    * `percentile`/`quantile_cont` definition shared by Spark and DuckDB):
    * per-returnflag quantity distribution. Exact percentile state is the
    * per-group value multiset; for the low-cardinality measures it is the
    * right default even at corpus scale, and the drop-in scale escape for
    * high-cardinality measures is `approx_percentile` (KLL-style mergeable
    * sketch, same call shape — deliberately NOT used here so the result is
    * engine-portable). Rounded to 6 digits: interpolation is one multiply
    * and one add on doubles, bit-identical cross-engine at that precision. */
  def quantityPercentiles(lineitem: DataFrame): DataFrame = {
    val ps = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.95 -> "p95")
    val aggs = count(lit(1)).as("n_lines") +:
      ps.map { case (p, name) =>
        round(expr(s"percentile(l_quantity, $p)"), 6).as(name)
      }
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("l_returnflag")
  }

  /** Equi-join with a date-range residual (interval semantics): revenue from
    * lines shipped within 30 days of their order date. The equality on
    * orderkey keeps the join hash/sort-merge partitioned — the range
    * predicate is a post-join residual filter, NOT a nested-loop driver —
    * which is the scale-safe way to express "interval join with an equi
    * prefix" (a pure range join with no equi key would plan as a broadcast
    * nested loop and is only acceptable when one side is tiny). */
  def promptShipRevenue(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        moneyTotal(sum(discPrice(lineitem))).as("revenue"))
      .orderBy("o_orderpriority")

  /** The fact⋈fact revenue aggregation of [[orderLineRevenue]], executed
    * through [[Partitioning.saltedEquiJoin]]: lineitem rows are salted by
    * their own line identity, orders are replicated per salt, and the join
    * runs on (orderkey, salt) — the manual skew treatment for when one
    * orderkey dominates the shuffle. Must produce byte-identical results to
    * the unsalted plan (the DuckDB oracle for this query IS the plain
    * join), which is exactly the property that makes salting safe to apply
    * under skew pressure at 100 TB. */
  def saltedOrderLineRevenue(orders: DataFrame, lineitem: DataFrame,
      nSalts: Int = 8): DataFrame =
    Partitioning.saltedEquiJoin(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        orders, "o_orderkey",
        saltFrom = struct(col("l_linenumber"), col("l_quantity"), col("l_extendedprice")),
        nSalts = nSalts)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        moneyTotal(sum((dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast(DecimalType(18, 4)))).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy("o_orderstatus", "o_orderpriority")

  /** Pivot (crosstab): order counts by priority × status, statuses spread
    * into columns. Spark plans pivot as ONE aggregation pass with
    * conditional aggregates (no per-pivot-value scans); values are pinned
    * explicitly, which is mandatory at scale — an unpinned pivot runs an
    * extra distinct job over the pivot column first. */
  def statusPivot(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L, Seq("F", "O", "P"))
      .select(col("o_orderpriority"),
        col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
      .orderBy("o_orderpriority")

  /** CUBE over (segment, nation): all four grouping combinations in one
    * Expand + hash aggregate — subtotals by each dimension independently
    * plus the grand total, the full-materialization companion to
    * [[revenueRollup]]'s hierarchy. */
  def segmentNationCube(customer: DataFrame, nation: DataFrame): DataFrame =
    customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .cube(col("c_mktsegment"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(dec2(col("c_acctbal"))).cast(DoubleType).as("sum_acctbal"))
      .orderBy(asc_nulls_first("c_mktsegment"), asc_nulls_first("n_name"))

  /** Distribution window functions — ntile / percent_rank / cume_dist
    * (the ranking family q11's rank/lag does not cover). The window order
    * includes the key, so ranks are total and deterministic; the two
    * fractions are exact small-integer rationals ((rank−1)/(n−1),
    * rank/n) at fixed precision. One shuffle keyed by the partition
    * column, same as any window. */
  /** Rank-distribution trio (ntile/percent_rank/cume_dist) per order
    * status — rewritten in round 6 from a status-partitioned window to
    * the two-level [[Partitioning.slicedPrefix]] rank: o_orderstatus has
    * THREE values, so the window form serialized a 100 TB frame through
    * three tasks (31.6 s at sf10 measured it). Because the ordering
    * (o_totalprice, o_orderkey) is a total order, the three window
    * functions are pure arithmetic on the per-group rank r and group
    * size n: percent_rank = (r-1)/(n-1), cume_dist = r/n, and ntile(4)
    * is the SQL-standard first-(n mod 4)-buckets-get-one-extra index
    * formula — all integer/one-division math, identical to the window's
    * output on a tie-free order. */
  def rankDistributions(orders: DataFrame): DataFrame = {
    val k = 4
    Partitioning.slicedPrefix(
        orders.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
        "o_totalprice", Seq("o_orderkey"), Seq("o_orderstatus"), lit(1L),
        "__r", totalCol = Some("__n"))
      .withColumn("__idx", col("__r") - 1)
      .withColumn("__q", expr(s"__n DIV $k"))
      .withColumn("__m", col("__n") % k)
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        (when(col("__idx") < col("__m") * (col("__q") + 1),
          expr("__idx DIV (__q + 1)"))
          .otherwise(col("__m") +
            expr("(__idx - __m * (__q + 1)) DIV greatest(__q, 1)"))
          + 1).cast("int").as("quartile"),
        round(col("__idx").cast("double") /
          greatest(col("__n") - 1, lit(1L)), 6).as("pct_rank"),
        round(col("__r").cast("double") / col("__n"), 6).as("cume"))
      .orderBy("o_orderkey")
  }

  /** Distributed exact ntile: assigns every row its SQL-standard
    * `ntile(k)` bucket under the total order (`valueCol`, tieBreak...)
    * WITHOUT a global single-partition window — the plan that makes
    * `ntile() OVER (ORDER BY ...)` unusable at scale (all rows through
    * one task).
    *
    * The global 0-based row index is the shared
    * [[Partitioning.slicedPrefix]] primitive with weight 1 and no group
    * (ties at a boundary land in ONE slice, so slice order × within-slice
    * order is a total order consistent with the global sort; parallelism
    * = #slices; offsets broadcast). The SQL-standard bucket is then pure
    * arithmetic on that index: with n rows, q = n DIV k, r = n MOD k, the
    * first r buckets get q+1 rows — all in 64-bit integer math (no
    * doubles, exact past 2^53 rows). */
  private[graft] def ntileAssign(df: DataFrame, valueCol: String,
                                 tieBreak: Seq[String], k: Int): DataFrame = {
    require(k > 0, "ntile bucket count must be positive")
    Partitioning.slicedPrefix(df, valueCol, tieBreak, Nil, lit(1L),
        "__rank", totalCol = Some("__n"))
      .withColumn("__idx", col("__rank") - 1)
      .withColumn("__q", expr(s"__n DIV $k"))
      .withColumn("__r", col("__n") % k)
      .withColumn("bin",
        (when(col("__idx") < col("__r") * (col("__q") + 1),
          expr("__idx DIV (__q + 1)"))
          .otherwise(col("__r") +
            expr(s"(__idx - __r * (__q + 1)) DIV greatest(__q, 1)"))
          + 1).cast("int"))
      .drop("__rank", "__n", "__idx", "__q", "__r")
  }

  /** Equal-frequency binning of lineitem prices — the feature-engineering
    * primitive behind quantile bucketing (model feature discretization,
    * monotone calibration bins): k buckets with sizes differing by at
    * most one row, exact SQL-standard ntile semantics, built on
    * [[ntileAssign]] so no stage funnels all rows through one task. Money
    * stays in DECIMAL(18,2) until the final cast (oracle-exact sums). */
  def priceBins(lineitem: DataFrame, k: Int = 10): DataFrame =
    ntileAssign(lineitem.select(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber")),
      "l_extendedprice", Seq("l_orderkey", "l_linenumber"), k)
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_extendedprice")).cast(DoubleType).as("lo"),
        max(col("l_extendedprice")).cast(DoubleType).as("hi"),
        sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_price"))
      .orderBy("bin")

  /** Co-purchase affinity — the market-basket primitive behind item-item
    * collaborative filtering ("customers who bought X also bought Y"):
    * for every unordered part pair appearing in the same order, how many
    * orders contain both; the strongest `k` pairs win (deterministic
    * tiebreak on the pair itself).
    *
    * Scale shape: the pair generator is a SELF-EQUI-JOIN keyed by
    * l_orderkey — it shuffles each side once on the basket key and fans
    * out quadratically only WITHIN a basket, so cost is bounded by
    * Σ(basket size²), not corpus², and TPC-H baskets are ≤ 7 lines.
    * Baskets are deduped to distinct (order, part) first so repeated
    * lineitems of one part don't inflate the pair count. The `a < b`
    * predicate halves the join output at the source (no post-hoc
    * dedup of mirrored pairs), and the top-k plans as
    * TakeOrderedAndProject — per-partition heaps, no global sort. */
  /** Group-wise z-score standardization — the feature-scaling step model
    * training pipelines apply to numeric inputs (per-segment here, the
    * grouped form that respects population differences between segments).
    *
    * Engine-exact by construction: the money column is folded to integer
    * CENTS first, so the group moments (n, Σc, Σc²) are exact BIGINTs —
    * no float summation order to disagree on — and mean/variance/z are
    * then IDENTICAL double expressions over those exact integers in both
    * engines (sample variance via the moments identity).
    *
    * Scale shape: ONE aggregation produces a #groups-row stats frame that
    * broadcasts back onto the table — the standardization itself is
    * map-side (no window over the data, no second shuffle). */
  def zscoreNormalize(customer: DataFrame): DataFrame = {
    val cents = expr("CAST(round(c_acctbal * 100) AS BIGINT)")
    val stats = customer
      .select(col("c_mktsegment"), cents.as("__c"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("__n"), sum(col("__c")).as("__s"),
        sum(col("__c") * col("__c")).as("__ss"))
    customer.select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .join(broadcast(stats), Seq("c_mktsegment"))
      .withColumn("__mean", col("__s") / lit(100.0) / col("__n"))
      .withColumn("__var",
        (col("__ss") / lit(10000.0) -
          (col("__s") / lit(100.0)) * (col("__s") / lit(100.0)) / col("__n")) /
          (col("__n") - lit(1)))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round((col("c_acctbal") - col("__mean")) / sqrt(col("__var")), 6)
          .as("z_score"))
      .orderBy("c_custkey")
  }

  /** Default top-k for [[coPurchasePairs]]; the q122 oracle SQL interpolates
    * this SAME constant into its LIMIT, so the two sides cannot drift. */
  val CoPurchaseTopK = 50

  def coPurchasePairs(lineitem: DataFrame, k: Int = CoPurchaseTopK): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val baskets = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    baskets.as("a")
      .join(baskets.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(k)
  }

  /** Slowly-changing-dimension TYPE-2 history build — the warehouse
    * primitive behind every "as of" dimension: collapse an ordered change
    * stream (here each customer's orders, `o_orderpriority` as the tracked
    * attribute) into validity intervals, emitting a row only when the
    * tracked value CHANGES, with `effective_from`/`effective_to` bounds
    * and an `is_current` flag on the open interval. The result is what
    * [[AsOfJoin]] consumes on the dimension side.
    *
    * Two windows over the SAME (key, time) partitioning — Catalyst plans
    * them into one sort + one exchange; cost is a single shuffle by key,
    * which is the floor for any per-key ordered pass. Change-row order is
    * made total by the (o_orderdate, o_orderkey) tiebreak so reruns and
    * the oracle agree on which same-instant change wins. */
  def scd2Build(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val changes = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .withColumn("__prev", lag(col("o_orderpriority"), 1).over(w))
      // First row per key (__prev null) always opens an interval.
      .filter(col("__prev").isNull || col("__prev") =!= col("o_orderpriority"))
    val wc = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    changes
      .withColumn("version_n", row_number().over(wc).cast("int"))
      .withColumn("effective_to", lead(col("o_orderdate"), 1).over(wc))
      .select(col("o_custkey"), col("version_n"),
        col("o_orderpriority"), col("o_orderdate").as("effective_from"),
        col("effective_to"), col("effective_to").isNull.as("is_current"))
      .orderBy("o_custkey", "version_n")
  }

  /** Trailing time-RANGE window aggregate — "orders and spend in the 30
    * days up to and including this order", per customer. A rows-frame
    * (q12) counts a fixed number of neighbors; a range-frame covers a
    * fixed TIME span, which is what rolling business metrics mean. Spark
    * range frames need a numeric ordering key, so the order date becomes
    * a day number; same-day orders are frame peers in both engines (the
    * RANGE semantics), making the result insensitive to intra-day order.
    * Money is summed in exact BIGINT cents (the q123 convention).
    *
    * Scale shape: one shuffle by customer; the running frame is
    * incremental per partition — no self-join against a date dimension,
    * which is the naive formulation's quadratic trap. */
  def trailingIntervalAgg(orders: DataFrame, days: Int = 30): DataFrame = {
    require(days >= 1, s"days must be >= 1, got $days")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("__day"))
      .rangeBetween(-(days - 1).toLong, 0L)
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("__cents"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("__day"))
      .withColumn("n_orders_30d", count(lit(1)).over(w))
      .withColumn("sum_cents_30d", sum(col("__cents")).over(w))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("n_orders_30d"), col("sum_cents_30d"))
      .orderBy("o_orderkey")
  }

  /** Robust outlier detection by median absolute deviation — the
    * data-quality screen that (unlike [[zscoreNormalize]]'s mean/stddev)
    * a few extreme rows cannot drag: flag events whose value deviates
    * from its type's median by more than `k` normalized MADs
    * (MAD × 1.4826 ≈ σ under normality). Exact medians via the same
    * interpolating `percentile` the engines already agree on (q51);
    * inputs are BIGINT cents so every interpolation midpoint is
    * float-exact.
    *
    * Scale shape: two aggregation passes each producing a #groups-row
    * frame that broadcasts back — the deviation filter itself is
    * map-side; no window over the data. Degenerate groups (MAD = 0, over
    * half the group at the median) flag nothing rather than dividing by
    * zero — a documented policy, not an accident. */
  def madOutliers(events: DataFrame, k: Double = 3.5): DataFrame = {
    val base = events.select(col("event_id"), col("event_type"), col("value"),
      expr("CAST(round(value * 100) AS BIGINT)").as("__c"))
    val med = base.groupBy(col("event_type"))
      .agg(expr("percentile(__c, 0.5D)").as("__med"))
    val dev = base.join(broadcast(med), Seq("event_type"))
      .withColumn("__ad", abs(col("__c") - col("__med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(__ad, 0.5D)").as("__mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("__mad") > 0 &&
        col("__ad") > lit(k) * lit(1.4826) * col("__mad"))
      .select(col("event_type"), col("event_id"), col("value"),
        round(col("__ad") / (lit(1.4826) * col("__mad")), 6).as("robust_z"))
      .orderBy("event_type", "event_id")
  }

  /** Grouped WEIGHTED median — the robust-stats sibling of the plain
    * percentile (q51): the smallest quantity whose cumulative revenue
    * weight reaches half the group's total. `2·cum ≥ tot` in exact BIGINT
    * cents, so the crossing point is integer arithmetic, no interpolation
    * convention to align. The cumulative itself is
    * [[Partitioning.slicedPrefix]] — the scale-safe two-level prefix sum —
    * so a 5-group 100 TB frame is NOT serialized through 5 tasks the way
    * a naive running-total window would.
    *
    * The first row crossing the half (in (value, tiebreak) order) always
    * carries the weighted-median VALUE: the cumulative crosses inside
    * value v's row run iff v is the smallest value whose full-run
    * cumulative reaches half, so min(value) over crossing rows is exact
    * regardless of how ties on v are ordered internally. */
  def weightedMedian(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(col("l_returnflag"), col("l_quantity"),
      col("l_orderkey"), col("l_linenumber"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("__w"))
    Partitioning.slicedPrefix(base, "l_quantity",
      Seq("l_orderkey", "l_linenumber"), Seq("l_returnflag"),
      col("__w"), "__cum", Some("__tot"))
      .filter(lit(2) * col("__cum") >= col("__tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_quantity")).as("weighted_median_qty"),
        min(col("__tot")).as("total_weight_cents"))
      .orderBy("l_returnflag")
  }

  /** Incremental SCD2 maintenance — [[scd2Build]]'s delta form: fold an
    * append-only batch of new change events into an existing history
    * WITHOUT rebuilding untouched keys. The contract is the standard
    * warehouse ingest one: batch rows for a key all land at-or-after the
    * key's open interval (append-only per key); under it the result is
    * provably identical to rebuilding from the full change stream — which
    * is exactly how q140 is oracle-checked (its DuckDB oracle IS q128's
    * full rebuild).
    *
    * Scale shape: every stage is keyed by customer and sized by the BATCH
    * (plus one open-interval row per touched key, fetched by an equi-join
    * against the batch's key set) — history rows for untouched keys are
    * passed through untouched. Refresh cost tracks the delta, not the
    * table, which is the property that makes daily 100 TB dimension
    * maintenance affordable. */
  def scd2Apply(history: DataFrame, batch: DataFrame): DataFrame = {
    // Deliberately UNPINNED throughout (round-13 measurement): eager
    // delta-sized localCheckpoints on keys/affected/newRows looked like
    // they should kill the plan's repeated history derivations (q140's
    // plan carries 32 orders scans), but each pin is its own job with a
    // full barrier, and per APPLY that overhead measured 2.3x the
    // recomputation it saved at sf0.1 (q140 1.9→4.5 s; the per-batch
    // streaming callers q144/q145/q89 each lost 15-25% too). At real
    // scale history is a parquet table whose repeated scans are cheap
    // columnar reads; the lazy shape is the right one on both ends.
    val keys = batch.select(col("o_custkey")).distinct()
    val affected = history.join(keys, Seq("o_custkey"), "left_semi")
    val untouched = history.join(keys, Seq("o_custkey"), "left_anti")
    val open = affected.filter(col("is_current"))
      .select(col("o_custkey"), col("version_n").as("__open_v"),
        col("o_orderpriority").as("__open_attr"),
        col("effective_from").as("__open_from"))
    // Append-only contract ENFORCED, not just documented: a batch row
    // dated before its key's open interval would sort ahead of the seed
    // row in the change-detection window and silently produce a history
    // that differs from the full rebuild — a wrong answer, not an error.
    // The guard rides the batch rows' o_orderpriority (always computed by
    // the change-detection window, so it cannot be pruned away) and fails
    // the job loudly at execution time with the key and both dates — no
    // extra driver-side job; the open-interval join is delta-sized.
    val guarded = batch
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .join(open.select(col("o_custkey"), col("__open_from")),
        Seq("o_custkey"), "left")
      .withColumn("o_orderpriority",
        when(col("__open_from").isNotNull &&
            col("o_orderdate") < col("__open_from"),
          raise_error(concat(
            lit("scd2Apply: append-only contract violated for key "),
            col("o_custkey").cast("string"),
            lit(": batch row dated "), col("o_orderdate").cast("string"),
            lit(" precedes the open interval's effective_from "),
            col("__open_from").cast("string"))).cast("string"))
          .otherwise(col("o_orderpriority")))
      .drop("__open_from")
    // Seed each key's change detection with its open interval (sorted
    // first by construction: append-only puts every batch row at-or-after
    // the open row's effective_from; the -1 orderkey breaks exact ties in
    // the seed's favor).
    val seeded = guarded
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"), lit(false).as("__seed"))
      .unionByName(open.select(col("o_custkey"),
        lit(-1L).as("o_orderkey"), col("__open_from").as("o_orderdate"),
        col("__open_attr").as("o_orderpriority"), lit(true).as("__seed")))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val newChanges = seeded
      .withColumn("__prev", lag(col("o_orderpriority"), 1).over(w))
      .filter(!col("__seed") &&
        (col("__prev").isNull || col("__prev") =!= col("o_orderpriority")))
    val wc = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val newRows = newChanges
      .join(open.select(col("o_custkey"), col("__open_v")), Seq("o_custkey"), "left")
      .withColumn("version_n",
        (coalesce(col("__open_v"), lit(0)) + row_number().over(wc)).cast("int"))
      .withColumn("effective_to", lead(col("o_orderdate"), 1).over(wc))
      .select(col("o_custkey"), col("version_n"), col("o_orderpriority"),
        col("o_orderdate").as("effective_from"), col("effective_to"),
        col("effective_to").isNull.as("is_current"))
    // Close each touched key's previously-open interval at its first new
    // change (keys whose batch rows never change the attribute keep their
    // open row as-is).
    val firstNew = newRows.groupBy(col("o_custkey"))
      .agg(min(col("effective_from")).as("__close_at"))
    val reclosed = affected.join(firstNew, Seq("o_custkey"), "left")
      .select(col("o_custkey"), col("version_n"), col("o_orderpriority"),
        col("effective_from"),
        when(col("is_current") && col("__close_at").isNotNull, col("__close_at"))
          .otherwise(col("effective_to")).as("effective_to"),
        (col("is_current") && col("__close_at").isNull).as("is_current"))
    untouched.unionByName(reclosed).unionByName(newRows)
      .orderBy("o_custkey", "version_n")
  }

  /** Point-in-time SCD2 enrichment — the consuming half of [[scd2Build]]:
    * for each fact, the dimension attribute that was CURRENT at the
    * fact's own timestamp (leakage-free enrichment, the same discipline
    * [[AsOfJoin]] gives feature lookups). Facts are events re-dated onto
    * the dimension's history span by exact integer arithmetic
    * (1995-01-01 + event_id % 2400 days) so the lookup genuinely varies
    * over versions instead of always hitting the final one.
    *
    * The interval probe (`from <= ts < to`) is NOT executed as an
    * interval join: change rows at same-instant ties are collapsed to
    * the winning version (max version_n — the (date, orderkey) order's
    * last), then [[AsOfJoin.asOf]] attaches the latest change ≤ ts in
    * one union + running-last window — one shuffle keyed by customer,
    * no per-key range explosion. */
  def scd2PointInTime(events: DataFrame, orders: DataFrame): DataFrame = {
    val changes = scd2Build(orders)
      .groupBy(col("o_custkey").as("user_id"), col("effective_from"))
      .agg(expr("max_by(o_orderpriority, version_n)").as("o_orderpriority"))
    val facts = events.select(col("event_id"), col("user_id"),
      date_add(lit("1995-01-01").cast("date"), (col("event_id") % 2400).cast("int"))
        .cast("timestamp").as("fact_ts"))
    AsOfJoin.asOf(facts, changes, Seq("user_id"), "fact_ts", "effective_from",
      Seq("o_orderpriority"))
      .select(col("event_id"), col("user_id"), col("fact_ts"),
        col("o_orderpriority").as("priority_at_fact"))
      .orderBy("event_id")
  }

  /** Incremental equi-join maintenance (delta-join algebra): with A split
    * into (A₀, ΔA) and B into (B₀, ΔB), the join is EXACTLY the disjoint
    * union A₀⋈B₀ ∪ ΔA⋈B ∪ A₀⋈ΔB — the refresh rule that lets a
    * materialized 100 TB join absorb a daily delta at delta cost (the two
    * delta joins ship |Δ|-sized probe sides; A₀⋈B₀ is the persisted prior
    * result, recomputed inline here only because this demo owns no store).
    * The aggregate folds the three buckets, and the oracle is the PLAIN
    * join — any overlap or gap in the bucket algebra breaks the exact
    * cents totals. */
  def incrementalJoinRevenue(orders: DataFrame, lineitem: DataFrame,
      cut: String = "1999-01-01"): DataFrame = {
    val c = lit(cut).cast("timestamp")
    val aOld = orders.filter(col("o_orderdate") < c)
    val aNew = orders.filter(col("o_orderdate") >= c)
    val bOld = lineitem.filter(col("l_shipdate") < c)
    val bNew = lineitem.filter(col("l_shipdate") >= c)
    val key = col("o_orderkey") === col("l_orderkey")
    val joined = aOld.join(bOld, key)
      .unionByName(aNew.join(lineitem, key))
      .unionByName(aOld.join(bNew, key))
    joined
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("revenue_cents"))
      .orderBy("o_orderpriority")
  }

  /** Gaps-and-islands order streaks — per customer, runs of CONSECUTIVE
    * active months (an order in every month of the run). The rank-difference
    * trick: over each customer's distinct month numbers in order,
    * `month - row_number()` is constant exactly within a consecutive run,
    * so it labels islands without any self-join or iteration. Month number
    * is `year*12 + (month-1)`, making "consecutive" pure integer adjacency.
    *
    * Scale shape: one shuffle by customer; both windows and the streak
    * aggregate share the (customer) partitioning, and the per-customer
    * frames are bounded by the calendar (#months), never by data volume. */
  def orderStreaks(orders: DataFrame): DataFrame = {
    val months = orders
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("__m"))
      .distinct()
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("__m"))
    val streaks = months
      .withColumn("__isl", col("__m") - row_number().over(w))
      .groupBy(col("o_custkey"), col("__isl"))
      .agg(count(lit(1)).as("__len"), min(col("__m")).as("__start"))
    val best = Window.partitionBy(col("o_custkey"))
      .orderBy(col("__len").desc, col("__start"))
    streaks
      .withColumn("__rn", row_number().over(best))
      .groupBy(col("o_custkey"))
      .agg(
        sum(col("__len")).as("n_active_months"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).cast("int").as("longest_streak"),
        // The earliest longest streak's first month, rendered as a date.
        min(when(col("__rn") === 1, col("__start"))).as("__bs"))
      // Timestamp, not date: the fixture's own date columns are physical
      // timestamps, and both engines' parquet writers agree on that type.
      .withColumn("longest_start",
        make_date(floor(col("__bs") / 12), pmod(col("__bs"), lit(12)) + 1, lit(1))
          .cast("timestamp"))
      .select(col("o_custkey"), col("n_active_months"), col("n_streaks"),
        col("longest_streak"), col("longest_start"))
      .orderBy("o_custkey")
  }

  /** Winsorization — robust feature clipping: clamp each customer's
    * balance into its segment's [p05, p95] band. The companion to
    * [[zscoreNormalize]] (which outliers CAN drag) and [[madOutliers]]
    * (which flags, where this repairs). Percentiles are the interpolating
    * `percentile` over exact BIGINT cents — the q51 parity convention —
    * then the clamp and the single /100 division are identical IEEE ops
    * in both engines.
    *
    * Scale shape: one aggregation pass to a #segments-row stats frame,
    * broadcast back; the clamp itself is map-side — no window, no second
    * shuffle of the data. */
  def winsorize(customer: DataFrame, lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val base = customer.select(col("c_custkey"), col("c_mktsegment"),
      col("c_acctbal"), expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("__c"))
    val stats = base.groupBy(col("c_mktsegment"))
      .agg(expr(s"percentile(__c, ${lo}D)").as("__lo"),
        expr(s"percentile(__c, ${hi}D)").as("__hi"))
    base.join(broadcast(stats), Seq("c_mktsegment"))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(greatest(least(col("__c").cast("double"), col("__hi")), col("__lo")) / 100.0, 6)
          .as("acctbal_w"),
        (col("__c") < col("__lo")).as("clipped_low"),
        (col("__c") > col("__hi")).as("clipped_high"))
      .orderBy("c_custkey")
  }

  /** Pareto frontier (skyline): parts not dominated on (price ↓, size ↑) —
    * another part is at most as expensive AND at least as large, strictly
    * better on one. The naive formulation is a quadratic NOT EXISTS
    * self-join (that IS the DuckDB oracle); the distributed plan is
    * O(n log n): collapse to one row per distinct price-in-cents with the
    * max size at that price, take a [[Partitioning.slicedRunningMax]]
    * strict-prefix max over price order (price is unique per row there, so
    * the rows-frame IS the strict value prefix), and re-join by price.
    * A part survives iff no strictly-cheaper price reaches its size and
    * no same-price part strictly exceeds it.
    *
    * Scale shape: the quadratic candidate join is gone entirely; cost is
    * one groupBy(price), the two-level sliced window over the distinct-
    * price frame, and one equi-join back — all key-partitioned. */
  def paretoFrontier(part: DataFrame): DataFrame = {
    val withCents = part.withColumn("__cents",
      expr("CAST(round(p_retailprice * 100) AS BIGINT)"))
    val perPrice = withCents.groupBy(col("__cents"))
      .agg(max(col("p_size")).as("__mx"))
    val pref = Partitioning.slicedRunningMax(
      perPrice, "__cents", Seq.empty, col("__mx"), "__strict", "__leq")
    withCents
      .join(pref.select(col("__cents"), col("__mx"), col("__strict")), Seq("__cents"))
      .filter(
        (col("__strict").isNull || col("__strict") < col("p_size")) &&
          col("__mx") === col("p_size"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"), col("p_size"))
      .orderBy("p_retailprice", "p_partkey")
  }
}
