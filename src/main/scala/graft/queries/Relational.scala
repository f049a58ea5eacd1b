package graft.queries

import graft.QueryDef
import graft.functions.Exprs._
import graft.operators.{Bloom, Skew}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Relational core: scans, filters (pushed to the parquet scan), broadcast and
  * shuffle joins, grouped/rollup aggregation, window functions, top-k, union,
  * distinct, semi/anti joins — SURVEY.md §2.1-2.6 re-expressed declaratively.
  *
  * Scale notes: dimension joins (nation/region/part) are explicit `broadcast`s;
  * the orders⋈lineitem join shuffles on the join key only after the scan has
  * pruned columns; aggregates all partial-aggregate map-side automatically.
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q01_pricing_agg",
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("cnt"))
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) AS avg_disc,
          COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2"""),
      bench = true),

    QueryDef("q02_filter_project",
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
            col("l_discount") >= 0.05 && col("l_quantity") < 25)
          .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"))
      },
      oracle = Some("""
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_quantity < 25"""),
      bench = true),

    QueryDef("q03_dim_join",
      (s, dir) => {
        Tables(s, dir, "customer")
          .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
      },
      oracle = Some("""
        SELECT r_name, n_name, COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2""")),

    QueryDef("q04_fact_join",
      (s, dir) => {
        Tables(s, dir, "orders")
          .join(Tables(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      },
      oracle = Some("""
        SELECT o_orderpriority, COUNT(*) AS n_items,
          CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1"""),
      bench = true),

    QueryDef("q05_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables(s, dir, "orders")
          .withColumn("rk", row_number().over(w).cast(LongType))
          .filter(col("rk") <= 3)
          .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      },
      oracle = Some("""
        SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
            CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk
          FROM orders) t
        WHERE rk <= 3""")),

    QueryDef("q06_window_lag",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast(LongType).as("rn"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey,
          CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
          lag(o_totalprice) OVER w AS prev_price,
          o_totalprice - lag(o_totalprice) OVER w AS delta
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""")),

    QueryDef("q07_union_buckets",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val hi = o.filter(col("o_totalprice") >= 200000.0)
          .select(lit("high").as("bucket"), col("o_totalprice"))
        val lo = o.filter(col("o_totalprice") < 50000.0)
          .select(lit("low").as("bucket"), col("o_totalprice"))
        hi.union(lo).groupBy(col("bucket"))
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
      },
      oracle = Some("""
        SELECT bucket, COUNT(*) AS cnt,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
        FROM (
          SELECT 'high' AS bucket, o_totalprice FROM orders WHERE o_totalprice >= 200000.0
          UNION ALL
          SELECT 'low' AS bucket, o_totalprice FROM orders WHERE o_totalprice < 50000.0) t
        GROUP BY 1""")),

    QueryDef("q08_distinct_agg",
      (s, dir) => {
        Tables(s, dir, "part").groupBy(col("p_brand"))
          .agg(countDistinct(col("p_type")).as("n_types"),
            countDistinct(col("p_size")).as("n_sizes"),
            count(lit(1)).as("cnt"))
      },
      oracle = Some("""
        SELECT p_brand, COUNT(DISTINCT p_type) AS n_types,
          COUNT(DISTINCT p_size) AS n_sizes, COUNT(*) AS cnt
        FROM part GROUP BY 1""")),

    QueryDef("q09_anti_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1996-01-01").cast(TimestampType))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").cast(LongType).as("c_nationkey"))
          .agg(count(lit(1)).as("n_inactive"))
      },
      oracle = Some("""
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, COUNT(*) AS n_inactive
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate < TIMESTAMP '1996-01-01')
        GROUP BY 1""")),

    QueryDef("q10_semi_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_active"))
      },
      oracle = Some("""
        SELECT c_mktsegment, COUNT(*) AS n_active
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY 1""")),

    QueryDef("q11_rollup",
      (s, dir) => {
        Tables(s, dir, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg((grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
            .cast(LongType).as("gid"),
            count(lit(1)).as("cnt"),
            dsum(col("o_totalprice")).as("sum_price"))
      },
      oracle = Some("""
        SELECT o_orderstatus, o_orderpriority,
          CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
          COUNT(*) AS cnt,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""")),

    // Pivot: status × priority revenue matrix (conditional-aggregation form)
    QueryDef("q52_pivot",
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(dsum(col("o_totalprice")))
          .withColumnRenamed("1-URGENT", "p1").withColumnRenamed("2-HIGH", "p2")
          .withColumnRenamed("3-MEDIUM", "p3").withColumnRenamed("4-NOT SPECIFIED", "p4")
          .withColumnRenamed("5-LOW", "p5")
      },
      oracle = Some("""
        SELECT o_orderstatus,
          CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS p1,
          CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS p2,
          CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS p3,
          CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS p4,
          CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS p5
        FROM orders GROUP BY 1""")),

    // Rank-family windows: ntile / percent_rank / cume_dist
    QueryDef("q53_window_ranks",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        Tables(s, dir, "orders").select(
          col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          round(percent_rank().over(w), 10).as("pct_rank"),
          round(cume_dist().over(w), 10).as("cume"))
      },
      oracle = Some("""
        SELECT o_orderpriority, o_orderkey,
          CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          round(percent_rank() OVER w, 10) AS pct_rank,
          round(cume_dist() OVER w, 10) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)""")),

    // Correlated-aggregate filter: customers above their nation's average balance
    QueryDef("q54_above_nation_avg",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val natAvg = c.groupBy(col("c_nationkey").as("nk"))
          .agg((sum(col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(30, 6)))
            .cast(org.apache.spark.sql.types.DoubleType) /
            count(lit(1)).cast(org.apache.spark.sql.types.DoubleType)).as("nat_avg"))
        c.join(broadcast(natAvg), c("c_nationkey") === natAvg("nk"))
          .filter(col("c_acctbal") > col("nat_avg"))
          .groupBy(col("c_nationkey").cast(LongType).as("c_nationkey"))
          .agg(count(lit(1)).as("n_above"))
      },
      oracle = Some("""
        WITH na AS (
          SELECT c_nationkey AS nk,
            CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) AS nat_avg
          FROM customer GROUP BY 1)
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, COUNT(*) AS n_above
        FROM customer JOIN na ON c_nationkey = nk
        WHERE c_acctbal > nat_avg
        GROUP BY 1""")),

    // Calendar rollup: orders per (year, month) with revenue
    QueryDef("q57_monthly_orders",
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).cast(LongType).as("y"),
            month(col("o_orderdate")).cast(LongType).as("m"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      },
      oracle = Some("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1, 2""")),

    // Skew-salted shuffle join: events ⋈ per-type stats on event_type — a
    // handful of hot keys carrying the whole fact table, the classic
    // power-law join AQE's splitting handles only after a task has already
    // skewed. Semantics are EXACTLY the plain inner join (the salt spreads
    // rows, never changes matches), which is what the oracle asserts.
    QueryDef("q93_salted_join",
      (s, dir) => {
        val ev = Tables(s, dir, "events").select(col("event_type"), col("value"))
        val dim = Tables(s, dir, "events").groupBy(col("event_type"))
          .agg(davg(col("value")).as("type_avg"))
        Skew.saltedJoin(ev, dim, "event_type", salts = 8)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("value") > col("type_avg"), 1L).otherwise(0L)).as("n_above_avg"))
      },
      oracle = Some("""
        WITH ta AS (
          SELECT event_type AS et,
            CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) AS type_avg
          FROM events GROUP BY 1)
        SELECT event_type, COUNT(*) AS n_events,
          CAST(SUM(CASE WHEN value > type_avg THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg
        FROM events JOIN ta ON event_type = et
        GROUP BY 1""")),

    // Bloom-pruned fact join (runtime-filter shape): the urgent-orders
    // predicate lives on the dim side where the lineitem scan can't see it;
    // the Bloom prune pushes its selectivity onto the fact side BEFORE the
    // shuffle. False positives survive the prune but not the exact join, so
    // the result is bit-identical to the plain join — the oracle IS the
    // plain join. BloomJoinSpec pins the plan shape (getbit filter below
    // the fact-side exchange).
    QueryDef("q94_bloom_join",
      (s, dir) => {
        val urgent = Tables(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        Bloom.prunedJoin(Tables(s, dir, "lineitem"), "l_orderkey", urgent, "o_orderkey")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))
      },
      oracle = Some("""
        SELECT l_returnflag, COUNT(*) AS n_items,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY 1"""),
      bench = true),

    // Snapshot diff — the period-over-period table-delta classifier every
    // warehouse regression/audit pipeline runs: per-customer order
    // aggregates for 1995 vs 1996, full-outer-joined on the key and each
    // row classified added / removed / changed (unchanged rows drop).
    // Both sides arrive PRE-AGGREGATED, so the outer join carries
    // customer-level partials, never raw orders (the q144 IVM shape,
    // diff-flavored); totals ride the exact DECIMAL ladder so 'changed'
    // can compare doubles safely.
    QueryDef("q148_snapshot_diff",
      (s, dir) => {
        def snap(year: Int) = Tables(s, dir, "orders")
          .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
            col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        val a = snap(1995).select(col("o_custkey"), col("n").as("old_n"), col("total").as("old_total"))
        val b = snap(1996).select(col("o_custkey"), col("n").as("new_n"), col("total").as("new_total"))
        a.join(b, Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"),
            when(col("old_n").isNull, lit("added"))
              .when(col("new_n").isNull, lit("removed"))
              .when(col("old_n") =!= col("new_n") || col("old_total") =!= col("new_total"),
                lit("changed"))
              .otherwise(lit("unchanged")).as("change"),
            col("old_n"), col("new_n"), col("old_total"), col("new_total"))
          .filter(col("change") =!= "unchanged")
      },
      oracle = Some("""
        WITH sa AS (
          SELECT o_custkey, COUNT(*) AS old_n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS old_total
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
          GROUP BY 1),
        sb AS (
          SELECT o_custkey, COUNT(*) AS new_n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS new_total
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
          GROUP BY 1),
        d AS (
          SELECT COALESCE(sa.o_custkey, sb.o_custkey) AS o_custkey,
            CASE WHEN sa.old_n IS NULL THEN 'added'
                 WHEN sb.new_n IS NULL THEN 'removed'
                 WHEN sa.old_n <> sb.new_n OR sa.old_total <> sb.new_total THEN 'changed'
                 ELSE 'unchanged' END AS change,
            sa.old_n, sb.new_n, sa.old_total, sb.new_total
          FROM sa FULL OUTER JOIN sb ON sa.o_custkey = sb.o_custkey)
        SELECT * FROM d WHERE change <> 'unchanged'"""),
      bench = true),

    // Entity resolution (record linkage): blocked candidate generation +
    // Fellegi–Sunter-style field-agreement scoring (Fellegi & Sunter,
    // JASA 1969 — the framework every dedupe/linkage system descends
    // from). The fixture injects a "dirty" duplicate for every 10th
    // customer in-plan (one name typo, same nation/balance/segment — the
    // re-keyed re-import case), then the pipeline must rediscover them:
    // candidates come from an equi join on the blocking key
    // (nation, ⌊acctbal/100⌋) — never all-pairs; each candidate scores
    // name-edit-distance ≤ 1 → +3, exact balance → +2, same segment → +1;
    // links are score ≥ 5, so a link REQUIRES the exact-balance agreement
    // plus a near-exact name — sequential TPC-H names (lev 1 apart) alone
    // can't cross it. Shape at scale: block occupancy is set by key
    // granularity (|nations|·|balance buckets| cells); degenerate blocks
    // get the q34 census-cap treatment; scoring is per-candidate codegen
    // (levenshtein + equality), no UDF.
    QueryDef("q181_entity_resolution",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val dirty = c.filter(col("c_custkey") % 10 === 3)
          .select((col("c_custkey") + lit(100000000L)).as("c_custkey"),
            concat(substring(col("c_name"), 1, 17), lit("X")).as("c_name"),
            col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
        val all = c.unionByName(dirty)
          .withColumn("blk", floor(col("c_acctbal") / 100.0d).cast(LongType))
        val x = all.select(col("c_custkey").as("id_a"), col("c_name").as("name_a"),
          col("c_nationkey").as("nat"), col("c_acctbal").as("bal_a"),
          col("c_mktsegment").as("seg_a"), col("blk"))
        val y = all.select(col("c_custkey").as("id_b"), col("c_name").as("name_b"),
          col("c_nationkey").as("nat"), col("c_acctbal").as("bal_b"),
          col("c_mktsegment").as("seg_b"), col("blk"))
        x.join(y, Seq("nat", "blk"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            (when(levenshtein(col("name_a"), col("name_b")) <= 1, 3L).otherwise(0L) +
              when(col("bal_a") === col("bal_b"), 2L).otherwise(0L) +
              when(col("seg_a") === col("seg_b"), 1L).otherwise(0L)).as("score"))
          .filter(col("score") >= 5)
      },
      oracle = Some("""
        WITH dirty AS (
          SELECT c_custkey + 100000000 AS c_custkey,
            substr(c_name, 1, 17) || 'X' AS c_name,
            c_nationkey, c_acctbal, c_mktsegment
          FROM customer WHERE c_custkey % 10 = 3),
        allc AS (
          SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
            CAST(floor(c_acctbal / 100.0) AS BIGINT) AS blk
          FROM (SELECT * FROM customer UNION ALL SELECT * FROM dirty) u),
        scored AS (
          SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
            (CASE WHEN levenshtein(a.c_name, b.c_name) <= 1 THEN 3 ELSE 0 END +
             CASE WHEN a.c_acctbal = b.c_acctbal THEN 2 ELSE 0 END +
             CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END) AS score
          FROM allc a JOIN allc b
            ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
           AND a.c_custkey < b.c_custkey)
        SELECT id_a, id_b, CAST(score AS BIGINT) AS score
        FROM scored WHERE score >= 5"""),
      bench = true),

    // Bucketed co-located join — the 100 TB layout technique the catalog
    // exercises nowhere else AS A REAL WRITE: both fact tables are
    // persisted `bucketBy(16, <orderkey>)` (hash-bucketed files + bucket
    // metadata in the session catalog), and the orders⋈lineitem join then
    // plans with ZERO shuffle exchanges on either input — each of the 16
    // buckets joins file-against-file, which at cluster scale removes the
    // two biggest exchanges of the fact-fact join entirely (and repeated
    // downstream joins on the same key amortize the one-time layout
    // cost; this is Spark's native `bucketBy`, the warehouse-standard
    // answer SURVEY §2's T1 "key-grouped repartition" gestures at).
    // BucketingSpec pins the plan contract: no ShuffleExchange below the
    // sort-merge join with broadcast disabled, and a point predicate on
    // the bucket key prunes to 1 of 16 buckets (SelectedBucketsCount) —
    // the file-skip that turns a key lookup into a 1/16th scan. The
    // oracle replays the same join+rollup over the ORIGINAL parquet —
    // proving the bucketed round-trip loses and changes nothing.
    QueryDef("q227_bucketed_join",
      (s, dir) => {
        // md5-keyed + exit-cleaned scratch (ADVICE r12: Int.hashCode could
        // collide two data dirs onto one layout, and the trees accumulated)
        val tag = graft.Scratch.tag(dir)
        val base = graft.Scratch.dir("graft_buckets_", dir)
        Tables(s, dir, "orders").write.mode("overwrite").format("parquet")
          .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$base/orders_b").saveAsTable(s"orders_b_$tag")
        Tables(s, dir, "lineitem").write.mode("overwrite").format("parquet")
          .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$base/lineitem_b").saveAsTable(s"lineitem_b_$tag")
        s.table(s"orders_b_$tag")
          .join(s.table(s"lineitem_b_$tag"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("revenue"))
      },
      oracle = Some("""
        SELECT o_orderpriority, COUNT(*) AS n_items,
          CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1"""),
      bench = true)
  )
}
