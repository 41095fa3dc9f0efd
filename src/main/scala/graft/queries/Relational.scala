package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operator surface, exercised over the driver's TPC-H-ish
  * tables (TESTDATA.md / FIXTURES.md §B). Each query is the testdata analog
  * of an operator family from SURVEY.md §2 — the protocol-domain versions
  * of the same shapes live in `graft.etl` and are unit-tested with binary
  * fixtures.
  *
  * Scale notes (designing for 100 TB even though tests run at sf0.1):
  *   - dimension joins (`nation`, `region`) are explicitly `broadcast()`;
  *   - aggregations are expressed so Catalyst plans partial (map-side)
  *     aggregation before the exchange;
  *   - windows partition on high-cardinality keys (`user_id`), never on a
  *     constant, so no single-partition window ever materializes;
  *   - DECIMAL is used for every accumulating sum so results do not depend
  *     on partitioning / accumulation order (doubles would).
  */
object Relational {

  private def dec(c: Column, p: Int = 12, s: Int = 2): Column = c.cast(DecimalType(p, s))

  /** A1 aggregation family (processed/not_processed counters writ large) —
    * TPC-H Q1 shape: full-scan groupBy with map-side partial aggregation.
    * Ref: counter aggregation `diameter.py:469-487`. */
  val q1PricingSummary: Q = Q(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) - dec(col("l_discount"), 4, 2))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** P-family predicate chain (P1-P6) — TPC-H Q6 shape: every predicate and
    * the 2-column projection must reach the parquet scan (PushedFilters /
    * ReadSchema). Ref: filter ordering `diameter.py:214-255`. */
  val q2FilterPushdown: Q = Q(
    "q2_filter_pushdown",
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.03, 0.07)
        && col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount"), 4, 2)).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** Join pipeline (J-family shape) with broadcast dimensions — TPC-H Q5
    * flavor. Fact-fact join shuffles on the join key; `nation`/`region`
    * broadcast so no exchange is added for dimensions.
    * Ref: correlation joins `diameter.py:302-339`. */
  val q3JoinAgg: Q = Q(
    "q3_join_agg",
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    // partial aggregation pushed BELOW the join: the fact table collapses
    // to one row per order key before it ever shuffles into the join —
    // at 100 TB this is the difference between joining line items and
    // joining orders. Decimal sums are associative, so the result is
    // bit-identical to the flat oracle formulation.
    val lineAgg = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) - dec(col("l_discount"), 4, 2))).as("order_rev"),
        count(lit(1)).as("order_items"))
    lineAgg
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(
        sum(col("order_rev")).cast("double").as("revenue"),
        sum(col("order_items")).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** A2 last-non-empty propagation (copy_msisdn/copy_imsi): the last
    * matching value in the group overwrites every member. Window over the
    * whole partition, `last(..., ignoreNulls)`.
    * Ref: `gtp_ingestor.py:42-71`, `smpp_ingestor.py:379-408`. */
  val q4LastNonNull: Q = Q(
    "q4_last_non_null",
    """SELECT event_id, user_id,
      |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS enriched_value
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"),
        last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true).over(w).as("enriched_value"))
      .orderBy(col("event_id"))
  }

  /** D1-D4 dedup family (retransmission drop): keep the first row per key
    * by explicit (ts, id) order — `row_number() == 1`, never
    * `dropDuplicates` (which is order-undefined on a distributed table).
    * Ref: `diameter.py:307-309`, `http_ingestor.py:443-444`. */
  val q5DedupFirst: Q = Q(
    "q5_dedup_first",
    """SELECT event_id, user_id, event_type, ts
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .orderBy(col("event_id"))
  }

  /** J7 sessionization (sigshark transaction tracking): gap-based session
    * assignment via lag + running sum — one shuffle on the session key,
    * both windows share the same partitioning so Catalyst plans a single
    * exchange. Ref: `sigshark.py:368-555`. */
  val q6Sessionize: Q = Q(
    "q6_sessionize",
    """WITH g AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
      |  FROM g
      |)
      |SELECT user_id, session_no, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
      |FROM numbered
      |GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 1800000000L // 30 min
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull
          || unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1).otherwise(0))
      .withColumn("session_no", sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sum(dec(col("value"))).cast("double").as("session_value"))
      .orderBy(col("user_id"), col("session_no"))
  }

  /** J1 request↔response correlation with retransmission dedup and
    * bidirectional null-filling, re-expressed as full-outer self-join +
    * symmetric coalesce (the reference hand-rolls this with a dict keyed
    * by DiameterKey). Unmatched survivors are emitted too (K3 residual
    * flush). Ref: `diameter.py:302-339,580-589`. */
  val q7Correlate: Q = Q(
    "q7_correlate",
    """WITH req AS (
      |  SELECT user_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
      |         event_id AS req_event_id, value AS req_value
      |  FROM events WHERE event_type = 'click'
      |  QUALIFY row_number() OVER (PARTITION BY user_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
      |                             ORDER BY ts, event_id) = 1
      |), res AS (
      |  SELECT user_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
      |         event_id AS res_event_id, value AS res_value
      |  FROM events WHERE event_type = 'purchase'
      |  QUALIFY row_number() OVER (PARTITION BY user_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
      |                             ORDER BY ts, event_id) = 1
      |)
      |SELECT coalesce(req.user_id, res.user_id) AS user_id,
      |       coalesce(req.k, res.k) AS k,
      |       req_event_id, res_event_id,
      |       coalesce(req_value, res_value) AS filled_req_value,
      |       coalesce(res_value, req_value) AS filled_res_value,
      |       (req_event_id IS NOT NULL AND res_event_id IS NOT NULL) AS matched
      |FROM req FULL OUTER JOIN res USING (user_id, k)
      |ORDER BY user_id, k""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
    def firstPerKey(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id"), col("k")).orderBy(col("ts"), col("event_id"))
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    }
    val req = firstPerKey(e.filter(col("event_type") === "click"))
      .select(col("user_id"), col("k"), col("event_id").as("req_event_id"), col("value").as("req_value"))
    val res = firstPerKey(e.filter(col("event_type") === "purchase"))
      .select(col("user_id"), col("k"), col("event_id").as("res_event_id"), col("value").as("res_value"))
    req.join(res, Seq("user_id", "k"), "full_outer")
      .select(
        col("user_id"), col("k"), col("req_event_id"), col("res_event_id"),
        coalesce(col("req_value"), col("res_value")).as("filled_req_value"),
        coalesce(col("res_value"), col("req_value")).as("filled_res_value"),
        (col("req_event_id").isNotNull && col("res_event_id").isNotNull).as("matched"))
      .orderBy(col("user_id"), col("k"))
  }

  /** F11/F12/S5 semi-structured extraction (xmltodict / tshark-JSON side
    * channel): JSON path into `props`, then aggregate. Spark side uses
    * `get_json_object` (codegen'd); oracle uses an equivalent regexp so it
    * does not depend on DuckDB's JSON extension.
    * Ref: `cap_ingestor.py:96-146`, `http_ingestor.py:215-219`. */
  val q8JsonExtract: Q = Q(
    "q8_json_extract",
    """SELECT event_type,
      |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS min_k,
      |  max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS max_k,
      |  count(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** O1 ordering + top-k: global sort with deterministic tie-break; Spark
    * plans TakeOrderedAndProject (no full sort materialization).
    * Ref: transaction sort `sigshark.py:578-593`. */
  val q9TopK: Q = Q(
    "q9_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Set ops (§2.7): nations that have customers but no suppliers —
    * EXCEPT over two distinct projections (reference's union of linked +
    * unlinked rows is the same family). Ref: `http_ss7_ingestor.py:589-599`. */
  val q10SetOps: Q = Q(
    "q10_set_ops",
    """SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
      |EXCEPT
      |SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY n_name""".stripMargin) { (s, d) =>
    val n = broadcast(Tables.nation(s, d))
    val custN = Tables.customer(s, d).join(n, col("c_nationkey") === col("n_nationkey")).select(col("n_name"))
    val suppN = Tables.supplier(s, d).join(n, col("s_nationkey") === col("n_nationkey")).select(col("n_name"))
    custN.except(suppN).orderBy(col("n_name"))
  }

  /** Anti-join (NOT EXISTS shape — P-family negative predicates at scale):
    * customers that never ordered, counted per segment. */
  val q11AntiJoin: Q = Q(
    "q11_anti_join",
    """SELECT c_mktsegment, count(*) AS n_customers_no_orders
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers_no_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** A1 processed / not_processed counters, per day — the reference's
    * per-file quarantine counters as a conditional aggregation.
    * Ref: `diameter.py:454-487`, `models.py:255-258`. */
  val q12Counters: Q = Q(
    "q12_counters",
    """SELECT date_trunc('day', ts) AS day,
      |  CAST(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS BIGINT) AS processed,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS not_processed
      |FROM events
      |GROUP BY 1
      |ORDER BY day""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(
        sum(when(col("event_type") =!= "error", 1).otherwise(0)).as("processed"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("not_processed"))
      .orderBy(col("day"))
  }

  /** F20/A4 frames_list accumulation: ordered space-joined id list per
    * group — `array_sort(collect_list(struct))` so the order is explicit,
    * not partition-dependent. Ref: `diameter.py:281,293`, `sigshark.py:368-370`. */
  val q13FramesList: Q = Q(
    "q13_frames_list",
    """SELECT user_id,
      |  string_agg(CAST(event_id AS VARCHAR), ' ' ORDER BY ts, event_id) AS frames_list,
      |  count(*) AS n
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id")))),
            x => x.getField("event_id").cast("string")),
          " ").as("frames_list"),
        count(lit(1)).as("n"))
      .orderBy(col("user_id"))
  }

  /** F-family scalar functions over strings/ints: bit masking (F5), hex
    * render (F4), truncation-with-ellipsis (F14), first-token split (F9),
    * boolean-from-string (F18). Ref lines cited per function in SURVEY §2.8. */
  val q14Scalars: Q = Q(
    "q14_scalars",
    """SELECT doc_id,
      |  doc_id & 16777215 AS masked24,
      |  lower(to_hex(doc_id)) AS id_hex,
      |  CASE WHEN length(text) > 32 THEN substring(text, 1, 29) || '...' ELSE text END AS text_trunc,
      |  split_part(text, ' ', 1) AS first_token,
      |  (lower(lang) = 'en') AS is_en
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("doc_id").bitwiseAND(16777215).as("masked24"),
        lower(hex(col("doc_id"))).as("id_hex"),
        when(length(col("text")) > 32, concat(substring(col("text"), 1, 29), lit("...")))
          .otherwise(col("text")).as("text_trunc"),
        split(col("text"), " ").getItem(0).as("first_token"),
        (lower(col("lang")) === "en").as("is_en"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(
    q1PricingSummary, q2FilterPushdown, q3JoinAgg, q4LastNonNull, q5DedupFirst,
    q6Sessionize, q7Correlate, q8JsonExtract, q9TopK, q10SetOps, q11AntiJoin,
    q12Counters, q13FramesList, q14Scalars)
}
