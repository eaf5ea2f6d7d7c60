package graft.operators

import graft.{Q, Tables}
import graft.Out._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-maintenance operators (SURVEY §2a extension): the two
  * mutations every warehouse feeding an analytics engine runs daily —
  * applying a CDC batch to a fact table (MERGE INTO semantics) and
  * maintaining a type-2 slowly-changing dimension. The reference
  * pipeline re-derives its models from scratch per run
  * (observatorio/etl.py rebuilds the long fact each invocation); at
  * 100 TB a from-scratch rebuild is not an option, so the engine must
  * express the incremental forms as first-class distributed plans.
  *
  * Scale shape: cdc_merge is ONE shuffled full-outer join on the
  * merge key — the exact physical shape Delta/Iceberg MERGE lowers
  * to — with both sides partitioned (a CDC batch is
  * O(change rate · base), never broadcast-safe). scd2_dim is
  * per-entity windows partitioned by the dimension key. Neither has
  * a corpus-global single-partition stage.
  */
object Warehouse {

  // ---- cdc_merge: apply a CDC batch via full-outer MERGE ----
  // The change batch is derived deterministically from the base table
  // itself so both engines construct the identical batch at any SF:
  // keys ≡3 (mod 10) are updates (status→'X', price doubled — ×2 is
  // FP-exact), keys ≡7 are deletes, and keys ≡5 spawn inserts at
  // key+INS_OFFSET (orders keys are dense from 0, so the offset
  // region is disjoint from any realistic SF). MERGE semantics:
  //   matched  + op='U' → updated payload
  //   matched  + op='D' → row dropped
  //   unmatched+ op='I' → inserted payload
  //   no change         → base row unchanged.

  /** Insert-key offset — far above any base key (1e12; sf1000's max
    * orders key is ~1.5e9) so inserted keys never collide.
    */
  private val insOffset = 1000000000000L

  private def cdcMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ONE scan + ONE keyed exchange (r15): base and batch both derive
    // from the same key-partitioned frame, so the merge join reads a
    // ReusedExchange on each side instead of shuffling two separate
    // scans of orders. That works because the batch's join key is a
    // pure ALIAS of o_orderkey — the insert-key offset (which would
    // break co-partitioning) is materialized AFTER the join: insert
    // keys are provably unmatched (key+insOffset is disjoint from the
    // base key range), so a matched op='I' row fans out row-locally
    // to (base row unchanged, inserted row) via one explode. Same
    // MERGE output, two fewer stages (r14 shape: 2 scans + 2
    // exchanges; measured 1.92 s at sf1 vs DuckDB 0.92).
    //
    // Still sort-merge, deliberately: a shuffle_hash hint was A/B'd
    // (r14, quiet host) on the theory that full-outer SHJ skips both
    // per-partition sorts — measured SLOWER at scale (sf10 8.8 s vs
    // SMJ 6.2 s), because Spark's full-outer SHJ pays matched-row
    // bitset bookkeeping per probe while SMJ's sorts are cheap on the
    // narrow 3-column rows.
    val src = Tables(spark, dir).orders
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .repartition($"o_orderkey")
    val m = $"o_orderkey" % 10
    // The batch is an UPSERT STREAM over the shared exchange: op NULL
    // = no change (c_status/c_price carry the base values, so the
    // projection consumes every scanned column — a narrower batch
    // projection would let ColumnPruning re-derive a second pruned
    // scan below the exchange and break the reuse; so would a
    // pre-join residue filter, which PushDownPredicates moves through
    // the repartition). The exactly-once MERGE row fan-out happens
    // after the join.
    val batch = src.select($"o_orderkey".as("c_key"),
      when(m === 7, "D").when(m === 3, "U").when(m === 5, "I")
        .otherwise(lit(null).cast("string")).as("op"),
      when(m === 3, lit("X")).when(m === 5, lit("N"))
        .otherwise($"o_orderstatus").as("c_status"),
      when(m === 3, $"o_totalprice" * 2.0)
        .otherwise($"o_totalprice").as("c_price"))
    val keptRow = struct($"c_key".as("o_orderkey"),
      $"c_status".as("o_orderstatus"), $"c_price".as("o_totalprice"))
    val baseRow = struct($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val insRow = struct(($"c_key" + insOffset).as("o_orderkey"),
      $"c_status".as("o_orderstatus"), $"c_price".as("o_totalprice"))
    src.join(batch, $"o_orderkey" === $"c_key", "full_outer")
      .filter($"op".isNull || $"op" =!= "D")
      .select(explode(
        when($"op" === "I", array(baseRow, insRow))
          .otherwise(array(keptRow))).as("r"))
      .select($"r.o_orderkey", $"r.o_orderstatus", $"r.o_totalprice")
      .resultOrder($"o_orderkey")
  }

  private val cdcMergeSql =
    s"""WITH ch AS (
       |  SELECT
       |    CASE WHEN o_orderkey % 10 = 5 THEN o_orderkey + $insOffset
       |         ELSE o_orderkey END AS c_key,
       |    CASE o_orderkey % 10 WHEN 7 THEN 'D' WHEN 3 THEN 'U' ELSE 'I' END AS op,
       |    CASE o_orderkey % 10 WHEN 3 THEN 'X' WHEN 5 THEN 'N' END AS c_status,
       |    CASE o_orderkey % 10 WHEN 3 THEN o_totalprice * 2.0
       |         WHEN 5 THEN o_totalprice END AS c_price
       |  FROM orders WHERE o_orderkey % 10 IN (3, 5, 7))
       |SELECT COALESCE(b.o_orderkey, ch.c_key) AS o_orderkey,
       |  CASE WHEN ch.op IS NOT NULL THEN ch.c_status
       |       ELSE b.o_orderstatus END AS o_orderstatus,
       |  CASE WHEN ch.op IS NOT NULL THEN ch.c_price
       |       ELSE b.o_totalprice END AS o_totalprice
       |FROM orders b FULL OUTER JOIN ch ON ch.c_key = b.o_orderkey
       |WHERE ch.op IS NULL OR ch.op <> 'D'
       |ORDER BY o_orderkey""".stripMargin

  // ---- scd2_dim: type-2 slowly-changing dimension build ----
  // Per user, the tracked attribute is the event_type of their
  // activity stream: consecutive runs collapse to one version row
  // with a validity interval [valid_from, valid_to) — valid_to is the
  // next version's start (NULL + is_current on the open run). The
  // run detection is the standard gaps-and-islands window (change
  // flag via LAG, version = running sum of flags), partitioned by
  // the dimension key — each entity's history is one window
  // partition, so the build scales with entities, not with a global
  // sort. Ordering ties break on event_id (cross-engine total order).

  private def scd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wVer = Window.partitionBy($"user_id").orderBy($"version")
    Tables(spark, dir).events
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .withColumn("chg",
        when($"prev_type".isNull || $"prev_type" =!= $"event_type", 1L)
          .otherwise(0L))
      .withColumn("version", sum($"chg").over(wRun))
      // event_type is constant within a run BY CONSTRUCTION (version
      // increments on every type change), so grouping by it is the
      // identity on groups — and it moves the string out of the
      // aggregation BUFFER: min(string) is a var-width buffer that
      // forces SortAggregate (plus its own full sort of the event
      // rows, r15 plan audit); as a KEY the aggregate is hash-based
      // over fixed-width buffers (guide §4: pick codegen-friendly
      // operators), and the post-agg sort the lead() window needs
      // runs over version rows, not event rows
      .groupBy($"user_id", $"version", $"event_type")
      .agg(min($"ts").as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead($"valid_from", 1).over(wVer))
      .select($"user_id", $"version", $"event_type",
        $"valid_from", $"valid_to",
        $"valid_to".isNull.as("is_current"), $"n_events")
      .resultOrder($"user_id", $"version")
  }

  private val scd2Sql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
       |  FROM events),
       |m AS (
       |  SELECT *,
       |    CASE WHEN LAG(event_type, 1) OVER
       |             (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |           OR LAG(event_type, 1) OVER
       |             (PARTITION BY user_id ORDER BY ts, event_id) <> event_type
       |         THEN 1 ELSE 0 END AS chg
       |  FROM e),
       |runs AS (
       |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
       |  FROM m),
       |ver AS (
       |  SELECT user_id, CAST(version AS BIGINT) AS version,
       |    MIN(event_type) AS event_type,
       |    MIN(ts) AS valid_from,
       |    COUNT(*) AS n_events
       |  FROM runs GROUP BY user_id, version)
       |SELECT user_id, version, event_type, valid_from,
       |  LEAD(valid_from, 1) OVER (PARTITION BY user_id ORDER BY version)
       |    AS valid_to,
       |  LEAD(valid_from, 1) OVER (PARTITION BY user_id ORDER BY version)
       |    IS NULL AS is_current,
       |  n_events
       |FROM ver
       |ORDER BY user_id, version""".stripMargin

  // ---- ivm_rollup: incremental view maintenance of an aggregate ----
  // The reason cdc_merge matters at 100 TB: downstream rollups must
  // be DELTA-maintained, not recomputed. This operator maintains the
  // per-status (total_price, n_orders) rollup under the cdc_merge
  // batch purely from delta contributions — each change row fans out
  // to its retraction/addition rows (an update retracts the old
  // payload from its old group and adds the new payload to the new
  // group), deltas aggregate, and one full-outer join applies them to
  // the base rollup. The ORACLE recomputes the same rollup from the
  // fully-merged table, so the hash match IS the proof that delta
  // maintenance ≡ recompute. Exactness hinges on decimal
  // accumulation: decimal sums are associative, so base − retractions
  // + additions lands on the identical value the recompute produces
  // (double sums would drift by grouping order). Scale shape: one
  // scan of the batch, one scan of the base, and a rollup-sized
  // (GROUP-cardinality, not corpus-sized) join.

  private val Dec = org.apache.spark.sql.types.DecimalType(18, 6)

  private def ivmRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables(spark, dir).orders
    // the materialized rollup being maintained (decimal state)
    val agg0 = orders.groupBy($"o_orderstatus")
      .agg(sum($"o_totalprice".cast(Dec)).as("s"), count(lit(1)).as("n"))
    // retraction/addition contributions from the CDC batch
    val m = $"o_orderkey" % 10
    val contrib = struct($"o_orderstatus".as("st"),
      (-$"o_totalprice").as("dp"), lit(-1L).as("dn"))
    val deltas = orders.filter(m.isin(3, 5, 7))
      .select(explode(
        when(m === 3, array(contrib,
          struct(lit("X").as("st"), ($"o_totalprice" * 2.0).as("dp"),
            lit(1L).as("dn"))))
        .when(m === 7, array(contrib))
        .otherwise(array(struct(lit("N").as("st"),
          $"o_totalprice".as("dp"), lit(1L).as("dn")))))
        .as("c"))
      .groupBy($"c.st".as("o_orderstatus"))
      .agg(sum($"c.dp".cast(Dec)).as("ds"), sum($"c.dn").as("dn"))
    agg0.join(deltas, Seq("o_orderstatus"), "full_outer")
      .select($"o_orderstatus",
        (coalesce($"s", lit(0).cast(Dec)) + coalesce($"ds", lit(0).cast(Dec)))
          .cast("double").as("total_price"),
        (coalesce($"n", lit(0L)) + coalesce($"dn", lit(0L))).as("n_orders"))
      .filter($"n_orders" > 0)
      .resultOrder($"o_orderstatus")
  }

  // the oracle is the FULL RECOMPUTE over the merged table — the
  // delta path must land on the identical rollup
  private val ivmRollupSql =
    s"""WITH ch AS (
       |  SELECT
       |    CASE WHEN o_orderkey % 10 = 5 THEN o_orderkey + $insOffset
       |         ELSE o_orderkey END AS c_key,
       |    CASE o_orderkey % 10 WHEN 7 THEN 'D' WHEN 3 THEN 'U' ELSE 'I' END AS op,
       |    CASE o_orderkey % 10 WHEN 3 THEN 'X' WHEN 5 THEN 'N' END AS c_status,
       |    CASE o_orderkey % 10 WHEN 3 THEN o_totalprice * 2.0
       |         WHEN 5 THEN o_totalprice END AS c_price
       |  FROM orders WHERE o_orderkey % 10 IN (3, 5, 7)),
       |merged AS (
       |  SELECT
       |    CASE WHEN ch.op IS NOT NULL THEN ch.c_status
       |         ELSE b.o_orderstatus END AS o_orderstatus,
       |    CASE WHEN ch.op IS NOT NULL THEN ch.c_price
       |         ELSE b.o_totalprice END AS o_totalprice
       |  FROM orders b FULL OUTER JOIN ch ON ch.c_key = b.o_orderkey
       |  WHERE ch.op IS NULL OR ch.op <> 'D')
       |SELECT o_orderstatus,
       |  ${graft.Det.dsumSql("o_totalprice")} AS total_price,
       |  COUNT(*) AS n_orders
       |FROM merged GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin

  val all: Seq[Q] = Seq(
    Q("cdc_merge", cdcMerge, Some(cdcMergeSql)),
    Q("scd2_dim", scd2, Some(scd2Sql)),
    Q("ivm_rollup", ivmRollup, Some(ivmRollupSql))
  )
}
