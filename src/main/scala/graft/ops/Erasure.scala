package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten (GDPR Art. 17) impact audit: given a deny
  * list of user ids, how many rows each table loses when the erasure
  * cascades through the schema's foreign keys — the report a data
  * platform produces BEFORE running the deletion job (and the number
  * privacy review signs off on).
  *
  * Cascade in this schema: `customer` rows of the denied ids →
  * their `orders` (o_custkey) → those orders' `lineitem` rows
  * (l_orderkey) → the users' `events` (user_id). One row out per
  * table: total rows, affected rows, affected share in bp.
  *
  * Scale shape: the deny list is an id set (thousands — MBs at
  * worst) and BROADCASTS into every fact scan as a left semi-style
  * flag join, so each table is read exactly once with a conditional
  * aggregate (no second "count the rest" pass). The one genuinely
  * transitive hop — lineitem needs the affected ORDER KEYS, whose
  * count scales with the deny list × orders-per-user, not the
  * corpus — stays broadcast-class for any plausible deny list; if a
  * mass erasure ever made it corpus-sized, AQE falls back to a
  * shuffle join and the audit still runs, one extra exchange.
  */
object Erasure {

  /** `deny`: a single-column (user_id) frame. */
  def erasureAudit(deny: DataFrame, customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, events: DataFrame): DataFrame = {
    val denyIds = broadcast(deny.select(col("user_id")).distinct())

    def audit(table: String, df: DataFrame, key: String,
        affected: DataFrame, affKey: String): DataFrame = {
      // affected sides are key-unique by construction (distinct deny
      // ids; orders PK), so the flag join cannot multiply fact rows
      val aff = affected.select(col(affKey).as("__k"))
        .withColumn("__hit", lit(1L))
      df.join(broadcast(aff), df(key) === col("__k"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_affected"))
        .select(lit(table).as("table_name"), col("n_rows"), col("n_affected"))
    }

    val affectedOrders = orders
      .join(denyIds, orders("o_custkey") === denyIds("user_id"), "left_semi")
      .select(col("o_orderkey"))

    audit("customer", customer, "c_custkey", denyIds, "user_id")
      .unionByName(audit("orders", orders, "o_custkey", denyIds, "user_id"))
      .unionByName(
        audit("lineitem", lineitem, "l_orderkey", affectedOrders, "o_orderkey"))
      .unionByName(audit("events", events, "user_id", denyIds, "user_id"))
      .withColumn("affected_bp",
        when(col("n_rows") === 0L, lit(0L))
          .otherwise(F.floor(lit(10000.0) * col("n_affected") / col("n_rows"))
            .cast("long")))
  }
}
