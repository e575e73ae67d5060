package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P2: multi-criteria session filter with optional predicates.
  *
  * Reference: UserVisitSessionAnalyzeSpark.java:813-957 +
  * ValidUtils.java:19-105 — a hand-rolled per-row parameter check over
  * `k=v|` strings; any absent criterion is skipped. Spark-first the
  * whole thing is a conjunction of optional `Column` predicates handed
  * to one `.filter` — Catalyst folds it into the scan/join stage and
  * it stays codegen'd.
  *
  * The dimension join (J1/J2 in SURVEY §2.3) is the caller's choice;
  * `joinUserDim` leaves the strategy to AQE — a TPC-H-proportioned
  * customer dimension at the 100 TB design point is tens of GB, so a
  * hard broadcast hint would force an executor OOM exactly when the
  * data is big. AQE broadcasts from runtime stats when the dim is
  * actually small (PlanAuditSpec pins that at test SF) and falls back
  * to shuffle join when it isn't. Only fixed-cardinality dims
  * (nation/region: 25/5 rows at ANY scale) deserve a hard hint.
  */
object SessionFilter {

  final case class Params(
      minAcctbal: Option[Double] = None,
      maxAcctbal: Option[Double] = None,
      segments: Option[Seq[String]] = None,
      nations: Option[Seq[Int]] = None,
      // keyword-overlap analog: session's event_types must intersect
      eventTypes: Option[Seq[String]] = None)

  /** J1/J2: session aggregates ⋈ user dimension on user_id.
    * No broadcast hint: AQE decides from the dim's runtime size. */
  def joinUserDim(sessions: DataFrame, customer: DataFrame): DataFrame =
    sessions.join(
      customer.select(
        col("c_custkey").as("user_id"), col("c_acctbal"),
        col("c_mktsegment"), col("c_nationkey")),
      Seq("user_id"))

  /** Build the optional conjunction. Returns lit(true) when no
    * criterion is present (reference behavior: everything passes). */
  def predicate(p: Params): Column = {
    val preds: Seq[Column] = Seq(
      p.minAcctbal.map(v => col("c_acctbal") >= v),
      p.maxAcctbal.map(v => col("c_acctbal") <= v),
      p.segments.map(v => col("c_mktsegment").isin(v: _*)),
      p.nations.map(v => col("c_nationkey").isin(v: _*)),
      p.eventTypes.map(v =>
        arrays_overlap(split(col("event_types"), ","), lit(v.toArray)))
    ).flatten
    preds.reduceOption(_ && _).getOrElse(lit(true))
  }

  def apply(sessions: DataFrame, customer: DataFrame, p: Params): DataFrame =
    joinUserDim(sessions, customer).filter(predicate(p))
}
